package graft

/** Split-leakage audit = the ext_dedup_minhash pair set rolled up by the
  * ext_split_assign md5-prefix splits — verified by recomputing exactly
  * that from the two building blocks.
  */
class SplitLeakageSpec extends SparkSuite {

  private def split(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    if (hex < "028f") "test" else if (hex < "051e") "val" else "train"
  }

  test("leakage census equals the minhash pair set rolled up by the " +
    "deterministic split assignment") {
    val pairs = graft.ext.Dedup.minhashLsh.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs
      .groupBy { case (a, b, _) => (split(a), split(b)) }
      .map { case ((sa, sb), xs) =>
        (sa, sb, xs.length.toLong, xs.map(_._3).max) }
      .toSeq.sortBy { case (sa, sb, _, _) => (sa, sb) }
    val got = graft.ext.Decontam.splitLeakage.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    // conservation: the census covers every verified pair exactly once
    assert(got.map(_._3).sum == pairs.length.toLong)
  }
}
