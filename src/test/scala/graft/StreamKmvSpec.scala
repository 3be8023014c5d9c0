package graft

import org.apache.spark.sql.streaming.TestGroupState

import graft.streaming.StreamKmv
import graft.streaming.StreamKmv.{HEv, KmvState}

/** The streaming KMV op's contract the gate cannot see: the state update
  * is commutative/idempotent (arrival order and micro-batch slicing do
  * not matter), and the live result equals the batch sketch per type.
  */
class StreamKmvSpec extends SparkSuite {

  private def drive(slices: Seq[Seq[Long]]): (Seq[Long], Long) = {
    val m = classOf[StreamKmv.type].getDeclaredMethods
      .find(_.getName == "step").get
    m.setAccessible(true)
    import org.apache.spark.api.java.Optional
    var state: TestGroupState[KmvState] =
      TestGroupState.create[KmvState](Optional.empty[KmvState](),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        1000L, Optional.empty[Long](), hasTimedOut = false)
    var last: StreamKmv.KmvRow = null
    slices.foreach { hs =>
      val it = m.invoke(StreamKmv, "click",
        hs.map(h => HEv("click", h)).iterator, state)
        .asInstanceOf[Iterator[StreamKmv.KmvRow]]
      last = it.next()
      state = TestGroupState.create[KmvState](
        Optional.of(state.get),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        1000L, Optional.empty[Long](), hasTimedOut = false)
    }
    (state.get.hashes, last.est_distinct)
  }

  test("state is invariant to arrival order, batch slicing, and " +
    "duplicate delivery") {
    val hs = (1 to 1000).map(i => (i * 2654435761L) % (1L << 48))
    val a = drive(Seq(hs))
    val b = drive(hs.grouped(37).toSeq.reverse.map(_.reverse))
    val c = drive(Seq(hs ++ hs.take(500), hs.drop(100)))
    assert(a == b, "reordering changed the sketch")
    assert(a == c, "duplicate redelivery changed the sketch")
    assert(a._1.size == 256 && a._1 == a._1.sorted)
  }

  test("live per-type rows equal the batch op's per-type rows") {
    val stream = StreamKmv.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val batch = graft.ext.KmvDistinct.kmvUserDays.fn(spark, sf).collect()
      .filter(_.getString(0) != "ALL")
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(stream == batch, s"stream $stream vs batch $batch")
  }
}
