package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.FastMd5

/** Property tests for the thread-reused-digest md5 (no SparkSession):
  * value identity with the JDK/commons-codec reference on arbitrary
  * unicode strings, and the ordering equivalence the binary minhash
  * aggregate relies on (unsigned byte order of digests == lexicographic
  * order of their lowercase hex). */
object FastMd5Props extends Properties("FastMd5") {

  private val anyText: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue))
      .map(_.mkString.replaceAll("[\uD800-\uDFFF]", "")), // no lone surrogates
    1 -> Gen.listOf(Gen.oneOf("héllo", "你好", "🎉", " ", "a"))
      .map(_.mkString))

  property("hex equals commons-codec md5Hex over UTF-8 bytes") =
    Prop.forAll(anyText) { s =>
      FastMd5.hex(UTF8String.fromString(s)).toString ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s.getBytes(UTF_8))
    }

  property("digest is the raw bytes of hex") =
    Prop.forAll(anyText) { s =>
      val d = FastMd5.digest(UTF8String.fromString(s))
      d.map("%02x".format(_)).mkString ==
        FastMd5.hex(UTF8String.fromString(s)).toString
    }

  property("unsigned byte order of digests == lexicographic hex order") =
    Prop.forAll(anyText, anyText) { (a, b) =>
      val (da, db) = (FastMd5.digest(UTF8String.fromString(a)),
        FastMd5.digest(UTF8String.fromString(b)))
      val byBytes = java.util.Arrays.compareUnsigned(da, db).sign
      val byHex = FastMd5.hex(UTF8String.fromString(a)).toString
        .compareTo(FastMd5.hex(UTF8String.fromString(b)).toString).sign
      byBytes == byHex
    }

  property("thread reuse is stable: same input, same digest, any thread") =
    Prop.forAll(anyText) { s =>
      val expect = FastMd5.hex(UTF8String.fromString(s)).toString
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val ts = (1 to 4).map(_ => new Thread(() =>
        results.add(FastMd5.hex(UTF8String.fromString(s)).toString)))
      ts.foreach(_.start()); ts.foreach(_.join())
      results.size == 4 && results.stream().allMatch(_ == expect)
    }
}
