package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageHeaders

/** Property-based fuzzing of the pure-JVM pieces (scalacheck without a
  * Spark session — corrupt media headers are routine at corpus scale,
  * and the decode path must classify, never throw).
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val randomBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  test("ImageHeaders.parse never throws on arbitrary byte arrays") {
    check(Prop.forAll(randomBytes) { bytes =>
      ImageHeaders.parse(bytes)
      true
    })
  }

  test("ImageHeaders.parse never throws on magic-prefixed garbage and stays typed") {
    val magics = Gen.oneOf(
      Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array[Int](0xff, 0xd8).map(_.toByte),
      "GIF89a".getBytes,
      "GIF87a".getBytes)
    val gen = for { m <- magics; tail <- randomBytes } yield m ++ tail
    check(Prop.forAll(gen) { bytes =>
      // a truncated/corrupt container must come back None or with the
      // format matching its magic — never an exception, never bogus fmt
      ImageHeaders.parse(bytes) match {
        case None => true
        case Some((fmt, w, h)) =>
          Set("png", "jpeg", "gif").contains(fmt) && w >= 0 && h >= 0
      }
    })
  }

  test("portable charFold hash reference: JVM fold stays within [0, P)") {
    val P = graft.functions.TextFunctions.HashP
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % P)
      h >= 0 && h < P
    })
  }
}
