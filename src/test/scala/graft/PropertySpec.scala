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

  test("bloom probe has no false negatives over random member sets") {
    import org.apache.spark.util.sketch.BloomFilter
    val gen = Gen.nonEmptyContainerOf[List, Long](
      Gen.choose(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(gen) { members =>
      val bf = BloomFilter.create(math.max(members.size.toLong, 1L), 0.03)
      members.foreach(bf.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val probe = graft.plans.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), bos.toByteArray)
      members.forall(probe.test) // false positives allowed, negatives never
    }, n = 200)
  }

  test("PQ encode is in-range, deterministic, and ADC matches reconstruction") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val (m, k, dsub) = (4, 8, 2)
    val f = Gen.choose(-1000, 1000).map(_ / 100.0f)
    val cbGen = Gen.containerOfN[Array, Float](m * k * dsub, f)
    val vGen = Gen.containerOfN[Array, Float](m * dsub, f)
    check(Prop.forAll(cbGen, vGen, vGen) { (cb, v, q) =>
      val enc = graft.plans.PqEncode(Literal(0L), cb, m, k, dsub)
      def codesOf(x: Array[Float]): Array[Int] = {
        val a = enc.nullSafeEval(new GenericArrayData(x.map(Float.box)))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until m).map(a.getInt).toArray
      }
      val codes = codesOf(v)
      val inRange = codes.forall(c => c >= 0 && c < k)
      val deterministic = codes.sameElements(codesOf(v))
      // ADC inner product must equal the dot of q against the
      // codebook reconstruction of v
      val adc = graft.plans.PqAdcDot(Literal(0L), Literal(0L), cb, m, k, dsub)
        .nullSafeEval(new GenericArrayData(q.map(Float.box)),
          new GenericArrayData(codes.map(Int.box))).asInstanceOf[Double]
      var expect = 0.0
      for (mi <- 0 until m; d <- 0 until dsub)
        expect += q(mi * dsub + d).toDouble * cb(((mi * k) + codes(mi)) * dsub + d)
      inRange && deterministic && math.abs(adc - expect) < 1e-9
    }, n = 200)
  }
}
