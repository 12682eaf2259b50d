package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ExtendedAnalytics, TextAnalysis}

/** Blocklist density gate + join-key skew diagnostic: closed-form
  * fixtures for the gate arithmetic, structural invariants and
  * whole-frame consistency for the skew report.
  */
class GateDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("blocklist gate: closed-form densities, zero-hit and empty-text paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk").toString
    Seq(
      (1L, "slow slow spam fast table", "en", "srcA", 25L), // 3/5 hits, 2 terms
      (2L, "fast table scan merge", "en", "srcA", 21L),     // zero hits
      (3L, "slow", "en", "srcA", 4L),                       // 1/1 — blocked
      (4L, "", "en", "srcA", 0L))                           // empty guard
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))))
      .toMap
    assert(got(1L) === ((5L, 3L, 2L, r4(3.0 / 5), 1)))
    assert(got(2L) === ((4L, 0L, 0L, 0.0, 0)))
    assert(got(3L) === ((1L, 1L, 1L, 1.0, 1)))
    assert(got(4L) === ((0L, 0L, 0L, 0.0, 0)), "empty text divides by greatest(n,1)")
  }

  test("blocklist gate on the shipped corpus: both decisions occur, flag matches rate") {
    val rows = TextAnalysis.blocklistFilter(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4), r.getInt(5)))
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0),
      "threshold must split the shipped corpus")
    for ((n, h, rate, blocked) <- rows) {
      assert(h <= n)
      assert(rate === r4(h.toDouble / math.max(n, 1L)))
      assert(blocked === (if (rate >= TextAnalysis.BlocklistMaxRate) 1 else 0))
    }
  }

  test("corpus card: one row per source, counts reconcile, top_lang is the true argmax") {
    val rows = operators.CorpusCuration.corpusCard(spark, SparkTestSession.Sf).collect()
    val docs = Tables.documents(spark, SparkTestSession.Sf)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"),
        graft.functions.TextFunctions.langId(
          org.apache.spark.sql.functions.col("text")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val bySrc = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    assert(rows.map(_.getLong(1)).sum === docs.length.toLong)
    for (r <- rows) {
      val src = r.getString(0)
      val grp = bySrc(src)
      assert(r.getLong(1) === grp.length.toLong)
      assert(r.getLong(2) === (grp.length - grp.map(_._2).distinct.length).toLong)
      // dominant predicted language: max count, tie → lexicographically largest
      val want = grp.groupBy(_._3).map { case (l, g) => (g.length, l) }.max._2
      assert(r.getString(6) === want, s"top_lang for $src")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0001)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 1)
    }
  }

  test("length histogram: buckets are exact powers of two and partition the corpus") {
    val rows = ExtendedAnalytics.lengthHistogram(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val lens = Tables.documents(spark, SparkTestSession.Sf)
      .select("n_chars").collect().map(_.getLong(0))
    assert(rows.map(_._4).sum === lens.length.toLong, "every doc lands in one bucket")
    for ((b, lo, hi, n, share) <- rows) {
      assert(lo === (1L << b) && hi === (1L << (b + 1)) - 1)
      val want = lens.count(l => math.max(l, 1L) >= lo && math.max(l, 1L) <= hi)
      assert(n === want.toLong, s"bucket $b count")
      assert(share === r4(n.toDouble / lens.length))
    }
  }

  test("skew report: ranks dense, counts descending, shares consistent with the fact") {
    val rows = ExtendedAnalytics.skewReport(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val kc = Tables.events(spark, SparkTestSession.Sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = kc.values.sum
    val keys = kc.size.toLong
    assert(rows.map(_._1).toSeq === (1 to math.min(ExtendedAnalytics.SkewTopK, kc.size)))
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-_).toSeq, "counts descend")
    // the reported heavy keys ARE the corpus's true top keys (count, then id)
    val expectTop = kc.toSeq.sortBy { case (k, c) => (-c, k) }
      .take(rows.length).map(_._1)
    assert(rows.map(_._2).toSeq === expectTop)
    var cum = 0L
    for ((_, uid, cnt, share, cumShare, xMean) <- rows) {
      cum += cnt
      assert(cnt === kc(uid))
      assert(share === r4(cnt.toDouble / total))
      assert(cumShare === r4(cum.toDouble / total))
      assert(xMean === r4(cnt.toDouble * keys / total))
    }
  }
}
