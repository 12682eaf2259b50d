package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Character-entropy gate: hand-computable distributions + the
  * empty-text guard (Spark split('','') yields [""] where DuckDB
  * yields [] — the operator must neutralize the difference).
  */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("entropy matches closed forms; low-entropy flag fires below the threshold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ent").toString
    val diverse = "abcdefghijkl" // 12 distinct, uniform → ln 12 ≈ 2.485
    Seq(
      (1L, "aaaa", "en", "srcA", 4L),            // H = 0
      (2L, "abab", "en", "srcA", 4L),            // H = ln 2
      (3L, diverse, "en", "srcA", diverse.length.toLong),
      (4L, "", "en", "srcA", 0L))                // guard path
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.charEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toMap
    assert(got(1L) === ((4L, 1L, 0.0, 1)))
    assert(got(2L) === ((4L, 2L, r4(math.log(2)), 1)))
    assert(got(3L) === ((12L, 12L, r4(math.log(12)), 0)))
    assert(got(4L) === ((0L, 0L, 0.0, 1)), "empty text takes the guard path")
  }

  test("pipeline yield: stages chain, and the final n_out equals the clean-pipeline survivors") {
    val rows = TextAnalysis.pipelineYield(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._2).toSeq === Seq("quality", "language", "exact_dedup"))
    for ((no, _, nIn, nOut, rej, rate) <- rows) {
      assert(nOut <= nIn && rej === nIn - nOut)
      assert(rate === math.floor(rej.toDouble / math.max(nIn, 1L) * 1e4 + 0.5) / 1e4)
    }
    // cumulative chaining: each stage's input is the previous output
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 === a._4 })
    // stage 1 input is the corpus; stage 3 output is the composed pipeline
    assert(rows.head._3 === Tables.documents(spark, SparkTestSession.Sf).count())
    assert(rows.last._4 === TextAnalysis.cleanPipeline(spark, SparkTestSession.Sf).count(),
      "yield report must agree with the pipeline it describes")
  }

  test("shipped corpus: every doc computed, text entropy in the natural-text band") {
    val rows = TextAnalysis.charEntropy(spark, SparkTestSession.Sf).collect()
    val nDocs = Tables.documents(spark, SparkTestSession.Sf).count()
    assert(rows.length.toLong === nDocs)
    val ents = rows.map(_.getDouble(3))
    assert(ents.forall(e => e >= 0.0 && e <= math.log(256)))
    // the word-soup corpus is natural-ish text: median entropy > 2 nats
    assert(ents.count(_ > 2.0) * 2 > ents.length)
  }
}
