package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Sketch-based corpus statistics beyond the built-in HLL/KLL pair
  * (ExtendedAnalytics.approxStats): Count-Min Sketch heavy hitters —
  * the 100 TB shape for "which tokens dominate the corpus" when the
  * vocabulary itself is too large to aggregate exactly.
  *
  * The sketch is built as a distributed mergeable aggregate
  * (`count_min_sketch` partials combine map-side, exactly like any
  * sum), and only the FINISHED sketch — kilobytes, independent of
  * corpus size — is collected. Driver-side estimate lookups over a
  * bounded probe list are sketch *reads*, not data movement; the
  * candidate probe set comes from the distributed exact top-k (at true
  * scale: a sampled or streamed candidate set).
  *
  * CMS guarantees: estimate ≥ true count (never undercounts), and
  * estimate ≤ true + ε·N with probability ≥ confidence — both bounds
  * are spec-verified against exact counts.
  */
object Sketches {

  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42
  val HeavyHittersK = 20

  /** Top-k tokens with their CMS-estimated and exact total frequencies
    * (with multiplicity — term frequency, not document frequency).
    * Rows-only check: sketch internals are engine-specific; the spec
    * bounds estimate error instead.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the tokenize+explode feeds two actions (sketch build, probe-list
    // top-k) — persist the exploded frame for the query's lifetime so
    // the regexp tokenization runs once, and release it before
    // returning (the output frame is built from collected rows, so it
    // holds no reference to the cache)
    val toks = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE distributed pass builds the mergeable sketch
      val cmsBytes = toks
        .agg(expr(s"count_min_sketch(token, ${CmsEps}d, ${CmsConfidence}d, $CmsSeed)"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(cmsBytes))
      // candidate probes: distributed exact top-k by term frequency
      val top = toks.groupBy("token").agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("token"))
        .limit(HeavyHittersK)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      top.toSeq
        .map { case (t, exact) => (t, cms.estimateCount(t), exact) }
        .toDF("token", "cms_estimate", "exact_tf")
        .orderBy(col("exact_tf").desc, col("token"))
    } finally toks.unpersist(blocking = false)
  }
}
