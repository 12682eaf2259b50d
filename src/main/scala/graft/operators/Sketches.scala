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
  * bounded probe list are sketch *reads*, not data movement.
  *
  * The candidate probe set is the part that must NOT be an exact
  * full-vocabulary aggregate (that aggregate is precisely what the CMS
  * exists to avoid): each partition keeps a bounded Misra-Gries summary
  * ([[MgSummarySize]] counters, fixed memory regardless of partition
  * vocabulary), and only the ≤ m surviving (token, weight) rows per
  * partition shuffle — O(m·partitions), corpus-size-independent.
  * Superset guarantee (pigeonhole): any token with global tf > N/m
  * exceeds the local threshold n_p/m in at least one partition and
  * survives that partition's summary; the merge then cuts ADAPTIVELY —
  * every token whose weight upper bound (merged wt + ⌈N/m⌉) clears the
  * provisional k-th merged weight survives — so the true top-k is
  * contained in the candidates whenever the k-th frequency clears N/m.
  * Vast headroom for Zipfian text at m=4096 (spec-checked as a strict
  * superset of the exact top-20).
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
  /** Misra-Gries counters per partition; error ≤ n_p/m local counts. */
  val MgSummarySize = 4096
  /** Hard cap on the adaptive candidate list (bounds the probe `isin`
    * and the driver collect). Only reachable on near-flat
    * distributions, where the k-th frequency sits within N/m of the
    * cut and the pigeonhole superset guarantee is void anyway. */
  val CandidateCap = HeavyHittersK * 512

  /** Bounded-memory Misra-Gries pass over one partition's tokens:
    * at most m counters; decrement-all on overflow. Survivor weights
    * undercount by at most n_p/m.
    */
  private[graft] def misraGries(it: Iterator[String], m: Int): Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, Long](m * 2)
    it.foreach { t =>
      val c = counts.get(t)
      if (c != 0L || counts.containsKey(t)) counts.put(t, c + 1L)
      else if (counts.size < m) counts.put(t, 1L)
      else {
        // decrement every counter, dropping zeros — O(m), amortized
        // O(1) per stream element (each decrement pays off an insert)
        val dead = new java.util.ArrayList[String](8)
        counts.replaceAll((k, v) => v - 1L)
        counts.forEach { (k, v) => if (v == 0L) dead.add(k) }
        dead.forEach(k => counts.remove(k))
      }
    }
    import scala.jdk.CollectionConverters._
    counts.asScala.iterator.map { case (k, v) => (k, v) }.toArray.iterator
  }

  /** Bounded candidate list for the heavy-hitter probe: partition-local
    * Misra-Gries summaries merged by weight — never a full-vocabulary
    * aggregate (the groupBy input is ≤ m rows per partition). Exposed
    * for the plan/superset spec.
    */
  private[graft] def mgCandidates(s: SparkSession, toks: DataFrame,
                                  totalTokens: Long): DataFrame = {
    import s.implicits._
    val mg = MgSummarySize
    val merged = toks.as[String]
      .mapPartitions(it => misraGries(it, mg))
      .toDF("token", "wt")
      .groupBy("token").agg(sum("wt").as("wt"))
    // Merged MG weights are lower bounds, undercounting by at most
    // Σ_p n_p/m = N/m. A true top-k token's merged weight can thus sit
    // up to N/m BELOW the provisional k-th merged weight, so a fixed
    // k·margin cut can drop it on a near-flat distribution. The
    // adaptive cut keeps every token whose upper bound (wt + ⌈N/m⌉)
    // clears the provisional k-th weight — that provably retains the
    // exact top-k whenever any token survives the summaries at all
    // (w_k ≤ f_(k) and wt(T) ≥ f_T − N/m for each true top-k T).
    val slack = lit((totalTokens + mg - 1) / mg)
    val kth = merged.orderBy(col("wt").desc, col("token"))
      .limit(HeavyHittersK).agg(min(col("wt")).as("wk"))
    merged.crossJoin(broadcast(kth))
      .filter(col("wt") + slack >= coalesce(col("wk"), lit(0L)))
      .orderBy(col("wt").desc, col("token"))
      .limit(CandidateCap)
      .select("token")
  }

  /** Top-k tokens with their CMS-estimated and exact total frequencies
    * (with multiplicity — term frequency, not document frequency).
    * Rows-only check: sketch internals are engine-specific; the spec
    * bounds estimate error instead.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the tokenize+explode feeds three actions (sketch build, candidate
    // pass, exact probe counts) — persist the exploded frame for the
    // query's lifetime so the regexp tokenization runs once, and
    // release it before returning (the output frame is built from
    // collected rows, so it holds no reference to the cache)
    val toks = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE distributed pass builds the mergeable sketch AND the total
      // token count (the adaptive candidate slack needs N; riding the
      // same partial agg saves a separate count job)
      val row = toks
        .agg(expr(s"count_min_sketch(token, ${CmsEps}d, ${CmsConfidence}d, $CmsSeed)"),
          count(lit(1)))
        .head()
      val cmsBytes = row.getAs[Array[Byte]](0)
      val totalTokens = row.getLong(1)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(cmsBytes))
      // candidate probes: bounded partition-local summaries; the only
      // shuffled/aggregated rows are the ≤ m survivors per partition
      val candidates = mgCandidates(s, toks, totalTokens).as[String].collect().toSeq
      // exact tf restricted to the bounded candidate set: the map-side
      // partial agg collapses to ≤ |candidates| rows per partition —
      // NOT a full-vocabulary aggregate
      val top = toks.filter(col("token").isin(candidates: _*))
        .groupBy("token").agg(count(lit(1)).as("tf"))
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
