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
  * The sketch is PORTABLE by construction (the SQ8 precedent: an
  * "approximate" path made oracle-expressible by integer
  * construction): d×w counter cells built as ONE distributed grouped
  * count over (row, bucket) with bucket = ((charFold(token)·A_i +
  * B_i) mod p) mod w — every constant engine-neutral integers, so the
  * DuckDB oracle computes the BIT-IDENTICAL sketch relationally and
  * `q_heavy_hitters` is hash-checked end to end (estimate = min over
  * the d cells), not merely bounds-gated. The grouped count IS the
  * CMS merge: map-side partials collapse to ≤ d·w cells per
  * partition, and only the finished kilobyte sketch is collected.
  * Driver-side estimate lookups over a bounded probe list are sketch
  * *reads*, not data movement.
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
  val HeavyHittersK = 20
  /** Sketch geometry: w = ⌈e/ε⌉, d = ⌈ln 1/(1−confidence)⌉ — the
    * standard CMS sizing at [[CmsEps]]/[[CmsConfidence]].
    */
  val CmsDepth = 5
  val CmsWidth = 2719
  /** Per-row affine hash constants over the portable charFold (all
    * < p = [[graft.functions.TextFunctions.HashP]]; products stay
    * under 2⁶³). One source of truth: the Spark expression AND the
    * generated oracle SQL both read these.
    */
  val CmsA: Seq[Long] = Seq(913809719L, 193877777L, 472882049L,
    826341913L, 553105253L)
  val CmsB: Seq[Long] = Seq(608735923L, 361743863L, 284623861L,
    730471337L, 142982467L)
  /** Misra-Gries counters per partition; error ≤ n_p/m local counts.
    * CORPUS ASSUMPTION (spec-measured, not assumed): the hash-checked
    * `q_heavy_hitters` oracle ranks the FULL vocabulary while the Spark
    * side ranks only the MG candidates — they agree iff the true top-k
    * survives the summaries, guaranteed when the k-th global frequency
    * clears ⌈N/m⌉. ExportMultimodalSpec's coverage-margin test pins a
    * 2× headroom on the shipped corpus so a testdata regeneration
    * re-measures the margin instead of hash-failing parity.
    */
  val MgSummarySize = 4096
  /** Hard cap on the adaptive candidate list (bounds the probe `isin`
    * and the driver collect). Only reachable on near-flat
    * distributions, where the k-th frequency sits within N/m of the
    * cut and the pigeonhole superset guarantee is void anyway. */
  val CandidateCap = HeavyHittersK * 512

  /** KMV (bottom-k / Theta-sketch) distinct-count constants — the
    * portable replacement for Spark-internal HLL hashing (the r12
    * verdict's item 5): keep the K smallest DISTINCT values of an
    * engine-neutral integer hash; estimate = (K−1)·P / h_(K), pure
    * integer arithmetic both engines reproduce bit-identically (the
    * CMS recipe — no ln, no float registers, so no cross-engine libm
    * risk the HLL linear-counting correction would carry). Below K
    * distinct values the sketch IS exact. Standard error ≈ 1/√(K−2) ≈
    * 6% at K=256, within the 10% relerr gate.
    */
  val KmvK = 256
  val KmvA = 736338301L
  val KmvB = 192838411L

  /** Median histogram cell width in integer cents: the portable KLL
    * stand-in for the money-grid `value` column — grouped counts over
    * `cents div 50` cells (bounded by range/0.50, merge = cell-wise
    * adds), estimate = the cell containing the lower median, answered
    * at its midpoint. Worst-case error = half a cell = 0.25 units
    * (~1% of the corpus median; 5% relerr gate). Unbounded domains
    * would take a log-grid; this column is bounded by construction.
    */
  val MedianCellCents = 50L

  /** Bounded per-partition bottom-k pass: at most k smallest DISTINCT
    * hash values PER GROUP per partition (fixed memory: k × groups,
    * group cardinality is the event-type dimension). The union of
    * per-partition bottom-k sets contains the global bottom-k of the
    * distinct values — any globally-bottom-k hash is within bottom-k
    * of every partition it appears in — so the merge (distinct + rank
    * ≤ k over the O(k·partitions) survivors) is exact, the Misra-Gries
    * shuffle-shape for order statistics.
    */
  private[graft] def bottomK(it: Iterator[(String, Long)],
                             k: Int): Iterator[(String, Long)] = {
    val m = new java.util.HashMap[String, java.util.TreeSet[java.lang.Long]]()
    it.foreach { case (g, h) =>
      val t = m.computeIfAbsent(g, _ => new java.util.TreeSet[java.lang.Long]())
      if (!t.contains(h)) {
        if (t.size < k) t.add(h)
        else if (h < t.last) { t.add(h); t.pollLast() }
      }
    }
    import scala.jdk.CollectionConverters._
    m.asScala.iterator.flatMap { case (g, t) =>
      t.asScala.iterator.map(h => (g, h.longValue))
    }.toArray.iterator
  }

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

  /** The d bucket ids of a charFold value, as a Spark array column —
    * row i's bucket is ((f·A_i + B_i) mod p) mod w. Exact 64-bit
    * integer arithmetic (f, A_i < p ≈ 10⁹ keeps products < 2⁶³), so
    * the oracle's SQL twin reproduces it bit-for-bit.
    */
  private[graft] def bucketArray(f: org.apache.spark.sql.Column) = {
    import graft.functions.TextFunctions.HashP
    array((0 until CmsDepth).map(i =>
      pmod(pmod(f * lit(CmsA(i)) + lit(CmsB(i)), lit(HashP)), lit(CmsWidth.toLong))): _*)
  }

  /** Driver-side twin of tokens→charFold→bucket (tokens are ASCII
    * [a-z0-9]+ by construction, so per-char codepoint == ascii()).
    */
  private[graft] def localBuckets(t: String): Seq[Long] = {
    val p = graft.functions.TextFunctions.HashP
    val f = t.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % p)
    (0 until CmsDepth).map(i => ((f * CmsA(i) + CmsB(i)) % p) % CmsWidth)
  }

  /** The heavy-hitter computation is a pure function of the table dir
    * and its result is driver-local by construction (k collected rows
    * + one total), so it memoizes per dir (the codebook/centroid
    * convention): the catalog query pays the build once per JVM and
    * the recall report's cms_bounds gate reuses it instead of
    * re-running the whole sketch + tokenize (27.5 s at sf1 — the r12
    * verdict's rcr-growth watch item).
    */
  private val hhMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(String, Long, Long)], Long)]()

  /** (token, cms_estimate, exact_tf) rows + the corpus token total
    * (Σ over row 0 of the sketch — no separate tokenize pass).
    */
  private[graft] def heavyHittersWithTotal(s: SparkSession,
      dir: String): (Seq[(String, Long, Long)], Long) =
    hhMemo.computeIfAbsent(dir, _ => computeHeavyHitters(s, dir))

  /** Top-k tokens with their CMS-estimated and exact total frequencies
    * (with multiplicity — term frequency, not document frequency).
    * Full-oracle entry: the DuckDB twin rebuilds the identical
    * portable sketch, so the estimates hash-compare cell-exactly.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    heavyHittersWithTotal(s, dir)._1
      .toDF("token", "cms_estimate", "exact_tf")
      .orderBy(col("exact_tf").desc, col("token"))
  }

  private def computeHeavyHitters(s: SparkSession,
      dir: String): (Seq[(String, Long, Long)], Long) = {
    import s.implicits._
    // the tokenize+explode feeds three actions (sketch build, candidate
    // pass, exact probe counts) — persist the exploded frame for the
    // query's lifetime so the regexp tokenization runs once, and
    // release it before returning (the output frame is built from
    // collected rows, so it holds no reference to the cache)
    val toks = Tables.documentsSpread(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE distributed grouped count builds the whole sketch: ≤ d·w
      // cells, map-side partials bounded by the same — the mergeable-
      // aggregate property of CMS expressed as a plain groupBy. The
      // fold hash projects to a NAMED column first: embedded in
      // bucketArray it would re-evaluate per array element (the r8
      // element_at-in-transform landmine — d× the per-token fold cost)
      val cells: Map[(Int, Long), Long] = toks
        .select(graft.functions.TextFunctions.charFoldHash(col("token")).as("f"))
        .select(posexplode(bucketArray(col("f"))).as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // row 0 partitions every token occurrence across its buckets
      val totalTokens = cells.collect { case ((0, _), c) => c }.sum
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
      val rows = top.toSeq.map { case (t, exact) =>
        val est = localBuckets(t).zipWithIndex
          .map { case (b, i) => cells((i, b)) }.min
        (t, est, exact)
      }
      (rows, totalTokens)
    } finally toks.unpersist(blocking = false)
  }

  /** DuckDB twin: the identical portable sketch, relationally — same
    * fold, same affine rows, same min-over-cells estimate. Generated
    * from the constants above (one source of truth).
    */
  def heavyHittersOracleSql: String = {
    val p = graft.functions.TextFunctions.HashP
    def fold(e: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
        s"(a, c) -> (a * 31 + c) % $p)"
    def buckets = (0 until CmsDepth)
      .map(i => s"WHEN ${i} THEN ((f * ${CmsA(i)} + ${CmsB(i)}) % $p) % $CmsWidth")
      .mkString(" ")
    val rows = (0 until CmsDepth).map(i => s"($i)").mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |hf AS (SELECT token, ${fold("token")} AS f FROM toks),
       |ex AS (
       |  SELECT token, r.i AS row, CASE r.i $buckets END AS bucket
       |  FROM hf, (VALUES $rows) AS r(i)),
       |sketch AS (SELECT row, bucket, count(*) AS c FROM ex GROUP BY 1, 2),
       |topk AS (
       |  SELECT token, count(*) AS tf FROM toks GROUP BY 1
       |  ORDER BY tf DESC, token LIMIT $HeavyHittersK),
       |pf AS (SELECT token, tf, ${fold("token")} AS f FROM topk),
       |pb AS (
       |  SELECT token, tf, r.i AS row, CASE r.i $buckets END AS bucket
       |  FROM pf, (VALUES $rows) AS r(i))
       |SELECT pb.token, CAST(min(s.c) AS BIGINT) AS cms_estimate,
       |  CAST(pb.tf AS BIGINT) AS exact_tf
       |FROM pb JOIN sketch s ON s.row = pb.row AND s.bucket = pb.bucket
       |GROUP BY pb.token, pb.tf
       |ORDER BY exact_tf DESC, token""".stripMargin
  }
}
