package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN path advisor: the catalog carries six ANN variants
  * (brute/LSH/IVF/learned-IVF/PQ/OPQ/IVF-PQ) with measured recall
  * curves (RecallSweep + the OPQ anisotropy spec) — this chooser reads
  * the two corpus statistics those curves actually hinge on and
  * returns the recommended variant with parameters and the
  * measured-recall rationale, so a user doesn't need sweep expertise:
  *
  *   - corpus SIZE decides whether an index pays for itself at all
  *     (below [[BruteMax]] a brute broadcast join wins) and whether
  *     cell pruning starts mattering (above [[IvfMin]], IVF-PQ's
  *     probe-pruned scan beats flat PQ's full-codes pass);
  *   - spectrum ANISOTROPY decides PQ vs OPQ: variance hoarded by few
  *     directions saturates plain PQ's dominant subspace (measured
  *     recall@5 collapse 0.98 → 0.24 on the generated anisotropic
  *     corpus, recovered to 0.92 by OPQ's learned rotation at
  *     rerank-10).
  *
  * Anisotropy is measured driver-locally on the deterministic bounded
  * training sample (`Similarity.trainingSample`, ≤ 8192 vectors — the
  * same sample every trainer in the family uses, so the advisor sees
  * exactly what training would see): covariance eigen-spectrum via
  * the OPQ module's Jacobi solver, summarized as the participation
  * ratio (Σλ)²/Σλ² normalized by the dimension — 1.0 for a perfectly
  * isotropic cloud, → 1/d as one direction hoards everything. At
  * 100 TB the advisor costs one metadata-cheap count plus the O(cap·d²)
  * local eigen pass — corpus-size-independent by the same argument as
  * the trainers.
  */
object AnnAdvisor {

  /** Below this, no index amortizes: brute top-k is one broadcast join. */
  val BruteMax = 256L

  /** Above this, cell pruning pays: flat PQ still scans every code row
    * per query batch, IVF-PQ reads only probed cells' files.
    */
  val IvfMin = 100000L

  /** Participation-ratio threshold separating "near-isotropic — plain
    * PQ's variance allocation is fine" from "anisotropic — rotate
    * first". Set between the measured shipped-corpus ratio (0.88,
    * where PQ and OPQ recall tie) and the generated anisotropic
    * corpus's (0.14, where plain PQ collapses to 0.24 recall@5) —
    * both printed by AnnAdvisorSpec.
    */
  val AnisoPrMax = 0.4

  /** Participation ratio of the sample's covariance spectrum, in
    * (0, 1]: (Σλ)² / (Σλ² · d). Mean-centered. Computed via the trace
    * identities Σλ = tr(C) and Σλ² = tr(C²) = ‖C‖²_F (exact for the
    * symmetric PSD covariance — no eigendecomposition), which makes
    * the whole statistic a composition of sequential double folds the
    * DuckDB oracle reproduces bit-for-bit (list_reduce in vec_id
    * order — see [[sqlAdvisor]]); the former Jacobi-eigenvalue path
    * computed the same quantity up to rotation round-off but was not
    * oracle-expressible. Callers must pass the sample in vec_id order
    * (the fold order IS the contract).
    */
  private[graft] def participationRatio(sample: Array[Array[Float]]): Double = {
    val d = sample.head.length
    val n = sample.length
    val mean = new Array[Double](d)
    sample.foreach { v =>
      var i = 0; while (i < d) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](d, d)
    sample.foreach { v =>
      var a = 0
      while (a < d) {
        val da = v(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += da * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    for (p <- 0 until d; q <- p until d) {
      cov(p)(q) /= n; cov(q)(p) = cov(p)(q)
    }
    var s1 = 0.0
    var a = 0
    while (a < d) { s1 += cov(a)(a); a += 1 }
    var s2 = 0.0
    a = 0
    while (a < d) {
      var b = 0
      while (b < d) { s2 += cov(a)(b) * cov(a)(b); b += 1 }
      a += 1
    }
    if (s2 <= 0.0) 1.0 else (s1 * s1) / (s2 * d)
  }

  /** The decision table, exposed for the spec: (variant, rationale). */
  private[graft] def recommendFromStats(n: Long, prRatio: Double): (String, String) =
    if (n <= BruteMax)
      ("brute",
        s"corpus has $n <= $BruteMax vectors: exact brute-force top-k is one " +
          "broadcast join; no index build amortizes at this size")
    else if (prRatio < AnisoPrMax)
      ("opq",
        f"anisotropic spectrum (participation ratio $prRatio%.4f < $AnisoPrMax): " +
          "plain PQ saturates its dominant subspace — measured recall@5 " +
          "0.24 (PQ) vs 0.92 (OPQ, rerank-10) on the equally anisotropic " +
          "generated corpus; OPQ's learned rotation rebalances the variance")
    else if (n >= IvfMin)
      ("ivf-pq",
        f"near-isotropic spectrum (participation ratio $prRatio%.4f) at $n " +
          s"vectors >= $IvfMin: probe-pruned cell scans beat flat PQ's " +
          "full-codes pass at this size — measured recall@5 0.96 at sf1")
    else
      ("pq",
        f"near-isotropic spectrum (participation ratio $prRatio%.4f), $n " +
          s"vectors < $IvfMin: flat PQ with exact rerank — measured " +
          "recall@5 0.98 at sf1; cell pruning doesn't pay below IvfMin")

  /** Below this label selectivity (percent of the corpus matching the
    * filter), pre-filtered brute beats post-filtered IVF: the probed
    * cells retain too few matching candidates for the probe budget to
    * cover the true top-k (the documented FAISS `IDSelector`
    * compromise — post-filter recall degrades with selectivity, not
    * corpus size), while the exact brute join over the filtered subset
    * costs only O(selectivity · corpus). Set between the failure
    * regime (~1%) and the shipped labels (~10–35%, where the catalog
    * measured post-filtered recall 0.48–0.76).
    */
  val FilteredBruteSelMaxPct = 10.0

  /** Probe-budget multiplier for the post-filtered path: the matching
    * candidates per probed cell thin in proportion to selectivity, so
    * the probe count scales with its inverse — ⌈100 / selPct⌉, i.e.
    * ×1 at a label covering the whole corpus, ×2 at 50%, up to the ×8
    * cap at the [[FilteredBruteSelMaxPct]] boundary (beyond which
    * brute wins anyway, so the cap is the live range's edge, not dead
    * code).
    */
  private[graft] def nprobeScale(selPct: Double): Int =
    math.min(8, math.max(1, math.ceil(100.0 / selPct).toInt))

  /** The filtered-search decision table (third advisor axis —
    * selectivity; sizes still gate first).
    */
  private[graft] def recommendFilteredFromStats(n: Long, selPct: Double)
      : (String, String) =
    if (n <= BruteMax)
      ("filtered-brute",
        s"corpus has $n <= $BruteMax vectors: the filtered brute join is " +
          "one broadcast hash join on the label; nothing to index")
    else if (selPct < FilteredBruteSelMaxPct)
      ("filtered-brute",
        f"label matches only $selPct%.1f%% of the corpus (< " +
          f"$FilteredBruteSelMaxPct%.0f%%): probed cells retain too few " +
          "matching candidates for post-filtered IVF to cover the top-k " +
          "(recall degrades with selectivity — the FAISS IDSelector " +
          "compromise); exact brute over the pre-filtered subset costs " +
          "only the matching fraction of one scan")
    else
      ("ivf-postfilter",
        f"label matches $selPct%.1f%% of the corpus: probed cells keep " +
          f"enough matching candidates — post-filtered IVF with the probe " +
          f"budget scaled ×${nprobeScale(selPct)} (measured recall " +
          f"0.48-0.76 vs filtered brute at the shipped ~10-35%% labels)")

  /** Per-label filtered-search advice (`q_ann_advisor_filtered`,
    * rows-only): label selectivities read from the SAME bounded
    * training sample the trainers use (≤ TrainSampleCap rows — at
    * 100 TB this is one thinned scan, label cardinality assumed
    * bounded like every groupBy-key audit in the catalog).
    */
  def recommendFiltered(s: SparkSession, dir: String): DataFrame = {
    val base = Similarity.normed(s, dir)
    val n = base.count()
    val sample = Similarity.trainingSample(
      graft.Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").as("e"), col("label"))
        .withColumn("nrm", sqrt(graft.plans.ArrayOps.dotF(col("e"), col("e")))))
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val total = math.max(1L, sample.map(_._2).sum)
    import s.implicits._
    sample.toSeq.sortBy(_._1).map { case (label, cnt) =>
      val selPct = cnt.toDouble * 100.0 / total
      val (variant, rationale) = recommendFilteredFromStats(n, selPct)
      val params = variant match {
        case "filtered-brute" => s"topk=${Similarity.TopK}"
        case _ =>
          s"nprobe_scale=${nprobeScale(selPct)}," +
            s"base_nprobe>=${Similarity.IvfNProbe}"
      }
      (label, math.floor(selPct * 100.0 + 0.5) / 100.0, variant, params, rationale)
    }.toDF("label", "sel_pct", "variant", "params", "rationale")
  }

  /** One-row recommendation frame (`q_ann_advisor`, rows-only: the
    * verdict is a measured-policy output, not SQL-expressible).
    */
  def recommend(s: SparkSession, dir: String): DataFrame = {
    val base = Similarity.normed(s, dir)
    val n = base.count()
    // vec_id sort fixes the fold order: collect() order follows task
    // completion, and the mean/covariance double accumulations are
    // order-sensitive — the oracle folds in vec_id order, so must we
    val sample = Similarity.trainingSample(base)
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        val nm = r.getDouble(2)
        if (nm > 0.0) e.map(x => (x / nm).toFloat) else e
      }
    // empty corpus: the n <= BruteMax branch wins regardless of the
    // spectrum, so don't compute one (participationRatio needs at least
    // one vector; an empty table used to throw NoSuchElementException
    // out of sample.head instead of returning the trivial verdict)
    val pr = if (sample.isEmpty) 1.0 else participationRatio(sample)
    val (variant, rationale) = recommendFromStats(n, pr)
    val params = variant match {
      case "brute" => s"topk=${Similarity.TopK}"
      case "pq" | "opq" =>
        s"m=${Similarity.PqM},k=${Similarity.PqK},rerank=${Similarity.PqRerank}"
      case _ =>
        s"m=${Similarity.PqM},k=${Similarity.PqK},rerank=${Similarity.PqRerank}," +
          s"nprobe>=${Similarity.IvfNProbe}"
    }
    import s.implicits._
    Seq((n, sample.headOption.map(_.length).getOrElse(0),
        math.floor(pr * 1e4 + 0.5) / 1e4, variant, params, rationale))
      .toDF("n_vectors", "dim", "aniso_pr", "variant", "params", "rationale")
  }

  // ---- catalog projections + oracle SQL ----------------------------------

  /** `q_ann_advisor`: the oracle-checked columns of [[recommend]] —
    * the measured-rationale prose stays on the API, the decision
    * inputs (n, spectrum statistic) and the decision itself ride the
    * driver's hash gate.
    */
  def advisorVerdict(s: SparkSession, dir: String): DataFrame =
    recommend(s, dir).select("n_vectors", "dim", "aniso_pr", "variant", "params")

  /** `q_ann_advisor_filtered`: oracle-checked columns of
    * [[recommendFiltered]].
    */
  def advisorFilteredVerdict(s: SparkSession, dir: String): DataFrame =
    recommendFiltered(s, dir).select("label", "sel_pct", "variant", "params")

  private def d = Similarity.Dim

  /** Full DuckDB oracle for `q_ann_advisor`, generated from the SAME
    * decision constants the Scala path uses (one source of truth).
    * The participation ratio is reproduced bit-for-bit via the trace
    * identities: every mean and covariance entry is a sequential
    * double fold in vec_id order (`list_reduce` ≡ the driver-local
    * loop after [[recommend]]'s vec_id sort), normalization is the
    * same CAST(x/nrm AS REAL), and tr(C)²/(tr(C²)·d) needs no
    * eigenvalues. Valid while the corpus is within
    * [[Similarity.TrainSampleCap]] (every shipped correctness SF) —
    * above it the Scala side sees the stride sample, the same caveat
    * as the learned-centroid cluster family.
    */
  val sqlAdvisor: String = {
    val dot = Similarity.sqlDot("embedding", "embedding")
    val paramsPq = s"m=${Similarity.PqM},k=${Similarity.PqK},rerank=${Similarity.PqRerank}"
    s"""WITH nn AS (
       |  SELECT vec_id, embedding, sqrt($dot) AS nrm FROM embeddings),
       |x AS (
       |  SELECT vec_id,
       |    list_transform(generate_series(1, $d),
       |      i -> CASE WHEN nrm > 0 THEN CAST(CAST(embedding[i] AS DOUBLE) / nrm AS REAL)
       |                ELSE embedding[i] END) AS v
       |  FROM nn),
       |c AS (SELECT count(*) AS n FROM x),
       |mu AS (
       |  SELECT u.j AS j,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list(CAST(v[u.j] AS DOUBLE) ORDER BY vec_id)), (a, t) -> a + t)
       |      / (SELECT n FROM c) AS m
       |  FROM x CROSS JOIN unnest(generate_series(1, $d)) AS u(j)
       |  GROUP BY u.j),
       |cent AS (
       |  SELECT x.vec_id, u.j AS j, CAST(x.v[u.j] AS DOUBLE) - mu.m AS dx
       |  FROM x CROSS JOIN unnest(generate_series(1, $d)) AS u(j)
       |  JOIN mu ON mu.j = u.j),
       |cov AS (
       |  SELECT p.j AS a, q.j AS b,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list(p.dx * q.dx ORDER BY p.vec_id)), (acc, t) -> acc + t)
       |      / (SELECT n FROM c) AS cv
       |  FROM cent p JOIN cent q ON p.vec_id = q.vec_id
       |  GROUP BY p.j, q.j),
       |tr AS (
       |  SELECT
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list(cv ORDER BY a) FILTER (WHERE a = b)), (acc, t) -> acc + t) AS s1,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list(cv * cv ORDER BY a, b)), (acc, t) -> acc + t) AS s2
       |  FROM cov),
       |pr AS (
       |  SELECT CASE WHEN (SELECT n FROM c) = 0 THEN CAST(1 AS DOUBLE)
       |              WHEN s2 <= 0 THEN CAST(1 AS DOUBLE)
       |              ELSE (s1 * s1) / (s2 * $d) END AS pr
       |  FROM tr)
       |SELECT CAST(n AS BIGINT) AS n_vectors,
       |  CAST(CASE WHEN n = 0 THEN 0 ELSE $d END AS INT) AS dim,
       |  floor(pr * 1e4 + 0.5) / 1e4 AS aniso_pr,
       |  CASE WHEN n <= $BruteMax THEN 'brute'
       |       WHEN pr < CAST($AnisoPrMax AS DOUBLE) THEN 'opq'
       |       WHEN n >= $IvfMin THEN 'ivf-pq'
       |       ELSE 'pq' END AS variant,
       |  CASE WHEN n <= $BruteMax THEN 'topk=${Similarity.TopK}'
       |       WHEN pr < CAST($AnisoPrMax AS DOUBLE) THEN '$paramsPq'
       |       WHEN n >= $IvfMin THEN '$paramsPq,nprobe>=${Similarity.IvfNProbe}'
       |       ELSE '$paramsPq' END AS params
       |FROM c, pr""".stripMargin
  }

  /** Full DuckDB oracle for `q_ann_advisor_filtered`: label counts are
    * integers, selectivity is one IEEE division both engines compute
    * identically, and the probe-scale is integer arithmetic — same
    * TrainSampleCap validity window as [[sqlAdvisor]].
    */
  val sqlAdvisorFiltered: String =
    s"""WITH c AS (SELECT count(*) AS n FROM embeddings),
       |g AS (SELECT label, count(*) AS cnt FROM embeddings GROUP BY label),
       |t AS (SELECT CAST(greatest(1, sum(cnt)) AS BIGINT) AS total FROM g),
       |sel AS (
       |  SELECT label, (CAST(cnt AS DOUBLE) * CAST(100 AS DOUBLE)) / total AS sp
       |  FROM g, t)
       |SELECT CAST(label AS INT) AS label,
       |  floor(sp * CAST(100 AS DOUBLE) + 0.5) / 100 AS sel_pct,
       |  CASE WHEN (SELECT n FROM c) <= $BruteMax THEN 'filtered-brute'
       |       WHEN sp < CAST($FilteredBruteSelMaxPct AS DOUBLE) THEN 'filtered-brute'
       |       ELSE 'ivf-postfilter' END AS variant,
       |  CASE WHEN (SELECT n FROM c) <= $BruteMax
       |            OR sp < CAST($FilteredBruteSelMaxPct AS DOUBLE)
       |         THEN 'topk=${Similarity.TopK}'
       |       ELSE 'nprobe_scale='
       |         || CAST(least(8, greatest(1, CAST(ceil(CAST(100 AS DOUBLE) / sp) AS BIGINT))) AS VARCHAR)
       |         || ',base_nprobe>=${Similarity.IvfNProbe}'
       |  END AS params
       |FROM sel ORDER BY label""".stripMargin
}
