package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents corpus (SURVEY §2.6).
  *
  * All pure `functions._` column arithmetic — single scan, no shuffle
  * except final presentation sort; at 100 TB these are embarrassingly
  * parallel map-only plans that stay inside whole-stage codegen.
  */
object TextAnalysis {

  /** §2.6 #32 — whitespace + BPE-ish regex token counts. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy("doc_id")

  /** §2.6 #33 — composite quality score (length/punct/stopword ratios). */
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Hash-gate multiplier for [[qualitySample]] (Knuth multiplicative
    * constant — the same gate family as the domain-mix and keyed-sample
    * operators).
    */
  val QualitySampleA = 2654435761L

  /** Quality-WEIGHTED sampling (`q_quality_sample`): keep each document
    * with probability equal to its quality score — the soft
    * (importance-sampling) alternative to a hard quality cutoff that
    * classifier-filtered pretraining corpora use (keep some low-quality
    * mass, deterministically, instead of a cliff at a threshold).
    *
    * The score is exactly k/10⁴ by construction (portable floor
    * rounding in qualityScore), so `floor(q·10⁴ + 0.5)` recovers the
    * integer per-myriad threshold exactly in both engines and the keep
    * decision is an integer compare against a portable hash bucket —
    * reproducible under any partitioning, no RNG. Map-only plan: the
    * gate rides the scan; the only exchange is the parity sort.
    */
  def qualitySample(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val out = qualitySampleColumns(Tables.documentsSpread(s, dir))
    // terminal sort = parity contract only (corpus-sized sample)
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Frame-level form of the quality-sample gate (stateless map —
    * applies unchanged to a streaming source, like gopherColumns).
    */
  private[graft] def qualitySampleColumns(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .filter(pmod(col("doc_id") * lit(QualitySampleA), lit(2147483648L)) % 10000 <
        floor(col("quality") * lit(10000.0) + lit(0.5)).cast("long"))

  /** §2.6 #34 — language-ID heuristic (marker-token overlap argmax). */
  def languageId(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("lang").as("declared_lang"),
        langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** §2.6 #35 — portable rolling-hash document fingerprint. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), docFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** The PII redaction chain (emails, URLs, long digit runs →
    * placeholder tokens) — shared by the standalone scrub query and the
    * composed cleaning pipeline. Pure codegen'd regexps.
    */
  private[graft] def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""", "<EMAIL>"),
        """https?://[^\s]+""", "<URL>"),
      "[0-9]{6,}", "<NUM>")

  /** PII scrubbing — the redaction pass every training-data pipeline
    * runs before tokenization.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), scrubPii(col("text")).as("scrubbed"))
      .orderBy("doc_id")

  val PipelineQualityMin = 0.5

  /** §2.1b — the composed CLEANING PIPELINE: the pass every training
    * corpus goes through before tokenization, as ONE query — quality
    * gate, language gate, exact content dedup (keep lowest doc_id),
    * PII scrub. Plan shape at 100 TB: quality/lang-ID/scrub are
    * map-only column arithmetic riding the scan; the only shuffle is
    * the content-hash dedup — so the whole pipeline costs one scan +
    * one shuffle no matter how many gates compose.
    */
  def cleanPipeline(s: SparkSession, dir: String): DataFrame = {
    val gated = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("text"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("pred_lang"))
      .filter(col("quality") >= PipelineQualityMin && col("pred_lang") =!= "unknown")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")
    gated.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        scrubPii(col("text")).as("scrubbed"))
      .orderBy("doc_id")
  }

  /** The end-to-end corpus→training-sequences pipeline
    * (`q_corpus_pipeline`): quality gate ∧ language gate ∧ exact
    * content dedup ∧ PII scrub (the [[cleanPipeline]] stages), then the
    * survivors tokenized and PACKED into fixed-length training
    * sequences — the whole "raw documents to loader-ready chunk map"
    * path as ONE composed query. Demonstrates the library's operators
    * composing without materialization barriers: the gates ride the
    * scan, the dedup window is the only corpus exchange before packing,
    * and packing adds its bucket-cumsum exchange + bounded offset
    * broadcast (ExtendedAnalytics.packOn).
    */
  def corpusPipeline(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame =
    ExtendedAnalytics.packOn(s, survivorCounts(s, dir), ordered)

  /** Gated + deduped survivor token counts, persisted: packOn executes
    * its input twice (totals pass + chunk-map pass), and the gates +
    * md5-dedup window are the expensive half of the pipeline — the
    * cached frame is (doc_id, ntok), 16 B/row, three orders smaller
    * than the text it derives from (the shingled()-cache argument).
    * Session-scoped via CacheManager plan identity; released by
    * [[releasePipelineCache]] (Verify/Bench call it after their loops).
    */
  private def survivorCounts(s: SparkSession, dir: String): DataFrame =
    survivorCountsPlan(s, dir)
      .transform(graft.plans.Memo.cached)

  private def survivorCountsPlan(s: SparkSession, dir: String): DataFrame = {
    val gated = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("text"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("pred_lang"))
      .filter(col("quality") >= PipelineQualityMin && col("pred_lang") =!= "unknown")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")
    gated
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("doc_id"),
        size(tokens(scrubPii(col("text")))).cast("long").as("ntok"))
  }

  /** Drop the session-scoped survivor-counts and LM-score caches for
    * `dir`.
    */
  def releasePipelineCache(s: SparkSession, dir: String): Unit = {
    survivorCountsPlan(s, dir).unpersist()
    lmScoreFramePlan(s, dir).unpersist()
  }

  /** Materialize the session-persisted pipeline frames (survivor
    * counts, bigram-LM scores) for Bench's `shared_` attribution.
    */
  private[graft] def warmPipelineCache(s: SparkSession, dir: String): Unit = {
    survivorCounts(s, dir).count()
    lmScoreFrame(s, dir).count()
  }

  val ContaminationEvalDocs = 5
  val ContaminationShingleN = 5
  /** Size gate for [[contaminationScore]]'s map-only literal path:
    * above this many distinct eval shingles the eval set stops being a
    * plan literal and becomes a broadcast join side.
    */
  val ContaminationLiteralMax = 100000L

  /** Benchmark-contamination detection: corpus documents sharing any
    * word 5-gram with the held-out eval set (doc_id < 5 stands in for
    * the benchmark). Semi join on shingle hashes — O(matches) shuffle,
    * the decontamination shape that scales to a 100 TB corpus vs a
    * fixed eval set (broadcast the eval shingles).
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), explode(shingleHashes(col("text"), ContaminationShingleN)).as("h"))
    val eval_ = docs.filter(col("doc_id") < ContaminationEvalDocs).select("h").distinct()
    docs.filter(col("doc_id") >= ContaminationEvalDocs)
      .join(broadcast(eval_), "h")
      .select("doc_id").distinct()
      .orderBy("doc_id")
  }

  /** Per-document contamination SCORE (`q_contamination_score`):
    * [[contamination]] says WHICH corpus documents share any eval
    * 5-gram; this says HOW MUCH — per contaminated document, its
    * distinct-shingle count, the number found in the eval set, and
    * the overlap fraction (the threshold real decontamination sweeps
    * tune on: drop at ≥X% overlap, keep incidental single-gram hits).
    *
    * Scale shape, SIZE-GATED: a small eval set (≤ [[ContaminationLiteralMax]]
    * distinct shingles — the shipped fixture) collects to the driver
    * and the corpus pass is MAP-ONLY: per-doc `array_intersect`
    * against the plan literal, no explode, no shuffle. A real
    * decontamination suite (~10⁶ 5-grams) as a Catalyst literal would
    * bloat the plan tree and every task closure, so ABOVE the gate the
    * operator switches to the broadcast-join form the sibling
    * [[contamination]] uses — explode + broadcast left join + per-doc
    * count — which computes the identical columns (shingleHashes
    * dedupes per doc, so the exploded count IS n_shingles). The
    * fraction is floor(x·1e4+0.5)/1e4 with identical association
    * order in both engines (the .5-boundary rule).
    */
  def contaminationScore(s: SparkSession, dir: String,
                         literalMax: Long = ContaminationLiteralMax): DataFrame = {
    val evalSet = Tables.documentsSpread(s, dir)
      .filter(col("doc_id") < ContaminationEvalDocs)
      .select(explode(shingleHashes(col("text"), ContaminationShingleN)).as("h"))
      .distinct()
    val sh = shingleHashes(col("text"), ContaminationShingleN)
    val corpus = Tables.documentsSpread(s, dir)
      .filter(col("doc_id") >= ContaminationEvalDocs)
    val scored =
      if (evalSet.count() <= literalMax) {
        val evalHashes = evalSet.collect().map(_.getLong(0)).sorted
        corpus.select(col("doc_id"),
          size(sh).cast("long").as("n_shingles"),
          size(array_intersect(sh, typedLit(evalHashes))).cast("long").as("n_hit"))
      } else {
        corpus.select(col("doc_id"), explode(sh).as("h"))
          .join(broadcast(evalSet.withColumn("_hit", lit(1L))), Seq("h"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            coalesce(sum("_hit"), lit(0L)).as("n_hit"))
      }
    scored
      .filter(col("n_hit") > 0)
      .withColumn("overlap",
        floor(col("n_hit") * lit(10000.0) / col("n_shingles") + lit(0.5)) / 10000.0)
      .orderBy("doc_id")
  }

  def contaminationScoreOracleSql: String = {
    val n = ContaminationShingleN
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (a, c) -> (a * 31 + c) % 1000000007) AS h
       |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
       |          generate_series(1, len(t) - ${n - 1}),
       |          i -> array_to_string(t[i:i + ${n - 1}], ' ')))) AS g
       |        FROM toks WHERE len(t) >= $n)),
       |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id < $ContaminationEvalDocs)
       |SELECT doc_id, n_shingles, n_hit,
       |       floor(n_hit * 10000.0 / n_shingles + 0.5) / 10000.0 AS overlap
       |FROM (
       |  SELECT s.doc_id,
       |         CAST(count(DISTINCT s.h) AS BIGINT) AS n_shingles,
       |         CAST(count(DISTINCT e.h) AS BIGINT) AS n_hit
       |  FROM sh s LEFT JOIN ev e ON s.h = e.h
       |  WHERE s.doc_id >= $ContaminationEvalDocs GROUP BY 1
       |) WHERE n_hit > 0
       |ORDER BY doc_id""".stripMargin
  }

  val TfIdfTopK = 3

  /** TF-IDF top terms per document: tf with multiplicity, idf =
    * ln(N/df), top-k by rounded score. The corpus size N is a scalar
    * aggregate cross-joined in (no separate driver `count()` action /
    * extra scan), and the tf⋈df join is left to AQE — the vocabulary df
    * table grows with the corpus, so force-broadcasting it is unbounded
    * at 100 TB; AQE broadcasts only when the runtime size actually fits.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(s, dir)
    val nDf = docs.agg(count(lit(1)).cast("double").as("_n"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(df_, "token")
      .crossJoin(broadcast(nDf))
      .withColumn("score", round(col("tf") * log(col("_n") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TfIdfTopK)
      .select(col("doc_id"), col("rank"), col("token"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Near-duplicate cluster assignment: connected components over the
    * verified Jaccard pair graph via alternating large-star/small-star
    * contraction ([[Components]]) — O(log² n) rounds independent of
    * component DIAMETER, where the previous min-label propagation paid
    * one full join+agg job per hop of the longest chain (transitive
    * near-dup runs are exactly the chain-shaped case at crawl scale).
    * Result is exact: cluster_id = min doc_id in the component,
    * identical to propagation's fixpoint.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    // checkpoint the verified pairs first — the contraction reads the
    // edge frame repeatedly and must not re-run the shingle/
    // co-occurrence pipeline (the most expensive stage here) per round;
    // the session-persisted pair frame also means this query and
    // q_dedup_ngram_jaccard share ONE verify run
    val pairs = graft.operators.Dedup.ngramPairs(s, dir).select("doc_a", "doc_b")
      .localCheckpoint()
    Components.connectedComponents(pairs, "doc_a", "doc_b").orderBy("doc_id")
  }

  /** Cluster-representative selection (`q_cluster_reps`): the ACTION
    * step after near-dup clustering — per cluster, KEEP the
    * highest-quality member (doc_id tiebreak) and drop the rest; the
    * table a dedup pass materializes to decide which copy trains.
    * Output per cluster: member count, representative id + quality,
    * dropped count.
    *
    * Shape: rides [[dedupClusters]] (itself riding the session-
    * persisted verified-pair frame) joined to map-side quality; the
    * per-cluster argmax is one max(struct) aggregate over the integer
    * 4-dp quality grid with the −doc_id tiebreak (total order by
    * construction — the q_knn_label_acc pattern, no window); the
    * output frame is cluster-cardinality.
    */
  def clusterReps(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        floor(qualityScore(col("text")) * lit(1e4) + lit(0.5)).cast("long")
          .as("qint"))
    dedupClusters(s, dir)
      .join(q, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("qint"), (-col("doc_id")).as("negid"))).as("best"))
      .select(col("cluster_id"), col("n_members"),
        (-col("best.negid")).as("rep_doc_id"),
        (col("best.qint").cast("double") / 1e4).as("rep_quality"),
        (col("n_members") - lit(1L)).as("n_dropped"))
      .orderBy("cluster_id")
  }

  /** Laplace pseudo-count for the bigram LM. */
  val LmAlpha = 1
  /** Score rounding — log arithmetic never lands on exact .5
    * boundaries, so plain round() agrees across engines here.
    */
  val LmScoreDp = 4

  /** §2.6 #35b — bigram-LM quality scoring (`q_lm_score`): the
    * CCNet/Gopher-style perplexity filter — train a Laplace-smoothed
    * bigram LM on the corpus, score every document by average negative
    * log-likelihood; high scores = LM-improbable text (boilerplate,
    * noise, wrong-language) that a pretraining pipeline gates out.
    *
    * Distributed shape: the MODEL is two aggregations (bigram counts;
    * history counts derived from them — no second corpus pass) plus a
    * scalar vocabulary size; SCORING is one equi-join of the per-doc
    * bigram stream against the model (the model is corpus-vocabulary-
    * sized, so AQE broadcasts it when small and shuffles when not) and
    * one per-doc aggregation. At 100 TB the model build and the
    * scoring pass are each one shuffle.
    *
    * Cross-engine determinism: counts and the smoothed ratio are exact
    * integer/double arithmetic; `ln` is 1-ulp in both engines; the
    * per-doc sum folds the POSITION-SORTED log list sequentially (the
    * HOF `aggregate` here, `list_reduce` over `list(... ORDER BY pos)`
    * in the oracle), so both engines add in the same order and the
    * 4-dp rounding absorbs last-ulp drift.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreFrame(s, dir)
      .select(col("doc_id"), col("n_pairs"), col("lm_score"))
      .orderBy("doc_id")

  /** LM-scored frame with the document's declared language carried
    * through (`(doc_id, lang, n_pairs, lm_score)`, unsorted) — shared
    * by [[lmScore]] and the CCNet-style perplexity bucketing
    * (CorpusCuration.pplBuckets, which needs the scores TWICE: once
    * for per-lang tercile thresholds, once for the per-doc bucket
    * assignment). Persisted for the session — the frame is 4 columns
    * ≈ 30 B/row, three orders smaller than the bigram stream it
    * derives from; released by [[releasePipelineCache]]. Carrying
    * `lang` through the existing groupBy is free (functionally
    * dependent on doc_id) and saves pplBuckets a corpus-sized join.
    */
  private[operators] def lmScoreFrame(s: SparkSession, dir: String): DataFrame =
    lmScoreFramePlan(s, dir)
      .transform(graft.plans.Memo.cached)

  private def lmScoreFramePlan(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    val pairs = docs.select(col("doc_id"), col("lang"), posexplode(
        transform(sequence(lit(0), size(col("ts")) - 2),
          i => struct(element_at(col("ts"), i + 1).as("w1"),
            element_at(col("ts"), i + 2).as("w2")))).as(Seq("pos", "pr")))
      .select(col("doc_id"), col("lang"), col("pos"),
        col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // history counts = Σ_w2 c(w1,w2), derived from the bigram model
    // itself — never a second pass over the corpus
    val uni = big.groupBy("w1").agg(sum("cb").as("cu"))
    val vocab = docs.select(explode(col("ts")).as("t"))
      .agg(countDistinct("t").as("v"))
    val scored = pairs
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp", log((col("cb") + lit(LmAlpha)).cast("double") /
        (col("cu") + lit(LmAlpha) * col("v")).cast("double")))
    scored.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_pairs"),
        aggregate(transform(array_sort(collect_list(struct(col("pos"), col("logp")))),
          x => x.getField("logp")), lit(0.0), (a, x) => a + x).as("ll"))
      .select(col("doc_id"), col("lang"), col("n_pairs"),
        round(-col("ll") / col("n_pairs"), LmScoreDp).as("lm_score"))
  }

  /** Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
    * Models", table A1 document-filter heuristics — public paper). Word
    * bounds tightened at the low end so the rule discriminates on this
    * corpus (10–99-word docs); the band semantics are the paper's.
    */
  val GopherMinWords = 30
  val GopherMaxWords = 100000
  val GopherMinMeanWordLen = 3.0
  val GopherMaxMeanWordLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinStopwordHits = 2
  val GopherStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it")
  /** Shared 4-dp rounding exponent for the rule ratios. */
  val GopherDp = 1e4

  /** Rationals (p/q of small ints) can land exactly on .5 rounding
    * boundaries where Spark and DuckDB `round()` disagree — shared
    * floor-shift rounding on both sides (CLAUDE.md parity trap).
    */
  private def r4(c: Column): Column = floor(c * GopherDp + 0.5) / GopherDp

  /** §2.6 #36b — Gopher-style document quality rules (`q_gopher_filter`):
    * the pretraining-corpus gate from the Gopher paper — word-count
    * bounds, mean-word-length band, symbol-to-word ratio cap (`#` and
    * `...`), and minimum stopword evidence; `keep` is the conjunction.
    *
    * Distributed shape: pure per-row column arithmetic over the token
    * array (higher-order `aggregate`/`filter`, all codegen) — map-only,
    * rides a single scan, embarrassingly parallel at 100 TB.
    */
  /** `ordered=true` (the default) appends the deterministic terminal
    * sort the oracle-parity harness hashes against. It is the
    * VERIFICATION contract, not a plan requirement — at production
    * scale pass `ordered=false`: a corpus-sized gate output has no
    * business paying a global range-exchange + sort for row order no
    * downstream consumer needs (see README "Determinism vs scale").
    */
  def gopherFilter(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val out = gopherColumns(Tables.documentsSpread(s, dir))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** The gate over any (doc_id, text) frame — map-only column
    * arithmetic, so it applies unchanged to a STREAMING documents
    * source (the corpus-ingest gate runs in the stream path with no
    * state; StreamingSpec proves stream == batch row-for-row).
    */
  private[graft] def gopherColumns(docs: DataFrame): DataFrame = {
    val stop = array(GopherStopwords.map(lit): _*)
    // zero-token guard: a doc with no [a-z0-9] tokens must come out as
    // keep=false (n_words=0), not crash the job — Spark 4 runs ANSI
    // mode by default, where /0 throws instead of yielding null. The
    // greatest(n,1) denominator is shared with the oracle.
    val denom = greatest(size(col("ts")), lit(1)).cast("double")
    docs
      .select(col("doc_id"), tokens(col("text")).as("ts"), col("text"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_words"),
        r4(aggregate(col("ts"), lit(0L), (a, w) => a + length(w)).cast("double") /
          denom).as("mean_word_len"),
        size(filter(col("ts"), w => array_contains(stop, w))).cast("long")
          .as("stopword_hits"),
        r4(((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
            .cast("long"))
          .cast("double") / denom).as("symbol_ratio"))
      .withColumn("keep",
        col("n_words").between(GopherMinWords, GopherMaxWords) &&
          col("mean_word_len").between(GopherMinMeanWordLen, GopherMaxMeanWordLen) &&
          col("symbol_ratio") < GopherMaxSymbolRatio &&
          col("stopword_hits") >= GopherMinStopwordHits)
  }

  /** DuckDB oracle for [[gopherFilter]] — same constants, same
    * floor-shift rounding; `//` avoided (DuckDB `/` is float division,
    * the ellipsis third must stay integer like Spark's long division).
    */
  def gopherOracleSql: String = {
    val stop = GopherStopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    CAST(len(ts) AS BIGINT) AS n_words,
       |    floor(CAST(coalesce(list_aggregate(list_transform(ts, w -> length(w)), 'sum'), 0)
       |          AS DOUBLE) / greatest(len(ts), 1) * ${GopherDp.toLong} + 0.5) / ${GopherDp.toLong}
       |      AS mean_word_len,
       |    CAST(len(list_filter(ts, w -> w IN $stop)) AS BIGINT) AS stopword_hits,
       |    floor(CAST((length(text) - length(replace(text, '#', ''))) +
       |          (length(text) - length(replace(text, '...', ''))) // 3
       |          AS DOUBLE) / greatest(len(ts), 1) * ${GopherDp.toLong} + 0.5) / ${GopherDp.toLong}
       |      AS symbol_ratio
       |  FROM t)
       |SELECT doc_id, n_words, mean_word_len, stopword_hits, symbol_ratio,
       |  (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |   AND mean_word_len BETWEEN $GopherMinMeanWordLen AND $GopherMaxMeanWordLen
       |   AND symbol_ratio < $GopherMaxSymbolRatio
       |   AND stopword_hits >= $GopherMinStopwordHits) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Repetition-rule minimum tokens: 5-grams need >=5 tokens; >=6 keeps
    * at least two so the duplicate fraction is defined non-trivially.
    */
  val RepMinTokens = 6

  /** §2.6 #36c — repetition removal (`q_repetition`): the Gopher/C4
    * duplicate-n-gram rules — per document, the fraction of 2-gram
    * occurrences taken by the single most frequent 2-gram (`top2_frac`)
    * and the fraction of 5-gram occurrences that are repeats of an
    * already-seen 5-gram (`dup5_frac`). High values = boilerplate /
    * template spam a pretraining pipeline drops.
    *
    * Distributed shape: both gram sizes ride ONE scan — a single
    * `explode` emits (n, gram) tagged rows for both sizes, then two
    * hash aggregations keyed on (doc_id, n, gram) and doc_id, both with
    * map-side partial aggregation. One shuffle chain, no windows, no
    * per-doc quadratic work; at 100 TB the shuffle carries one row per
    * distinct (doc, gram), already combiner-reduced.
    */
  /** `ordered` as in [[gopherFilter]]: the terminal sort is the oracle
    * contract; corpus-scale callers take the unsorted frame.
    */
  def repetition(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    def gramStructs(nGram: Int) =
      transform(sequence(lit(1), size(col("ts")) - (nGram - 1)),
        i => struct(lit(nGram).as("n"),
          array_join(slice(col("ts"), i, lit(nGram)), " ").as("gram")))
    val grams = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= RepMinTokens)
      .select(col("doc_id"),
        explode(concat(gramStructs(2), gramStructs(5))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val counted = grams.groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
    val out = counted.groupBy("doc_id")
      .agg(
        sum(when(col("n") === 2, col("cnt"))).as("n2"),
        max(when(col("n") === 2, col("cnt"))).as("_m2"),
        sum(when(col("n") === 5, col("cnt"))).as("_t5"),
        count(when(col("n") === 5, lit(1))).as("_d5"))
      .select(col("doc_id"), col("n2"),
        r4(col("_m2").cast("double") / col("n2")).as("top2_frac"),
        r4(lit(1.0) - col("_d5").cast("double") / col("_t5")).as("dup5_frac"))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** DuckDB oracle for [[repetition]] — same gram derivation (DuckDB
    * list slices are INCLUSIVE: `ts[i:i+1]` is the 2-gram) and the same
    * floor-shift rounding.
    */
  def repetitionOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, 2 AS n,
       |         unnest(list_transform(generate_series(1, len(ts) - 1),
       |                i -> array_to_string(ts[i:i + 1], ' '))) AS gram
       |  FROM t WHERE len(ts) >= $RepMinTokens
       |  UNION ALL
       |  SELECT doc_id, 5,
       |         unnest(list_transform(generate_series(1, len(ts) - 4),
       |                i -> array_to_string(ts[i:i + 4], ' '))) AS gram
       |  FROM t WHERE len(ts) >= $RepMinTokens
       |), c AS (
       |  SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
       |SELECT doc_id,
       |  CAST(sum(cnt) FILTER (WHERE n = 2) AS BIGINT) AS n2,
       |  floor(CAST(max(cnt) FILTER (WHERE n = 2) AS DOUBLE)
       |        / sum(cnt) FILTER (WHERE n = 2)
       |        * ${GopherDp.toLong} + 0.5) / ${GopherDp.toLong} AS top2_frac,
       |  floor((1.0 - CAST(count(*) FILTER (WHERE n = 5) AS DOUBLE)
       |        / sum(cnt) FILTER (WHERE n = 5))
       |        * ${GopherDp.toLong} + 0.5) / ${GopherDp.toLong} AS dup5_frac
       |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Chunking geometry: ChunkLen-token windows every ChunkStride tokens
    * (overlap = ChunkLen − ChunkStride = 16) — the sliding-window
    * sequence prep (Dai et al. 2019 §3.1 "context fragmentation";
    * RoBERTa's FULL-SENTENCES packing uses the same stride-overlap
    * shape) as opposed to q_pack_sequences' disjoint greedy packing.
    */
  val ChunkLen = 64
  val ChunkStride = 48

  /** §2.6 — training-sequence chunking (`q_chunk_docs`): split each
    * document's token stream into ChunkLen-token windows starting every
    * ChunkStride tokens (final window may be short; a start is emitted
    * iff it is < n_tokens, so every token is covered and chunk count =
    * ceil(n/stride)). Emits the window bounds plus a portable rolling
    * hash of the window's token hashes — the same `acc·131 + h mod p`
    * fold as [[graft.functions.TextFunctions.docFingerprint]], so a
    * single-chunk document's `chunk_hash` IS its fingerprint (pinned in
    * ChunkDocsSpec).
    *
    * Distributed shape: token hashes are computed ONCE per document
    * (codegen'd one-pass byte fold), the window explode and per-window
    * fold are pure array ops on that hash array — map-only, no shuffle,
    * no re-tokenization per chunk; output is ~n/stride rows per doc.
    * The terminal sort is the oracle contract (see [[gopherFilter]]).
    */
  def chunkDocs(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val th = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), tokenHashes(col("text")).as("th"))
      .withColumn("ntok", size(col("th")))
      .filter(col("ntok") > 0)
    val out = th
      .select(col("doc_id"), col("th"), col("ntok"),
        posexplode(sequence(lit(0), col("ntok") - 1, lit(ChunkStride)))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("start").cast("int").as("tok_from"),
        least(col("start") + ChunkLen, col("ntok")).cast("int").as("tok_to"),
        aggregate(slice(col("th"), col("start") + 1, lit(ChunkLen)), lit(0L),
          (a, h) => (a * lit(131L) + h) % lit(HashP)).as("chunk_hash"))
    if (ordered) out.orderBy("doc_id", "chunk_idx") else out
  }

  /** DuckDB oracle for [[chunkDocs]] — same start series, inclusive
    * 1-based list_slice window, and the same two-level portable fold.
    */
  def chunkDocsOracleSql: String =
    s"""WITH th AS (
       |  SELECT doc_id,
       |    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |      s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |           (a, c) -> (a * 31 + c) % $HashP)) AS th
       |  FROM documents
       |), x AS (SELECT doc_id, th, len(th) AS ntok FROM th WHERE len(th) > 0)
       |SELECT doc_id,
       |  CAST(u.i AS INTEGER) AS chunk_idx,
       |  CAST(u.i * $ChunkStride AS INTEGER) AS tok_from,
       |  CAST(least(u.i * $ChunkStride + $ChunkLen, ntok) AS INTEGER) AS tok_to,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_slice(th, u.i * $ChunkStride + 1, u.i * $ChunkStride + $ChunkLen)),
       |    (a, h) -> (a * 131 + h) % $HashP) AS chunk_hash
       |FROM x, unnest(generate_series(0,
       |       CAST(ceil(ntok / ${ChunkStride.toDouble}) AS BIGINT) - 1)) AS u(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Co-occurrence window / result size and the PMI rounding scale. */
  val CoocWindow = 3
  val CoocTopK = 20

  /** §2.6 — windowed co-occurrence with PMI (`q_cooccur`): unordered
    * token pairs within CoocWindow positions, counted corpus-wide; the
    * CoocTopK most frequent pairs with their pointwise mutual
    * information `ln(c_ab·N / (c_a·c_b))` (N = total corpus tokens;
    * pair space and unigram space share the token normalization, the
    * usual PMI convention for sliding-window co-occurrence à la GloVe's
    * count pass). Ranking is on the integer pair count (ties by pair) —
    * never on the float PMI, which rides along as a value column, so
    * cross-engine float ordering can't perturb the result set.
    *
    * Distributed shape: pair generation is a per-row array
    * comprehension (map-side, no self-join on positions), then one
    * map-side-combined count per distinct pair, a scalar token-total
    * broadcast, and two shuffle joins pair→unigram counts (vocab-sized
    * sides — NOT assumed broadcastable at corpus scale; AQE may choose
    * to). Top-k is a TakeOrdered, not a global sort.
    */
  def cooccur(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(s, dir).select(tokens(col("text")).as("t"))
    val pairs = docs.filter(size(col("t")) >= 2)
      .select(explode(flatten(transform(sequence(lit(1), size(col("t")) - 1), i =>
        transform(sequence(i + 1, least(i + CoocWindow, size(col("t")))), j =>
          struct(
            least(element_at(col("t"), i), element_at(col("t"), j)).as("ta"),
            greatest(element_at(col("t"), i), element_at(col("t"), j)).as("tb"))))))
        .as("p"))
      .select(col("p.ta").as("ta"), col("p.tb").as("tb"))
    val pairCounts = pairs.groupBy("ta", "tb").agg(count(lit(1)).as("pair_n"))
    val uni = docs.select(explode(col("t")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tok_n"))
    val nTot = docs.select(sum(size(col("t"))).as("n_tot"))
    pairCounts
      .join(uni.select(col("token").as("ta"), col("tok_n").as("na")), "ta")
      .join(uni.select(col("token").as("tb"), col("tok_n").as("nb")), "tb")
      .crossJoin(broadcast(nTot))
      .select(col("ta"), col("tb"), col("pair_n"),
        round(log(col("pair_n").cast("double") * col("n_tot") /
          (col("na") * col("nb"))), 4).as("pmi"))
      .orderBy(col("pair_n").desc, col("ta"), col("tb"))
      .limit(CoocTopK)
  }

  /** DuckDB oracle for [[cooccur]] — identical pair comprehension and
    * PMI expression shape (double numerator, BIGINT denominator).
    */
  def cooccurOracleSql: String =
    s"""WITH t AS (
       |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
       |), p AS (
       |  SELECT unnest(flatten(list_transform(generate_series(1, len(t) - 1), i ->
       |    list_transform(generate_series(i + 1, least(i + $CoocWindow, len(t))), j ->
       |      [least(t[i], t[j]), greatest(t[i], t[j])])))) AS pr
       |  FROM t WHERE len(t) >= 2
       |), pc AS (
       |  SELECT pr[1] AS ta, pr[2] AS tb, count(*) AS pair_n FROM p GROUP BY 1, 2
       |), ug AS (
       |  SELECT token, count(*) AS tok_n
       |  FROM (SELECT unnest(t) AS token FROM t) GROUP BY 1
       |), nt AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tot FROM t)
       |SELECT ta, tb, pair_n,
       |  round(ln(CAST(pair_n AS DOUBLE) * n_tot / (ua.tok_n * ub.tok_n)), 4) AS pmi
       |FROM pc JOIN ug ua ON ua.token = ta JOIN ug ub ON ub.token = tb
       |CROSS JOIN nt
       |ORDER BY pair_n DESC, ta, tb LIMIT $CoocTopK""".stripMargin

  // ---------------------------------------------------------------------
  // q_pipeline_yield — per-stage corpus yield report
  // ---------------------------------------------------------------------

  /** Pipeline yield report (`q_pipeline_yield`): documents surviving
    * each cleaning gate CUMULATIVELY — the ops table a pipeline owner
    * reads before every run ("which stage is eating the corpus?").
    * Stage semantics mirror [[cleanPipeline]] exactly (quality gate,
    * language gate, exact content dedup among gated survivors), so the
    * final `n_out` equals the q_clean_pipeline row count by
    * construction — spec-pinned as a cross-operator invariant.
    *
    * Distributed shape: ONE map-only scan computes every gate flag and
    * feeds one counting aggregate (3 numbers); the dedup stage reuses
    * the pipeline's md5 window over the gated subset (the only
    * exchange). The report rows assemble driver-side from FOUR
    * numbers — bounded by the stage count, not the corpus.
    */
  def pipelineYield(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("text"),
        (qualityScore(col("text")) >= PipelineQualityMin).as("okq"),
        (langId(col("text")) =!= "unknown").as("okl"))
    val r = g.agg(count(lit(1)),
      sum(when(col("okq"), 1L).otherwise(0L)),
      sum(when(col("okq") && col("okl"), 1L).otherwise(0L))).head()
    val (total, nq, nql) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")
    val nqld = g.filter(col("okq") && col("okl"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).count()
    val stages = Seq(
      ("quality", total, nq), ("language", nq, nql), ("exact_dedup", nql, nqld))
    import s.implicits._
    stages.zipWithIndex.map { case ((name, nIn, nOut), i) =>
      (i + 1, name, nIn, nOut, nIn - nOut,
        math.floor((nIn - nOut).toDouble / math.max(nIn, 1L) * 1e4 + 0.5) / 1e4)
    }.toDF("stage_no", "stage", "n_in", "n_out", "rejected", "reject_rate")
      .orderBy("stage_no")
  }

  // ---------------------------------------------------------------------
  // q_char_entropy — compressibility gate
  // ---------------------------------------------------------------------

  /** Low-entropy flag threshold in nats: natural English text sits near
    * 2.8 nats of character entropy; repeated-template floods and
    * single-character padding collapse toward 0.
    */
  val EntropyLowNats = 2.0

  /** Character-entropy gate (`q_char_entropy`): per-document Shannon
    * entropy over the raw character distribution — the classic
    * compressibility signal a corpus pipeline runs beside the n-gram
    * repetition gate (low entropy = template floods, padding, binary
    * spill; the MassiveText/C4 gate family). Output: char count,
    * distinct chars, entropy (nats, 4 dp), and the low-entropy flag.
    *
    * Distributed shape: one explode into a (doc, char)-keyed count
    * (map-side combined — the token_count shape), per-doc totals DERIVE
    * from that frame, and the entropy sum runs over DECIMAL(38,18)
    * casts of identical-double contributions (exact ⇒ associative ⇒
    * partitioning-independent; the kl_drift arithmetic). Empty texts
    * are guarded explicitly: Spark `split('', '')` yields `[""]` where
    * DuckDB `string_split` yields `[]`, so both sides filter len>0 and
    * empty docs re-enter via the left join with entropy 0.
    * The flag compares the ROUNDED entropy against the threshold, so
    * both engines decide on the same grid value.
    */
  def charEntropy(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val cc = Tables.documentsSpread(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
    val nn = cc.groupBy("doc_id")
      .agg(sum("n").as("n_chars"), count(lit(1)).as("n_distinct"))
    val p = col("n").cast("double") / col("nt")
    val ent = cc.join(nn.select(col("doc_id"), col("n_chars").as("nt")), "doc_id")
      .groupBy("doc_id")
      .agg(sum((-(p * log(p))).cast("decimal(38,18)")).as("hx"))
      .select(col("doc_id"),
        (floor(col("hx").cast("double") * 1e4 + lit(0.5)) / 1e4).as("entropy"))
    val out = Tables.documentsSpread(s, dir).select(col("doc_id"))
      .join(nn.join(ent, "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"),
        when(coalesce(col("entropy"), lit(0.0)) < lit(EntropyLowNats), 1).otherwise(0)
          .as("low_entropy"))
    if (ordered) out.orderBy("doc_id") else out
  }

  def charEntropyOracleSql: String =
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c
       |  FROM documents WHERE len(text) > 0),
       |cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2),
       |nn AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
       |              CAST(count(*) AS BIGINT) AS n_distinct
       |       FROM cc GROUP BY 1),
       |ent AS (SELECT cc.doc_id,
       |          floor(CAST(sum(CAST(
       |              -((CAST(n AS DOUBLE) / n_chars) * ln(CAST(n AS DOUBLE) / n_chars))
       |            AS DECIMAL(38,18))) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS entropy
       |        FROM cc JOIN nn USING (doc_id) GROUP BY cc.doc_id)
       |SELECT d.doc_id,
       |  coalesce(nn.n_chars, 0) AS n_chars,
       |  coalesce(nn.n_distinct, 0) AS n_distinct,
       |  coalesce(ent.entropy, 0.0) AS entropy,
       |  CASE WHEN coalesce(ent.entropy, 0.0) < $EntropyLowNats THEN 1 ELSE 0 END
       |    AS low_entropy
       |FROM documents d LEFT JOIN nn USING (doc_id) LEFT JOIN ent USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_blocklist_filter — bad-word density gate
  // ---------------------------------------------------------------------

  /** Blocklist terms for the density gate. A config knob in a real
    * pipeline (the C4 "bad words" list); pinned here so the oracle and
    * the engine share one source of truth. Terms chosen so the shipped
    * corpus exercises both hit and zero-hit paths.
    */
  val BlocklistTerms: Seq[String] = Seq("slow", "legacy", "spam", "broken")

  /** A document is blocked when its blocklist-token density (rounded to
    * the 4-dp grid) reaches this rate.
    */
  val BlocklistMaxRate = 0.05

  /** Blocklist density gate (`q_blocklist_filter`): per-document count
    * of blocklist-token occurrences and distinct blocklist terms, the
    * hit density, and the block flag — the C4 bad-words gate, made a
    * DENSITY gate so one incidental token doesn't kill a long document
    * (the hard any-hit C4 rule is the `BlocklistMaxRate = 0` special
    * case).
    *
    * Map-only plan: the token array binds once per row and the three
    * measures fold over it inside whole-stage codegen — at 100 TB this
    * rides the scan like the other quality gates. The flag compares the
    * ROUNDED density against the threshold so both engines decide on
    * the same grid value.
    */
  def blocklistFilter(s: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val terms = lit(BlocklistTerms.toArray)
    val out = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(org.apache.spark.sql.functions.filter(col("toks"),
          t => array_contains(terms, t))).cast("long").as("n_hits"),
        size(array_intersect(col("toks"), terms)).cast("long").as("n_terms"))
      .withColumn("hit_rate",
        floor(col("n_hits").cast("double") / greatest(col("n_tokens"), lit(1L))
          * 1e4 + lit(0.5)) / 1e4)
      .withColumn("blocked",
        when(col("hit_rate") >= lit(BlocklistMaxRate), 1).otherwise(0))
    if (ordered) out.orderBy("doc_id") else out
  }

  def blocklistFilterOracleSql: String = {
    val list = BlocklistTerms.map(t => s"'$t'").mkString("[", ",", "]")
    s"""WITH bt AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |bs AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(toks, t -> list_contains($list, t))) AS BIGINT)
       |      AS n_hits,
       |    CAST(len(list_intersect(toks, $list)) AS BIGINT) AS n_terms
       |  FROM bt),
       |br AS (
       |  SELECT doc_id, n_tokens, n_hits, n_terms,
       |    floor(CAST(n_hits AS DOUBLE) / greatest(n_tokens, 1) * 1e4 + 0.5) / 1e4
       |      AS hit_rate
       |  FROM bs)
       |SELECT doc_id, n_tokens, n_hits, n_terms, hit_rate,
       |  CASE WHEN hit_rate >= $BlocklistMaxRate THEN 1 ELSE 0 END AS blocked
       |FROM br ORDER BY doc_id""".stripMargin
  }

  /** §2.7 #36 — multimodal metadata plumbing: documents as opaque bytes
    * with typed metadata (byte length, content hash, prefix). The decode
    * step for true image/audio payloads lives in graft.multimodal (stubbed
    * codec, real schema/partitioning).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        substring(col("text"), 1, 16).as("prefix16"))
      .orderBy("doc_id")
}
