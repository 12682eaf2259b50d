package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.operators.Sketches

/** Streaming heavy hitters over an unbounded token stream (SURVEY §2:
  * the streaming twin of `operators.Sketches.heavyHitters`).
  *
  * Per micro-batch, the batch's Count-Min sketch and its bounded
  * Misra-Gries candidate summary are built as DISTRIBUTED aggregates —
  * the exact shapes the batch operator uses — and only the finished,
  * kilobyte-sized results cross to the driver, where they merge into
  * running state inside `foreachBatch`:
  *
  *  - CMS is a linear sketch: cell-wise addition of two sketches with
  *    the same (depth, width, seed) equals the sketch of the
  *    concatenated input, so the running estimate keeps the one-sided
  *    `true ≤ est ≤ true + ε·N_total` bound over the WHOLE stream.
  *  - MG summaries merge by weight addition followed by the standard
  *    size-bound trim (subtract the (m+1)-th weight, drop ≤ 0):
  *    merged weights undercount by at most N_total/m, preserving the
  *    pigeonhole superset property for any token with tf > 2·N_total/m
  *    across the stream.
  *
  * State is O(m + sketch) regardless of stream length — nothing here
  * scales with the corpus, which is the entire point at 100 TB/day
  * ingest. Thread-safety: Structured Streaming serializes foreachBatch
  * calls per query, so the unsynchronized merge is safe for one query;
  * [[current]] is synchronized against concurrent readers.
  */
class StreamingHeavyHitters(
    k: Int = Sketches.HeavyHittersK,
    m: Int = Sketches.MgSummarySize,
    eps: Double = Sketches.CmsEps,
    confidence: Double = Sketches.CmsConfidence,
    seed: Int = Sketches.CmsSeed) extends Serializable {

  private var cms: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
  private val weights = scala.collection.mutable.HashMap.empty[String, Long]
  private var total = 0L

  /** Merge one micro-batch of tokens (single string column). Safe to
    * call directly in tests or from `foreachBatch` in production.
    */
  def mergeBatch(tokens: DataFrame): Unit = {
    val s = tokens.sparkSession
    import s.implicits._
    val tok = tokens.toDF("token")
    // one distributed pass: batch sketch + batch size ride one agg
    val row = tok
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)"),
        count(lit(1)))
      .head()
    val batchCms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val batchN = row.getLong(1)
    // bounded per-partition summaries; ≤ m rows shuffle per partition
    val batchMg = tok.as[String]
      .mapPartitions(it => Sketches.misraGries(it, m))
      .toDF("token", "wt")
      .groupBy("token").agg(sum("wt").as("wt"))
      .as[(String, Long)].collect()
    this.synchronized {
      cms = cms.mergeInPlace(batchCms)
      total += batchN
      batchMg.foreach { case (t, w) => weights.update(t, weights.getOrElse(t, 0L) + w) }
      if (weights.size > m) {
        // standard MG merge trim: subtract the (m+1)-th largest weight,
        // drop non-positive — size back to ≤ m, undercount bound grows
        // by the subtracted pivot (≤ N/m overall)
        val pivot = weights.values.toArray.sorted(Ordering[Long].reverse).apply(m)
        val dead = weights.collect { case (t, w) if w - pivot <= 0L => t }.toList
        dead.foreach(weights.remove)
        weights.mapValuesInPlace((_, w) => w - pivot)
      }
    }
  }

  /** foreachBatch hook: `stream.writeStream.foreachBatch(hh.sink _)`. */
  def sink(batch: DataFrame, batchId: Long): Unit = mergeBatch(batch)

  /** Top-k (token, cms_estimate) over everything merged so far:
    * candidates from the running MG summary, ranked by sketch estimate
    * (never an exact full-vocabulary pass). Deterministic tie-break on
    * token.
    */
  def current(): Seq[(String, Long)] = this.synchronized {
    weights.keysIterator
      .map(t => (t, cms.estimateCount(t)))
      .toSeq
      .sortBy { case (t, est) => (-est, t) }
      .take(k)
  }

  /** Tokens observed so far (exact — rides the sketch agg). */
  def totalTokens: Long = this.synchronized(total)
}
