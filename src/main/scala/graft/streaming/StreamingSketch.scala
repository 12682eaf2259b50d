package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  *    the same (depth, width, hash rows) equals the sketch of the
  *    concatenated input, so the running estimate keeps the one-sided
  *    `true ≤ est ≤ true + ε·N_total` bound over the WHOLE stream. The
  *    sketch here is the operator's PORTABLE d×w grouped-count form
  *    (same [[Sketches.CmsA]]/[[Sketches.CmsB]] rows as the batch
  *    operator and its DuckDB oracle), so stream-merged cells are
  *    bit-identical to a batch build over the concatenated input —
  *    spec-asserted, not just bound-asserted.
  *  - MG summaries merge by weight addition followed by the standard
  *    size-bound trim (subtract the (m+1)-th weight, drop ≤ 0):
  *    merged weights undercount by at most N_total/m, preserving the
  *    pigeonhole superset property for any token with tf > 2·N_total/m
  *    across the stream.
  *
  * State is O(m + d·w) regardless of stream length — nothing here
  * scales with the corpus, which is the entire point at 100 TB/day
  * ingest. Thread-safety: Structured Streaming serializes foreachBatch
  * calls per query, so the unsynchronized merge is safe for one query;
  * [[current]] is synchronized against concurrent readers.
  */
class StreamingHeavyHitters(
    k: Int = Sketches.HeavyHittersK,
    m: Int = Sketches.MgSummarySize) extends Serializable {

  private val cells = Array.ofDim[Long](Sketches.CmsDepth, Sketches.CmsWidth)
  private val weights = scala.collection.mutable.HashMap.empty[String, Long]
  private var total = 0L

  /** Merge one micro-batch of tokens (single string column). Safe to
    * call directly in tests or from `foreachBatch` in production.
    */
  def mergeBatch(tokens: DataFrame): Unit = {
    val s = tokens.sparkSession
    import s.implicits._
    val tok = tokens.toDF("token")
    // one distributed grouped count builds the batch sketch (≤ d·w
    // cells cross to the driver; map-side partials bounded by the same)
    val batchCells = tok
      // named fold column first — embedded in bucketArray the fold
      // re-evaluates per array element (the r8 landmine)
      .select(graft.functions.TextFunctions.charFoldHash(col("token")).as("f"))
      .select(posexplode(Sketches.bucketArray(col("f"))).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt, r.getLong(2)))
    // bounded per-partition summaries; ≤ m rows shuffle per partition
    val batchMg = tok.as[String]
      .mapPartitions(it => Sketches.misraGries(it, m))
      .toDF("token", "wt")
      .groupBy("token").agg(sum("wt").as("wt"))
      .as[(String, Long)].collect()
    this.synchronized {
      batchCells.foreach { case (r, b, c) => cells(r)(b) += c }
      // row 0 partitions every batch token across its buckets
      total += batchCells.collect { case (0, _, c) => c }.sum
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

  /** CMS point estimate over everything merged so far. */
  def estimateCount(t: String): Long = this.synchronized {
    Sketches.localBuckets(t).zipWithIndex
      .map { case (b, i) => cells(i)(b.toInt) }.min
  }

  /** Top-k (token, cms_estimate) over everything merged so far:
    * candidates from the running MG summary, ranked by sketch estimate
    * (never an exact full-vocabulary pass). Deterministic tie-break on
    * token.
    */
  def current(): Seq[(String, Long)] = this.synchronized {
    weights.keysIterator
      .map(t => (t, Sketches.localBuckets(t).zipWithIndex
        .map { case (b, i) => cells(i)(b.toInt) }.min))
      .toSeq
      .sortBy { case (t, est) => (-est, t) }
      .take(k)
  }

  /** Tokens observed so far (exact — rides the sketch agg). */
  def totalTokens: Long = this.synchronized(total)
}
