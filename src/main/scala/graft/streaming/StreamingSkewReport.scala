package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ExtendedAnalytics

/** Streaming key-skew monitor (the streaming twin of
  * `operators.ExtendedAnalytics.skewReport` — the table an on-call
  * engineer watches: a key whose share of the stream starts
  * concentrating — a celebrity user, a runaway bot — should surface
  * while it happens, before it serializes some downstream shuffle).
  *
  * The sufficient statistic is the per-key count frame — ADDITIVE, so
  * the state after any prefix of batches is the component-wise sum of
  * per-batch counts. Per micro-batch one distributed groupBy-count
  * runs and only the post-aggregate (user_id, cnt) rows cross to the
  * driver; [[current]] hands the merged counts to the batch operator's
  * own value stage ([[ExtendedAnalytics.skewFromCounts]]): totals,
  * top-K and shares all derive from the counts, so stream == batch
  * EXACTLY. State is O(distinct keys) — the same frame the batch
  * operator aggregates to before its driver-bounded top-K collect.
  */
class StreamingSkewReport extends Serializable {

  private val counts = scala.collection.mutable.HashMap.empty[Long, Long]

  /** Merge one micro-batch of events ((user_id) column required). */
  def mergeBatch(events: DataFrame): Unit = {
    val batch = events.groupBy("user_id").agg(count(lit(1)).as("cnt")).collect()
    this.synchronized {
      batch.foreach { r =>
        val k = r.getLong(0)
        counts.update(k, counts.getOrElse(k, 0L) + r.getLong(1))
      }
    }
  }

  /** Current skew report — identical columns and values to the batch
    * operator over the same events.
    */
  def current(s: SparkSession): DataFrame = {
    val rows = this.synchronized { counts.toSeq }
    import s.implicits._
    ExtendedAnalytics.skewFromCounts(s, rows.toDF("user_id", "cnt"))
  }

  /** Persist the per-key counts — the exact sufficient statistic, so
    * [[StreamingSkewReport.restore]] + remaining batches equals an
    * uninterrupted run exactly.
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    val rows = this.synchronized { counts.toSeq }
    import s.implicits._
    rows.toDF("user_id", "cnt").write.mode("overwrite").parquet(path)
  }
}

object StreamingSkewReport {
  /** Rebuild a monitor from a [[StreamingSkewReport.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingSkewReport = {
    val m = new StreamingSkewReport
    s.read.parquet(path).collect()
      .foreach(r => m.counts.update(r.getLong(0), r.getLong(1)))
    m
  }
}
