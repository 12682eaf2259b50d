package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CorpusCuration

/** Streaming event-rate anomaly monitor (the streaming twin of
  * `operators.CorpusCuration.rateAnomaly` — and the shape the operator
  * naturally wants: rate anomalies are watched live, not in batch).
  *
  * Hourly counts are ADDITIVE: per micro-batch one distributed
  * hour-keyed aggregate runs (the batch operator's first stage) and
  * only the hours-in-batch frame — calendar-bounded — crosses to the
  * driver, merging by addition into an hour → count map inside
  * `foreachBatch` (the StreamingHeavyHitters shape). The z-scores then
  * compute from the merged counts with EXACTLY the batch arithmetic:
  * integer trailing sums, pinned-order float z, floor-shift rounding —
  * so after any prefix of batches the flagged set equals the batch
  * operator run over the same events (StreamingCurationSpec, 3-way
  * split).
  *
  * State is O(retained hours). A forever-running monitor calls
  * [[pruneBefore]] to drop hours older than the trailing window needs
  * (24 h + the live edge); pruning only forgets hours that can no
  * longer affect any future z. After a prune that DROPS hours,
  * [[current]] emits only hours whose full 24 h trailing window is
  * still in state (hour > largest dropped hour + trail) — fringe
  * hours would otherwise recompute z from a shortened trail and
  * silently diverge from the batch operator, breaking the
  * stream==batch equality this class promises. A no-op prune
  * withholds nothing.
  */
class StreamingRateAnomaly extends Serializable {

  private val counts = scala.collection.mutable.HashMap.empty[Long, Long]
  // Largest hour a prune ACTUALLY removed (Long.MinValue until one
  // does). Gating on what was dropped — not on the requested boundary —
  // keeps a no-op prune (boundary at or below the oldest retained
  // hour) from withholding rows whose trailing windows are fully
  // intact, which would silently narrow the stream==batch equality.
  private var droppedMax: Long = Long.MinValue

  /** Merge one micro-batch of events (needs a `ts` timestamp column). */
  def mergeBatch(events: DataFrame): Unit = {
    val batch = events
      // floor division (matches the batch operator and DuckDB `//`),
      // not `div` truncation — pre-1970 hours bucket identically.
      .groupBy(expr(
        "CAST(floor(unix_timestamp(date_trunc('hour', ts)) / 3600.0) AS BIGINT)")
        .as("hr_no"))
      .agg(count(lit(1)).as("n"))
      .collect()
    this.synchronized {
      batch.foreach { r =>
        val h = r.getLong(0)
        counts.update(h, counts.getOrElse(h, 0L) + r.getLong(1))
      }
    }
  }

  /** Drop state for hours strictly before `hourNo` (they are outside
    * every future trailing window once the stream has moved on).
    */
  def pruneBefore(hourNo: Long): Unit =
    this.synchronized {
      val dropped = counts.keysIterator.filter(_ < hourNo).toSeq
      if (dropped.nonEmpty)
        droppedMax = math.max(droppedMax, dropped.max)
      counts.filterInPlace((h, _) => h >= hourNo)
    }

  /** Current anomaly table — same columns and arithmetic as the batch
    * operator (`hour, n, z, anomaly`). Hours inside the post-prune
    * fringe (trailing window partially forgotten) are withheld rather
    * than emitted with a divergent z.
    */
  def current(s: SparkSession): DataFrame = {
    val (hours, dm) =
      this.synchronized { (counts.toSeq.sortBy(_._1), droppedMax) }
    // an hour h recomputes a shortened trail iff its window [h−T, h)
    // reaches a dropped hour, i.e. h ≤ droppedMax + T
    val minEmit =
      if (dm == Long.MinValue) Long.MinValue
      else dm + CorpusCuration.AnomalyTrailHours + 1
    val rows = hours.filter(_._1 >= minEmit).map { case (h, n) =>
      val trail = hours.filter { case (t, _) =>
        t >= h - CorpusCuration.AnomalyTrailHours && t < h }
      val tCnt = trail.size.toLong
      val z: java.lang.Double =
        if (tCnt >= CorpusCuration.AnomalyMinTrail) {
          val tSum = trail.map(_._2).sum
          val tSq = trail.map(p => p._2 * p._2).sum
          val mean = tSum.toDouble / tCnt
          val varPop = tSq.toDouble / tCnt - mean * mean
          val raw = (n.toDouble - mean) / math.sqrt(math.max(varPop, 1e-12))
          math.floor(raw * 100.0 + 0.5) / 100.0
        } else null
      val hourStr = java.time.Instant.ofEpochSecond(h * 3600L)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      Row(hourStr, n, z, z != null && math.abs(z) >= 2.0)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hour",
        org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("z",
        org.apache.spark.sql.types.DoubleType, true),
      org.apache.spark.sql.types.StructField("anomaly",
        org.apache.spark.sql.types.BooleanType, false)))
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** Persist the monitor state (hourly counts + the prune boundary) as
    * parquet. The state is the exact sufficient statistic, so
    * [[StreamingRateAnomaly.restore]] + remaining batches equals an
    * uninterrupted run exactly — including the post-prune fringe
    * withholding, which depends on the persisted boundary.
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    val (hours, dm) =
      this.synchronized { (counts.toSeq, droppedMax) }
    import s.implicits._
    hours.toDF("hr_no", "n").write.mode("overwrite").parquet(s"$path/counts")
    Seq(dm).toDF("dropped_max").write.mode("overwrite").parquet(s"$path/meta")
  }
}

object StreamingRateAnomaly {
  /** Rebuild a monitor from a [[StreamingRateAnomaly.snapshot]].
    *
    * The meta column is read BY NAME: a pre-r8 snapshot carries
    * `pruned_to` (the EXCLUSIVE requested prune boundary) where the
    * current format carries `dropped_max` (the largest actually-dropped
    * hour). Reading either positionally would shift the post-prune
    * emit gate by one hour, so the legacy value is translated
    * explicitly — hours < pruned_to were dropped, hence
    * droppedMax = pruned_to − 1.
    */
  def restore(s: SparkSession, path: String): StreamingRateAnomaly = {
    val m = new StreamingRateAnomaly
    s.read.parquet(s"$path/counts").collect()
      .foreach(r => m.counts.update(r.getLong(0), r.getLong(1)))
    val meta = s.read.parquet(s"$path/meta")
    val row = meta.head()
    m.droppedMax =
      if (meta.columns.contains("dropped_max")) row.getAs[Long]("dropped_max")
      else row.getAs[Long]("pruned_to") - 1L
    m
  }
}
