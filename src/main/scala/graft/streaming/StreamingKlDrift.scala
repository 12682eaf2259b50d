package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CorpusCuration
import graft.functions.TextFunctions

/** Streaming per-source KL-drift monitor (the streaming twin of
  * `operators.CorpusCuration.klDrift` — and the form the operator is
  * actually consumed in: distribution drift is a standing dashboard, a
  * crawl slice that stops looking like the corpus should alarm within
  * a batch, not at the next nightly run).
  *
  * The sufficient statistic for KL(P_source ‖ P_corpus) is the
  * (source, token) count frame — token totals, per-source totals and
  * the corpus total all derive from it — and counts are ADDITIVE, so
  * the state after any prefix of batches is the component-wise sum of
  * per-batch frames (the StreamingSourceSim shape with addition
  * instead of min). Per micro-batch one distributed groupBy-count runs
  * (the batch operator's first stage) and only the post-aggregate
  * batch frame crosses to the driver.
  *
  * [[current]] hands the merged state to the batch operator's OWN
  * value stage (`klFromCounts`): the per-token contributions are
  * identical double arithmetic and their per-source sum is an exact
  * DECIMAL(38,18) aggregation — associative, partitioning-independent —
  * so stream == batch EXACTLY, not approximately
  * (StreamingCurationSpec, 3-way split).
  *
  * State is O(|sources| × vocabulary) — the same bound the batch
  * operator session-persists for its own reuse; vocabularies saturate
  * (Heaps' law) where corpora do not, and a long-running monitor can
  * bound state further by dropping hapax tokens per epoch (their KL
  * contribution is O(1/n) each) — not done here to keep exactness.
  */
class StreamingKlDrift extends Serializable {

  private val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]

  /** Merge one micro-batch of documents ((source, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c_st"))
      .collect()
    this.synchronized {
      batch.foreach { r =>
        val k = (r.getString(0), r.getString(1))
        counts.update(k, counts.getOrElse(k, 0L) + r.getLong(2))
      }
    }
  }

  /** Current drift table — identical columns and values to the batch
    * operator over the same documents (`source, n_tokens, n_distinct,
    * kl`).
    */
  def current(s: SparkSession): DataFrame = {
    val rows = this.synchronized {
      counts.toSeq.map { case ((src, t), c) => (src, t, c) }
    }
    import s.implicits._
    CorpusCuration.klFromCounts(rows.toDF("source", "t", "c_st"))
  }

  /** Second view over the SAME state: the per-source Zipf slope
    * (`operators.CorpusCuration.zipfFit`'s value stage). The (source,
    * token) count frame is the sufficient statistic for both monitors —
    * KL watches the marginals' divergence from the corpus, the Zipf
    * slope watches their shape — so one merged state serves both
    * dashboards and stream == batch exactly for each.
    */
  def currentZipf(s: SparkSession): DataFrame = {
    val rows = this.synchronized {
      counts.toSeq.map { case ((src, t), c) => (src, t, c) }
    }
    import s.implicits._
    CorpusCuration.zipfFromCounts(rows.toDF("source", "t", "c_st"))
  }

  /** Persist the sufficient statistic (the (source, token) count frame)
    * as parquet — the monitor's restart story: because the state IS the
    * exact sufficient statistic, [[StreamingKlDrift.restore]] +
    * remaining batches equals an uninterrupted run EXACTLY (no
    * approximate recovery, no re-reading committed sources).
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    val rows = this.synchronized {
      counts.toSeq.map { case ((src, t), c) => (src, t, c) }
    }
    import s.implicits._
    rows.toDF("source", "t", "c_st").write.mode("overwrite").parquet(path)
  }
}

object StreamingKlDrift {
  /** Rebuild a monitor from a [[StreamingKlDrift.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingKlDrift = {
    val m = new StreamingKlDrift
    s.read.parquet(path).collect().foreach { r =>
      m.counts.update((r.getString(0), r.getString(1)), r.getLong(2))
    }
    m
  }
}
