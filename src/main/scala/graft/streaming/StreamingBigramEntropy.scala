package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CorpusCuration

/** Streaming per-source bigram conditional-entropy monitor (the
  * streaming twin of `operators.CorpusCuration.bigramEntropy` — the
  * transitions-side template-flood alarm, watched live beside the
  * KL/Zipf marginal monitors).
  *
  * The sufficient statistic is the (source, w1, w2) bigram count frame:
  * history totals c(w1·) and per-source totals derive from it, and —
  * because documents arrive WHOLE in a micro-batch — pair extraction is
  * map-only per row, so the counts are ADDITIVE across any doc-level
  * split of the stream. Per micro-batch one distributed explode +
  * groupBy-count runs (the batch operator's own first stage via
  * `bigramPairCounts`); only the post-aggregate batch frame crosses to
  * the driver.
  *
  * [[current]] hands the merged state to the batch operator's value
  * stage (`bigramEntropyFromCounts`): contributions are identical
  * double arithmetic and the per-source sum is an exact DECIMAL(38,18)
  * aggregation, so stream == batch EXACTLY (StreamingCurationSpec).
  *
  * State is O(|sources| × bigram vocabulary) — larger than the unigram
  * twins but still saturating (Heaps' law over bigrams); a long-running
  * monitor can bound it by dropping hapax bigrams per epoch at the cost
  * of exactness.
  */
class StreamingBigramEntropy extends Serializable {

  private val counts =
    scala.collection.mutable.HashMap.empty[(String, String, String), Long]

  /** Merge one micro-batch of documents ((source, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = CorpusCuration.bigramPairCounts(docs).collect()
    this.synchronized {
      batch.foreach { r =>
        val k = (r.getString(0), r.getString(1), r.getString(2))
        counts.update(k, counts.getOrElse(k, 0L) + r.getLong(3))
      }
    }
  }

  /** Current entropy table — identical columns and values to the batch
    * operator over the same documents (`source, n_bigrams, n_pairs,
    * cond_entropy`).
    */
  def current(s: SparkSession): DataFrame = {
    val rows = this.synchronized {
      counts.toSeq.map { case ((src, w1, w2), c) => (src, w1, w2, c) }
    }
    import s.implicits._
    CorpusCuration.bigramEntropyFromCounts(
      rows.toDF("source", "w1", "w2", "c12"))
  }

  /** Persist the exact sufficient statistic — restore + remaining
    * batches equals an uninterrupted run (the StreamingKlDrift restart
    * story).
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    val rows = this.synchronized {
      counts.toSeq.map { case ((src, w1, w2), c) => (src, w1, w2, c) }
    }
    import s.implicits._
    rows.toDF("source", "w1", "w2", "c12")
      .write.mode("overwrite").parquet(path)
  }
}

object StreamingBigramEntropy {
  /** Rebuild a monitor from a [[StreamingBigramEntropy.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingBigramEntropy = {
    val m = new StreamingBigramEntropy
    s.read.parquet(path).collect().foreach { r =>
      m.counts.update((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))
    }
    m
  }
}
