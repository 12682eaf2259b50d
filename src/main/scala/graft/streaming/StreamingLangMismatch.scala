package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CorpusCuration

/** Streaming language-label audit (the streaming twin of
  * `operators.CorpusCuration.langMismatch` — the metadata-trust
  * monitor a pipeline watches live: a source whose declared labels
  * stop matching its content changed upstream NOW, not at the next
  * batch run).
  *
  * The per-source counters (n_docs, n_confident, n_mismatch) are
  * ADDITIVE: per micro-batch the batch operator's own counting
  * aggregate runs distributed (`langMismatchCounts`) and only the
  * dim-sized per-source rows cross to the driver, summing into state —
  * the StreamingRateAnomaly shape at source granularity. [[current]]
  * applies the batch operator's own rate stage, so stream == batch
  * exactly after any prefix of batches (StreamingCurationSpec, 3-way
  * split). State is O(|sources|) regardless of stream length.
  */
class StreamingLangMismatch extends Serializable {

  private val counts =
    scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]

  /** Merge one micro-batch of documents ((source, lang, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = CorpusCuration.langMismatchCounts(docs).collect()
    this.synchronized {
      batch.foreach { r =>
        val src = r.getString(0)
        val (d, c, m) = counts.getOrElse(src, (0L, 0L, 0L))
        counts.update(src,
          (d + r.getLong(1), c + r.getLong(2), m + r.getLong(3)))
      }
    }
  }

  /** Current audit table — identical columns and values to the batch
    * operator over the same documents.
    */
  def current(s: SparkSession): DataFrame = {
    val rows = this.synchronized {
      counts.toSeq.map { case (src, (d, c, m)) => (src, d, c, m) }
    }
    import s.implicits._
    CorpusCuration.langMismatchRates(
      rows.toDF("source", "n_docs", "n_confident", "n_mismatch"))
  }
}
