package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CorpusCuration

/** Streaming embedding-drift monitor — the live twin of
  * `operators.CorpusCuration.embedDrift` (per-label mean-vector cosine
  * to the corpus mean). The last distribution monitor in the catalog
  * without a streaming form: on ingest, a source whose embedding
  * centroid swings away from the corpus (a crawl slice changing
  * register, an encoder version skew) should surface within a batch.
  *
  * The sufficient statistic is the per-(label, dim) (EXACT decimal
  * coordinate sum, count) frame — additive and
  * batching/partitioning-independent (decimal adds are exact ⇒
  * associative, the shared convention of the monitor family). Per
  * micro-batch one explode + one distributed grouped agg runs, and
  * only the ≤ labels × dim post-aggregate rows (bounded metadata)
  * cross to the driver. [[current]] hands the merged frame to the
  * batch operator's own value stage (`embedDriftFromSums`), so
  * stream == batch CELL-EXACTLY over any split of the corpus.
  */
class StreamingEmbedDrift extends Serializable {

  // (label, dim) -> (decimal coordinate sum, count)
  private val state =
    scala.collection.mutable.HashMap.empty[(Int, Int), (java.math.BigDecimal, Long)]

  /** Merge one micro-batch of embeddings (vec_id, embedding, label). */
  def mergeBatch(s: SparkSession, batch: DataFrame): Unit = {
    val rows = CorpusCuration.embedGrouped(batch).collect()
    this.synchronized {
      rows.foreach { r =>
        val k = (r.getInt(0), r.getInt(1))
        val (s0, n0) = state.getOrElse(k,
          (java.math.BigDecimal.ZERO.setScale(18), 0L))
        state.update(k, (s0.add(r.getDecimal(2)), n0 + r.getLong(3)))
      }
    }
  }

  /** Current drift card — identical columns and values to the batch
    * operator over the same embeddings.
    */
  def current(s: SparkSession): DataFrame = {
    val rows = this.synchronized {
      state.toSeq.map { case ((l, d), (sx, n)) => (l, d, BigDecimal(sx), n) }
    }
    import s.implicits._
    CorpusCuration.embedDriftFromSums(
      rows.toDF("label", "dim", "sx", "n")
        .withColumn(
          "sx",
          org.apache.spark.sql.functions.col("sx").cast("decimal(38,18)")))
  }

  /** Persist the exact sufficient statistic; [[StreamingEmbedDrift
    * .restore]] + remaining batches equals an uninterrupted run.
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    val rows = this.synchronized {
      state.toSeq.map { case ((l, d), (sx, n)) => (l, d, BigDecimal(sx), n) }
    }
    import s.implicits._
    rows.toDF("label", "dim", "sx", "n")
      .withColumn("sx",
        org.apache.spark.sql.functions.col("sx").cast("decimal(38,18)"))
      .write.mode("overwrite").parquet(s"$path/sums")
  }
}

object StreamingEmbedDrift {
  /** Rebuild a monitor from a [[StreamingEmbedDrift.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingEmbedDrift = {
    val m = new StreamingEmbedDrift
    s.read.parquet(s"$path/sums").collect().foreach { r =>
      m.state.update((r.getInt(0), r.getInt(1)), (r.getDecimal(2), r.getLong(3)))
    }
    m
  }
}
