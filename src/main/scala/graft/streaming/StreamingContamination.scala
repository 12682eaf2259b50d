package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingleHashes
import graft.operators.TextAnalysis

/** Streaming benchmark-contamination monitor — the live twin of
  * `operators.TextAnalysis.contamination`/`contaminationScore`: an
  * eval-set quote leaking into the TRAINING stream must be caught as
  * the document arrives, not at the next full-corpus audit (the
  * decontamination-on-ingest shape every production pipeline runs).
  *
  * The eval shingle set is FROZEN at construction (the frozen-artifact
  * contract: the benchmark does not change mid-stream), so each
  * document's verdict is INDEPENDENT of every other document — unlike
  * the distribution monitors there is no cross-batch sufficient
  * statistic to maintain: per-batch emissions are FINAL. Each
  * micro-batch pays one MAP-SIDE pass (per-doc `array_intersect`
  * against the frozen literal — the size-gated form the batch scorer
  * uses below `ContaminationLiteralMax`; no shuffle, no join), flagged
  * rows append to a sink, and the in-memory state is the additive
  * (docs seen, docs flagged) counter pair — the live leak-rate view.
  *
  * `currentFlags`/`currentScores` are read-time views over the sink
  * through the SAME column tail the batch operators emit — stream ==
  * batch over any split, by per-doc independence. Snapshot persists
  * the counters (the sink is durable).
  */
class StreamingContamination(evalHashes: Array[Long], sinkPath: String)
    extends Serializable {

  private var docsSeen = 0L
  private var docsFlagged = 0L

  /** Score one micro-batch of corpus documents (doc_id, text, ...). */
  def mergeBatch(s: SparkSession, batch: DataFrame): Unit = {
    val sh = shingleHashes(col("text"), TextAnalysis.ContaminationShingleN)
    val scored = batch.select(col("doc_id"),
        size(sh).cast("long").as("n_shingles"),
        size(array_intersect(sh, typedLit(evalHashes))).cast("long").as("n_hit"))
      .localCheckpoint()
    val flagged = scored.filter(col("n_hit") > 0)
    flagged.write.mode("append").parquet(s"$sinkPath/flagged")
    val (n, f) = {
      val r = scored.agg(count(lit(1)),
        sum(when(col("n_hit") > 0, 1L).otherwise(0L))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    this.synchronized { docsSeen += n; docsFlagged += f }
  }

  /** Live (docs seen, docs flagged) — the leak-rate counters. */
  def counts: (Long, Long) = this.synchronized { (docsSeen, docsFlagged) }

  /** Contaminated doc ids — identical to the batch `contamination`
    * output over the accumulated documents.
    */
  def currentFlags(s: SparkSession): DataFrame =
    s.read.parquet(s"$sinkPath/flagged")
      .select("doc_id").distinct().orderBy("doc_id")

  /** Per-doc contamination scores — identical columns and values to
    * the batch `contaminationScore` tail (the same floor-shift).
    */
  def currentScores(s: SparkSession): DataFrame =
    s.read.parquet(s"$sinkPath/flagged")
      .withColumn("overlap",
        floor(col("n_hit") * lit(10000.0) / col("n_shingles") + lit(0.5)) / 10000.0)
      .orderBy("doc_id")

  /** Persist the counters and the frozen eval set. */
  def snapshot(s: SparkSession, path: String): Unit = {
    val (n, f) = counts
    import s.implicits._
    Seq(("__seen", n), ("__flagged", f)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$path/counts")
    evalHashes.toSeq.toDF("h")
      .write.mode("overwrite").parquet(s"$path/eval")
  }
}

object StreamingContamination {
  /** Build a monitor with the eval set frozen from the batch
    * operator's held-out slice of `dir`.
    */
  def forDir(s: SparkSession, dir: String, sinkPath: String): StreamingContamination = {
    val hashes = graft.Tables.documents(s, dir)
      .filter(col("doc_id") < TextAnalysis.ContaminationEvalDocs)
      .select(explode(shingleHashes(col("text"),
        TextAnalysis.ContaminationShingleN)).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    new StreamingContamination(hashes, sinkPath)
  }

  /** Rebuild from a [[StreamingContamination.snapshot]]. */
  def restore(s: SparkSession, path: String, sinkPath: String): StreamingContamination = {
    val hashes = s.read.parquet(s"$path/eval")
      .collect().map(_.getLong(0)).sorted
    val m = new StreamingContamination(hashes, sinkPath)
    s.read.parquet(s"$path/counts").collect().foreach { r =>
      (r.getString(0), r.getLong(1)) match {
        case ("__seen", v)    => m.docsSeen = v
        case ("__flagged", v) => m.docsFlagged = v
        case _                =>
      }
    }
    m
  }
}
