package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Classifier

/** Streaming DSIR importance-weighter (the streaming twin of
  * `operators.Classifier.dsirWeights` — the live form of the
  * resampling gate: the target/raw feature distributions refine as
  * labeled documents arrive, and incoming batches are weighted with
  * the distributions as of now).
  *
  * The sufficient statistic is the hashed-feature count table
  * (f, c_target, c_raw) — BOUNDED by `Classifier.DsirBuckets` by
  * construction and ADDITIVE across batches, so state is O(8192) longs
  * REGARDLESS of stream length (tighter than the vocabulary-bounded
  * NB/KL twins). Per micro-batch one distributed map-side-combined
  * aggregate runs (the batch operator's own counting stage) and only
  * the bucket table crosses to the driver.
  *
  * [[weightBatch]] hands the merged table to the batch operator's OWN
  * value+scoring stage (`dsirScoreFrame`), so after any prefix of
  * batches the weights equal the batch operator run over the same
  * training prefix EXACTLY (ClassifierSpec, 3-way split).
  */
class StreamingDsir extends Serializable {

  private val counts = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]

  /** Merge one micro-batch of documents ((doc_id, source, text) cols). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = Classifier.dsirTrainCounts(docs)
    this.synchronized {
      batch.foreach { case (f, ct, cr) =>
        val (t, r) = counts.getOrElse(f, (0L, 0L))
        counts.update(f, (t + ct, r + cr))
      }
    }
  }

  /** Weight a document frame with the distributions as of now —
    * identical columns and values to the batch `q_dsir_weights` run
    * over the same training prefix.
    */
  def weightBatch(s: SparkSession, docs: DataFrame): DataFrame = {
    val cnt = this.synchronized {
      counts.toSeq.map { case (f, (t, r)) => (f, t, r) }
    }
    Classifier.dsirScoreFrame(s, docs, cnt)
  }
}
