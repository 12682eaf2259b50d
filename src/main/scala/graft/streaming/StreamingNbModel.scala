package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Classifier

/** Streaming Naive-Bayes filter (the streaming twin of
  * `operators.Classifier.nbTrain`/`nbScore` — and the shape a learned
  * quality gate actually ships in: the model RETRAINS as labeled
  * documents arrive, and every incoming batch is scored with the model
  * as of now, not as of the last nightly rebuild).
  *
  * The model's sufficient statistics are all ADDITIVE: the
  * (token, c_cur, c_web) train-fold counts and the (curated, total)
  * doc tally sum component-wise across batches (the StreamingKlDrift
  * shape). Per micro-batch ONE distributed map-side-combined aggregate
  * runs (the batch operator's own counting stage,
  * `Classifier.trainCountsFromDocs`) and only the vocabulary-sized
  * post-aggregate frame crosses to the driver.
  *
  * [[currentModel]] and [[scoreBatch]] hand the merged state to the
  * batch operator's OWN value and scoring stages (`modelFromCounts`,
  * `scoreStage`) — totals derive from the state map, log-ratios are the
  * same micro-nat integers — so after any prefix of batches the
  * incrementally trained model AND the scores it produces equal the
  * batch operators over the same documents EXACTLY
  * (StreamingClassifierSpec, 3-way split).
  *
  * State is O(vocabulary) — the same bound the batch operator
  * session-persists for its own reuse (Heaps' law: vocabularies
  * saturate where corpora do not).
  */
class StreamingNbModel extends Serializable {

  private val counts = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
  private var nCur = 0L
  private var nDocs = 0L

  /** Merge one micro-batch of documents ((doc_id, source, text) cols). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = Classifier.trainCountsFromDocs(docs).collect()
    val (bc, bn) = Classifier.trainDocTally(docs)
    this.synchronized {
      batch.foreach { r =>
        val t = r.getString(0)
        val (c, w) = counts.getOrElse(t, (0L, 0L))
        counts.update(t, (c + r.getLong(1), w + r.getLong(2)))
      }
      nCur += bc
      nDocs += bn
    }
  }

  private def stateFrames(s: SparkSession): (DataFrame, Long, Long, Long, Long) = {
    val (rows, pc, pn) = this.synchronized {
      (counts.toSeq.map { case (t, (c, w)) => (t, c, w) }, nCur, nDocs)
    }
    import s.implicits._
    val df = rows.toDF("t", "c_cur", "c_web")
    val tc = rows.iterator.map(_._2).sum
    val tw = rows.iterator.map(_._3).sum
    (df, tc, tw, rows.size.toLong, Classifier.priorUOf(pc, pn))
  }

  /** Current model table — identical columns and values to the batch
    * `q_nb_train` over the same documents (`t, c_cur, c_web, llr`).
    */
  def currentModel(s: SparkSession): DataFrame = {
    val (df, tc, tw, v, _) = stateFrames(s)
    import org.apache.spark.sql.functions._
    Classifier.modelFromCounts(df, tc, tw, v)
      .select(col("t"), col("c_cur"), col("c_web"),
        (col("llr_u").cast("double") / lit(1e6)).as("llr"))
  }

  /** Score a document frame with the model as of now — identical
    * columns and values to the batch `q_nb_score` run over the same
    * training prefix.
    */
  def scoreBatch(s: SparkSession, docs: DataFrame): DataFrame = {
    val (df, tc, tw, v, priorU) = stateFrames(s)
    Classifier.scoreStage(docs, Classifier.modelFromCounts(df, tc, tw, v), priorU)
  }
}
