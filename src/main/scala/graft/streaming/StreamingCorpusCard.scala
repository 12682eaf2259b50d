package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CorpusCuration

/** Streaming per-source corpus card (the streaming twin of
  * `operators.CorpusCuration.corpusCard` — the ops table a pipeline
  * watches live: a crawl slice whose quality-ok rate or dup rate jumps
  * should alarm within a batch, not at the next nightly card build).
  *
  * The sufficient statistic is the per-(source, content-hash) grouped
  * frame ([[CorpusCuration.cardGrouped]]): doc and dup counts, token
  * sums, exact DECIMAL quality sums, and gate counters are all
  * ADDITIVE per key (decimal addition is exact ⇒ associative), and the
  * dominant language derives from the same rows because identical text
  * has identical language-ID. Per micro-batch one distributed grouped
  * aggregation runs (the batch operator's own first stage) and only
  * the post-aggregate frame crosses to the driver; [[current]] hands
  * the merged state to the batch operator's own value stage
  * ([[CorpusCuration.cardFromGrouped]]), so stream == batch EXACTLY.
  *
  * State is O(distinct documents) keyed by the 16-byte md5 — the
  * irreducible bound for EXACT duplicate counting (any exact streaming
  * distinct-counter holds the hash set; ~48 B per distinct doc, so
  * ~48 GB per billion docs on the driver of a dedicated monitor). A
  * deployment that accepts approximate dup counts swaps the hash key
  * for an HLL sketch per source and the rest of the card stays exact —
  * that deployment is [[StreamingCorpusCardApprox]]; this twin keeps
  * stream == batch cell-identical.
  */
class StreamingCorpusCard extends Serializable {

  // (source, h, pred) -> (n, ntok, qdec, ok, unk)
  private val stats = scala.collection.mutable.HashMap
    .empty[(String, String, String), (Long, Long, java.math.BigDecimal, Long, Long)]

  /** Merge one micro-batch of documents ((source, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = CorpusCuration.cardGrouped(docs).collect()
    this.synchronized {
      batch.foreach { r =>
        val k = (r.getString(0), r.getString(1), r.getString(2))
        val add = (r.getLong(3), r.getLong(4), r.getDecimal(5),
          r.getLong(6), r.getLong(7))
        stats.get(k) match {
          case Some((n, nt, q, ok, unk)) =>
            stats.update(k, (n + add._1, nt + add._2, q.add(add._3),
              ok + add._4, unk + add._5))
          case None => stats.update(k, add)
        }
      }
    }
  }

  private def stateRows: Seq[(String, String, String, Long, Long, BigDecimal, Long, Long)] =
    this.synchronized {
      stats.toSeq.map { case ((src, h, pred), (n, nt, q, ok, unk)) =>
        (src, h, pred, n, nt, BigDecimal(q), ok, unk)
      }
    }

  /** Current card — identical columns and values to the batch operator
    * over the same documents.
    */
  def current(s: SparkSession): DataFrame = {
    import s.implicits._
    CorpusCuration.cardFromGrouped(stateRows
      .toDF("source", "h", "pred", "n", "ntok", "qdec", "ok", "unk"))
  }

  /** Persist the sufficient statistic as parquet — because the state IS
    * the exact sufficient statistic, [[StreamingCorpusCard.restore]] +
    * remaining batches equals an uninterrupted run EXACTLY.
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    import s.implicits._
    stateRows.toDF("source", "h", "pred", "n", "ntok", "qdec", "ok", "unk")
      .write.mode("overwrite").parquet(path)
  }
}

object StreamingCorpusCard {
  /** Rebuild a monitor from a [[StreamingCorpusCard.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingCorpusCard = {
    val m = new StreamingCorpusCard
    s.read.parquet(path).collect().foreach { r =>
      m.stats.update((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getDecimal(5), r.getLong(6), r.getLong(7)))
    }
    m
  }
}
