package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.datasketches.hll.{HllSketch, Union}
import graft.operators.CorpusCuration

/** Bounded-state streaming corpus card — the HLL deployment the exact
  * [[StreamingCorpusCard]]'s Scaladoc documents ("swaps the hash key
  * for an HLL sketch per source and the rest of the card stays
  * exact"), made real. The exact twin's state is O(distinct docs) —
  * the irreducible bound for EXACT duplicate counting (~48 GB per
  * billion docs). This twin trades ONLY the dup column for bounded
  * state: per (source, language) additive counters (every non-dup
  * card column stays EXACT) plus one DataSketches HLL sketch per
  * group for the distinct-doc estimate — O(sources × languages ×
  * sketch) regardless of corpus size.
  *
  * Merge is sketch UNION (associative, order-independent), so the
  * statistic remains additive across any batching. Below ~2^lgK
  * distinct docs per group the sketch sits in sparse/set mode and the
  * estimate — hence the whole card — is exact; beyond it the dup
  * column carries HLL's ~1.6% (lgK=12) relative error while the rest
  * of the card is still exact. Per micro-batch one distributed
  * grouped agg (Spark's codegen'd `hll_sketch_agg`) runs; only the
  * post-aggregate rows cross to the driver.
  */
class StreamingCorpusCardApprox extends Serializable {

  // (source, pred) -> (n, ntok, qdec, ok, unk)
  private val stats = scala.collection.mutable.HashMap
    .empty[(String, String), (Long, Long, java.math.BigDecimal, Long, Long)]
  // (source, pred) -> serialized HLL sketch of content hashes
  private val sketches =
    scala.collection.mutable.HashMap.empty[(String, String), Array[Byte]]

  private def unionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = new Union(StreamingCorpusCardApprox.LgK)
    u.update(HllSketch.heapify(a))
    u.update(HllSketch.heapify(b))
    u.getResult.toCompactByteArray
  }

  /** Merge one micro-batch of documents ((source, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val batch = CorpusCuration.cardGroupedApprox(docs).collect()
    this.synchronized {
      batch.foreach { r =>
        val k = (r.getString(0), r.getString(1))
        val add = (r.getLong(2), r.getLong(3), r.getDecimal(4),
          r.getLong(5), r.getLong(6))
        stats.get(k) match {
          case Some((n, nt, q, ok, unk)) =>
            stats.update(k, (n + add._1, nt + add._2, q.add(add._3),
              ok + add._4, unk + add._5))
          case None => stats.update(k, add)
        }
        val sk = r.getAs[Array[Byte]](7)
        sketches.update(k,
          sketches.get(k).map(unionBytes(_, sk)).getOrElse(sk))
      }
    }
  }

  private def stateRows: Seq[(String, String, Long, Long, BigDecimal, Long, Long)] =
    this.synchronized {
      stats.toSeq.map { case ((src, pred), (n, nt, q, ok, unk)) =>
        (src, pred, n, nt, BigDecimal(q), ok, unk)
      }
    }

  /** Per-source distinct-doc estimates: union the per-language
    * sketches (hash sets are disjoint across languages only by
    * accident — union is correct either way), round to the nearest
    * count.
    */
  private def estimates: Seq[(String, Long)] = this.synchronized {
    sketches.toSeq.groupBy(_._1._1).map { case (src, ss) =>
      val u = new Union(StreamingCorpusCardApprox.LgK)
      ss.foreach { case (_, b) => u.update(HllSketch.heapify(b)) }
      (src, math.round(u.getResult.getEstimate))
    }.toSeq
  }

  /** Current card — identical columns to the batch card; every value
    * except `n_exact_dups` is exact, and that one is exact too while
    * the per-source sketch is still in sparse/set mode.
    */
  def current(s: SparkSession): DataFrame = {
    import s.implicits._
    CorpusCuration.cardFromApproxGrouped(
      stateRows.toDF("source", "pred", "n", "ntok", "qdec", "ok", "unk"),
      estimates.toDF("source", "n_distinct"))
  }

  /** Persist counters + sketches — the exact (bounded) sufficient
    * statistic, so restore + remaining batches == an uninterrupted
    * run (sketch union is associative).
    */
  def snapshot(s: SparkSession, path: String): Unit = {
    import s.implicits._
    stateRows.toDF("source", "pred", "n", "ntok", "qdec", "ok", "unk")
      .write.mode("overwrite").parquet(s"$path/counts")
    this.synchronized {
      sketches.toSeq.map { case ((src, pred), b) => (src, pred, b) }
    }.toDF("source", "pred", "hsk")
      .write.mode("overwrite").parquet(s"$path/sketches")
  }
}

object StreamingCorpusCardApprox {
  /** Spark's `hll_sketch_agg` default lgConfigK — the union target
    * must not downgrade the per-batch sketches' precision.
    */
  val LgK = 12

  /** Rebuild a monitor from a [[StreamingCorpusCardApprox.snapshot]]. */
  def restore(s: SparkSession, path: String): StreamingCorpusCardApprox = {
    val m = new StreamingCorpusCardApprox
    s.read.parquet(s"$path/counts").collect().foreach { r =>
      m.stats.update((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDecimal(4), r.getLong(5), r.getLong(6)))
    }
    s.read.parquet(s"$path/sketches").collect().foreach { r =>
      m.sketches.update((r.getString(0), r.getString(1)), r.getAs[Array[Byte]](2))
    }
    m
  }
}
