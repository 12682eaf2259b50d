package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EntityResolve

/** Streaming record linkage — the live twin of
  * `q_entity_resolve_incr`: dirty records link against the STANDING
  * entity store AS THEY ARRIVE (a master-data feed cannot wait for the
  * nightly batch to discover that two arrivals are the same entity).
  *
  * Per micro-batch the work is exactly the batch path's O(batch ×
  * avg-block): the bounded arriving batch broadcasts into the blocked
  * standing store — one map-side equi-join, zero shuffle of the store.
  * The store is FROZEN at construction (the frozen-artifact contract
  * every streaming twin shares: re-blocking mid-stream would change
  * link identities), so stream-linked == batch-linked is structural
  * over any batch split.
  *
  * Live state: the accumulated verified links — O(links), the sink
  * output itself (a linkage pipeline's product), plus per-entity link
  * counters (bounded by the entity count) for the match-rate view a
  * serving layer watches. Snapshot persists the links; restore
  * continues them (spec: 2-batch split + mid-stream restore == the
  * batch incremental output).
  */
class StreamingEntityResolve(dir: String) extends Serializable {

  // (rec_new, rec_std, entity, dist) accumulated across batches — a
  // SET, so a replayed batch's links land once (foreachBatch restart
  // re-delivers at-least-once; the batchId guard below short-circuits
  // the recompute, the set makes even a guard miss idempotent)
  private val links =
    scala.collection.mutable.LinkedHashSet.empty[(Long, Long, Long, Int)]
  private val seenBatches = scala.collection.mutable.Set.empty[Long]

  // The frozen standing store's ADAPTIVE block stats + blocked frame,
  // built once at first batch (the frozen-artifact contract already
  // freezes the store, so its refinement stats are fixed for the
  // stream's life). Both sides block through THESE stats — exactly the
  // batch path's shape (EntityResolve.entityResolveIncremental): the
  // fixed 2-char BlockLen kept the flooded-key O(batch × hot-block)
  // join the adaptive blocking was added to bound, and a matched pair
  // provably shares its refined key (same prefixes ≤ BlockSafeMax ⇒
  // same stats row).
  @transient private var frozen: (DataFrame, DataFrame) = _

  private def standingBlocked(s: SparkSession): (DataFrame, DataFrame) =
    this.synchronized {
      if (frozen == null) {
        val r = EntityResolve.records(s, dir).filter(col("variant") =!= 2)
        val stats = EntityResolve.blockStats(r)
        frozen = (EntityResolve.applyBlocks(r, stats)
          .select(col("rec_id").as("rec_std"), col("entity").as("ent_std"),
            col("name").as("name_std"), col("block")),
          stats)
      }
      frozen
    }

  /** Link one micro-batch of dirty records (rec_id, name). */
  def mergeBatch(s: SparkSession, batch: DataFrame): Unit = {
    val (standing, stats) = standingBlocked(s)
    val b = EntityResolve.applyBlocks(
        batch.select(col("rec_id"), col("name")), stats)
      .select(col("rec_id").as("rec_new"), col("name").as("name_new"),
        col("block"))
    val found = standing.join(broadcast(b), Seq("block"))
      .withColumn("dist", levenshtein(col("name_new"), col("name_std")))
      .filter(col("dist") <= EntityResolve.MatchMax)
      .select(col("rec_new"), col("rec_std"), col("ent_std"), col("dist"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    this.synchronized { links ++= found }
  }

  /** foreachBatch hook — exactly-once by batchId (the repo's
    * appendTxn recipe): a restart's replayed batch is a no-op.
    */
  def sink(batch: DataFrame, batchId: Long): Unit = {
    val fresh = this.synchronized { seenBatches.add(batchId) }
    if (fresh) mergeBatch(batch.sparkSession, batch)
  }

  /** All links so far, the batch output's order: (rec_new, rec_std,
    * entity, dist) sorted by (rec_new, rec_std).
    */
  def current(): Seq[(Long, Long, Long, Int)] = this.synchronized {
    links.toSeq.sortBy(l => (l._1, l._2))
  }

  /** Per-entity link counts (the match-rate view, bounded metadata). */
  def entityLinkCounts: Map[Long, Long] = this.synchronized {
    links.groupBy(_._3).map { case (e, ls) => e -> ls.size.toLong }
  }

  /** Persist the accumulated links. */
  def snapshot(s: SparkSession, path: String): Unit = {
    val rows = this.synchronized { links.toSeq }
    import s.implicits._
    rows.toDF("rec_new", "rec_std", "entity", "dist")
      .write.mode("overwrite").parquet(s"$path/links")
  }
}

object StreamingEntityResolve {
  def restore(s: SparkSession, path: String, dir: String): StreamingEntityResolve = {
    val m = new StreamingEntityResolve(dir)
    s.read.parquet(s"$path/links").collect().foreach { r =>
      m.links += ((r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    }
    m
  }
}
