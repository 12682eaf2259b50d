package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning
  * (SURVEY §5): Z-ORDER (Morton) writes.
  *
  * The 100 TB problem: parquet min/max stats prune files only along the
  * sort order — sort by `ts` and a `user_id` filter still touches every
  * file. Interleaving the bits of two (bucketed) dimensions into one
  * z-value makes a range filter on EITHER dimension map to a compact
  * set of z-ranges, so both predicates prune. Classic lakehouse layout
  * optimization (OPTIMIZE ZORDER BY), here as a plain Spark write:
  * one min/max aggregate (broadcast scalar row), map-side bucketing +
  * bit interleave, `repartitionByRange` + `sortWithinPartitions` on the
  * z-value, parquet out. No shuffle beyond the one range exchange the
  * re-layout itself requires.
  */
object Layout {

  /** Bits per dimension (z-value = 2·ZBits wide). 16 bits → 65,536
    * buckets per dimension, plenty of resolution for file-level pruning
    * while keeping the interleave a 32-term codegen'd expression.
    */
  val ZBits = 16

  /** Interleave the low `bits` of two non-negative long columns:
    * a-bit i → z-bit 2i, b-bit i → z-bit 2i+1.
    */
  def zInterleave(a: Column, b: Column, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Linear-bucket a numeric column into [0, 2^bits) against its
    * min/max (degenerate min==max buckets to 0).
    */
  private def bucketize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val n = (1L << bits) - 1
    when(span <= 0, lit(0L)).otherwise(
      least(floor((c.cast("double") - lo.cast("double")) / span * n), lit(n)).cast("long"))
  }

  /** `df` with a `_z` Morton-key column on (colA, colB) — the shared
    * front half of [[writeZOrdered]] and `Snapshots.clusterZ`.
    * Dimension ranges come from ONE min/max aggregate cross-joined in
    * as a broadcast scalar row — no driver action, no second scan
    * thanks to exchange reuse.
    */
  private[sources] def withZ(df: DataFrame, colA: String,
                             colB: String): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).as("_loA"), max(col(colA)).as("_hiA"),
      min(col(colB)).as("_loB"), max(col(colB)).as("_hiB"))
    val z = zInterleave(
      bucketize(col(colA), col("_loA"), col("_hiA"), ZBits),
      bucketize(col(colB), col("_loB"), col("_hiB"), ZBits))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", z)
      .drop("_loA", "_hiA", "_loB", "_hiB")
  }

  /** Write `df` z-ordered on (colA, colB) into `files` parquet files. */
  def writeZOrdered(df: DataFrame, outDir: String,
                    colA: String, colB: String, files: Int): Unit =
    withZ(df, colA, colB)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
}
