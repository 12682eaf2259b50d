package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.BloomProbe

/** Bloom-filter semi-join pruning (SURVEY §2.1b).
  *
  * The 100 TB problem: a fact⋈dim semi join shuffles (or at best scans
  * and hashes) the FULL fact side even when the filtered dim keeps a few
  * percent of keys. The runtime-filter answer: aggregate the dim keys
  * into a fixed-size bloom filter (distributed build, driver collects
  * only the KB-MB bitmap — same bounded-metadata pattern as the IVF
  * centroid matrix), probe it map-side on the fact scan, and let the
  * exact equi-join afterwards remove the fpp false positives — output is
  * EXACT, the bloom only cuts the rows that reach the shuffle/join.
  * False negatives are impossible, so no qualifying row is lost.
  */
object BloomPrune {

  /** 3% fpp at 1M-key capacity ≈ 0.9 MB bitmap — independent of the
    * FACT side's size, which is what makes the pattern scale: the
    * filter is sized by the dimension key count (bounded), not the
    * corpus. Production would size capacity from the dim's row-count
    * stats; a capacity below the true key count only degrades fpp,
    * never correctness.
    */
  val Fpp = 0.03
  val BloomKeyCapacity = 1000000L
  val CutoffDate = "1997-01-01"

  /** Distributed bloom build over one long column of `keys`; returns the
    * serialized bitmap.
    */
  def bloomFor(keys: DataFrame, column: String): Array[Byte] = {
    val bf = keys.stat.bloomFilter(column, BloomKeyCapacity, Fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** q_bloom_prefilter — revenue by priority over lineitems of finalized
    * 1997+ orders. The lineitem scan is pre-filtered by the bloom of the
    * qualifying o_orderkey set (map-side, before the join), then the
    * exact equi-join drops false positives, so the result equals the
    * plain join — but only ~sel+fpp of the fact survives to shuffle.
    */
  def prefilterRevenue(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= lit(CutoffDate).cast("timestamp"))
      .select("o_orderkey", "o_orderpriority")
    val bloom = bloomFor(keys, "o_orderkey")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .filter(BloomProbe.mightContain(col("l_orderkey"), bloom))
      .join(keys, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
