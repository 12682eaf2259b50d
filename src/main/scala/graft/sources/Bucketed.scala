package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY §7 round-2 item 5): co-locate fact
  * tables on their join key so repeated joins/aggregations on that key
  * run with ZERO exchanges.
  *
  * At 100 TB the one-time bucketed write amortizes across every
  * downstream join: both sides of `orders ⋈ lineitem` on orderkey read
  * pre-partitioned, pre-sorted buckets, and Catalyst drops the shuffle
  * entirely (verified by the spec: no `Exchange` in the physical plan).
  */
object Bucketed {

  /** Write a DataFrame as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keyCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)   // managed: lives in spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — exchange-free when
    * bucket counts match.
    */
  def bucketedJoin(s: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    s.table(leftTable).join(s.table(rightTable),
      s.table(leftTable)(leftKey) === s.table(rightTable)(rightKey))
}
