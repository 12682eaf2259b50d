package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off cardinality probe for the dedup co-occurrence pipeline:
  * postings rows, Σ df² join fan-out, distinct candidate pairs, and
  * per-band bucket stats — the numbers that size the pair-agg hash
  * maps (r17 optimization forensics).
  * `runMain graft.tools.DedupStats <sfDir>`
  */
object DedupStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ShuffleDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    val docs = graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("h"))
    val nPost = ex.count()
    val dfs = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val stats = dfs.agg(count(lit(1)).as("nShingle"), max("df").as("maxDf"),
      sum(col("df") * (col("df") - 1) / 2).as("pairFanout")).head()
    println(s"[stats] postings=$nPost distinctShingles=${stats.getLong(0)} " +
      s"maxDf=${stats.getLong(1)} sumDfChoose2=${stats.getAs[Any](2)}")
    val capped = dfs.filter(col("df") <= graft.operators.Dedup.MaxShingleDf)
    val s2 = capped.agg(sum(col("df") * (col("df") - 1) / 2).as("cappedFanout")).head()
    println(s"[stats] cappedPairFanout=${s2.getAs[Any](0)}")
    val cooc = ex.as("x").join(ex.as("y"),
      col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    println(s"[stats] distinctCoocPairs=${cooc.count()}")
    spark.stop()
  }
}
