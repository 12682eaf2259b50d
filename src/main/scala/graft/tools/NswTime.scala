package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timer for the driver-local NSW graph build (GraphAnn): load
  * the training sample, stop Spark, time buildGraph + a query sweep.
  * `runMain graft.tools.NswTime <sfDir> [reps]`
  */
object NswTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.ShuffleDefaults(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Similarity.trainingSample(
      graft.operators.Similarity.normed(spark, dir),
      graft.operators.Similarity.TrainSampleCap)
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .sortBy(_.getLong(0))
    spark.stop()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    val norms = rows.map(_.getDouble(2))
    println(s"[nsw] n=${ids.length} dim=${vecs.head.length}")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val g = graft.operators.GraphAnn.buildGraph(ids, vecs, norms)
      val t1 = System.nanoTime()
      var checksum = 0L
      var qi = 0
      while (qi < math.min(64, ids.length)) {
        val found = graft.operators.GraphAnn.beamSearch(g, vecs(qi), norms(qi),
          graft.operators.GraphAnn.EfSearch)
        checksum = 31 * checksum + found.take(8).sum
        qi += 1
      }
      val t2 = System.nanoTime()
      println(f"[nsw] rep$i build=${(t1 - t0) / 1e9}%.3f s  search64=${(t2 - t1) / 1e9}%.3f s  checksum=$checksum")
    }
  }
}
