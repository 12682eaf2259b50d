package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timer decomposing the q_ann_hnsw_indexed build
  * (GraphIndex.materialize): routing-graph build, closure-assignment
  * compute (noop sink), and the sharded posting write — the write is
  * the r17 optimization target (256 shard dirs on a ~1 ms/create FS).
  * `runMain graft.tools.AhxTime <sfDir> [reps]`
  */
object AhxTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ShuffleDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ahx] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"[ahx] --- rep$i ---")
      val g = t("graph")(graft.operators.GraphAnn.graph(spark, dir))
      val assigned = graft.operators.GraphAnn.assignedFrame(
        graft.Tables.embeddingsAssignSpread(spark,
          graft.operators.Similarity.normed(spark, dir), dir, g.ids.length), g)
      t("assign (noop)") {
        assigned.write.format("noop").mode("overwrite").save()
      }
      val root = java.nio.file.Files.createTempDirectory("graft_ahxtime").toString
      for (sh <- Seq(graft.sources.GraphIndex.NodeShards,
          graft.sources.GraphIndex.shardsFor(g.ids.length), 64, 32, 16).distinct)
        t(s"write $sh shards") {
          assigned
            .withColumn("nshard", pmod(col("node"), lit(sh)).cast("int"))
            .repartition(col("nshard"))
            .write.mode("overwrite").partitionBy("nshard").parquet(s"$root/p$sh")
        }
      t("meta sidecar") {
        import spark.implicits._
        Seq((g.ids.toSeq, g.vecs.map(_.toSeq).toSeq, g.norms.toSeq,
          g.nbrs.map(_.toSeq).toSeq))
          .toDF("node_ids", "node_vecs", "node_norms", "node_nbrs")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      }
      t("cleanup") {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(root)
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(f => java.nio.file.Files.delete(f))
      }
    }
    spark.stop()
  }
}
