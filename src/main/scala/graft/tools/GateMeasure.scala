package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the measured value behind every RecallReport gate for a
  * testdata dir — the threshold-setting companion to `q_recall_report`
  * (run at each shipped SF before tightening a threshold).
  *
  * `runMain graft.tools.GateMeasure <sfDir>`
  */
object GateMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.ShuffleDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val th = graft.operators.RecallReport.GateThresholds.toMap
    graft.operators.RecallReport.measured(spark, sfDir).foreach { case (g, v) =>
      println(f"[gate] $g%-28s measured=$v%3d threshold=${th(g)}%3d")
    }
    spark.stop()
  }
}
