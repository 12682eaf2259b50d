package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe for optimization work: runs the named
  * catalog queries (or `shared_*` builds) N times each against a dir,
  * printing wall / executor-cpu / gc per run — the Bench measurement
  * loop without the full catalog, for A/B isolation of one entry.
  *
  * Usage: Probe <sfDir> <reps> <name> [<name> ...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
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
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })
    def drain(): Unit =
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    val shared = graft.Bench.SharedBuilds.toMap
    // PROBE_CODEGEN=<dir>: dump each query's whole-stage generated
    // code to <dir>/<name>.codegen.txt instead of timing it.
    sys.env.get("PROBE_CODEGEN").foreach { outDir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val code = org.apache.spark.sql.execution.debug.codegenString(
          df.queryExecution.executedPlan)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.codegen.txt"),
          code.getBytes("UTF-8"))
      }
      spark.stop()
      return
    }
    // PROBE_EXPLAIN=<dir>: write each query's formatted plan to
    // <dir>/<name>.txt instead of timing it.
    sys.env.get("PROBE_EXPLAIN").foreach { outDir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
      spark.stop()
      return
    }
    // PROBE_SPLIT=1: decompose each rep into frame construction
    // (Memo lookups + plan building), plan resolution (Catalyst
    // analysis + optimization + physical planning, via executedPlan),
    // and execution (noop write incl. AQE stage scheduling + any
    // remaining codegen) — the per-query fixed-tail forensics mode.
    val split = sys.env.get("PROBE_SPLIT").contains("1")
    names.foreach { name =>
      (1 to reps).foreach { i =>
        drain()
        val c0 = cpuNs.get; val g0 = gcMs.get; val t0 = System.nanoTime()
        try {
          shared.get(name) match {
            case Some(fn) => fn(spark, dir)
            case None if split =>
              val tc0 = System.nanoTime()
              val df = graft.SparkEntry.queries(name)(spark, dir)
              val tc1 = System.nanoTime()
              df.queryExecution.executedPlan
              val tc2 = System.nanoTime()
              df.write.format("noop").mode("overwrite").save()
              val tc3 = System.nanoTime()
              println(f"[split] $name rep$i construct=${(tc1 - tc0) / 1e9}%.3f " +
                f"plan=${(tc2 - tc1) / 1e9}%.3f exec=${(tc3 - tc2) / 1e9}%.3f")
            case None =>
              graft.SparkEntry.queries(name)(spark, dir)
                .write.format("noop").mode("overwrite").save()
          }
        } catch { case e: Throwable => println(s"[probe] $name FAILED: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        println(f"[probe] $name rep$i wall=$dt%.2f cpu=${(cpuNs.get - c0) / 1e9}%.2f gc=${(gcMs.get - g0) / 1e3}%.2f")
      }
    }
    spark.stop()
  }
}
