package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // default openCost (4 MB) + 4 MB partitions = one file per task:
      // the attachment tree's ~2000 tiny files became ~2000 tasks of
      // pure scheduling overhead. 64 KB packs small files ~60/task.
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so the first measured query doesn't
    // absorb JIT + session initialization. The flagship alone leaves the
    // window/HOF/aggregate codegen paths cold, and the first measured
    // query then swings up to 3x run-to-run (observed 18 s vs 3.7 s for
    // the same query in BENCH_r05 trial runs) — touch each major path
    // against each table once, unmeasured. These are generic plans, not
    // catalog queries: per-query session state (caches, fixture trees)
    // still costs the query that builds it.
    locally {
      import org.apache.spark.sql.functions._
      // each warmup fails independently — one missing table must not
      // silently skip the rest and reintroduce the first-query swing
      def warm(df: => org.apache.spark.sql.DataFrame): Unit =
        try df.write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
      warm(SparkEntry.entry(spark))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      warm(Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1))
      warm(Tables.documents(spark, sfDir)
        .select(aggregate(graft.functions.TextFunctions.tokens(col("text")),
          lit(0L), (a, x) => a + length(x)).as("n"))
        .agg(sum("n")))
      warm(Tables.embeddings(spark, sfDir)
        .select(graft.plans.ArrayOps.dotF(col("embedding"), col("embedding")).as("d"))
        .agg(sum("d")))
    }
    // noop sink forces the FULL plan (count() would let Catalyst prune
    // the projections being measured).
    // failed queries record NEGATIVE elapsed time — the JSON stays
    // machine-readable and a failure can't masquerade as a fast run
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }
    // The one-line JSON must fit the driver's 2000-char tail-capture
    // window even as the catalog grows (83 queries at 2-dp measured
    // 1901 chars — one more round of queries would overflow): per-query
    // times at 1 dp with trailing zeros trimmed, total at 2 dp.
    def fmt(dp: Int)(v: Double): String = {
      val s = if (dp == 1) f"$v%.1f" else f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(1)(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(math.abs).sum else 0.0
    graft.operators.Dedup.releaseShingleCache(spark, sfDir)
    graft.operators.ReportDoc.releaseReportCache(spark, sfDir)
    // sf as the basename only ("sf0.1"), not the full path: every char
    // counts against the tail window.
    val sfName = new java.io.File(sfDir).getName
    val line = s"""{"metric":"total","value":${fmt(2)(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    // Stop Spark BEFORE printing so shutdown-time log lines can't land
    // after the JSON and push it out of a last-line/tail parse.
    spark.stop()
    println(line)
    System.out.flush()
  }
}
