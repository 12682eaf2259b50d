package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Short keys for the stdout JSON line. The driver tail-captures
    * ~2000 chars and parses the LAST line; at 88 queries the full
    * `q_*` names measured 1903 chars — five more queries would
    * overflow the window and kill bench visibility (memory: rounds
    * 1–4 recorded `parsed:null`). Explicit map for long names, strip
    * the `q_` prefix otherwise; full names + per-query cpu go to
    * `bench_detail.json` instead. BenchLineSpec pins uniqueness and a
    * worst-case line length < 1500.
    */
  private[graft] val ShortKey = Map(
    "q1_pricing_summary" -> "q1", "q3_top_revenue" -> "q3",
    "q5_region_volume" -> "q5",
    "q_active_projects" -> "actproj", "q_ann_brute_topk" -> "anbrut",
    "q_ann_ivf2_topk" -> "an_ivf2", "q_ann_ivf_topk" -> "an_ivf",
    "q_ann_ivfpq_topk" -> "anivfpq", "q_ann_lsh_topk" -> "an_lsh",
    "q_ann_pq_indexed" -> "anpqidx", "q_ann_pq_topk" -> "an_pq",
    "q_anti_join" -> "anti", "q_approx_stats" -> "approx",
    "q_asof_join" -> "asof", "q_attachment_text" -> "attach",
    "q_backlog_rank" -> "bklog", "q_block_tree" -> "btree",
    "q_bloom_prefilter" -> "bloom", "q_clean_pipeline" -> "cpipe",
    "q_clean_text" -> "ctext", "q_contamination" -> "contam",
    "q_date_funcs" -> "datefn", "q_dedup_clusters" -> "ddclus",
    "q_dedup_containment" -> "ddcont", "q_dedup_embedding" -> "ddemb",
    "q_dedup_exact" -> "ddexact", "q_dedup_incremental" -> "dd_incr",
    "q_dedup_keep_last" -> "keepl", "q_dedup_minhash" -> "dd_minh",
    "q_dedup_ngram_jaccard" -> "ddngram", "q_dedup_simhash" -> "dd_simh",
    "q_doc_fingerprint" -> "fingp",
    "q_domain_mix" -> "dmix",
    "q_domain_mix_up" -> "dmixup", "q_event_window_agg" -> "evwin",
    "q_filter_tags" -> "ftags", "q_gopher_filter" -> "gopher",
    "q_heavy_hitters" -> "hh", "q_hierarchy_rollup" -> "hier",
    "q_interval_join" -> "intvl", "q_json_normalize" -> "jnorm",
    "q_json_props" -> "jprops", "q_keyed_sample" -> "ksamp",
    "q_lang_id" -> "langid", "q_length_stats" -> "lstats",
    "q_markdown_runs" -> "mdruns", "q_moving_avg" -> "movavg",
    "q_multimodal_meta" -> "mmeta", "q_ngram_freq" -> "ngramfq",
    "q_normalize_status" -> "nstat", "q_oldest_pending" -> "oldest",
    "q_paged_ingest" -> "paged", "q_parent_join" -> "parjoin",
    "q_period_report" -> "period", "q_pii_scrub" -> "pii",
    "q_priority_dist" -> "prdist", "q_project_flags" -> "pflags",
    "q_quality_score" -> "quality", "q_repetition" -> "repet",
    "q_report_doc" -> "repdoc", "q_report_goals" -> "rgoals",
    "q_retention" -> "reten", "q_running_total" -> "runtot",
    "q_schema_health" -> "schema", "q_semi_join" -> "semi",
    "q_session_window" -> "seswin", "q_sessionize" -> "sessize",
    "q_set_ops" -> "setops", "q_status_dist" -> "stdist",
    "q_status_summary" -> "stsum", "q_stratified_sample" -> "strat",
    "q_string_funcs" -> "strfn", "q_tfidf_top_terms" -> "tfidf",
    "q_token_count" -> "tokens", "q_topk_per_key" -> "topkk",
    "q_uncategorized" -> "uncat", "q_value_deciles" -> "deciles",
    "q_vocab_topk" -> "vocab", "q_weekly_focus" -> "wkfoc",
    "q_weekly_velocity" -> "wkvel", "q_weighted_mean" -> "wmean",
    "q_wow_change" -> "wow")

  private[graft] def shortKey(name: String): String =
    ShortKey.getOrElse(name, name.stripPrefix("q_"))

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
    // Executor CPU time per query via a listener: under machine
    // contention wall time inflates while cpu stays plan-proportional,
    // so cpu-vs-wall is the signal that separates a plan regression
    // from a noisy environment (the r5 driver capture recorded 303 s
    // of contention that read as a 3x regression). The bus is async —
    // drain it at each query boundary so attribution doesn't bleed.
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    def drain(): Unit =
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load0 = osBean.getSystemLoadAverage
    // noop sink forces the FULL plan (count() would let Catalyst prune
    // the projections being measured).
    // failed queries record NEGATIVE elapsed time — the JSON stays
    // machine-readable and a failure can't masquerade as a fast run
    // (clamped to -0.1 so a sub-50-ms analysis failure survives the
    // 1-dp trim as "-0.1", never "-0")
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      drain()
      val c0 = cpuNs.get
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      val cpu = (cpuNs.get - c0) / 1e9
      (name, if (ok) dt else -math.max(dt, 0.1), cpu)
    }
    // The one-line JSON must fit the driver's 2000-char tail-capture
    // window even as the catalog grows: short keys (ShortKey above),
    // per-query times at 1 dp with trailing zeros trimmed, total at
    // 2 dp. Aggregate cpu seconds + load averages ride the line as the
    // contention indicators; the per-query cpu detail (with FULL query
    // names) goes to bench_detail.json beside the repo.
    def fmt(dp: Int)(v: Double): String = {
      val s = if (dp == 1) f"$v%.1f" else f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    val qs = results.map { case (k, v, _) => s"\"" + shortKey(k) + "\":" + fmt(1)(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(r => math.abs(r._2)).sum else 0.0
    val cpuTotal = results.map(_._3).sum
    graft.operators.Dedup.releaseShingleCache(spark, sfDir)
    graft.operators.ReportDoc.releaseReportCache(spark, sfDir)
    val load1 = osBean.getSystemLoadAverage
    // sf as the basename only ("sf0.1"), not the full path: every char
    // counts against the tail window.
    val sfName = new java.io.File(sfDir).getName
    val line = s"""{"metric":"total","value":${fmt(2)(total)},"unit":"sec","queries":$qs,""" +
      s""""cpu":${fmt(1)(cpuTotal)},"ld":[${fmt(2)(load0)},${fmt(2)(load1)}],"sf":"$sfName"}"""
    // Full-name per-query wall+cpu record for contention forensics —
    // not budget-bound, so keep full precision here.
    val detail = results.map { case (k, v, c) =>
      s"""  "$k": {"sec": ${f"$v%.3f"}, "cpu": ${f"$c%.3f"}}"""
    }.mkString(
      s"""{\n "sf": "$sfName", "cpus": $cpus, "load": [$load0, $load1],\n "queries": {\n""",
      ",\n", "\n }\n}\n")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write: $e") }
    // Stop Spark BEFORE printing so shutdown-time log lines can't land
    // after the JSON and push it out of a last-line/tail parse.
    spark.stop()
    println(line)
    System.out.flush()
  }
}
