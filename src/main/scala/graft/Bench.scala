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
    "q_active_projects" -> "aprj", "q_ann_brute_topk" -> "abrt",
    "q_ann_ivf2_topk" -> "aiv2", "q_ann_ivf_topk" -> "aivf",
    "q_ann_ivfpq_topk" -> "aipq", "q_ann_lsh_topk" -> "alsh",
    "q_ann_pq_indexed" -> "apqi", "q_ann_pq_topk" -> "apq",
    "q_anti_join" -> "anti", "q_approx_stats" -> "apx",
    "q_argmax" -> "amax",
    "q_asof_join" -> "asof", "q_attachment_text" -> "atch",
    "q_backlog_rank" -> "bklg", "q_block_tree" -> "btre",
    "q_bloom_prefilter" -> "blom", "q_bpe_merges" -> "bpe",
    "q_bpe_vocab" -> "bpev", "q_bpe_encode" -> "bpee",
    "q_clean_pipeline" -> "cpip",
    "q_chunk_docs" -> "chnk",
    "q_clean_text" -> "ctxt", "q_contamination" -> "ctam",
    "q_cooccur" -> "cooc", "q_corpus_pipeline" -> "corp",
    "q_date_funcs" -> "dtfn", "q_dedup_clusters" -> "ddcl",
    "q_dedup_containment" -> "ddct", "q_dedup_embedding" -> "dde",
    "q_dedup_exact" -> "ddex", "q_dedup_incremental" -> "ddin",
    "q_dedup_keep_last" -> "klst", "q_dedup_minhash" -> "ddmh",
    "q_dedup_ngram_jaccard" -> "ddng", "q_dedup_semantic" -> "ddse",
    "q_dedup_simhash" -> "ddsh", "q_dedup_span" -> "ddsp",
    "q_doc_fingerprint" -> "fgp",
    "q_domain_mix" -> "dmx", "q_domain_mix_alpha" -> "dmxa",
    "q_domain_mix_up" -> "dmxu", "q_event_window_agg" -> "evw",
    "q_filter_tags" -> "ftag", "q_funnel" -> "funl",
    "q_gopher_filter" -> "goph",
    "q_heavy_hitters" -> "hh", "q_hierarchy_rollup" -> "hier",
    "q_interval_join" -> "intv", "q_json_normalize" -> "jnrm",
    "q_json_props" -> "jprp", "q_keyed_sample" -> "ksmp",
    "q_lang_id" -> "lang", "q_length_stats" -> "lsts",
    "q_lm_score" -> "lmsc",
    "q_markdown_runs" -> "mdrn", "q_moving_avg" -> "mavg",
    "q_multimodal_meta" -> "mmet", "q_ngram_freq" -> "ngfq",
    "q_normalize_status" -> "nst", "q_oldest_pending" -> "olds",
    "q_overdue" -> "ovd", "q_pack_sequences" -> "pack",
    "q_paged_ingest" -> "pagd", "q_parent_join" -> "pjn",
    "q_period_report" -> "perd", "q_pii_scrub" -> "pii",
    "q_pivot" -> "pvt",
    "q_priority_dist" -> "prds", "q_project_flags" -> "pflg",
    "q_quality_sample" -> "qsmp",
    "q_quality_score" -> "qual", "q_repetition" -> "rept",
    "q_report_doc" -> "rdoc", "q_report_goals" -> "rgls",
    "q_retention" -> "retn", "q_rollup" -> "rlup",
    "q_running_total" -> "rtot",
    "q_schema_health" -> "schm", "q_semi_join" -> "semi",
    "q_session_window" -> "sswn", "q_sessionize" -> "sesz",
    "q_set_ops" -> "sops", "q_status_dist" -> "stds",
    "q_status_summary" -> "stsm", "q_stratified_sample" -> "strt",
    "q_string_funcs" -> "strf", "q_tfidf_top_terms" -> "tfid",
    "q_token_count" -> "tokn", "q_topk_per_key" -> "topk",
    "q_uncategorized" -> "uncg", "q_value_deciles" -> "decl",
    "q_vocab_topk" -> "vocb", "q_weekly_focus" -> "wkfc",
    "q_weekly_velocity" -> "wkvl", "q_weighted_mean" -> "wmn",
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
    graft.operators.TextAnalysis.releasePipelineCache(spark, sfDir)
    graft.operators.Bpe.releaseLearnedCache(spark, sfDir)
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
