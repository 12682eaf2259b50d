package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources / sinks (SURVEY §2.8) — the reference's export surface
  * (fetch_pages.py:590-620: CSV cache, JSON records export, incremental
  * keep-last merge) re-expressed as distributed writers.
  *
  * CSV/JSON here are line-oriented and partition-parallel (a 100 TB
  * export is a directory of part files, not one file); the incremental
  * cache is a keep-last merge the reference does with
  * `drop_duplicates(keep="last")` in pandas.
  */
object Export {

  /** CSV export with header (reference: tasks_df.to_csv). RFC-4180
    * quoting (`""` escapes a quote — Spark's default is backslash
    * escaping, which round-trips only through Spark itself) so embedded
    * delimiters, quotes, and newlines survive any standard reader
    * (spec'd).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** JSON-records export (reference: to_json(orient="records") — at
    * scale the Spark-native form is JSON-lines part files).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-explicit CSV read — no inference scan (an inference pass at
    * 100 TB is a full extra read). PERMISSIVE mode with multiline quote
    * support: a malformed row lands in `_corrupt_record` (when the
    * schema declares it) instead of failing the 100 TB job at hour 9.
    */
  def readCsv(s: SparkSession, path: String, schema: StructType,
              options: Map[String, String] = Map.empty): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .options(options) // caller quirks last: encoding, sep, nullValue…
      .csv(path)

  /** Schema-explicit JSON-lines read, PERMISSIVE: rows that fail to
    * parse (or conform) surface in `_corrupt_record` when the schema
    * declares it; fields absent from evolving producers read as null —
    * the additive-schema-evolution contract.
    */
  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Parquet read across an evolving directory: `mergeSchema` unions
    * part-file schemas (additive evolution — old parts read new columns
    * as null). Off by default in Spark because footer-merging costs a
    * pass over file metadata; turning it on here is the explicit
    * conformance choice.
    */
  def readParquetMerged(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** ORC round-trip — the other columnar format Spark ships natively
    * (predicate pushdown + column pruning work the same as parquet, so
    * a reference user on an ORC lake switches formats, not plans).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Compressed parquet export: zstd trades ~10-20% write CPU for
    * materially smaller files than the snappy default — at 100 TB the
    * scan is IO-bound, so smaller-on-disk wins reads too. (The zstd
    * level is a cluster-static conf, `spark.io.compression.zstd.level`
    * — set it at session build, not per write.)
    */
  def writeParquetZstd(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** Incremental keep-last upsert (fetch_pages.py:594-601): union the
    * cached and fresh rows, keep the newest row per key. One shuffle on
    * the key; `version` breaks ties in favour of updates.
    */
  def upsertKeepLast(existing: DataFrame, updates: DataFrame,
                     key: Seq[String], ord: String): DataFrame = {
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ord).desc, col("_src").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Streaming → batch bridge: maintain an incrementally-upserted
    * parquet cache from a stream via foreachBatch (the reference's
    * incremental CSV cache, fetch_pages.py:550-604, as a continuous
    * process). Each micro-batch merges keep-last into the cache.
    */
  def streamingUpsertSink(stream: DataFrame, cachePath: String,
                          key: Seq[String], ord: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val s = batch.sparkSession
      val existing =
        try s.read.parquet(cachePath)
        catch { case _: Throwable => s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
      val merged = upsertKeepLast(existing, batch, key, ord)
      // write to a temp dir then swap: the cache is also this batch's input
      val tmpPath = cachePath + "_tmp"
      merged.write.mode("overwrite").parquet(tmpPath)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tmpPath), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(cachePath), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmpPath), new org.apache.hadoop.fs.Path(cachePath))
      ()
    }.start()

  /** Partitioned parquet sink (natural-key layout, e.g. date for events:
    * partition pruning makes period queries touch only their slice).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Grouped-section export — the reference's report assembly
    * (generate_reports.py:308-520 feeds one ordered, grouped, truncated
    * frame per section to the renderer). Each section becomes a
    * `section=<v>/` partition directory holding its top `maxPerSection`
    * rows in render order: rank-truncate within sections (one shuffle),
    * co-locate each section, and sort within the output files so a
    * renderer streams them as-is.
    */
  def writeSectioned(df: DataFrame, path: String, sectionCol: String,
                     orderCols: Seq[String], maxPerSection: Int): Unit = {
    val w = Window.partitionBy(col(sectionCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPerSection)
      .drop("_rn")
      .repartition(col(sectionCol))
      .sortWithinPartitions((sectionCol +: orderCols).map(col): _*)
      .write.mode("overwrite").partitionBy(sectionCol).parquet(path)
  }

  /** Deterministic training-shard export — the webdataset-style sink a
    * pretraining loader reads: the frame lands in `n` shard directories
    * (`shard=<k>/`) with a JSON manifest recording per-shard row counts
    * and the key range, so a loader can size epochs and resume without
    * listing data files. Shard assignment is the portable multiplicative
    * hash of `keyCol` mod n — engine- and partitioning-independent and
    * STABLE under corpus growth (a doc's shard never changes when other
    * docs arrive), same contract as q_data_split. One hash-partitioned
    * exchange, rows sorted by key within each shard for reproducible
    * iteration order; the manifest is one bounded aggregate (n rows).
    */
  val ShardHashA = 2654435761L
  def writeSharded(df: DataFrame, path: String, keyCol: String, n: Int): Unit = {
    require(n > 0, "shard count must be positive")
    // Reduce the key mod p BEFORE multiplying: (k mod p)*A fits in a Long
    // ((p-1)*A ~ 2.7e18 < 2^63), whereas k*A overflows (= ANSI
    // ARITHMETIC_OVERFLOW) for keys >= ~3.5e9. Congruent mod p, so shard
    // assignment is unchanged for every key the old form could handle.
    val sharded = df.withColumn("shard",
      pmod(pmod(pmod(col(keyCol), lit(1000000007L)) * lit(ShardHashA),
        lit(1000000007L)), lit(n.toLong)))
    sharded
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val manifest = sharded.groupBy("shard")
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))
      .orderBy("shard")
      .toJSON.collect().mkString("\n") // JSON-lines: any engine reads it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Small-files compaction — the operational companion every streaming
    * / incremental sink needs: micro-batches and per-key upserts leave
    * thousands of KB-sized files whose open/footer overhead eventually
    * dominates the scan. Re-layout to `ceil(bytes / targetFileBytes)`
    * files, optionally range-clustered+sorted on `sortCols` so min/max
    * pruning survives the rewrite. Sizing reads the source directory's
    * byte size from the filesystem — metadata only, no extra data scan;
    * writes to a fresh directory (a production lakehouse swaps it in
    * transactionally — out of scope here).
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = s.read.parquet(inPath)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(files, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(files)
    laid.write.mode("overwrite").parquet(outPath)
  }

  /** Shards in the audited training export. */
  val ShardCount = 16

  /** One-time sharded export of the documents corpus (doc_id +
    * token count per row) under an app-scoped root — the artifact
    * [[shardBalance]] audits. Marker-skipped on re-invocation.
    */
  def materializeShards(s: SparkSession, dir: String): String = {
    val root = ScopedFixture.root(s, "graft_shards", dir)
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    writeSharded(docs, s"$root/shards", "doc_id", ShardCount)
    ScopedFixture.markComplete(root)
    root
  }

  /** Shard-balance audit (`q_shard_balance`): per shard of the
    * materialized training export, document and token counts plus the
    * load factor (n_docs · shards / total) — the table a loader ops
    * review reads before an epoch (a hot shard = a straggling data-
    * loader worker every epoch). The query reads the WRITTEN artifact
    * while the DuckDB oracle recomputes the portable-hash assignment
    * from the raw corpus — their cell-equality proves the export's
    * partitioning and round trip end-to-end, the same artifact
    * contract as q_bpe_persisted/q_ann_pq_indexed.
    *
    * Shape: one scan of the shard tree (the `shard=k/` partition
    * column prunes nothing here — every shard aggregates — but the
    * scan is column-pruned to 2 ints), dim-sized per-shard aggregate,
    * broadcast scalar total for the load factor.
    */
  def shardBalance(s: SparkSession, dir: String): DataFrame = {
    val root = materializeShards(s, dir)
    val per = s.read.parquet(s"$root/shards")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    val tot = per.agg(sum("n_docs").as("_td"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        (floor(col("n_docs").cast("double") * lit(ShardCount) / col("_td") *
          lit(1e4) + lit(0.5)) / 1e4).as("load_factor"))
      .orderBy("shard")
  }

  /** DuckDB twin of [[shardBalance]] — recomputes the shard assignment
    * from `documents` with the same reduced multiplicative hash.
    */
  def shardBalanceOracleSql: String =
    s"""WITH t AS (
       |  SELECT CAST(doc_id % 1000000007 * $ShardHashA % 1000000007
       |           % $ShardCount AS BIGINT) AS shard,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |a AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |      FROM t GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td FROM a)
       |SELECT shard, n_docs, n_tokens,
       |  floor(CAST(n_docs AS DOUBLE) * $ShardCount / td * 1e4 + 0.5) / 1e4
       |    AS load_factor
       |FROM a, tot ORDER BY shard""".stripMargin
}
