package graft

import org.scalatest.funsuite.AnyFunSuite

/** The conditional narrow-layout spread (r16): the decision counts
  * parquet ROW GROUPS from footers, never planned scan partitions —
  * Spark plans `defaultParallelism` byte-range splits over even a
  * single-row-group file, but a row group is read whole by the one
  * split owning its midpoint, so partition count lies about row
  * spread (the r15 sf1 bench measured ~210 s of wall at cpu/wall ≈ 1
  * from exactly this).
  */
class TablesSpreadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeDocs(rows: Int, rowGroupRows: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    val df = (0 until rows).map(i => (i.toLong, s"doc text $i", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    // parquet.block.size is a byte bound; force row-group granularity
    // via the writer's row-count knob instead
    df.coalesce(1).write
      .option("parquet.block.size", "1048576")
      .option("spark.sql.files.maxRecordsPerFile", "0")
      .mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("row-group counter reads footers: one group per small file") {
    val dir = writeDocs(rows = 1000, rowGroupRows = 1000)
    val path = s"$dir/documents.parquet"
    assert(Tables.rowGroups(spark, path) === 1)
  }

  test("single-row-group layout spreads even when the scan PLANS many splits") {
    val rows = (Tables.SpreadRowsPerTask * 3).toInt
    val dir = writeDocs(rows = rows, rowGroupRows = rows)
    val docs = Tables.documents(spark, dir)
    val spread = Tables.documentsSpread(spark, dir)
    // the spread frame plans a round-robin exchange above the scan
    val p = spread.queryExecution.executedPlan.toString
    assert(p.contains("Exchange RoundRobinPartitioning"),
      s"narrow layout must spread:\n$p")
    // width is INPUT-DERIVED (r16 opt): ⌈rows/SpreadRowsPerTask⌉
    // clamped to the core count — never every core for a small corpus
    // (each cold codegen task costs a measured ~0.5-1 cpu-s of JIT
    // warmup; see Tables.SpreadRowsPerTask)
    val par = spark.sparkContext.defaultParallelism
    val want = math.min(par.toLong,
      (rows + Tables.SpreadRowsPerTask - 1) / Tables.SpreadRowsPerTask).toInt
    val counts = spread.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(counts.count(_ > 0) === want,
      s"spread must fill exactly $want partitions: ${counts.toSeq}")
    assert(spread.count() === docs.count())
  }

  test("sub-3-task row counts never spread (exchange not worth a 2-way split)") {
    val rows = (Tables.SpreadRowsPerTask * 2).toInt // width 2 < 3
    val dir = writeDocs(rows = rows, rowGroupRows = rows)
    val spread = Tables.documentsSpread(spark, dir)
    val p = spread.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"a width-2 spread must be skipped:\n$p")
  }

  test("spread width scales with row count and clamps at the core count") {
    val par = spark.sparkContext.defaultParallelism
    // enough rows that ⌈rows/SpreadRowsPerTask⌉ exceeds the core count
    val rows = (Tables.SpreadRowsPerTask * (par + 2)).toInt
    val dir = writeDocs(rows = rows, rowGroupRows = rows)
    val spread = Tables.documentsSpread(spark, dir)
    val counts = spread.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(counts.count(_ > 0) === par,
      s"large narrow corpus must fill all $par cores: ${counts.toSeq}")
  }

  test("wide layout (row groups >= cores/2) is identity — no corpus shuffle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_w").toString
    val df = (0 until 400).map(i => (i.toLong, s"t $i", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    // many part files = many row groups (>= 2 = max(2, 4/2) under the
    // 4-core test session)
    df.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    assert(Tables.rowGroups(spark, s"$dir/documents.parquet") >= 8)
    val spread = Tables.documentsSpread(spark, dir)
    val p = spread.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"wide layout must never pay a spread shuffle:\n$p")
  }

  test("file-count cap short-circuits: many files never probe footers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_cap").toString
    // 10 rows per partition: an EMPTY partition writes no part file,
    // so over-provision rows to guarantee > RowGroupFileCap files
    val df = (0 until (Tables.RowGroupFileCap + 8) * 10)
      .map(i => (i.toLong, s"t $i")).toDF("doc_id", "text")
    df.repartition(Tables.RowGroupFileCap + 8)
      .write.mode("overwrite").parquet(s"$dir/many.parquet")
    assert(Tables.rowGroups(spark, s"$dir/many.parquet") === Int.MaxValue)
  }
}
