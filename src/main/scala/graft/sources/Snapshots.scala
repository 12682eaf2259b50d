package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Manifest-versioned dataset with time-travel reads — the minimal
  * lakehouse snapshot contract a training pipeline needs: a run that
  * starts on version N must keep reading EXACTLY version N's rows
  * while ingest appends behind it (epoch pinning), and a curation
  * action (dedup drop, quality re-filter) lands as a NEW version so
  * in-flight consumers are never mutated underneath.
  *
  * Layout under the dataset root:
  *   data/        append-only parquet part files (never rewritten,
  *                never deleted by version operations)
  *   manifests/v{N}.txt   one file path per line — version N IS its
  *                file list; commits are one manifest write, readers
  *                never list data/ (at 10⁶ files a directory listing
  *                is the scale bottleneck; the manifest read is O(files
  *                in version))
  *
  * This deliberately reproduces the core of Delta/Iceberg snapshot
  * isolation with none of the machinery: versions are immutable,
  * appends create v+1 = v ∪ newFiles, a REWRITE (compaction, dedup)
  * creates v+1 from fresh files while v's files remain readable.
  * Readers pin a version number; `read(s, root, v)` plans a scan over
  * exactly that manifest's files.
  */
object Snapshots {

  private def fs(s: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int) =
    new org.apache.hadoop.fs.Path(s"$root/manifests/v$v.txt")

  private def listNewFiles(s: SparkSession, dataDir: String,
                           known: Set[String]): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(dataDir)
    fs(s).listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString)
      .filterNot(known)
      .sorted
  }

  /** A racing commit already claimed this version number: the caller
    * lost the optimistic-concurrency race and should re-read the
    * latest version and retry its commit on top of it.
    */
  final class ConcurrentCommitException(root: String, v: Int)
    extends RuntimeException(
      s"version $v at $root was committed concurrently; re-read latest and retry")

  private def writeManifest(s: SparkSession, root: String, v: Int,
                            files: Seq[String]): Unit = {
    val f = fs(s)
    val p = manifestPath(root, v)
    // Two-phase commit: write the FULL content to a dot-temp (invisible
    // to readers and latestVersion), then rename into place. A crash
    // mid-write leaves only an ignorable temp — never a truncated
    // v{N}.txt, and never a dangling no-overwrite create that blocks
    // the retry. The pre-rename existence check is the optimistic-
    // concurrency gate: exactly one racing committer claims v.
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/manifests/.v$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(files.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(p) || !f.rename(tmp, p)) {
      f.delete(tmp, false)
      throw new ConcurrentCommitException(root, v)
    }
  }

  private def readManifest(s: SparkSession, root: String, v: Int): Seq[String] = {
    val p = manifestPath(root, v)
    require(fs(s).exists(p), s"version $v does not exist under $root")
    val in = fs(s).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Highest committed version, 0 if none. */
  def latestVersion(s: SparkSession, root: String): Int = {
    val d = new org.apache.hadoop.fs.Path(s"$root/manifests")
    if (!fs(s).exists(d)) 0
    else fs(s).listStatus(d).toSeq
      .map(_.getPath.getName).collect { case n if n.startsWith("v") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  /** Commit `df` as version 1 of a new dataset. */
  def create(s: SparkSession, root: String, df: DataFrame): Int = {
    df.write.mode("append").parquet(s"$root/data")
    writeManifest(s, root, 1, listNewFiles(s, s"$root/data", Set.empty))
    1
  }

  /** Append: version v+1 = v's files ∪ the batch's new files. The
    * standing data files are untouched — a reader pinned at v is
    * unaffected (spec-asserted).
    */
  def append(s: SparkSession, root: String, df: DataFrame): Int = {
    val v = latestVersion(s, root)
    val known = readManifest(s, root, v).toSet
    df.write.mode("append").parquet(s"$root/data")
    val nv = v + 1
    writeManifest(s, root, nv, (known ++ listNewFiles(s, s"$root/data", known)).toSeq.sorted)
    nv
  }

  /** Rewrite: commit `df` as v+1 from FRESH files only (compaction or
    * a curation drop) — old versions keep reading their own files.
    */
  def rewrite(s: SparkSession, root: String, df: DataFrame): Int = {
    val v = latestVersion(s, root)
    val known = readManifest(s, root, v).toSet
    df.write.mode("append").parquet(s"$root/data")
    val nv = v + 1
    writeManifest(s, root, nv, listNewFiles(s, s"$root/data", known))
    nv
  }

  /** Time-travel read: a scan over exactly version v's files. */
  def read(s: SparkSession, root: String, v: Int): DataFrame =
    s.read.parquet(readManifest(s, root, v): _*)

  // ---- catalog entry ------------------------------------------------------

  def snapRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_snapshots", dir)

  /** `q_snapshot_read`: per-source token totals over a PINNED version
    * while a later append exists — the artifact holds v1 = the
    * doc_id%3≠2 slice and v2 = the full corpus; the query reads v1 and
    * must see EXACTLY the slice (the DuckDB oracle recomputes it from
    * the same predicate), proving time travel through the driver's
    * hash gate. `inputFiles` stays within the manifest's file set.
    */
  def snapshotRead(s: SparkSession, dir: String): DataFrame = {
    val root = snapRoot(s, dir)
    FixtureCleanup.onExit(root)
    if (!ScopedFixture.isComplete(root)) {
      val docs = Tables.documents(s, dir)
      create(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 2))
      append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 2))
      ScopedFixture.markComplete(root)
    }
    read(s, root, 1)
      .select(col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .orderBy("source")
  }

  val snapshotReadOracleSql: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_tokens
      |FROM documents WHERE doc_id % 3 <> 2
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
