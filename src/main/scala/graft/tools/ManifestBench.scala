package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** Manifest-layer microbench (SURVEY §5): builds a snapshot dataset
  * with N part files, then measures what a ONE-FILE append costs in
  * manifest bytes and wall time, and what resolving the latest
  * manifest costs — the delta-manifest economics (a full manifest
  * re-serializes every path + stats line per commit; a delta writes
  * O(changed)). Run:
  *   sbt "runMain graft.tools.ManifestBench /tmp/mb 10000 24"
  * Prints one JSON line.
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val root = if (args.length > 0) args(0)
      else java.nio.file.Files.createTempDirectory("graft_mb").toString
    val nFiles = if (args.length > 1) args(1).toInt else 10000
    val nAppends = if (args.length > 2) args(2).toInt else 24
    val s = SparkSession.builder()
      .appName("graft-manifest-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_mb_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def manifestBytes(v: Int): Long =
      new java.io.File(s"$root/manifests/v$v.txt").length()
    val t0 = System.nanoTime()
    Snapshots.create(s, root,
      s.range(0L, nFiles.toLong * 4)
        .select(col("id").as("doc_id"), (col("id") % 17).cast("string").as("src"))
        .repartition(nFiles))
    val createMs = (System.nanoTime() - t0) / 1e6
    val fullBytes = manifestBytes(1)
    import s.implicits._
    val appendStats = (1 to nAppends).map { i =>
      val a0 = System.nanoTime()
      Snapshots.append(s, root,
        Seq((1000000L + i, s"a$i")).toDF("doc_id", "src").coalesce(1))
      val ms = (System.nanoTime() - a0) / 1e6
      (manifestBytes(i + 1), ms)
    }
    // delta commits only (checkpoint versions re-serialize in full by
    // design — report them separately)
    val latest = Snapshots.latestVersion(s, root)
    val deltas = (2 to latest).filterNot(_ % Snapshots.CheckpointEvery == 0)
      .map(v => manifestBytes(v))
    val r0 = System.nanoTime()
    val resolved = Snapshots.readManifest(s, root, latest)
    val readMs = (System.nanoTime() - r0) / 1e6
    println(
      s"""{"metric":"manifest_bench","n_files":$nFiles,""" +
      s""""full_manifest_bytes":$fullBytes,""" +
      s""""median_delta_commit_bytes":${deltas.sorted.apply(deltas.size / 2)},""" +
      s""""max_delta_commit_bytes":${deltas.max},""" +
      s""""median_append_ms":${appendStats.map(_._2).sorted.apply(appendStats.size / 2).round},""" +
      s""""create_ms":${createMs.round},""" +
      s""""resolve_latest_ms":${readMs.round},""" +
      s""""resolved_files":${resolved.length},""" +
      s""""checkpoint_every":${Snapshots.CheckpointEvery}}""")
    s.stop()
  }
}
