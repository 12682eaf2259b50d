package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart (exactly-once resume) for the streaming suite:
  * a watermarked windowed aggregation is stopped mid-stream and a NEW
  * query incarnation resumes from the same checkpoint + sink. The spec
  * pins the three production restart properties:
  *
  *   1. no duplicates — windows emitted before the stop are not
  *      re-emitted by the resumed query;
  *   2. no loss — windows from files that arrive after the restart are
  *      emitted by the resumed query;
  *   3. state continuity — a window whose EVENTS arrived before the
  *      stop but whose watermark-close happens after the restart is
  *      emitted exactly once by the resumed query: its in-flight state
  *      crossed the restart through the checkpoint (the source file was
  *      already committed, so a state-losing restart could never
  *      recover it from data).
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Base = 1700000000000L // fixed epoch; minutes offset from here
  private def ts(min: Long) = new java.sql.Timestamp(Base + min * 60000L)
  private def hourStart(min: Long): java.sql.Timestamp = {
    val ms = Base + min * 60000L
    new java.sql.Timestamp(ms - math.floorMod(ms, 3600000L))
  }

  private def writeSlice(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("windowed agg resumes exactly-once from a checkpoint across query restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val (in, out, ck) = (s"$root/in", s"$root/out", s"$root/ck")

    def startQuery() = {
      val src = spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "*.parquet")
        .parquet(in)
      graft.streaming.EventStreams.windowedAgg(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
    }

    // slice A: two populated hours (minutes 0-70)
    writeSlice(in, Seq(
      (1L, ts(0), 1L, "view", 1.0, ""), (2L, ts(30), 1L, "view", 2.0, ""),
      (3L, ts(70), 2L, "click", 4.0, "")))
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      // closer1 at minute 500: pushes the watermark to 490 so A's two
      // hour-windows finalize and emit; closer1's OWN window stays open
      // — its state must survive the stop
      writeSlice(in, Seq((4L, ts(500), 3L, "ping", 8.0, "")))
      q1.processAllAvailable()
    } finally q1.stop()

    val afterStop = spark.read.parquet(out)
      .select("hour", "event_type", "n", "value_sum").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(afterStop === Set(
      (hourStart(0), "view", 2L, 3.0),
      (hourStart(70), "click", 1L, 4.0)), "pre-stop emission")

    // slice B arrives while no query is running
    writeSlice(in, Seq(
      (5L, ts(600), 4L, "view", 16.0, ""), (6L, ts(660), 4L, "click", 32.0, "")))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      // closer2 at minute 2000 finalizes closer1's window AND slice B's
      writeSlice(in, Seq((7L, ts(2000), 5L, "ping", 64.0, "")))
      q2.processAllAvailable()
    } finally q2.stop()

    val finalRows = spark.read.parquet(out)
      .select("hour", "event_type", "n", "value_sum").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // no duplicates across the restart (parquet sink + checkpoint)
    assert(finalRows.length === finalRows.toSet.size, "duplicate windows after restart")
    assert(finalRows.toSet === Set(
      (hourStart(0), "view", 2L, 3.0),     // pre-restart, not re-emitted
      (hourStart(70), "click", 1L, 4.0),   // pre-restart, not re-emitted
      (hourStart(500), "ping", 1L, 8.0),   // state crossed the restart
      (hourStart(600), "view", 1L, 16.0),  // post-restart data
      (hourStart(660), "click", 1L, 32.0)  // post-restart data
    ), "exactly-once resume: closer2's own window must stay open, everything else emitted once")
  }
}
