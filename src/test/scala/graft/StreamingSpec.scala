package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.{Ev, SessionOut}

/** Streaming suite (SURVEY §2.3 #23): drive the streaming plans with a
  * MemoryStream and check they reproduce batch semantics.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowed agg over a memory stream matches batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      mem.addData(
        Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(5), 1, "click", 2.0),
        Ev(3, ts(61), 2, "view", 3.0), Ev(4, ts(62), 1, "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("win_out")
      val clicks0 = out.filter(col("event_type") === "click" && col("n") === 2).count()
      assert(clicks0 >= 1)   // first hour window has the 2 early clicks
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 60-min gap event
      mem.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(5), 1, "a", 2.0),
        Ev(3, ts(65), 1, "a", 4.0))
      q.processAllAvailable()
      // push the watermark far forward so the open session times out
      mem.addData(Ev(9, ts(10000), 99, "z", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(10, ts(20000), 98, "z", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[SessionOut].collect()
      val u1 = out.filter((x: SessionOut) => x.user_id == 1).sortBy(_.session_start.getTime)
      assert(u1.length === 2)
      assert(u1(0).n_events === 2 && u1(0).value_sum === 3.0)
      assert(u1(1).n_events === 1 && u1(1).value_sum === 4.0)
    } finally q.stop()
  }

  test("file-source streaming reader processes the events table incrementally") {
    val batch = EventStreams.readEventStream(spark, SparkTestSession.Sf)
    assert(batch.isStreaming)
    val q = batch.groupBy("event_type").count()
      .writeStream.format("memory").queryName("file_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_out").agg(sum("count")).head().getLong(0)
      assert(n === Tables.events(spark, SparkTestSession.Sf).count())
    } finally q.stop()
  }
}

class StreamingAsOfSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def ts(min: Long): java.sql.Timestamp = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("streaming as-of enrichment attaches the latest preceding error per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = graft.streaming.EventStreams.asOfEnrich(mem.toDS())
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      // batch 1: error then purchase for u1; purchase with no error for u2
      mem.addData(
        Ev(1, ts(0), 1, "error", 0.0), Ev(2, ts(5), 1, "purchase", 1.0),
        Ev(3, ts(5), 2, "purchase", 1.0))
      q.processAllAvailable()
      // batch 2: newer error then purchase for u1 (state carries across batches)
      mem.addData(Ev(4, ts(10), 1, "error", 0.0), Ev(5, ts(15), 1, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("asof_out").as[graft.streaming.AsOfEnriched]
        .collect().sortBy(_.purchase_id)
      assert(out.map(o => (o.purchase_id, o.error_id)).toSeq ===
        Seq((2L, Some(1L)), (3L, None), (5L, Some(4L))))
    } finally q.stop()
  }

  test("idle-retention evicts stale as-of state past the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    // retention 5 min, watermark delay 10 min: u1's state (last event t0)
    // times out once the watermark passes t0+5min
    val q = graft.streaming.EventStreams.asOfEnrich(mem.toDS(),
        idleRetentionMs = Some(5L * 60000L))
      .writeStream.format("memory").queryName("asof_evict").outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(0), 1, "error", 0.0), Ev(2, ts(1), 1, "purchase", 1.0))
      q.processAllAvailable()
      // u2 traffic advances the watermark to t0+50min (> u1's t0+5min timeout)...
      mem.addData(Ev(3, ts(60), 2, "error", 0.0))
      q.processAllAvailable()
      // ...and the next batch fires the timeout, evicting u1's state
      mem.addData(Ev(4, ts(61), 2, "error", 0.0))
      q.processAllAvailable()
      // a late u1 purchase now finds nothing (explicit eviction-horizon trade)
      mem.addData(Ev(5, ts(62), 1, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("asof_evict").as[graft.streaming.AsOfEnriched]
        .collect().sortBy(_.purchase_id)
      assert(out.map(o => (o.purchase_id, o.error_id)).toSeq ===
        Seq((2L, Some(1L)), (5L, None)))
    } finally q.stop()
  }
}

class StreamingDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming minhash dedup finds the pairs the batch operator finds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // batch reference on the real corpus
    val batchPairs = operators.Dedup.minhashLsh(spark, SparkTestSession.Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty)
    // stream the same corpus in two halves
    val docs = Tables.documents(spark, SparkTestSession.Sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = docs.splitAt(docs.length / 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.nearDupPairs(
        graft.streaming.StreamingDedup.banded(mem.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("sdedup_out").outputMode("append").start()
    try {
      mem.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      val streamPairs = spark.table("sdedup_out")
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
      // with the bounded bucket window the stream may miss pairs whose
      // members were evicted, but on this corpus buckets are small:
      // expect full agreement
      assert(streamPairs === batchPairs,
        s"missing=${batchPairs -- streamPairs} extra=${streamPairs -- batchPairs}")
    } finally q.stop()
  }

  test("stream-stream interval join reproduces the batch error-context pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = EventStreams.errorContextJoin(mem.toDF())
      .writeStream.format("memory").queryName("ij_stream").outputMode("append").start()
    try {
      // collect exact micros alongside the rows (Timestamp.getTime is
      // millis-truncated -- boundary pairs need full precision)
      val rows = Tables.events(spark, SparkTestSession.Sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getLong(5)))
        .sortBy(_._6)
      val evs = rows.map(r => Ev(r._1, r._2, r._3, r._4, r._5))
      val (h1, h2) = evs.splitAt(evs.length / 2)
      mem.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      // batch reference: the exploded pair set behind q_interval_join
      val W = graft.operators.ExtendedAnalytics.IntervalUs
      val expected = (for {
        e <- rows if e._4 == "error"
        p <- rows
        if p._3 == e._3 && p._6 >= e._6 - W && p._6 < e._6
      } yield (e._1, e._3, p._2, p._5)).toSet
      val got = spark.table("ij_stream")
        .as[(Long, Long, Timestamp, Double)].collect().toSet
      assert(got === expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    } finally q.stop()
  }

  test("gopher quality gate applies unchanged to a streaming documents source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the gate is map-only column arithmetic, so the SAME code path
    // gates a stream with no state — the corpus-ingest shape
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = operators.TextAnalysis.gopherColumns(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_stream").outputMode("append").start()
    try {
      val docs = Tables.documents(spark, SparkTestSession.Sf)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("gopher_stream").orderBy("doc_id").collect()
      val batch = operators.TextAnalysis.gopherFilter(spark, SparkTestSession.Sf).collect()
      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("quality-sample gate applies unchanged to a streaming documents source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic hash gate, no RNG and no state: identical keep set
    // on a stream regardless of batch boundaries
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = operators.TextAnalysis.qualitySampleColumns(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qsample_stream").outputMode("append").start()
    try {
      val docs = Tables.documents(spark, SparkTestSession.Sf)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      val (h1, h2) = docs.splitAt(docs.length / 3)
      mem.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("qsample_stream").orderBy("doc_id").collect()
      val batch = operators.TextAnalysis.qualitySample(spark, SparkTestSession.Sf).collect()
      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming CMS heavy hitters keep stream-wide bounds across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val hh = new graft.streaming.StreamingHeavyHitters(k = 5, m = 64)
    val q = mem.toDF().writeStream.foreachBatch(hh.sink _).start()
    try {
      val b1 = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++ (0 until 40).map(i => s"n$i")
      val b2 = Seq.fill(45)("gamma") ++ Seq.fill(25)("alpha") ++ (0 until 40).map(i => s"m$i")
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val all = b1 ++ b2
      assert(hh.totalTokens === all.size.toLong)
      val exact = all.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val top = hh.current()
      // the true heavies span both batches: alpha 75 (cross-batch sum),
      // gamma 45, beta 30 — the merged state must rank them first
      assert(top.take(3).map(_._1) === Seq("alpha", "gamma", "beta"),
        s"got $top")
      val slack = (graft.operators.Sketches.CmsEps * all.size).ceil.toLong
      top.foreach { case (t, est) =>
        assert(est >= exact(t), s"$t undercounted: $est < ${exact(t)}")
        assert(est <= exact(t) + slack, s"$t over eps bound: $est")
      }
      // linearity, bit-exact: the stream-merged portable sketch equals
      // a single build over the concatenated input (cell-wise identity
      // checked through every distinct token's estimate)
      val S = graft.operators.Sketches
      val expCells = Array.ofDim[Long](S.CmsDepth, S.CmsWidth)
      all.foreach(t => S.localBuckets(t).zipWithIndex.foreach {
        case (b, i) => expCells(i)(b.toInt) += 1L })
      exact.keys.foreach { t =>
        val want = S.localBuckets(t).zipWithIndex
          .map { case (b, i) => expCells(i)(b.toInt) }.min
        assert(hh.estimateCount(t) === want,
          s"stream-merged sketch must equal the concatenated build for $t")
      }
    } finally q.stop()
  }
}

/** Streaming funnel twin: per-stage reach counts over the stream output
  * must equal the batch N-stage funnel on the same planted data —
  * including a cross-batch conversion (a user whose later stages
  * arrive in a second micro-batch).
  */
class StreamingFunnelSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("streaming funnel reaches reproduce the batch stage counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("s1", "s2", "s3", "s4", "s5")
    def ev(id: Long, u: Long, et: String, sec: Long) = graft.streaming.Ev(id, ts(sec), u, et, 0.0)
    // same shapes as FunnelSpec: full conversion, out-of-order stop,
    // mid-funnel entry, no-s5, skip-then-backfill — user 1's s4/s5 and
    // all of user 4 arrive in the SECOND batch (cross-batch state)
    val batch1 = Seq(
      ev(1, 1, "s1", 1), ev(2, 1, "s2", 2), ev(3, 1, "s3", 3),
      ev(6, 2, "s1", 1), ev(7, 2, "s3", 2), ev(8, 2, "s2", 3), ev(9, 2, "s4", 4),
      ev(10, 3, "s2", 1), ev(11, 3, "s3", 2),
      ev(15, 5, "s1", 1), ev(16, 5, "s3", 2), ev(17, 5, "s2", 3), ev(18, 5, "s5", 4))
    val batch2 = Seq(
      ev(4, 1, "s4", 10), ev(5, 1, "s5", 11),
      ev(12, 4, "s1", 10), ev(13, 4, "s2", 11), ev(19, 4, "s2", 12),
      ev(14, 4, "s3", 13), ev(20, 4, "s4", 14))
    val mem = MemoryStream[Ev]
    val q = EventStreams.funnelReaches(mem.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamCounts = spark.table("funnel_out")
        .groupBy("stage_no").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batchDf = (batch1 ++ batch2).toDS()
        .select(col("user_id"), col("event_type"), col("ts"))
      val batchCounts = graft.operators.ExtendedAnalytics.funnelStaged(batchDf, stages)
        .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
      assert(batchCounts === Map(1 -> 4L, 2 -> 4L, 3 -> 2L, 4 -> 2L, 5 -> 1L))
      assert(streamCounts === batchCounts,
        s"stream $streamCounts != batch $batchCounts")
      // a reach row fires at the qualifying event's own time
      val u1 = spark.table("funnel_out").filter(col("user_id") === 1)
        .orderBy("stage_no").collect().map(_.getTimestamp(2).getTime)
      assert(u1.toSeq === Seq(ts(1), ts(2), ts(3), ts(10), ts(11)).map(_.getTime))
    } finally q.stop()
  }
}

/** Streaming retention twin: (cohort, offset) counts over the stream's
  * first-activity-per-week rows must equal the batch retention matrix
  * on the same data, including users whose later weeks arrive in a
  * second micro-batch and duplicate activity within a week.
  */
class StreamingRetentionSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  // Monday 2023-11-20 00:00 UTC + offset days
  private def ts(day: Long, hr: Long = 0) =
    new java.sql.Timestamp(1700438400000L + day * 86400000L + hr * 3600000L)

  test("streaming retention reaches reproduce the batch cohort matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, u: Long, day: Long, hr: Long = 0) =
      graft.streaming.Ev(id, ts(day, hr), u, "view", 0.0)
    // users 1,2 start week 0; user 3 starts week 1. user 1 active in
    // weeks 0,1,2 (twice in week 1); user 2 only week 0; user 3 weeks 1,3
    val batch1 = Seq(
      ev(1, 1, 0), ev(2, 1, 1),          // u1 week 0 (dup within week)
      ev(3, 2, 2),                        // u2 week 0
      ev(4, 3, 7))                        // u3 week 1
    val batch2 = Seq(
      ev(5, 1, 8), ev(6, 1, 9, 5),        // u1 week 1 (dup)
      ev(7, 1, 15),                       // u1 week 2
      ev(8, 3, 22))                       // u3 week 3 (skips week 2)
    val mem = MemoryStream[Ev]
    val q = EventStreams.retentionReaches(mem.toDS())
      .writeStream.format("memory").queryName("reten_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("reten_out")
        .groupBy("cohort_week", "week_offset").count()
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === Map(
        ("2023-11-20", 0) -> 2L,   // u1, u2
        ("2023-11-20", 1) -> 1L,   // u1
        ("2023-11-20", 2) -> 1L,   // u1
        ("2023-11-27", 0) -> 1L,   // u3
        ("2023-11-27", 2) -> 1L),  // u3 (week 3 = offset 2 from its cohort)
        s"got $got")
      // and the batch operator agrees on identical data written as a table
      val dir = java.nio.file.Files.createTempDirectory("graft_reten").toString
      // shipped events.parquet stores ts as TIMESTAMP(NANOS)-as-long —
      // Tables.events divides by 1000 and reinterprets as micros
      (batch1 ++ batch2).toDS()
        .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.operators.ExtendedAnalytics.retention(spark, dir)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(batch === got, s"stream $got != batch $batch")
    } finally q.stop()
  }
}
