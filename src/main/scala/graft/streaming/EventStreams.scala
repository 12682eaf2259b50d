package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.3 #23).
  *
  * Streaming twins of the batch event queries: the same semantics
  * expressed as incremental plans — watermarked tumbling windows for the
  * per-type aggregation, and `flatMapGroupsWithState` for gap-based
  * sessionization (state is bounded: one open session per key, closed by
  * event-time timeout — the property that matters on an unbounded
  * 100 TB/day stream).
  *
  * Reference provenance: the reference's pipeline is batch (fetch →
  * analyze), but its incremental cache (fetch_pages.py:567-577 skips
  * unchanged pages) is the seed of a streaming ingest; here it grows into
  * real continuous processing.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)
case class SessionOut(user_id: Long, session_start: Timestamp,
                      n_events: Long, value_sum: Double)
case class SessionState(start: Long, last: Long, n: Long, total: Double)
case class AsOfEnriched(user_id: Long, purchase_id: Long, purchase_ts: Timestamp,
                        error_id: Option[Long], error_ts: Option[Timestamp])
case class LatestRight(id: Long, ts: Long)
case class FunnelReach(user_id: Long, stage_no: Int, at: Timestamp)
case class FunnelState(times: Seq[Long])
case class RetainReach(cohort_week: String, week_offset: Int, user_id: Long)
case class RetentionState(cohort: Long, seen: Seq[Long])

object EventStreams {

  val GapMs: Long = 30 * 60 * 1000L

  /** Watermarked tumbling-window per-type aggregation (streaming twin of
    * TaskAnalytics.eventWindowAgg).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("value_sum"))

  /** Streaming twin of the bucketized interval join
    * (operators.ExtendedAnalytics.errorContext): stream-stream join of
    * errors against the event stream with an EVENT-TIME RANGE condition
    * — Spark's state store keeps only rows inside the watermark + range
    * horizon on each side (the range bound is what makes the join state
    * bounded on an unbounded stream; without it, stream-stream join
    * state grows forever). Emits one row per (error, prior-event) pair;
    * the per-error aggregation composes downstream the same way the
    * batch twin's groupBy does.
    */
  def errorContextJoin(events: DataFrame): DataFrame = {
    val windowUs = graft.operators.ExtendedAnalytics.IntervalUs
    val errs = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "10 minutes")
    val prior = events
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    errs.join(prior,
      col("err_user") === col("p_user") &&
        col("p_ts") >= col("err_ts") - expr(s"INTERVAL ${windowUs / 1000000L} SECONDS") &&
        col("p_ts") < col("err_ts"))
      .select(col("err_id"), col("err_user").as("user_id"), col("p_ts"), col("value"))
  }

  /** Gap-based sessionization with bounded per-key state. Sessions close
    * when a new event arrives more than `GapMs` after the last one, or
    * when the event-time watermark passes the open session's
    * last-event + gap (timeout).
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, new Timestamp(s.start), s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last <= GapMs =>
                  open = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, new Timestamp(s.start), s.n, s.total)
                  open = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming funnel (twin of ExtendedAnalytics.funnelStaged): emits a
    * `FunnelReach(user, stage_no)` row the moment a user's first
    * qualifying event for their NEXT stage arrives — continuous
    * conversion tracking. State per user is the frontier vector (first
    * qualifying time per reached stage, ≤ `stages.length` longs —
    * bounded regardless of stream length), and the frontier algorithm
    * over time-ordered events computes exactly the batch chained-window
    * minimums: the first stage-k event after t(k-1) IS the minimum, and
    * once set it can never improve, so Append output is monotone-safe.
    * Per-stage user counts over the output equal the batch funnel on
    * the same data (StreamingSpec). Cross-batch ordering relies on the
    * upstream watermark discipline, same contract as `asOfEnrich`.
    */
  def funnelReaches(events: Dataset[Ev], stages: Seq[String]): Dataset[FunnelReach] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelReach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var times = state.getOption.map(_.times).getOrElse(Seq.empty)
          val out = Seq.newBuilder[FunnelReach]
          sorted.foreach { e =>
            val i = times.length
            if (i < stages.length && e.event_type == stages(i) &&
                (i == 0 || e.ts.getTime > times(i - 1))) {
              times = times :+ e.ts.getTime
              out += FunnelReach(uid, i + 1, e.ts)
            }
          }
          if (times.nonEmpty) state.update(FunnelState(times))
          out.result().iterator
      }
  }

  /** Streaming cohort retention (twin of ExtendedAnalytics.retention):
    * emits ONE `(cohort_week, week_offset, user)` row the first time a
    * user is active in each calendar week — counting those rows per
    * (cohort, offset) downstream IS the retention matrix, continuously.
    * State per user = cohort week + distinct active weeks (longs,
    * bounded by the stream's CALENDAR span — 52/user/year — not by
    * event volume). The cohort is the first week seen under the
    * watermark ordering contract (same as `asOfEnrich`/`funnelReaches`);
    * each batch's events are processed in event-time order, so
    * within-batch disorder cannot mis-assign the cohort. Monday-start
    * weeks in UTC, matching the batch `date_trunc('week')`.
    */
  def retentionReaches(events: Dataset[Ev]): Dataset[RetainReach] = {
    import events.sparkSession.implicits._
    def weekStart(t: Timestamp): Long =
      java.time.Instant.ofEpochMilli(t.getTime).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate
        .`with`(java.time.temporal.TemporalAdjusters.previousOrSame(
          java.time.DayOfWeek.MONDAY)).toEpochDay
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetainReach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[RetentionState]) =>
          val weeks = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map(e => weekStart(e.ts))
          var st = state.getOption.getOrElse(RetentionState(weeks.head, Seq.empty))
          val out = Seq.newBuilder[RetainReach]
          weeks.foreach { w =>
            if (!st.seen.contains(w)) {
              st = st.copy(seen = st.seen :+ w)
              out += RetainReach(
                java.time.LocalDate.ofEpochDay(st.cohort).toString,
                ((w - st.cohort) / 7).toInt, uid)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming as-of enrichment (streaming twin of plans.AsOfJoin): for
    * each purchase event, attach the latest error event at-or-before it
    * by the same user. State per key = ONE (id, ts) pair — the latest
    * right-side row seen — so state size is bounded by key cardinality
    * regardless of stream length. Within each micro-batch events are
    * processed in event-time order; cross-batch ordering relies on the
    * upstream watermark discipline (same contract as any stream-stream
    * join's left-greater-than-right assumption).
    *
    * `idleRetentionMs` bounds state by TIME as well as key cardinality:
    * a key whose last event is more than the retention behind the
    * watermark is evicted (event-time timeout), so at 100 TB/unbounded
    * key churn the state store holds only recently-active keys. The
    * trade-off is explicit: a purchase arriving after its key was
    * evicted sees no match — exactly the eviction-horizon semantics the
    * streaming MinHash dedup documents. Default None keeps the
    * exact-forever state (bit-identical to the batch as-of join on any
    * replayed stream).
    */
  def asOfEnrich(events: Dataset[Ev],
                 idleRetentionMs: Option[Long] = None): Dataset[AsOfEnriched] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleRetentionMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .filter((e: Ev) => e.event_type == "purchase" || e.event_type == "error")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestRight, AsOfEnriched](
        OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LatestRight]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[AsOfEnriched]
            var latest = state.getOption
            var maxTs = Long.MinValue
            sorted.foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              if (e.event_type == "error") {
                if (latest.forall(_.ts <= e.ts.getTime))
                  latest = Some(LatestRight(e.event_id, e.ts.getTime))
              } else {
                val m = latest.filter(_.ts <= e.ts.getTime)
                out += AsOfEnriched(uid, e.event_id, e.ts,
                  m.map(_.id), m.map(r => new Timestamp(r.ts)))
              }
            }
            latest.foreach(state.update)
            idleRetentionMs.foreach { r =>
              if (state.exists && maxTs != Long.MinValue)
                state.setTimeoutTimestamp(maxTs + r)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop replayed event_ids within the watermark
    * horizon (state is bounded by the watermark — the at-least-once →
    * effectively-once repair step of a streaming ingest; batch twin is
    * TaskAnalytics.dedupKeepLast).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** File-source streaming reader over an events parquet directory —
    * the production ingest shape (`readStream` with explicit schema; a
    * directory of parquet drops in, each becomes a micro-batch).
    *
    * `readStream` requires a declared schema, and `ts` has shipped as
    * both ns-as-long and TIMESTAMP(MICROS) across testdata generations
    * (see Tables.events) — probe the existing file's footer once with a
    * cheap batch read to declare the matching type, then normalize so
    * downstream watermarks always see a session-zone TimestampType.
    */
  def readEventStream(s: SparkSession, dir: String): DataFrame = {
    val tsIsLong = s.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val tsDecl = if (tsIsLong) "BIGINT" else "TIMESTAMP_NTZ"
    val schema = s"event_id BIGINT, ts $tsDecl, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsIsLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }
}
