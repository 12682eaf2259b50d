package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** State for the transition twin: the user's latest event (by event
  * time, event_id tiebreak). Top-level case class — `flatMapGroups
  * WithState` state classes must not be nested (CLAUDE.md landmine).
  */
case class LastEv(ts: Long, id: Long, tpe: String)

/** Emitted the moment a user's successor event arrives. */
case class TransPair(prev_type: String, next_type: String)

/** Streaming twin of `ExtendedAnalytics.eventTransitions` (#153): the
  * first-order Markov transition matrix maintained live — a bot whose
  * degenerate self-loop floods one matrix cell should alarm within a
  * batch, not at the nightly rollup.
  *
  * Shape: `flatMapGroupsWithState` keyed by user; state is ONE
  * `LastEv` per user (O(users) regardless of stream length — tighter
  * than the sessionize twin, which carries an open aggregate). Each
  * arriving event emits the (prev, next) pair against the stored last
  * event and replaces it; the pair stream then feeds the batch
  * operator's OWN value stage (`transitionRates`), so stream == batch
  * EXACTLY over the same events. Within a batch, events sort by
  * (event time, event_id) — the batch lag-window ordering; ACROSS
  * batches the equality contract is event-time-ordered delivery per
  * user, the same watermark discipline the funnel and as-of twins
  * document (an out-of-order straggler would pair with the wrong
  * predecessor — exactly the row the batch lag would also get wrong
  * if fed the same misordered history).
  */
object StreamingTransitions {

  def transitionPairs(events: Dataset[Ev]): Dataset[TransPair] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, TransPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[LastEv]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[TransPair]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l => out += TransPair(l.tpe, e.event_type))
            last = Some(LastEv(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Batch-equality harness (the StreamingSpec pattern): run the pair
    * extraction over a bounded Dataset and reduce with the batch
    * operator's value stage.
    */
  def ratesOf(pairs: DataFrame): DataFrame =
    graft.operators.ExtendedAnalytics.transitionRates(
      pairs.select("prev_type", "next_type"))
}
