package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming aggregates over an event stream (the `events`
  * table shape: event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no true streaming (SURVEY.md §2.10) — these are the
  * engine's stream-processing verbs for the training-data-pipeline side:
  * event-time tumbling windows with a watermark-bounded late-data policy,
  * and custom sessionization state via mapGroupsWithState. Both shapes
  * run identically over `readStream` sources at any scale (state is
  * partitioned by group key; the watermark bounds state size).
  */
object EventAggregates {

  /** Tumbling event-time window counts + value sums per event_type.
    * `watermark` bounds how late an event may arrive and still update its
    * window; in append mode a window only emits once finalized. */
  def windowedCounts(events: DataFrame, window_ : String = "1 minute",
                     watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, first_ts: Timestamp,
                           last_ts: Timestamp, total_value: Double)
  final case class EventLite(ts: Long, value: Double)
  final case class SessionBuf(events: Seq[EventLite])

  /** Custom per-user session state via flatMapGroupsWithState with
    * EVENT-TIME timeouts. Sessions split on the inactivity gap BY EVENT
    * TIME regardless of micro-batch boundaries, and are emitted ONLY once
    * the watermark passes `last + gapMs` — before that, a late event
    * (admitted by the watermark) may still land inside or adjacent to a
    * session and merge it, so eager emission would be wrong (an
    * out-of-order second batch used to mis-merge across a real gap).
    * State therefore buffers the raw (ts, value) of every not-yet-final
    * session; each invocation re-sorts state + new events by event time
    * and re-walks the gaps. Same input ⇒ same final sessions under any
    * batching/arrival order — deterministic under replay, the property a
    * training-data pipeline needs. State is bounded by the watermark
    * delay × per-key event rate (everything older finalizes out). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long,
                 watermark: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    def toSession(userId: Long, es: Seq[EventLite]): Session =
      Session(userId, es.size.toLong, new Timestamp(es.head.ts),
        new Timestamp(es.last.ts), es.map(_.value).sum)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.events).getOrElse(Seq.empty)
          val incoming =
            rows.map(e => EventLite(e.ts.getTime, e.value)).toVector
          // event-time order; value tie-break so the double sum's fold
          // order (and thus the emitted total) is batching-independent
          val all = (prior ++ incoming).sortBy(e => (e.ts, e.value))
          // gap walk over the time-sorted buffer → current session split
          val sessions = Vector.newBuilder[Vector[EventLite]]
          var cur = Vector.newBuilder[EventLite]
          var last = Long.MinValue
          all.foreach { e =>
            if (last != Long.MinValue && e.ts - last > gapMs) {
              sessions += cur.result()
              cur = Vector.newBuilder[EventLite]
            }
            cur += e
            last = e.ts
          }
          val tail = cur.result()
          if (tail.nonEmpty) sessions += tail
          // final ⟺ no admissible future event (ts ≥ wm) can merge:
          // merge needs ts ≤ last + gap, so final when last + gap < wm
          val (emit, keep) =
            sessions.result().partition(s => s.last.ts + gapMs < wm)
          if (keep.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuf(keep.flatten))
            // wake when the earliest kept session becomes final (must be
            // strictly above the current watermark per the state API)
            state.setTimeoutTimestamp(
              math.max(keep.head.last.ts + gapMs, wm + 1))
          }
          emit.iterator.map(toSession(userId, _))
      }
  }
}
