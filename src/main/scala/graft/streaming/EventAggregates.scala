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
  final case class SessionState(n: Long, first: Long, last: Long, sum: Double)

  /** Custom per-user session state via mapGroupsWithState with
    * EVENT-TIME timeouts: a session closes once the stream's watermark
    * passes `last event + gapMs` and is emitted exactly once with its
    * event count / span / value sum. Event-time (not processing-time)
    * semantics make sessions deterministic under replay — the property a
    * training-data pipeline needs. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long,
                 watermark: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, s.n, new Timestamp(s.first), new Timestamp(s.last), s.sum)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, 0L, 0.0))
            val agg = rows.foldLeft(prev) { (s, e) =>
              SessionState(s.n + 1, math.min(s.first, e.ts.getTime),
                math.max(s.last, e.ts.getTime), s.sum + e.value)
            }
            state.update(agg)
            state.setTimeoutTimestamp(agg.last + gapMs)
            // not emitted until the session closes — placeholder row with
            // n_events = 0 is filtered by the caller
            Session(userId, 0L, new Timestamp(agg.first), new Timestamp(agg.last), agg.sum)
          }
      }.filter(_.n_events > 0)
  }
}
