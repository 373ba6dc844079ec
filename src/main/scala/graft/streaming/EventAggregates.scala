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

  /** Custom per-user session state via flatMapGroupsWithState with
    * EVENT-TIME timeouts. Sessions split on the inactivity gap BY EVENT
    * TIME regardless of micro-batch boundaries: within a batch, a
    * time-sorted walk closes a session the moment the next event is more
    * than `gapMs` later (emitting it immediately); the still-open tail
    * session closes when the watermark passes `last + gapMs`. Same input
    * ⇒ same sessions under any batching — deterministic under replay,
    * the property a training-data pipeline needs. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long,
                 watermark: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    def closed(userId: Long, s: SessionState): Session =
      Session(userId, s.n, new Timestamp(s.first), new Timestamp(s.last), s.sum)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(closed(userId, s))
          } else {
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            val out = Vector.newBuilder[Session]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(1L, t, t, e.value)
              else if (t - cur.last > gapMs) { // gap exceeded → split here
                out += closed(userId, cur)
                cur = SessionState(1L, t, t, e.value)
              } else {
                cur = SessionState(cur.n + 1, math.min(cur.first, t),
                  math.max(cur.last, t), cur.sum + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.last + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
