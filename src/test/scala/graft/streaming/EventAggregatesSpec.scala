package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming verbs over the events stream: watermarked
  * event-time windows (append mode emits only finalized windows — the
  * late-data policy) and mapGroupsWithState sessionization. */
class EventAggregatesSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1767225600000L // 2026-01-01T00:00:00Z

  private def ev(id: Long, offsetSec: Long, user: Long, typ: String,
                 value: Double) =
    (id, new Timestamp(T0 + offsetSec * 1000), user, typ, value)

  test("watermarked tumbling windows: append mode emits a window only " +
    "after the watermark passes; late events within the watermark count") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventAggregates.windowedCounts(
        in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        window_ = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,60): two clicks; nothing can finalize yet
      in.addData(ev(1, 5, 1, "click", 1.0), ev(2, 50, 2, "click", 2.0))
      q.processAllAvailable()
      assert(spark.sql("select * from winagg").count() == 0)
      // a LATE event for [0,60) arrives while watermark still allows it
      in.addData(ev(3, 59, 3, "click", 4.0), ev(4, 70, 1, "view", 1.0))
      q.processAllAvailable()
      // advance event time far past watermark → [0,60) and [60,120) final
      in.addData(ev(5, 600, 9, "click", 0.5))
      q.processAllAvailable()
      val rows = spark.sql(
        "select win_start, event_type, n, sum_value from winagg").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows.contains((T0, "click", 3L, 7.0))) // late event counted
      assert(rows.contains((T0 + 60000, "view", 1L, 1.0)))
    } finally q.stop()
  }

  test("event-time sessionization: gap splits by event time; a session " +
    "emits only once the watermark passes last+gap — batching-independent") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[EventAggregates.Event]
    val sessions = EventAggregates.sessionize(spark, in.toDS(),
      gapMs = 5000, watermark = "1 second")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // ONE batch containing a gap > 5s between T0+2s and T0+30s: the
      // split is by event time, but nothing may emit until the watermark
      // proves no admissible late event can still merge the two
      in.addData(
        EventAggregates.Event(1, new Timestamp(T0), 7L, "click", 1.0),
        EventAggregates.Event(2, new Timestamp(T0 + 1000), 7L, "click", 2.5),
        EventAggregates.Event(3, new Timestamp(T0 + 2000), 7L, "buy", 4.0),
        EventAggregates.Event(4, new Timestamp(T0 + 30000), 7L, "view", 9.0))
      q.processAllAvailable()
      in.addData( // advances watermark to ~T0+19s: first session final
        EventAggregates.Event(5, new Timestamp(T0 + 20000), 8L, "click", 0.1))
      q.processAllAvailable()
      in.addData( // extra batch so the event-time timeout executes
        EventAggregates.Event(6, new Timestamp(T0 + 21000), 8L, "click", 0.1))
      q.processAllAvailable()
      val first = spark.sql("select * from sessions where user_id = 7").collect()
      assert(first.length == 1)
      assert(first.head.getAs[Long]("n_events") == 3)
      assert(first.head.getAs[Timestamp]("last_ts").getTime == T0 + 2000)
      assert(first.head.getAs[Double]("total_value") == 7.5)
      // an event far in the future advances the watermark past
      // (T0+30s) + gap → the open tail session times out and emits
      in.addData(EventAggregates.Event(9, new Timestamp(T0 + 120000), 8L, "click", 0.1))
      q.processAllAvailable()
      in.addData(EventAggregates.Event(10, new Timestamp(T0 + 121000), 8L, "click", 0.1))
      q.processAllAvailable() // extra batch lets the timeout batch run
      val s = spark.sql("select * from sessions where user_id = 7 order by first_ts").collect()
      assert(s.length == 2)
      assert(s(1).getAs[Long]("n_events") == 1)
      assert(s(1).getAs[Timestamp]("first_ts").getTime == T0 + 30000)
      assert(s(1).getAs[Double]("total_value") == 9.0)
    } finally q.stop()
  }

  test("sessionization handles out-of-order arrival ACROSS batches: an " +
    "admitted late event earlier than the open session must not merge " +
    "over a real event-time gap") {
    // the round-1 bug: batch1 t=20s then batch2 t=11s with gap=5s,
    // watermark=30s mis-merged into one session [11s,20s]
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[EventAggregates.Event]
    val sessions = EventAggregates.sessionize(spark, in.toDS(),
      gapMs = 5000, watermark = "30 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(EventAggregates.Event(1, new Timestamp(T0 + 20000), 7L, "click", 1.0))
      q.processAllAvailable()
      // late but admitted (watermark is 20s-30s < 11s)
      in.addData(EventAggregates.Event(2, new Timestamp(T0 + 11000), 7L, "click", 2.0))
      q.processAllAvailable()
      // push the watermark far past 20s+gap so both sessions finalize
      in.addData(EventAggregates.Event(3, new Timestamp(T0 + 300000), 8L, "click", 0.1))
      q.processAllAvailable()
      in.addData(EventAggregates.Event(4, new Timestamp(T0 + 301000), 8L, "click", 0.1))
      q.processAllAvailable()
      val s = spark.sql(
        "select * from sessions_ooo where user_id = 7 order by first_ts").collect()
      assert(s.length == 2, s"expected 2 sessions, got ${s.mkString(";")}")
      assert(s(0).getAs[Timestamp]("first_ts").getTime == T0 + 11000)
      assert(s(0).getAs[Long]("n_events") == 1)
      assert(s(1).getAs[Timestamp]("first_ts").getTime == T0 + 20000)
      assert(s(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("sessionization merges an admitted late event INTO a not-yet-final " +
    "session (why eager emission would be wrong)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[EventAggregates.Event]
    val sessions = EventAggregates.sessionize(spark, in.toDS(),
      gapMs = 5000, watermark = "30 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions_merge")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events 8s apart: a gap — unless a bridging event arrives
      in.addData(
        EventAggregates.Event(1, new Timestamp(T0 + 10000), 7L, "click", 1.0),
        EventAggregates.Event(2, new Timestamp(T0 + 18000), 7L, "click", 2.0))
      q.processAllAvailable()
      // the bridge arrives late in its own batch: t=14s joins both
      in.addData(EventAggregates.Event(3, new Timestamp(T0 + 14000), 7L, "click", 4.0))
      q.processAllAvailable()
      in.addData(EventAggregates.Event(4, new Timestamp(T0 + 300000), 8L, "click", 0.1))
      q.processAllAvailable()
      in.addData(EventAggregates.Event(5, new Timestamp(T0 + 301000), 8L, "click", 0.1))
      q.processAllAvailable()
      val s = spark.sql("select * from sessions_merge where user_id = 7").collect()
      assert(s.length == 1)
      assert(s.head.getAs[Long]("n_events") == 3)
      assert(s.head.getAs[Double]("total_value") == 7.0)
      assert(s.head.getAs[Timestamp]("first_ts").getTime == T0 + 10000)
      assert(s.head.getAs[Timestamp]("last_ts").getTime == T0 + 18000)
    } finally q.stop()
  }

  test("sessionization over a FILE-SOURCE stream: the production path — " +
    "fully distributed ingest (readStream.parquet), no driver-side feed " +
    "at any point — emits the same sessions as the MemoryStream harness") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evsrc-").toString
    val sink = "sessions_filesrc"
    // first file: two users, a >5s gap inside user 7's events
    Seq(
      EventAggregates.Event(1, new Timestamp(T0), 7L, "click", 1.0),
      EventAggregates.Event(2, new Timestamp(T0 + 1500), 7L, "buy", 2.0),
      EventAggregates.Event(3, new Timestamp(T0 + 30000), 7L, "view", 9.0),
      EventAggregates.Event(4, new Timestamp(T0 + 1000), 9L, "click", 3.0))
      .toDS().coalesce(1).write.parquet(s"$dir/batch0")
    val stream = spark.readStream
      .schema(Seq.empty[EventAggregates.Event].toDS().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*") // glob: each batch dir arrives as its own file(s)
    val sessions = EventAggregates.sessionize(spark,
      stream.as[EventAggregates.Event], gapMs = 5000, watermark = "1 second")
    val q = sessions.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // later files advance the watermark past every session's last+gap
      // and give the event-time timeout a batch to fire in — written to
      // the SAME glob, picked up by the running query, no driver feed
      Seq(EventAggregates.Event(8, new Timestamp(T0 + 120000), -1L, "flush", 0.0))
        .toDS().coalesce(1).write.parquet(s"$dir/batch1")
      q.processAllAvailable()
      Seq(EventAggregates.Event(9, new Timestamp(T0 + 121000), -1L, "flush", 0.0))
        .toDS().coalesce(1).write.parquet(s"$dir/batch2")
      q.processAllAvailable()
      val got = spark.table(sink).filter(col("user_id") >= 0)
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // user 7 splits on the 5s gap: (2 events, 3.0) + (1 event, 9.0);
      // user 9 has one singleton session
      assert(got == Set((7L, 2L, 3.0), (7L, 1L, 9.0), (9L, 1L, 3.0)))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
