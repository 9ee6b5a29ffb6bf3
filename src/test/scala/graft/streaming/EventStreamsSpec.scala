package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming semantics driven through MemoryStream: incremental
  * window aggregation, watermark late-drop, stateful sessionization. */
class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates incrementally across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    input.addData((ts(5), "click", 1.0), (ts(10), "view", 2.0), (ts(15), "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc")
      .select("event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("click", 2L, 4.0), ("view", 1L, 2.0)))
  }

  test("watermark drops events later than the bound") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("wm")
      .outputMode("append").start()
    // batch 1: event at 10:05 and one far ahead at 12:00 → watermark 11:50,
    // closing (and emitting) every window before it
    input.addData((ts(5), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 2: late event at 10:07 — behind the watermark, must be dropped
    input.addData((Timestamp.valueOf("2024-01-01 10:07:00"), "click", 100.0))
    q.processAllAvailable()
    q.stop()
    val tenOh = spark.table("wm")
      .where(col("window_start") === ts(0).toString.replace(".0", ""))
    val rows = spark.table("wm").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
    // the 10:00 window was finalized with exactly 1 event (late one dropped)
    assert(rows.count(_._1.startsWith("2024-01-01 10:00")) == 1)
    assert(rows.find(_._1.startsWith("2024-01-01 10:00")).get._2 == 1L)
  }

  test("intervalJoin matches click→purchase pairs within the delay, streaming") {
    implicit val sc = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Long)]
    val purchIn = MemoryStream[(Long, Timestamp, Long)]
    val clicks = clicksIn.toDF().toDF("user_id", "click_ts", "click_id")
    val purchases = purchIn.toDF().toDF("user_id", "purch_ts", "purch_id")
    val q = EventStreams.intervalJoin(clicks, purchases, "user_id",
        "click_ts", "purch_ts", maxDelay = "30 minutes", watermark = "1 hour")
      .select("user_id", "click_id", "purch_id")
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    // user 1: purchase 10 min after the click → joins; a second purchase
    // 45 min later is outside maxDelay; user 2's purchase PRECEDES the
    // click → no match (the interval is one-sided)
    clicksIn.addData((1L, ts(0), 100L), (2L, ts(30), 200L))
    purchIn.addData((1L, ts(10), 900L), (1L, ts(45), 901L), (2L, ts(5), 902L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ij").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 100L, 900L)))
  }

  test("session_window splits on gap in batch mode") {
    val df = Seq(
      (1L, ts(0), "a", 1.0), (1L, ts(10), "a", 1.0),   // session 1
      (1L, ts(50), "a", 1.0),                           // session 2 (40m gap)
      (2L, ts(30), "a", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventStreams.sessionWindows(df, gap = "30 minutes")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("stateful sessionizer closes sessions when the watermark passes") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "0 seconds").as[Event]
    val q = EventStreams.sessionize(withWm, gapMs = 60 * 1000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // batch 1: two events for user 1, one for user 2
    input.addData(
      Event(1L, ts(0), "a", 1.0), Event(1L, ts(0), "a", 2.0),
      Event(2L, ts(5), "b", 5.0))
    q.processAllAvailable()
    // batch 2: event far in the future advances the watermark past every
    // session's event-time timeout → both sessions close deterministically
    input.addData(Event(3L, ts(50), "c", 1.0))
    q.processAllAvailable()
    // one more batch so the timeout batch's results commit
    input.addData(Event(3L, ts(55), "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSet
    // users 1 and 2 closed: (2 events, 3.0) and (1 event, 5.0)
    assert(out.contains((1L, 2, 3.0)))
    assert(out.contains((2L, 1, 5.0)))
  }

  test("stateful sessionizer: old straggler seeds its own session, never stretches the current one") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // 1h delay keeps the out-of-order event ABOVE the watermark — Spark
    // drops stateful-operator input below it before the function runs
    val withWm = input.toDS().withWatermark("ts", "1 hour").as[Event]
    val q = EventStreams.sessionize(withWm, gapMs = 60 * 1000L)
      .writeStream.format("memory").queryName("sess_straggler")
      .outputMode("append").start()
    // batch 1: a session at t=10min
    input.addData(Event(1L, ts(10), "a", 1.0))
    q.processAllAvailable()
    // batch 2: straggler at t=0 — 10min before the open session, far beyond
    // the 1min gap; session_window semantics = two separate sessions
    input.addData(Event(1L, ts(0), "a", 2.0))
    q.processAllAvailable()
    // advance the watermark far enough to close both
    input.addData(Event(9L, ts(180), "z", 0.0))
    q.processAllAvailable()
    input.addData(Event(9L, ts(185), "z", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_straggler").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(3), r.getDouble(4), r.getLong(5))).toSet
    // two single-event sessions of zero duration — NOT one 10-minute span
    assert(sessions == Set((1, 1.0, 0L), (1, 2.0, 0L)), sessions.toString)
  }

  test("file source → windowed agg → parquet sink equals the batch result") {
    import java.nio.file.{Files, Paths}
    val base = Paths.get("target", "tmp", "stream_e2e")
    val inDir = base.resolve("in").toString
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    Seq(inDir, outDir, ckpt).foreach { d =>
      val p = Paths.get(d)
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
    }
    val batch = Seq(
      (ts(0), "click", 1.0), (ts(10), "view", 2.0), (ts(50), "click", 3.0))
      .toDF("ts", "event_type", "value")
    batch.write.parquet(inDir)

    // production shape: readStream → transform → writeStream(files)
    val stream = EventStreams.readEventStream(spark, inDir, batch.schema)
    val q = EventStreams.windowedCounts(stream, windowLen = "30 minutes",
        watermark = "0 seconds")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    // append mode only emits windows the watermark closed; the final
    // window (10:30, holding the 10:50 event) stays open — expect the
    // 10:00 window's two rows
    val streamed = spark.read.parquet(outDir)
      .select("event_type", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == Set(("click", 1L), ("view", 1L)))

    // the identical transform over the bounded frame agrees on those windows
    val batchOut = EventStreams.windowedCounts(batch, windowLen = "30 minutes")
      .where(col("window_start") === ts(0))
      .select("event_type", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batchOut == streamed)
  }

  test("dedupEvents drops duplicate ids within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupEvents(events).writeStream
      .format("memory").queryName("dd").outputMode("append").start()
    input.addData((1L, ts(0), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dd").count() == 2)
  }
}
