package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for typed stateful processing. */
case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** One open session span (epoch millis). */
case class SessionSpan(start: Long, lastTs: Long, nEvents: Int, sumValue: Double)

/** Session state carried between micro-batches: open spans, oldest first —
  * a LIST, because out-of-order arrivals can open an earlier session that
  * must not merge into (or corrupt) the current one. */
case class SessionState(spans: Seq[SessionSpan])

/** Emitted when a session times out. */
case class SessionResult(user_id: Long, startTs: Timestamp, endTs: Timestamp,
    nEvents: Int, sumValue: Double, durationSec: Long)

/**
 * Structured Streaming operators over the `events` shape. Every transform
 * here accepts an unbounded OR bounded DataFrame — the logical plan is
 * identical, so the batch oracle queries in [[graft.queries.StreamQueries]]
 * pin the same semantics the streaming tests exercise incrementally.
 *
 * Scale notes: windowed aggregates shuffle on (window, key) with map-side
 * partial aggregation; watermarks bound state. The custom sessionizer keys
 * state by user_id — state size is O(active users), not O(events).
 */
object EventStreams {

  /** Tumbling-window counts per event type with a watermark bounding state
    * and dropping late data. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      // decimal sum: partition-order-independent, bit-identical across
      // engines (double accumulation is not associative)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window top activity per user. */
  def slidingUserActivity(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n_events"))

  /** Declarative sessionization: built-in `session_window` with a gap. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      // decimal sum: partition-order-independent (see windowedCounts)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /**
   * Custom stateful sessionization via `flatMapGroupsWithState`: sessions
   * close after `gapMs` of event-time inactivity (watermark-driven
   * timeouts — deterministic, no wall-clock dependence), emitting one
   * `SessionResult` per closed session. The state API surface the built-in
   * session_window can't express (emit-on-close with custom payloads).
   * Callers must apply `withWatermark("ts", ...)` upstream.
   */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionResult] = {
    import events.sparkSession.implicits._

    def toResult(userId: Long, s: SessionSpan): SessionResult =
      SessionResult(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
        s.nEvents, s.sumValue, (s.lastTs - s.start) / 1000)

    // gap-merge spans sorted by start — session_window's chain rule, so an
    // out-of-order straggler older than (current start − gap) seeds its own
    // span instead of stretching the current session backwards
    def mergeSpans(spans: Seq[SessionSpan]): List[SessionSpan] =
      spans.sortBy(s => (s.start, s.lastTs)).foldLeft(List.empty[SessionSpan]) {
        case (cur :: done, next) if next.start <= cur.lastTs + gapMs =>
          cur.copy(lastTs = math.max(cur.lastTs, next.lastTs),
            nEvents = cur.nEvents + next.nEvents,
            sumValue = cur.sumValue + next.sumValue) :: done
        case (acc, next) => next :: acc
      }.reverse

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionResult](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // timeout invocations arrive with an empty iterator — the same
          // merge-then-expire pass handles both cases uniformly
          val carried = state.getOption.map(_.spans).getOrElse(Seq.empty)
          val incoming = rows.map(e =>
            SessionSpan(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
          val merged = mergeSpans(carried ++ incoming)
          // a span is closed once the watermark passes its end + gap — no
          // event at or below the watermark can extend it anymore
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(_.lastTs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionState(open))
            // the earliest still-open span drives the next timeout; clamped
            // above the watermark (Spark rejects timeouts at/below it, and
            // late rows can compute one)
            state.setTimeoutTimestamp(math.max(open.map(_.lastTs).min + gapMs, wm + 1))
          }
          closed.iterator.map(toResult(userId, _))
      }
  }

  /**
   * Watermarked stream-stream interval join — the attribution shape
   * (impression/click → conversion within a window). Inner equi-join on
   * `key` with the right event constrained to `[left ts, left ts +
   * maxDelay]`; both sides carry watermarks, so Spark can bound the join
   * state and expire rows the time condition can no longer match
   * (state per side is O(events inside watermark+delay), not O(stream)).
   * In batch the same plan is a plain range join, which is what the
   * DuckDB oracle replays (`withWatermark` is a no-op in batch).
   *
   * Column naming contract: rename any colliding non-key columns on the
   * two inputs BEFORE the call (the join output carries both sides).
   * The key and BOTH timestamp refs are dataset-qualified, so inputs whose
   * timestamp columns share a name (the natural `ts`/`ts` call) resolve to
   * the correct side instead of an ambiguous — or trivially-true — predicate.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, maxDelay: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelay"),
      "inner")
      .drop(r(key))
  }

  /** Stream-friendly dedup: drop repeated event_ids within the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** File-source entry point: read a parquet events directory as a stream —
    * the production shape (`readStream` → transforms → `writeStream`). */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
