package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.events
import graft.streaming.EventStreams

/**
 * Streaming-operator semantics pinned on BOUNDED input: the same transforms
 * run unbounded in [[graft.streaming.EventStreams]] (ScalaTest drives them
 * through MemoryStream); here the identical logical plans run over the
 * `events` table so the DuckDB oracle can state expected results. Spark's
 * epoch-aligned 1-hour windows equal date_trunc('hour'); session_window
 * equals the SQL gap-islands formulation.
 */
object StreamQueries {

  /** The st6/st7 delivery-delay model, ONE definition: each event arrives
    * a hash-derived 0..2h later (ms resolution) than its event time, and
    * the arrival key is (jittered_ms)·10⁶ + event_id — a TOTAL order only
    * while event_id < 10⁶. Ids at/above that radix would bleed into the
    * millisecond digits and make arrival ties possible (window order then
    * differs between engines — a flaky gate), so the construction fails
    * LOUDLY instead (the raise_error fires per offending row). The oracle
    * replays the identical fold, salt 'lat:'. */
  private def jitteredArrivals(e: DataFrame): DataFrame =
    e.withColumn("arrival",
      (expr("unix_micros(ts) div 1000") +
        pmod(graft.operators.Sampling.hashValue(
          when(col("event_id") >= 1000000L || col("event_id") < 0L,
            raise_error(concat(lit("jitteredArrivals: event_id outside " +
              "[0, 1e6) breaks the arrival total order: "),
              col("event_id").cast("string"))).cast("long"))
            .otherwise(col("event_id")), "lat:"),
          lit(7200000L))) * lit(1000000L) + col("event_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P133 — watermark-tuning disorder audit over a simulated delayed
    // delivery stream; is_late marks events a 1-hour watermark would DROP
    "st6_lateness" -> ((s, dir) => {
      // the shared delivery-delay model (see jitteredArrivals): a
      // rank-based shard merge of THIS corpus is already globally
      // ts-sorted (ts is monotone in event_id) and produced zero late
      // events at every SF (caught r9s4) — genuine disorder needs the
      // hash jitter
      val e = jitteredArrivals(events(s, dir).select(col("event_id"), col("ts")))
      graft.operators.TimeSeries.disorderAudit(e, "ts", "arrival",
          watermarkMicros = 3600000000L)
        .orderBy("arrival")
    }),

    // P164 — watermark sweep over the st6 delivery-jitter stream: for
    // each candidate delay, the events withWatermark(D) would drop
    "st7_wsweep" -> ((s, dir) => {
      val e = jitteredArrivals(events(s, dir).select(col("event_id"), col("ts")))
      graft.operators.TimeSeries.watermarkSweep(e, "ts", "arrival",
          Seq(0L, 600000000L, 1800000000L, 3600000000L, 7200000000L))
        .orderBy("delay_us")
    }),

    // tumbling 1h windows per event type
    "st1_windowed_counts" -> ((s, dir) => {
      EventStreams.windowedCounts(events(s, dir))
        .orderBy("window_start", "event_type")
    }),

    // P-series stream-stream interval join, batch-replayed: every click
    // joined to the same user's purchases within 30 minutes (the
    // attribution shape). Streaming semantics (watermarked state expiry)
    // are pinned in EventStreamsSpec; the join output itself is identical
    // in batch, which is what the oracle checks.
    "st5_interval_join" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purch_ts"),
          col("event_id").as("purch_id"))
      EventStreams.intervalJoin(clicks, purchases, "user_id",
          "click_ts", "purch_ts", maxDelay = "30 minutes")
        .select(col("user_id"), col("click_id"), col("purch_id"),
          (col("purch_ts").cast("long") - col("click_ts").cast("long"))
            .as("delay_sec"))
        .orderBy("user_id", "click_id", "purch_id")
    }),

    // P58 batch-replayed: the streaming count-min cells over bounded
    // input — withWatermark is a no-op on a batch plan
    // (EliminateEventTimeWatermark), and the epoch-aligned 1h windows
    // equal date_trunc('hour'), so the SAME streamingCountMin plan that
    // SketchesSpec drives through MemoryStream lands under the DuckDB
    // gate: every (window, r, bucket) cell replayed from portable MD5.
    "sk3_streaming_cms" -> ((s, dir) => {
      graft.operators.Sketches.streamingCountMin(
          events(s, dir), "ts", "user_id", rows = 2, width = 16)
        .orderBy("window_start", "r", "bucket")
    }),

    // P63 batch-replayed: streaming HLL registers per 1h window — same
    // no-op-watermark equivalence as sk3; register cells are the shared
    // hllRegisters helper, so this also pins batch/stream non-drift
    // under the driver's hash gate.
    "sk4_streaming_hll" -> ((s, dir) => {
      graft.operators.Sketches.streamingHllRegisters(
          events(s, dir), "ts", "user_id", p = 6)
        .orderBy("window_start", "register")
    }),

    // session windows (30 min gap) per user
    "st2_sessions" -> ((s, dir) => {
      EventStreams.sessionWindows(events(s, dir))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("session_end").cast("long") - col("session_start").cast("long"))
            .as("max_session_sec"))
        .orderBy("user_id")
    }),

    // P213 — session-duration outliers: st2's sessionization screened
    // by the o10 MAD modified-z over MULTI-event session durations —
    // the bot / left-open-tab detector; two verified stages composed
    // lazily. Single-event sessions are excluded: their duration is
    // exactly the gap constant, so they pin the median AND zero the
    // MAD (every mz degenerates to 0 — measured, not hypothetical)
    "pipe8_sessmad" -> ((s, dir) => {
      val sess = EventStreams.sessionWindows(events(s, dir))
        .where(col("n_events") >= 2)
        .select(col("user_id"), col("session_start"),
          (col("session_end").cast("long") -
            col("session_start").cast("long")).as("dur_sec"))
        .withColumn("grp", lit("all"))
      graft.operators.Features.madOutliers(sess, "grp", "dur_sec",
          cutoff = 3.5)
        .select("user_id", "session_start", "dur_sec", "med", "mad",
          "mz", "outlier")
        .orderBy("user_id", "session_start")
    })
  )

  val oracles: Map[String, String] = Map(
    // the identical hash-jittered delivery construction (sa1 MD5 fold,
    // 'lat:' salt), running max over the strictly-preceding arrival
    // frame, exact epoch-micro integers
    "st6_lateness" ->
      """WITH sh AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |        FOR c IN string_split(
        |          substr(md5('lat:' || CAST(event_id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM events),
        |arr AS (
        |  SELECT us,
        |    (us // 1000 + hv % 7200000) * 1000000 + event_id AS arrival
        |  FROM sh),
        |h AS (
        |  SELECT arrival, us,
        |    max(us) OVER (ORDER BY arrival
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM arr)
        |SELECT CAST(arrival AS BIGINT) AS arrival, us AS event_us,
        |  hwm AS hwm_us,
        |  CAST(hwm - us AS BIGINT) AS late_us,
        |  hwm - us > 3600000000 AS is_late
        |FROM h WHERE hwm IS NOT NULL AND hwm > us
        |ORDER BY arrival""".stripMargin,

    // the st6 lateness construction crossed with the delay grid; exact
    // integer micros, one closing division
    "st7_wsweep" ->
      """WITH sh AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |        FOR c IN string_split(
        |          substr(md5('lat:' || CAST(event_id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM events),
        |arr AS (
        |  SELECT us,
        |    (us // 1000 + hv % 7200000) * 1000000 + event_id AS arrival
        |  FROM sh),
        |h AS (
        |  SELECT arrival, us,
        |    max(us) OVER (ORDER BY arrival
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM arr),
        |late AS (SELECT hwm - us AS late_us FROM h
        |         WHERE hwm IS NOT NULL AND hwm > us),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events
        |        WHERE ts IS NOT NULL),
        |g(delay_us) AS (VALUES (0), (600000000), (1800000000),
        |                       (3600000000), (7200000000)),
        |agg AS (
        |  SELECT CAST(g.delay_us AS BIGINT) AS delay_us,
        |    CAST(SUM(CASE WHEN late_us > g.delay_us THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dropped
        |  FROM late, g GROUP BY 1)
        |SELECT delay_us, n_dropped, n_total,
        |  round(CAST(n_dropped AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS dropped_frac
        |FROM agg, tot ORDER BY delay_us""".stripMargin,

    "st1_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "st5_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purch_id,
        |  date_diff('second', c.ts, p.ts) AS delay_sec
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,

    // cell replay = the t12_cms idiom (md5('cms' || r || ':' || item)
    // 14-hex-digit fold mod width) grouped by the hour window
    "sk3_streaming_cms" ->
      """WITH cells AS (
        |  SELECT date_trunc('hour', ts) AS window_start, r.r,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |                 FOR ch IN string_split(substr(md5('cms' || r.r || ':'
        |                   || coalesce(CAST(user_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 16 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events CROSS JOIN range(2) r(r)
        |  GROUP BY 1, 2, 3)
        |SELECT window_start, r, bucket, n
        |FROM cells ORDER BY window_start, r, bucket""".stripMargin,

    // register replay = the sk2_hll idiom (low 6 bits route, leading-zero
    // rank of the 50-bit quotient, max per register) per hour window
    "sk4_streaming_hll" ->
      """WITH hv AS (
        |  SELECT date_trunc('hour', ts) AS window_start,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('hll:'
        |          || coalesce(CAST(user_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM events)
        |SELECT window_start, hv % 64 AS register,
        |  max(CASE WHEN hv // 64 = 0 THEN 51
        |      ELSE 51 - length(bin(hv // 64)) END) AS mj
        |FROM hv GROUP BY 1, 2
        |ORDER BY window_start, register""".stripMargin,

    "st2_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |per_session AS (
        |  -- session_window end = last event + gap, so duration carries +1800s
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    date_diff('second', MIN(ts), MAX(ts)) + 1800 AS dur_sec
        |  FROM sessions GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(MAX(dur_sec) AS BIGINT) AS max_session_sec
        |FROM per_session GROUP BY 1 ORDER BY 1""".stripMargin,

    // the st2 session replay at session grain + the o10 med/MAD replay
    // over all durations (session_window end = last event + gap)
    "pipe8_sessmad" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_id, MIN(ts) AS session_start,
        |    CAST(date_diff('second', MIN(ts), MAX(ts)) + 1800 AS BIGINT)
        |      AS dur_sec
        |  FROM sessions GROUP BY 1, 2
        |  HAVING COUNT(*) >= 2),
        |med AS (
        |  SELECT round(quantile_cont(CAST(dur_sec AS DOUBLE), 0.5), 6)
        |    AS med
        |  FROM per_session),
        |dev AS (
        |  SELECT p.user_id, p.session_start, p.dur_sec, m.med,
        |    abs(CAST(p.dur_sec AS DOUBLE) - m.med) AS dv
        |  FROM per_session p CROSS JOIN med m),
        |mad AS (SELECT round(quantile_cont(dv, 0.5), 6) AS mad FROM dev),
        |z AS (
        |  SELECT d.user_id, d.session_start, d.dur_sec, d.med, mad.mad,
        |    CASE WHEN mad.mad > 0
        |         THEN round(0.6745e0 * (CAST(d.dur_sec AS DOUBLE) - d.med)
        |           / mad.mad, 6)
        |         ELSE 0.0e0 END AS mz
        |  FROM dev d CROSS JOIN mad)
        |SELECT user_id, session_start, dur_sec, med, mad, mz,
        |  abs(mz) > 3.5e0 AS outlier
        |FROM z ORDER BY user_id, session_start""".stripMargin
  )
}
