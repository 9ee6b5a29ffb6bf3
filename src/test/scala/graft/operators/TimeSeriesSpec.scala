package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rolling-feature semantics: frames, tie order, decimal-summed means. */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("rollingFeatures: lag delta, trailing frame, lifetime seq") {
    val ev = Seq(
      (1L, ts(1), 10L, 1.0), (1L, ts(2), 11L, 4.0), (1L, ts(3), 12L, 7.0),
      (1L, ts(4), 13L, 1.0),
      (2L, ts(1), 20L, 5.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = TimeSeries.rollingFeatures(ev, "user_id", "t", "event_id",
        "value", lookback = 2)
      .select("event_id", "delta", "prev_n", "prev_mean", "seq")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getLong(2), Option(r.get(3)), r.getInt(4)))).toMap
    assert(got(10L) == ((None, 0L, None, 1)))               // first event: no history
    assert(got(11L) == ((Some(3.0), 1L, Some(1.0), 2)))
    assert(got(12L) == ((Some(3.0), 2L, Some(2.5), 3)))     // mean(1,4)
    assert(got(13L) == ((Some(-6.0), 2L, Some(5.5), 4)))    // frame slid past row 1
    assert(got(20L) == ((None, 0L, None, 1)))               // keys are independent
  }

  test("rollingFeatures: equal timestamps order by the tiebreaker column") {
    val ev = Seq((1L, ts(5), 102L, 2.0), (1L, ts(5), 101L, 9.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = TimeSeries.rollingFeatures(ev, "user_id", "t", "event_id",
        "value", lookback = 3)
      .select("event_id", "seq", "delta").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    assert(got(101L) == ((1, None)))
    assert(got(102L) == ((2, Some(-7.0))))
    intercept[IllegalArgumentException](
      TimeSeries.rollingFeatures(ev, "user_id", "t", "event_id", "value", 0))
  }

  test("ewma: truncated adjusted weighting with early-row renormalization") {
    val ev = Seq(
      (1L, ts(1), 10L, Some(10.0)), (1L, ts(2), 11L, Some(20.0)),
      (1L, ts(3), 12L, Some(40.0)),
      (2L, ts(1), 20L, Option.empty[Double]))
      .toDF("user_id", "t", "event_id", "value")
    val got = TimeSeries.ewma(ev, "user_id", "t", "event_id", "value",
        alpha = 0.5, lookback = 2)
      .collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(got(10L) == Some(10.0))                   // lone term renormalizes to x
    assert(got(11L) == Some(16.666667))              // (20 + .5*10)/1.5
    assert(got(12L) == Some(33.333333))              // (40 + .5*20)/1.5
    assert(got(20L) == None)                         // all-null window -> null
    // lookback 1 degenerates to the value itself
    val flat = TimeSeries.ewma(ev, "user_id", "t", "event_id", "value",
        alpha = 0.5, lookback = 1)
      .collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(flat(12L) == Some(40.0) && flat(20L) == None)
    // the weight ladder and its SQL literal form agree
    assert(TimeSeries.ewmaWeights(0.25, 3) == Seq(1.0, 0.75, 0.5625))
    assert(TimeSeries.ewmaWeightLiterals(0.25, 3) ==
      Seq("1.0e0", "0.75e0", "0.5625e0"))
    intercept[IllegalArgumentException](
      TimeSeries.ewma(ev, "user_id", "t", "event_id", "value", 1.0, 2))
    intercept[IllegalArgumentException](
      TimeSeries.ewma(ev, "user_id", "t", "event_id", "value", 0.5, 0))
  }

  test("funnel chains greedy-earliest strictly-increasing step times") {
    val ev = Seq(
      // user 1 completes a,b,c in order — but b's earliest is BEFORE a,
      // so the chain must use the later b (greedy from a's min)
      (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 5L, "c"),
      // user 2 reaches a, then b, never c
      (2L, 10L, "a"), (2L, 11L, "b"),
      // user 3 has c before a only — depth 1
      (3L, 1L, "c"), (3L, 2L, "a"),
      // user 4 never does a — excluded entirely
      (4L, 1L, "b"), (4L, 2L, "c"),
      // user 5: a and b at the SAME tick — strict > rejects the tie
      (5L, 7L, "a"), (5L, 7L, "b")
    ).toDF("user_id", "t", "typ")
    val got = TimeSeries.funnel(ev, "user_id", "t", "typ", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((Some(2L), Some(3L), Some(5L), 3)))
    assert(got(2L) == ((Some(10L), Some(11L), None, 2)))
    assert(got(3L) == ((Some(2L), None, None, 1)))
    assert(got(5L) == ((Some(7L), None, None, 1)))
    intercept[IllegalArgumentException](
      TimeSeries.funnel(ev, "user_id", "t", "typ", Nil))
    intercept[IllegalArgumentException](
      TimeSeries.funnel(ev, "user_id", "t", "typ", Seq("a", "a")))
  }

  test("topPaths mines frequent n-grams per key order, ranked with ties broken") {
    val ev = Seq(
      (1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "B"), (1L, ts(3), 3L, "A"),
      (1L, ts(4), 4L, "B"),
      (2L, ts(1), 5L, "A"), (2L, ts(2), 6L, "B"), (2L, ts(3), 7L, "A"))
      .toDF("user_id", "t", "event_id", "event_type")
    val tri = TimeSeries.topPaths(ev, "user_id", "t", "event_id",
        "event_type", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4)))
    assert(tri.toSeq == Seq(("A", "B", "A", 2L, 1), ("B", "A", "B", 1L, 2)))
    // n = 2 reproduces the transition-matrix counts
    val bi = TimeSeries.topPaths(ev, "user_id", "t", "event_id",
        "event_type", n = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("A", "B") -> 3L, ("B", "A") -> 2L))
    // k truncates after the (cnt desc, path) order
    assert(TimeSeries.topPaths(ev, "user_id", "t", "event_id",
      "event_type", n = 3, k = 1).collect().map(_.getInt(4)).toSeq == Seq(1))
    intercept[IllegalArgumentException](
      TimeSeries.topPaths(ev, "user_id", "t", "event_id", "event_type", 1, 5))
  }

  test("kaplanMeier: textbook product limit with censoring and risk sets") {
    // classic example: times 1,2*,3,4,5* (starred censored), n=5:
    //   t=1: n=5, d=1 -> S = 4/5 = 0.8
    //   t=3: n=3, d=1 -> S = 0.8 * 2/3 = 0.533333
    //   t=4: n=2, d=1 -> S = 0.533333... * 1/2 = 0.266667
    // censored times 2 and 5 shrink the risk set but add no step
    val subj = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1),
      ("g", 4L, 1), ("g", 5L, 0)).toDF("grp", "t", "ev")
    val got = TimeSeries.kaplanMeier(subj, "grp", "t", "ev")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 3L, 4L))
    assert(got(1L) == ((1L, 5L, 0.8)))
    assert(got(3L)._2 == 3L && math.abs(got(3L)._3 - 0.533333) < 2e-6)
    assert(got(4L)._2 == 2L && math.abs(got(4L)._3 - 0.266667) < 2e-6)
    // everyone dies at the last step -> survival rounds to exactly 0
    val all = Seq(("h", 1L, 1), ("h", 1L, 1)).toDF("grp", "t", "ev")
    val g2 = TimeSeries.kaplanMeier(all, "grp", "t", "ev").collect().head
    assert(g2.getLong(2) == 2L && g2.getLong(3) == 2L && g2.getDouble(4) == 0.0)
    // ties at one time aggregate into a single step
    val tied = Seq(("i", 2L, 1), ("i", 2L, 1), ("i", 4L, 0))
      .toDF("grp", "t", "ev")
    val g3 = TimeSeries.kaplanMeier(tied, "grp", "t", "ev").collect()
    assert(g3.length == 1 && g3.head.getLong(2) == 2L &&
      g3.head.getLong(3) == 3L)
  }

  test("cohortRetention: calendar buckets, distinct-per-cell, offset 0 full") {
    // bucket = 10s; user 1 starts bucket 0, active 0/1/2 (twice in 1);
    // user 2 starts bucket 0, active 0 only; user 3 starts bucket 1,
    // active 1 and 3
    val ev = Seq(
      (1L, ts(1)), (1L, ts(12)), (1L, ts(15)), (1L, ts(25)),
      (2L, ts(3)),
      (3L, ts(11)), (3L, ts(35)))
      .toDF("user_id", "t")
    val got = TimeSeries.cohortRetention(ev, "user_id", "t",
        bucketMicros = 10000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),      // both cohort-0 users at offset 0
      (0L, 1L) -> ((1L, 2L, 0.5)),      // user 1 counted ONCE despite 2 events
      (0L, 2L) -> ((1L, 2L, 0.5)),
      (1L, 0L) -> ((1L, 1L, 1.0)),
      (1L, 2L) -> ((1L, 1L, 1.0))))     // user 3: bucket 3 − cohort 1
    intercept[IllegalArgumentException](
      TimeSeries.cohortRetention(ev, "user_id", "t", 0L))
  }

  test("transitionMatrix: adjacency per key, tie order, row-normalized") {
    val ev = Seq(
      // user 1: a→b→a→c; user 2: b→c; equal ts on user 2 resolved by id
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"), (1L, ts(3), 12L, "a"),
      (1L, ts(4), 13L, "c"),
      (2L, ts(5), 20L, "b"), (2L, ts(5), 21L, "c"),
      // user 3: single event — no transitions
      (3L, ts(9), 30L, "a"))
      .toDF("user_id", "t", "event_id", "typ")
    val got = TimeSeries.transitionMatrix(ev, "user_id", "t", "event_id", "typ")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 2L, 0.5)),
      ("a", "c") -> ((1L, 2L, 0.5)),
      ("b", "a") -> ((1L, 2L, 0.5)),
      ("b", "c") -> ((1L, 2L, 0.5))))   // no cross-user pair, no (c, *)
  }

  test("gaps: threshold filter, keyed lag, tie rows never gap") {
    val ev = Seq(
      (1L, ts(1), 10L), (1L, ts(5), 11L), (1L, ts(6), 12L), (1L, ts(20), 13L),
      (2L, ts(1), 20L), (2L, ts(1), 21L), // equal ts → 0 gap, filtered
      (3L, ts(9), 30L))                   // lone event → no pair
      .toDF("user_id", "t", "event_id")
    val got = TimeSeries.gaps(ev, "user_id", "t", "event_id",
        minGapMicros = 4000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set(
      (1L, 1000000L, 5000000L, 4000000L),    // exactly at threshold: kept
      (1L, 6000000L, 20000000L, 14000000L))) // 5→6 (1s) filtered
    intercept[IllegalArgumentException](
      TimeSeries.gaps(ev, "user_id", "t", "event_id", 0L))
  }

  test("attribution: first/last touch before FIRST conversion, tie order") {
    val ev = Seq(
      // user 1: click, view, PURCHASE, click (after conv — ignored), PURCHASE
      (1L, ts(1), 10L, "click"), (1L, ts(2), 11L, "view"),
      (1L, ts(3), 12L, "purchase"), (1L, ts(4), 13L, "click"),
      (1L, ts(5), 14L, "purchase"),
      // user 2: purchase with no prior touch → absent from output
      (2L, ts(1), 20L, "purchase"),
      // user 3: no conversion → absent
      (3L, ts(1), 30L, "click"),
      // user 4: click at the SAME ts as the purchase but smaller id → counts
      (4L, ts(5), 40L, "click"), (4L, ts(5), 41L, "purchase"))
      .toDF("user_id", "t", "event_id", "typ")
    val got = TimeSeries.attribution(ev, "user_id", "t", "event_id", "typ",
        conversionType = "purchase")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getString(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L) == ((3000000L, 1000000L, "click", 2000000L, "view", 2L)))
    assert(got(4L) == ((5000000L, 5000000L, "click", 5000000L, "click", 1L)))
  }

  test("ohlcBars: deterministic open/close, decimal vsum, bucketing") {
    val ev = Seq(
      (1L, ts(1), 10L, 5.0), (1L, ts(2), 11L, 9.0), (1L, ts(3), 12L, 1.0),
      (1L, ts(12), 13L, 7.0),
      // key 2: equal ts — open is the smaller event_id
      (2L, ts(4), 20L, 3.0), (2L, ts(4), 21L, 8.0))
      .toDF("k", "t", "event_id", "v")
    val got = TimeSeries.ohlcBars(ev, "k", "t", "event_id", "v",
        bucketMicros = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7), r.getLong(8)))).toMap
    assert(got((1L, 0L)) == ((5.0, 9.0, 1.0, 1.0, 3L, 15.0, 0L)))
    assert(got((1L, 1L)) == ((7.0, 7.0, 7.0, 7.0, 1L, 7.0, 10000000L)))
    assert(got((2L, 0L)) == ((3.0, 8.0, 3.0, 8.0, 2L, 11.0, 0L)))
    intercept[IllegalArgumentException](
      TimeSeries.ohlcBars(ev, "k", "t", "event_id", "v", 0L))
  }

  test("cusum: closed form equals the recursion, exact decimal compare") {
    // x − k: 0, −10, +20 → recursive s: 0, 0, 20
    val ev = Seq(
      (1L, ts(1), 10L, 10.0), (1L, ts(2), 11L, 0.0), (1L, ts(3), 12L, 30.0),
      // key 2: drift never recovers → s stays 0
      (2L, ts(1), 20L, 1.0), (2L, ts(2), 21L, 2.0))
      .toDF("k", "t", "event_id", "v")
    val got = TimeSeries.cusum(ev, "k", "t", "event_id", "v",
        reference = BigDecimal(10), threshold = BigDecimal(15))
      .collect().map(r => r.getLong(2) -> ((r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(got(10L) == ((0.0, false)))
    assert(got(11L) == ((0.0, false)))
    assert(got(12L) == ((20.0, true)))   // crosses 15
    assert(got(20L) == ((0.0, false)) && got(21L) == ((0.0, false)))
    intercept[IllegalArgumentException](
      TimeSeries.cusum(ev, "k", "t", "event_id", "v",
        BigDecimal(10), BigDecimal(0)))
  }

  test("topMovers: exact-decimal delta ranking, absent periods are zero") {
    val df = Seq(
      (1L, 1995, 100.0), (1L, 1996, 150.0),   // delta +50
      (2L, 1995, 100.0), (2L, 1996, 20.0),    // delta −80
      (3L, 1996, 10.0),                       // absent 1995 → a = 0
      (4L, 1995, 5.0), (4L, 1996, 5.0),       // delta 0
      (5L, 1997, 999.0))                      // other period ignored
      .toDF("k", "y", "v")
    val got = TimeSeries.topMovers(df, "k", col("y"), "v", 1995, 1996, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))))
      .toMap
    assert(got == Map(
      2L -> ((100.0, 20.0, -80.0, 1)),
      1L -> ((100.0, 150.0, 50.0, 2)),
      3L -> ((0.0, 10.0, 10.0, 3))))
    intercept[IllegalArgumentException](
      TimeSeries.topMovers(df, "k", col("y"), "v", 1995, 1996, 0))
  }

  test("disorderAudit: lateness vs the arrival high-water mark") {
    // arrival order 1..5 with event times 10, 30, 20, 40, 25 (seconds):
    // arrivals 3 and 5 are late (by 10s and 15s)
    val ev = Seq((1L, ts(10)), (2L, ts(30)), (3L, ts(20)), (4L, ts(40)),
      (5L, ts(25))).toDF("arrival", "t")
    val got = TimeSeries.disorderAudit(ev, "t", "arrival",
        watermarkMicros = 12000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      3L -> ((10000000L, false)),   // within the 12s watermark
      5L -> ((15000000L, true))))   // would be dropped
    intercept[IllegalArgumentException](
      TimeSeries.disorderAudit(ev, "t", "arrival", -1L))
  }

  test("autocorrelation: ±1 on perfect lag relations, degenerate nulls") {
    val ev = (
      (1 to 5).map(i => (1L, ts(i), i * 10L, i.toDouble)) ++      // linear → 1
      (1 to 4).map(i => (2L, ts(i), 20L + i, 7.0)) ++             // constant → null
      (1 to 4).map(i => (3L, ts(i), 30L + i,
        if (i % 2 == 0) 1.0 else -1.0)) ++                        // alternating → −1
      Seq((4L, ts(1), 40L, 5.0)))                                 // 1 row: no pairs
      .toDF("k", "t", "event_id", "v")
    val got = TimeSeries.autocorrelation(ev, "k", "t", "event_id", "v", lag = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((4L, Some(1.0))))
    assert(got(2L) == ((3L, None)))
    assert(got(3L) == ((3L, Some(-1.0))))
    intercept[IllegalArgumentException](
      TimeSeries.autocorrelation(ev, "k", "t", "event_id", "v", 0))
  }

  test("resampleFfill: full grid, in-bucket last wins, ignore-null fill") {
    val ev = Seq(
      // bucket 0 has two events — the later (t3) value is the cell's obs
      (1L, ts(1), 10L, 1.0), (1L, ts(3), 11L, 2.0),
      (1L, ts(35), 12L, 9.0), // bucket 3; buckets 1-2 are gaps
      (2L, ts(5), 20L, 4.0))
      .toDF("user_id", "t", "event_id", "v")
    val got = TimeSeries.resampleFfill(ev, "user_id", "t", "event_id", "v",
        bucketMicros = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(2)), Option(r.get(4)), r.getBoolean(5), r.getLong(3))))
      .toMap
    assert(got.size == 5)
    assert(got((1L, 0L)) == ((Some(2.0), Some(2.0), false, 0L)))
    assert(got((1L, 1L)) == ((None, Some(2.0), true, 10000000L)))
    assert(got((1L, 2L)) == ((None, Some(2.0), true, 20000000L)))
    assert(got((1L, 3L)) == ((Some(9.0), Some(9.0), false, 30000000L)))
    assert(got((2L, 0L)) == ((Some(4.0), Some(4.0), false, 0L)))
    intercept[IllegalArgumentException](
      TimeSeries.resampleFfill(ev, "user_id", "t", "event_id", "v", 0L))
  }

  test("seasonalProfile: epoch-day weekday, mean and index vs corpus mean") {
    import spark.implicits._
    // 2024-01-01 was a Monday (dow 0); 2024-01-06 a Saturday (dow 5)
    val ev = Seq(
      ("2024-01-01 10:00:00", Some(10.0)),  // Mon
      ("2024-01-08 09:00:00", Some(30.0)),  // Mon
      ("2024-01-06 12:00:00", Some(20.0)),  // Sat
      ("2024-01-06 13:00:00", Option.empty[Double])) // null value drops
      .toDF("t", "v")
      .select(org.apache.spark.sql.functions.to_timestamp($"t").as("t"), $"v")
    val got = TimeSeries.seasonalProfile(ev, "t", "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // corpus mean = 20: Mon mean 20 → idx 1.0; Sat mean 20 → idx 1.0
    assert(got == Map(0 -> ((2L, 20.0, 1.0)), 5 -> ((1L, 20.0, 1.0))))
  }

  test("mannKendall: textbook S on a monotone series; ties shrink var") {
    import spark.implicits._
    // strictly increasing 5-pointer: every pair is +1 → S = 10,
    // var = 5·4·15/18 = 50/3, z = 9/sqrt(50/3)
    val up = (1 to 5).map(i => ("a", i.toLong, i.toDouble))
    // all-tied series: S = 0, var = 0 → no test
    val flat = (1 to 4).map(i => ("b", i.toLong, 7.0))
    val got = TimeSeries.mannKendall((up ++ flat).toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 5L && a.getLong(2) == 10L)
    val varS = 50.0 / 3.0
    assert(a.getDouble(4) == BigDecimal(9.0 / math.sqrt(varS))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a.getString(5) == "increasing")
    val b = got("b")
    assert(b.getLong(2) == 0L && b.getDouble(3) == 0.0 && b.isNullAt(4) &&
      b.isNullAt(5))
    // reversing the series flips the sign
    val down = up.map { case (k, t, v) => ("c", t, -v) }
    val c = TimeSeries.mannKendall(down.toDF("k", "t", "v"), "k", "t", "v")
      .head
    assert(c.getLong(2) == -10L && c.getString(5) == "decreasing")
  }

  test("seasonalDecompose: flat series has zero seasonal; edges null") {
    import spark.implicits._
    import java.sql.Date
    // 14 flat days: trend = 10 on the 8 interior days, seasonal = 0,
    // resid = 0; the first/last 3 days have no full window
    val days = (1 to 14).map(d =>
      ("a", Date.valueOf(f"2024-01-$d%02d"), 10.0))
    val got = TimeSeries.seasonalDecompose(days.toDF("k", "day", "v"),
        "k", "day", "v")
      .collect().map(r => r.getDate(2).toString ->
        ((Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got("2024-01-01") == ((None, Some(0.0), None)))
    assert(got("2024-01-04") == ((Some(10.0), Some(0.0), Some(0.0))))
    assert(got("2024-01-11") == ((Some(10.0), Some(0.0), Some(0.0))))
    assert(got("2024-01-12")._1.isEmpty)
    // a weekly pattern decomposes into its own seasonal: +7 every
    // Monday on a flat base keeps trend = base + 1 (one spike per
    // centered window), seasonal picks up the rest
    val spiky = (1 to 21).map { d =>
      ("b", Date.valueOf(f"2024-01-$d%02d"), if (d % 7 == 1) 17.0 else 10.0)
    }
    val sp = TimeSeries.seasonalDecompose(spiky.toDF("k", "day", "v"),
        "k", "day", "v")
      .collect().map(r => r.getDate(2).toString ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    // every full window holds exactly one spike: trend = (6·10+17)/7 = 11
    assert(sp("2024-01-10") == Some(11.0))
  }

  test("watermarkSweep counts drops per candidate delay") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    // arrival order: t=10 arrives, then t=4 (6s late), then t=9 (1s late)
    val ev = Seq(
      (1L, "2024-01-01 00:00:10"),
      (2L, "2024-01-01 00:00:04"),
      (3L, "2024-01-01 00:00:09"))
      .toDF("arrival", "t")
      .select($"arrival", to_timestamp($"t").as("t"))
    val got = TimeSeries.watermarkSweep(ev, "t", "arrival",
        Seq(0L, 2000000L, 10000000L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(0L) == ((2L, 3L, 0.666667)))        // both late events drop
    assert(got(2000000L) == ((1L, 3L, 0.333333)))  // only the 6s-late one
    assert(got(10000000L) == ((0L, 3L, 0.0)))      // watermark covers all
    intercept[IllegalArgumentException](
      TimeSeries.watermarkSweep(ev, "t", "arrival", Seq.empty))
    intercept[IllegalArgumentException](
      TimeSeries.watermarkSweep(ev, "t", "arrival", Seq(-1L)))
  }

  test("seasonalNaiveBacktest joins by calendar, scores MAE/MAPE/bias") {
    import spark.implicits._
    import java.sql.Date
    // days 1..14, v = day index; forecast(d) = v(d−7) = v − 7 →
    // every error is exactly +7
    val pts = (1 to 14).map(d => ("a", Date.valueOf(f"2024-01-$d%02d"),
      d.toDouble))
    val r = TimeSeries.seasonalNaiveBacktest(pts.toDF("k", "day", "v"),
        "k", "day", "v", lagDays = 7).head
    assert(r.getLong(1) == 7L && r.getDouble(2) == 7.0 &&
      r.getDouble(4) == 7.0)
    // mape = mean over d=8..14 of 7/d
    val mape = BigDecimal((8 to 14).map(d => BigDecimal(7.0 / d)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == mape)
    // a GAP in the series produces no phantom forecast: drop day 3 →
    // day 10 has no d−7 counterpart and disappears from the score set
    val gapped = pts.filterNot(_._2.toString == "2024-01-03")
    val g = TimeSeries.seasonalNaiveBacktest(gapped.toDF("k", "day", "v"),
        "k", "day", "v", 7).head
    assert(g.getLong(1) == 6L)
    intercept[IllegalArgumentException](
      TimeSeries.seasonalNaiveBacktest(pts.toDF("k", "day", "v"),
        "k", "day", "v", 0))
  }

  test("theilSenSlope shrugs off the outlier OLS would chase") {
    import spark.implicits._
    import java.sql.Date
    // y = 2x on days 1..9 with day 5 poisoned to 1000: the pairwise
    // slope MEDIAN stays 2 (only 8 of 36 pairs touch the outlier)
    val pts = (1 to 9).map { d =>
      ("a", Date.valueOf(f"2024-01-$d%02d"),
        if (d == 5) 1000.0 else 2.0 * d)
    }
    val r = TimeSeries.theilSenSlope(pts.toDF("k", "day", "v"),
      "k", "day", "v").head
    assert(r.getLong(1) == 36L && r.getDouble(2) == 2.0)
  }

  test("seasonalStrength: flat residuals → 1, pure noise → 0") {
    import spark.implicits._
    import java.sql.Date
    // a perfect weekly pattern: detrended variance all explained by the
    // seasonal → residuals constant 0 → strength 1
    val weekly = (1 to 21).map { d =>
      ("a", Date.valueOf(f"2024-01-$d%02d"), if (d % 7 == 1) 17.0 else 10.0)
    }
    val dec = TimeSeries.seasonalDecompose(weekly.toDF("k", "day", "v"),
      "k", "day", "v")
    val s = TimeSeries.seasonalStrength(dec, "k").head
    assert(s.getDouble(2) == 1.0)
    // a flat series has zero detrended variance → no defined strength
    val flat = (1 to 14).map(d => ("b", Date.valueOf(f"2024-01-$d%02d"), 5.0))
    val f = TimeSeries.seasonalStrength(
      TimeSeries.seasonalDecompose(flat.toDF("k", "day", "v"),
        "k", "day", "v"), "k").head
    assert(f.isNullAt(2))
  }

  test("timeToConvert: first exposure, first strictly-later conversion") {
    val ev = Seq(
      (1L, ts(10), "view"), (1L, ts(5), "purchase"),  // purchase BEFORE view
      (1L, ts(30), "purchase"), (1L, ts(50), "purchase"),
      (2L, ts(20), "view"),                            // never converts
      (3L, ts(7), "purchase"))                         // converts, never views
      .toDF("user_id", "t", "typ")
    val got = TimeSeries.timeToConvert(ev, "user_id", "t", "typ",
        "view", "purchase")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // user 1: first view t=10s; purchases at 5 (too early), 30 (first
    // after), 50 — gap 20s = 0.005556h
    assert(got == Map(1L -> ((10000000L, 30000000L, 0.005556))))
    intercept[IllegalArgumentException](
      TimeSeries.timeToConvert(ev, "user_id", "t", "typ", "view", "view"))
  }

  test("steadyState: alternating chain stays uniform, biased chain converges") {
    // a↔b flip chain: uniform is stationary, every iterate stays (.5, .5)
    val flip = Seq(("a", "b", 1.0), ("b", "a", 1.0))
      .toDF("from_type", "to_type", "prob")
    val f = TimeSeries.steadyState(flip, "from_type", "to_type", "prob", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(f == Map("a" -> 0.5, "b" -> 0.5))
    // a→b always, b→a quarter of the time: 4 dyadic-exact iterates from
    // uniform land on (0.201171875, 0.798828125) → stationary (0.2, 0.8)
    val biased = Seq(("a", "b", 1.0), ("b", "a", 0.25), ("b", "b", 0.75))
      .toDF("from_type", "to_type", "prob")
    val g = TimeSeries.steadyState(biased, "from_type", "to_type", "prob", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g == Map("a" -> 0.201171875, "b" -> 0.798828125))
    // absorbing chain a→b (b has no outgoing row): b must KEEP its mass
    // (implicit self-loop) and absorb a's — mass never leaks and the
    // frame never empties; a's share hits exactly 0 and drops
    val absorbing = Seq(("a", "b", 1.0)).toDF("from_type", "to_type", "prob")
    val h = TimeSeries.steadyState(absorbing, "from_type", "to_type",
        "prob", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h == Map("b" -> 1.0))
    intercept[IllegalArgumentException](
      TimeSeries.steadyState(flip, "from_type", "to_type", "prob", 0))
  }

  test("kendallTau: ±1 on monotone relations, tie side nulls out") {
    import java.sql.Date
    val days = (1 to 4).map(d => Date.valueOf(f"2024-01-$d%02d"))
    val up = days.zipWithIndex.map { case (d, i) =>
      ("u", d, i.toDouble, (i * 10).toDouble) }          // y rises with x
    val down = days.zipWithIndex.map { case (d, i) =>
      ("d", d, i.toDouble, (30 - i * 10).toDouble) }     // y falls as x rises
    val tied = days.zipWithIndex.map { case (d, i) =>
      ("t", d, 5.0, i.toDouble) }                        // x constant
    val got = TimeSeries.kendallTau(
        (up ++ down ++ tied).toDF("k", "day", "x", "y"), "k", "day", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(got("u") == ((6L, 6L, 0L, 1.0)))
    assert(got("d") == ((6L, 0L, 6L, -1.0)))
    assert(got("t")._4 == null)
  }

  test("changePoint finds the level shift and its SSE gain exactly") {
    import java.sql.Date
    // 1,1,1 → 5,5,5: the only minSegment=3 candidate is the true split;
    // scaled-integer moments make the SSEs exact: total 24, split 0
    val days = (1 to 6).map(d => Date.valueOf(f"2024-01-$d%02d"))
    val vals = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0)
    val df = days.zip(vals).map { case (d, v) => ("k", d, v) }
      .toDF("k", "day", "v")
    val r = TimeSeries.changePoint(df, "k", "day", "v", minSegment = 3).head
    assert(r.getLong(1) == 6L)                              // n_days
    assert(r.getDate(2) == Date.valueOf("2024-01-04"))      // change_day
    assert(r.getDouble(3) == 24.0 && r.getDouble(4) == 0.0) // sse
    assert(r.getDouble(5) == 24.0)                          // gain
    // among several candidates the argmin picks the best split, ties on
    // the earlier day; too-short series emit nothing
    val short = days.take(4).zip(vals.take(4)).map { case (d, v) =>
      ("k", d, v) }.toDF("k", "day", "v")
    assert(TimeSeries.changePoint(short, "k", "day", "v", 3).count() == 0)
    intercept[IllegalArgumentException](
      TimeSeries.changePoint(df, "k", "day", "v", minSegment = 0))
  }

  test("crossCorrelation: a 2-day lead peaks exactly at lag 2") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(f"2024-01-${i + 1}%02d")
    // y at day t carries x's value of day t+2 (y LEADS x by 2 days) on a
    // nonlinear series, so only lag 2 aligns the pairs identically
    val xs = (0 until 12).map(t => ("a", day(t), (t * t).toDouble))
    val ys = (0 until 12).map(t => ("b", day(t), ((t + 2) * (t + 2)).toDouble))
    val daily = (xs ++ ys).toDF("k", "day", "v")
    val rows = TimeSeries.crossCorrelation(daily, "k", "day", "v",
      "a", "b", maxLag = 3).orderBy("lag").collect()
    assert(rows.length == 4)
    val byLag = rows.map(r => r.getInt(0) -> r).toMap
    assert(byLag(2).getDouble(2) == 1.0)          // perfect alignment
    assert(byLag(2).getLong(1) == 10L)            // 12 days minus lag 2
    assert(byLag(0).getDouble(2) < 1.0 && byLag(3).getDouble(2) < 1.0)
    intercept[IllegalArgumentException](
      TimeSeries.crossCorrelation(daily, "k", "day", "v", "a", "b", -1))
  }

  test("churnLabels: recency against the corpus high-water day") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-02-$d%02d 10:00:00")
    val ev = Seq(
      (1L, ts(1), Some(10.0)), (1L, ts(2), Some(20.0)), // last seen day 2
      (2L, ts(9), Some(30.0)), (2L, ts(10), None),
      (3L, ts(5), Some(40.0)))
      .toDF("u", "t", "v")
    val rows = TimeSeries.churnLabels(ev, Seq("u"), "t", "v", horizonDays = 3)
      .orderBy("u").collect()
    assert(rows.length == 3)
    val u1 = rows(0)
    assert(u1.getLong(1) == 2L && u1.getLong(2) == 2L)   // events, days
    assert(u1.getInt(5) == 8 && u1.getBoolean(6))        // recency 8 > 3
    assert(u1.getDouble(7) == 15.0)
    val u2 = rows(1)
    assert(u2.getInt(5) == 0 && !u2.getBoolean(6))
    assert(u2.getDouble(7) == 30.0)                      // null v excluded
    val u3 = rows(2)
    assert(u3.getInt(5) == 5 && u3.getBoolean(6))
    intercept[IllegalArgumentException](
      TimeSeries.churnLabels(ev, Nil, "t", "v", 3))
    intercept[IllegalArgumentException](
      TimeSeries.churnLabels(ev, Seq("u"), "t", "v", 0))
  }

  test("activeUserRatio: trailing window accumulates distinct users") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00")
    // day1: users 1,2; day2: user 2; day3: user 3 (twice)
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(2)), (3L, ts(3)),
      (3L, ts(3))).toDF("u", "t")
    val rows = TimeSeries.activeUserRatio(ev, "u", "t", windowDays = 2)
      .orderBy("day").collect()
    assert(rows.length == 3)
    // (dau, window over trailing 2 days)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 2L), (1L, 2L), (1L, 2L)))
    assert(rows(0).getDouble(3) == 1.0)    // day1: 2/2
    assert(rows(1).getDouble(3) == 0.5)    // day2: dau 1, window {1,2,?}=2
    intercept[IllegalArgumentException](
      TimeSeries.activeUserRatio(ev, "u", "t", 1))
  }

  test("nelsonAalen: hand cumulative hazard with censoring") {
    import spark.implicits._
    // subjects: death@1, death@2, censored@2, censored@3 →
    // H(1) = 1/4, H(2) = 1/4 + 1/3 = 0.583333 (t=3 has no event)
    val subj = Seq(("g", 1L, 1), ("g", 2L, 1), ("g", 2L, 0), ("g", 3L, 0))
      .toDF("grp", "t", "ev")
    val rows = TimeSeries.nelsonAalen(subj, "grp", "t", "ev")
      .orderBy("t").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 1L && rows(0).getLong(2) == 1L &&
      rows(0).getLong(3) == 4L && rows(0).getDouble(4) == 0.25)
    assert(rows(1).getLong(3) == 3L && rows(1).getDouble(4) == 0.583333)
  }

  test("logRankTest: symmetric arms null out; separated arms flag") {
    import spark.implicits._
    // identical arms: O = E → chi2 = 0
    val same = Seq(("A", 1L, 1), ("A", 2L, 1), ("B", 1L, 1), ("B", 2L, 1))
      .toDF("g", "t", "ev")
    val s = TimeSeries.logRankTest(same, "g", "t", "ev", "A", "B").head
    assert(s.getLong(0) == 2L && s.getLong(1) == 2L && s.getLong(2) == 2L)
    assert(s.getDouble(3) == 2.0 && s.getDouble(5) == 0.0 &&
      s.getDouble(6) == 0.0)
    // arm A all dies at t=1, arm B all censored at t=5:
    // E = 3·3/6 = 1.5, V = 81/180 = 0.45 → chi2 = 2.25/0.45 = 5
    val sep = (Seq.fill(3)(("A", 1L, 1)) ++ Seq.fill(3)(("B", 5L, 0)))
      .toDF("g", "t", "ev")
    val r = TimeSeries.logRankTest(sep, "g", "t", "ev", "A", "B").head
    assert(r.getLong(2) == 3L && r.getDouble(3) == 1.5 &&
      r.getDouble(4) == 0.45)
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 2.236068)
    // a third group is ignored entirely
    val extra = sep.union(Seq(("C", 9L, 1)).toDF("g", "t", "ev"))
    val e = TimeSeries.logRankTest(extra, "g", "t", "ev", "A", "B").head
    assert(e.getLong(0) == 3L && e.getLong(1) == 3L &&
      e.getDouble(5) == 5.0)
    intercept[IllegalArgumentException](
      TimeSeries.logRankTest(sep, "g", "t", "ev", "A", "A"))
  }

  test("gumbelBlockMaxima: moments fit from block maxima; degenerate null") {
    import spark.implicits._
    // key g: block 1 max 1.0, block 2 max 3.0 (raw rows below the max
    // must not matter) → mean 2, sd √2, then the literal chain
    val df = Seq(("g", 1, 1.0), ("g", 1, 0.5), ("g", 2, 3.0),
      ("g", 2, -1.0), ("h", 1, 7.0)).toDF("k", "blk", "v")
    val rows = TimeSeries.gumbelBlockMaxima(df, "k", "blk", "v")
      .orderBy("k").collect()
    val (c1, gam, c2) = TimeSeries.gumbelConstants
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val g = rows(0)
    assert(g.getLong(1) == 2L && g.getDouble(2) == 2.0)
    val sd = r6(math.sqrt(2.0))
    val beta = r6(sd * c1)
    val mu = r6(2.0 - gam * beta)
    assert(g.getDouble(3) == sd && g.getDouble(4) == beta &&
      g.getDouble(5) == mu && g.getDouble(6) == r6(mu - beta * c2))
    // the 100-block return level sits far above the mean peak
    assert(g.getDouble(6) > g.getDouble(2) + 3 * sd)
    // a single block cannot be fit
    val h = rows(1)
    assert(h.getLong(1) == 1L && h.isNullAt(3) && h.isNullAt(6))
  }

  test("individualsChart: limits from MR-bar, only the spike flags") {
    import spark.implicits._
    // 10,12,10,12,40: center 16.8, MR̄ = (2+2+2+28)/4 = 8.5,
    // UCL = 16.8 + 2.66·8.5 = 39.41 → only the 40 flags
    val df = Seq(("k", 1, 10.0), ("k", 2, 12.0), ("k", 3, 10.0),
      ("k", 4, 12.0), ("k", 5, 40.0)).toDF("key", "d", "v")
    val rows = TimeSeries.individualsChart(df, "key", "d", "v")
      .orderBy("d").collect()
    assert(rows.length == 5)
    val r0 = rows(0)
    assert(r0.isNullAt(3))                    // first point has no MR
    assert(r0.getDouble(4) == 16.8 && r0.getDouble(5) == 39.41)
    assert(rows.map(_.getBoolean(7)).toSeq ==
      Seq(false, false, false, false, true))
    assert(rows(4).getDouble(3) == 28.0)
    // a single point: no MR → limits null, flag null
    val one = Seq(("k", 1, 5.0)).toDF("key", "d", "v")
    val o = TimeSeries.individualsChart(one, "key", "d", "v").head
    assert(o.isNullAt(5) && o.isNullAt(7))
  }

  test("growthAccounting: new/retained/resurrected/churned decompose DAU") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00")
    // u1: days 1,2,4; u2: day 2; u3: day 4; day 3 has NO actives
    val ev = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(4)), (2L, ts(2)),
      (3L, ts(4)), (1L, ts(4))).toDF("u", "t")
    val rows = TimeSeries.growthAccounting(ev, "u", "t")
      .orderBy("day").collect()
      .map(r => r.getDate(0).toLocalDate.getDayOfMonth ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // day 1: u1 new; day 2: u1 retained + u2 new, nobody churned in;
    // day 4: u3 new + u1 resurrected. Day 3 (zero actives) is absent —
    // its churn inflow (u1 gapping, u2 leaving) is the pinned caveat
    assert(rows == Map(
      1 -> ((1L, 1L, 0L, 0L, 0L)),
      2 -> ((2L, 1L, 1L, 0L, 0L)),
      4 -> ((2L, 1L, 0L, 1L, 0L))))
    // churn lands on observed days when the next day IS active:
    // u1: 1,2; u2: 2,3 → day 3: u2 retained, u1 churned into day 3
    val ev2 = Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(2)), (2L, ts(3)))
      .toDF("u", "t")
    val r2 = TimeSeries.growthAccounting(ev2, "u", "t")
      .orderBy("day").collect()
    assert(r2.map(r => (r.getLong(1), r.getLong(5))).toSeq ==
      Seq((1L, 0L), (2L, 0L), (1L, 1L)))
  }

  test("ljungBox: alternating series screams, short series is null") {
    import spark.implicits._
    // ±1 alternation: ρ̂k ≈ (−1)^k with magnitude ~1 → Q explodes
    val alt = (1 to 24).map(i =>
      ("a", i, if (i % 2 == 0) 1.0 else -1.0)).toDF("k", "d", "v")
    val a = TimeSeries.ljungBox(alt, "k", "d", "v", maxLag = 7).head
    assert(a.getLong(1) == 24L && a.getInt(2) == 7 && a.getLong(4) == 7L)
    assert(a.getDouble(3) > 50.0)
    // n ≤ h+1: the statistic is undefined
    val short = (1 to 8).map(i => ("a", i, i.toDouble)).toDF("k", "d", "v")
    assert(TimeSeries.ljungBox(short, "k", "d", "v", 7).head.isNullAt(3))
    // constant series: zero variance drops the key entirely
    val flat = (1 to 24).map(i => ("a", i, 5.0)).toDF("k", "d", "v")
    assert(TimeSeries.ljungBox(flat, "k", "d", "v", 7).count() == 0L)
    intercept[IllegalArgumentException](
      TimeSeries.ljungBox(alt, "k", "d", "v", 0))
  }

  test("hurstExponent: trend reads persistent, noise reads near 1/2") {
    import spark.implicits._
    // a pure trend: Var(m) barely moves with m → slope ≈ 0 → H ≈ 1
    val trend = (0 until 32).map(i => ("a", i.toLong, i.toDouble))
      .toDF("k", "o", "v")
    val t = TimeSeries.hurstExponent(trend, "k", "o", "v").head
    assert(t.getLong(1) == 4L && t.getDouble(3) > 0.8)
    // deterministic LCG noise: aggregation averages it out → slope near
    // −1 → H near 0.5
    var seed = 12345L
    val noise = (0 until 32).map { i =>
      seed = (seed * 1103515245L + 12345L) % 2147483648L
      ("a", i.toLong, (seed % 1000L).toDouble / 100.0)
    }.toDF("k", "o", "v")
    val n = TimeSeries.hurstExponent(noise, "k", "o", "v").head
    assert(n.getDouble(3) > 0.1 && n.getDouble(3) < 0.9)
    assert(t.getDouble(3) > n.getDouble(3))
  }

  test("grangerLag1: a genuine lead shows up in ONE direction only") {
    import spark.implicits._
    // x = deterministic LCG noise, y_t = x_{t−1} + small jitter: x's
    // past predicts y almost perfectly (F explodes x→y, and the jitter
    // keeps SSE_u off the exact-zero degeneracy guard); y's past says
    // nothing extra about x
    var seed = 98765L
    def draw(): Double = {
      seed = (seed * 1103515245L + 12345L) % 2147483648L
      (seed % 1000L).toDouble / 100.0
    }
    val xs = (0 until 40).map(_ => draw())
    val jit = (0 until 40).map(_ => (draw() - 5.0) / 50.0)
    val rows = (1 until 40)
      .map(t => ("s", t.toLong, xs(t), xs(t - 1) + jit(t)))
      .toDF("k", "o", "x", "y")
    val got = TimeSeries.grangerLag1(rows, "k", "o", "x", "y")
      .orderBy("direction").collect()
    assert(got.length == 2)
    val fwd = got(0) // x->y
    val back = got(1) // y->x
    assert(fwd.getString(1) == "x->y" && back.getString(1) == "y->x")
    assert(fwd.getDouble(3) > 100.0)
    assert(fwd.getDouble(5) > 0.99) // unrestricted fit is near-perfect
    assert(back.getDouble(3) < fwd.getDouble(3) / 10.0)
    // constant y: degenerate moments null the verdict
    val flat = (1 to 20).map(t => ("s", t.toLong, t.toDouble, 5.0))
      .toDF("k", "o", "x", "y")
    val f = TimeSeries.grangerLag1(flat, "k", "o", "x", "y")
      .where(col("direction") === "x->y").head
    assert(f.isNullAt(3))
  }

  test("forecastSkill: an exact weekly pattern zeroes the seasonal " +
      "errors; a flat series nulls MASE") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
    // v = (dayIndex mod 7) + 1: seasonal-naive (lag 7) is EXACT, the
    // lag-1 persistence is not → mae/rmse/smape 0, mase 0
    val weekly = (0 until 21).map(i => ("s", day(i), (i % 7) + 1.0))
      .toDF("k", "d", "v")
    val w = TimeSeries.forecastSkill(weekly, "k", "d", "v", 7).head
    assert(w.getLong(1) == 14L) // days 7..20 have both lags
    assert(w.getDouble(2) == 0.0 && w.getDouble(3) == 0.0 &&
      w.getDouble(4) == 0.0 && w.getDouble(5) == 0.0)
    // flat series: persistence MAE is 0 → the MASE ratio is undefined
    val flat = (0 until 21).map(i => ("s", day(i), 5.0)).toDF("k", "d", "v")
    val fl = TimeSeries.forecastSkill(flat, "k", "d", "v", 7).head
    assert(fl.getDouble(2) == 0.0 && fl.getDouble(4) == 0.0 &&
      fl.isNullAt(5))
    // a known error ladder: days 14.. forecast = v(d−7); shift the
    // last week by +3 → mae 3, rmse 3, mase = 3·n/Σ|lag-1 diffs|
    val shifted = (0 until 21).map { i =>
      val base = (i % 7) + 1.0
      ("s", day(i), if (i >= 14) base + 3.0 else base)
    }.toDF("k", "d", "v")
    val sh = TimeSeries.forecastSkill(shifted, "k", "d", "v", 7)
      .head
    // scored days 7..20: errors are 0 for days 7..13, 3 for 14..20 →
    // mae = 21/14 = 1.5
    assert(sh.getDouble(2) == 1.5)
  }

  test("periodogram: a pure period-4 cosine concentrates power at " +
      "p = 4 and vanishes at p = 2") {
    import spark.implicits._
    // v = {1, 0, −1, 0} repeating over 8 days
    val df = (0 until 8).map(i =>
      ("s", i.toLong, Seq(1.0, 0.0, -1.0, 0.0)(i % 4))).toDF("k", "di", "v")
    val got = TimeSeries.periodogram(df, "k", "di", "v", Seq(2, 4))
      .orderBy("period").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(2, 4))
    assert(got(0).getDouble(5) == 0.0)  // p=2: orthogonal
    assert(got(1).getDouble(3) == 4.0 && got(1).getDouble(5) == 16.0)
    intercept[IllegalArgumentException](
      TimeSeries.periodogram(df, "k", "di", "v", Seq(4, 4)))
    intercept[IllegalArgumentException](TimeSeries.fourierLadder(1))
  }

  test("pacfDurbinLevinson: pacf1 = rho1 and the order-2/3 closings " +
      "replay the recursion on the emitted rhos") {
    import spark.implicits._
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val xs = Array.iterate(10.0, 40)(v => 0.7 * v + 3.0) // AR(1)-flavored
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("s", i.toLong, v + (if (i % 3 == 0) 0.5 else -0.25))
    }.toSeq.toDF("k", "o", "v")
    val r = TimeSeries.pacfDurbinLevinson(df, "k", "o", "v").head
    val (r1, r2, r3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(r.getDouble(5) == r1)
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(r.getDouble(6) == r6(phi22))
    val phi21 = r1 - phi22 * r1
    val den3 = 1.0 - phi21 * r1 - phi22 * r2
    assert(r.getDouble(7) == r6((r3 - phi21 * r2 - phi22 * r1) / den3))
    // constant series: zero variance → the key drops entirely
    val flat = (0 until 10).map(i => ("s", i.toLong, 2.0)).toDF("k", "o", "v")
    assert(TimeSeries.pacfDurbinLevinson(flat, "k", "o", "v").count() == 0)
  }

  test("littlesLaw: hand sweep on two overlapping jobs; reversed jobs " +
      "raise") {
    import spark.implicits._
    def d(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong))
    // A spans days 0..2, B only day 1: WIP 1,2,1 → area 4 = Σdur,
    // T = 3 → λ = 2/3, W = 2, L = 4/3, peak 2
    val jobs = Seq((d(0), d(2)), (d(1), d(1))).toDF("a", "c")
    val r = TimeSeries.littlesLaw(jobs, "a", "c").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.666667 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.333333 && r.getLong(5) == 2L)
    // conservation: L = λ·W exactly (the sweep counts the same
    // job-days the duration sum does)
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0 * 2.0) < 1e-5)
    val bad = Seq((d(5), d(1))).toDF("a", "c")
    val ex = intercept[Exception](
      TimeSeries.littlesLaw(bad, "a", "c").collect())
    assert(String.valueOf(ex.getMessage).contains("littlesLaw") ||
      String.valueOf(ex.getCause).contains("littlesLaw"))
  }

  test("wipSeries: densified spine, next-day release, hand WIP curve") {
    import spark.implicits._
    def d(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong))
    // jobs [0,0], [0,2], [1,1]: WIP 2,2,1; day 3 absent from the data
    // but a quiet SPINE day would surface as zeros (none here — spine
    // ends at the max completion)
    val jobs = Seq((d(0), d(0)), (d(0), d(2)), (d(1), d(1))).toDF("a", "c")
    val rows = TimeSeries.wipSeries(jobs, "a", "c").orderBy("day").collect()
    assert(rows.map(_.getDate(0)).toSeq == Seq(d(0), d(1), d(2)))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 1L, 0L)) // arrivals
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L)) // completions
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 2L, 1L)) // in flight
    val bad = Seq((d(5), d(1))).toDF("a", "c")
    val ex = intercept[Exception](
      TimeSeries.wipSeries(bad, "a", "c").collect())
    assert(String.valueOf(ex.getMessage).contains("wipSeries") ||
      String.valueOf(ex.getCause).contains("wipSeries"))
  }

  test("restrictedMeanSurvival: hand area under the textbook KM curve; " +
      "the horizon caps late steps") {
    import spark.implicits._
    // times 1,2*,3,4,5* → S = .8 (t1), .533333 (t3), .266667 (t4)
    val subj = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1),
      ("g", 4L, 1), ("g", 5L, 0)).toDF("grp", "t", "ev")
    val r = TimeSeries.restrictedMeanSurvival(subj, "grp", "t", "ev", 10L)
      .head
    // 1·1 + .8·2 + .533333·1 + .266667·6
    assert(r.getLong(1) == 3L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 4.733335)
    // τ = 2 truncates after the first step: 1 + .8·1
    val c = TimeSeries.restrictedMeanSurvival(subj, "grp", "t", "ev", 2L)
      .head
    assert(c.getDouble(3) == 1.8)
    intercept[IllegalArgumentException](
      TimeSeries.restrictedMeanSurvival(subj, "grp", "t", "ev", 0L))
  }

  test("engleGranger: recovers the level relation exactly and its ADF " +
      "stat is the adfTest of the residuals") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2020-01-${i}%02d")
    // y = 2x + 1 plus a ±0.5 wobble in the x-ORTHOGONAL, zero-sum
    // pattern (+,−,−,+) — so OLS recovers beta = 2, alpha = 1 exactly
    // and the residuals ARE the wobble
    val wob = Seq(0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5)
    val pts = wob.zipWithIndex.map { case (w, i) =>
      ("p", d(i + 1), (i + 1).toDouble, 2.0 * (i + 1) + 1.0 + w)
    }.toDF("k", "day", "x", "y")
    val r = TimeSeries.engleGranger(pts, "k", "day", "x", "y",
      critical = -2.0).head
    assert(r.getLong(1) == 7L)           // 8 residuals → 7 lag pairs
    assert(r.getDouble(2) == 2.0)        // beta recovers the relation
    assert(r.getDouble(3) == 1.0)        // alpha
    // composition contract: the stat IS adfTest on the residual series
    val resid = wob.zipWithIndex.map { case (w, i) => ("p", d(i + 1), w) }
      .toDF("k", "day", "r")
    val adf = TimeSeries.adfTest(resid, "k", "day", "r", critical = -2.0)
      .head
    assert(r.getDouble(4) == adf.getDouble(3))
    assert((r.getString(5) == "cointegrated") ==
      (adf.getString(4) == "stationary"))
    intercept[IllegalArgumentException](
      TimeSeries.engleGranger(pts, "k", "day", "x", "y", 1.0))
  }

  test("adfTest: hand regression moments, perfect-fit and short-series " +
      "guards") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2020-01-${i}%02d")
    // v = 0,1,0,2,0 → pairs x=[0,1,0,2], y=[1,-1,2,-2]
    val daily = Seq(("a", d(1), 0.0), ("a", d(2), 1.0), ("a", d(3), 0.0),
      ("a", d(4), 2.0), ("a", d(5), 0.0)).toDF("k", "day", "v")
    val r = TimeSeries.adfTest(daily, "k", "day", "v").head
    assert(r.getLong(1) == 4L)
    val (n, sx, sy, sxy, sxx, syy) = (4.0, 3.0, 0.0, -5.0, 5.0, 10.0)
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slope = num / den
    val se2 = (deny - slope * num) / ((n - 2.0) * den)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == r6(slope))
    assert(r.getDouble(3) == r6(slope / math.sqrt(se2)))
    assert(r.getString(4) == "stationary") // ≈ -4.47 < -2.89
    // a perfectly-fit alternating series has SSE 0 → stat/verdict NULL
    val perfect = Seq(("p", d(1), 0.0), ("p", d(2), 1.0), ("p", d(3), 0.0),
      ("p", d(4), 1.0), ("p", d(5), 0.0)).toDF("k", "day", "v")
    val pr = TimeSeries.adfTest(perfect, "k", "day", "v").head
    assert(!pr.isNullAt(2) && pr.isNullAt(3) && pr.isNullAt(4))
    // 3 points = 2 pairs → everything NULL
    val tiny = Seq(("t", d(1), 1.0), ("t", d(2), 2.0), ("t", d(3), 1.0))
      .toDF("k", "day", "v")
    val tr = TimeSeries.adfTest(tiny, "k", "day", "v").head
    assert(tr.isNullAt(2) && tr.isNullAt(3))
    intercept[IllegalArgumentException](
      TimeSeries.adfTest(daily, "k", "day", "v", critical = 1.0))
  }

  test("spectralEntropy: matches the periodogram fold, all-zero series " +
      "reads NULL") {
    // two superposed cycles → power at more than one candidate period
    val pts = Seq.tabulate(12)(i =>
      ("a", i.toLong, (i % 3) * 2.0 + (i % 4) + 1.0)) ++
      Seq.tabulate(12)(i => ("z", i.toLong, 0.0))
    val df = pts.toDF("k", "di", "v")
    val periods = Seq(2, 3, 4)
    val got = TimeSeries.spectralEntropy(df, "k", "di", "v", periods)
      .collect().map(r => r.getString(0) -> r).toMap
    // replay the same fold from the periodogram's own output
    val pw = TimeSeries.periodogram(df.where(col("k") === "a"), "k", "di",
        "v", periods)
      .collect().map(r => BigDecimal(r.getDouble(5)))
    val tot = pw.sum
    val terms = pw.map { p =>
      if (p > 0) BigDecimal(
        (p.toDouble / tot.toDouble) * math.log(p.toDouble / tot.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      else BigDecimal(0)
    }.sum
    val expected = BigDecimal(terms.toDouble / -math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getDouble(3) == expected)
    assert(a.getDouble(3) > 0.0 && a.getDouble(3) < 1.0)
    val z = got("z")
    assert(z.getDouble(2) == 0.0 && z.isNullAt(3))
    intercept[IllegalArgumentException](
      TimeSeries.spectralEntropy(df, "k", "di", "v", Seq(7)))
  }

  test("maxDrawdown: hand path — peak carries, deepest trough wins, " +
      "longest underwater run counted") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2020-01-${i}%02d")
    // path 10, 12, 9, 11, 8, 12, 12: peak 12 from day2; dd = 0,0,3,1,4,0,0
    val daily = Seq(
      ("a", d(1), 10.0), ("a", d(2), 12.0), ("a", d(3), 9.0),
      ("a", d(4), 11.0), ("a", d(5), 8.0), ("a", d(6), 12.0),
      ("a", d(7), 12.0),
      // monotone series: zero drawdown, no underwater run
      ("b", d(1), 1.0), ("b", d(2), 2.0)).toDF("k", "day", "v")
    val got = TimeSeries.maxDrawdown(daily, "k", "day", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 7L)            // n_days
    assert(a.getDouble(2) == 4.0)         // max_dd
    assert(a.getDate(3) == d(5))          // dd_day
    assert(a.getDouble(4) == 12.0)        // peak
    assert(a.getLong(5) == 3L)            // days 3..5 underwater
    val b = got("b")
    assert(b.getDouble(2) == 0.0 && b.getLong(5) == 0L)
    // argmax tie (two equal drawdowns): earliest day wins
    val tie = Seq(("t", d(1), 5.0), ("t", d(2), 3.0), ("t", d(3), 4.0),
      ("t", d(4), 3.0)).toDF("k", "day", "v")
    val t = TimeSeries.maxDrawdown(tie, "k", "day", "v").head
    assert(t.getDouble(2) == 2.0 && t.getDate(3) == d(2))
  }

  test("turningPoints: peaks and troughs counted, plateaus break, " +
      "moments match the closed forms") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2020-01-${i}%02d")
    // 1,3,2,4,4,5: turning at 3 (peak) and 2 (trough); the 4,4 plateau
    // is NOT a turning point (strict comparisons)
    val daily = Seq(("a", d(1), 1.0), ("a", d(2), 3.0), ("a", d(3), 2.0),
      ("a", d(4), 4.0), ("a", d(5), 4.0), ("a", d(6), 5.0))
      .toDF("k", "day", "v")
    val r = TimeSeries.turningPoints(daily, "k", "day", "v").head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L)
    // E = 2(6-2)/3 = 2.666667; Var = (96-29)/90; z = (2-8/3)/sqrt(67/90)
    assert(r.getDouble(3) == 2.666667)
    val ev = 2.0 * (6.0 - 2.0) / 3.0
    val z = BigDecimal((2.0 - ev) / math.sqrt((16.0 * 6.0 - 29.0) / 90.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == z && r.getString(5) == "random")
    // a 2-point series gets NULL z and verdict
    val tiny = Seq(("c", d(1), 1.0), ("c", d(2), 2.0)).toDF("k", "day", "v")
    val t = TimeSeries.turningPoints(tiny, "k", "day", "v").head
    assert(t.isNullAt(4) && t.isNullAt(5))
  }

  test("scd2Intervals: run collapse, half-open closes, version makes " +
      "same-timestamp alternation total") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      (1L, t(1), 1L, "A"), (1L, t(2), 2L, "A"), (1L, t(3), 3L, "B"),
      (1L, t(4), 4L, "A"),
      // user 2: two states at ONE timestamp — event_id orders them
      (2L, t(1), 1L, "X"), (2L, t(1), 2L, "Y"))
      .toDF("k", "ts", "eid", "st")
    val got = TimeSeries.scd2Intervals(ev, "k", "ts", "eid", "st")
      .orderBy("k", "version").collect()
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq == Seq("A", "B", "A"))
    assert(u1.map(_.getLong(5)).toSeq == Seq(2L, 1L, 1L)) // n_events
    // half-open: each close equals the next open
    assert(u1(0).getLong(4) == u1(1).getLong(3))
    assert(u1(1).getLong(4) == u1(2).getLong(3))
    assert(u1(2).isNullAt(4) && u1(2).getBoolean(6)) // open + current
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.map(_.getString(2)).toSeq == Seq("X", "Y"))
    assert(u2(0).getLong(3) == u2(1).getLong(3)) // same valid_from
    assert(u2.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // version totalizes
    // a null tie value drops (Spark orders nulls first, DuckDB last —
    // cross-engine segmentation would diverge)
    val nullTie = Seq((3L, t(1), Some(1L), "A"), (3L, t(2), None, "B"))
      .toDF("k", "ts", "eid", "st")
    val nt = TimeSeries.scd2Intervals(nullTie, "k", "ts", "eid", "st")
      .collect()
    assert(nt.length == 1 && nt.head.getString(2) == "A")
  }

  test("varianceRatio: alternating -> 0, convex -> trending, " +
      "constant guards to null") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2020-01-${i}%02d")
    // alternating 0,1,0,1,...: every 2-period difference is exactly 0,
    // so VR(2) = 0 — the hardest possible mean reversion
    val alt = (1 to 10).map(i => ("a", d(i), ((i + 1) % 2).toDouble))
    // v = t^2 is convex: long differences grow superlinearly
    // (var1 = 8, var2 = 20 -> VR = 20/16 = 1.25, trending)
    val conv = (0 to 5).map(i => ("c", d(i + 1), (i * i).toDouble))
    val flat = (1 to 8).map(i => ("f", d(i), 7.0))
    val daily = (alt ++ conv ++ flat).toDF("k", "day", "v")
    val got = TimeSeries.varianceRatio(daily, "k", "day", "v", q = 2,
        band = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 9L && a.getLong(2) == 8L)
    assert(a.getDouble(3) == 0.0 && a.getString(4) == "mean_reverting")
    val c = got("c")
    assert(c.getDouble(3) == 1.25 && c.getString(4) == "trending")
    // zero 1-period variance: ratio undefined, both outputs null
    val f = got("f")
    assert(f.isNullAt(3) && f.isNullAt(4))
  }
}
