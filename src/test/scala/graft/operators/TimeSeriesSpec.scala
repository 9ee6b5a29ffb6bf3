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
}
