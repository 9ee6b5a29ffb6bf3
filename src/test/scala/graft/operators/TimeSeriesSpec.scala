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
}
