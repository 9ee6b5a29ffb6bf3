package graft.operators

import graft.SparkSpec

/** Column profiling + snapshot drift semantics. */
class ProfilingSpec extends SparkSpec {

  import spark.implicits._

  test("profileStats: one row per column, numeric stats only for numerics") {
    val df = Seq(
      (Some(1.0), Some("x")), (Some(2.0), Some("x")), (Some(3.0), None),
      (None, Some("y"))
    ).toDF("v", "s")
    val got = Profiling.profileStats(df, Seq("v", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got("v") == ((4L, 1L, 3L, Some(1.0), Some(3.0), Some(2.0))))
    assert(got("s") == ((4L, 1L, 2L, None, None, None)))
    intercept[IllegalArgumentException](Profiling.profileStats(df, Nil))
    intercept[IllegalArgumentException](Profiling.profileStats(df, Seq("zz")))
  }

  test("driftReport: null-rate delta, cardinality ratio, mean shift") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val b = Seq(Some(5.0), Some(5.0)).toDF("v")
    val r = Profiling.driftReport(a, b, Seq("v")).collect().head
    // columns: column, 6 a-stats, 6 b-stats, d_null_rate, r_distinct, d_mean
    assert(r.getString(0) == "v")
    assert(r.getDouble(13) == 0.25)        // |1/4 - 0/2|
    assert(r.getDouble(14) == 0.333333)    // 1 distinct / 3 distinct
    assert(r.getDouble(15) == 3.0)         // |2 - 5|
  }
}
