package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binned interval-join semantics: equivalence to the naive nested-loop
  * result, multi-bin interval replication, and the plan fact that makes the
  * operator worth existing — an equi-join, never BroadcastNestedLoop. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 15L), (3L, 25L), (4L, 95L), (5L, 105L), (6L, 999L)
  ).toDF("point_id", "pt")

  private lazy val intervals = Seq(
    (10L, 0L, 20L),    // spans bins 0-2 at binSize 10
    (20L, 14L, 16L),   // within one bin
    (30L, 90L, 110L),  // spans bins 9-11
    (40L, 500L, 600L)  // matches nothing
  ).toDF("interval_id", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .where(col("pt") >= col("lo") && col("pt") <= col("hi"))
    .select("interval_id", "point_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive BETWEEN join across bin sizes") {
    for (binSize <- Seq(1L, 7L, 10L, 1000L)) {
      val got = RangeJoin.intervalJoin(points, "pt", intervals, "lo", "hi", binSize)
        .select("interval_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binSize=$binSize: got $got, want $naive")
    }
  }

  test("expected matches are present (boundary-inclusive)") {
    val got = RangeJoin.intervalJoin(points, "pt", intervals, "lo", "hi", 10L)
      .select("interval_id", "point_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L), (20L, 2L), (30L, 4L), (30L, 5L)))
  }

  test("plan is an equi-join on the bin key, not a nested loop") {
    val df = RangeJoin.intervalJoin(points, "pt", intervals, "lo", "hi", 10L)
    val qe = df.queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"),
      s"expected a join on the bin key:\n$plan")
  }

  test("binSize must be positive") {
    intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(points, "pt", intervals, "lo", "hi", 0L))
  }
}
