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
    intercept[IllegalArgumentException](
      RangeJoin.overlapJoin(intervals, "lo", "hi",
        intervals.select(col("interval_id").as("rid"), col("lo").as("rlo"),
          col("hi").as("rhi")), "rlo", "rhi", -1L))
  }

  // ---- P68 overlap join ----------------------------------------------------

  private lazy val lefts = Seq(
    (1L, 0L, 25L),    // spans bins 0-2 at binSize 10
    (2L, 30L, 31L),
    (3L, 100L, 200L), // long interval, many shared bins with rid 13
    (4L, 400L, 410L)  // overlaps nothing
  ).toDF("lid", "llo", "lhi")

  private lazy val rights = Seq(
    (11L, 20L, 40L),   // overlaps lid 1 ([20,25]) and lid 2 ([30,31])
    (12L, 26L, 29L),   // gap between lid 1 and lid 2 — no overlap
    (13L, 90L, 250L),  // shares 11+ bins with lid 3 — must count ONCE
    (14L, 200L, 200L), // touches lid 3 at a single point (inclusive)
    (15L, 500L, 600L)
  ).toDF("rid", "rlo", "rhi")

  private def naiveOverlap = lefts.crossJoin(rights)
    .where(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
    .select("lid", "rid")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlap join equals the naive overlap join, duplicate-free, across bin sizes") {
    for (binSize <- Seq(1L, 7L, 10L, 1000L)) {
      val rows = RangeJoin.overlapJoin(lefts, "llo", "lhi", rights, "rlo", "rhi", binSize)
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.distinct.size == rows.size,
        s"binSize=$binSize: pair emitted more than once: $rows")
      assert(rows.toSet == naiveOverlap,
        s"binSize=$binSize: got ${rows.toSet}, want $naiveOverlap")
    }
  }

  test("overlap join matches inclusively at a single shared point") {
    val got = RangeJoin.overlapJoin(lefts, "llo", "lhi", rights, "rlo", "rhi", 10L)
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 14L))) // [100,200] ∩ [200,200] = {200}
    assert(!got.contains((1L, 12L))) // [0,25] vs [26,29] — adjacent, disjoint
  }

  test("overlap join plans as an equi-join on the bin key") {
    val df = RangeJoin.overlapJoin(lefts, "llo", "lhi", rights, "rlo", "rhi", 10L)
    val qe = df.queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join degenerated to a nested loop:\n$plan")
  }
}
