package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch semantics: the CM upper-bound guarantee and collisions. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private lazy val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")

  test("cms estimates never undercount; wide sketches are exact") {
    val df = items.toDF("item")
    val exact = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)
    for ((rows, width) <- Seq((2, 1024), (3, 8), (1, 2))) {
      val sketch = Sketches.countMinSketch(df, "item", rows, width)
      val est = Sketches.cmsEstimate(sketch,
          df.select("item").distinct(), "item", rows, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((k, n) <- exact)
        assert(est(k) >= n, s"CM bound violated at rows=$rows width=$width: $k")
      if (width == 1024) assert(est == exact, "wide sketch must be collision-free")
    }
    // width 1 forces every item into one cell: estimate = total count
    val sat = Sketches.cmsEstimate(
        Sketches.countMinSketch(df, "item", 2, 1),
        df.select("item").distinct(), "item", 2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sat.values.toSet == Set(items.length.toLong))
  }

  test("sketch cells total rows×occurrences and buckets stay in range") {
    val df = items.toDF("item")
    val cells = Sketches.countMinSketch(df, "item", rows = 3, width = 4).collect()
    assert(cells.map(_.getLong(2)).sum == 3L * items.length)
    assert(cells.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 3))
    // unknown probes estimate from whatever collides — never negative,
    // and 0 when the probe's cells are all empty
    val ghost = Sketches.cmsEstimate(
        Sketches.countMinSketch(df, "item", 2, 1024),
        Seq("zzz").toDF("item"), "item", 2, 1024)
      .collect().map(r => r.getLong(1))
    assert(ghost.head == 0L)
    intercept[IllegalArgumentException](Sketches.countMinSketch(df, "item", 0, 4))
  }
}
