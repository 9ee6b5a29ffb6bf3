package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Feature-engineering semantics: standardization and histograms. */
class FeaturesSpec extends SparkSpec {

  import spark.implicits._

  test("zscore standardizes per group; constant groups map to zero") {
    // group a: {2, 4, 6} → μ=4, population σ = sqrt(8/3)
    // group b: {5, 5}    → σ=0 → z = 0 for every member
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 6.0),
      ("b", 4L, 5.0), ("b", 5L, 5.0)).toDF("k", "id", "x")
    val got = Features.zscore(df, "k", "x").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val sd = math.sqrt(8.0 / 3.0)
    assert(math.abs(got(1L) - (-2.0 / sd)) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(3L) - 2.0 / sd) < 1e-12)
    assert(got(4L) == 0.0 && got(5L) == 0.0)
  }

  test("histogram bins by fixed width and clamps outliers to edge bins") {
    val df = Seq(("a", -5.0), ("a", 0.0), ("a", 9.99), ("a", 10.0),
      ("a", 99.0), ("a", 100.0), ("a", 250.0), ("b", 55.0))
      .toDF("k", "x")
    // [0, 100) in 10 bins of width 10; -5 clamps to bin 0, ≥100 to bin 9
    val got = Features.histogram(df, "k", "x", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", 0L) -> 3L, ("a", 1L) -> 1L, ("a", 9L) -> 3L,
      ("b", 5L) -> 1L))
    intercept[IllegalArgumentException](
      Features.histogram(df, "k", "x", 0.0, 100.0, 0))
    intercept[IllegalArgumentException](
      Features.histogram(df, "k", "x", 5.0, 5.0, 3))
  }
}
