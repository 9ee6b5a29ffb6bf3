package graft

import org.apache.spark.sql.functions._

/**
 * Tripwire for the daily-series query family (o29 Mann–Kendall, o32
 * decompose, o35 backtest, o36 runs, o38 Theil–Sen, pipe6 anomaly): the
 * `OlapQueries.dailyMeans` grid is NOT gap-filled, and
 * `seasonalDecompose`'s centered window is a ROW window — a missing
 * (event_type, day) cell would silently misalign the 7-day trend and the
 * weekday seasonal while the oracle (built on the identical construction)
 * stays green, so the correctness gate can never catch it. The driver
 * regenerates `/root/testdata` between rounds (the r8 ts-type drift
 * lesson); if a regen ever leaves a day without events for some type,
 * THIS spec fails loudly and the fix is to route `dailyMeans` through the
 * P113 resample grid (`TimeSeries.resampleFfill`) — in ONE place, never
 * per query.
 */
class EventsDailyDensitySpec extends SparkSpec {

  test("every (event_type, day) cell in the events span is populated") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val d = Graft.events(spark, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .distinct()
    val spans = d.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"),
        count(lit(1)).as("n_days"))
      .withColumn("expect", datediff(col("hi"), col("lo")) + 1)
      .collect()
    assert(spans.nonEmpty)
    val gapped = spans.filter(r => r.getAs[Long]("n_days") !=
      r.getAs[Int]("expect").toLong)
    assert(gapped.isEmpty,
      s"daily grid has gaps — gap-fill dailyMeans via resampleFfill: " +
        gapped.map(_.getString(0)).mkString(", "))
  }
}
