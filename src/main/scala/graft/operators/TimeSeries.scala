package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-key rolling features over an ordered event stream — the feature-
 * engineering pass a training pipeline runs over clickstream/telemetry
 * tables before model training (lag deltas, short-horizon context windows,
 * lifetime counters).
 *
 * Everything is ONE window specification (partition by key, order by
 * time + tiebreaker) with per-column frames, so the whole feature set
 * costs a single hash shuffle on the key — the shape that scales to any
 * event volume. Rolling sums go through DECIMAL: a double sum's value
 * depends on addend order, and while one window frame is ordered, the
 * oracle's segment-tree accumulation would pair additions differently
 * (the CLAUDE.md money-sum rule applied to window frames).
 */
object TimeSeries {

  /**
   * P44 — rolling features per `keyCol`, ordered by (`tsCol`, `tieCol`):
   *
   *   - `delta`     — value minus the previous event's value (null on each
   *                   key's first event; exact double subtraction)
   *   - `prev_n`    — events in the trailing `lookback`-row frame
   *                   (exclusive of the current row)
   *   - `prev_mean` — decimal-summed mean of the frame, null when empty
   *   - `seq`       — 1-based lifetime event number of the key
   *
   * The tiebreaker column makes the order total — equal timestamps
   * otherwise leave lag/frames partition-order-dependent (the as-of-join
   * tie discipline).
   */
  def rollingFeatures(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, lookback: Int): DataFrame = {
    require(lookback >= 1, s"rollingFeatures: lookback must be >= 1, got $lookback")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val frame = w.rowsBetween(-lookback.toLong, -1L)
    val dec: Column = col(valueCol).cast("decimal(18,6)")
    df.withColumn("delta", col(valueCol) - lag(col(valueCol), 1).over(w))
      .withColumn("prev_n", count(col(valueCol)).over(frame))
      .withColumn("prev_mean",
        when(col("prev_n") > 0,
          round((sum(dec).over(frame).cast("double") / col("prev_n")), 6)))
      .withColumn("seq", row_number().over(w))
  }
}
