package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Numeric feature engineering for training pipelines: group-wise
 * standardization and fixed-width histograms.
 *
 * Both follow the engine-portability discipline used everywhere else in
 * the repo: moments accumulate through DECIMAL (exact, so partition order
 * cannot move the result), and every float that reaches an output or a
 * routing decision is either a single deterministic IEEE operation on
 * identical operands or rounded at 6 decimals.
 */
object Features {

  /**
   * P47 — group-wise z-score standardization: z = (x − μ_g) / σ_g with
   * population σ, σ_g = 0 groups (constant value) map to z = 0. The
   * moments come from ONE window over the group key (sum, sum-of-squares,
   * count in the same frame), so the whole feature costs a single hash
   * shuffle — no separate aggregate + join-back pass, and the shape holds
   * at any group cardinality. Sums go through DECIMAL(38,12): exact and
   * order-independent; the mean/variance/sd are then fixed sequences of
   * double ops on identical operands in any engine (variance clamps at 0
   * against negative rounding residue).
   */
  def zscore(df: DataFrame, keyCol: String, valueCol: String,
      outCol: String = "z"): DataFrame = {
    val g = Window.partitionBy(col(keyCol))
    val x = col(valueCol)
    val msum = sum(x.cast("decimal(38,12)")).over(g).cast("double")
    val qsum = sum((x * x).cast("decimal(38,12)")).over(g).cast("double")
    val n = count(x).over(g).cast("double")
    val mean = msum / n
    val variance = greatest(qsum / n - mean * mean, lit(0.0))
    val sd = sqrt(variance)
    df.withColumn(outCol,
      when(sd > 0, (x - mean) / sd).otherwise(lit(0.0)))
  }

  /**
   * P48 — fixed-width histogram per group: bin i covers
   * [lo + i·w, lo + (i+1)·w) with w = (hi − lo) / bins; values below `lo`
   * clamp into bin 0, values at/above `hi` into the last bin (the
   * standard width_bucket edge rule, collapsed to in-range ids so a
   * stray outlier can't mint unbounded bins). One keyed groupBy —
   * map-side combinable, the histogram never materializes per-row state.
   * Bin ids are floor of one double division on identical operands —
   * deterministic cross-engine.
   */
  def histogram(df: DataFrame, keyCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    require(lo < hi, s"histogram: lo ($lo) must be < hi ($hi)")
    val w = (hi - lo) / bins
    val raw = floor((col(valueCol) - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.select(col(keyCol), bin.as("bin"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
