package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column profiling and snapshot-drift detection — the data-contract
 * monitor a production pipeline runs between ingest batches: has a
 * column's null rate spiked, its cardinality collapsed, its value
 * distribution shifted? (Schema drift broke this repo's own round 8 —
 * the events.ts regeneration — which is exactly the class of change
 * this operator surfaces as data instead of as a 3 AM analysis error.)
 */
object Profiling {

  /**
   * P104 — one-pass column profile: for each requested column,
   * (column, n_rows, n_null, n_distinct, min_v, max_v, mean_v) — the
   * numeric stats (rounded at 6; mean DECIMAL-summed, the zscore
   * discipline) are null for non-numeric columns, whose min/max/mean
   * are not engine-portable as strings. n_distinct counts non-null
   * values; nulls count separately.
   *
   * Shape: ALL columns' statistics compute in ONE distributed
   * aggregation pass (count/null-count/distinct/min/max/sum per column
   * in a single agg row); the reshape to one-row-per-column happens on
   * the driver over that single k-stat row — bytes, not data (the o3
   * scalar pattern). Exact countDistinct is the correctness choice at
   * gate scale; swap approx_count_distinct in at 100 TB, same shape.
   */
  def profileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileStats: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profileStats: columns not in input: ${missing.mkString(", ")}")
    val numeric = cols.map(c =>
      c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
      val num = if (numeric(c)) Seq(
        round(min(col(c)).cast("double"), 6).as(s"__mn_$c"),
        round(max(col(c)).cast("double"), 6).as(s"__mx_$c"),
        round(sum(col(c).cast("decimal(38,12)")).cast("double") /
          count(col(c)).cast("double"), 6).as(s"__mean_$c"))
      else Nil
      base ++ num
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def opt(row: Row, name: String): Option[Double] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    }
    val out = cols.map { c =>
      val (mn, mx, mean) =
        if (numeric(c))
          (opt(r, s"__mn_$c"), opt(r, s"__mx_$c"), opt(r, s"__mean_$c"))
        else (None, None, None)
      (c, r.getLong(r.fieldIndex(s"__n_$c")),
        r.getLong(r.fieldIndex(s"__nn_$c")),
        r.getLong(r.fieldIndex(s"__nd_$c")), mn, mx, mean)
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("column", "n_rows", "n_null", "n_distinct",
      "min_v", "max_v", "mean_v")
  }

  /**
   * P104 — drift report between two snapshots: [[profileStats]] of each
   * side joined per column with the alarm measures — null-rate delta,
   * cardinality ratio (b/a, null when a has none), mean shift (numeric
   * only). Two one-pass aggregations + a k-row join; thresholds belong
   * to the caller (alerting policy, not engine semantics).
   */
  def driftReport(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = profileStats(a, cols)
    val pb = profileStats(b, cols)
    val sel = Seq("n_rows", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
    val left = pa.select(col("column") +: sel.map(c => col(c).as(s"${c}_a")): _*)
    val right = pb.select(col("column") +: sel.map(c => col(c).as(s"${c}_b")): _*)
    val nullRate = (s: String) =>
      col(s"n_null_$s").cast("double") / col(s"n_rows_$s").cast("double")
    // both sides profile the SAME column list, so the key sets are equal
    // by construction — an inner join (broadcastable k-row frames, no
    // sort-merge) over a full-outer (which forces SMJ) loses nothing
    left.join(broadcast(right), Seq("column"))
      .withColumn("d_null_rate", round(abs(nullRate("a") - nullRate("b")), 6))
      .withColumn("r_distinct",
        when(col("n_distinct_a") > 0,
          round(col("n_distinct_b").cast("double") /
            col("n_distinct_a").cast("double"), 6)))
      .withColumn("d_mean", round(abs(col("mean_v_a") - col("mean_v_b")), 6))
  }
}
