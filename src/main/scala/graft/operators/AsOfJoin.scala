package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — the temporal operator Spark SQL lacks: for
 * every left row, attach the LATEST right row of the same key with
 * `rightTime <= leftTime` (inclusive), optionally within a tolerance.
 * The workhorse of feature backfills ("user state as of this event") and
 * slowly-changing-dimension lookups.
 *
 * Implementation is the distributed-idiomatic union+window, per the
 * composition-first preference (SURVEY §7.3): tag both sides, union, and
 * carry the right payload forward with `last(_, ignoreNulls)` over
 * (key ORDER BY time, side) — ONE shuffle on the key, no join explosion,
 * no per-key collect. Matches DuckDB's native ASOF JOIN semantics, which
 * the oracle uses directly.
 */
object AsOfJoin {

  /**
   * @param left       probe side
   * @param right      reference side (its non-key, non-time columns append)
   * @param key        equi-join key column name (present on both sides)
   * @param leftTime   event-time column on `left`
   * @param rightTime  event-time column on `right`
   * @param toleranceSeconds max allowed (leftTime - rightTime); None = ∞
   *
   * The right row is carried forward as ONE struct with a single
   * `last(_, ignoreNulls)`, so every output row's payload fields (and
   * matched time) come from the same right row — genuine nulls inside
   * payload columns are preserved, never skipped.
   */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val leftOther = left.columns.filterNot(_ == key).toSeq
    val timeType = right.schema(rightTime).dataType
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")} — rename before joining")
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "column names starting with __ are reserved by asOf")

    // the whole right row travels as ONE struct — a single ignoreNulls
    // carry-forward can then never stitch fields from different right rows,
    // and genuine nulls inside payload columns survive
    import org.apache.spark.sql.types.{StructField, StructType}
    val pkgType = StructType(StructField("__rt", timeType) +:
      payload.map(c => StructField(s"__p_$c", right.schema(c).dataType)))
    val lSide = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(pkgType).as("__pkg")) ++
        leftOther.map(col): _*)
    val rSide = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        struct(col(rightTime).as("__rt") +:
          payload.map(c => col(c).as(s"__p_$c")): _*).as("__pkg")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // at equal time the right row sorts first, so rt <= lt is inclusive;
    // __pkg as the final sort key makes ties among right rows at the SAME
    // (key, time) deterministic — without it, last() would pick whichever
    // row shuffle order delivered
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__pkg").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__pkg"), ignoreNulls = true).over(w))
      .withColumn("__vt", col("__m.__rt"))

    // null keys never match (ASOF equi-join semantics; the window would
    // otherwise group null-key rows together); tolerance compares at
    // microsecond precision — cast('long') would truncate to seconds and
    // accept matches up to ~1s past the bound
    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col(key).isNotNull && col("__vt").isNotNull &&
          (unix_micros(col("__t")) - unix_micros(col("__vt"))) <= tol * 1000000L
      case None => col(key).isNotNull && col("__vt").isNotNull
    }
    carried.where(col("__side") === 1).select(
      (col(key) +: leftOther.map(col)) ++
        Seq(when(withinTol, col("__vt")).otherwise(lit(null)).as(s"matched_$rightTime")) ++
        payload.map(c => when(withinTol, col(s"__m.__p_$c")).otherwise(lit(null)).as(c)): _*)
  }
}
