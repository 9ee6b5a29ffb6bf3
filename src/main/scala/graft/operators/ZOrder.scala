package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering for write-time data layout.
 *
 * At 100 TB the scan cost of a multi-dimensional filter is decided before
 * the query runs, by how the writer laid rows into files: parquet prunes
 * row groups on per-column min/max, and a sort by a single column gives
 * tight ranges on that column only. Interleaving the bits of several
 * quantized columns gives every participating column locality, so a
 * predicate on ANY of them skips most row groups.
 *
 * All pure built-in column expressions (shift/mask/or chains — fixed-size
 * expression tree, whole-stage codegen), no UDF, no shuffle beyond the
 * final range partitioning. This is a library-side layout helper on plain
 * parquet — the same idea table formats ship as `OPTIMIZE ZORDER BY`.
 */
object ZOrder {

  /** Quantize any orderable numeric column into `bits` unsigned bits over
    * the closed range [min, max] — out-of-range values clamp to the ends,
    * nulls to bucket 0. The caller supplies the bounds (at scale they come
    * from table statistics, not an extra pass). */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"quantize: bits must be in 1..31, got $bits")
    require(max > min, s"quantize: max ($max) must exceed min ($min)")
    val buckets = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(min)) / lit(max - min) * lit(buckets.toDouble)
    // NaN sorts ABOVE every double in Spark, so greatest/least would sweep
    // NaN rows into the TOP bucket — route them to bucket 0 with nulls
    val clamped = least(greatest(round(scaled, 0), lit(0.0)), lit(buckets.toDouble))
    coalesce(when(isnan(scaled), 0L).otherwise(clamped).cast("long"), lit(0L))
  }

  /** Morton z-value: interleave the low `bits` bits of each column —
    * output bit `j·k + i` is bit `j` of column `i` (k = number of
    * columns). Inputs must already be non-negative and fit in `bits` bits
    * (use [[quantize]]); `k·bits` is capped at 62 so the arithmetic stays
    * inside a signed long under ANSI mode. */
  def zValue(bits: Int, cols: Column*): Column = {
    val k = cols.size
    require(k >= 1, "zValue: at least one column")
    require(bits >= 1 && k * bits <= 62,
      s"zValue: $k columns × $bits bits exceeds the 62-bit budget")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** P96 — Hilbert curve index over two quantized columns: like
    * [[zValue]] a space-filling layout key, but with the stronger
    * locality guarantee that CONSECUTIVE indices are always grid
    * neighbors (Morton takes long diagonal jumps at quadrant
    * boundaries), so a range of row groups covers a tighter spatial
    * region — measurably fewer row groups touched per 2-D range
    * predicate at the same file count. Inputs must already be
    * non-negative and fit in `bits` bits (use [[quantize]]); the per-bit
    * rotate is sequential, so it runs as the compiled
    * [[graft.expressions.HilbertIndexExpr]] kernel, not an unrolled
    * Column tree. */
  def hilbertValue(bits: Int, x: Column, y: Column): Column = {
    require(bits >= 1 && 2 * bits <= 62,
      s"hilbertValue: 2 × $bits bits exceeds the 62-bit budget")
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.expressions.HilbertIndexExpr(
      colExpr(x.cast("long")), colExpr(y.cast("long")), bits))
  }

  /** Cluster a frame for writing: range-partition on the z-value (so file
    * N holds one contiguous z-range) and sort inside each partition. The
    * z column itself is dropped — it is a layout key, not data. */
  def clusterByZOrder(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.withColumn("__zorder", z)
      .repartitionByRange(numPartitions, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")

  /**
   * P198 — covering Hilbert index ranges for an axis-aligned query box:
   * the index-side half of a 2-D range scan. A box over quantized
   * coordinates is answered by a SET of contiguous [[hilbertValue]]
   * intervals; against a Hilbert-clustered layout (P96 + P127 zone
   * maps) those intervals ARE the row groups to read — everything else
   * skips without decoding. Driver-side quadtree descent: a quadrant
   * disjoint from the box prunes, one fully inside emits its whole
   * interval, a straddler recurses until `maxDepth`, where its full
   * interval is emitted (a SUPERSET — callers re-apply the exact box
   * predicate, so correctness never depends on depth; depth only trades
   * range count against read amplification). Adjacent intervals merge.
   *
   * Every aligned 2^k square holds one CONTIGUOUS index block entered
   * and exited at cell corners (the curve is a rotated/reflected copy
   * of itself in each quadrant), so the block is [min over the 4 corner
   * indices, min + side² − 1] — asserted against the max corner.
   */
  def hilbertRanges(bits: Int, xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      maxDepth: Int = 8): Seq[(Long, Long)] = {
    require(bits >= 1 && 2 * bits <= 62,
      s"hilbertRanges: 2 × $bits bits exceeds the 62-bit budget")
    require(maxDepth >= 1, s"hilbertRanges: maxDepth must be >= 1")
    val n = 1L << bits
    require(xLo >= 0 && yLo >= 0 && xHi < n && yHi < n &&
      xLo <= xHi && yLo <= yHi,
      s"hilbertRanges: box [$xLo,$xHi]×[$yLo,$yHi] outside the $bits-bit grid")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def corners(qx: Long, qy: Long, side: Long): Seq[Long] =
      Seq((qx, qy), (qx + side - 1, qy), (qx, qy + side - 1),
        (qx + side - 1, qy + side - 1))
        .map { case (cx, cy) => graft.expressions.LayoutEval.xy2d(bits, cx, cy) }
    def rec(depth: Int, qx: Long, qy: Long, side: Long): Unit = {
      if (qx > xHi || qx + side - 1 < xLo || qy > yHi || qy + side - 1 < yLo)
        return // disjoint
      val inside = qx >= xLo && qx + side - 1 <= xHi &&
        qy >= yLo && qy + side - 1 <= yHi
      if (inside || side == 1L || depth >= maxDepth) {
        val cs = corners(qx, qy, side)
        val lo = cs.min
        assert(cs.max == lo + side * side - 1,
          s"hilbertRanges: non-contiguous quadrant block at ($qx,$qy,$side)")
        out += ((lo, lo + side * side - 1))
      } else {
        val h = side / 2
        rec(depth + 1, qx, qy, h); rec(depth + 1, qx + h, qy, h)
        rec(depth + 1, qx, qy + h, h); rec(depth + 1, qx + h, qy + h, h)
      }
    }
    rec(0, 0L, 0L, n)
    out.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((plo, phi) :: rest, (lo, hi)) if lo <= phi + 1 =>
        (plo, math.max(phi, hi)) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** The [[hilbertRanges]] set as one pushable Column predicate over a
    * precomputed Hilbert index column. */
  def hilbertRangePredicate(h: Column, ranges: Seq[(Long, Long)]): Column = {
    require(ranges.nonEmpty, "hilbertRangePredicate: empty range set")
    ranges.map { case (lo, hi) => h.between(lo, hi) }.reduce(_ || _)
  }

  /**
   * P240 — delta-encoding audit for a candidate sort order: within
   * each hash shard, order rows by (orderCol, tieCol) and measure the
   * successive-value deltas of `valueCol` — small, tight deltas mean
   * delta/frame-of-reference encodings (and min-max zone pruning) will
   * bite under this layout; arrival-order deltas are the baseline the
   * candidate must beat. Emits per shard (tag, shard, n_rows,
   * mean_abs_delta, p90_abs_delta, max_abs_delta); `tag` names the
   * ordering so two calls union into one comparison frame.
   *
   * Shapes: one per-shard (partitioned) lag window — never global —
   * plus one keyed agg with a percentile (the o5 class over shard-
   * bounded frames). Cross-engine: deltas are exact DECIMAL(19,6)
   * differences; the mean decimal-sums at 6, p90 reads the delta
   * doubles at 4, max an exact decimal cast at 6.
   */
  def deltaStats(df: DataFrame, idCol: String, valueCol: String,
      orderCol: String, shards: Int, tag: String,
      salt: String = "delta:"): DataFrame = {
    require(shards >= 1, s"deltaStats: shards must be >= 1, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__o").asc, col("__id").asc)
    val base = df
      .where(col(idCol).isNotNull && col(valueCol).isNotNull &&
        col(orderCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(valueCol).cast("decimal(19,6)").as("__v"),
        col(orderCol).as("__o"))
      .withColumn("shard", Sampling.hashBucket(col("__id"), shards, salt))
    base
      .withColumn("__d", abs(col("__v") - lag(col("__v"), 1).over(w)))
      .where(col("__d").isNotNull)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("__d").cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_abs_delta"),
        round(expr("percentile(CAST(__d AS DOUBLE), 0.9)"), 4)
          .as("p90_abs_delta"),
        round(max(col("__d")).cast("double"), 6).as("max_abs_delta"))
      .select(lit(tag).as("tag"), col("shard"), col("n_rows"),
        col("mean_abs_delta"), col("p90_abs_delta"), col("max_abs_delta"))
  }

  /**
   * P225 — range-partitioning balance audit: cut `valueCol` at the
   * i/p quantiles (the boundaries a range partitioner / sorted-write
   * would pick) and report each resulting partition's row count, share,
   * and ratio to the even split — the health check run before
   * committing to a sort key at scale (a ratio ≫ 1 partition is the
   * straggler task; heavy ties on a boundary value show up as one fat
   * bucket flanked by thin ones, exactly what this surfaces). Emits
   * (bucket, n_rows, share, ratio_to_even) with bucket = number of
   * boundaries ≤ v (ties go RIGHT of their boundary, matching the
   * upper-inclusive quantile cut).
   *
   * Shapes: ONE percentile agg for the p−1 boundaries (the o5 class —
   * boundaries are k-row), broadcast onto the scan as a k-row
   * cross-join (the adjudicated class), bucket as a sum of exact
   * comparison indicators, then one map-side-combinable count agg.
   * Cross-engine: boundaries round at 4 (the o5 rule); raw values
   * compare against those identical doubles; shares/ratios are double
   * divisions of exact BIGINTs rounded at 6.
   */
  def rangeBalance(df: DataFrame, valueCol: String,
      partitions: Int): DataFrame = {
    require(partitions >= 2 && partitions <= 1024,
      s"rangeBalance: partitions must be in 2..1024, got $partitions")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val fracs = (1 until partitions)
      .map(i => i.toDouble / partitions)
    val bounds = base.agg(
      fracs.zipWithIndex.map { case (f, i) =>
        round(expr(s"percentile(__v, $f)"), 4).as(s"__b$i")
      }.head, fracs.zipWithIndex.tail.map { case (f, i) =>
        round(expr(s"percentile(__v, $f)"), 4).as(s"__b$i")
      }: _*)
    val bucket = (0 until partitions - 1)
      .map(i => when(col("__v") >= col(s"__b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val counted = base.crossJoin(broadcast(bounds)) // 1-row boundary frame
      .select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val total = counted.agg(sum(col("n_rows")).as("__total"))
    counted.join(broadcast(total)) // 1-row scalar side
      .withColumn("share",
        round(col("n_rows").cast("double") / col("__total").cast("double"),
          6))
      .withColumn("ratio_to_even",
        round(col("n_rows").cast("double") * partitions /
          col("__total").cast("double"), 6))
      .drop("__total")
  }

  /**
   * P279 — run-length layout audit: for each candidate column, the
   * number of VALUE RUNS the column exhibits when the table is laid
   * out in `sortKeyCol` order, and the average run length — the direct
   * predictor of parquet RLE/dictionary efficiency and of z5-style
   * zonemap tightness under a given sort key (avg run ≈ 1 means the
   * layout gives this column nothing; avg run ≫ 1 means the encoder
   * eats it). Values compare as strings, null-safely (a null run is a
   * run). `sortKeyCol` must be unique per row (it defines the order).
   * Emits per column (column, n_rows, n_runs, avg_run_len,
   * n_distinct), ordered by column.
   *
   * Shape: the sa13 two-phase range-bucket pattern — key-partitioned
   * windows INSIDE floor(key/bucketSize) buckets (runs per bucket +
   * bucket-edge values via min_by/max_by), then one boundary-stitch
   * window over the 1/bucketSize-reduced bucket frame (the adjudicated
   * two-phase residual class; at extreme scale the stitch itself
   * re-buckets hierarchically — same algebra). Cross-engine: all
   * counts exact BIGINTs; one closing double division at 6.
   */
  def runLengthAudit(df: DataFrame, sortKeyCol: String,
      valueCols: Seq[String], bucketSize: Int = 1024): DataFrame = {
    require(valueCols.nonEmpty, "runLengthAudit: no value columns")
    require(bucketSize >= 2, s"runLengthAudit: bucketSize $bucketSize < 2")
    import org.apache.spark.sql.expressions.Window
    val per = valueCols.map { c =>
      val base = df.where(col(sortKeyCol).isNotNull)
        .select(col(sortKeyCol).cast("long").as("__k"),
          col(c).cast("string").as("__v"))
        .withColumn("__b", floor(col("__k") / bucketSize))
      val w = Window.partitionBy(col("__b")).orderBy(col("__k").asc)
      val runs = base
        .withColumn("__rn", row_number().over(w))
        .withColumn("__new",
          when(col("__rn") === 1, 1L)
            .when(lag(col("__v"), 1).over(w) <=> col("__v"), 0L)
            .otherwise(1L))
      val bucketStats = runs.groupBy(col("__b"))
        .agg(sum(col("__new")).as("__runs"),
          min_by(col("__v"), col("__k")).as("__fv"),
          max_by(col("__v"), col("__k")).as("__lv"),
          count(lit(1)).as("__cnt"))
      // boundary stitch over the bucket-count-sized frame: a run that
      // spans two adjacent non-empty buckets was counted twice
      val wb = Window.orderBy(col("__b").asc)
      val stitched = bucketStats
        .withColumn("__dup",
          when(lag(col("__lv"), 1).over(wb) <=> col("__fv"), 1L)
            .otherwise(0L))
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(col("__runs") - col("__dup")), lit(0L)).as("n_runs"))
      val distinct = base.agg(
        count_distinct(col("__v")).as("n_distinct"))
      stitched.crossJoin(broadcast(distinct)) // 1-row scalar side
        .select(lit(c).as("column"), col("n_rows"), col("n_runs"),
          when(col("n_runs") > 0,
            round(col("n_rows").cast("double") /
              col("n_runs").cast("double"), 6)).as("avg_run_len"),
          col("n_distinct"))
    }
    per.reduce(_ unionByName _).orderBy(col("column"))
  }
}
