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

  /**
   * P78 — sequential funnel: for each key, the greedy earliest timestamp
   * chain through `steps` — t₁ = min ts of step 1, tₖ = min ts of step k
   * STRICTLY AFTER tₖ₋₁ — the ordered-subsequence match every product /
   * conversion analysis runs, and (in a training-data pipeline) the
   * session-trajectory filter ("users who actually completed X before
   * Y"). Returns one row per key that reached step 1:
   * (key, t_<step1>.., t_<stepK>.., funnel_depth), later steps null once
   * the chain breaks; greedy-earliest is the standard funnel semantics
   * and deterministic (mins only).
   *
   * Scale shape: step 1 is one keyed aggregation; each later step is a
   * left join back to the (pre-filtered, tiny-per-step) event stream plus
   * a re-aggregation — k−1 extra shuffles for a k-step funnel, all on the
   * key column, no windows over whole histories, no per-key collects.
   * Step names must be distinct (a repeated step would need rank-aware
   * matching, not min-chaining).
   */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel: steps must be distinct, got $steps")
    def tcol(s: String) = s"t_$s"
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol).as("key"))
      .agg(min(col(tsCol)).as(tcol(steps.head)))
    var prev = tcol(steps.head)
    for (s <- steps.tail) {
      val e = events.where(col(typeCol) === s)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
      val carried = acc.columns.toSeq
      acc = acc.join(e, col("key") === col("__k") && col("__ts") > col(prev), "left")
        .groupBy(carried.map(col): _*)
        .agg(min(col("__ts")).as(tcol(s)))
      prev = tcol(s)
    }
    // deepest-first chained CASE; step 1 is always non-null for emitted
    // rows, so the chain is total without an otherwise
    val branches = steps.zipWithIndex.reverse
    var depth = when(col(tcol(branches.head._1)).isNotNull,
      lit(branches.head._2 + 1))
    for ((s, i) <- branches.tail)
      depth = depth.when(col(tcol(s)).isNotNull, lit(i + 1))
    acc.withColumn("funnel_depth", depth.cast("int"))
  }

  /**
   * P93 — truncated adjusted EWMA per key: the exponentially-weighted
   * mean over each row's trailing `lookback` observations in
   * (ts, tie) order,
   *
   *   ewma_i = Σ_{l<L} (1−α)^l·x_{i−l} / Σ_{l<L, present} (1−α)^l
   *
   * (pandas `ewm(adjust=True)` truncated at L) — the smoothed-signal
   * feature behind trend/novelty detection over event streams. The
   * recursive form s_i = α·x_i + (1−α)·s_{i−1} carries unbounded
   * history — un-expressible as a bounded window and numerically
   * explosive in its prefix-sum rewriting ((1−α)^{−i} overflows) — so
   * the bounded-lookback form IS the scale-safe semantics, with the
   * truncation error ≤ (1−α)^L of the oldest mass.
   *
   * Engine portability: the L weights are computed ONCE on the driver
   * and embedded as literals in the plan (and, via
   * [[ewmaWeightLiterals]], in an oracle's SQL text — a shortest
   * round-trip double literal parses back to the identical double
   * everywhere), so neither engine ever calls pow(); the weighted sum is
   * an explicit left-to-right chain of ≤L fused multiply-adds on
   * identical operands. One window shuffle keyed by `keyCol` for the
   * whole feature; early rows (rank < L) renormalize over the present
   * terms only.
   */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double, lookback: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"ewma: alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"ewma: lookback must be >= 1, got $lookback")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val weights = ewmaWeights(alpha, lookback)
    val terms = weights.zipWithIndex.map { case (wl, l) =>
      val xl = if (l == 0) col(valueCol) else lag(col(valueCol), l).over(w)
      (when(xl.isNotNull, lit(wl) * xl).otherwise(lit(0.0)),
        when(xl.isNotNull, lit(wl)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma",
      when(den > 0, round(num / den, 6)))
  }

  /** The (1−α)^l weight ladder shared by [[ewma]] and its oracles. */
  def ewmaWeights(alpha: Double, lookback: Int): Seq[Double] =
    (0 until lookback).map(l => math.pow(1.0 - alpha, l))

  /** The same ladder as SQL double literals (shortest round-trip repr,
    * e0-suffixed when bare — DuckDB parses bare decimals as DECIMAL). */
  def ewmaWeightLiterals(alpha: Double, lookback: Int): Seq[String] =
    ewmaWeights(alpha, lookback).map { d =>
      val s = d.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }

  /**
   * P80 — cohort retention matrix: keys are cohorted by the calendar
   * bucket of their FIRST event (bucket = epoch-micros div
   * `bucketMicros`), and each (cohort, offset) cell counts the distinct
   * keys active `offset` buckets after their cohort bucket — the
   * retention triangle every growth/engagement analysis reads, and (for
   * training data) the activity decay curve behind user-lifetime
   * sampling weights. Returns (cohort, bucket_offset, n_active,
   * n_cohort, retention) with retention = n_active/n_cohort rounded at
   * 6 decimals; offset 0 always exists with n_active = n_cohort.
   *
   * Scale shape: one keyed agg for first-events, a shuffle_hash join
   * back on the key (the post-agg side has no stats — without the hint
   * the planner falls back to sort-merge, the d11 lesson; broadcast
   * would be wrong at 10⁹ keys), a distinct on (cohort, offset, key)
   * and its re-agg — all keyed shuffles, no windows over whole
   * histories. Cohort sizes are bounded by the observed time range over
   * `bucketMicros` (hundreds, by design), so THAT side broadcasts
   * explicitly. Calendar-aligned offsets (bucket(ts) − bucket(first)),
   * the standard cohort semantics.
   */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1L,
      s"cohortRetention: bucketMicros must be >= 1, got $bucketMicros")
    // `div` keeps exact longs (epoch micros ~1.7e15 are double-safe, but
    // stay integral on principle — the Graft.events() nanos lesson)
    val byKey = events.select(col(keyCol).as("key"),
      expr(s"unix_micros(`$tsCol`) div ${bucketMicros}L").as("b"))
    val first = byKey.groupBy("key").agg(min(col("b")).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    byKey
      .join(first.hint("shuffle_hash"), Seq("key"))
      .select(col("cohort"), (col("b") - col("cohort")).as("bucket_offset"),
        col("key"))
      .distinct()
      .groupBy(col("cohort"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("n_cohort"), 6))
  }

  /**
   * P100 — top-k frequent event paths: the most common length-`n`
   * consecutive event-type sequences across all keys' (ts, tie)-ordered
   * histories — the path-mining generalization of the P81 bigram
   * transition matrix (n = 2 reproduces its counts), used for journey
   * analysis and, in a training pipeline, trajectory-template discovery
   * before sequence filtering. Returns (path_0..path_{n−1}, cnt, rank),
   * the top `k` by count with the full path tuple as the deterministic
   * tie-break.
   *
   * Shape: ONE keyed window shuffle for the n−1 leads (same partitioning
   * as the sessionizer), a map-side-combinable path agg bounded by
   * |types|ⁿ cells, and a TakeOrderedAndProject top-k — never a full
   * sort. Sequences shorter than n at a key's tail contribute nothing
   * (their leads are null).
   */
  def topPaths(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"topPaths: n must be >= 2, got $n")
    require(k >= 1, s"topPaths: k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val paths = (0 until n).map { i =>
      val c = if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w)
      c.as(s"path_$i")
    }
    val pathCols = (0 until n).map(i => col(s"path_$i"))
    val scored = events.select(paths: _*)
      .where(pathCols.map(_.isNotNull).reduce(_ && _))
      .groupBy(pathCols: _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc +: pathCols.map(_.asc): _*)
      .limit(k)
    val rankW = Window.orderBy(col("cnt").desc +: pathCols.map(_.asc): _*)
    scored.withColumn("rank", row_number().over(rankW))
  }

  /**
   * P95 — Kaplan–Meier survival estimator per group: from one row per
   * subject (group, time-to-event, observed-flag), the product-limit
   * curve S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over the distinct OBSERVED event
   * times, with nᵢ = subjects still at risk (time ≥ tᵢ, censored
   * subjects leave the risk set at their censoring time and create no
   * step) — churn/retention curves, and in a training pipeline the
   * label-horizon analysis behind survival-aware sampling. Returns
   * (group, time, n_event, at_risk, survival).
   *
   * Shape: one keyed agg onto the (group, time) grid, three windows over
   * the SAME group partitioning (total, removed-before, cumulative), no
   * joins; grid size is bounded by distinct times per group, not
   * subjects. Engine portability: the cumulative product runs as
   * exp(Σ ln) with each ln(1 − d/n) ROUNDED AT 9 and DECIMAL-summed (the
   * libm firewall — a bare double cumprod would compound 1-ulp libm
   * differences), and a d = n step clamps the factor at 2⁻⁵⁶ (ln 0
   * otherwise; survival rounds to 0 at 6 decimals, the true value).
   */
  def kaplanMeier(df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val grid = df.groupBy(col(groupCol), col(timeCol))
      .agg(sum(col(eventCol).cast("long")).as("n_event"),
        count(lit(1)).as("n_total"))
    val wAll = Window.partitionBy(col(groupCol))
    val wBefore = Window.partitionBy(col(groupCol)).orderBy(col(timeCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(timeCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val f = lit(1.0) - col("n_event").cast("double") / col("at_risk").cast("double")
    grid
      .withColumn("at_risk",
        sum(col("n_total")).over(wAll) -
          coalesce(sum(col("n_total")).over(wBefore), lit(0L)))
      .where(col("n_event") > 0)
      .withColumn("__lf",
        round(log(greatest(f, lit(math.pow(2.0, -56)))), 9).cast("decimal(28,9)"))
      .withColumn("survival",
        round(exp(sum(col("__lf")).over(wCum).cast("double")), 6))
      .drop("__lf", "n_total")
  }

  /**
   * P81 — first-order Markov transition matrix over per-key event
   * sequences: count every adjacent (state → next state) pair in each
   * key's (ts, tie)-ordered history and emit row-normalized transition
   * probabilities — the session-path model behind next-action
   * prediction, trajectory filtering ("drop bot-like loops"), and
   * synthetic-sequence generation. Returns (from_type, to_type, cnt,
   * n_from, prob) with prob = cnt/n_from rounded at 6 decimals;
   * sequence-final events have no successor and contribute nothing.
   *
   * Scale shape: ONE keyed window shuffle for the lead (per-key
   * histories, the sessionizer's partitioning), then a (from, to) agg
   * that map-side combines to ≤ |states|² cells per partition, then a
   * window over the tiny agged frame for row totals. The tiebreaker
   * makes the order total — equal timestamps otherwise leave `lead`
   * partition-order-dependent (the as-of tie discipline).
   */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val rows = Window.partitionBy(col("from_type"))
    events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_from", sum(col("cnt")).over(rows))
      .withColumn("prob",
        round(col("cnt").cast("double") / col("n_from"), 6))
  }
}
