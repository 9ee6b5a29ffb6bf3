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

  /**
   * P82 — group-wise winsorization: clamp `valueCol` into its group's
   * [pLo, pHi] exact R-7 percentile band — the outlier treatment that
   * keeps a row (unlike trimming) while bounding its leverage, standard
   * before scale-sensitive feature transforms. Adds `lo`/`hi` (the band,
   * rounded at 4), `winsorized` (the clamped value, rounded at 4) and
   * `clipped` (raw value outside the raw band).
   *
   * Shapes: ONE percentile aggregate per group builds each band (the o5
   * sorted-buffer-once idiom), joined back on the group key with a
   * shuffle_hash hint (post-agg side has no stats — without the hint the
   * planner falls back to sort-merge, the d11 lesson; broadcast would be
   * wrong at high group cardinality). Exact percentile holds a group's
   * values in memory — at 100 TB swap in approx_percentile, same shape.
   * Cross-engine: both engines interpolate R-7 on identical operands;
   * boundary flags compare data points against a bound that is either an
   * exact order statistic or strictly between two distinct ones, so ulp
   * slack cannot flip `clipped` (outputs still round at 4).
   */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val bands = df
      .groupBy(col(keyCol))
      .agg(expr(s"percentile(`$valueCol`, array($pLo, $pHi))").as("__p"))
      .select(col(keyCol), element_at(col("__p"), 1).as("__lo"),
        element_at(col("__p"), 2).as("__hi"))
    df.join(bands.hint("shuffle_hash"), Seq(keyCol))
      .withColumn("lo", round(col("__lo"), 4))
      .withColumn("hi", round(col("__hi"), 4))
      .withColumn("winsorized",
        round(least(greatest(col(valueCol), col("__lo")), col("__hi")), 4))
      .withColumn("clipped",
        col(valueCol) < col("__lo") || col(valueCol) > col("__hi"))
      .drop("__lo", "__hi")
  }

  /**
   * P86 — quantile-bucket scoring: each value column gains an
   * `<col>_score` in 1..`buckets`, 1 + the number of corpus-wide R-7
   * quantile cutoffs the value strictly exceeds — the RFM-style scoring
   * rule, and the scale-safe alternative to `ntile`: a global ntile
   * needs a TOTAL order (one-partition window), while cutoff comparison
   * is one tiny aggregate row broadcast into a pure projection. Ties at
   * a cutoff all land in the lower bucket (deterministic, unlike
   * ntile's arbitrary split of ties across buckets); nulls score 1.
   *
   * Cross-engine: cutoffs are interpolated on identical sorted operands
   * (the o9 winsorize argument — a cutoff is an exact order statistic or
   * strictly between two distinct ones, so ulp slack cannot flip a
   * strict comparison against a data point).
   */
  def quantileScores(df: DataFrame, valueCols: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"quantileScores: buckets must be >= 2, got $buckets")
    require(valueCols.nonEmpty, "quantileScores: at least one value column")
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val aggs = valueCols.map(c =>
      expr(s"percentile(`$c`, array(${fracs.mkString(", ")}))").as(s"__q_$c"))
    val cutoffs = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.join(broadcast(cutoffs)) // 1-row scalar side
    valueCols.foldLeft(joined) { (acc, c) =>
      val score = fracs.indices
        .map(i => when(col(c) > element_at(col(s"__q_$c"), i + 1), 1)
          .otherwise(0))
        .reduce(_ + _) + lit(1)
      acc.withColumn(s"${c}_score", score.cast("int"))
    }.drop(valueCols.map(c => s"__q_$c"): _*)
  }

  /**
   * P90 — per-group simple linear regression (OLS y = a + b·x): slope,
   * intercept and r² from the five moment sums — the per-segment trend
   * fit behind drift monitoring ("is this domain's quality decaying over
   * time?") and millions-of-groups feature extraction, where one keyed
   * aggregation replaces a per-group model fit. Returns one row per
   * group: (key, n, slope, intercept, r2) rounded at 6; groups with
   * constant x (or n = 1) have no defined fit → null slope/intercept/r2,
   * and constant-y groups pin r2 null (0/0).
   *
   * Engine portability: x and y are cast to DECIMAL(18,6) FIRST (exact
   * for any ≤6-decimal input, and the double→decimal cast at low scale
   * cannot hit the shortest-string-vs-binary tie zone that full-
   * precision products would), so all five sums are exact decimal
   * arithmetic; the closed-form solution is then a fixed sequence of
   * double ops on identical operands. One map-side-combinable groupBy —
   * no window, no join.
   */
  def olsFit(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dx = col(xCol).cast("decimal(18,6)")
    val dy = col(yCol).cast("decimal(18,6)")
    // a row missing either coordinate is no observation at all — without
    // this filter the five sums would disagree on which rows they cover
    val sums = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(dx).cast("double").as("__sx"),
        sum(dy).cast("double").as("__sy"),
        sum(dx * dy).cast("double").as("__sxy"),
        sum(dx * dx).cast("double").as("__sxx"),
        sum(dy * dy).cast("double").as("__syy"))
    val nd = col("n").cast("double")
    val num = nd * col("__sxy") - col("__sx") * col("__sy")
    val den = nd * col("__sxx") - col("__sx") * col("__sx")
    val deny = nd * col("__syy") - col("__sy") * col("__sy")
    val slope = num / den
    sums
      .withColumn("slope", when(col("__sxx").isNotNull && den > 0,
        round(slope, 6)))
      .withColumn("intercept", when(col("__sxx").isNotNull && den > 0,
        round((col("__sy") - slope * col("__sx")) / nd, 6)))
      .withColumn("r2", when(col("__sxx").isNotNull && den > 0 && deny > 0,
        round(num * num / (den * deny), 6)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** The Benford expected first-digit masses log₁₀(1 + 1/d), d = 1..9 —
    * computed once here so the operator and any oracle generator embed
    * the IDENTICAL double literals (the EWMA weight-ladder rule). */
  val BenfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** A double as a DuckDB-typed SQL literal: shortest round-trip repr,
    * e0-suffixed when bare (a bare decimal literal parses as DECIMAL —
    * the r7 oracle gotcha). ONE definition for every oracle generator
    * that embeds driver-computed constants. */
  def sqlDoubleLiteral(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** [[BenfordP]] as SQL double literals. */
  def benfordPLiterals: Seq[String] = BenfordP.map(sqlDoubleLiteral)

  /**
   * P101 — Benford first-digit audit per group: the fraud/corruption
   * screen (and data-quality drift alarm) that compares each group's
   * leading-digit distribution against Benford's law. Input values must
   * be POSITIVE INTEGERS in their smallest unit (money → cents — the
   * caller converts exactly through DECIMAL); non-positive and null
   * rows are dropped. Returns a DENSIFIED (group, digit 1..9) grid:
   * n, total, share, benford_p, dev = |share − p|, and the group's
   * l1 distance Σ dev repeated per row — absent digits contribute their
   * full expected mass, so l1 is the true distance, not an
   * observed-digits approximation.
   *
   * Shape: the first digit is a 17-branch integer CASE chain (no
   * log10 — a float log at a decade boundary is exactly the kind of
   * knife-edge the firewall rules exist for), one map-side-combinable
   * (group, digit) agg, a groups × 9 generator grid, and windows over
   * that tiny grid. Portability: counts exact; share/dev are fixed
   * double sequences; the expected masses are [[BenfordP]] literals
   * embedded identically on both sides; l1 sums 9-rounded devs through
   * DECIMAL.
   */
  def benfordAudit(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    // 10^18 down to 10^1: v div the largest power of ten <= v
    val fd = (18 to 1 by -1).foldRight(v) { (p, rest) =>
      val pow = (1 to p).foldLeft(1L)((a, _) => a * 10) // exact integer 10^p
      when(v >= pow, expr(s"CAST(`$valueCol` AS BIGINT) div ${pow}L"))
        .otherwise(rest)
    }
    val counts = df
      .where(v.isNotNull && v > 0)
      .select(col(groupCol), fd.as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val grid = counts.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(1L), lit(9L))).as("digit"))
    val p = (1 to 8).foldRight(lit(BenfordP(8)): Column) { (d, rest) =>
      when(col("digit") === d, lit(BenfordP(d - 1))).otherwise(rest)
    }
    val wg = Window.partitionBy(col(groupCol))
    val shareRaw = col("n").cast("double") / col("total").cast("double")
    grid.join(counts.hint("shuffle_hash"), Seq(groupCol, "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total", sum(col("n")).over(wg))
      .withColumn("benford_p", p)
      .withColumn("__dev", abs(shareRaw - col("benford_p")))
      .withColumn("share", round(shareRaw, 6))
      .withColumn("dev", round(col("__dev"), 6))
      .withColumn("l1",
        round(sum(round(col("__dev"), 9).cast("decimal(28,9)")).over(wg)
          .cast("double"), 6))
      .drop("__dev")
  }

  /** The Benford SECOND-digit masses Σ_k log₁₀(1 + 1/(10k+d)), d = 0..9
    * — computed once here so operator and oracle embed IDENTICAL double
    * literals (the [[BenfordP]] rule). */
  val BenfordP2: Seq[Double] = (0 to 9).map(d =>
    (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum)

  /** [[BenfordP2]] as SQL double literals. */
  def benfordP2Literals: Seq[String] = BenfordP2.map(sqlDoubleLiteral)

  /**
   * P336 — Benford SECOND-digit audit per group: the second significant
   * digit's distribution against Σ_k log₁₀(1+1/(10k+d)) — the follow-up
   * screen after P101's first-digit test (fabricators who learn to fake
   * the first digit almost never fake the second; it is also the
   * sharper test on unit-priced data where the first digit is
   * range-constrained). Values below 10 have no second digit and drop.
   * Same densified (group, digit 0..9) grid, same l1 distance.
   *
   * Shape/portability: the [[benfordAudit]] recipe — a 17-branch
   * integer CASE chain extracts the digit (no log10 at runtime),
   * counts exact, shares fixed double sequences, expected masses
   * [[BenfordP2]] driver literals, l1 sums 9-rounded devs through
   * DECIMAL(28,9).
   */
  def benfordSecondDigit(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    // for v in [10^p, 10^(p+1)): second digit = (v div 10^(p-1)) mod 10;
    // v < 10 → null → dropped
    val sd = (18 to 1 by -1).foldRight(lit(null).cast("long")) { (p, rest) =>
      val pow = (1 to p).foldLeft(1L)((a, _) => a * 10)
      val powPrev = pow / 10
      when(v >= pow,
        expr(s"(CAST(`$valueCol` AS BIGINT) div ${powPrev}L) % 10"))
        .otherwise(rest)
    }
    val counts = df
      .where(v.isNotNull && v >= 10)
      .select(col(groupCol), sd.as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val grid = counts.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0L), lit(9L))).as("digit"))
    val p = (0 to 8).foldRight(lit(BenfordP2(9)): Column) { (d, rest) =>
      when(col("digit") === d, lit(BenfordP2(d))).otherwise(rest)
    }
    val wg = Window.partitionBy(col(groupCol))
    val shareRaw = col("n").cast("double") / col("total").cast("double")
    grid.join(counts.hint("shuffle_hash"), Seq(groupCol, "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total", sum(col("n")).over(wg))
      .withColumn("benford_p", p)
      .withColumn("__dev", abs(shareRaw - col("benford_p")))
      .withColumn("share", round(shareRaw, 6))
      .withColumn("dev", round(col("__dev"), 6))
      .withColumn("l1",
        round(sum(round(col("__dev"), 9).cast("decimal(28,9)")).over(wg)
          .cast("double"), 6))
      .drop("__dev")
  }

  /**
   * P97 — χ² test of independence between two categorical columns: the
   * contingency-cell frame with observed counts, expected counts under
   * independence (row·col/N), per-cell contributions (o−e)²/e, and the
   * table-level statistic + degrees of freedom repeated on every row —
   * the drift/association audit a data pipeline runs between a feature
   * and a label (or a source and a quality tier) before training.
   *
   * Shape: ONE map-side-combinable (a, b) count agg; margins and the
   * statistic come from windows over the CELL frame (bounded by
   * |A|·|B|, not rows), and the distinct-level counts for dof are one
   * tiny agg broadcast back. Engine portability: o, margins and N are
   * exact BIGINTs; e and each contribution are fixed double sequences on
   * them; χ² sums the contributions ROUNDED AT 9 through DECIMAL (the
   * libm-free cousin of the survival firewall — double summation order
   * would otherwise differ). Null categories form their own level (SQL
   * grouping semantics — conservative, like the privacy gates).
   */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("o"))
    val wa = Window.partitionBy(col(aCol))
    val wb = Window.partitionBy(col(bCol))
    val wAll = Window.partitionBy()
    val levels = cells.agg(
      countDistinct(col(aCol)).as("__ra"), countDistinct(col(bCol)).as("__cb"))
    val e = col("row_n").cast("double") * col("col_n").cast("double") /
      col("n").cast("double")
    cells
      .withColumn("row_n", sum(col("o")).over(wa))
      .withColumn("col_n", sum(col("o")).over(wb))
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("expected", e)
      .withColumn("__contrib",
        round((col("o").cast("double") - col("expected")) *
          (col("o").cast("double") - col("expected")) / col("expected"), 9))
      .withColumn("chi2",
        round(sum(col("__contrib").cast("decimal(28,9)")).over(wAll)
          .cast("double"), 6))
      .crossJoin(broadcast(levels))
      .withColumn("dof", ((col("__ra") - 1) * (col("__cb") - 1)).cast("long"))
      .withColumn("contrib", round(col("__contrib"), 6))
      .withColumn("expected", round(col("expected"), 6))
      .drop("__contrib", "__ra", "__cb")
  }

  /**
   * P190 — Cramér's V association strength between two categoricals:
   * V = √(χ² / (n·min(r−1, c−1))) ∈ [0, 1] — the effect-size reading
   * [[chiSquare]]'s p-value-shaped χ² cannot give (χ² grows with n;
   * V answers "is the association MATERIAL", the feature-selection and
   * redundant-column screen). One row: (n, dof, ra, cb, chi2, v);
   * a single-level side (min(r−1, c−1) = 0) → null v.
   *
   * Shape: the [[chiSquare]] cell frame (windows over |A|·|B| cells,
   * never rows) closed by ONE count-distinct agg; χ² arrives already
   * 6-rounded, the closing √ is IEEE-exact on identical operands,
   * v rounds at 6.
   */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chiSquare(df, aCol, bCol)
    cells.agg(
        max(col("n")).as("n"), max(col("dof")).as("dof"),
        countDistinct(col(aCol)).as("ra"), countDistinct(col(bCol)).as("cb"),
        max(col("chi2")).as("chi2"))
      .withColumn("v",
        when(least(col("ra"), col("cb")) > 1,
          round(sqrt(col("chi2") /
            (col("n") * (least(col("ra"), col("cb")) - 1)).cast("double")), 6)))
  }

  /** Cumulative Poisson(1) CDF ladder c_j = e^{-1}·Σ_{i=0..j} 1/i!,
    * j = 0..maxDraw−1 — computed ONCE on the driver and embedded as
    * literals on both sides (the o12 ladder idiom: neither engine calls
    * exp), shared by [[bootstrapMeanCI]] and its oracles. */
  def poissonCdf(maxDraw: Int): Seq[Double] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 until maxDraw).map { j =>
      if (j > 0) fact *= j
      cum += e1 / fact
      cum
    }
  }

  /** The same ladder as SQL double literals (shortest round-trip repr,
    * e0-suffixed when bare — DuckDB parses bare decimals as DECIMAL). */
  def poissonCdfLiterals(maxDraw: Int): Seq[String] =
    poissonCdf(maxDraw).map { d =>
      val s = d.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }

  /**
   * P191 — Poisson-bootstrap confidence interval for a mean: each of
   * `resamples` deterministic resamples gives every row multiplicity
   * k ~ Poisson(1) (the classic streaming bootstrap — k is a pure
   * function of (resample, id) via the portable hash, so NO resample
   * materializes and a re-run reproduces bit-identically), the CI is
   * the [loPct, hiPct] percentile band of the resample means — error
   * bars for any corpus statistic WITHOUT distributional assumptions,
   * the honesty metric for "is this week's mean move real". One row:
   * (n_rows, mean_full, n_resamples, ci_lo, ci_hi).
   *
   * Shapes: one broadcast cross join against the `resamples`-row grid
   * (the adjudicated k-row class — cost scales linearly in B, map-side
   * combine collapses the shuffle to B rows), one B-group agg, one
   * closing percentile agg over the B-row frame. Cross-engine: k counts
   * thresholds from the shared [[poissonCdf]] literal ladder against
   * the replayable uniform; resample means are Σk·v/Σk with DECIMAL
   * sums, rounded at 6; percentiles are R-7 on 6-rounded means (the
   * o5/P173 parity class).
   */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      resamples: Int = 32, maxDraw: Int = 5,
      loPct: Double = 2.5, hiPct: Double = 97.5): DataFrame = {
    require(resamples >= 2,
      s"bootstrapMeanCI: resamples must be >= 2, got $resamples")
    require(maxDraw >= 2,
      s"bootstrapMeanCI: maxDraw must be >= 2, got $maxDraw")
    require(loPct > 0 && hiPct < 100 && loPct < hiPct,
      s"bootstrapMeanCI: need 0 < loPct < hiPct < 100, got ($loPct, $hiPct)")
    // the resample grid multiplies the md5 draw per (row, replica) on the
    // map side — fan a below-parallelism input out first (no-op at scale)
    val base = graft.Graft.parallelizeMap(df)
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), col(valueCol).as("__v"))
    val grid = df.sparkSession
      .createDataFrame((0 until resamples).map(Tuple1(_))).toDF("b")
    val u = Sampling.uniform01(
      concat(col("b").cast("string"), lit(":"), col("__id").cast("string")),
      "boot:")
    val k = poissonCdf(maxDraw).map(c => when(u > c, 1L).otherwise(0L))
      .reduce(_ + _)
    val res = base.crossJoin(broadcast(grid))
      .withColumn("__k", k)
      .groupBy(col("b"))
      .agg(sum(col("__k")).as("__m"),
        sum((col("__v").cast("decimal(18,6)") * col("__k"))
          .cast("decimal(28,6)")).as("__sw"))
      .where(col("__m") > 0) // an all-zero draw (P ≈ e^{-n}) just drops
      .withColumn("__mean",
        round(col("__sw").cast("double") / col("__m").cast("double"), 6))
    val full = base.agg(count(lit(1)).as("n_rows"),
      round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("mean_full"))
    res.agg(count(lit(1)).as("n_resamples"),
        round(expr(s"percentile(__mean, ${loPct / 100})"), 6).as("ci_lo"),
        round(expr(s"percentile(__mean, ${hiPct / 100})"), 6).as("ci_hi"))
      .crossJoin(broadcast(full)) // 1-row scalar side
      .select(col("n_rows"), col("mean_full"), col("n_resamples"),
        col("ci_lo"), col("ci_hi"))
  }

  /**
   * P196 — Tukey boxplot fences per group: Q1/Q3 (exact R-7
   * percentiles), IQR, the k·IQR whiskers and the count of points
   * beyond each — the classic distribution-shape outlier screen read
   * beside P87's MAD (which assumes symmetry around the median; Tukey's
   * quartile frame tolerates skew). Emits (key, n, q1, q3, iqr, lo, hi,
   * n_low, n_high).
   *
   * Shapes: one percentile agg per key (exact — keeps a group's values
   * in memory, the o5 caveat: at 100 TB switch to approx_percentile),
   * fences joined back shuffle_hash, one conditional count agg.
   * Cross-engine: quantiles round at 4 (the o5 interpolation-slack
   * rule); the fence arithmetic then runs ENTIRELY in DECIMAL on the
   * 4-rounded quartiles (a double round of `q1 − 1.5·iqr` sat on a
   * half-ulp boundary on real data — the gr1 shortest-string vs
   * exact-binary rounding split; exact decimals cannot), `k` read at 4
   * decimals; the comparisons read raw values against the identical
   * fence doubles.
   */
  def tukeyFences(df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k > 0, s"tukeyFences: k must be > 0, got $k")
    val kd = lit(new java.math.BigDecimal(k)
      .setScale(4, java.math.RoundingMode.HALF_UP))
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val fences = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(__v, 0.25)"), 4).as("q1"),
        round(expr("percentile(__v, 0.75)"), 4).as("q3"))
      .withColumn("__q1d", col("q1").cast("decimal(18,4)"))
      .withColumn("__q3d", col("q3").cast("decimal(18,4)"))
      .withColumn("__iqrd", col("__q3d") - col("__q1d"))
      .withColumn("iqr", col("__iqrd").cast("double"))
      .withColumn("lo", (col("__q1d") - kd * col("__iqrd")).cast("double"))
      .withColumn("hi", (col("__q3d") + kd * col("__iqrd")).cast("double"))
      .drop("__q1d", "__q3d", "__iqrd")
    base.join(fences.hint("shuffle_hash"), Seq("__k"))
      .groupBy(col("__k"), col("n"), col("q1"), col("q3"), col("iqr"),
        col("lo"), col("hi"))
      .agg(sum(when(col("__v") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("__v") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * P199 — Jarque–Bera normality test per group: skewness g₁ = m₃/m₂^1.5,
   * excess kurtosis g₂ = m₄/m₂² − 3 and JB = n/6·(g₁² + g₂²/4), read
   * against the χ²₂ 95% bar (5.99) — "can I use the t-test / z-score
   * machinery on this column, or is it skewed/heavy-tailed" (the
   * distribution-shape triage before P148/P125; a heavy tail says use
   * P102's ranks instead). Emits (key, n, skewness, kurtosis_ex, jb,
   * normal_ish); constant groups (m₂ = 0) → nulls.
   *
   * Shapes: one keyed mean agg joined back shuffle_hash, one fused
   * moment agg — no windows. Cross-engine: values are read at 6
   * decimals and the deviation d = v₆ − mean₆ computed and 3-rounded
   * ENTIRELY in DECIMAL (rounding the double difference at 3 sits on
   * half-up boundaries for decimal-ish data — the o46 lesson — while
   * decimal rounding is exact-value HALF_UP in both engines), then
   * scales to an EXACT integer w = d₃·10³ ≤ ~10⁶, so m₂ sums in
   * BIGINT and m₃/m₄ as DECIMAL(38,0) integer products built as w²·w
   * and w²·w² from the 19-digit cast (both factors ≤ 19 digits — a
   * wider chain would pass Spark but exceed DuckDB's 38-digit
   * multiply); the normalized ratios are scale-free, so no descaling.
   * Closing sequence is fixed doubles with one IEEE sqrt, rounded at 6.
   */
  def jarqueBera(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val means = base.groupBy(col("__k"))
      .agg(round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("__mean"))
    val w = (round(col("__v").cast("decimal(18,6)") -
      col("__mean").cast("decimal(18,6)"), 3) * 1000).cast("long")
    val w19 = col("__w").cast("decimal(19,0)")
    val w2d = (col("__w") * col("__w")).cast("decimal(19,0)")
    val m = base.join(means.hint("shuffle_hash"), Seq("__k"))
      .withColumn("__w", w)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__w") * col("__w")).as("__s2"),
        sum(w2d * w19).as("__s3"),
        sum(w2d * w2d).as("__s4"))
    val nd = col("n").cast("double")
    val m2 = col("__s2").cast("double") / nd
    val m3 = col("__s3").cast("double") / nd
    val m4 = col("__s4").cast("double") / nd
    val skew = m3 / (m2 * sqrt(m2))
    val kurtEx = m4 / (m2 * m2) - lit(3.0)
    m.withColumn("skewness", when(col("__s2") > 0, round(skew, 6)))
      .withColumn("kurtosis_ex", when(col("__s2") > 0, round(kurtEx, 6)))
      .withColumn("jb",
        when(col("__s2") > 0,
          round(nd / lit(6.0) *
            (skew * skew + kurtEx * kurtEx / lit(4.0)), 6)))
      .withColumn("normal_ish",
        when(col("jb").isNull, lit(null).cast("boolean"))
          .otherwise(col("jb") < 5.99))
      .drop("__s2", "__s3", "__s4")
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * P210 — trimmed & winsorized means per group: the p/(1−p) quantile
   * bounds, the mean over only in-bounds rows (trimmed) and the mean
   * with out-of-bounds rows CLAMPED to the bounds (winsorized) — the
   * robust location estimates beside the raw mean, read together ("the
   * mean moved 12% but the trimmed mean 1% ⇒ it's the tail"). The
   * AGGREGATE complement to P82's row-level winsorize transform. Emits
   * (key, n, lo_bound, hi_bound, n_trimmed, mean_raw, mean_trimmed,
   * mean_winsor); an all-out-of-bounds group nulls mean_trimmed.
   *
   * Shapes: one percentile agg per key (the o5 class), bounds joined
   * back shuffle_hash, one fused conditional decimal agg. Cross-engine:
   * bounds round at 4 (the o5 rule), raw values compare against those
   * identical doubles, clamped values cast DECIMAL(18,6) before
   * summing, means round at 6.
   */
  def trimmedMeans(df: DataFrame, keyCol: String, valueCol: String,
      trimPct: Int = 10): DataFrame = {
    require(trimPct >= 1 && trimPct <= 49,
      s"trimmedMeans: trimPct must be in 1..49, got $trimPct")
    val p = trimPct / 100.0
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val bounds = base.groupBy(col("__k"))
      .agg(round(expr(s"percentile(__v, $p)"), 4).as("lo_bound"),
        round(expr(s"percentile(__v, ${1.0 - p})"), 4).as("hi_bound"))
    val inB = col("__v") >= col("lo_bound") && col("__v") <= col("hi_bound")
    val clamped = least(greatest(col("__v"), col("lo_bound")),
      col("hi_bound"))
    base.join(bounds.hint("shuffle_hash"), Seq("__k"))
      .groupBy(col("__k"), col("lo_bound"), col("hi_bound"))
      .agg(count(lit(1)).as("n"),
        sum(when(inB, 1L).otherwise(0L)).as("n_trimmed"),
        round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_raw"),
        round(sum(when(inB, col("__v").cast("decimal(18,6)")))
          .cast("double") /
          sum(when(inB, 1L).otherwise(0L)).cast("double"), 6)
          .as("mean_trimmed"),
        round(sum(clamped.cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_winsor"))
      .select(col("__k").as(keyCol), col("n"), col("lo_bound"),
        col("hi_bound"), col("n_trimmed"), col("mean_raw"),
        col("mean_trimmed"), col("mean_winsor"))
  }

  /**
   * P211 — Theil T inequality index per group:
   * T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) over POSITIVE values — the
   * decomposable concentration measure beside P147's Gini (Theil is
   * additive across subgroups, which is why monitoring stacks report
   * it per segment): 0 = perfectly even, ln(n) = one row holds
   * everything. Emits (key, n, mu, theil, theil_norm) with theil_norm
   * = T/ln(n) ∈ [0,1]; non-positive rows are excluded (T is undefined
   * there — documented), singleton groups null the normalized form.
   *
   * Shapes: one keyed mean agg joined back shuffle_hash, one fused
   * decimal agg. Cross-engine: μ is the 6-rounded decimal mean, each
   * term rounds the ln at 9 and the product at 9, DECIMAL-sums (the
   * libm firewall), T rounds at 6; ln(n) rounds at 9 before the
   * normalization division.
   */
  def theilIndex(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(valueCol) > 0)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val means = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mu"))
    val ratio = col("__v") / col("mu")
    base.join(means.hint("shuffle_hash"), Seq("__k"))
      .withColumn("__t",
        round(ratio * round(log(ratio), 9), 9).cast("decimal(28,9)"))
      .groupBy(col("__k"), col("n"), col("mu"))
      .agg(round((sum(col("__t")).cast("double") /
        col("n").cast("double")), 6).as("theil"))
      .withColumn("theil_norm",
        when(col("n") > 1,
          round(col("theil") / round(log(col("n").cast("double")), 9), 6)))
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * P212 — Benjamini–Hochberg FDR control: given a frame of per-unit
   * p-values, the step-up adjusted q-values
   * q_i = min_{j ≥ i} (p_j·n/j) clamped at 1 and the reject set at
   * `alphaPct`% — THE multiple-testing correction for "we ran the
   * P97/P148/P171/P181 tests across 500 segments and 30 lit up" (at
   * α = 5%, 25 of those are expected false positives without this).
   * Emits (id, p, rank, q, reject); corrupt p outside [0, 1] raises
   * loudly (the tokenBudget guard discipline).
   *
   * Shape: one rank window + one suffix-min window over the TESTS
   * frame — global-order windows, but the frame is tests (segments ×
   * metrics), not rows: agg-sized at any corpus scale (the o13 class).
   * Cross-engine: raw adjustments round at 9 on exact rank/n BIGINTs;
   * `reject` reads the rounded q.
   */
  def benjaminiHochberg(df: DataFrame, idCol: String, pCol: String,
      alphaPct: Int = 5, dependence: Boolean = false): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50,
      s"benjaminiHochberg: alphaPct must be in 1..50, got $alphaPct")
    val guarded = when(col(pCol) < 0 || col(pCol) > 1,
      raise_error(concat(lit("benjaminiHochberg: p outside [0,1] at "),
        col(idCol).cast("string"))).cast("double"))
      .otherwise(col(pCol).cast("double"))
    val base = df.where(col(idCol).isNotNull && col(pCol).isNotNull)
      .select(col(idCol).as("id"), guarded.as("p"))
    val nAgg = base.agg(count(lit(1)).as("__n"))
    // Benjamini–Yekutieli: the arbitrary-dependence correction c(n) =
    // Σ 1/i, harmonic terms through the 9-rounded DECIMAL firewall (a
    // tests-count-sized generate, never corpus-sized); c(n) = 1 for
    // plain BH — the factor column is absent entirely so the original
    // plan is untouched
    val scalars =
      if (!dependence) nAgg
      else nAgg
        .select(col("__n"), explode(sequence(lit(1L), col("__n")))
          .as("__i"))
        .groupBy(col("__n"))
        .agg(sum(round(lit(1.0) / col("__i").cast("double"), 9)
          .cast("decimal(28,9)")).cast("double").as("__c"))
    val wRank = Window.orderBy(col("p").asc, col("id").asc)
    val wMin = Window.orderBy(col("rank").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val raw =
      if (dependence)
        round(col("p") * col("__n").cast("double") * col("__c") /
          col("rank").cast("double"), 9)
      else
        round(col("p") * col("__n").cast("double") /
          col("rank").cast("double"), 9)
    base.crossJoin(broadcast(scalars)) // 1-row scalar side
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("__raw", raw)
      .withColumn("q", least(min(col("__raw")).over(wMin), lit(1.0)))
      .withColumn("reject", col("q") <= alphaPct / 100.0)
      .select(col("id").as(idCol), col("p"), col("rank"), col("q"),
        col("reject"))
  }

  /**
   * P102 — Mann–Whitney U rank-sum test between two groups of a value
   * column (normal approximation with tie correction): U from pooled
   * average ranks, z = (U_A − n_A·n_B/2) / σ with
   * σ² = (n_A·n_B/12)·((N+1) − Σ(t³−t)/(N(N−1))) — the distribution-
   * free A/B comparison for skewed metrics (revenue, latency) where the
   * t-test's normality assumption fails. Returns ONE row: (n_a, n_b,
   * r_a, u_a, u_b, z); all-tied data (σ = 0) pins z null.
   *
   * Shape: pooled ranking is one global-order window (the o5 exact-
   * statistic caveat: a rank TEST runs on a sample or a group slice, not
   * the raw 100 TB — at that scale bucket the values first); average
   * ranks are k or k.5 — exact in DECIMAL(28,1) — so the rank sum is
   * order-independent; the tie term Σ(t³−t) is exact BIGINT (t ≤ N
   * keeps t³ ≪ 2⁶² for any sane sample); the closing z is a fixed
   * double sequence with one IEEE-exact sqrt, rounded at 6.
   */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "mannWhitney: groups must differ")
    val g = col(groupCol).cast("string")
    val pool = df
      .where((g === groupA || g === groupB) && col(valueCol).isNotNull)
      .select(g.as("__g"), col(valueCol).as("__v"))
    val w = Window.orderBy(col("__v").asc)
    val tiesW = Window.partitionBy(col("__v"))
    // doubled average rank 2·minrank + (t−1) stays an exact BIGINT, so
    // the rank sum needs no decimal division (whose result type differs
    // between engines); r_a halves it once, in one double op
    val ranked = pool
      .withColumn("__minr", rank().over(w).cast("long"))
      .withColumn("__t", count(lit(1)).over(tiesW))
      .withColumn("__avgr2",
        lit(2L) * col("__minr") + col("__t") - lit(1L))
    val ties = pool.groupBy(col("__v"))
      .agg(count(lit(1)).as("__tt"))
      .agg(coalesce(sum(col("__tt") * col("__tt") * col("__tt") - col("__tt")),
        lit(0L)).as("__tie3"))
    val agg = ranked.agg(
      sum(when(col("__g") === groupA, lit(1L)).otherwise(lit(0L))).as("n_a"),
      sum(when(col("__g") === groupB, lit(1L)).otherwise(lit(0L))).as("n_b"),
      (sum(when(col("__g") === groupA, col("__avgr2")).otherwise(lit(0L)))
        .cast("double") / lit(2.0)).as("r_a"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = (col("n_a") + col("n_b")).cast("double")
    val ua = col("r_a") - (na * (na + lit(1.0)) / lit(2.0))
    val sigma2 = (na * nb / lit(12.0)) *
      ((nn + lit(1.0)) - col("__tie3").cast("double") /
        (nn * (nn - lit(1.0))))
    val sigma = sqrt(sigma2)
    agg.crossJoin(broadcast(ties))
      .withColumn("u_a", ua)
      .withColumn("u_b", na * nb - ua)
      .withColumn("z", when(sigma > 0,
        round((col("u_a") - na * nb / lit(2.0)) / sigma, 6)))
      .drop("__tie3")
  }

  /**
   * P381 — direct rate standardization: each group's event rate
   * re-weighted to the CORPUS-WIDE stratum mix —
   * std_rate_g = Σ_s (N_s/N)·(p_{g,s}/c_{g,s}) — so groups with
   * different compositions compare on a common footing (the
   * epidemiology age-adjustment move; in a data pipeline, the "is
   * nation X's conversion really higher, or does it just skew toward
   * the high-converting segment" question the crude rate conflates).
   * Emits per group: n, crude_rate, std_rate. A stratum absent from a
   * group contributes rate 0 (its true rate is unobservable — the
   * conservative convention, documented); the crude−std gap per group
   * is the composition effect.
   *
   * Shape: one stratum-reference agg + one (group, stratum) cell agg,
   * an equi-join on stratum, a 1-row total broadcast, one group fold.
   * Cross-engine: each weighted term (w·r on exact-integer-ratio
   * doubles) rounds at 9 and DECIMAL-sums; the two rates round at 6.
   */
  def directStandardization(df: DataFrame, groupCol: String,
      stratumCol: String, flagCol: String): DataFrame = {
    val base = df.where(col(groupCol).isNotNull &&
      col(stratumCol).isNotNull && col(flagCol).isNotNull)
    val ref = base.groupBy(col(stratumCol)).agg(count(lit(1)).as("__ns"))
    val tot = base.agg(count(lit(1)).as("__n"))
    val cells = base.groupBy(col(groupCol), col(stratumCol))
      .agg(count(lit(1)).as("__c"),
        sum(when(col(flagCol), 1L).otherwise(0L)).as("__p"))
    val term = round(
      (col("__ns").cast("double") / col("__n").cast("double")) *
        (col("__p").cast("double") / col("__c").cast("double")), 9)
      .cast("decimal(28,9)")
    cells.join(ref.hint("shuffle_hash"), Seq(stratumCol))
      .crossJoin(broadcast(tot)) // 1-row scalar side
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(col("__p")).as("__ptot"),
        sum(term).as("__std"))
      .select(col(groupCol), col("n"),
        round(col("__ptot").cast("double") / col("n").cast("double"), 6)
          .as("crude_rate"),
        round(col("__std").cast("double"), 6).as("std_rate"))
  }

  /**
   * P374 — Ansari–Bradley two-sample SCALE test: pooled values scored
   * by distance from the extremes (score = min(rank, N+1−rank) — both
   * tails score low, the middle high), statistic = group A's score sum.
   * A dispersion difference pushes the wider group's values into the
   * tails and its score sum DOWN, which is what [[mannWhitney]] (a
   * LOCATION test on the same ranks) cannot see: same-median
   * different-spread groups read z ≈ 0 there and loudly here. Normal
   * approximation with the classical null moments (parity-split N
   * even/odd forms); ties take mid-rank scores (the o15 doubled-rank
   * trick keeps them exact BIGINTs), null moments stay the classical
   * no-tie forms — the standard large-sample practice, documented.
   * Returns ONE row: (n_a, n_b, ab_stat, z, verdict).
   *
   * Shape: the o15 pooled-rank pass (one global-order window — the o5
   * exact-statistic caveat applies: run on a sample or group slice at
   * scale) + a 1-row pooled-count broadcast; doubled scores sum as
   * exact BIGINTs; the closing z is one fixed double chain from exact
   * integers with one IEEE sqrt, rounded at 6; verdict reads the
   * ROUNDED z against 1.96.
   */
  def ansariBradley(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "ansariBradley: groups must differ")
    val g = col(groupCol).cast("string")
    val pool = df
      .where((g === groupA || g === groupB) && col(valueCol).isNotNull)
      .select(g.as("__g"), col(valueCol).as("__v"))
    val w = Window.orderBy(col("__v").asc)
    val tiesW = Window.partitionBy(col("__v"))
    val nTot = pool.agg(count(lit(1)).as("__N"))
    // doubled mid-rank d = 2·minrank + t − 1; doubled AB score
    // min(d, 2(N+1) − d) stays an exact BIGINT
    val ranked = pool
      .withColumn("__minr", rank().over(w).cast("long"))
      .withColumn("__t", count(lit(1)).over(tiesW))
      .withColumn("__d", lit(2L) * col("__minr") + col("__t") - lit(1L))
      .crossJoin(broadcast(nTot))
      .withColumn("__a2",
        least(col("__d"), lit(2L) * (col("__N") + lit(1L)) - col("__d")))
    val agg = ranked.agg(
      sum(when(col("__g") === groupA, lit(1L)).otherwise(lit(0L))).as("n_a"),
      sum(when(col("__g") === groupB, lit(1L)).otherwise(lit(0L))).as("n_b"),
      sum(when(col("__g") === groupA, col("__a2")).otherwise(lit(0L)))
        .as("__t2"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = (col("n_a") + col("n_b")).cast("double")
    val t = col("__t2").cast("double") / lit(2.0)
    val even = (col("n_a") + col("n_b")) % 2 === 0
    val e = when(even, na * (nn + lit(2.0)) / lit(4.0))
      .otherwise(na * (nn + lit(1.0)) * (nn + lit(1.0)) / (lit(4.0) * nn))
    val v = when(even,
      na * nb * (nn + lit(2.0)) * (nn - lit(2.0)) /
        (lit(48.0) * (nn - lit(1.0))))
      .otherwise(na * nb * (nn + lit(1.0)) * (lit(3.0) + nn * nn) /
        (lit(48.0) * nn * nn))
    val z = round((t - e) / sqrt(v), 6)
    agg.select(col("n_a"), col("n_b"), t.as("ab_stat"),
      when(col("n_a") > 0 && col("n_b") > 0 && v > 0, z).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0 && v > 0,
        when(abs(z) <= lit(1.96), lit("same_scale"))
          .otherwise(lit("scale_differs"))).as("verdict"))
  }

  /**
   * P203 — first-order partial correlation: r_xy·z — the x↔y
   * association with z's influence removed,
   * (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)) — the confounder screen
   * [[corrMatrix]] can't do alone ("price correlates with quantity…
   * only because discount drives both?"). One row: (n, r_xy, r_xz,
   * r_yz, r_partial); a z perfectly correlated with either side
   * (denominator 0) or any degenerate column → null partial.
   *
   * Shape: the corrMatrix single-pass moment agg (DECIMAL sums,
   * (19,6) products) specialized to three columns. Cross-engine: the
   * three r's round at 6 FIRST and the partial is a fixed double
   * sequence on the rounded r's (both engines see identical operands),
   * rounded at 6.
   */
  def partialCorrelation(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    require(Seq(xCol, yCol, zCol).distinct.size == 3,
      s"partialCorrelation: columns must be distinct, got ($xCol, $yCol, $zCol)")
    val cols3 = Seq(xCol, yCol, zCol)
    def dec(c: String) = col(c).cast("decimal(18,6)")
    def dec19(c: String) = col(c).cast("decimal(19,6)")
    val complete = df.where(cols3.map(col(_).isNotNull).reduce(_ && _))
    val sumAggs = cols3.map(c => sum(dec(c)).cast("double").as(s"__s_$c"))
    val prodAggs = for {
      (a, i) <- cols3.zipWithIndex
      b <- cols3.drop(i)
    } yield sum(dec19(a) * dec19(b)).cast("double").as(s"__p_${a}_$b")
    val m = complete.agg(count(lit(1)).as("n"), (sumAggs ++ prodAggs): _*)
    val nd = col("n").cast("double")
    def r(a: String, b: String): Column = {
      val num = nd * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      val dena = nd * col(s"__p_${a}_$a") - col(s"__s_$a") * col(s"__s_$a")
      val denb = nd * col(s"__p_${b}_$b") - col(s"__s_$b") * col(s"__s_$b")
      when(dena > 0 && denb > 0, round(num / (sqrt(dena) * sqrt(denb)), 6))
    }
    val den = (lit(1.0) - col("r_xz") * col("r_xz")) *
      (lit(1.0) - col("r_yz") * col("r_yz"))
    m.withColumn("r_xy", r(xCol, yCol))
      .withColumn("r_xz", r(xCol, zCol))
      .withColumn("r_yz", r(yCol, zCol))
      .withColumn("r_partial",
        when(col("r_xy").isNotNull && col("r_xz").isNotNull &&
          col("r_yz").isNotNull && den > 0,
          round((col("r_xy") - col("r_xz") * col("r_yz")) / sqrt(den), 6)))
      .select("n", "r_xy", "r_xz", "r_yz", "r_partial")
  }

  /**
   * P204 — Cohen's d effect size between two arms: d = (m₁ − m₀) / s_p
   * with the pooled sd s_p² = ((n₁−1)s₁² + (n₀−1)s₀²)/(n₁+n₀−2) — the
   * "HOW BIG is the difference" companion to P148's Welch (which only
   * says whether it exists); the standard 0.2/0.5/0.8 magnitude labels
   * ride along. One row: (n_treat, n_ctrl, mean_treat, mean_ctrl,
   * pooled_sd, d, magnitude); an arm with < 2 points or zero pooled
   * spread → null d.
   *
   * One fused conditional decimal-moment agg (the o23 recipe); the
   * closing sequence is fixed doubles with one IEEE sqrt; means/sd/d
   * round at 6, the label reads the ROUNDED d.
   */
  def cohensD(df: DataFrame, treatCol: String, valueCol: String): DataFrame = {
    val t = col(treatCol)
    val x = col(valueCol)
    def arm(cond: Column) = (
      sum(when(cond, 1L).otherwise(0L)),
      sum(when(cond, x.cast("decimal(18,6)"))),
      sum(when(cond, x.cast("decimal(19,6)") * x.cast("decimal(19,6)"))))
    val (n1, s1, q1) = arm(t)
    val (n0, s0, q0) = arm(!t)
    val m = df.where(t.isNotNull && x.isNotNull)
      .agg(n1.as("n_treat"), s1.cast("double").as("__s1"),
        q1.cast("double").as("__q1"), n0.as("n_ctrl"),
        s0.cast("double").as("__s0"), q0.cast("double").as("__q0"))
    val nd1 = col("n_treat").cast("double")
    val nd0 = col("n_ctrl").cast("double")
    val ss1 = col("__q1") - col("__s1") * col("__s1") / nd1
    val ss0 = col("__q0") - col("__s0") * col("__s0") / nd0
    val sp = sqrt((ss1 + ss0) / (nd1 + nd0 - lit(2.0)))
    m.withColumn("mean_treat", when(col("n_treat") > 0,
        round(col("__s1") / nd1, 6)))
      .withColumn("mean_ctrl", when(col("n_ctrl") > 0,
        round(col("__s0") / nd0, 6)))
      .withColumn("pooled_sd",
        when(col("n_treat") >= 2 && col("n_ctrl") >= 2, round(sp, 6)))
      .withColumn("d",
        when(col("n_treat") >= 2 && col("n_ctrl") >= 2 && sp > 0,
          round((col("__s1") / nd1 - col("__s0") / nd0) / sp, 6)))
      .withColumn("magnitude",
        when(col("d").isNull, lit(null).cast("string"))
          .when(abs(col("d")) < 0.2, "negligible")
          .when(abs(col("d")) < 0.5, "small")
          .when(abs(col("d")) < 0.8, "medium")
          .otherwise("large"))
      .select("n_treat", "n_ctrl", "mean_treat", "mean_ctrl", "pooled_sd",
        "d", "magnitude")
  }

  /**
   * P206 — Q–Q points between two arms: the p-quantile of the treated
   * arm against the same quantile of the control for a grid of
   * fractions — the distribution-level A/B read (a mean test hides a
   * variance or tail change; the Q–Q gap column localizes WHERE the
   * distributions diverge). Emits (p, q_treat, q_ctrl, gap) per
   * fraction; an empty arm yields null quantiles.
   *
   * Shapes: one exact percentile-array agg per arm (the o5 class), a
   * 1×1 cross join, one bounded explode of the zipped arrays.
   * Quantiles and the gap round at 4 (the o5 interpolation-slack rule).
   */
  def qqPoints(df: DataFrame, treatCol: String, valueCol: String,
      ps: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"qqPoints: fractions must sit in (0,1), got $ps")
    val t = col(treatCol)
    val base = df.where(t.isNotNull && col(valueCol).isNotNull)
      .select(t.as("__t"), col(valueCol).cast("double").as("__v"))
    val fr = ps.mkString(", ")
    def arm(cond: Column, name: String) =
      base.where(cond).agg(expr(s"percentile(__v, array($fr))").as(name))
    val pArr = array(ps.map(lit): _*)
    arm(col("__t"), "__qt").crossJoin(arm(!col("__t"), "__qc"))
      .select(posexplode(pArr).as(Seq("__i", "p")), col("__qt"), col("__qc"))
      .select(col("p"),
        round(element_at(col("__qt"), col("__i") + 1), 4).as("q_treat"),
        round(element_at(col("__qc"), col("__i") + 1), 4).as("q_ctrl"))
      .withColumn("gap", round(col("q_treat") - col("q_ctrl"), 4))
  }

  /**
   * P107 — Pearson correlation matrix over a set of numeric columns:
   * one row per unordered column pair (upper triangle, positional
   * order) with the shared observation count and r rounded at 6 — the
   * redundancy screen a feature pipeline runs before training (drop
   * one of every near-collinear pair). Rows with ANY of the columns
   * null are excluded entirely (listwise deletion), so every pair sees
   * the identical n and the matrix is internally consistent.
   *
   * Shape: ALL k + k(k+1)/2 moment sums come from ONE map-side-
   * combinable aggregate over the single pass (the o11 OLS discipline:
   * values cast to DECIMAL(18,6) first, products at (19,6), so every
   * sum is exact and partition-order-free); the pair explosion is a
   * projection of that one 1-row frame. r is then a fixed double
   * sequence per pair; degenerate columns (zero variance) null their
   * pairs' r.
   */
  def corrMatrix(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    require(valueCols.size >= 2,
      s"corrMatrix: need at least 2 columns, got ${valueCols.size}")
    require(valueCols.distinct.size == valueCols.size,
      s"corrMatrix: columns must be distinct, got $valueCols")
    def dec(c: String) = col(c).cast("decimal(18,6)")
    def dec19(c: String) = col(c).cast("decimal(19,6)")
    val complete = df.where(valueCols.map(col(_).isNotNull).reduce(_ && _))
    val sumAggs = valueCols.map(c => sum(dec(c)).cast("double").as(s"__s_$c"))
    val prodAggs = for {
      (a, i) <- valueCols.zipWithIndex
      b <- valueCols.drop(i)
    } yield sum(dec19(a) * dec19(b)).cast("double").as(s"__p_${a}_$b")
    val moments = complete.agg(count(lit(1)).as("n"),
      (sumAggs ++ prodAggs): _*)
    val nd = col("n").cast("double")
    val pairs = for {
      (a, i) <- valueCols.zipWithIndex
      b <- valueCols.drop(i + 1)
    } yield {
      val num = nd * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      val dena = nd * col(s"__p_${a}_$a") - col(s"__s_$a") * col(s"__s_$a")
      val denb = nd * col(s"__p_${b}_$b") - col(s"__s_$b") * col(s"__s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(dena > 0 && denb > 0,
          round(num / (sqrt(dena) * sqrt(denb)), 6)).as("r"))
    }
    moments
      .select(col("n"), explode(array(pairs: _*)).as("__pair"))
      .select(col("__pair.col_a").as("col_a"), col("__pair.col_b").as("col_b"),
        col("n"), col("__pair.r").as("r"))
  }

  /**
   * P108 — Spearman rank correlation between two columns: Pearson r on
   * pooled average ranks — the monotone-association measure that is
   * robust to the heavy tails where Pearson saturates, standard in
   * feature screening. Returns ONE row (n, rho); ties get average
   * ranks; degenerate inputs (either column constant) pin rho null.
   *
   * Engine portability (the o15 doubled-rank discipline): average
   * ranks are k or k.5, so DOUBLED ranks 2·minrank + (t−1) are exact
   * BIGINTs; their products accumulate in DECIMAL(38,0) (exact at any
   * n — the BIGINT bound 2⁶² would cap n near 10⁶), and the closing
   * rho is a fixed double sequence on the exact sums (the doubling
   * cancels between numerator and denominator). The pooled rank is one
   * global-order window — the o5/o15 exact-statistic caveat: a rank
   * statistic runs on a sample or group slice, not the raw 100 TB.
   */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def doubled(c: String, out: String)(d: DataFrame): DataFrame = {
      val w = Window.orderBy(col(c).asc)
      val tw = Window.partitionBy(col(c))
      d.withColumn(out,
        lit(2L) * rank().over(w).cast("long") + count(lit(1)).over(tw) - lit(1L))
    }
    val ranked = doubled(yCol, "__dy")(doubled(xCol, "__dx")(
      df.where(col(xCol).isNotNull && col(yCol).isNotNull)
        .select(col(xCol), col(yCol))))
    val sums = ranked.agg(count(lit(1)).as("n"),
      sum((col("__dx") * col("__dy")).cast("decimal(38,0)"))
        .cast("double").as("__sxy"),
      sum((col("__dx") * col("__dx")).cast("decimal(38,0)"))
        .cast("double").as("__sxx"),
      sum((col("__dy") * col("__dy")).cast("decimal(38,0)"))
        .cast("double").as("__syy"),
      sum(col("__dx").cast("decimal(38,0)")).cast("double").as("__sx"),
      sum(col("__dy").cast("decimal(38,0)")).cast("double").as("__sy"))
    val nd = col("n").cast("double")
    val num = nd * col("__sxy") - col("__sx") * col("__sy")
    val denx = nd * col("__sxx") - col("__sx") * col("__sx")
    val deny = nd * col("__syy") - col("__sy") * col("__sy")
    sums
      .withColumn("rho", when(denx > 0 && deny > 0,
        round(num / (sqrt(denx) * sqrt(deny)), 6)))
      .drop("__sxy", "__sxx", "__syy", "__sx", "__sy")
  }

  /**
   * P127 — Welch's unequal-variance t-test between two groups: the
   * parametric companion to the P102 rank-sum test (use this when the
   * metric is near-normal, Mann–Whitney when it's skewed). Returns ONE
   * row (n_a, n_b, mean_a, mean_b, t, dof) with the Welch–Satterthwaite
   * degrees of freedom; groups need n ≥ 2 and positive variance on at
   * least one side or t/dof null out.
   *
   * Shape: ONE map-side-combinable agg computes both groups' decimal-
   * exact moments (conditional sums — no second pass, no join); the
   * statistic is a fixed double sequence on the exact sums, rounded at
   * 6. Sample variance uses the (q − s·s/n)/(n−1) form with a 0 clamp
   * against rounding residue (the o7 discipline).
   */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "welchTTest: groups must differ")
    val g = col(groupCol).cast("string")
    val x = col(valueCol)
    def side(grp: String, tag: String) = Seq(
      sum(when(g === grp, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(g === grp, x.cast("decimal(18,6)"))).cast("double").as(s"__s_$tag"),
      sum(when(g === grp, x.cast("decimal(19,6)") * x.cast("decimal(19,6)")))
        .cast("double").as(s"__q_$tag"))
    val aggs = side(groupA, "a") ++ side(groupB, "b")
    val m = df.where(x.isNotNull && (g === groupA || g === groupB))
      .agg(aggs.head, aggs.tail: _*)
    def nd(t: String) = col(s"n_$t").cast("double")
    def mean(t: String) = col(s"__s_$t") / nd(t)
    def variance(t: String) = greatest(
      (col(s"__q_$t") - col(s"__s_$t") * col(s"__s_$t") / nd(t)) /
        (nd(t) - lit(1.0)), lit(0.0))
    val se2 = variance("a") / nd("a") + variance("b") / nd("b")
    val dof = (se2 * se2) /
      ((variance("a") / nd("a")) * (variance("a") / nd("a")) / (nd("a") - lit(1.0)) +
        (variance("b") / nd("b")) * (variance("b") / nd("b")) / (nd("b") - lit(1.0)))
    val defined = col("n_a") >= 2L && col("n_b") >= 2L && se2 > 0
    m.select(col("n_a"), col("n_b"),
      round(mean("a"), 6).as("mean_a"), round(mean("b"), 6).as("mean_b"),
      when(defined, round((mean("a") - mean("b")) / sqrt(se2), 6)).as("t"),
      when(defined, round(dof, 6)).as("dof"))
  }

  /**
   * P234 — TOST equivalence test (two one-sided tests): where P127's
   * Welch t asks "did the metric MOVE", TOST asks "is it provably
   * WITHIN ±margin" — the no-regression release gate (a non-significant
   * t is NOT evidence of equivalence; TOST is). Both one-sided
   * statistics use the Welch standard error; `equivalent` reads them
   * against the large-sample z bar 1.645 (90% TOST ≡ 5% one-sided
   * each — the standard convention). Emits ONE row (n_a, n_b, mean_a,
   * mean_b, margin, t_lo, t_hi, equivalent); degenerate sides null the
   * verdict.
   *
   * Shape/cross-engine: the P127 fused conditional decimal-moment agg
   * verbatim; the closing sequence is fixed doubles rounded at 6, with
   * the margin embedded as one shared double literal.
   */
  def tostEquivalence(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, margin: Double): DataFrame = {
    require(groupA != groupB, "tostEquivalence: groups must differ")
    require(margin > 0, s"tostEquivalence: margin must be > 0, got $margin")
    val g = col(groupCol).cast("string")
    val x = col(valueCol)
    def side(grp: String, tag: String) = Seq(
      sum(when(g === grp, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(g === grp, x.cast("decimal(18,6)"))).cast("double")
        .as(s"__s_$tag"),
      sum(when(g === grp, x.cast("decimal(19,6)") * x.cast("decimal(19,6)")))
        .cast("double").as(s"__q_$tag"))
    val aggs = side(groupA, "a") ++ side(groupB, "b")
    val m = df.where(x.isNotNull && (g === groupA || g === groupB))
      .agg(aggs.head, aggs.tail: _*)
    def nd(t: String) = col(s"n_$t").cast("double")
    def mean(t: String) = col(s"__s_$t") / nd(t)
    def variance(t: String) = greatest(
      (col(s"__q_$t") - col(s"__s_$t") * col(s"__s_$t") / nd(t)) /
        (nd(t) - lit(1.0)), lit(0.0))
    val se2 = variance("a") / nd("a") + variance("b") / nd("b")
    val diff = mean("a") - mean("b")
    val defined = col("n_a") >= 2L && col("n_b") >= 2L && se2 > 0
    val tLo = round((diff + lit(margin)) / sqrt(se2), 6)
    val tHi = round((diff - lit(margin)) / sqrt(se2), 6)
    m.select(col("n_a"), col("n_b"),
      round(mean("a"), 6).as("mean_a"), round(mean("b"), 6).as("mean_b"),
      lit(margin).as("margin"),
      when(defined, tLo).as("t_lo"), when(defined, tHi).as("t_hi"),
      when(defined, tLo > 1.645 && tHi < -1.645).as("equivalent"))
  }

  /**
   * P239 — covariate balance table: per feature, the standardized mean
   * difference SMD = (x̄_a − x̄_b)/√((s²_a+s²_b)/2) between two arms and
   * the |SMD| < 0.1 balance verdict — the table every observational
   * study (P148 DiD, P125 CUPED, P184 reweight) prints FIRST: an
   * imbalanced covariate is a confounder the estimate silently absorbs.
   * Emits per feature (feature, n_a, n_b, mean_a, mean_b, smd,
   * balanced); degenerate features (zero pooled variance or a
   * one-sided arm) null smd/balanced.
   *
   * Shapes: features melt into one long frame (a generator explode —
   * no join), then ONE keyed conditional decimal-moment agg (the P127
   * chain per feature). Cross-engine: the closing SMD is a fixed
   * double sequence on exact decimal sums with one IEEE sqrt, rounded
   * at 6; the verdict reads the rounded |smd|.
   */
  def covariateBalance(df: DataFrame, armCol: String,
      featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "covariateBalance: need features")
    require(featureCols.distinct.size == featureCols.size,
      s"covariateBalance: duplicate features in $featureCols")
    val melted = df.where(col(armCol).isNotNull)
      .select(col(armCol).cast("boolean").as("__arm"),
        explode(array(featureCols.map(f =>
          struct(lit(f).as("feature"),
            col(f).cast("double").as("__v"))): _*)).as("__fx"))
      .select(col("__arm"), col("__fx.feature").as("feature"),
        col("__fx.__v").as("__v"))
      .where(col("__v").isNotNull)
    def side(arm: Boolean, tag: String) = Seq(
      sum(when(col("__arm") === arm, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col("__arm") === arm, col("__v").cast("decimal(18,6)")))
        .cast("double").as(s"__s_$tag"),
      sum(when(col("__arm") === arm,
        col("__v").cast("decimal(19,6)") * col("__v").cast("decimal(19,6)")))
        .cast("double").as(s"__q_$tag"))
    val aggs = side(arm = true, "a") ++ side(arm = false, "b")
    val m = melted.groupBy(col("feature")).agg(aggs.head, aggs.tail: _*)
    def nd(t: String) = col(s"n_$t").cast("double")
    def mean(t: String) = col(s"__s_$t") / nd(t)
    def variance(t: String) = greatest(
      (col(s"__q_$t") - col(s"__s_$t") * col(s"__s_$t") / nd(t)) /
        (nd(t) - lit(1.0)), lit(0.0))
    val pooled = (variance("a") + variance("b")) / lit(2.0)
    val defined = col("n_a") >= 2L && col("n_b") >= 2L && pooled > 0
    m.select(col("feature"), col("n_a"), col("n_b"),
      round(mean("a"), 6).as("mean_a"), round(mean("b"), 6).as("mean_b"),
      when(defined, round((mean("a") - mean("b")) / sqrt(pooled), 6))
        .as("smd"))
      .withColumn("balanced",
        when(col("smd").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("smd")) < 0.1))
  }

  /**
   * P241 — calibration table: bucket a score column at its quantile
   * cuts and compare each bucket's mean score against its observed
   * positive rate — the reliability diagram as a frame ("the model
   * says 0.7, reality says 0.5 ⇒ over-confident"), run on any score
   * that claims to be a probability before anyone thresholds it.
   * Emits per bucket (bucket, n, mean_score, pos_rate, gap) with
   * gap = mean_score − pos_rate in exact decimal.
   *
   * Shapes: one percentile agg (the o5 class), the threshold ladder
   * broadcast k-row (the z8 bucket-by-comparison-count idiom — NO
   * window), one fused agg. Cross-engine: thresholds round at 4,
   * means through decimal sums at 6, the gap a decimal difference of
   * the rounded pair (the o46 rule).
   */
  def calibrationTable(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100,
      s"calibrationTable: bins must be in 2..100, got $bins")
    val base = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__l"))
    val fr = (1 until bins).map(i => i.toDouble / bins)
    val wide = base.agg(
      fr.zipWithIndex.map { case (f, i) =>
        round(expr(s"percentile(__s, $f)"), 4).as(s"__b$i")
      }.head, fr.zipWithIndex.tail.map { case (f, i) =>
        round(expr(s"percentile(__s, $f)"), 4).as(s"__b$i")
      }: _*)
    val bucket = (0 until bins - 1)
      .map(i => when(col("__s") >= col(s"__b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    base.crossJoin(broadcast(wide)) // 1-row boundary frame
      .select(bucket.as("bucket"), col("__s"), col("__l"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_score"),
        round(sum(when(col("__l"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("pos_rate"))
      .withColumn("gap",
        (col("mean_score").cast("decimal(18,6)") -
          col("pos_rate").cast("decimal(18,6)")).cast("double"))
  }

  /**
   * P384 — Fleiss' κ over m binary raters: chance-corrected agreement
   * when EVERY item gets a verdict from each of m judges —
   * κ = (P̄ − P̄_e)/(1 − P̄_e) with P̄ the mean per-item pairwise
   * agreement and P̄_e the chance rate from the pooled vote share.
   * Cohen's κ (P216) stops at two raters; the pipeline use is
   * FILTER-PANEL agreement: run m independent quality signals as
   * "raters" and κ says whether they measure one thing (κ → 1, drop
   * the redundant ones) or genuinely different things (κ ≈ 0, keep
   * all). One row: (n_items, m_raters, p_pass, p_bar, p_e, kappa).
   *
   * Cross-engine: with a = per-item pass votes,
   * Σ(a² + (m−a)²) = 2Σa² − 2mΣa + Nm² — everything folds to TWO
   * integer sums; the close is one fixed double chain rounded at 6
   * (κ null when P̄_e = 1: unanimous raters leave no chance to
   * correct). Shape: one projection + ONE agg, map-side combinable.
   */
  def fleissKappaBinary(df: DataFrame, ratingCols: Seq[String]): DataFrame = {
    require(ratingCols.size >= 2,
      s"fleissKappaBinary: need >= 2 raters, got ${ratingCols.size}")
    require(ratingCols.distinct.size == ratingCols.size,
      "fleissKappaBinary: duplicate rater columns")
    val m = ratingCols.size
    val a = ratingCols.map(c => when(col(c), 1L).otherwise(0L))
      .reduce(_ + _)
    val base = df
      .where(ratingCols.map(col(_).isNotNull).reduce(_ && _))
      .select(a.as("__a"))
    val agg = base.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("__a")), lit(0L)).as("__sa"),
      coalesce(sum(col("__a") * col("__a")), lit(0L)).as("__sa2"))
    val nd = col("n_items").cast("double")
    val md = lit(m.toDouble)
    val p = col("__sa").cast("double") / (nd * md)
    // Σ(a² + (m−a)²) = 2Σa² − 2mΣa + Nm², then P̄ subtracts the m
    // self-pairs and normalizes by m(m−1) per item
    val sqSum = lit(2.0) * col("__sa2").cast("double") -
      lit(2.0) * md * col("__sa").cast("double") + nd * md * md
    val pbar = (sqSum - nd * md) / (nd * md * (md - lit(1.0)))
    val pe = p * p + (lit(1.0) - p) * (lit(1.0) - p)
    agg.select(col("n_items"), lit(m).as("m_raters"),
      when(col("n_items") > 0, round(p, 6)).as("p_pass"),
      when(col("n_items") > 0, round(pbar, 6)).as("p_bar"),
      when(col("n_items") > 0, round(pe, 6)).as("p_e"),
      when(col("n_items") > 0 && pe < 1.0,
        round((pbar - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /**
   * P382 — calibration summary: the [[calibrationTable]] reliability
   * diagram folded to its three decision numbers — ECE (bucket-share-
   * weighted |gap|: "how wrong is the claimed probability on
   * average"), MCE (the worst bucket), and the Brier score
   * (mean (score − label)² over the RAW rows — the proper scoring rule
   * the bucketed view approximates). One row: (n, ece, mce, brier).
   * The gate form of o64's per-bucket frame: a pipeline thresholds on
   * ONE number, not a diagram.
   *
   * Cross-engine: gap is already an exact decimal — n·|gap| stays an
   * exact DECIMAL product summed exactly, so ECE is ONE closing
   * division; MCE one decimal max; Brier runs (18,6)-casted diffs
   * through exact (37,12) squares (the o114 product class), one
   * division. All three round at 6.
   */
  def calibrationSummary(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val buckets = calibrationTable(df, scoreCol, labelCol, bins)
    val fold = buckets.agg(
      sum(col("n")).as("n"),
      // n as DECIMAL(12,0) first: a raw LONG×DECIMAL multiply widens
      // past 38 on the Spark side and the engines cap differently
      sum(col("n").cast("decimal(12,0)") *
        abs(col("gap")).cast("decimal(18,6)")).as("__wgap"),
      max(abs(col("gap")).cast("decimal(18,6)")).as("__mce"))
    val base = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").cast("decimal(18,6)").as("__s"),
        when(col(labelCol).cast("boolean"), lit(1))
          .otherwise(lit(0)).cast("decimal(18,6)").as("__l"))
    // re-cast the (19,6) difference to (18,6) before squaring — a
    // (19,6)² caps at (38,11) on the Spark side vs DuckDB's 12
    // fractional digits (the r10 demingFit lesson); |score−label| ≤ 1
    // fits (18,6) exactly
    val diff = (col("__s") - col("__l")).cast("decimal(18,6)")
    val brier = base.agg(
      sum(diff * diff).as("__bsum"), count(lit(1)).as("__bn"))
    fold.crossJoin(broadcast(brier)) // 1-row scalar side
      .select(col("n"),
        when(col("n") > 0, round(col("__wgap").cast("double") /
          col("n").cast("double"), 6)).as("ece"),
        round(col("__mce").cast("double"), 6).as("mce"),
        when(col("__bn") > 0, round(col("__bsum").cast("double") /
          col("__bn").cast("double"), 6)).as("brier"))
  }

  /**
   * P125 — CUPED adjustment (Deng et al.): reduce an experiment
   * metric's variance with a pre-period covariate, y_cuped = y −
   * θ·(x − μₓ) with θ = cov(x,y)/var(x) — the standard A/B-testing
   * variance-reduction transform (same mean, strictly less variance
   * when x correlates). Input is one row per unit with pre-metric `x`
   * and post-metric `y`; adds `theta` (repeated, rounded at 6) and
   * `y_cuped` (rounded at 6). Zero pre-period variance degenerates to
   * θ = 0 → y unchanged.
   *
   * Shape: θ and μₓ come from ONE decimal-exact moment aggregate (the
   * o11 casts) broadcast back as a scalar row; the adjustment is a pure
   * projection — fixed double sequences on identical operands.
   */
  def cupedAdjust(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dx = col(xCol).cast("decimal(18,6)")
    val dy = col(yCol).cast("decimal(18,6)")
    val dx19 = col(xCol).cast("decimal(19,6)")
    val dy19 = col(yCol).cast("decimal(19,6)")
    val m = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(count(lit(1)).as("__n"),
        sum(dx).cast("double").as("__sx"),
        sum(dy).cast("double").as("__sy"),
        sum(dx19 * dy19).cast("double").as("__sxy"),
        sum(dx19 * dx19).cast("double").as("__sxx"))
    val nd = col("__n").cast("double")
    val den = nd * col("__sxx") - col("__sx") * col("__sx")
    val thetaRaw = when(den > 0,
      (nd * col("__sxy") - col("__sx") * col("__sy")) / den).otherwise(lit(0.0))
    df.join(broadcast(m)) // 1-row scalar side
      .withColumn("__theta", thetaRaw)
      .withColumn("__mu", col("__sx") / nd)
      .withColumn("theta", round(col("__theta"), 6))
      .withColumn("y_cuped",
        round(col(yCol) - col("__theta") * (col(xCol) - col("__mu")), 6))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx", "__theta", "__mu")
  }

  /**
   * P87 — MAD-based robust outliers (Iglewicz–Hoaglin modified z-score):
   * per group, m = median, MAD = median(|x − m|), z = 0.6745·(x − m)/MAD,
   * flagged when |z| > `cutoff` — the outlier rule that (unlike the P47
   * z-score) a few extreme values cannot mask, since medians have a 50%
   * breakdown point. Adds `med`, `mad`, `mz` (all rounded at 6) and
   * `outlier`; MAD = 0 groups (≥ half the group identical) pin z = 0 —
   * the standard convention, nothing is flagged on a degenerate scale.
   *
   * Shape: two exact-percentile keyed aggs with their joins back on the
   * group key (shuffle_hash — the post-agg no-stats rule). Cross-engine:
   * the median is ROUNDED AT 6 BEFORE deviations are computed, so the
   * second percentile pass and the z numerator see identical operands on
   * every engine — without that, a last-ulp median difference would
   * cascade into the MAD ranks themselves.
   */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"madOutliers: cutoff must be > 0, got $cutoff")
    val med = df.groupBy(col(keyCol))
      .agg(round(expr(s"percentile(`$valueCol`, 0.5)"), 6).as("med"))
    val withDev = df.join(med.hint("shuffle_hash"), Seq(keyCol))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(col(keyCol))
      .agg(round(expr("percentile(`__dev`, 0.5)"), 6).as("mad"))
    withDev.join(mad.hint("shuffle_hash"), Seq(keyCol))
      .withColumn("mz",
        when(col("mad") > 0,
          round(lit(0.6745) * (col(valueCol) - col("med")) / col("mad"), 6))
          .otherwise(lit(0.0)))
      .withColumn("outlier", abs(col("mz")) > cutoff)
      .drop("__dev")
  }

  /**
   * P134 — smoothed target (mean) encoding for a high-cardinality
   * categorical: encoded(c) = (Σ_c y + m·prior) / (n_c + m) with the
   * global mean as prior — the standard leak-light categorical encoder
   * (a raw per-category mean overfits rare categories; the m-weighted
   * prior pulls a 1-row category almost to the corpus mean). Emits one
   * row per category: `n` and `encoded` (rounded at 9).
   *
   * Shape: ONE keyed decimal aggregate per category plus ONE global
   * 1-row moment aggregate broadcast back (the P125 scalar-row idiom) —
   * two map-side-combinable passes, no window, no per-row state.
   * Cross-engine: both sums are DECIMAL (order-independent), the prior
   * and the encoding are a fixed double sequence on identical operands,
   * rounded only at the end — at 6 decimals, not 9: encoded values carry
   * the target's magnitude (~1e5 here), and 9 fractional digits on a 6
   * integer-digit double is the last-ulp zone where engines' roundings
   * legitimately disagree.
   */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 20.0): DataFrame = {
    require(smoothing >= 0, s"targetEncode: smoothing must be >= 0, got $smoothing")
    val dec = col(targetCol).cast("decimal(18,6)")
    val g = df.where(col(targetCol).isNotNull && col(catCol).isNotNull)
    val global = g.agg(sum(dec).cast("double").as("__gs"),
      count(lit(1)).as("__gn"))
    g.groupBy(col(catCol))
      .agg(sum(dec).cast("double").as("__s"), count(lit(1)).as("n"))
      .join(broadcast(global)) // 1-row scalar side
      .withColumn("encoded",
        round((col("__s") + lit(smoothing) *
          (col("__gs") / col("__gn").cast("double"))) /
          (col("n").cast("double") + lit(smoothing)), 6))
      .drop("__s", "__gs", "__gn")
  }

  /**
   * P143 — Hill tail-index estimator over the top-`k` order statistics:
   * α = k / Σᵢ ln(xᵢ/x₍ₖ₎) with x₍ₖ₎ the smallest retained value — the
   * standard heavy-tail exponent fit (α ≲ 2 ⇒ infinite variance: key
   * frequencies, file sizes, degree distributions). In a data pipeline
   * this is the skew forecast: the α of a join key's frequency tail
   * says whether salting will be needed BEFORE the job runs.
   * One row: (k, xk, alpha); a degenerate tail (all top-k equal) has
   * no defined exponent → null alpha.
   *
   * Shapes: top-k is TakeOrderedAndProject (never a full sort); the
   * scalar (x₍ₖ₎, k) row broadcasts back (P125 idiom). Ties at the cut
   * are harmless: equal values → identical ln multiset. Each ln rounds
   * at 9 and DECIMAL-sums (the P124 libm firewall); α is one double
   * division, rounded at 6.
   */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"hillTailIndex: k must be >= 2, got $k")
    val top = df.where(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("double").as("__v"))
      .orderBy(col("__v").desc).limit(k)
    val ref = top.agg(min(col("__v")).as("xk"), count(lit(1)).as("k"))
    top.join(broadcast(ref)) // 1-row scalar side
      .select(col("k"), col("xk"),
        round(log(col("__v") / col("xk")), 9).cast("decimal(28,9)").as("__t"))
      .groupBy(col("k"), col("xk"))
      .agg(sum(col("__t")).cast("double").as("__h"))
      .withColumn("alpha",
        when(col("__h") > 0,
          round(col("k").cast("double") / col("__h"), 6)))
      .drop("__h")
  }

  /**
   * P186 — 2-D skyline (Pareto frontier, minimize both columns): rows
   * no other row dominates (≤ on both coordinates, < on at least one)
   * — the multi-objective shortlist operator (cheapest-AND-smallest
   * parts, fastest-AND-freshest sources) relational engines usually
   * lack. Coordinate-duplicates collapse to the smallest id
   * (documented; strict-dominance keeps formal duplicates, a frontier
   * wants one representative).
   *
   * Shape: the standard TWO-PHASE skyline. Phase 1 runs the running-min
   * pass per deterministic hash shard (sorted by (x, y, id) inside each
   * shard, a row survives iff its y beats the min of its in-shard
   * predecessors) — partition-parallel, no global order. Phase 2 repeats
   * the identical pass once over the union of shard survivors, which is
   * frontier-sized. Skyline is prune-safe, so the result equals the
   * one-pass global window for ANY shard assignment: a row the global
   * pass keeps beats every predecessor, hence every in-shard and every
   * survivor predecessor; a row it drops has a minimal-sort dominator,
   * which by minimality survives both phases and kills it in phase 2.
   * Exact-value comparisons only — no arithmetic at all.
   */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      idCol: String, localShards: Int = 32): DataFrame = {
    require(localShards >= 1,
      s"skyline2D: localShards must be >= 1, got $localShards")
    def pass(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      in.withColumn("__pmin",
          min(col(yCol)).over(w.orderBy(col(xCol).asc, col(yCol).asc,
            col(idCol).asc).rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("__pmin").isNull || col(yCol) < col("__pmin"))
        .drop("__pmin")
    val survivors = pass(
      df.where(col(xCol).isNotNull && col(yCol).isNotNull)
        .withColumn("__shard",
          pmod(xxhash64(col(idCol)), lit(localShards.toLong))),
      Window.partitionBy(col("__shard"))).drop("__shard")
    pass(survivors, Window.partitionBy())
  }

  /**
   * P181 — two-proportion z-test: z = (p₁−p₀) / √(p̂(1−p̂)(1/n₁+1/n₀))
   * with the pooled p̂ — THE conversion-rate comparison, closing the
   * experimentation suite (P171 SRM guards assignment, P174 sizes the
   * test, P148/P125 handle continuous metrics, this one handles the
   * binary ones). One row: (n_treat, n_ctrl, x_treat, x_ctrl, p_treat,
   * p_ctrl, z, significant) — the call reads the ROUNDED z at ±1.96;
   * empty arms or a degenerate pooled rate (p̂ ∈ {0,1}) → null z.
   *
   * One fused 4-cell conditional count agg; the statistic is a fixed
   * double sequence over exact counts, rounded at 6.
   */
  def twoProportionTest(df: DataFrame, treatCol: String,
      successCol: String): DataFrame = {
    val t = col(treatCol)
    val sOk = col(successCol)
    val m = df.where(t.isNotNull && sOk.isNotNull)
      .agg(sum(when(t, 1L).otherwise(0L)).as("n_treat"),
        sum(when(!t, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(t && sOk, 1L).otherwise(0L)).as("x_treat"),
        sum(when(!t && sOk, 1L).otherwise(0L)).as("x_ctrl"))
    val n1 = col("n_treat").cast("double")
    val n0 = col("n_ctrl").cast("double")
    val p1 = col("x_treat").cast("double") / n1
    val p0 = col("x_ctrl").cast("double") / n0
    val pooled = (col("x_treat") + col("x_ctrl")).cast("double") /
      (col("n_treat") + col("n_ctrl")).cast("double")
    val se = sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / n1 + lit(1.0) / n0))
    m.withColumn("p_treat",
        when(col("n_treat") > 0, round(p1, 6)))
      .withColumn("p_ctrl",
        when(col("n_ctrl") > 0, round(p0, 6)))
      .withColumn("z",
        when(col("n_treat") > 0 && col("n_ctrl") > 0 &&
          pooled > 0 && pooled < 1, round((p1 - p0) / se, 6)))
      .withColumn("significant",
        when(col("z").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z")) > 1.96))
  }

  /** The z_{α/2} + z_β constant for [[mdeEstimate]] at α = 0.05 /
    * power = 0.80, as a shortest-round-trip literal computed ONCE here
    * (1.959964 + 0.841621) — the o12 driver-constant rule: neither
    * engine's inverse-normal is ever consulted. */
  val MdeZSum: Double = 2.801585

  /**
   * P174 — minimum-detectable-effect estimate (experiment power
   * analysis): for a future 50/50 A/B on this population, the smallest
   * absolute (and relative) lift a two-sample test at α = 0.05 /
   * power = 0.80 would detect: mde = (z_{α/2}+z_β)·σ·2/√n — the "is
   * this experiment even worth running" table, per segment. Emits
   * (key, n, mean_v, sd, mde_abs, mde_rel); n < 2 or zero spread →
   * null MDEs, zero mean → null relative.
   *
   * One keyed decimal moment agg; population σ; the closing sequence is
   * fixed doubles with the z-sum embedded as a literal ([[MdeZSum]]),
   * rounded at 6.
   */
  def mdeEstimate(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val dec = col(valueCol).cast("decimal(18,6)")
    val dec19 = col(valueCol).cast("decimal(19,6)")
    val m = df.where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(dec).cast("double").as("__s"),
        sum(dec19 * dec19).cast("double").as("__q"))
    val nd = col("n").cast("double")
    val mean = col("__s") / nd
    val variance = greatest(col("__q") / nd - mean * mean, lit(0.0))
    val mdeAbs = lit(MdeZSum) * sqrt(variance) * lit(2.0) / sqrt(nd)
    m.withColumn("mean_v", round(mean, 6))
      .withColumn("sd", round(sqrt(variance), 6))
      .withColumn("mde_abs",
        when(col("n") >= 2 && variance > 0, round(mdeAbs, 6)))
      .withColumn("mde_rel",
        when(col("n") >= 2 && variance > 0 && mean =!= 0,
          round(mdeAbs / mean, 6)))
      .drop("__s", "__q")
  }

  /** The shared pooled-ECDF scan (P169/P328): per distinct value, the
    * two groups' counts and cumulative counts with the totals joined —
    * KS maxes the gap, CvM integrates it, and the construction must
    * exist exactly once (the pooledAcf rule). Returns
    * (__v, __ca, __cb, __cuma, __cumb, n_a, n_b). */
  private def pooledEcdf(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val g = col(groupCol).cast("string")
    val d = df.where(col(valueCol).isNotNull && (g === groupA || g === groupB))
    val counts = d.groupBy(col(valueCol).as("__v"))
      .agg(sum(when(g === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(g === groupB, 1L).otherwise(0L)).as("__cb"))
    val w = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = d.agg(sum(when(g === groupA, 1L).otherwise(0L)).as("n_a"),
      sum(when(g === groupB, 1L).otherwise(0L)).as("n_b"))
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .join(broadcast(tot)) // 1-row scalar side
  }

  /**
   * P169 — two-sample Kolmogorov–Smirnov statistic: D = max over the
   * pooled support of |F_a(x) − F_b(x)| — the distribution-shape drift
   * test that mean-based monitors (P127/P163) are blind to (a variance
   * doubling with equal means walks straight past a t-test). One row:
   * (n_a, n_b, d_stat). No p-value on purpose: the asymptotic series
   * is iterative libm soup; compare D against the √((n_a+n_b)/(n_a·n_b))
   * critical scaling offline.
   *
   * Shapes: one keyed count per distinct value (map-combinable), ONE
   * ordered cumulative window over the DISTINCT-value frame (o5 caveat
   * at 100 TB: pre-bucket values first — same statistic on the bucket
   * grid), a broadcast totals row, a closing max. Exact integer
   * cumulative counts; each |ΔF| is two divisions of exact ints,
   * rounded at 9 before the max (ties in the max are harmless — equal
   * rounded values ARE the max).
   */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    pooledEcdf(df, groupCol, valueCol, groupA, groupB)
      .withColumn("__gap", round(abs(
        col("__cuma").cast("double") / col("n_a").cast("double") -
          col("__cumb").cast("double") / col("n_b").cast("double")), 9))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__gap")).as("d_stat"))
  }

  /**
   * P328 — two-sample Cramér–von Mises statistic: T = n_a·n_b/(n)² ·
   * Σ_pooled (F_a(x) − F_b(x))² — the whole-distribution companion to
   * P169's KS (KS reads the single worst ECDF gap and is blind to
   * broad mid-distribution drift; CvM integrates EVERY gap, weighted
   * by where the data actually sits). Same machinery, same exact-
   * statistic caveat: the cumulative scan needs the pooled value
   * order (the o5 family — per-shard approximation is the at-scale
   * fallback). Emits one (n_a, n_b, t_stat) row; an EMPTY side (or an
   * empty pool) yields ZERO rows, never a null-statistic row.
   *
   * Shape: one value-keyed agg + one cumulative window over the
   * distinct-value frame + two scalar closings. Cross-engine: counts
   * exact; ECDF gaps are fixed double sequences; per-value terms
   * (c_a+c_b)·gap² round at 9 through DECIMAL(28,9); T rounds at 6.
   */
  def cvmTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val gap = col("__cuma").cast("double") / col("n_a").cast("double") -
      col("__cumb").cast("double") / col("n_b").cast("double")
    val u = pooledEcdf(df, groupCol, valueCol, groupA, groupB)
      .where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("n_b"),
        round((col("__ca") + col("__cb")).cast("double") * (gap * gap), 9)
          .cast("decimal(28,9)").as("__t"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("__t")).cast("double").as("__u"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    u.select(col("n_a"), col("n_b"),
      round(nad * nbd / ((nad + nbd) * (nad + nbd)) * col("__u"), 6)
        .as("t_stat"))
  }

  /**
   * P361 — two-sample Anderson–Darling statistic (Scholz–Stephens
   * k-sample form at k = 2, right-continuous ECDF variant with ties):
   * A² = Σ_i (1/n_i) Σ_j (l_j/N)·(N·M_ij − n_i·B_j)² / (B_j(N−B_j))
   * over the pooled distinct values (the B_j = N endpoint excluded —
   * its weight is a 0/0), E[A²] = 1 under H₀. The third member of the
   * [[ksTest]]/[[cvmTest]] family: KS reads the largest gap, CvM the
   * average squared gap, AD up-weights the TAILS — the region where
   * data drift usually starts and where the other two are least
   * sensitive. No p-value on purpose (the o37 rule: the asymptotic
   * machinery is iterative libm soup; compare against the
   * Scholz–Stephens table offline).
   *
   * Shapes: the shared [[pooledEcdf]] scan (distinct-value window, the
   * o37 allowlisted class; pre-bucket at 100 TB). Cross-engine: the
   * (N·M − n·B) differences ride in DECIMAL(19,0) products (the o31
   * widening rule — BIGINT squares cliff past N ≈ 2M), each term is
   * ONE fixed double expression on exact-integer-valued operands,
   * 9-rounded into DECIMAL(28,9) sums, closed at 6.
   */
  def andersonDarlingTest(df: DataFrame, groupCol: String,
      valueCol: String, groupA: String, groupB: String): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val nTot = col("n_a") + col("n_b")
    val bj = col("__cuma") + col("__cumb")
    val lj = col("__ca") + col("__cb")
    val da = (d19(nTot) * d19(col("__cuma")) - d19(col("n_a")) * d19(bj))
      .cast("double")
    val db = (d19(nTot) * d19(col("__cumb")) - d19(col("n_b")) * d19(bj))
      .cast("double")
    val nd = nTot.cast("double")
    val bd = bj.cast("double")
    val ld = lj.cast("double")
    def term(dx: Column, nx: Column) =
      round(ld * dx * dx / (nd * bd * (nd - bd) * nx), 9)
        .cast("decimal(28,9)")
    pooledEcdf(df, groupCol, valueCol, groupA, groupB)
      .where(col("n_a") > 0 && col("n_b") > 0 && bj < nTot)
      .select(col("n_a"), col("n_b"),
        term(da, col("n_a").cast("double")).as("__ta"),
        term(db, col("n_b").cast("double")).as("__tb"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_support"),
        round(sum(col("__ta")).cast("double") +
          sum(col("__tb")).cast("double"), 6).as("a2"))
  }

  /**
   * P333 — split-half reliability with the Spearman–Brown correction:
   * split each unit's observations by a deterministic parity, correlate
   * the half-means across units, and step the half-test correlation up
   * to full-test length: SB = 2r/(1+r) — the internal-consistency read
   * beside P277's Cronbach α (α needs k parallel items; split-half
   * needs only ONE measure and a coin). Emits ONE row: n_units, r,
   * spearman_brown; degenerate halves (zero variance, r = −1) null.
   *
   * Shape: one (unit, parity) mean agg, a conditional pivot to
   * (even, odd) columns, one moment agg — no windows. Cross-engine:
   * half-means are 6-rounded decimal-sum means; the correlation runs
   * the o11 moment discipline on exact (18,6) products; SB is one
   * fixed double sequence rounded at 6. Units missing either half
   * drop (a one-sided unit has no pair).
   */
  def splitHalfReliability(df: DataFrame, unitCol: String,
      splitCol: String, valueCol: String): DataFrame = {
    val base = df.where(col(unitCol).isNotNull && col(splitCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(unitCol).as("__u"),
        pmod(col(splitCol).cast("long"), lit(2L)).as("__h"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
    val halves = base.groupBy(col("__u"), col("__h"))
      .agg(round(sum(col("__v")).cast("double") /
        count(lit(1)).cast("double"), 6).as("__m"))
    val wide = halves.groupBy(col("__u"))
      .agg(max(when(col("__h") === 0L, col("__m"))).as("__e"),
        max(when(col("__h") === 1L, col("__m"))).as("__o"))
      .where(col("__e").isNotNull && col("__o").isNotNull)
    val dx = col("__e").cast("decimal(18,6)")
    val dy = col("__o").cast("decimal(18,6)")
    val m = wide.agg(count(lit(1)).as("n_units"),
      sum(dx).cast("double").as("__sx"),
      sum(dy).cast("double").as("__sy"),
      sum(dx * dy).cast("double").as("__sxy"),
      sum(dx * dx).cast("double").as("__sxx"),
      sum(dy * dy).cast("double").as("__syy"))
    val nd = col("n_units").cast("double")
    val uxy = nd * col("__sxy") - col("__sx") * col("__sy")
    val uxx = nd * col("__sxx") - col("__sx") * col("__sx")
    val uyy = nd * col("__syy") - col("__sy") * col("__sy")
    val r = uxy / sqrt(uxx * uyy)
    val ok = col("n_units") > 1 && uxx > 0 && uyy > 0
    m.select(col("n_units"),
      when(ok, round(r, 6)).as("r"),
      when(ok, when(lit(1.0) + r =!= 0.0,
        round(lit(2.0) * r / (lit(1.0) + r), 6))).as("spearman_brown"))
  }

  /**
   * P334 — Poisson dispersion (overdispersion) test per group: for
   * per-unit event counts, D = s²/x̄ and the index-of-dispersion
   * statistic (n−1)·s²/x̄ ~ χ²(n−1) under a Poisson process — THE
   * burst/bot detector for count metrics (organic arrivals read
   * D ≈ 1; campaign bursts and retry storms read D ≫ 1; a capped or
   * deduplicated feed reads D < 1). Emits per group: n_units, mean,
   * variance, dispersion, chi2, dof; a zero mean or singleton group
   * nulls the test.
   *
   * Shape: ONE keyed moment agg. Cross-engine: counts are exact
   * BIGINTs, moments exact DECIMAL(19,0)² integer products; the
   * closing ratios are fixed double sequences rounded at 6.
   */
  def poissonDispersion(df: DataFrame, groupCol: String,
      countCol: String): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val base = df.where(col(groupCol).isNotNull && col(countCol).isNotNull)
      .select(col(groupCol).as("__g"), col(countCol).cast("long").as("__c"))
    val m = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_units"), sum(col("__c")).as("__s1"),
        sum(d19(col("__c")) * d19(col("__c"))).cast("double").as("__s2"))
    val nd = col("n_units").cast("double")
    val s1 = col("__s1").cast("double")
    val mean = s1 / nd
    val varS = (nd * col("__s2") - s1 * s1) / (nd * (nd - lit(1.0)))
    val ok = col("n_units") > 1 && col("__s1") > 0
    m.select(col("__g").as(groupCol), col("n_units"),
      round(mean, 6).as("mean"),
      when(col("n_units") > 1, round(varS, 6)).as("variance"),
      when(ok, round(varS / mean, 6)).as("dispersion"),
      when(ok, round((nd - lit(1.0)) * varS / mean, 6)).as("chi2"),
      (col("n_units") - 1L).as("dof"))
  }

  /**
   * P171 — sample-ratio-mismatch check (the A/B-test smoke alarm): a
   * 1-df chi-square of the observed treatment/control split against the
   * design ratio p — assignment bugs show up HERE before they corrupt
   * any metric, and the test is absurdly sensitive at scale (a 50.5/49.5
   * split on 1M users is a 5-sigma alarm). One row: (n_treat, n_ctrl,
   * chi2, srm) with srm the χ²₁ > 3.841459 call on the rounded stat.
   *
   * One fused conditional count agg; chi2 is a fixed double sequence on
   * exact counts, rounded at 6.
   */
  def srmCheck(df: DataFrame, treatCol: String,
      expectedTreatFrac: Double = 0.5): DataFrame = {
    require(expectedTreatFrac > 0 && expectedTreatFrac < 1,
      s"srmCheck: expectedTreatFrac must be in (0, 1), got $expectedTreatFrac")
    val m = df.where(col(treatCol).isNotNull)
      .agg(sum(when(col(treatCol), 1L).otherwise(0L)).as("n_treat"),
        sum(when(col(treatCol), 0L).otherwise(1L)).as("n_ctrl"))
    val n = (col("n_treat") + col("n_ctrl")).cast("double")
    val e1 = n * lit(expectedTreatFrac)
    val e0 = n * lit(1.0 - expectedTreatFrac)
    val chi2 = (col("n_treat").cast("double") - e1) *
      (col("n_treat").cast("double") - e1) / e1 +
      (col("n_ctrl").cast("double") - e0) *
        (col("n_ctrl").cast("double") - e0) / e0
    m.withColumn("chi2",
        when(col("n_treat") + col("n_ctrl") > 0, round(chi2, 6)))
      .withColumn("srm",
        when(col("chi2").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2") > 3.841459))
  }

  /**
   * P166 — Wald–Wolfowitz runs test per key: is the ordered series
   * RANDOM around its median, or does it cluster/alternate? R = number
   * of maximal same-side runs (values equal to the median are
   * discarded, the standard convention); z = (R − μ)/σ with
   * μ = 2n₁n₂/(n₁+n₂) + 1 — the residual-independence check to run on
   * P157's residuals (too few runs ⇒ the decomposition missed
   * structure). Emits (key, n1, n2, runs, z, random) with the ±1.96
   * two-sided call on the ROUNDED z; either side empty or zero σ² →
   * null z.
   *
   * Shapes: one keyed exact-percentile median (rounded at 6 BEFORE
   * comparisons — the o10 pre-round rule) joined back shuffle_hash,
   * one ordered lag window per key, one fused agg. The z formula runs
   * in doubles over exact integer counts (the products overflow BIGINT
   * past n ≈ 2M — doubles are the portable choice, same fixed
   * sequence both engines).
   */
  def runsTest(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(round(expr(s"percentile(`$valueCol`, 0.5)"), 6).as("__med"))
    val sided = df.join(med.hint("shuffle_hash"), Seq(keyCol.toString))
      .where(col(valueCol) =!= col("__med"))
      .withColumn("__above", col(valueCol) > col("__med"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol).asc)
    val flagged = sided
      .withColumn("__new",
        when(lag(col("__above"), 1).over(w).isNull ||
          lag(col("__above"), 1).over(w) =!= col("__above"), 1L)
          .otherwise(0L))
    val agged = flagged.groupBy(col(keyCol))
      .agg(sum(when(col("__above"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__above"), 0L).otherwise(1L)).as("n2"),
        sum(col("__new")).as("runs"))
    val d1 = col("n1").cast("double")
    val d2 = col("n2").cast("double")
    val nn = d1 + d2
    val mu = lit(2.0) * d1 * d2 / nn + lit(1.0)
    val sig2 = lit(2.0) * d1 * d2 * (lit(2.0) * d1 * d2 - d1 - d2) /
      (nn * nn * (nn - lit(1.0)))
    agged
      .withColumn("z",
        when(col("n1") > 0 && col("n2") > 0 && sig2 > 0,
          round((col("runs").cast("double") - mu) / sqrt(sig2), 6)))
      .withColumn("random",
        when(col("z").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z")) < 1.96))
  }

  /**
   * P163 — paired t-test: t = d̄ / (s_d/√n) over per-subject paired
   * differences — the within-subject companion to P127's Welch test
   * (pairing removes between-subject variance, which is usually most
   * of it; use it whenever pre AND post exist for the SAME key).
   * Feed a (key, diff) frame — e.g. post − pre per user. One row:
   * (n, mean_d, sd_d, t); n < 2 or zero spread → null t.
   *
   * Shapes: ONE fused decimal moment agg (o11 casts). The closing
   * formula is a fixed double sequence with SAMPLE sd (n−1), rounded
   * at 6.
   */
  def pairedTTest(df: DataFrame, diffCol: String): DataFrame = {
    val dec = col(diffCol).cast("decimal(18,6)")
    val dec19 = col(diffCol).cast("decimal(19,6)")
    val m = df.where(col(diffCol).isNotNull)
      .agg(count(lit(1)).as("n"), sum(dec).cast("double").as("__s"),
        sum(dec19 * dec19).cast("double").as("__q"))
    val nd = col("n").cast("double")
    val mean = col("__s") / nd
    val varS = greatest((col("__q") - nd * mean * mean) / (nd - lit(1.0)),
      lit(0.0))
    m.withColumn("mean_d", round(mean, 6))
      .withColumn("sd_d", when(col("n") >= 2, round(sqrt(varS), 6)))
      .withColumn("t",
        when(col("n") >= 2 && varS > 0,
          round(mean / (sqrt(varS) / sqrt(nd)), 6)))
      .select("n", "mean_d", "sd_d", "t")
  }

  /**
   * P154 — Weight-of-Evidence encoding + Information Value: per category
   * c, woe_c = ln(((n1_c + 0.5)/N1) / ((n0_c + 0.5)/N0)) (the 0.5
   * Laplace guard keeps empty cells finite) and iv_term =
   * (n1_c/N1 − n0_c/N0)·woe_c; `iv` repeats the category sum — the
   * credit-scoring categorical encoder, and IV is the standard
   * predictive-power screen (< 0.02 useless, > 0.5 suspicious).
   *
   * Shapes: ONE keyed conditional count agg + the 1-row totals
   * broadcast (P125 idiom); the iv sum is a window over the
   * category-sized frame. Cross-engine: counts exact, woe/iv_term round
   * at 9 post-ln (the libm firewall), iv DECIMAL-sums the rounded
   * terms.
   */
  def woeEncode(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val pos = when(col(labelCol), 1L).otherwise(0L)
    val per = df.where(col(catCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(pos).as("n1"), sum(lit(1L) - pos).as("n0"))
    val tot = per.agg(sum(col("n1")).as("__N1"), sum(col("n0")).as("__N0"))
    val woe = round(log(
      ((col("n1").cast("double") + lit(0.5)) / col("__N1").cast("double")) /
        ((col("n0").cast("double") + lit(0.5)) / col("__N0").cast("double"))),
      9)
    val ivTerm = round(
      (col("n1").cast("double") / col("__N1").cast("double") -
        col("n0").cast("double") / col("__N0").cast("double")) * col("woe"), 9)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    per.join(broadcast(tot)) // 1-row scalar side
      .withColumn("woe", woe)
      .withColumn("iv_term", ivTerm)
      .withColumn("iv", round(
        sum(col("iv_term").cast("decimal(28,9)")).over(w).cast("double"), 6))
      .drop("__N1", "__N0")
  }

  /**
   * P155 — Gini concentration coefficient: with x sorted ascending and
   * ranked 1..n, G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) — the inequality
   * summary ("the top 1% of keys hold 40% of the rows") that turns key
   * skew into ONE comparable number; read it next to the P143 Hill α
   * before choosing salting. One row: (n, total, gini). Non-positive
   * totals (all-zero values) have no defined coefficient → null.
   *
   * Shapes: one global rank window (o5 caveat — at 100 TB rank via
   * range-partitioned prefix counts, same arithmetic); Σ i·x and Σx
   * are exact DECIMAL (rank·value products stay decimal), the closing
   * formula one double sequence rounded at 6. Ties are harmless:
   * consecutive ranks over equal values sum identically whatever the
   * tie order.
   */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val d = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("decimal(18,2)").as("__x"))
      .withColumn("__i", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__x").asc))
        .cast("long"))
    d.agg(count(lit(1)).as("n"),
        sum(col("__x")).cast("decimal(28,2)").as("__sx"),
        sum(col("__x") * col("__i").cast("decimal(18,0)"))
          .cast("decimal(38,2)").as("__six"))
      .withColumn("total", round(col("__sx").cast("double"), 2))
      .withColumn("gini",
        when(col("__sx") > 0, round(
          (lit(2.0) * col("__six").cast("double") -
            (col("n") + 1).cast("double") * col("__sx").cast("double")) /
            (col("n").cast("double") * col("__sx").cast("double")), 6)))
      .select("n", "total", "gini")
  }

  /**
   * P148 — difference-in-differences: with a treatment flag and a
   * pre/post flag, DiD = (ȳ_treat,post − ȳ_treat,pre) −
   * (ȳ_ctrl,post − ȳ_ctrl,pre) — the workhorse causal estimate when
   * randomization wasn't available (feature rollouts by cohort, infra
   * migrations by cluster), differencing out both the group's fixed
   * offset and the shared time trend. One row: the four cell means
   * (`m_tpre`…, rounded at 6), cell counts, and `did` (rounded at 6);
   * any empty cell → null did (the estimate does not exist).
   *
   * Shapes: ONE fused conditional aggregate (the o23 Welch idiom) —
   * eight DECIMAL/count cells in a single map-side-combinable pass; the
   * estimate is a fixed double sequence on identical operands.
   */
  def didEstimate(df: DataFrame, treatCol: String, postCol: String,
      valueCol: String): DataFrame = {
    val dec = col(valueCol).cast("decimal(18,6)")
    val cells = Seq(("tpre", true, false), ("tpost", true, true),
      ("cpre", false, false), ("cpost", false, true))
    val aggs = cells.flatMap { case (tag, t, p) =>
      val m = col(treatCol) === t && col(postCol) === p
      Seq(sum(when(m, dec)).cast("double").as(s"__s_$tag"),
        count(when(m, lit(1))).as(s"n_$tag"))
    }
    def mean(tag: String) = col(s"__s_$tag") / col(s"n_$tag").cast("double")
    val allCells = cells.map { case (tag, _, _) => col(s"n_$tag") > 0 }
      .reduce(_ && _)
    val withMeans = cells.foldLeft(
      df.where(col(treatCol).isNotNull && col(postCol).isNotNull &&
          col(valueCol).isNotNull)
        .agg(aggs.head, aggs.tail: _*)) { case (acc, (tag, _, _)) =>
      acc.withColumn(s"m_$tag", when(col(s"n_$tag") > 0, round(mean(tag), 6)))
    }
    withMeans
      .withColumn("did", when(allCells,
        round((mean("tpost") - mean("tpre")) - (mean("cpost") - mean("cpre")),
          6)))
      .select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
        col("m_tpre"), col("m_tpost"), col("m_cpre"), col("m_cpost"),
        col("did"))
  }

  /**
   * P215 — leave-one-out jackknife for the ratio estimator θ = Σx/Σy per
   * group: the delete-one replicates θ₍ᵢ₎ = (Σx−xᵢ)/(Σy−yᵢ), the jackknife
   * bias estimate (n−1)·(θ̄₍·₎−θ) and the jackknife standard error
   * √((n−1)/n · Σ(θ₍ᵢ₎−θ̄₍·₎)²) — the survey-sampling standard for a
   * NONLINEAR statistic (price-per-unit, rate ratios) where the plain
   * variance-of-the-mean formula is wrong. Emits (key, n, theta,
   * theta_loo_mean, bias_jack, se_jack); a group where some Σy−yᵢ = 0
   * raises loudly (its replicate does not exist).
   *
   * Shapes: one keyed decimal-sum agg, joined back shuffle_hash, one
   * fused replicate agg — no windows, no second base-sized join (the
   * deviation sum-of-squares expands to n·Σmᵢ² − (Σmᵢ)² over exact
   * integer replicates). Cross-engine: sums are exact DECIMAL(18,6);
   * each replicate rounds its double division at 6 and scales to the
   * micro-unit BIGINT mᵢ = θ₍ᵢ₎·10⁶ (exact); Σmᵢ² is built from
   * DECIMAL(19,0) factors (the o11/o47 38-digit multiply ceiling) and
   * the n·Σmᵢ² product from a 25×13-digit cast pair for the same
   * reason; the closing sequence is fixed doubles with one IEEE sqrt,
   * rounded at 6.
   */
  def jackknifeRatio(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val sums = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(18,6)")).as("__sx"),
        sum(col("__y").cast("decimal(18,6)")).as("__sy"))
      .withColumn("theta", when(col("__sy") === 0,
          raise_error(concat(lit("jackknifeRatio: zero denominator sum for "),
            col("__k").cast("string"))).cast("double"))
        .otherwise(round(col("__sx").cast("double") /
          col("__sy").cast("double"), 6)))
    val looDen = col("__sy") - col("__y").cast("decimal(18,6)")
    val looTheta = when(looDen === 0,
        raise_error(concat(lit("jackknifeRatio: zero leave-one-out "),
          lit("denominator in group "), col("__k").cast("string")))
          .cast("double"))
      .otherwise(round((col("__sx") - col("__x").cast("decimal(18,6)"))
        .cast("double") / looDen.cast("double"), 6))
    // micro-unit integer replicate: exact, so the SS expansion is exact
    val mi = (looTheta.cast("decimal(18,6)") * 1000000).cast("long")
    val m19 = col("__mi").cast("decimal(19,0)")
    val rep = base.join(sums.hint("shuffle_hash"), Seq("__k"))
      .withColumn("__mi", mi)
      .groupBy(col("__k"), col("n"), col("theta"))
      .agg(sum(col("__mi")).as("__sm"), sum(m19 * m19).as("__sm2"))
    val nd = col("n").cast("double")
    val ssn = (col("__sm2").cast("decimal(25,0)") *
        col("n").cast("decimal(13,0)") -
      col("__sm").cast("decimal(19,0)") * col("__sm").cast("decimal(19,0)"))
      .cast("double")
    rep
      .withColumn("theta_loo_mean",
        round(col("__sm").cast("double") / nd / lit(1.0e6), 6))
      .withColumn("bias_jack",
        round((nd - lit(1.0)) *
          (col("theta_loo_mean").cast("decimal(18,6)") -
            col("theta").cast("decimal(18,6)")).cast("double"), 6))
      .withColumn("se_jack",
        round(sqrt(((nd - lit(1.0)) * ssn) / (nd * nd) / lit(1.0e12)), 6))
      .select(col("__k").as(keyCol), col("n"), col("theta"),
        col("theta_loo_mean"), col("bias_jack"), col("se_jack"))
  }

  /**
   * P227 — randomization (permutation) test for a difference in means:
   * re-assign every unit to arm A/B by a deterministic per-round hash
   * coin, recompute the mean difference per round, and report
   * p = (1 + #{|diff_r| ≥ |observed|}) / (R + 1) — the
   * distribution-free significance readout that needs NO normality or
   * variance assumption (the honest fallback when o23/o15's
   * preconditions fail), with the "+1" correction keeping p > 0 as
   * Monte Carlo practice requires. Emits ONE row (n_a, n_b, diff_obs,
   * n_perms, n_ge, p_value). Hash re-assignment is the standard
   * large-sample approximation of an exact permutation (group sizes
   * vary binomially instead of being fixed) — documented, and the same
   * construction P191's Poisson bootstrap uses.
   *
   * Shapes: one fused observed agg, a broadcast R-row round ladder
   * cross-joined onto the scan (the P191 idiom), one per-round
   * conditional decimal agg, one R-row closing agg. Cross-engine: the
   * coin is integer hash parity (no double threshold); means round at 6
   * and the differences/comparisons run in DECIMAL on the rounded
   * means (the o46 rule); p is one double division of exact BIGINTs.
   */
  def permutationTestMeans(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, resamples: Int = 32): DataFrame = {
    require(resamples >= 8 && resamples <= 256,
      s"permutationTestMeans: resamples must be in 8..256, got $resamples")
    // same map-side md5-per-(row, replica) shape as bootstrapMeanCI —
    // fan a below-parallelism input out first (no-op at scale)
    val base = graft.Graft.parallelizeMap(df)
      .where(col(idCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), col(groupCol).cast("boolean").as("__g"),
        col(valueCol).cast("double").as("__v"))
    val dec = col("__v").cast("decimal(18,6)")
    def meanDiff(flag: org.apache.spark.sql.Column) = (
      sum(when(flag, dec)).cast("double"),
      sum(when(flag, 1L).otherwise(0L)),
      sum(when(!flag, dec)).cast("double"),
      sum(when(!flag, 1L).otherwise(0L)))
    val (sa, na, sb, nb) = meanDiff(col("__g"))
    val obs = base.agg(na.as("n_a"), nb.as("n_b"),
      sa.as("__sa"), sb.as("__sb"))
      .withColumn("diff_obs",
        (round(col("__sa") / col("n_a").cast("double"), 6)
          .cast("decimal(18,6)") -
         round(col("__sb") / col("n_b").cast("double"), 6)
          .cast("decimal(18,6)")).cast("double"))
      .select(col("n_a"), col("n_b"), col("diff_obs"))
    val grid = df.sparkSession
      .createDataFrame((0 until resamples).map(Tuple1(_))).toDF("r")
    val coin = Sampling.hashValue(
      concat(col("r").cast("string"), lit(":"), col("__id").cast("string")),
      "perm:") % 2 === 0
    val (psa, pna, psb, pnb) = meanDiff(coin)
    val rounds = base.crossJoin(broadcast(grid))
      .groupBy(col("r"))
      .agg(pna.as("__na"), pnb.as("__nb"), psa.as("__psa"), psb.as("__psb"))
      .where(col("__na") > 0 && col("__nb") > 0) // P(∅ arm) ≈ 2^-n: drop
      .withColumn("__diff",
        (round(col("__psa") / col("__na").cast("double"), 6)
          .cast("decimal(18,6)") -
         round(col("__psb") / col("__nb").cast("double"), 6)
          .cast("decimal(18,6)")))
    rounds.crossJoin(broadcast(obs)) // 1-row scalar side
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("diff_obs")).as("diff_obs"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("__diff")) >=
            abs(col("diff_obs").cast("decimal(18,6)")), 1L).otherwise(0L))
          .as("n_ge"))
      .withColumn("p_value",
        round((col("n_ge") + lit(1L)).cast("double") /
          (col("n_perms") + lit(1L)).cast("double"), 6))
      .select(col("n_a"), col("n_b"), col("diff_obs"), col("n_perms"),
        col("n_ge"), col("p_value"))
  }

  /**
   * P219 — McNemar's test for paired binary outcomes: given one row per
   * unit with a before-flag and an after-flag, the discordant-pair
   * counts b (yes→no) and c (no→yes) and χ² = (b−c)²/(b+c) read against
   * the χ²₁ 95% bar (3.841) — THE before/after test for conversion-type
   * metrics on the SAME units, where the two-proportion z (q17) is
   * wrong because the samples aren't independent. Emits ONE row
   * (n, n_both, n_neither, b_only, c_only, chi2, significant); no
   * discordant pairs (b+c = 0) → null chi2/significant (the estimate
   * does not exist — concordant pairs carry no information here).
   *
   * Shape: one fused map-side-combinable conditional count agg — no
   * window, no join. Cross-engine: counts are exact BIGINTs ((b−c)²
   * stays far below 2⁶² for any pair count under ~3·10⁹); χ² is one
   * double division on exact integer operands, rounded at 6.
   */
  def mcnemarTest(df: DataFrame, beforeCol: String,
      afterCol: String): DataFrame = {
    val bf = col(beforeCol).cast("boolean")
    val af = col(afterCol).cast("boolean")
    val agg = df.where(bf.isNotNull && af.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(bf && af, 1L).otherwise(0L)).as("n_both"),
        sum(when(!bf && !af, 1L).otherwise(0L)).as("n_neither"),
        sum(when(bf && !af, 1L).otherwise(0L)).as("b_only"),
        sum(when(!bf && af, 1L).otherwise(0L)).as("c_only"))
    val d = col("b_only") - col("c_only")
    agg
      .withColumn("chi2", when(col("b_only") + col("c_only") > 0,
        round((d * d).cast("double") /
          (col("b_only") + col("c_only")).cast("double"), 6)))
      .withColumn("significant",
        when(col("chi2").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2") > 3.841))
  }

  /** The shared ANOVA moment pass (P223/P305): ONE keyed agg then one
    * k-row closing agg producing (k_groups, n, ssb, ssw, __ng2) — the
    * exact decimal discipline documented on [[oneWayAnova]], extracted
    * so the ICC cannot drift from the F test's sums of squares. __ng2
    * (Σn_i² as exact decimal) is consumed only by [[iccOneWay]]'s
    * unbalanced-design correction. */
  private def anovaTotals(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val d18 = col("__v").cast("decimal(18,6)")
    val d19 = col("__v").cast("decimal(19,6)")
    val g = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("__ng"), sum(d18).as("__sg"),
        sum(d19 * d19).as("__qg"))
      .withColumn("__tg",
        round(col("__sg").cast("double") * col("__sg").cast("double") /
          col("__ng").cast("double"), 6).cast("decimal(28,6)"))
    val tot = g.agg(count(lit(1)).as("k_groups"),
      sum(col("__ng")).as("n"),
      sum(col("__sg")).as("__s"), sum(col("__qg")).as("__q"),
      sum(col("__tg")).as("__b"),
      sum(col("__ng").cast("decimal(19,0)") *
        col("__ng").cast("decimal(19,0)")).as("__ng2"))
    val nd = col("n").cast("double")
    val sd = col("__s").cast("double")
    tot
      .withColumn("ssb",
        round(col("__b").cast("double") - sd * sd / nd, 6))
      // Q and B are both exact decimals: round their DIFFERENCE in
      // decimal, never the double (the o46 half-boundary rule). The
      // down-casts keep the subtraction inside BOTH engines' 38-digit
      // decimal ceiling (DuckDB widens add/sub by one digit).
      .withColumn("ssw",
        round(col("__q").cast("decimal(30,12)") -
          col("__b").cast("decimal(24,6)"), 6).cast("double"))
  }

  /**
   * P223 — one-way ANOVA over `valueCol` by `keyCol`: between/within
   * sums of squares, F = (SSB/(k−1))/(SSW/(N−k)) and effect size
   * η² = SSB/(SSB+SSW) — "do the group means differ at all", the
   * k-group front door before any pairwise o23/o34 test (running C(k,2)
   * t-tests instead is the multiple-testing mistake P212 exists to
   * catch). Emits ONE row (k_groups, n, ssb, ssw, f, eta2); k = 1, all
   * singletons (N = k) or zero within-variance null the F; a zero total
   * sum of squares nulls η².
   *
   * Shapes: one keyed moment agg, then one k-row closing agg — no
   * windows, no joins. Cross-engine: group sums are exact DECIMAL
   * ((18,6) values, (19,6) squares); each group's S²/n term is a
   * full-precision double quotient rounded at 6 then DECIMAL(28,6)-
   * summed (a k-term double sum would be partition-order-dependent);
   * SSW = Q − B is computed and 6-rounded ENTIRELY in DECIMAL (both
   * operands are exact decimals, so the double difference would sit on
   * half-up boundaries — the o46 rule); the closing F/η² sequence is
   * fixed doubles on those exact operands, rounded at 6.
   */
  def oneWayAnova(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val out = anovaTotals(df, keyCol, valueCol)
    val nd = col("n").cast("double")
    val kd = col("k_groups").cast("double")
    val sst = (col("ssb").cast("decimal(28,6)") +
      col("ssw").cast("decimal(28,6)")).cast("double")
    out
      .withColumn("f",
        when(col("k_groups") > 1 && col("n") > col("k_groups") &&
            col("ssw") > 0,
          round((col("ssb") / (kd - lit(1.0))) /
            (col("ssw") / (nd - kd)), 6)))
      .withColumn("eta2", when(sst > 0, round(col("ssb") / sst, 6)))
      .select(col("k_groups"), col("n"), col("ssb"), col("ssw"),
        col("f"), col("eta2"))
  }

  /**
   * P231 — Cohen's κ inter-rater agreement between two categorical
   * columns: observed agreement p₀ corrected by the chance agreement
   * p_e of the marginal distributions, κ = (p₀−p_e)/(1−p_e) — THE
   * label-quality statistic for double-annotated data and
   * model-vs-heuristic agreement (raw accuracy flatters any skewed
   * label set; κ does not). Emits ONE row (n, po, pe, kappa); a
   * degenerate table where chance explains everything (p_e = 1) nulls
   * κ.
   *
   * Shapes: one (a, b) cell agg, two category-sized marginal aggs
   * joined on the category, three scalar frames joined broadcast.
   * Cross-engine: κ reduces to the exact BIGINT ratio
   * (n·Σdiag − Σr·c)/(n² − Σr·c) — one double division, rounded at 6;
   * p₀/p_e are the same exact ratios rounded at 6.
   */
  def cohensKappa(df: DataFrame, raterACol: String,
      raterBCol: String): DataFrame = {
    val base = df.where(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val tot = cells.agg(sum(col("__n")).as("n"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("__diag"))
    val marg = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__ra"))
      .join(cells.groupBy(col("__b")).agg(sum(col("__n")).as("__cb"))
          .withColumnRenamed("__b", "__a").hint("shuffle_hash"),
        Seq("__a"), "inner")
      .agg(coalesce(sum(col("__ra") * col("__cb")), lit(0L)).as("__src"))
    tot.join(broadcast(marg)) // two 1-row frames
      .withColumn("po",
        round(col("__diag").cast("double") / col("n").cast("double"), 6))
      .withColumn("pe",
        round(col("__src").cast("double") /
          (col("n") * col("n")).cast("double"), 6))
      .withColumn("kappa",
        when(col("n") * col("n") - col("__src") > 0,
          round((col("n") * col("__diag") - col("__src")).cast("double") /
            (col("n") * col("n") - col("__src")).cast("double"), 6)))
      .select(col("n"), col("po"), col("pe"), col("kappa"))
  }

  /**
   * P232 — decision stump (best single split) for a binary label over
   * one numeric feature: candidate thresholds at the feature's
   * quantiles, per-threshold weighted Gini impurity of the two sides,
   * and the argmin flagged — the first question any tree/GBM answers,
   * exposed as an audit ("how predictive is this ONE feature, and
   * where does it cut") and as leakage detection (a feature whose
   * stump is near-perfect is usually leaking the label). Emits per
   * candidate (thr, n_left, pos_left, n_right, pos_right, gini_split,
   * is_best) with left = feature ≤ thr; the best row is the smallest
   * gini with the smallest threshold as tie-break.
   *
   * Shapes: one percentile agg (the o5 class), the candidate ladder
   * broadcast k-row onto the scan, one fused conditional count agg per
   * threshold, argmin via two scalar joins (NO window — the frame is
   * k-row but the no-new-global-window rule is absolute). Cross-engine:
   * thresholds round at 4; raw features compare against the identical
   * doubles; gini_split is one fixed double sequence over exact BIGINT
   * counts rounded at 6 (zero-row sides contribute exactly 0, guarded
   * against 0·NaN).
   */
  def decisionStump(df: DataFrame, featureCol: String, labelCol: String,
      quantiles: Int = 10): DataFrame = {
    require(quantiles >= 2 && quantiles <= 100,
      s"decisionStump: quantiles must be in 2..100, got $quantiles")
    val base = df.where(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(col(featureCol).cast("double").as("__f"),
        col(labelCol).cast("boolean").as("__l"))
    val fr = (1 until quantiles).map(i => i.toDouble / quantiles)
    val wide = base.agg(
      fr.zipWithIndex.map { case (f, i) =>
        round(expr(s"percentile(__f, $f)"), 4).as(s"__t$i")
      }.head, fr.zipWithIndex.tail.map { case (f, i) =>
        round(expr(s"percentile(__f, $f)"), 4).as(s"__t$i")
      }: _*)
    val thrs = wide
      .select(explode(array((0 until quantiles - 1).map(i =>
        col(s"__t$i")): _*)).as("thr")).distinct()
    val left = col("__f") <= col("thr")
    val counts = base.crossJoin(broadcast(thrs)) // k-row ladder
      .groupBy(col("thr"))
      .agg(sum(when(left, 1L).otherwise(0L)).as("n_left"),
        sum(when(left && col("__l"), 1L).otherwise(0L)).as("pos_left"),
        sum(when(!left, 1L).otherwise(0L)).as("n_right"),
        sum(when(!left && col("__l"), 1L).otherwise(0L)).as("pos_right"))
    def giniTerm(n: org.apache.spark.sql.Column,
        pos: org.apache.spark.sql.Column) = {
      val nd = n.cast("double")
      val pd = pos.cast("double")
      // n·g with g = 1 − (pos/n)² − ((n−pos)/n)²; zero rows → exactly 0
      when(n > 0, nd * (lit(1.0) - (pd / nd) * (pd / nd) -
        ((nd - pd) / nd) * ((nd - pd) / nd))).otherwise(lit(0.0))
    }
    val scored = counts.withColumn("gini_split",
      round((giniTerm(col("n_left"), col("pos_left")) +
        giniTerm(col("n_right"), col("pos_right"))) /
        (col("n_left") + col("n_right")).cast("double"), 6))
    val bestG = scored.agg(min(col("gini_split")).as("__bg"))
    val bestT = scored.join(broadcast(bestG))
      .where(col("gini_split") === col("__bg"))
      .agg(min(col("thr")).as("__bt"))
    scored.join(broadcast(bestG)).join(broadcast(bestT)) // 1-row sides
      .withColumn("is_best",
        col("gini_split") === col("__bg") && col("thr") === col("__bt"))
      .drop("__bg", "__bt")
  }

  /**
   * P224 — Brown–Forsythe (median-based Levene) homogeneity-of-variance
   * test: [[oneWayAnova]] run on the absolute deviations
   * z = |x − median_group| — "can I pool these variances / trust the
   * equal-variance t at all" (the robust variant: means-based Levene
   * inflates under skew, and skewed metrics are the default here).
   * Same output row as the underlying ANOVA; F large ⇒ spreads differ.
   *
   * Shapes: one keyed percentile agg (the o5 class), bounds joined back
   * shuffle_hash, then the ANOVA's aggregates. Cross-engine: medians
   * round at 4 (the o5 rule); each deviation is an exact DECIMAL
   * difference (value at 6, median at 4) whose abs stays exact before
   * the ANOVA's own decimal discipline takes over.
   */
  def leveneBrownForsythe(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val med = base.groupBy(col("__k"))
      .agg(round(expr("percentile(__v, 0.5)"), 4).as("__med"))
    val z = abs(col("__v").cast("decimal(18,6)") -
      col("__med").cast("decimal(18,4)")).cast("double")
    oneWayAnova(
      base.join(med.hint("shuffle_hash"), Seq("__k"))
        .select(col("__k").as("grp"), z.as("z")),
      "grp", "z")
  }

  /**
   * P244 — stratified mean difference: cut a confounding covariate at
   * its quantiles, estimate the arm difference WITHIN each stratum, and
   * pool with stratum-size weights — the adjustment you reach for when
   * P239's balance table flags the covariate (within a stratum the
   * covariate is ~constant, so it can no longer confound the
   * comparison). Emits per stratum (stratum, n_a, n_b, mean_a, mean_b,
   * diff) plus the size-weighted `pooled_diff` repeated on every row;
   * a one-sided stratum nulls its diff and drops out of the pool.
   *
   * Shapes: one covariate percentile agg (the o5 class), thresholds
   * broadcast k-row, one fused conditional agg per stratum, the pool a
   * second (stratum-count-sized) agg joined back broadcast — no
   * windows. Cross-engine: thresholds round at 4, means at 6, diffs
   * in DECIMAL on the rounded means (the o46 rule); the pool is an
   * exact decimal-weighted sum over the stratum frame closed by one
   * rounded division.
   */
  def stratifiedDiff(df: DataFrame, armCol: String, covCol: String,
      valueCol: String, strata: Int = 5): DataFrame = {
    require(strata >= 2 && strata <= 100,
      s"stratifiedDiff: strata must be in 2..100, got $strata")
    val base = df.where(col(armCol).isNotNull && col(covCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(armCol).cast("boolean").as("__arm"),
        col(covCol).cast("double").as("__c"),
        col(valueCol).cast("double").as("__v"))
    val fr = (1 until strata).map(i => i.toDouble / strata)
    val wide = base.agg(
      fr.zipWithIndex.map { case (f, i) =>
        round(expr(s"percentile(__c, $f)"), 4).as(s"__t$i")
      }.head, fr.zipWithIndex.tail.map { case (f, i) =>
        round(expr(s"percentile(__c, $f)"), 4).as(s"__t$i")
      }: _*)
    val stratum = (0 until strata - 1)
      .map(i => when(col("__c") >= col(s"__t$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val perStratum = base.crossJoin(broadcast(wide)) // 1-row thresholds
      .withColumn("stratum", stratum)
      .groupBy(col("stratum"))
      .agg(sum(when(col("__arm"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__arm"), 1L).otherwise(0L)).as("n_b"),
        round(sum(when(col("__arm"), col("__v").cast("decimal(18,6)")))
          .cast("double") /
          sum(when(col("__arm"), 1L).otherwise(0L)).cast("double"), 6)
          .as("mean_a"),
        round(sum(when(!col("__arm"), col("__v").cast("decimal(18,6)")))
          .cast("double") /
          sum(when(!col("__arm"), 1L).otherwise(0L)).cast("double"), 6)
          .as("mean_b"))
      .withColumn("diff",
        when(col("n_a") > 0 && col("n_b") > 0,
          (col("mean_a").cast("decimal(18,6)") -
            col("mean_b").cast("decimal(18,6)")).cast("double")))
    val pool = perStratum.where(col("diff").isNotNull)
      .agg(round(
        sum(col("diff").cast("decimal(18,6)") *
          (col("n_a") + col("n_b")).cast("decimal(13,0)")).cast("double") /
        sum(col("n_a") + col("n_b")).cast("double"), 6).as("pooled_diff"))
    perStratum.crossJoin(broadcast(pool)) // 1-row scalar side
  }

  /**
   * P262 — Hodges–Lehmann shift estimate: the MEDIAN of all pairwise
   * differences between two arms — the robust effect-size companion to
   * P102/P257's rank tests (those say "the arms differ", this says BY
   * HOW MUCH, with a 50% breakdown point where the mean difference has
   * none). Emits ONE row (n_a, n_b, n_pairs, hl_shift, mean_shift) —
   * the mean difference rides along to show what the outliers did to
   * it.
   *
   * SAMPLE-SIZED INPUT REQUIRED (the d18 contract): the estimator is
   * all-pairs BY DEFINITION (n_a·n_b differences); run it on the unit
   * aggregate or a hash sample, never raw rows — enforced with a loud
   * cap. Cross-engine: differences are exact decimals; the median
   * reads their doubles at 4 (the o5 rule); the mean through the
   * decimal sum at 6.
   */
  def hodgesLehmannShift(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, maxPairs: Long = 4000000L): DataFrame = {
    require(groupA != groupB, "hodgesLehmannShift: groups must differ")
    val g = col(groupCol).cast("string")
    val base = df.where(col(valueCol).isNotNull &&
        (g === groupA || g === groupB))
      .select(g.as("__g"), col(valueCol).cast("decimal(18,6)").as("__v"))
    val a = base.where(col("__g") === groupA).select(col("__v").as("__va"))
    val b = base.where(col("__g") === groupB).select(col("__v").as("__vb"))
    val sizes = a.agg(count(lit(1)).as("n_a"))
      .join(b.agg(count(lit(1)).as("n_b")))
      .withColumn("__guard",
        when(col("n_a") * col("n_b") > maxPairs,
          raise_error(concat(
            lit("hodgesLehmannShift: pair count exceeds maxPairs — "),
            lit("aggregate or sample first (the d18 contract)")))
            .cast("long")).otherwise(lit(0L)))
    val diffs = a.crossJoin(b)
      .select((col("__va") - col("__vb")).as("__d"))
    diffs.agg(count(lit(1)).as("n_pairs"),
      round(expr("percentile(CAST(__d AS DOUBLE), 0.5)"), 4).as("hl_shift"),
      round(sum(col("__d").cast("decimal(28,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("mean_shift"))
      .join(broadcast(sizes)) // 1-row scalar side
      // the guard rides INSIDE an output column (adding its constant 0)
      // — a dropped column would let Catalyst prune the raise_error away
      .select((col("n_a") + col("__guard")).as("n_a"), col("n_b"),
        col("n_pairs"), col("hl_shift"), col("mean_shift"))
  }

  /** The shared Friedman rank pass (P259/P306): complete blocks only,
    * block-local rank windows, doubled average ranks — the exact
    * construction documented on [[friedmanTest]], extracted so
    * Kendall's W cannot drift from the χ² it rescales. Returns the
    * ranked cell frame (__b, __t, __m, __k, __avgr2). */
  private def friedmanRanked(df: DataFrame, blockCol: String,
      treatmentCol: String, valueCol: String): DataFrame = {
    val base = df.where(col(blockCol).isNotNull &&
        col(treatmentCol).isNotNull && col(valueCol).isNotNull)
      .select(col(blockCol).as("__b"), col(treatmentCol).as("__t"),
        col(valueCol).cast("double").as("__v"))
    val cells = base.groupBy(col("__b"), col("__t"))
      .agg(round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("__m"))
    val kAgg = cells.select(col("__t")).distinct()
      .agg(count(lit(1)).as("__k"))
    val complete = cells
      .withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("__b"))))
      .crossJoin(broadcast(kAgg)) // 1-row scalar side
      .where(col("__bn") === col("__k"))
    // ORDER BY the cell mean ONLY — rank() must see ties share their
    // minimum rank for the average-rank convention; a tiebreak column
    // would silently hand tied treatments distinct ranks (caught by
    // the all-tied spec case: χ² read 85 instead of 0)
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__m").asc)
    val wTies = Window.partitionBy(col("__b"), col("__m"))
    complete
      .withColumn("__minr", rank().over(wRank).cast("long"))
      .withColumn("__tt", count(lit(1)).over(wTies))
      .withColumn("__avgr2", lit(2L) * col("__minr") + col("__tt") - lit(1L))
  }

  /**
   * P259 — Friedman test for k repeated measures: rank each block's
   * cell means WITHIN the block, sum ranks per treatment, and
   * χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) with k−1 degrees of freedom —
   * the k-condition rank test whose windows are all BLOCK-LOCAL
   * (k-sized), so unlike the pooled-rank family it carries NO global
   * window at any corpus size. Blocks missing any treatment drop (the
   * complete-block design requirement); ties take block-local average
   * ranks (the doubled-rank idiom). Emits ONE row (n_blocks,
   * k_treatments, chi2_f, dof); no complete blocks → null statistic.
   *
   * Shapes: one (block, treatment) cell agg, a scalar treatment count,
   * per-block rank windows (PARTITIONED — k rows each), one treatment
   * rank-sum agg, one k-row closing agg. Cross-engine: cell means
   * round at 6 through decimal sums; doubled average ranks and their
   * squares are exact BIGINTs; the closing sequence is fixed doubles
   * rounded at 6.
   */
  def friedmanTest(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val ranked = friedmanRanked(df, blockCol, treatmentCol, valueCol)
    val perTreatment = ranked.groupBy(col("__t"), col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__avgr2")).as("__r2"))
    val closing = perTreatment.agg(
      max(col("__n")).as("n_blocks"), max(col("__k")).as("k_treatments"),
      sum(col("__r2") * col("__r2")).as("__s4"))
    val nd = col("n_blocks").cast("double")
    val kd = col("k_treatments").cast("double")
    closing.select(col("n_blocks"), col("k_treatments"),
      when(col("n_blocks") > 0 && col("k_treatments") > 1,
        round(lit(12.0) * col("__s4").cast("double") / lit(4.0) /
          (nd * kd * (kd + lit(1.0))) -
          lit(3.0) * nd * (kd + lit(1.0)), 6)).as("chi2_f"),
      when(col("n_blocks") > 0, (col("k_treatments") - 1L).cast("long"))
        .as("dof"))
  }

  /**
   * P260 — Poisson two-rate test (conditional binomial): with exposure
   * = distinct units per arm, test whether arm A's event RATE differs
   * from arm B's via the exact conditioning c₁ | c₁+c₂ ~
   * Binomial(n, e₁/(e₁+e₂)) and its normal approximation — the
   * count-metric A/B test (events per user, errors per host) where the
   * mean-based t is the wrong model. Emits ONE row (units_a, units_b,
   * events_a, events_b, rate_a, rate_b, rate_ratio, z); a zero arm
   * nulls the ratio/z.
   *
   * Shape: ONE fused conditional agg (counts + distinct units).
   * Cross-engine: all counts exact BIGINTs; rates/ratio/z are fixed
   * double sequences on exact operands with one IEEE sqrt, rounded
   * at 6.
   */
  def poissonRateTest(df: DataFrame, armCol: String,
      unitCol: String): DataFrame = {
    val arm = col(armCol).cast("boolean")
    val agg = df.where(arm.isNotNull && col(unitCol).isNotNull)
      .agg(countDistinct(when(arm, col(unitCol))).as("units_a"),
        countDistinct(when(!arm, col(unitCol))).as("units_b"),
        sum(when(arm, 1L).otherwise(0L)).as("events_a"),
        sum(when(!arm, 1L).otherwise(0L)).as("events_b"))
    val e1 = col("units_a").cast("double")
    val e2 = col("units_b").cast("double")
    val c1 = col("events_a").cast("double")
    val c2 = col("events_b").cast("double")
    val p = e1 / (e1 + e2)
    val n = c1 + c2
    val ok = col("units_a") > 0 && col("units_b") > 0 &&
      col("events_a") + col("events_b") > 0
    agg.select(col("units_a"), col("units_b"), col("events_a"),
      col("events_b"),
      when(col("units_a") > 0, round(c1 / e1, 6)).as("rate_a"),
      when(col("units_b") > 0, round(c2 / e2, 6)).as("rate_b"),
      when(ok && col("events_b") > 0,
        round((c1 / e1) / (c2 / e2), 6)).as("rate_ratio"),
      when(ok, round((c1 - n * p) / sqrt(n * p * (lit(1.0) - p)), 6))
        .as("z"))
  }

  /**
   * P257 — Wilcoxon signed-rank test for paired samples: rank the
   * nonzero |differences|, W⁺ = rank sum of the positive side, and the
   * tie-corrected normal approximation
   * z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48) — the paired
   * complement to P102's two-sample rank test (same units before/after,
   * no normality assumption — where P183's paired t needs one). Emits
   * ONE row (n_pairs, n_pos, n_neg, w_plus, z); zero differences drop
   * (the standard convention), all-tied data nulls z.
   *
   * Shape: the pooled |d| ranking is one global-order window — the o5
   * exact-statistic caveat (a rank TEST runs on a sample or a group
   * slice, never the raw 100 TB; bucket values first at that scale).
   * Cross-engine: differences are exact DECIMAL, doubled average ranks
   * are exact BIGINTs (the P102 idiom — no decimal division), the tie
   * term Σ(t³−t) exact BIGINT, and the closing z a fixed double
   * sequence with one IEEE sqrt, rounded at 6.
   */
  def wilcoxonSignedRank(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val d = (col(yCol).cast("decimal(18,6)") -
      col(xCol).cast("decimal(18,6)"))
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(d.as("__d"))
      .where(col("__d") =!= 0)
      .select(col("__d"), abs(col("__d")).as("__ad"))
    val w = Window.orderBy(col("__ad").asc)
    val tiesW = Window.partitionBy(col("__ad"))
    val ranked = base
      .withColumn("__minr", rank().over(w).cast("long"))
      .withColumn("__t", count(lit(1)).over(tiesW))
      .withColumn("__avgr2", lit(2L) * col("__minr") + col("__t") - lit(1L))
    val ties = base.groupBy(col("__ad"))
      .agg(count(lit(1)).as("__tt"))
      .agg(coalesce(sum(col("__tt") * col("__tt") * col("__tt") -
        col("__tt")), lit(0L)).as("__tie3"))
    val agg = ranked.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("__d") > 0, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("__d") < 0, 1L).otherwise(0L)).as("n_neg"),
      sum(when(col("__d") > 0, col("__avgr2")).otherwise(0L)).as("__w2"))
    val nd = col("n_pairs").cast("double")
    val wPlus = col("__w2").cast("double") / lit(2.0)
    val varW = nd * (nd + lit(1.0)) * (lit(2.0) * nd + lit(1.0)) /
      lit(24.0) - col("__tie3").cast("double") / lit(48.0)
    agg.crossJoin(broadcast(ties)) // 1-row scalar side
      .select(col("n_pairs"), col("n_pos"), col("n_neg"),
        round(wPlus, 6).as("w_plus"),
        when(col("n_pairs") > 0 && varW > 0,
          round((wPlus - nd * (nd + lit(1.0)) / lit(4.0)) / sqrt(varW), 6))
          .as("z"))
  }

  /**
   * P258 — Matthews correlation + the confusion-matrix readout for a
   * binary predictor: TP/FP/TN/FN cells and
   * MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) with
   * accuracy, precision, recall and F1 — the single-number classifier
   * score that (unlike accuracy and F1) stays honest under class skew,
   * closing the eval family around P232's stump and P241's calibration.
   * Emits ONE row; a degenerate margin (any factor 0) nulls MCC.
   *
   * Shape: one fused conditional count agg. Cross-engine: all cells
   * exact BIGINTs; the numerator is an exact DECIMAL(19,0)-product
   * difference; the denominator multiplies two exact sub-2⁵³ double
   * products under one sqrt each; ratios round at 6.
   */
  def matthewsCorrelation(df: DataFrame, predCol: String,
      labelCol: String): DataFrame = {
    val pr = col(predCol).cast("boolean")
    val lb = col(labelCol).cast("boolean")
    val agg = df.where(pr.isNotNull && lb.isNotNull)
      .agg(sum(when(pr && lb, 1L).otherwise(0L)).as("tp"),
        sum(when(pr && !lb, 1L).otherwise(0L)).as("fp"),
        sum(when(!pr && !lb, 1L).otherwise(0L)).as("tn"),
        sum(when(!pr && lb, 1L).otherwise(0L)).as("fn"))
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val num = (d19(col("tp")) * d19(col("tn")) -
      d19(col("fp")) * d19(col("fn"))).cast("double")
    val den = sqrt((col("tp") + col("fp")).cast("double") *
        (col("tp") + col("fn")).cast("double")) *
      sqrt((col("tn") + col("fp")).cast("double") *
        (col("tn") + col("fn")).cast("double"))
    val n = col("tp") + col("fp") + col("tn") + col("fn")
    agg
      .withColumn("mcc", when(den > 0, round(num / den, 6)))
      .withColumn("accuracy",
        round((col("tp") + col("tn")).cast("double") / n.cast("double"), 6))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double"), 6)))
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          round((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"),
            6)))
  }

  /**
   * P245 — Lorenz curve points: bucket units at the quantiles of their
   * value, then each bucket's share and CUMULATIVE share of the total —
   * the concentration read behind "the top decile of customers is 45%
   * of revenue" and the curve P147's Gini integrates; as a training-
   * data tool it is the token-concentration audit (how much of the
   * corpus mass lives in the heaviest sources). Emits per bucket
   * (bucket, n_units, sum_v, share, cum_share) with exact decimal
   * sums; the cumulative is a TRIANGULAR join over the bucket-count-
   * sized frame, not a window (the no-new-global-window rule).
   */
  def lorenzPoints(df: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"lorenzPoints: buckets must be in 2..100, got $buckets")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val fr = (1 until buckets).map(i => i.toDouble / buckets)
    val wide = base.agg(
      fr.zipWithIndex.map { case (f, i) =>
        round(expr(s"percentile(__v, $f)"), 4).as(s"__b$i")
      }.head, fr.zipWithIndex.tail.map { case (f, i) =>
        round(expr(s"percentile(__v, $f)"), 4).as(s"__b$i")
      }: _*)
    val bucket = (0 until buckets - 1)
      .map(i => when(col("__v") >= col(s"__b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val per = base.crossJoin(broadcast(wide)) // 1-row boundary frame
      .select(bucket.as("bucket"), col("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("__v").cast("decimal(18,6)")).as("__sv"))
    val total = per.agg(sum(col("__sv")).as("__tot"),
      sum(col("n_units")).as("__n"))
    val cum = per.select(col("bucket").as("__b2"), col("__sv").as("__sv2"))
    per.join(broadcast(cum), col("__b2") <= col("bucket")) // bucket-sized
      .groupBy(col("bucket"), col("n_units"), col("__sv"))
      .agg(sum(col("__sv2")).as("__cum"))
      .join(broadcast(total)) // 1-row scalar side
      .select(col("bucket"), col("n_units"),
        round(col("__sv").cast("double"), 6).as("sum_v"),
        round(col("__sv").cast("double") / col("__tot").cast("double"), 6)
          .as("share"),
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6)
          .as("cum_share"))
  }

  /**
   * P265 — Kruskal–Wallis H test: the k-group rank ANOVA (the unpaired
   * complement to P259's Friedman — independent groups, no blocks, no
   * normality assumption). Pool ALL values, average-rank them, and
   * H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1), divided by the tie correction
   * C = 1 − Σ(t³−t)/(N³−N). Emits ONE row (n_total, k_groups, h,
   * h_tie_corrected, dof); k < 2 or all-tied data nulls the statistic.
   *
   * Shape: the pooled ranking is one global-order window — the o5
   * exact-statistic caveat (a rank test runs on a sample or a group
   * slice, never the raw 100 TB; bucket values first at that scale,
   * the sa13 range-bucket prefix pattern applies verbatim).
   * Cross-engine: doubled average ranks 2·minrank + ties − 1 are exact
   * BIGINTs (the P102 idiom), per-group R_j²/n_j terms are 6-rounded
   * doubles DECIMAL-summed over the k-row group frame (order-safe),
   * tie cubes exact BIGINTs, and the closing H a fixed double sequence
   * rounded at 6.
   */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    val wRank = Window.orderBy(col("__v").asc)
    val wTies = Window.partitionBy(col("__v"))
    val ranked = base
      .withColumn("__minr", rank().over(wRank).cast("long"))
      .withColumn("__tt", count(lit(1)).over(wTies))
      .withColumn("__avgr2", lit(2L) * col("__minr") + col("__tt") - lit(1L))
    // per-group doubled rank sums; the R²/n term is a 6-rounded double on
    // exact BIGINT operands, then DECIMAL-summed over the k-row frame
    val perGroup = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__avgr2")).as("__r2"))
      .select(col("__n"),
        // double product of exactly-representable BIGINTs (< 2^53): one
        // IEEE multiply on identical operands in any engine, and no ANSI
        // long-overflow cliff when N grows past 2^31 doubled-rank sums
        round(col("__r2").cast("double") * col("__r2").cast("double") /
          lit(4.0) / col("__n").cast("double"), 6)
          .cast("decimal(28,6)").as("__term"))
    // tie cubes through DECIMAL(19,0) products (integer scale-0 decimals
    // never hit the fractional-scale cliff; a Long t³ overflows at
    // t ≈ 2.1M tied values — the o36 class)
    def d19k(c: Column) = c.cast("decimal(19,0)")
    val ties = base.groupBy(col("__v")).agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(d19k(col("__t")) * d19k(col("__t")) *
          d19k(col("__t")) - d19k(col("__t"))),
        lit(0L).cast("decimal(38,0)")).as("__tie3"))
    val closing = perGroup.agg(sum(col("__n")).as("n_total"),
      count(lit(1)).as("k_groups"), sum(col("__term")).as("__s"))
      .crossJoin(broadcast(ties)) // 1-row scalar side
    val nd = col("n_total").cast("double")
    val h = round(lit(12.0) * col("__s").cast("double") /
      (nd * (nd + lit(1.0))) - lit(3.0) * (nd + lit(1.0)), 6)
    val c = lit(1.0) - col("__tie3").cast("double") /
      (nd * nd * nd - nd)
    closing.select(col("n_total"), col("k_groups"),
      when(col("k_groups") > 1 && col("n_total") > 1, h).as("h"),
      when(col("k_groups") > 1 && col("n_total") > 1 && c > 0,
        round(h / c, 6)).as("h_tie_corrected"),
      when(col("k_groups") > 1, (col("k_groups") - 1L).cast("long"))
        .as("dof"))
  }

  /**
   * P266 — Cochran's Q test: k matched binary treatments over common
   * blocks (the k-treatment generalization of P215's McNemar — "did ANY
   * of the k pipeline variants change the per-user success flag").
   * Q = (k−1)·(k·ΣC_j² − T²)/(k·T − ΣR_i²) with column totals C_j, row
   * totals R_i, grand total T; Q is invariant to all-0/all-1 blocks
   * (both numerator and denominator cancel them — proved in the spec),
   * so absent (block, treatment) cells are 0-valued rather than
   * dropping the block. Emits ONE row (n_blocks, k_treatments, t_total,
   * q, dof); an invariant-only table (kT = ΣR²) nulls q.
   *
   * Shape: two keyed aggregations (per block, per treatment) — fully
   * partition-parallel, no windows. Cross-engine: every total and
   * square is an exact BIGINT; the closing ratio is one double
   * division rounded at 6.
   */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
      flagCol: String): DataFrame = {
    val base = df.where(col(blockCol).isNotNull &&
        col(treatmentCol).isNotNull && col(flagCol).isNotNull)
      .select(col(blockCol).as("__b"), col(treatmentCol).as("__t"),
        col(flagCol).cast("boolean").cast("long").as("__x"))
    val k = base.select(col("__t")).distinct().agg(count(lit(1)).as("__k"))
    val cols = base.groupBy(col("__t")).agg(sum(col("__x")).as("__c"))
      .agg(sum(col("__c") * col("__c")).as("__sc2"), sum(col("__c")).as("__tt"))
    val rows = base.groupBy(col("__b")).agg(sum(col("__x")).as("__r"))
      .agg(sum(col("__r") * col("__r")).as("__sr2"),
        count(lit(1)).as("n_blocks"))
    val closing = rows.crossJoin(broadcast(cols)) // 1-row scalar sides
      .crossJoin(broadcast(k))
    val den = col("__k") * col("__tt") - col("__sr2")
    closing.select(col("n_blocks"), col("__k").as("k_treatments"),
      col("__tt").as("t_total"),
      when(col("__k") > 1 && den > 0,
        round(((col("__k") - 1L) *
          (col("__k") * col("__sc2") - col("__tt") * col("__tt")))
          .cast("double") / den.cast("double"), 6)).as("q"),
      when(col("__k") > 1, (col("__k") - 1L).cast("long")).as("dof"))
  }

  /**
   * P267 — Cronbach's alpha: internal-consistency reliability of a
   * k-item score (items = feature columns of one unit), α = k/(k−1) ·
   * (1 − Σvar_j / var_total). With integer item scores both variance
   * numerators n·Σx² − (Σx)² are exact BIGINTs and the n(n−1)
   * denominators CANCEL in the ratio — α is one double division on
   * exact integers. Missing (unit, item) cells count as score 0
   * against the full unit roster (the flag-matrix convention, same as
   * cochranQ). Emits ONE row (n_units, k_items, sum_item_var_num,
   * total_var_num, alpha); k < 2 or a constant total nulls alpha.
   *
   * Shape: two keyed aggregations (per item, per unit) over the sparse
   * score frame — absent cells never materialize (Σx/Σx² are unchanged
   * by zeros; only the roster count n matters). No windows.
   */
  def cronbachAlpha(df: DataFrame, unitCol: String, itemCol: String,
      scoreCol: String): DataFrame = {
    val base = df.where(col(unitCol).isNotNull && col(itemCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(unitCol).as("__u"), col(itemCol).as("__i"),
        col(scoreCol).cast("long").as("__x"))
    val n = base.select(col("__u")).distinct().agg(count(lit(1)).as("__n"))
    val k = base.select(col("__i")).distinct().agg(count(lit(1)).as("__k"))
    // per-item variance numerator n·Σx² − (Σx)²; zeros from absent cells
    // leave both sums unchanged, so the sparse frame suffices
    val items = base.groupBy(col("__i"))
      .agg(sum(col("__x") * col("__x")).as("__sx2"), sum(col("__x")).as("__sx"))
    val units = base.groupBy(col("__u")).agg(sum(col("__x")).as("__t"))
      .agg(sum(col("__t") * col("__t")).as("__st2"), sum(col("__t")).as("__st"))
    val itemAgg = items.crossJoin(broadcast(n)) // 1-row scalar side
      .select((col("__n") * col("__sx2") - col("__sx") * col("__sx"))
        .as("__vnum"))
      .agg(sum(col("__vnum")).as("sum_item_var_num"))
    val closing = units.crossJoin(broadcast(itemAgg))
      .crossJoin(broadcast(n)).crossJoin(broadcast(k))
      .withColumn("total_var_num",
        col("__n") * col("__st2") - col("__st") * col("__st"))
    closing.select(col("__n").as("n_units"), col("__k").as("k_items"),
      col("sum_item_var_num"), col("total_var_num"),
      when(col("__k") > 1 && col("total_var_num") > 0,
        round(col("__k").cast("double") / (col("__k") - 1L).cast("double") *
          (lit(1.0) - col("sum_item_var_num").cast("double") /
            col("total_var_num").cast("double")), 6)).as("alpha"))
  }

  /**
   * P271 — Durbin–Watson autocorrelation diagnostic on per-key OLS
   * residuals: DW = Σ(e_t − e_{t−1})² / Σe_t² over the x-ordered
   * residuals of [[olsFit]] — the "is the trend line lying" check
   * (DW ≈ 2 independent residuals, → 0 positive autocorrelation: a
   * seasonal or regime pattern the line can't see, → 4 negative).
   * Requires an INTEGRAL x (a day/sequence index): slope·x then stays
   * at decimal scale 6 and every residual is EXACT — the decimal-
   * product scale cliff (o47 lesson) never opens. Emits per key
   * (key, n_obs, dw); keys without a fit (degenerate x) or with zero
   * residual energy are null.
   *
   * Shape: olsFit's keyed agg, a shuffle_hash join back (post-agg side
   * has no stats — the d11 rule), one key-partitioned lag window, one
   * closing keyed agg. Cross-engine: residuals are exact micro-unit
   * BIGINTs; their squares go through DECIMAL(19,0) products (exact,
   * no ANSI overflow cliff — the o31/gr6 width rule); DW is one double
   * division rounded at 6.
   */
  def durbinWatson(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val fit = olsFit(df, keyCol, xCol, yCol)
      .where(col("slope").isNotNull)
      .select(col(keyCol), col("slope").cast("decimal(18,6)").as("__sl"),
        col("intercept").cast("decimal(18,6)").as("__ic"))
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .join(fit.hint("shuffle_hash"), Seq(keyCol))
      .select(col(keyCol),
        col(xCol).cast("long").as("__x"),
        // integral x at DECIMAL(9,0): the slope product stays (27,6) —
        // exact in both engines, far from any width cap
        (col(yCol).cast("decimal(18,6)") - col("__ic") -
          col("__sl") * col(xCol).cast("decimal(9,0)")).as("__e"))
      .select(col(keyCol), col("__x"),
        // re-anchor the (28,6) residual at (18,6) BEFORE scaling: the
        // ×10⁶ on the wide type would cross DuckDB's width-38 multiply
        // ceiling; the cast is exact (same scale, residuals ≪ 10¹²)
        (col("__e").cast("decimal(18,6)") * lit(1000000L)).cast("long")
          .as("__em"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val diffed = base.withColumn("__dm", col("__em") - lag(col("__em"), 1).over(w))
    diffed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(d19(col("__dm")) * d19(col("__dm"))).as("__num"),
        sum(d19(col("__em")) * d19(col("__em"))).as("__den"))
      .withColumn("dw",
        when(col("__den") > 0 && col("__num").isNotNull,
          round(col("__num").cast("double") / col("__den").cast("double"),
            6)))
      .drop("__num", "__den")
  }

  /**
   * P289 — Deming regression (errors-in-both-variables, δ = 1): the
   * orthogonal fit whose slope
   * (U_yy − U_xx + √((U_yy − U_xx)² + 4U_xy²)) / (2U_xy) treats x as
   * noisy too — the calibration-comparison line ([[olsFit]]
   * systematically FLATTENS slope when x carries error; the spec shows
   * the attenuation). Uses the scaled central moments U_xx = n·Σx² −
   * (Σx)² etc. (the formula is homogeneous, the n² factor cancels).
   * Emits per key (key, n, slope, intercept, ols_slope); U_xy = 0 or a
   * degenerate x nulls the fit.
   *
   * Shape: the olsFit single keyed agg — moments through exact
   * DECIMAL(19,6) products, then one fixed double closing sequence
   * with one IEEE sqrt, rounded at 6.
   */
  def demingFit(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    // products at (18,6)×(18,6) = (37,12): EXACT in Spark. A (19,6)
    // product types as (38,11) here (precision 39 caps, scale drops)
    // while DuckDB keeps (38,12) — the r10 decimal-product cliff
    val dx = col(xCol).cast("decimal(18,6)")
    val dy = col(yCol).cast("decimal(18,6)")
    val sums = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(dx).cast("double").as("__sx"),
        sum(dy).cast("double").as("__sy"),
        sum(dx * dy).cast("double").as("__sxy"),
        sum(dx * dx).cast("double").as("__sxx"),
        sum(dy * dy).cast("double").as("__syy"))
    val nd = col("n").cast("double")
    val uxx = nd * col("__sxx") - col("__sx") * col("__sx")
    val uyy = nd * col("__syy") - col("__sy") * col("__sy")
    val uxy = nd * col("__sxy") - col("__sx") * col("__sy")
    val slope = (uyy - uxx + sqrt((uyy - uxx) * (uyy - uxx) +
      lit(4.0) * uxy * uxy)) / (lit(2.0) * uxy)
    val ok = col("__sxx").isNotNull && uxy =!= 0.0 && uxx > 0
    sums
      .withColumn("slope", when(ok, round(slope, 6)))
      .withColumn("intercept",
        when(ok, round((col("__sy") - slope * col("__sx")) / nd, 6)))
      .withColumn("ols_slope", when(ok, round(uxy / uxx, 6)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /**
   * P298 — odds ratio with Woolf confidence interval: for a 2×2
   * exposure/outcome table, OR = (a·d)/(b·c) and the 95% CI from
   * ln OR ± 1.96·√(1/a + 1/b + 1/c + 1/d) — the effect-size reading
   * beside P95's χ² verdict (χ² says "associated", OR says "how
   * strongly, in which direction"). Emits ONE row (a, b, c, d,
   * odds_ratio, ci_low, ci_high); a zero cell nulls everything (the
   * classical estimator is undefined — callers wanting the Haldane
   * +0.5 correction can add it to the counts).
   *
   * Shape: one fused conditional agg. Cross-engine: cells exact
   * BIGINTs; OR goes through exact DECIMAL(19,0) cell products and
   * one division; the CI is a fixed double sequence through the
   * 6-rounded ln (the o33/q11 firewall) with one IEEE sqrt/exp each,
   * rounded at 6.
   */
  def oddsRatio(df: DataFrame, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("boolean")
    val o = col(outcomeCol).cast("boolean")
    val agg = df.where(e.isNotNull && o.isNotNull)
      .agg(sum(when(e && o, 1L).otherwise(0L)).as("a"),
        sum(when(e && !o, 1L).otherwise(0L)).as("b"),
        sum(when(!e && o, 1L).otherwise(0L)).as("c"),
        sum(when(!e && !o, 1L).otherwise(0L)).as("d"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val orRatio = (d19(col("a")) * d19(col("d"))).cast("double") /
      (d19(col("b")) * d19(col("c"))).cast("double")
    val lnOr = round(log(orRatio), 6)
    val se = sqrt(lit(1.0) / col("a").cast("double") +
      lit(1.0) / col("b").cast("double") +
      lit(1.0) / col("c").cast("double") +
      lit(1.0) / col("d").cast("double"))
    agg.select(col("a"), col("b"), col("c"), col("d"),
      when(ok, round(orRatio, 6)).as("odds_ratio"),
      when(ok, round(exp(lnOr - lit(1.96) * se), 6)).as("ci_low"),
      when(ok, round(exp(lnOr + lit(1.96) * se), 6)).as("ci_high"))
  }

  /** Round a double at 6 decimals on the DRIVER (HALF_UP — matching SQL
    * round) for embedding as a boundary literal on both engine sides. */
  private def round6Driver(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The SPRT per-trial log-likelihood increments and Wald boundaries
    * for H₀: p = p0 vs H₁: p = p1 at error rates (alpha, beta) —
    * computed ONCE on the driver so the operator and any oracle
    * generator embed IDENTICAL double literals (the sa8 libm firewall:
    * neither engine ever calls ln at runtime). Returns
    * (lnSuccess, lnFailure, upper6, lower6) with the boundaries
    * pre-rounded at 6 for knife-edge-free crossing comparisons. */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
      beta: Double): (Double, Double, Double, Double) = {
    require(p0 > 0 && p1 > p0 && p1 < 1,
      s"sprtConstants: need 0 < p0 < p1 < 1, got ($p0, $p1)")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"sprtConstants: need alpha, beta in (0, 0.5), got ($alpha, $beta)")
    (math.log(p1 / p0), math.log((1.0 - p1) / (1.0 - p0)),
      round6Driver(math.log((1.0 - beta) / alpha)),
      round6Driver(math.log(beta / (1.0 - alpha))))
  }

  /**
   * P275 — SPRT ladder (Wald's sequential probability ratio test): per
   * arm, the cumulative log-likelihood ratio of H₁: p = p1 against
   * H₀: p = p0 over ordered (conversions, trials) batches, with the
   * decision boundaries ln((1−β)/α) and ln(β/(1−α)) — the "stop the
   * A/B test early, with error control" audit (peeking at a fixed-
   * horizon z-test inflates α; the SPRT is the test DESIGNED for
   * peeking). Emits the full per-(arm, period) ladder: conversions,
   * trials, llr, upper/lower bounds, crossed_upper, crossed_lower.
   *
   * Shape: one arm-partitioned cumulative window over the per-period
   * frame (periods per arm, not raw trials — agg-sized). Cross-engine:
   * the ln increments and boundaries are [[sprtConstants]] driver
   * literals embedded identically on both sides; per-period terms are
   * fixed double sequences on exact BIGINT counts rounded at 9 and
   * DECIMAL(28,9)-summed; crossings compare the 6-rounded llr against
   * 6-rounded boundary literals (no knife edge).
   */
  def sprtLadder(df: DataFrame, armCol: String, ordCol: String,
      convCol: String, trialCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    val (la, lb, up6, lo6) = sprtConstants(p0, p1, alpha, beta)
    val base = df.where(col(armCol).isNotNull && col(ordCol).isNotNull &&
        col(convCol).isNotNull && col(trialCol).isNotNull)
      .select(col(armCol).as("arm"), col(ordCol).as("period"),
        col(convCol).cast("long").as("conversions"),
        col(trialCol).cast("long").as("trials"))
    val term = round(col("conversions").cast("double") * lit(la) +
      (col("trials") - col("conversions")).cast("double") * lit(lb), 9)
      .cast("decimal(28,9)")
    val wCum = Window.partitionBy(col("arm")).orderBy(col("period").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    base.withColumn("__t", term)
      .withColumn("llr", round(sum(col("__t")).over(wCum).cast("double"), 6))
      .withColumn("upper_bound", lit(up6))
      .withColumn("lower_bound", lit(lo6))
      .withColumn("crossed_upper", col("llr") >= lit(up6))
      .withColumn("crossed_lower", col("llr") <= lit(lo6))
      .drop("__t")
  }

  /**
   * P299 — Mantel–Haenszel pooled odds ratio + Cochran–MH statistic
   * across strata: the confounder-adjusted 2×2 analysis (P298's crude OR
   * can reverse under Simpson's paradox — P160's `o28_did` cousin for
   * binary outcomes). Per stratum i with cells (aᵢ, bᵢ, cᵢ, dᵢ) and
   * nᵢ = aᵢ+bᵢ+cᵢ+dᵢ: OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), and the CMH
   * χ²(1) = (Σ(aᵢ − Eᵢ))² / ΣVᵢ with Eᵢ = (aᵢ+bᵢ)(aᵢ+cᵢ)/nᵢ and
   * Vᵢ = (aᵢ+bᵢ)(cᵢ+dᵢ)(aᵢ+cᵢ)(bᵢ+dᵢ)/(nᵢ²(nᵢ−1)). Emits ONE row
   * (k_strata, n, mh_or, cmh); a degenerate table (ΣS = 0 / ΣV = 0)
   * nulls the affected statistic.
   *
   * Shape: one (stratum)-keyed fused conditional agg, then one scalar
   * agg — two map-side-combinable passes, no joins. Cross-engine: cells
   * are exact BIGINTs; the per-stratum ratio terms are fixed double
   * sequences on exact-integer-valued doubles, rounded at 9 and
   * DECIMAL(28,9)-summed (a raw double Σ is partition-order-dependent);
   * final quotients rounded at 6.
   */
  def mantelHaenszel(df: DataFrame, stratumCol: String, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("boolean")
    val o = col(outcomeCol).cast("boolean")
    val cells = df
      .where(col(stratumCol).isNotNull && e.isNotNull && o.isNotNull)
      .groupBy(col(stratumCol))
      .agg(sum(when(e && o, 1L).otherwise(0L)).as("a"),
        sum(when(e && !o, 1L).otherwise(0L)).as("b"),
        sum(when(!e && o, 1L).otherwise(0L)).as("c"),
        sum(when(!e && !o, 1L).otherwise(0L)).as("d"))
    def dbl(c: Column) = c.cast("double")
    val n = col("a") + col("b") + col("c") + col("d")
    val nd = dbl(n)
    def term9(x: Column) = round(x, 9).cast("decimal(28,9)")
    val ex = dbl(col("a") + col("b")) * dbl(col("a") + col("c")) / nd
    val vr = dbl(col("a") + col("b")) * dbl(col("c") + col("d")) *
      dbl(col("a") + col("c")) * dbl(col("b") + col("d")) /
      (nd * nd * (nd - lit(1.0)))
    val terms = cells.select(
      n.as("__n"),
      term9(dbl(col("a")) * dbl(col("d")) / nd).as("__r"),
      term9(dbl(col("b")) * dbl(col("c")) / nd).as("__s"),
      // a single-row stratum has V undefined (n−1 = 0): it carries no
      // information, contribute 0 like the classical treatment
      when(n > 1, term9(dbl(col("a")) - round(ex, 9)))
        .otherwise(lit(BigDecimal(0)).cast("decimal(28,9)")).as("__ae"),
      when(n > 1, term9(vr))
        .otherwise(lit(BigDecimal(0)).cast("decimal(28,9)")).as("__v"))
    val tot = terms.agg(count(lit(1)).as("k_strata"), sum(col("__n")).as("n"),
      sum(col("__r")).cast("double").as("__sr"),
      sum(col("__s")).cast("double").as("__ss"),
      sum(col("__ae")).cast("double").as("__sae"),
      sum(col("__v")).cast("double").as("__sv"))
    tot.select(col("k_strata"), col("n"),
      when(col("__ss") > 0, round(col("__sr") / col("__ss"), 6))
        .as("mh_or"),
      when(col("__sv") > 0,
        round(col("__sae") * col("__sae") / col("__sv"), 6)).as("cmh"))
  }

  /**
   * P300 — risk ratio with Katz confidence interval + Yule's Q: the
   * third 2×2 effect-size reading beside P95's χ² (associated?) and
   * P298's odds ratio (symmetric strength). RR = (a/(a+b))/(c/(c+d))
   * answers the PROSPECTIVE question — "how much likelier is the outcome
   * under exposure" — which the OR overstates whenever the outcome is
   * common; Yule's Q = (ad−bc)/(ad+bc) is the [−1, 1]-normalized
   * association. Katz 95% CI: exp(ln RR ± 1.96·√(1/a − 1/(a+b) + 1/c −
   * 1/(c+d))). Emits ONE row (a, b, c, d, risk_ratio, ci_low, ci_high,
   * yule_q); zero margins null the affected statistics.
   *
   * Shape: one fused conditional agg. Cross-engine: cells exact BIGINTs;
   * RR is a fixed double sequence; the CI goes through the 6-rounded ln
   * (the o33/q11 firewall) with one IEEE sqrt/exp per bound; Yule's Q
   * through exact DECIMAL(19,0) products and exact DECIMAL(38,0)
   * add/subtract, one division, rounded at 6.
   */
  def riskRatio(df: DataFrame, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("boolean")
    val o = col(outcomeCol).cast("boolean")
    val agg = df.where(e.isNotNull && o.isNotNull)
      .agg(sum(when(e && o, 1L).otherwise(0L)).as("a"),
        sum(when(e && !o, 1L).otherwise(0L)).as("b"),
        sum(when(!e && o, 1L).otherwise(0L)).as("c"),
        sum(when(!e && !o, 1L).otherwise(0L)).as("d"))
    def dbl(c: Column) = c.cast("double")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val rr = (dbl(col("a")) / dbl(col("a") + col("b"))) /
      (dbl(col("c")) / dbl(col("c") + col("d")))
    val okRr = col("a") > 0 && col("c") > 0
    val lnRr = round(log(rr), 6)
    val se = sqrt(lit(1.0) / dbl(col("a")) - lit(1.0) / dbl(col("a") + col("b")) +
      lit(1.0) / dbl(col("c")) - lit(1.0) / dbl(col("c") + col("d")))
    val ad = d19(col("a")) * d19(col("d"))
    val bc = d19(col("b")) * d19(col("c"))
    agg.select(col("a"), col("b"), col("c"), col("d"),
      when(okRr, round(rr, 6)).as("risk_ratio"),
      when(okRr, round(exp(lnRr - lit(1.96) * se), 6)).as("ci_low"),
      when(okRr, round(exp(lnRr + lit(1.96) * se), 6)).as("ci_high"),
      when((ad + bc) > 0,
        round((ad - bc).cast("double") / (ad + bc).cast("double"), 6))
        .as("yule_q"))
  }

  /**
   * P301 — Lin's concordance correlation coefficient per key: how far
   * the (x, y) cloud sits from the IDENTITY line y = x — precision
   * (Pearson r) × accuracy (the bias correction C_b). Pearson alone
   * rewards any linear relation; CCC only rewards agreement, which is
   * the question for replicated measurements and metric-vs-metric
   * calibration (the P289 Deming fit answers "what line", CCC answers
   * "how close to THE line"). With population moments: CCC =
   * 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²) = 2·U_xy / (U_xx + U_yy +
   * (S_x − S_y)²) after scaling by n². Emits per key: n, r, ccc,
   * c_b = ccc / r; degenerate clouds (both variances zero) null out.
   *
   * Shape: the olsFit single keyed agg. Cross-engine: moments through
   * exact DECIMAL(18,6)² = (37,12) products (NEVER (19,6)² — the r10
   * scale cliff), then one fixed double closing sequence with one IEEE
   * sqrt, rounded at 6.
   */
  def linCCC(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dx = col(xCol).cast("decimal(18,6)")
    val dy = col(yCol).cast("decimal(18,6)")
    val sums = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(dx).cast("double").as("__sx"),
        sum(dy).cast("double").as("__sy"),
        sum(dx * dy).cast("double").as("__sxy"),
        sum(dx * dx).cast("double").as("__sxx"),
        sum(dy * dy).cast("double").as("__syy"))
    val nd = col("n").cast("double")
    val uxy = nd * col("__sxy") - col("__sx") * col("__sy")
    val uxx = nd * col("__sxx") - col("__sx") * col("__sx")
    val uyy = nd * col("__syy") - col("__sy") * col("__sy")
    val gap = (col("__sx") - col("__sy")) * (col("__sx") - col("__sy"))
    val den = uxx + uyy + gap
    val r = uxy / sqrt(uxx * uyy)
    val ccc = lit(2.0) * uxy / den
    sums
      .withColumn("r", when(uxx > 0 && uyy > 0, round(r, 6)))
      .withColumn("ccc", when(den > 0, round(ccc, 6)))
      .withColumn("c_b",
        when(uxx > 0 && uyy > 0 && uxy =!= 0.0, round(ccc / r, 6)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /**
   * P302 — Bland–Altman agreement analysis per key: mean difference
   * (bias), SD of differences, the 95% limits of agreement
   * d̄ ± 1.96·SD, and the share of points inside them — the method-
   * comparison readout that correlation HIDES (two methods can correlate
   * at 0.99 while one reads 2× the other; the limits of agreement say
   * whether they are interchangeable). Sample (n−1) SD. Emits per key:
   * n, mean_diff, sd_diff, loa_low, loa_high, within_share; n < 2 or a
   * constant difference nulls the SD-derived columns (within_share then
   * reads the degenerate all-inside 1.0 only when the limits exist).
   *
   * Shape: one keyed moment agg + one broadcast join-back for the
   * within-limits count (the limits are key-scalar). Cross-engine:
   * differences are exact DECIMAL(18,6) (differences of 6-decimal
   * values re-cast without rounding), products (37,12)-exact; the
   * limits are fixed double sequences on exact sums — both engines
   * compare each exact diff against bit-identical unrounded bounds, so
   * the inclusive boundary test cannot flip; outputs rounded at 6.
   */
  def blandAltman(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val diff = (col(xCol).cast("decimal(18,6)") -
      col(yCol).cast("decimal(18,6)")).cast("decimal(18,6)")
    val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), diff.as("__d"))
    val m = pts.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__d")).cast("double").as("__sd1"),
        sum(col("__d") * col("__d")).cast("double").as("__sd2"))
    val nd = col("n").cast("double")
    val mean = col("__sd1") / nd
    val varS = (nd * col("__sd2") - col("__sd1") * col("__sd1")) /
      (nd * (nd - lit(1.0)))
    val sd = sqrt(varS)
    val stats = m
      .withColumn("__mean", mean)
      .withColumn("__sd", when(col("n") > 1 && varS > 0, sd))
      .withColumn("__lo", col("__mean") - lit(1.96) * col("__sd"))
      .withColumn("__hi", col("__mean") + lit(1.96) * col("__sd"))
    val within = pts.join(broadcast(stats), Seq("__k"))
      .groupBy(col("__k"))
      .agg(sum(when(col("__lo").isNotNull &&
          col("__d").cast("double") >= col("__lo") &&
          col("__d").cast("double") <= col("__hi"), 1L).otherwise(0L))
        .as("__win"))
    stats.join(broadcast(within), Seq("__k"))
      .select(col("__k").as(keyCol), col("n"),
        round(col("__mean"), 6).as("mean_diff"),
        round(col("__sd"), 6).as("sd_diff"),
        round(col("__lo"), 6).as("loa_low"),
        round(col("__hi"), 6).as("loa_high"),
        when(col("__sd").isNotNull,
          round(col("__win").cast("double") / nd, 6)).as("within_share"))
  }

  /**
   * P303 — Mood's median test: split every observation at the POOLED
   * lower median and χ²-test the above/not-above counts across groups —
   * the k-group location test that survives outliers and wildly
   * non-normal shapes where the ANOVA F is garbage (it only asks "which
   * side of the median", never "how far"). The cut is the exact
   * ⌈n/2⌉-th order statistic (never an interpolated midpoint — an
   * interpolation is a fresh double with its own cross-engine last-ulp
   * life; an order statistic IS a data value). Emits ONE row (k_groups,
   * n, grand_median, above, chi2, dof); a degenerate cut (nothing or
   * everything above) nulls χ².
   *
   * CONTRACT: the value domain must be modest (the o8 histogram /
   * bucket-ladder class — quantities, grades, rounded scores), because
   * the median scan windows over the DISTINCT-VALUE frame. That window
   * is domain-sized, not corpus-sized (PlanFactsSpec-allowlisted).
   *
   * Shape: one value-domain agg + one domain-sized cumulative window
   * for the order statistic, one broadcast of the 1-row cut, one keyed
   * conditional agg, one k-row closing agg. Cross-engine: the cut and
   * all counts are exact (DECIMAL(18,6) values, BIGINT counts);
   * per-group χ² terms are fixed double sequences rounded at 9 and
   * DECIMAL(28,9)-summed; χ² rounds at 6.
   */
  def moodMedianTest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
    val wCum = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
    val tot = base.agg(count(lit(1)).as("__n"))
    val medFrame = cum.crossJoin(broadcast(tot)) // 1-row scalar side
      .where(col("__cum") >=
        floor((col("__n") + lit(1L)).cast("double") / 2.0).cast("long"))
      .agg(min(col("__v")).as("__med"))
    val cells = base.crossJoin(broadcast(medFrame)) // 1-row scalar side
      .groupBy(col("__g"))
      .agg(sum(when(col("__v") > col("__med"), 1L).otherwise(0L)).as("__a"),
        count(lit(1)).as("__ng"), max(col("__med")).as("__med"))
    val t = cells.agg(count(lit(1)).as("k_groups"),
      sum(col("__ng")).as("n"), sum(col("__a")).as("above"),
      max(col("__med")).as("__med"))
    def dbl(c: Column) = c.cast("double")
    val ea = dbl(col("__ng")) * dbl(col("above")) / dbl(col("n"))
    val em = dbl(col("__ng")) * dbl(col("n") - col("above")) / dbl(col("n"))
    val term = (dbl(col("__a")) - ea) * (dbl(col("__a")) - ea) / ea +
      (dbl(col("__ng") - col("__a")) - em) *
        (dbl(col("__ng") - col("__a")) - em) / em
    // the per-group term divides by the expected counts — under a
    // one-sided cut those are 0 and ANSI double division THROWS, so the
    // guard must ride the term itself (when() evaluates lazily), not
    // just the output column
    val chi = cells.crossJoin(broadcast(t.drop("__med"))) // k-row side
      .agg(sum(when(col("above") > 0 && col("above") < col("n"),
        round(term, 9).cast("decimal(28,9)"))
        .otherwise(lit(BigDecimal(0)).cast("decimal(28,9)")))
        .cast("double").as("__chi"))
    t.crossJoin(broadcast(chi)) // 1-row scalar side
      .select(col("k_groups"), col("n"),
        col("__med").cast("double").as("grand_median"), col("above"),
        when(col("above") > 0 && col("above") < col("n") &&
            col("k_groups") > 1, round(col("__chi"), 6)).as("chi2"),
        (col("k_groups") - 1L).as("dof"))
  }

  /**
   * P304 — Bartlett's test for variance homogeneity across k groups:
   * T = ((N−k)·ln S_p² − Σ(nᵢ−1)·ln sᵢ²) / C with the finite-sample
   * correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)) — the variance
   * front door beside P224's Brown–Forsythe (Bartlett is sharper under
   * near-normality, BF is the robust fallback; disagreement between
   * them IS the non-normality signal). Emits ONE row (k_groups, n,
   * pooled_var, c, t_stat, dof); any singleton or zero-variance group
   * nulls the statistic (ln of 0 is the classical undefined case).
   *
   * Shape: one keyed moment agg + one k-row closing agg — no windows,
   * no joins. Cross-engine: group variances come from exact
   * DECIMAL(18,6)² = (37,12) moments as fixed double sequences rounded
   * at 6; every ln runs on a 6-rounded operand and is itself rounded
   * at 6 (the o33/q11 firewall); the three k-term sums round at 9 and
   * go through DECIMAL(28,9).
   */
  def bartlettTest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    val d18 = col("__v").cast("decimal(18,6)")
    val g = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"),
        sum(d18).cast("double").as("__sg"),
        sum(d18 * d18).cast("double").as("__qg"))
    val ngd = col("__ng").cast("double")
    val s6 = when(col("__ng") > 1,
      round((ngd * col("__qg") - col("__sg") * col("__sg")) /
        (ngd * (ngd - lit(1.0))), 6))
    val l6 = when(s6 > 0, round(log(s6), 6))
    def t9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val tot = g.select(col("__ng"), s6.as("__s6"), l6.as("__l6"), ngd.as("__ngd"))
      .agg(count(lit(1)).as("k_groups"), sum(col("__ng")).as("n"),
        min(col("__ng")).as("__minn"), min(col("__s6")).as("__mins"),
        sum(t9((col("__ngd") - lit(1.0)) * col("__s6"))).cast("double")
          .as("__spnum"),
        sum(t9((col("__ngd") - lit(1.0)) * col("__l6"))).cast("double")
          .as("__lsum"),
        // singleton groups: 1/(n−1) divides by zero and ANSI double
        // division THROWS — guard the term (the ok flag already nulls
        // the output whenever any singleton exists)
        sum(when(col("__ng") > 1,
          t9(lit(1.0) / (col("__ngd") - lit(1.0))))).cast("double")
          .as("__csum"))
    val nd = col("n").cast("double")
    val kd = col("k_groups").cast("double")
    val nk = nd - kd
    val pooled = col("__spnum") / nk
    val lnsp = round(log(pooled), 6)
    val c = lit(1.0) + (col("__csum") - lit(1.0) / nk) /
      (lit(3.0) * (kd - lit(1.0)))
    val ok = col("k_groups") > 1 && col("__minn") > 1 && col("__mins") > 0
    tot.select(col("k_groups"), col("n"),
      when(ok, round(pooled, 6)).as("pooled_var"),
      when(ok, round(c, 6)).as("c"),
      when(ok, round((nk * lnsp - col("__lsum")) / c, 6)).as("t_stat"),
      (col("k_groups") - 1L).as("dof"))
  }

  /**
   * P305 — one-way intraclass correlation ICC(1,1): the share of total
   * variance explained by GROUP membership, from the P223 ANOVA mean
   * squares with the unbalanced-design group size
   * k₀ = (N − Σnᵢ²/N)/(k−1): ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW) —
   * THE reliability statistic for repeated measurements (raters,
   * devices, users): "is within-group consistency real or is the
   * grouping noise". Emits ONE row (k_groups, n, msb, msw, k0, icc);
   * k = 1, all-singleton, or zero-within-variance designs null out.
   *
   * Shape: the shared [[anovaTotals]] pass (one keyed agg + one k-row
   * closing agg). Cross-engine: inherits the P223 decimal discipline;
   * Σnᵢ² is an exact decimal; the closing sequence is fixed doubles on
   * exact operands, rounded at 6.
   */
  def iccOneWay(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val out = anovaTotals(df, groupCol, valueCol)
    val nd = col("n").cast("double")
    val kd = col("k_groups").cast("double")
    val msb = col("ssb") / (kd - lit(1.0))
    val msw = col("ssw") / (nd - kd)
    val k0 = (nd - col("__ng2").cast("double") / nd) / (kd - lit(1.0))
    val den = msb + (k0 - lit(1.0)) * msw
    val ok = col("k_groups") > 1 && col("n") > col("k_groups") &&
      col("ssw") > 0 && den > 0
    out.select(col("k_groups"), col("n"),
      when(ok, round(msb, 6)).as("msb"),
      when(ok, round(msw, 6)).as("msw"),
      when(ok, round(k0, 6)).as("k0"),
      when(ok, round((msb - msw) / den, 6)).as("icc"))
  }

  /**
   * P306 — Kendall's coefficient of concordance W with tie correction:
   * how strongly m blocks (judges, users) agree on the RANKING of k
   * treatments, on [0, 1] — the effect size behind P259's Friedman χ²
   * (χ²_F = m(k−1)·W; the test says "non-random", W says "how
   * unanimous"). With doubled average ranks R'_j, W = 3·Σ(R'_j −
   * m(k+1))² / (m²(k³−k) − m·ΣT) where T_b = Σ(t³−t) over each block's
   * tie groups. Emits ONE row (n_blocks, k_treatments, tie_sum, w);
   * fully-tied-everywhere designs (denominator 0) null W.
   *
   * Shape: the shared [[friedmanRanked]] pass (block-local windows
   * only) + one (block, value) tie agg — nothing global at any corpus
   * size. Cross-engine: deviations and tie sums are exact
   * DECIMAL(19,0)²-widened integers (a BIGINT square overflows past
   * m·k ≈ 2³¹); the single closing quotient is one fixed double
   * sequence rounded at 6.
   */
  def kendallW(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val ranked = friedmanRanked(df, blockCol, treatmentCol, valueCol)
    val perTreatment = ranked.groupBy(col("__t"), col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__avgr2")).as("__r2"))
    val ties = ranked.groupBy(col("__b"), col("__m"))
      .agg(count(lit(1)).as("__tc"))
      .agg(coalesce(sum(col("__tc") * col("__tc") * col("__tc") -
        col("__tc")), lit(0L)).as("tie_sum"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val dev = d19(col("__r2")) - d19(col("__n") * (col("__k") + lit(1L)))
    val closing = perTreatment.agg(
      max(col("__n")).as("n_blocks"), max(col("__k")).as("k_treatments"),
      sum(dev * dev).as("__s4"))
    val md = col("n_blocks").cast("double")
    val kd = col("k_treatments").cast("double")
    val den = md * md * (kd * kd * kd - kd) -
      md * col("tie_sum").cast("double")
    closing.crossJoin(broadcast(ties)) // 1-row scalar side
      .select(col("n_blocks"), col("k_treatments"), col("tie_sum"),
        when(col("n_blocks") > 0 && col("k_treatments") > 1 && den > 0,
          round(lit(3.0) * col("__s4").cast("double") / den, 6)).as("w"))
  }

  /**
   * P311 — market concentration per key: HHI = Σ shareᵢ² over entities
   * plus the CR4 top-4 concentration ratio — the "is this segment a
   * monopoly" read (HHI > 0.25 = highly concentrated in the DOJ
   * convention on 0..1 shares) and the data-pipeline skew read (one
   * source owning a corpus is the same failure). Non-positive values
   * drop (shares of negative revenue are undefined). Emits per key:
   * n_entities, total, hhi, cr4.
   *
   * Shape: one keyed total agg joined back (shuffle_hash — post-agg
   * side has no stats), one key-partitioned top-4 window, two keyed
   * sums. Cross-engine: totals are exact DECIMAL(18,6) sums; share
   * terms are fixed double squares rounded at 9 through DECIMAL(28,9);
   * CR4 is a ratio of exact decimals; outputs rounded at 6.
   */
  def concentrationIndex(df: DataFrame, keyCol: String, entityCol: String,
      valueCol: String): DataFrame = {
    // entities pre-aggregate HERE: a caller handing raw rows (an entity
    // appearing twice) would otherwise split that entity's share and
    // understate concentration silently
    val base = df.where(col(keyCol).isNotNull && col(entityCol).isNotNull &&
        col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(keyCol).as("__k"), col(entityCol).as("__e"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .groupBy(col("__k"), col("__e"))
      .agg(sum(col("__v")).cast("decimal(18,6)").as("__v"))
    val tot = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_entities"), sum(col("__v")).as("__t"))
    val share = col("__v").cast("double") / col("__t").cast("double")
    val hhi = base.join(tot.hint("shuffle_hash"), Seq("__k"))
      .select(col("__k"),
        round(share * share, 9).cast("decimal(28,9)").as("__s2"))
      .groupBy(col("__k")).agg(sum(col("__s2")).cast("double").as("__hhi"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__v").desc, col("__e").asc)
    val cr = base.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 4)
      .groupBy(col("__k")).agg(sum(col("__v")).as("__top4"))
    tot.join(hhi.hint("shuffle_hash"), Seq("__k"))
      .join(cr.hint("shuffle_hash"), Seq("__k"))
      .select(col("__k").as(keyCol), col("n_entities"),
        col("__t").cast("double").as("total"),
        round(col("__hhi"), 6).as("hhi"),
        round(col("__top4").cast("double") / col("__t").cast("double"), 6)
          .as("cr4"))
  }

  /**
   * P312 — inequality indices per key: Atkinson(ε=1) = 1 − geomean/mean
   * (the welfare-weighted inequality measure: 0.3 reads "30% of total
   * value could be destroyed if distributed equally at no welfare
   * loss") and the Hoover index ½Σ|shareᵢ − 1/n| (the share that would
   * have to move to equalize) — two one-number complements to P144's
   * Gini and P158's Lorenz curve. Non-positive values drop (the
   * geometric mean requires positives). Emits per key: n, total, mean,
   * atkinson, hoover.
   *
   * Shape: one keyed total agg joined back (shuffle_hash), one keyed
   * term agg. Cross-engine: ln terms run on exact decimal-cast doubles
   * and round at 6 into DECIMAL(28,6) (the o33/q11 firewall); Hoover
   * terms round at 9 through DECIMAL(28,9); one runtime exp on
   * identical operands; outputs rounded at 6.
   */
  def inequalityIndices(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(valueCol) > 0)
      .select(col(keyCol).as("__k"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
    val tot = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__t"))
    val vd = col("__v").cast("double")
    val nd = col("n").cast("double")
    val td = col("__t").cast("double")
    val terms = base.join(tot.hint("shuffle_hash"), Seq("__k"))
      .select(col("__k"),
        round(log(vd), 6).cast("decimal(28,6)").as("__ln"),
        round(abs(vd / td - lit(1.0) / nd), 9).cast("decimal(28,9)")
          .as("__hv"))
      .groupBy(col("__k"))
      .agg(sum(col("__ln")).cast("double").as("__sl"),
        sum(col("__hv")).cast("double").as("__sh"))
    tot.join(terms.hint("shuffle_hash"), Seq("__k"))
      .select(col("__k").as(keyCol), col("n"),
        col("__t").cast("double").as("total"),
        round(td / nd, 6).as("mean"),
        when(col("n") > 0,
          round(lit(1.0) - exp(col("__sl") / nd) / (td / nd), 6))
          .as("atkinson"),
        round(lit(0.5) * col("__sh"), 6).as("hoover"))
  }

  /**
   * P325 — Page's trend test for a PRESPECIFIED treatment ordering
   * over the P259 Friedman design: L = Σ j·R_j with j the hypothesized
   * rank position — the ordered-alternatives test that beats Friedman
   * exactly when the question is "does the response INCREASE along
   * this order" (Friedman spends power on every permutation; Page
   * spends it on the one you named). Normal approximation
   * z = (L − mk(k+1)²/4) / √(mk²(k+1)(k²−1)/144) (no-tie variance —
   * average ranks keep L exact but make z slightly conservative).
   * Treatments outside `order` are filtered BEFORE the complete-block
   * requirement; a data k smaller than the named order nulls z. Emits
   * ONE row: n_blocks, k_treatments, l, z.
   *
   * Shape: the shared [[friedmanRanked]] pass + one k-row closing agg.
   * Cross-engine: L comes from exact DECIMAL(19,0)-widened j·R'
   * doubled-rank products; the z closing is one fixed double sequence
   * with one IEEE sqrt, rounded at 6.
   */
  def pageTrendTest(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String, order: Seq[String]): DataFrame = {
    require(order.size >= 3,
      s"pageTrendTest: need >= 3 ordered treatments, got ${order.size}")
    require(order.distinct.size == order.size,
      s"pageTrendTest: duplicate treatments in ${order.mkString(",")}")
    val filtered = df.where(col(treatmentCol).isin(order: _*))
    val ranked = friedmanRanked(filtered, blockCol, treatmentCol, valueCol)
    val jExpr = order.zipWithIndex.tail.foldLeft(
      when(col("__t") === order.head, lit(1L))) { case (acc, (t, i)) =>
      acc.when(col("__t") === t, lit((i + 1).toLong))
    }
    def d19(c: Column) = c.cast("decimal(19,0)")
    val perT = ranked.groupBy(col("__t"), col("__k"))
      .agg(count(lit(1)).as("__m"), sum(col("__avgr2")).as("__r2"))
    val closing = perT.agg(max(col("__m")).as("n_blocks"),
      max(col("__k")).as("k_treatments"),
      sum(d19(jExpr) * d19(col("__r2"))).as("__l2"))
    val md = col("n_blocks").cast("double")
    val kd = col("k_treatments").cast("double")
    val l = col("__l2").cast("double") / lit(2.0)
    val el = md * kd * (kd + lit(1.0)) * (kd + lit(1.0)) / lit(4.0)
    val varL = md * kd * kd * (kd + lit(1.0)) *
      (kd * kd - lit(1.0)) / lit(144.0)
    closing.select(col("n_blocks"), col("k_treatments"),
      when(col("n_blocks") > 0, round(l, 6)).as("l"),
      when(col("n_blocks") > 0 && col("k_treatments") === order.size,
        round((l - el) / sqrt(varL), 6)).as("z"))
  }

  /**
   * P307 — Chow structural-break test per key: fit y ~ x separately in
   * the two regimes and pooled, F = ((SSE_p − SSE_a − SSE_b)/2) /
   * ((SSE_a + SSE_b)/(n − 4)) — "did the relationship CHANGE at the
   * break" (P129's changepoint finds a mean shift; Chow tests a SLOPE/
   * INTERCEPT shift at a known break, the regulatory/launch-date
   * question). `regimeCol` is boolean-castable (false = regime a).
   * Emits per key: n, n_a, n_b, sse_pooled, sse_a, sse_b, chow_f; a
   * key missing a regime, n ≤ 4, zero x-variance in any fit, or zero
   * residual SS nulls the statistics.
   *
   * Shape: ONE (key, regime)-keyed moment agg, then one keyed closing
   * agg — pooled moments are the exact DECIMAL sums of the regime
   * sums, so no second pass over the data. Cross-engine: the o11
   * moment discipline ((18,6) values, (37,12) products); each SSE is
   * a fixed double sequence on exact sums; outputs rounded at 6.
   */
  def chowTest(df: DataFrame, keyCol: String, regimeCol: String,
      xCol: String, yCol: String): DataFrame = {
    val dx = col(xCol).cast("decimal(18,6)")
    val dy = col(yCol).cast("decimal(18,6)")
    val m = df.where(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(regimeCol).isNotNull)
      .groupBy(col(keyCol), col(regimeCol).cast("boolean").as("__r"))
      .agg(count(lit(1)).as("__n"), sum(dx).as("__sx"), sum(dy).as("__sy"),
        sum(dx * dy).as("__sxy"), sum(dx * dx).as("__sxx"),
        sum(dy * dy).as("__syy"))
    def sse(n: Column, sx: Column, sy: Column, sxy: Column, sxx: Column,
        syy: Column): Column = {
      val nd = n.cast("double")
      val sxd = sx.cast("double")
      val syd = sy.cast("double")
      val uxx = nd * sxx.cast("double") - sxd * sxd
      val uyy = nd * syy.cast("double") - syd * syd
      val uxy = nd * sxy.cast("double") - sxd * syd
      when(uxx > 0, (uyy - uxy * uxy / uxx) / nd)
    }
    val r = m.withColumn("__sse",
      sse(col("__n"), col("__sx"), col("__sy"), col("__sxy"),
        col("__sxx"), col("__syy")))
    val agg = r.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__k"), sum(col("__n")).as("n"),
        max(when(!col("__r"), col("__n"))).as("n_a"),
        max(when(col("__r"), col("__n"))).as("n_b"),
        max(when(!col("__r"), col("__sse"))).as("__sse1"),
        max(when(col("__r"), col("__sse"))).as("__sse2"),
        sum(col("__sx")).as("__psx"), sum(col("__sy")).as("__psy"),
        sum(col("__sxy")).as("__psxy"), sum(col("__sxx")).as("__psxx"),
        sum(col("__syy")).as("__psyy"))
    val pooledSse = sse(col("n"), col("__psx"), col("__psy"),
      col("__psxy"), col("__psxx"), col("__psyy"))
    val nd = col("n").cast("double")
    val ok = col("__k") === 2 && col("n") > 4 &&
      col("__sse1").isNotNull && col("__sse2").isNotNull &&
      pooledSse.isNotNull && (col("__sse1") + col("__sse2")) > 0
    agg.select(col(keyCol), col("n"), col("n_a"), col("n_b"),
      when(ok, round(pooledSse, 6)).as("sse_pooled"),
      when(ok, round(col("__sse1"), 6)).as("sse_a"),
      when(ok, round(col("__sse2"), 6)).as("sse_b"),
      when(ok, round((pooledSse - (col("__sse1") + col("__sse2"))) /
        lit(2.0) / ((col("__sse1") + col("__sse2")) / (nd - lit(4.0))),
        6)).as("chow_f"))
  }

  /**
   * P308 — Breusch–Pagan heteroskedasticity test per key: regress the
   * SQUARED residuals of the P96 fit on x; LM = n·r²_aux flags
   * variance that grows with the regressor — the "is the OLS SE a
   * lie" audit (heteroskedastic residuals leave the slope unbiased
   * but its t-statistics fiction). Emits per key: n, slope, intercept,
   * r2_aux, lm; keys where either fit degenerates null out.
   *
   * Shape: the [[olsFit]] keyed agg, a broadcast join-back of the
   * key-scalar coefficients, then a second olsFit on (x, e²) — two
   * aggs, zero windows. Cross-engine: residuals are fixed double
   * sequences on 6-rounded coefficients and exact inputs; e² rounds
   * at 6 into DECIMAL(18,6) so the aux moments are exact; LM is
   * n·(6-rounded r²), rounded at 6.
   */
  def breuschPagan(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val fit = olsFit(df, keyCol, xCol, yCol)
      .select(col(keyCol).as("__fk"), col("slope").as("__b1"),
        col("intercept").as("__b0"))
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .join(broadcast(fit), col(keyCol) === col("__fk"))
      .where(col("__b1").isNotNull)
    val e = col("__y") - (col("__b0") + col("__b1") * col("__x"))
    val pts = base.select(col(keyCol),
      col("__x").cast("decimal(18,6)").as("__dx"),
      round(e * e, 6).cast("decimal(18,6)").as("__e2"))
    olsFit(pts, keyCol, "__dx", "__e2")
      .select(col(keyCol), col("n"), col("r2").as("r2_aux"))
      .join(broadcast(fit), col(keyCol) === col("__fk"))
      .select(col(keyCol), col("n"), col("__b1").as("slope"),
        col("__b0").as("intercept"), col("r2_aux"),
        when(col("r2_aux").isNotNull,
          round(col("n").cast("double") * col("r2_aux"), 6)).as("lm"))
  }

  /**
   * P309 — regression influence audit per key: leverage
   * hᵢ = 1/n + (xᵢ−x̄)²/Sxx and Cook's distance
   * Dᵢ = eᵢ²hᵢ / (2s²(1−hᵢ)²) for the P96 fit, top-`topK` rows by D —
   * "which rows OWN this regression" (a slope driven by three points
   * is not a trend; this names the three). Emits per (key): the topK
   * (id, x, y, leverage, resid, cooks_d) rows ordered by 6-rounded D
   * desc with id tiebreak. Keys with n ≤ 2, zero x-variance, or zero
   * residual variance drop; full-leverage points (h = 1, the n = 2
   * degenerate) null D.
   *
   * Shape: the olsFit agg + one keyed moment agg + one keyed SSE agg,
   * all key-scalar broadcast join-backs, then ONE key-partitioned
   * top-k window (never global). Cross-engine: residuals/leverage are
   * fixed double sequences on 6-rounded coefficients and exact sums;
   * the SSE sums 9-rounded e² through DECIMAL(28,9); ranking compares
   * 6-rounded D with an id tiebreak (the float-rank rule).
   */
  def regressionInfluence(df: DataFrame, keyCol: String, idCol: String,
      xCol: String, yCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"regressionInfluence: topK must be >= 1, got $topK")
    val fit = olsFit(df, keyCol, xCol, yCol)
      .select(col(keyCol).as("__fk"), col("n").as("__fn"),
        col("slope").as("__b1"), col("intercept").as("__b0"))
    val mom = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("__mk"))
      .agg(sum(col(xCol).cast("decimal(18,6)")).cast("double").as("__msx"),
        sum(col(xCol).cast("decimal(18,6)") *
          col(xCol).cast("decimal(18,6)")).cast("double").as("__msxx"))
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol), col(idCol).as("__id"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .join(broadcast(fit), col(keyCol) === col("__fk"))
      .join(broadcast(mom), col(keyCol) === col("__mk"))
      .where(col("__b1").isNotNull && col("__fn") > 2)
    val nd = col("__fn").cast("double")
    val xbar = col("__msx") / nd
    val sxxc = col("__msxx") - col("__msx") * col("__msx") / nd
    val h = lit(1.0) / nd + (col("__x") - xbar) * (col("__x") - xbar) / sxxc
    val e = col("__y") - (col("__b0") + col("__b1") * col("__x"))
    val sse = base
      .groupBy(col(keyCol).as("__sk"))
      .agg(sum(round(e * e, 9).cast("decimal(28,9)")).cast("double")
        .as("__sse"))
    val pts = base.join(broadcast(sse), col(keyCol) === col("__sk"))
      .withColumn("__h", h)
      .withColumn("__e", e)
      .withColumn("__s2", col("__sse") / (nd - lit(2.0)))
      .withColumn("__d",
        when(col("__s2") > 0 && col("__h") < 1.0,
          col("__e") * col("__e") * col("__h") /
            (lit(2.0) * col("__s2") * (lit(1.0) - col("__h")) *
              (lit(1.0) - col("__h")))))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(round(col("__d"), 6).desc_nulls_last, col("__id").asc)
    pts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= topK)
      .select(col(keyCol), col("__id").as(idCol), col("__x").as(xCol),
        col("__y").as(yCol), round(col("__h"), 6).as("leverage"),
        round(col("__e"), 6).as("resid"),
        round(col("__d"), 6).as("cooks_d"), col("__rn").as("rnk"))
  }

  /**
   * P341 — exact per-group mode with a deterministic tie-break: the most
   * frequent value of `valCol` per `keyCol` group, smallest value
   * winning ties (an arbitrary-winner mode is not reproducible across
   * runs or engines — the tie rule IS the operator contract). Emits
   * (key, mode, mode_n, n_distinct); null values are excluded (a mode
   * of "missing" is a data-quality read, dq-family territory, not a
   * central-tendency one).
   *
   * Shapes: one map-side-combinable (key, value) count, then ONE
   * key-partitioned rank window over the count frame — the window input
   * is |distinct values per key|, value-domain-sized, not corpus-sized
   * (the o92 value-domain discipline). Exact integers end to end.
   */
  def modeBy(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(keyCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__n").desc, col("__v").asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nd", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("__v").as("mode"), col("__n").as("mode_n"),
        col("__nd").as("n_distinct"))
  }

  /**
   * P353 — Grubbs-style single-outlier audit per group: the most extreme
   * standardized deviation G = max |x − mean| / sd, WHICH row produced
   * it (smallest id among ties on the 6-rounded score — the rank
   * tie-break rule), its raw value, and the verdict at `threshold` —
   * the "is the worst point an outlier or just the tail" readout the
   * per-row [[zscore]] leaves to the reader and the P196 Tukey fences
   * answer only in aggregate counts.
   *
   * The z discipline is [[zscore]]'s verbatim (population sd from
   * DECIMAL(38,12)-summed moments — reusing it means grubbs CANNOT
   * drift from the o7-proven arithmetic); the verdict compares the
   * ROUNDED G so the boundary cannot straddle engines. Shape: the
   * zscore window + one key-partitioned rank — no extra shuffles.
   */
  def grubbs(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"grubbs: threshold must be > 0, got $threshold")
    val scored = zscore(
        df.where(col(keyCol).isNotNull && col(valueCol).isNotNull &&
          col(idCol).isNotNull),
        keyCol, valueCol, outCol = "__z")
      .withColumn("__g", round(abs(col("__z")), 6))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("__g").desc, col(idCol).asc)))
    scored.where(col("__r") === 1)
      .select(col(keyCol), col("__n").as("n"), col("__g").as("g"),
        col(valueCol).as("outlier_value"), col(idCol).as("outlier_id"),
        (col("__g") > threshold).as("suspect"))
  }

  /**
   * P356 — Pareto concentration cut per group: the smallest number of
   * entities whose descending-value prefix covers each revenue bar
   * (the "how many customers are 80% of this market" readout that the
   * P145 Gini and P307 HHI summarize away — this one answers with a
   * COUNT and the exact share it covers). Bars are exact rationals
   * num/den; the crossing row is found by the integer-scaled decimal
   * comparison cum·den ≥ total·num (no float thresholds anywhere), and
   * its predecessor must sit below the bar — exactly one row matches.
   * Negative values break prefix monotonicity and raise loudly.
   *
   * Shapes: one entity agg, one group-partitioned rank + running-sum
   * window (per-group entity-sized — the q5 partitioned-rank class),
   * one group-keyed totals join, one filter per bar unioned.
   */
  def paretoCut(df: DataFrame, keyCol: String, entityCol: String,
      valueCol: String, bars: Seq[(String, Int, Int)]): DataFrame = {
    require(bars.nonEmpty, "paretoCut: need at least one bar")
    bars.foreach { case (l, num, den) =>
      require(num >= 1 && den >= 1 && num <= den && l.nonEmpty,
        s"paretoCut: bar $l must be a fraction in (0,1], got $num/$den")
    }
    require(bars.map(_._1).distinct.size == bars.size,
      "paretoCut: duplicate bar labels")
    val ent = df
      .where(col(keyCol).isNotNull && col(entityCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(entityCol).as("__e"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(30,2)")
        .as("__v"))
      .withColumn("__v",
        when(col("__v") < 0,
          raise_error(lit("paretoCut: negative entity total")))
          .otherwise(col("__v")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__v").desc, col("__e").asc)
    val ranked = ent
      .withColumn("__rk", row_number().over(w))
      .withColumn("__cum", sum(col("__v"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(30,2)"))
    val totals = ent.groupBy(col(keyCol))
      .agg(sum(col("__v")).cast("decimal(30,2)").as("__tot"),
        count(lit(1)).as("n_entities"))
    val j = ranked.join(totals.hint("shuffle_hash"), Seq(keyCol))
    bars.map { case (label, num, den) =>
      val nl = lit(num).cast("decimal(4,0)")
      val dl = lit(den).cast("decimal(4,0)")
      j.where(col("__cum") * dl >= col("__tot") * nl &&
          (col("__cum") - col("__v")) * dl < col("__tot") * nl)
        .select(col(keyCol), lit(label).as("bar"),
          col("__rk").cast("long").as("n_to_bar"), col("n_entities"),
          round(col("__rk").cast("double") /
            col("n_entities").cast("double"), 6).as("entity_share"),
          round(col("__cum").cast("double") /
            col("__tot").cast("double"), 6).as("covered_share"))
    }.reduce(_ unionByName _)
  }
}
