package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Graft.table

/**
 * Remaining OLAP shapes with full oracles: pivot (wide conditional
 * aggregation), set operations (INTERSECT/EXCEPT), scalar subquery, and
 * CUBE grouping sets.
 */
object OlapQueries {

  /** Daily mean + count per event type — the ONE definition of the
    * 6-rounded daily series every daily-series query reads
    * (o29/o32/o35/o36/o38/pipe6; [[dailyMeans]] drops the count), kept
    * beside the oracles' identical `daily` CTE so the consumers cannot
    * drift. Inlining this body at a call site is the duplication class
    * the r9s4 review closed — extend HERE instead.
    * CAVEAT shared with those operators' contracts: this is NOT
    * gap-filled — it relies on every (type, day) cell being populated,
    * which EventsDailyDensitySpec pins against the live testdata (a corpus
    * regen with a missing day must fail THERE, loudly, not silently turn
    * centered windows into misaligned row windows). */
  private[queries] def dailyStats(s: SparkSession, dir: String): DataFrame =
    graft.Graft.events(s, dir)
      .where(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("v"),
        count(lit(1)).as("n"))

  private[queries] def dailyMeans(s: SparkSession, dir: String): DataFrame =
    dailyStats(s, dir).drop("n")

  /** Day-paired (pair, day, x, y) points for two event-type daily-mean
    * series — shared by o82/o85/o86 (one definition beside the oracles'
    * identical pair CTE; moment consumers ignore the day column, the
    * lag consumer orders on it). */
  private def dailyPairFrame(s: SparkSession, dir: String, ta: String,
      tb: String): DataFrame = {
    val d = dailyMeans(s, dir)
    val a = d.where(col("event_type") === ta)
      .select(col("day"), col("v").as("x"))
    val b = d.where(col("event_type") === tb)
      .select(col("day").as("__day2"), col("v").as("y"))
    a.join(b.hint("shuffle_hash"), col("day") === col("__day2"))
      .select(lit(s"$ta~$tb").as("pair"), col("day"), col("x"), col("y"))
  }

  /** Per-user heavy-click/heavy-buy booleans at the measured ≥14 bar
    * (cells 5/5/3/2 at sf0.001, 31/40/38/41 at sf0.01 — non-vacuous,
    * non-saturated) — the ONE 2×2 exposure frame o87/o89 share. */
  private def heavyUserFrame(s: SparkSession, dir: String): DataFrame =
    graft.Graft.events(s, dir)
      .where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
        >= 14).as("heavy_click"),
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= 14).as("heavy_buy"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pivot order status × priority into wide counts
    "o1_pivot" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "urgent")
        .withColumnRenamed("2-HIGH", "high")
        .withColumnRenamed("3-MEDIUM", "medium")
        .withColumnRenamed("4-NOT SPECIFIED", "notspec")
        .withColumnRenamed("5-LOW", "low")
        .orderBy("o_orderstatus")
    }),

    // set ops: customers with orders in both years (INTERSECT) minus a
    // blocklist (EXCEPT)
    "o2_setops" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val blocked = table(s, dir, "customer")
        .where(col("c_custkey") % 17 === 0).select(col("c_custkey").as("o_custkey"))
      y95.intersect(y96).except(blocked).orderBy("o_custkey")
    }),

    // scalar subquery: orders above the global average price, per status.
    // Threshold = exact decimal sum cast to double, divided by the count —
    // bit-identical in both engines (a plain double avg is partition-order-
    // dependent in its last ulp and could flip boundary rows)
    "o3_scalar_subquery" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val r = o.agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double"),
        count(lit(1))).head()
      // empty table → SUM is null → threshold +∞ filters everything, like
      // the oracle's NULL comparison
      val avgPrice =
        if (r.isNullAt(0) || r.getLong(1) == 0) Double.PositiveInfinity
        else r.getDouble(0) / r.getLong(1)
      o.where(col("o_totalprice") > avgPrice)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("o_orderstatus")
    }),

    // P25 — salted exact distinct count: semantically a plain
    // count(DISTINCT user_id) per event type, but executed as the
    // skew-proof two-phase plan (value-salted partial distincts, then a
    // sum of partials). The oracle is the PLAIN form — passing proves the
    // salted rewrite is an identity, which is the whole point of the op.
    "sk1_salted_distinct" -> ((s, dir) => {
      graft.operators.Skew.saltedDistinctCount(
        table(s, dir, "events"), Seq("event_type"), "user_id", saltBuckets = 16)
        .orderBy("event_type")
    }),

    // P51 — HyperLogLog distinct estimates per event type, sketched over
    // two columns at once: user_id (150 distinct << 2.5m → the linear-
    // counting branch) and event_id (12k distinct → the raw harmonic-mean
    // branch), each beside its exact count. Register sums are exact
    // power-of-two longs, so the oracle rebuilds every register and
    // replays both correction branches bit-for-bit.
    // P345 — HLL precision sweep over the event-id column: the measured
    // error ladder p ∈ {4,6,8,10} beside ONE exact distinct count — the
    // register budget that meets an error target is read off this
    // table, not the 1.04/√m asymptote
    "sk17_hll_err" -> ((s, dir) => {
      graft.operators.Sketches.hllErrorSweep(
          table(s, dir, "events").select("event_id"), "event_id",
          ps = Seq(4, 6, 8, 10))
        .orderBy("p")
    }),

    "sk2_hll" -> ((s, dir) => {
      val e = table(s, dir, "events")
      val users = graft.operators.Sketches
        .hllDistinct(e, "user_id", Seq("event_type"))
        .withColumnRenamed("hll_est", "hll_users")
      val ids = graft.operators.Sketches
        .hllDistinct(e, "event_id", Seq("event_type"))
        .withColumnRenamed("hll_est", "hll_events")
      val exact = e.groupBy("event_type").agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_id")).as("n_events"))
      users.join(ids, Seq("event_type")).join(exact, Seq("event_type"))
        .select(col("event_type"),
          round(col("hll_users"), 3).as("hll_users"), col("n_users"),
          round(col("hll_events"), 3).as("hll_events"), col("n_events"))
        .orderBy("event_type")
    }),

    // Morton z-value over two quantized key columns — the write-time
    // layout key behind clusterByZOrder (ZOrder.scala). The interleave is
    // pure integer bit arithmetic, so the oracle replays it exactly;
    // hash-equality proves the layout key every clustered write depends
    // on is deterministic and engine-independent.
    "z1_morton" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val x = pmod(col("o_custkey"), lit(1024)).cast("long")
      val y = pmod(col("o_orderkey"), lit(1024)).cast("long")
      o.select(col("o_orderkey"),
          graft.operators.ZOrder.zValue(10, x, y).as("zval"))
        .orderBy("zval", "o_orderkey")
    }),

    // P96 — Hilbert layout key over the same quantized pair as
    // z1_morton: the kernel walks the per-bit quadrant-rank + rotate;
    // the oracle replays the walk as a list_reduce fold over a packed
    // (x, y, d) BIGINT state — pure integer arithmetic on both sides
    "z2_hilbert" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val x = pmod(col("o_custkey"), lit(1024)).cast("long")
      val y = pmod(col("o_orderkey"), lit(1024)).cast("long")
      o.select(col("o_orderkey"),
          graft.operators.ZOrder.hilbertValue(10, x, y).as("hval"))
        .orderBy("hval", "o_orderkey")
    }),

    // exact percentiles per group: Spark `percentile` and DuckDB
    // `quantile_cont` both use the R-7 definition (rank = p·(n−1), linear
    // interpolation between order statistics); rounding to 4 absorbs the
    // last-ulp interpolation slack. At 100 TB the approximate sketch
    // (approx_percentile / approx_count_distinct, accuracy pinned in
    // SkewSpec) replaces this — exact percentile keeps all values per
    // group in memory.
    "o5_percentiles" -> ((s, dir) => {
      // ONE percentile aggregate with an array of fractions: the sorted
      // per-group value buffer is built once and probed twice, instead of
      // two independent aggregate states each holding the group's values
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("__p"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          round(element_at(col("__p"), 1), 4).as("p50"),
          round(element_at(col("__p"), 2), 4).as("p95"),
          col("n"))
        .orderBy("l_returnflag")
    }),

    // P82 — winsorize extended price into its return-flag group's
    // [p05, p95] band; the oracle replays bands (quantile_cont = R-7),
    // clamp, and flags
    "o9_winsorize" -> ((s, dir) => {
      graft.operators.Features.winsorize(
          table(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_returnflag",
              "l_extendedprice"),
          "l_returnflag", "l_extendedprice", pLo = 0.05, pHi = 0.95)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P86 — RFM customer scoring: recency/frequency/monetary aggregates
    // per customer, each scored 1-5 against corpus-wide quintile cutoffs
    // (the scale-safe ntile alternative — one scalar cutoff row broadcast
    // into a projection, no global-order window)
    "q10_rfm" -> ((s, dir) => {
      val cust = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("recency_date"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("__m"))
        .withColumn("monetary", col("__m").cast("double"))
        .withColumn("recency_days",
          datediff(col("recency_date"), to_date(lit("1970-01-01"))).cast("long"))
        .drop("__m")
      graft.operators.Features.quantileScores(cust,
          Seq("recency_days", "frequency", "monetary"), buckets = 5)
        .withColumn("rfm",
          (col("recency_days_score") * 100 + col("frequency_score") * 10 +
            col("monetary_score")).cast("int"))
        .orderBy("o_custkey")
    }),

    // P87 — MAD outliers over event values per type: uniform [0,100]
    // values cap the modified z at ≈1.35, so cutoff 1.2 splits the
    // corpus (tails flagged, bulk not); oracle replays median → rounded
    // deviations → MAD → z exactly
    "o10_mad" -> ((s, dir) => {
      graft.operators.Features.madOutliers(
          table(s, dir, "events")
            .select("event_id", "event_type", "value"),
          "event_type", "value", cutoff = 1.2)
        .orderBy("event_id")
    }),

    // P90 — per-supplier OLS fit of extended price against quantity
    // (slope ≈ the supplier's average unit price): ~100 groups of ~600
    // points at sf0.01; the oracle replays the five decimal moment sums
    // and the identical closed-form double sequence
    "o11_ols" -> ((s, dir) => {
      graft.operators.Features.olsFit(
          table(s, dir, "lineitem")
            .select("l_suppkey", "l_quantity", "l_extendedprice"),
          "l_suppkey", "l_quantity", "l_extendedprice")
        .orderBy("l_suppkey")
    }),

    // P104 — snapshot drift report between the even and odd halves of
    // the event stream: per-column null-rate delta, cardinality ratio,
    // mean shift; each side's profile is ONE aggregation pass
    "dq1_drift" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val a = e.where(pmod(col("event_id"), lit(2)) === 0)
      val b = e.where(pmod(col("event_id"), lit(2)) === 1)
      graft.operators.Profiling.driftReport(a, b,
          Seq("user_id", "event_type", "value"))
        .orderBy("column")
    }),

    // P102 — Mann-Whitney rank-sum comparison of returned vs non-
    // returned line prices: pooled ranks with tie correction, one
    // summary row; exact integer rank arithmetic end to end
    "o15_mannwhitney" -> ((s, dir) => {
      graft.operators.Features.mannWhitney(
          table(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice", groupA = "R", groupB = "N")
    }),

    // P101 — Benford first-digit audit of order totals per priority:
    // money converts to exact cents through DECIMAL, the first digit is
    // an integer CASE chain (no float log at decade boundaries), the
    // expected masses are shared literals
    "o14_benford" -> ((s, dir) => {
      val o = table(s, dir, "orders").select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      graft.operators.Features.benfordAudit(o, "o_orderpriority", "cents")
        .orderBy("o_orderpriority", "digit")
    }),

    // P336 — Benford SECOND-digit audit on the same cent values as
    // o14: fabricators who learn the first digit rarely fake the
    // second, and it is the sharper screen on range-constrained prices
    "o109_benford2" -> ((s, dir) => {
      val o = table(s, dir, "orders").select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      graft.operators.Features.benfordSecondDigit(o, "o_orderpriority",
          "cents")
        .orderBy("o_orderpriority", "digit")
    }),

    // P341 — exact mode of the quantity domain per return flag with the
    // deterministic smallest-value tie-break (3 groups × ≤50 distinct
    // quantities — the rank window is value-domain-sized)
    "o110_mode" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"))
      graft.operators.Features.modeBy(li, "l_returnflag", "qty")
        .orderBy("l_returnflag")
    }),

    // P337 — the one-stop experiment readout: the q15 SRM gate beside
    // the q17 two-proportion verdict in one row — "is the assignment
    // sound, and did the metric move" (reading z while srm is true is
    // the classic A/B mistake this panel makes impossible to miss)
    "pipe15_ab_readout" -> ((s, dir) => {
      val assign = graft.Graft.events(s, dir).select(
        (col("user_id") % 2 === 1).as("treat"),
        (col("event_type") === "purchase").as("conv"))
      val srm = graft.operators.Features.srmCheck(
          assign.select("treat"), "treat")
        .select(col("chi2").as("srm_chi2"), col("srm"))
      graft.operators.Features.twoProportionTest(assign, "treat", "conv")
        .crossJoin(broadcast(srm))
    }),

    // P97 — χ² independence audit between event type and value band:
    // cell counts, margins and the statistic all replay from exact
    // BIGINTs; contributions round at 9 and DECIMAL-sum into chi2
    "o13_chisq" -> ((s, dir) => {
      graft.operators.Features.chiSquare(
          table(s, dir, "events").select(col("event_type"),
            floor(col("value") / 50).cast("long").as("band")),
          "event_type", "band")
        .orderBy("event_type", "band")
    }),

    // P131 — next-fit compaction plan packing documents into ~5000-char
    // output bins in id order; exact integer running totals
    "z4_compaction" -> ((s, dir) => {
      graft.operators.Bucketing.compactionPlan(
          table(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", targetBytes = 5000L)
        .orderBy("doc_id")
    }),

    // P132 — top-25 customer revenue movers 1995 → 1996: one fused
    // conditional decimal agg, exact-decimal |delta| ranking
    "o24_movers" -> ((s, dir) => {
      graft.operators.TimeSeries.topMovers(
          table(s, dir, "orders"), "o_custkey", year(col("o_orderdate")),
          "o_totalprice", 1995, 1996, k = 25)
        .orderBy("rank")
    }),

    // P134 — smoothed target encoding of the high-cardinality customer
    // key by order value: (sum + m·prior)/(n + m), prior = global mean
    "o25_target_enc" -> ((s, dir) => {
      graft.operators.Features.targetEncode(
          table(s, dir, "orders"), "o_custkey", "o_totalprice",
          smoothing = 20.0)
        .orderBy("o_custkey")
    }),

    // P137 — zone-map effectiveness audit of a shipdate-ordered layout:
    // 2000-row files, per-file date bands + band-overlap counts (adjacent
    // files share at most a boundary date → near-zero overlaps = the
    // column prunes)
    "z5_zonemap" -> ((s, dir) => {
      val d = table(s, dir, "lineitem")
        .select(to_date(col("l_shipdate")).as("sd"),
          col("l_orderkey"), col("l_linenumber"))
      graft.operators.Bucketing.zoneMapAudit(
          d, Seq("sd", "l_orderkey", "l_linenumber"), "sd",
          rowsPerFile = 2000)
        .orderBy("file_id")
    }),

    // P342 — the physical-design decision table: the z5 audit run under
    // three candidate sort orders side by side — shipdate-clustered
    // (bands disjoint, point predicates read one file) vs orderkey- and
    // suppkey-ordered (date bands span the table, zone maps useless)
    "z11_layout_compare" -> ((s, dir) => {
      val d = table(s, dir, "lineitem").select(
        to_date(col("l_shipdate")).as("sd"),
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      graft.operators.Bucketing.layoutPruneCompare(d, Seq(
          "by_orderkey" -> Seq("l_orderkey", "l_linenumber"),
          "by_shipdate" -> Seq("sd", "l_orderkey", "l_linenumber"),
          "by_suppkey" -> Seq("l_suppkey", "l_orderkey", "l_linenumber")),
          "sd", rowsPerFile = 2000)
        .orderBy("layout")
    }),

    // P138 — AMS F2 sketch over the event user-id stream: 16 ±1-sign
    // estimators vs the exact second moment, portable-MD5 signs
    "sk7_ams" -> ((s, dir) => {
      graft.operators.Sketches.amsF2(
          graft.Graft.events(s, dir).select("user_id"), "user_id",
          estimators = 16)
        .orderBy("estimator")
    }),

    // P141 — weekday seasonal profile of event values: epoch-day dow
    // (0 = Monday), per-day mean and index vs the corpus mean
    "o26_seasonality" -> ((s, dir) => {
      graft.operators.TimeSeries.seasonalProfile(
          graft.Graft.events(s, dir), "ts", "value")
        .orderBy("dow")
    }),

    // P143 — Hill tail-index of the order-value distribution over the
    // top-500 order statistics: the skew forecast for a money column
    "o27_hill" -> ((s, dir) => {
      graft.operators.Features.hillTailIndex(
        table(s, dir, "orders"), "o_totalprice", k = 500)
    }),

    // P185 — rolling-origin CV: three cutoffs, 5-day test horizon —
    // the time-respecting alternative to random K-fold
    "sa19_rolling_cv" -> ((s, dir) => {
      graft.operators.Sampling.rollingOriginSplits(
          graft.Graft.events(s, dir).select("event_id", "ts"), "ts",
          Seq("2024-01-10 00:00:00", "2024-01-15 00:00:00",
            "2024-01-20 00:00:00"), horizonDays = 5)
        .orderBy("fold", "split")
    }),

    // P186 — cheapest-AND-smallest part frontier (minimize price and
    // size): the 2-D skyline
    "o40_skyline" -> ((s, dir) => {
      graft.operators.Features.skyline2D(
          table(s, dir, "part")
            .select("p_partkey", "p_retailprice", "p_size"),
          "p_retailprice", "p_size", "p_partkey")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    }),

    // P187 — seasonal strength of each event type's weekday pattern
    // over the o32 decomposition
    "o41_seas_strength" -> ((s, dir) => {
      val dec = graft.operators.TimeSeries.seasonalDecompose(
        dailyMeans(s, dir), "event_type", "day", "v")
      graft.operators.TimeSeries.seasonalStrength(dec, "event_type")
        .orderBy("event_type")
    }),

    // P181 — two-proportion z on purchase conversion, odd users treated:
    // the binary-metric test closing the experimentation suite
    "q17_twoprop" -> ((s, dir) => {
      graft.operators.Features.twoProportionTest(
        graft.Graft.events(s, dir).select(
          (col("user_id") % 2 === 1).as("treat"),
          (col("event_type") === "purchase").as("conv")),
        "treat", "conv")
    }),

    // P183 — dbt accepted_values on order status against {O, F}: the P
    // rows surface as violations with a deterministic sample
    "dq8_accepted" -> ((s, dir) => {
      graft.operators.Profiling.acceptedValues(
        table(s, dir, "orders"), "o_orderstatus", Seq("O", "F"))
    }),

    // P178 — capture-recapture corpus-size estimate from two 30%
    // independent hash samples of customers; the true count audits it
    "o39_capture" -> ((s, dir) => {
      graft.operators.Sketches.captureRecapture(
        table(s, dir, "customer"), "c_custkey", samplePct = 30)
    }),

    // P190 — Cramér's V over the o13 contingency (event type × value
    // band): the effect-size reading χ² alone can't give
    "o42_cramersv" -> ((s, dir) => {
      graft.operators.Features.cramersV(
        graft.Graft.events(s, dir).select(col("event_type"),
          floor(col("value") / 50).cast("long").as("band")),
        "event_type", "band")
    }),

    // P192 — Kendall τ-b per event type between the daily mean value
    // and the daily event count: do busy days run hot?
    "o43_kendall" -> ((s, dir) => {
      graft.operators.TimeSeries.kendallTau(dailyStats(s, dir),
          "event_type", "day", "v", "n")
        .orderBy("event_type")
    }),

    // P191 — Poisson-bootstrap 95% CI for the mean order value: 32
    // deterministic hash resamples, R-7 percentile band
    "o44_bootstrap" -> ((s, dir) => {
      graft.operators.Features.bootstrapMeanCI(
        table(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey", "o_totalprice", resamples = 32)
    }),

    // P193 — single change-point per event type over the daily mean
    // series: the best two-regime split day and its variance gain
    "o45_changepoint" -> ((s, dir) => {
      graft.operators.TimeSeries.changePoint(
          dailyMeans(s, dir), "event_type", "day", "v", minSegment = 3)
        .orderBy("event_type")
    }),

    // P212 — BH step-up over a replayable synthetic p frame (every
    // 50th customer a test, every 500th carries a p/100 signal): the
    // multiple-testing gate for segment sweeps
    "o53_bh" -> ((s, dir) => {
      val u = graft.operators.Sampling.uniform01(col("c_custkey"), "bh:")
      val tests = table(s, dir, "customer")
        .where(col("c_custkey") % 50 === 0 && col("c_custkey").isNotNull)
        .select(col("c_custkey").as("test_id"),
          when(col("c_custkey") % 500 === 0, round(u / 100.0, 9))
            .otherwise(round(u, 9)).as("p"))
      graft.operators.Features.benjaminiHochberg(tests, "test_id", "p")
        .orderBy("rank")
    }),

    // P252 — Benjamini–Yekutieli on the o53 test frame: the
    // arbitrary-dependence FDR variant (c(n) ≈ ln n + γ inflation) for
    // correlated segment sweeps
    "o69_by_fdr" -> ((s, dir) => {
      val u = graft.operators.Sampling.uniform01(col("c_custkey"), "bh:")
      val tests = table(s, dir, "customer")
        .where(col("c_custkey") % 50 === 0 && col("c_custkey").isNotNull)
        .select(col("c_custkey").as("test_id"),
          when(col("c_custkey") % 500 === 0, round(u / 100.0, 9))
            .otherwise(round(u, 9)).as("p"))
      graft.operators.Features.benjaminiHochberg(tests, "test_id", "p",
          dependence = true)
        .orderBy("rank")
    }),

    // P254 — count-min error curve over document tokens at three
    // widths: the sketch-sizing table, measured (the d21 discipline
    // applied to the CMS family)
    "sk12_cms_error" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(explode(
          graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
      graft.operators.Sketches.cmsErrorCurve(toks, "tok", rows = 4,
          widths = Seq(64, 256, 1024))
        .orderBy("width")
    }),

    // P210 — 10% trimmed & winsorized means of event value per type:
    // the robust-location trio read against the raw mean
    "o51_trimmed" -> ((s, dir) => {
      graft.operators.Features.trimmedMeans(
          graft.Graft.events(s, dir).select("event_type", "value"),
          "event_type", "value", trimPct = 10)
        .orderBy("event_type")
    }),

    // P211 — Theil T inequality of order value per priority class, with
    // the ln(n)-normalized form
    "o52_theil" -> ((s, dir) => {
      graft.operators.Features.theilIndex(
          table(s, dir, "orders").select("o_orderpriority", "o_totalprice"),
          "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority")
    }),

    // P215 — jackknife bias/SE for the price-per-unit ratio estimator
    // per return flag: the delete-one machinery on a statistic whose
    // naive SE formula is wrong
    "o54_jackknife" -> ((s, dir) => {
      graft.operators.Features.jackknifeRatio(
          table(s, dir, "lineitem")
            .select("l_returnflag", "l_extendedprice", "l_quantity"),
          "l_returnflag", "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")
    }),

    // P216 applied at keyX = keyY — the autocorrelation FUNCTION ladder
    // (o21 gives one lag per key; this is the full correlogram for one
    // series, lag 0 pinned at 1)
    "o67_acf" -> ((s, dir) => {
      graft.operators.TimeSeries.crossCorrelation(
          dailyMeans(s, dir), "event_type", "day", "v",
          keyX = "click", keyY = "click", maxLag = 10)
        .orderBy("lag")
    }),

    // P216 — lead/lag cross-correlation between the click and purchase
    // daily mean series at lags 0..7 over the shared daily frame
    "o55_ccf" -> ((s, dir) => {
      graft.operators.TimeSeries.crossCorrelation(
          dailyMeans(s, dir), "event_type", "day", "v",
          keyX = "click", keyY = "purchase", maxLag = 7)
        .orderBy("lag")
    }),

    // P219 — McNemar's paired before/after test: per user, "heavy
    // clicker" (≥ 7 clicks) in the first vs second 15 days of the
    // window; the ≥ 7 bar sits at the per-half click median so both
    // discordant cells are populated at every SF (the "any click"
    // variant saturates — measured before shipping)
    "o56_mcnemar" -> ((s, dir) => {
      val ev = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"),
          to_date(col("ts")).as("day"))
      val split = ev.agg(date_add(min(col("day")), 15).as("__split"))
      def clicks(cond: org.apache.spark.sql.Column) =
        sum(when(col("event_type") === "click" && cond, 1L).otherwise(0L))
      val pairs = ev.crossJoin(broadcast(split)) // 1-row scalar side
        .groupBy(col("user_id"))
        .agg((clicks(col("day") < col("__split")) >= 7).as("heavy_before"),
          (clicks(col("day") >= col("__split")) >= 7).as("heavy_after"))
      graft.operators.Features.mcnemarTest(pairs,
        "heavy_before", "heavy_after")
    }),

    // P222 — Bloom FPR audit over customer keys at two (m, k) configs:
    // the 256-bit filter is deliberately overloaded (fill ≈ 0.9 —
    // the "silently stopped filtering" failure mode), the 4096-bit one
    // is healthy; theory reads the OBSERVED fill, so no libm anywhere
    "sk10_bloom" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val ins = c.where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val all = c.select("c_custkey")
      graft.operators.Sketches.bloomFpr(ins, "c_custkey", all, "c_custkey",
          m = 256, k = 2, salt = "bfA:")
        .union(graft.operators.Sketches.bloomFpr(ins, "c_custkey", all,
          "c_custkey", m = 4096, k = 4, salt = "bfB:"))
        .orderBy("m")
    }),

    // P227 — randomization test for the o50 arm split on event value:
    // 32 deterministic hash re-assignments, ±1-corrected p
    "o59_permtest" -> ((s, dir) => {
      graft.operators.Features.permutationTestMeans(
        graft.Graft.events(s, dir).select(col("event_id"),
          (col("user_id") % 2 === 1).as("treat"), col("value")),
        "event_id", "treat", "value", resamples = 32)
    }),

    // P262 — Hodges–Lehmann shift between the arms on per-user mean
    // value: the robust "by how much" beside the rank tests' verdict
    // (unit-aggregated first — the d18 sample contract)
    "o74_hl_shift" -> ((s, dir) => {
      val units = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(col("value")).cast("double"), 6).as("mv"))
        .withColumn("arm", (col("user_id") % 2 === 1).cast("string"))
      graft.operators.Features.hodgesLehmannShift(units, "arm", "mv",
        "true", "false")
    }),

    // P264 — week-over-week value deltas per event type (epoch-day
    // weeks — never locale weekofyear, the o26 lesson)
    "dq14_wow" -> ((s, dir) => {
      val wk = expr(
        "datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7")
      val weekly = graft.Graft.events(s, dir)
        .where(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), wk.as("wk"))
        .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double"),
          6).as("sum_v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("wk").asc)
      weekly
        .withColumn("prev_v", lag(col("sum_v"), 1).over(w))
        .withColumn("delta",
          (col("sum_v").cast("decimal(18,6)") -
            col("prev_v").cast("decimal(18,6)")).cast("double"))
        .withColumn("pct_change",
          when(col("prev_v") =!= 0,
            round(col("delta") / col("prev_v"), 6)))
        .orderBy("event_type", "wk")
    }),

    // P259 — Friedman test across the five event types blocked by
    // user: k-condition rank test whose windows are all BLOCK-local
    "o72_friedman" -> ((s, dir) => {
      graft.operators.Features.friedmanTest(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "value"),
        "user_id", "event_type", "value")
    }),

    // P260 — Poisson two-rate test between the arms on events-per-user
    // (the count-metric A/B test; the t-test is the wrong model here)
    "o73_ratetest" -> ((s, dir) => {
      graft.operators.Features.poissonRateTest(
        graft.Graft.events(s, dir).where(col("user_id").isNotNull)
          .select((col("user_id") % 2 === 1).as("arm"), col("user_id")),
        "arm", "user_id")
    }),

    // P265 — Kruskal–Wallis rank ANOVA across the event types on
    // per-(user, type) mean value: the unpaired k-group complement to
    // o72's blocked Friedman
    "o75_kruskal" -> ((s, dir) => {
      val cells = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("m"))
      graft.operators.Features.kruskalWallis(cells, "event_type", "m")
    }),

    // P266 — Cochran's Q over the five event types on the per-user
    // "≥ 14 events of this type" flag: k matched binary treatments (the
    // o56 McNemar generalized). The ≥ 14 bar is the per-(user, type)
    // count MEDIAN at every SF (min 2, max 29) — a low bar saturates to
    // all-1 invariant blocks and nulls Q, measured before shipping
    "o76_cochranq" -> ((s, dir) => {
      val flags = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg((count(lit(1)) >= 14).as("f"))
      graft.operators.Features.cochranQ(flags, "user_id", "event_type", "f")
    }),

    // P267 — Cronbach's alpha of the 5-item per-user activity score
    // (items = event types, score = event count): do the five activity
    // counts measure ONE underlying engagement trait
    "o77_cronbach" -> ((s, dir) => {
      val scores = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("x"))
      graft.operators.Features.cronbachAlpha(
        scores, "user_id", "event_type", "x")
    }),

    // P268 — functional-dependency violation audit over four candidate
    // FDs: one that holds by key uniqueness (o_orderkey→o_orderstatus)
    // and three the TPC-H-ish generators genuinely violate
    "dq15_fd" -> ((s, dir) => {
      import graft.operators.Profiling.fdViolations
      fdViolations(table(s, dir, "lineitem"),
          Seq(("l_partkey", "l_suppkey")))
        .unionByName(fdViolations(table(s, dir, "orders"),
          Seq(("o_orderkey", "o_orderstatus"),
            ("o_custkey", "o_orderpriority"))))
        .unionByName(fdViolations(table(s, dir, "customer"),
          Seq(("c_nationkey", "c_mktsegment"))))
        .orderBy("fd")
    }),

    // P271 — Durbin–Watson on the per-type daily-trend residuals: is
    // the o29-style trend line hiding autocorrelation (DW ≈ 2 clean,
    // → 0 positive, → 4 negative); x = integral day index so every
    // residual is an exact decimal
    "o78_dw" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
        .select(col("event_type"),
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("long").as("x"),
          col("v"))
      graft.operators.Features.durbinWatson(daily, "event_type", "x", "v")
        .orderBy("event_type")
    }),

    // P272 — Hellinger drift of the event-type mix between the stream
    // halves: the bounded drift distance beside dq9's PSI
    "dq16_hellinger" -> ((s, dir) => {
      val e = graft.Graft.events(s, dir)
        .where(col("ts").isNotNull)
        .select("event_type", "ts")
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      graft.operators.Profiling.hellingerDrift(
        e.where(col("ts") < cut), e.where(col("ts") >= cut), "event_type")
    }),

    // P275 — SPRT ladder on the daily purchase rate per arm, H₀ p=0.17
    // vs H₁ p=0.20 (the corpus rate ≈ 0.198 sits in H₁'s favor, so the
    // upper boundary is genuinely crossed — measured at both SFs):
    // the peeking-safe sequential A/B readout beside o73's fixed-horizon
    // rate test
    "o79_sprt" -> ((s, dir) => {
      val daily = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy((col("user_id") % 2 === 1).as("arm"),
          to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"), count(lit(1)).as("trials"))
      graft.operators.Features.sprtLadder(daily, "arm", "day",
          "conv", "trials", p0 = 0.17, p1 = 0.20)
        .orderBy("arm", "period")
    }),

    // P278 — Gumbel block-maxima fit on daily peak value per type: the
    // capacity-planning return level ("the peak exceeded ~once per 100
    // days") a mean/p99 over raw rows understates
    "o80_evt" -> ((s, dir) => {
      graft.operators.TimeSeries.gumbelBlockMaxima(
          graft.Graft.events(s, dir)
            .where(col("ts").isNotNull)
            .select(col("event_type"), to_date(col("ts")).as("day"),
              col("value")),
          "event_type", "day", "value")
        .orderBy("event_type")
    }),

    // P280 — I-MR control chart on the per-type daily means: center ±
    // 2.66·MR̄ limits from the series' own short-term noise, per-day
    // out-of-control flags (the SPC read beside o19's CUSUM)
    "o81_imr" -> ((s, dir) => {
      graft.operators.TimeSeries.individualsChart(
          dailyMeans(s, dir), "event_type", "day", "v")
        .orderBy("event_type", "day")
    }),

    // P279 — run-length layout audit of three orders columns under the
    // o_orderkey physical order: what parquet RLE would actually see
    "z10_rle" -> ((s, dir) => {
      graft.operators.ZOrder.runLengthAudit(
        table(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate"))),
        "o_orderkey",
        Seq("o_orderstatus", "o_orderpriority", "o_year"))
    }),

    // P261 — drift monitor between the event-stream halves: the dq1
    // profiler pointed at time (the nightly "did the feed change" job)
    "pipe11_drift" -> ((s, dir) => {
      val e = graft.Graft.events(s, dir)
        .select("user_id", "event_type", "value", "ts")
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      graft.operators.Profiling.driftReport(
          e.where(col("ts") < cut).drop("ts"),
          e.where(col("ts") >= cut).drop("ts"),
          Seq("user_id", "event_type", "value"))
        .orderBy("column")
    }),

    // P257 — Wilcoxon signed-rank on per-user first-half vs
    // second-half mean value: the paired, distribution-free
    // before/after test
    "o70_wilcoxon" -> ((s, dir) => {
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      val dec = col("value").cast("decimal(18,6)")
      def half(cond: org.apache.spark.sql.Column) =
        round(sum(when(cond, dec)).cast("double") /
          sum(when(cond, 1L).otherwise(0L)).cast("double"), 6)
      val pairs = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(half(col("ts") < cut).as("x"), half(col("ts") >= cut).as("y"))
      graft.operators.Features.wilcoxonSignedRank(pairs, "x", "y")
    }),

    // P258 — Matthews correlation of the o61 stump rule (n_events ≤ 7)
    // against the churn label: the skew-honest classifier score beside
    // accuracy/precision/recall/F1
    "o71_mcc" -> ((s, dir) => {
      val frame = graft.operators.TimeSeries.churnLabels(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "ts", "value"),
        Seq("user_id", "event_type"), "ts", "value", horizonDays = 2)
      graft.operators.Features.matthewsCorrelation(
        frame.select((col("n_events") <= 7).as("pred"), col("churned")),
        "pred", "churned")
    }),

    // P256 — HLL max-merge union of click-user and purchase-user
    // sketches: the mergeability that makes HLL the 1000-executor
    // distinct counter, audited against exact counts
    "sk13_hll_union" -> ((s, dir) => {
      graft.operators.Sketches.hllUnion(
        graft.Graft.events(s, dir).select("user_id", "event_type"),
        "user_id", "event_type", tagA = "click", tagB = "purchase", p = 6)
    }),

    // P298 — odds ratio heavy-clicker → heavy-buyer with the Woolf 95%
    // CI: the effect size beside o13's association verdict; the ≥ 14
    // bar is the per-(user, type) count median (the o76 saturation
    // lesson)
    "o87_odds" -> ((s, dir) => {
      graft.operators.Features.oddsRatio(heavyUserFrame(s, dir),
        "heavy_click", "heavy_buy")
    }),

    // P300 — risk ratio + Katz CI + Yule's Q over the SAME 2×2 as o87:
    // the prospective effect size ("how much likelier does a heavy
    // clicker buy heavily") that the odds ratio overstates when the
    // outcome is common, plus the [−1,1]-normalized association
    "o89_riskratio" -> ((s, dir) => {
      graft.operators.Features.riskRatio(heavyUserFrame(s, dir),
        "heavy_click", "heavy_buy")
    }),

    // P299 — Mantel–Haenszel pooled odds ratio + CMH χ² across market
    // segments: is rich-balance → many-orders association confounded
    // by segment (≥10-order bar measured: min cell 3 at sf0.001, 49 at
    // sf0.01 — non-vacuous at both SFs)
    "o88_mh" -> ((s, dir) => {
      val cnt = table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("__no"))
      val cu = table(s, dir, "customer")
        .join(cnt.hint("shuffle_hash"),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment").as("seg"),
          (col("c_acctbal") > 5000.0).as("exposed"),
          (coalesce(col("__no"), lit(0L)) >= 10).as("outcome"))
      graft.operators.Features.mantelHaenszel(cu, "seg", "exposed",
        "outcome")
    }),

    // P301 — Lin's concordance correlation over the o82 day-paired
    // metric series: precision (r) × accuracy (C_b) against the y = x
    // identity — "are these two metrics interchangeable", not merely
    // "linearly related"
    "o90_ccc" -> ((s, dir) => {
      graft.operators.Features.linCCC(
          dailyPairFrame(s, dir, "click", "view")
            .unionByName(dailyPairFrame(s, dir, "signup", "purchase")),
          "pair", "x", "y")
        .orderBy("pair")
    }),

    // P302 — Bland–Altman limits of agreement over the same day-paired
    // series: bias, 95% limits d̄ ± 1.96·SD, and the share of days
    // inside them — the method-comparison readout correlation hides
    "o91_bland_altman" -> ((s, dir) => {
      graft.operators.Features.blandAltman(
          dailyPairFrame(s, dir, "click", "view")
            .unionByName(dailyPairFrame(s, dir, "signup", "purchase")),
          "pair", "x", "y")
        .orderBy("pair")
    }),

    // P303 — Mood's median test of quantity across return flags: the
    // outlier-proof k-group location test (l_quantity's 1..50 integer
    // domain is exactly the bucket-ladder contract)
    "o92_mood" -> ((s, dir) => {
      graft.operators.Features.moodMedianTest(
        table(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        "l_returnflag", "l_quantity")
    }),

    // P304 — Bartlett variance homogeneity across event types: the
    // sharp-under-normality counterpart of o58's Brown–Forsythe
    // (disagreement between the two IS the non-normality signal)
    "o93_bartlett" -> ((s, dir) => {
      graft.operators.Features.bartlettTest(
        graft.Graft.events(s, dir).select("event_type", "value"),
        "event_type", "value")
    }),

    // P305 — ICC(1,1) with user as the group: is a user's event value
    // a stable trait (reliability) or is the user grouping noise —
    // the o57 ANOVA mean squares re-read as an effect size
    "o94_icc" -> ((s, dir) => {
      graft.operators.Features.iccOneWay(
        graft.Graft.events(s, dir).select("user_id", "value"),
        "user_id", "value")
    }),

    // P325 — Page's trend test on the o72 design with the alphabetical
    // type order as the named hypothesis: does per-user mean value
    // increase along click < error < purchase < signup < view
    "o105_page" -> ((s, dir) => {
      graft.operators.Features.pageTrendTest(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "value"),
        "user_id", "event_type", "value",
        Seq("click", "error", "purchase", "signup", "view"))
    }),

    // P306 — Kendall's W over the o72 Friedman design (users ranking
    // event types by mean value): the concordance effect size behind
    // the χ² verdict
    "o95_kendallw" -> ((s, dir) => {
      graft.operators.Features.kendallW(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "value"),
        "user_id", "event_type", "value")
    }),

    // P307 — Chow break test: did each event type's value~time trend
    // change at Jan 16 (the o68 experiment cut) — separate fits per
    // regime vs pooled, F on the SSE gap
    "o96_chow" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
        .select(col("event_type"),
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("long").as("di"),
          col("v"),
          (col("day") >= lit(java.sql.Date.valueOf("2024-01-16")))
            .as("late"))
      graft.operators.Features.chowTest(daily, "event_type", "late",
          "di", "v")
        .orderBy("event_type")
    }),

    // P308 — Breusch–Pagan: does residual variance of the day-paired
    // metric fits grow with the regressor (the "OLS standard errors
    // are a lie" audit)
    "o97_bp" -> ((s, dir) => {
      graft.operators.Features.breuschPagan(
          dailyPairFrame(s, dir, "click", "view")
            .unionByName(dailyPairFrame(s, dir, "signup", "purchase")),
          "pair", "x", "y")
        .orderBy("pair")
    }),

    // P309 — regression influence: the 5 days that OWN each day-paired
    // metric fit, by Cook's distance with leverage and residual
    "o98_influence" -> ((s, dir) => {
      graft.operators.Features.regressionInfluence(
          dailyPairFrame(s, dir, "click", "view")
            .unionByName(dailyPairFrame(s, dir, "signup", "purchase")),
          "pair", "day", "x", "y", topK = 5)
        .orderBy("pair", "rnk")
    }),

    // P310 — forecast skill: MAE/RMSE/sMAPE of the weekly seasonal
    // naive + MASE vs lag-1 persistence over the same day set — is
    // the weekly pattern actually informative
    "o99_forecast_skill" -> ((s, dir) => {
      graft.operators.TimeSeries.forecastSkill(
          dailyMeans(s, dir), "event_type", "day", "v", seasonLag = 7)
        .orderBy("event_type")
    }),

    // P311 — part revenue concentration per brand: HHI + CR4 — "does
    // one SKU own the brand" (entity grain measured: 4-12 parts/brand
    // at sf0.001, 62-96 at sf0.01 — CR4 non-saturated; the
    // supplier-per-nation cut read cr4 = 1.0 everywhere at the gate SF)
    "o100_hhi" -> ((s, dir) => {
      val rev = table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .as("rev"))
      val j = table(s, dir, "part")
        .join(rev.hint("shuffle_hash"),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand").as("brand"),
          col("p_partkey").as("pk"), col("rev"))
      graft.operators.Features.concentrationIndex(j, "brand", "pk",
          "rev")
        .orderBy("brand")
    }),

    // P312 — customer spend inequality per market segment: Atkinson
    // ε=1 + Hoover beside o31's Gini and o66's Lorenz curve
    "o101_atkinson" -> ((s, dir) => {
      val spend = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .as("spend"))
      val j = table(s, dir, "customer")
        .join(spend.hint("shuffle_hash"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("segment"), col("spend"))
      graft.operators.Features.inequalityIndices(j, "segment", "spend")
        .orderBy("segment")
    }),

    // P313 — periodogram over candidate periods {3,5,7,10}: WHICH
    // cycle length dominates each event type's daily series (o26
    // assumes weekly; this finds it)
    "o102_periodogram" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
        .select(col("event_type"),
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("long").as("di"),
          col("v"))
      graft.operators.TimeSeries.periodogram(daily, "event_type", "di",
          "v", Seq(3, 5, 7, 10))
        .orderBy("event_type", "period")
    }),

    // P314 — PACF lags 1..3 by Durbin–Levinson on the o83 pooled ACF:
    // does lag 2/3 structure survive once lag 1 is stripped (the AR
    // order probe)
    "o103_pacf" -> ((s, dir) => {
      graft.operators.TimeSeries.pacfDurbinLevinson(
          dailyMeans(s, dir), "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P297 — Granger causality (lag 1) between the click and purchase
    // daily means, both directions: does x's past improve y's forecast
    // beyond y's own past (x = click, y = purchase)
    // TWO series pairs so the lag window's partition key is a real
    // column (a single literal key constant-folds into an unpartitioned
    // window — caught by the PlanFactsSpec gate)
    "o86_granger" -> ((s, dir) => {
      graft.operators.TimeSeries.grangerLag1(
          dailyPairFrame(s, dir, "click", "purchase")
            .unionByName(dailyPairFrame(s, dir, "view", "signup"))
            .withColumnRenamed("pair", "series"),
          "series", "day", "x", "y")
        .orderBy("series", "direction")
    }),

    // P364 — Engle–Granger cointegration on the o86 series pairs: is
    // the LEVEL relation y = α + βx stationary in its residuals (the
    // long-run-equilibrium read Granger's lag test cannot give)
    "o117_coint" -> ((s, dir) => {
      graft.operators.TimeSeries.engleGranger(
          dailyPairFrame(s, dir, "click", "purchase")
            .unionByName(dailyPairFrame(s, dir, "view", "signup"))
            .withColumnRenamed("pair", "series"),
          "series", "day", "x", "y")
        .orderBy("series")
    }),

    // P291 — Ljung–Box whiteness test at h=7 on the per-type daily
    // means: is there ANY serial structure in the first week of lags
    // (o78's DW sees only lag 1)
    "o83_ljungbox" -> ((s, dir) => {
      graft.operators.TimeSeries.ljungBox(
          dailyMeans(s, dir), "event_type", "day", "v", maxLag = 7)
        .orderBy("event_type")
    }),

    // P292 — Hurst exponent by variance of aggregates over the daily
    // series: long-range dependence (H > 0.5 persistent) read off the
    // ln Var(m) vs ln m slope at m ∈ {1,2,4,8}
    "o84_hurst" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
        .select(col("event_type"),
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("long").as("di"),
          col("v"))
      graft.operators.TimeSeries.hurstExponent(daily, "event_type", "di",
          "v")
        .orderBy("event_type")
    }),

    // P293 — CMS join-size estimate: |clicks ⋈ purchases| on user_id
    // from two 3×256 sketches vs the exact keyed count-join — the
    // AQE-style cardinality read from mergeable state
    "sk15_cms_join" -> ((s, dir) => {
      val e = graft.Graft.events(s, dir).select("user_id", "event_type")
      graft.operators.Sketches.cmsJoinSize(
        e.where(col("event_type") === "click").select(col("user_id")),
        "user_id",
        e.where(col("event_type") === "purchase").select(col("user_id")),
        "user_id", rows = 3, width = 256)
    }),

    // P320 — linear counting of distinct users per event type at
    // m = 256 (load ~0.6): the small-cardinality sketch that HLL's own
    // low-range branch delegates to, with the exact audit beside it
    "sk16_linear" -> ((s, dir) => {
      graft.operators.Sketches.linearCounting(
          graft.Graft.events(s, dir).select("event_type", "user_id"),
          "user_id", Seq("event_type"), m = 256)
        .orderBy("event_type")
    }),

    // P288 — HLL intersection by inclusion–exclusion over the sk13
    // sketches: the overlap readout ("clickers who also purchase") from
    // mergeable state, audited against the exact intersection
    "sk14_hll_intersect" -> ((s, dir) => {
      graft.operators.Sketches.hllIntersect(
        graft.Graft.events(s, dir).select("user_id", "event_type"),
        "user_id", "event_type", tagA = "click", tagB = "purchase", p = 6)
    }),

    // P289 — Deming regression between day-paired metric series (click
    // vs view, signup vs purchase daily means): both measurements are
    // noisy, so OLS attenuates — the orthogonal line is the honest
    // "do these metrics move 1:1" calibration. δ = 1 needs COMPARABLE
    // scales: the first cut (quantity vs price, 4 orders of magnitude
    // apart) degenerated to a near-vertical fit whose intercept hit
    // the 14-significant-digit rounding cliff — caught by the local
    // gate, repaired by pairing like-scaled series
    "o82_deming" -> ((s, dir) => {
      graft.operators.Features.demingFit(
          dailyPairFrame(s, dir, "click", "view")
            .unionByName(dailyPairFrame(s, dir, "signup", "purchase")),
          "pair", "x", "y")
        .orderBy("pair")
    }),

    // P296 — VIF multicollinearity audit over day-paired metric series:
    // r² from the o11 fit, VIF = 1/(1−r²) on the ROUNDED r² — "can I
    // put both of these in one regression"
    "o85_vif" -> ((s, dir) => {
      val pairs = dailyPairFrame(s, dir, "click", "view")
        .unionByName(dailyPairFrame(s, dir, "click", "purchase"))
        .unionByName(dailyPairFrame(s, dir, "view", "purchase"))
      graft.operators.Features.olsFit(pairs, "pair", "x", "y")
        .select(col("pair"), col("n"), col("r2"),
          when(col("r2").isNotNull && col("r2") < 1.0,
            round(lit(1.0) / (lit(1.0) - col("r2")), 6)).as("vif"))
        .orderBy("pair")
    }),

    // P322 — Little's law over order SHIPPING WINDOWS (first → last
    // shipment per order; this corpus's shipdates are independent of
    // order dates, so the order→ship span is not a duration): λ, W,
    // the exact delta-sweep L, and the WIP peak — how many orders are
    // actively shipping on an average/peak day
    "q29_littleslaw" -> ((s, dir) => {
      val jobs = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(to_date(col("l_shipdate"))).as("arrival"),
          max(to_date(col("l_shipdate"))).as("complete"))
      graft.operators.TimeSeries.littlesLaw(jobs, "arrival", "complete")
    }),

    // P346 — the daily WIP curve behind q29's one-row audit: arrivals,
    // completions and orders in flight per calendar day over the same
    // shipping windows (densified spine — a quiet day surfaces as a row)
    "q21_wip_series" -> ((s, dir) => {
      val jobs = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(to_date(col("l_shipdate"))).as("arrival"),
          max(to_date(col("l_shipdate"))).as("complete"))
      graft.operators.TimeSeries.wipSeries(jobs, "arrival", "complete")
        .orderBy("day")
    }),

    // P323 — Horvitz–Thompson total under size-proportional inclusion
    // π = min(1, orders/32): sample heavy customers surely, light ones
    // proportionally, and still estimate total spend without bias
    "sa21_ht" -> ((s, dir) => {
      val sp = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
      graft.operators.Sampling.horvitzThompson(sp, "o_custkey", "n_ord",
        "spend", k = 32)
    }),

    // P249 — sampling convergence: mean event value ± CI at dyadic
    // hash fractions 1/64..1 — "how small a profiling sample is safe"
    "sa20_sample_curve" -> ((s, dir) => {
      graft.operators.Sampling.sampleConvergence(
          graft.Graft.events(s, dir).select("event_id", "value"),
          "event_id", "value")
        .orderBy("fraction")
    }),

    // P250 — CUPED variance-reduction gain: the o22 adjustment scored
    // by the o23 Welch t on BOTH metrics — the "did CUPED buy power"
    // readout (|t| grows when the pre-period explains variance)
    "o68_cuped_gain" -> ((s, dir) => {
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      val dec = col("value").cast("decimal(18,6)")
      val perUser = graft.Graft.events(s, dir)
        .groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("ts") < cut, dec)), lit(BigDecimal(0)))
          .cast("double").as("x"),
          coalesce(sum(when(col("ts") >= cut, dec)), lit(BigDecimal(0)))
            .cast("double").as("y"))
      val adj = graft.operators.Features.cupedAdjust(perUser, "x", "y")
        .withColumn("arm", (col("user_id") % 2 === 1).cast("string"))
      def side(metric: String, vcol: String) =
        graft.operators.Features.welchTTest(adj, "arm", vcol,
            "true", "false")
          .select(lit(metric).as("metric"), col("n_a"), col("n_b"),
            col("mean_a"), col("mean_b"), col("t"), col("dof"))
      side("cuped", "y_cuped").union(side("raw", "y")).orderBy("metric")
    }),

    // P242 — DAU / trailing-7-day stickiness over events: the
    // engagement series with exact distinct counts per spine day
    "q22_stickiness" -> ((s, dir) => {
      graft.operators.TimeSeries.activeUserRatio(
          graft.Graft.events(s, dir).select("user_id", "ts"),
          "user_id", "ts", windowDays = 7)
        .orderBy("day")
    }),

    // P243 — orders→lineitem fan-out bands: ~1.7% orphan parents (the
    // dq12 finding read from the join-multiplier side)
    "dq13_fanout" -> ((s, dir) => {
      graft.operators.Profiling.joinFanout(
          table(s, dir, "orders"), "o_orderkey",
          table(s, dir, "lineitem"), "l_orderkey")
        .orderBy("band_id")
    }),

    // P386 — category churn between Jan-1995 and Feb-1995 order
    // slices: which part/supplier/customer ids appeared or vanished
    // month over month — the discrete set-difference read dq1/dq9's
    // continuous drift scores smear away (measured: parts ~420 each
    // way at sf0.01 — real monthly assortment churn)
    "dq19_cat_churn" -> ((s, dir) => {
      def slice(from: String, to: String) =
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders").hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .where(col("o_orderdate").cast("date") >=
              lit(java.sql.Date.valueOf(from)) &&
            col("o_orderdate").cast("date") <
              lit(java.sql.Date.valueOf(to)))
          .select(col("l_partkey"), col("l_suppkey"), col("o_custkey"))
      graft.operators.Profiling.categoryChurn(
          slice("1995-01-01", "1995-02-01"),
          slice("1995-02-01", "1995-03-01"),
          Seq("l_partkey", "l_suppkey", "o_custkey"))
        .orderBy("col_name")
    }),

    // P378 — cross-field date-order audit per order priority: how many
    // lineitems SHIP BEFORE their order date (a real corpus finding —
    // ship dates generate independently of order dates here, ~20%
    // negative spans; dq13's fanout read beside the dq1/dq6 per-column
    // profiles can't see a cross-COLUMN impossibility)
    "dq18_date_order" -> ((s, dir) => {
      val j = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
      graft.operators.Profiling.dateOrderAudit(j, "o_orderpriority",
          "o_orderdate", "l_shipdate")
        .orderBy("o_orderpriority")
    }),

    // P244 — hour-of-day-stratified arm difference on event value: the
    // adjustment the o63 balance table motivates
    "o65_strata" -> ((s, dir) => {
      val ev = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .select((col("user_id") % 2 === 1).as("arm"),
          hour(col("ts")).as("hod"), col("value"))
      graft.operators.Features.stratifiedDiff(ev, "arm", "hod", "value",
          strata = 5)
        .orderBy("stratum")
    }),

    // P245 — Lorenz curve of per-customer spend in spend deciles: the
    // concentration read o31's Gini integrates
    "o66_lorenz" -> ((s, dir) => {
      val spend = table(s, dir, "orders")
        .where(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
          .as("spend"))
      graft.operators.Features.lorenzPoints(spend, "spend", buckets = 10)
        .orderBy("bucket")
    }),

    // P239 — covariate balance between the o50 arms over three event
    // features: the table any observational estimate prints first
    "o63_balance" -> ((s, dir) => {
      val ev = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .select((col("user_id") % 2 === 1).as("arm"), col("value"),
          hour(col("ts")).as("hod"), length(col("props")).as("plen"))
      graft.operators.Features.covariateBalance(ev, "arm",
          Seq("value", "hod", "plen"))
        .orderBy("feature")
    }),

    // P241 — calibration of the inverse-volume churn score against the
    // q20 label: the reliability diagram as a frame
    "o64_calibration" -> ((s, dir) => {
      val frame = graft.operators.TimeSeries.churnLabels(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "ts", "value"),
        Seq("user_id", "event_type"), "ts", "value", horizonDays = 2)
      val scored = frame.select(
        round(lit(1.0) / (col("n_events") + 1).cast("double"), 6)
          .as("score"), col("churned"))
      graft.operators.Features.calibrationTable(scored, "score", "churned",
          bins = 10)
        .orderBy("bucket")
    }),

    // P234 — TOST equivalence between the o50 arms at ±5 on event
    // value: the no-regression gate a non-significant t cannot give
    "o62_tost" -> ((s, dir) => {
      graft.operators.Features.tostEquivalence(
        graft.Graft.events(s, dir)
          .where(col("user_id").isNotNull)
          .select((col("user_id") % 2).cast("string").as("arm"),
            col("value")),
        "arm", "value", groupA = "1", groupB = "0", margin = 5.0)
    }),

    // P235 — KMV set algebra over click-users vs purchase-users at
    // k = 64: union/intersection/Jaccard estimates beside the exact
    // audit columns
    "sk11_kmv_setops" -> ((s, dir) => {
      graft.operators.Sketches.kmvSetOps(
        graft.Graft.events(s, dir).select("user_id", "event_type"),
        "user_id", "event_type", tagA = "click", tagB = "purchase",
        k = 64, salt = "kmvset:")
    }),

    // P232 — decision stump on the q20 churn frame: how predictive is
    // event volume alone for the churn label, and where does it cut
    "o61_stump" -> ((s, dir) => {
      val frame = graft.operators.TimeSeries.churnLabels(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "ts", "value"),
        Seq("user_id", "event_type"), "ts", "value", horizonDays = 2)
      graft.operators.Features.decisionStump(
          frame.select(col("n_events"), col("churned")),
          "n_events", "churned", quantiles = 10)
        .orderBy("thr")
    }),

    // P223 — one-way ANOVA of event value across the five event types:
    // the k-group mean test run before any pairwise comparison
    "o57_anova" -> ((s, dir) => {
      graft.operators.Features.oneWayAnova(
        graft.Graft.events(s, dir).select("event_type", "value"),
        "event_type", "value")
    }),

    // P224 — Brown–Forsythe homogeneity of variance across the same
    // groups: the pooled-variance legitimacy check behind o23/o34
    "o58_levene" -> ((s, dir) => {
      graft.operators.Features.leveneBrownForsythe(
        graft.Graft.events(s, dir).select("event_type", "value"),
        "event_type", "value")
    }),

    // P226 — churn labels + features per (user, event type) at a 2-day
    // horizon: ~25% churned at every SF (measured — the per-user event
    // density is SF-invariant, so the label mix holds)
    "q20_churn" -> ((s, dir) => {
      graft.operators.TimeSeries.churnLabels(
          graft.Graft.events(s, dir)
            .select("user_id", "event_type", "ts", "value"),
          Seq("user_id", "event_type"), "ts", "value", horizonDays = 2)
        .orderBy("user_id", "event_type")
    }),

    // P240 — delta-encoding audit: order-total deltas per hash shard
    // under the candidate sort vs arrival order — the "will
    // delta/FOR encoding and zone pruning bite" measurement
    "z9_delta" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      graft.operators.ZOrder.deltaStats(o, "o_orderkey", "o_totalprice",
          "o_totalprice", shards = 8, tag = "sorted")
        .union(graft.operators.ZOrder.deltaStats(o, "o_orderkey",
          "o_totalprice", "o_orderkey", shards = 8, tag = "arrival"))
        .orderBy("tag", "shard")
    }),

    // P225 — range-partition balance of order totals at 8 cuts: the
    // sort-key health audit before a sorted/bucketed write
    "z8_rangebalance" -> ((s, dir) => {
      graft.operators.ZOrder.rangeBalance(
          table(s, dir, "orders").select("o_totalprice"),
          "o_totalprice", partitions = 8)
        .orderBy("bucket")
    }),

    // P217 — order-total reconciliation against the TPC-H charge
    // recompute per status: a REAL finding on this corpus (the
    // synthetic totals never match; ~1.7% of orders have no lineitems)
    "dq12_reconcile" -> ((s, dir) => {
      val one = lit(new java.math.BigDecimal("1.000000"))
      val charge = (col("l_extendedprice").cast("decimal(18,6)") *
        (one - col("l_discount").cast("decimal(8,6)")) *
        (one + col("l_tax").cast("decimal(8,6)"))).as("charge")
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), charge)
      graft.operators.Profiling.reconcileTotals(
          table(s, dir, "orders"), "o_orderkey", "o_totalprice",
          "o_orderstatus", li, "l_orderkey", "charge")
        .orderBy("o_orderstatus")
    }),

    // P206 — decile Q–Q points between the q17 arms on event value:
    // where (if anywhere) do the distributions diverge
    "o50_qq" -> ((s, dir) => {
      graft.operators.Features.qqPoints(
          graft.Graft.events(s, dir).select(
            (col("user_id") % 2 === 1).as("treat"), col("value")),
          "treat", "value")
        .orderBy("p")
    }),

    // P207 — daily ingest-volume anomaly screen over events: each day's
    // count z-scored against the trailing week
    "dq11_volume" -> ((s, dir) => {
      graft.operators.Profiling.volumeAnomaly(
          graft.Graft.events(s, dir).select("ts"), "ts")
        .orderBy("day")
    }),

    // P203 — partial correlation quantity↔price controlling for
    // discount: the confounder screen over the o16 moment machinery
    "o48_partialcorr" -> ((s, dir) => {
      graft.operators.Features.partialCorrelation(
        table(s, dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount"),
        "l_quantity", "l_extendedprice", "l_discount")
    }),

    // P204 — Cohen's d on event value, odd users treated (the q17
    // arms): how BIG the arm difference is, with magnitude labels
    "o49_cohensd" -> ((s, dir) => {
      graft.operators.Features.cohensD(
        graft.Graft.events(s, dir).select(
          (col("user_id") % 2 === 1).as("treat"), col("value")),
        "treat", "value")
    }),

    // P199 — Jarque–Bera normality triage per event type: skew/kurtosis
    // from exact milli-unit integer central moments
    "o47_jarque" -> ((s, dir) => {
      graft.operators.Features.jarqueBera(
          graft.Graft.events(s, dir).select("event_type", "value"),
          "event_type", "value")
        .orderBy("event_type")
    }),

    // P202 — histogram quantiles (25-wide buckets) vs exact R-7 with
    // the built-in error audit, p50 and p95 per event type
    "sk9_histq" -> ((s, dir) => {
      graft.operators.Sketches.histQuantile(
          graft.Graft.events(s, dir).select("event_type", "value"),
          "event_type", "value", bandWidth = 25.0, ps = Seq(0.5, 0.95))
        .orderBy("event_type", "p")
    }),

    // P196 — Tukey fences per event type: exact R-7 quartiles, 1.5·IQR
    // whiskers, outlier counts beyond each
    "o46_tukey" -> ((s, dir) => {
      graft.operators.Features.tukeyFences(
          graft.Graft.events(s, dir).select("event_type", "value"),
          "event_type", "value")
        .orderBy("event_type")
    }),

    // P195 — candidate-key audit over orders: o_orderkey is the key,
    // the others carry duplicates — one scan, exact distincts
    "dq10_keys" -> ((s, dir) => {
      graft.operators.Profiling.candidateKeys(table(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        .orderBy("column_name")
    }),

    // P198 — Hilbert covering ranges for the box qx∈[100,399],
    // qy∈[200,599] on the z2 grid: the range pre-filter + the exact box
    // predicate must equal the plain box scan (the oracle) — an
    // under-covering range set would DROP rows and fail the hash
    "z7_hilbert_ranges" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val x = pmod(col("o_custkey"), lit(1024)).cast("long")
      val y = pmod(col("o_orderkey"), lit(1024)).cast("long")
      // depth 5 (32-cell leaves): ~40 merged intervals — the depth-8 set
      // was ~350 intervals whose OR chain cost 8s at sf0.1 for zero
      // extra pruning value in an identity-checked query
      val ranges = graft.operators.ZOrder.hilbertRanges(
        10, 100L, 399L, 200L, 599L, maxDepth = 5)
      o.select(col("o_orderkey"), x.as("qx"), y.as("qy"),
          graft.operators.ZOrder.hilbertValue(10, x, y).as("__h"))
        .where(graft.operators.ZOrder.hilbertRangePredicate(col("__h"), ranges) &&
          col("qx").between(100, 399) && col("qy").between(200, 599))
        .select("o_orderkey", "qx", "qy")
        .orderBy("o_orderkey")
    }),

    // P189 — PSI drift of the event value distribution, first half of
    // the month (ref) vs the rest (cur), 25-wide bands
    "dq9_psi" -> ((s, dir) => {
      graft.operators.Profiling.populationStability(
          graft.Graft.events(s, dir)
            .where(col("ts").isNotNull)
            .select((col("ts") >=
              lit("2024-01-16 00:00:00").cast("timestamp")).as("cur"),
              col("value")),
          "cur", "value", bandWidth = 25.0)
        .orderBy("band")
    }),

    // P180 — anomalous-days pipeline: o32's residuals screened by o10's
    // MAD modified-z at 2.5 — two verified stages composed lazily
    "pipe6_anomaly" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      val resid = graft.operators.TimeSeries.seasonalDecompose(daily,
          "event_type", "day", "v")
        .where(col("resid").isNotNull)
        .select("event_type", "day", "resid")
      graft.operators.Features.madOutliers(resid, "event_type", "resid",
          cutoff = 2.5)
        .select("event_type", "day", "resid", "med", "mad", "mz", "outlier")
        .orderBy("event_type", "day")
    }),

    // P173 — Theil-Sen robust slope of the daily mean value per event
    // type: the outlier-proof companion to o29's direction test
    "o38_theilsen" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      graft.operators.TimeSeries.theilSenSlope(daily,
          "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P174 — minimum detectable effect per event type for a future
    // 50/50 A/B at alpha 0.05 / power 0.80
    "q16_power" -> ((s, dir) => {
      graft.operators.Features.mdeEstimate(
          graft.Graft.events(s, dir).select("event_type", "value"),
          "event_type", "value")
        .orderBy("event_type")
    }),

    // P169 — two-sample KS distance between returned and non-returned
    // line price distributions: the shape-drift companion to o23/o15
    "o37_ks" -> ((s, dir) => {
      graft.operators.Features.ksTest(table(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", groupA = "R", groupB = "N")
    }),

    // P333 — split-half reliability of per-user event value by
    // event-id parity, stepped up by Spearman–Brown: is "user value"
    // a stable trait of the user or per-event noise (the o94 ICC
    // question with one measure and a coin)
    "o107_splithalf" -> ((s, dir) => {
      graft.operators.Features.splitHalfReliability(
        graft.Graft.events(s, dir)
          .select("user_id", "event_id", "value"),
        "user_id", "event_id", "value")
    }),

    // P334 — Poisson dispersion of per-user event counts by type:
    // D ≈ 1 = organic arrivals, D ≫ 1 = bursts/bots, D < 1 = capped
    // feed (every user has every type in this corpus — no
    // zero-truncation, the sk16 read)
    "o108_dispersion" -> ((s, dir) => {
      val cnts = graft.Graft.events(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Features.poissonDispersion(cnts, "event_type",
          "cnt")
        .orderBy("event_type")
    }),

    // P328 — Cramér–von Mises R-vs-N price distributions beside o37's
    // KS: the integrated-ECDF read that catches broad mid-distribution
    // drift a single worst gap misses
    "o106_cvm" -> ((s, dir) => {
      graft.operators.Features.cvmTest(table(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", groupA = "R", groupB = "N")
    }),

    // P361 — two-sample Anderson–Darling on the SAME pair the o37 KS
    // and o106 CvM read: the tail-weighted member of the family
    // (E[A²] = 1 under H₀)
    "o116_anderson" -> ((s, dir) => {
      graft.operators.Features.andersonDarlingTest(
        table(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
        groupA = "R", groupB = "N")
    }),

    // P330 — spend-quintile migration H1 → H2 (cut 1998-05-01, the
    // corpus midpoint): the customer-value transition matrix behind
    // "are my best customers staying my best customers"
    "q30_decile_migration" -> ((s, dir) => {
      val cut = lit(java.sql.Date.valueOf("1998-05-01"))
      val dec = col("o_totalprice").cast(DecimalType(18, 2))
      val zero = lit(BigDecimal(0)).cast(DecimalType(18, 2))
      val per = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(coalesce(sum(when(to_date(col("o_orderdate")) < cut, dec)),
          zero).cast("double").as("h1"),
          coalesce(sum(when(to_date(col("o_orderdate")) >= cut, dec)),
            zero).cast("double").as("h2"))
      val scored = graft.operators.Features.quantileScores(per,
        Seq("h1", "h2"), buckets = 5)
      val t = scored.agg(count(lit(1)).as("__t"))
      scored.groupBy(col("h1_score"), col("h2_score"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(t)) // 1-row scalar side
        .select(col("h1_score"), col("h2_score"), col("n"),
          round(col("n").cast("double") / col("__t").cast("double"), 6)
            .as("share"))
        .orderBy("h1_score", "h2_score")
    }),

    // P171 — sample-ratio-mismatch alarm on the o28 assignment: odd
    // users "treated", design ratio 50/50
    "q15_srm" -> ((s, dir) => {
      graft.operators.Features.srmCheck(
        graft.Graft.events(s, dir)
          .select((col("user_id") % 2 === 1).as("treat")), "treat")
    }),

    // P172 — per-type freshness: latest event and staleness vs the
    // global high-water mark
    "dq7_freshness" -> ((s, dir) => {
      graft.operators.Profiling.freshness(
          graft.Graft.events(s, dir), "event_type", "ts")
        .orderBy("event_type")
    }),

    // P165 — seasonal-naive backtest (forecast = last week, same day)
    // over the daily mean value per event type: MAE/MAPE/bias
    "o35_backtest" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      graft.operators.TimeSeries.seasonalNaiveBacktest(daily,
          "event_type", "day", "v", lagDays = 7)
        .orderBy("event_type")
    }),

    // P166 — runs test for randomness of the daily series around its
    // median, per event type
    "o36_runs" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      graft.operators.Features.runsTest(daily, "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P167 — prune simulation: a 5-predicate date workload against the
    // z5 shipdate-ordered layout's file bands
    "z6_prune_sim" -> ((s, dir) => {
      val d = table(s, dir, "lineitem")
        .select(to_date(col("l_shipdate")).as("sd"),
          col("l_orderkey"), col("l_linenumber"))
      val bands = graft.operators.Bucketing.zoneMapAudit(
          d, Seq("sd", "l_orderkey", "l_linenumber"), "sd",
          rowsPerFile = 2000)
        .select(col("file_id"), col("lo"), col("hi"))
      val preds = s.createDataFrame(Seq(
          (1, "1995-01-01", "1995-06-30"),
          (2, "1996-01-01", "1996-12-31"),
          (3, "1999-01-01", "2001-12-31"),
          (4, "1995-03-01", "1995-03-31"),
          (5, "1990-01-01", "1994-12-31")))
        .toDF("pred_id", "p_lo_s", "p_hi_s")
        .select(col("pred_id"), col("p_lo_s").cast("date").as("p_lo"),
          col("p_hi_s").cast("date").as("p_hi"))
      graft.operators.Bucketing.pruneSimulation(bands, preds)
        .orderBy("pred_id")
    }),

    // P162 — HDR log-bucket quantile sketch over order-value cents:
    // mergeable two-significant-digit buckets, exact R-7 riding along
    // as the error audit
    "sk8_hdr" -> ((s, dir) => {
      val cents = table(s, dir, "orders").select(
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      graft.operators.Sketches.hdrQuantiles(cents, "cents",
          Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }),

    // P163 — paired t over per-user (post − pre) value sums around the
    // Jan-16 cut: the within-subject companion to o23's Welch
    "o34_paired_t" -> ((s, dir) => {
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      val dec = col("value").cast("decimal(18,6)")
      val perUser = graft.Graft.events(s, dir)
        .groupBy(col("user_id"))
        .agg((coalesce(sum(when(col("ts") >= cut, dec)), lit(BigDecimal(0)))
          - coalesce(sum(when(col("ts") < cut, dec)), lit(BigDecimal(0))))
          .cast("double").as("d"))
      graft.operators.Features.pairedTTest(perUser, "d")
    }),

    // P161 — log-log price elasticity per part brand (composition of
    // P90's OLS over 9-rounded ln points): slope ≈ % qty per % price
    "o33_elasticity" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .join(table(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .where(col("l_quantity") > 0 && col("l_extendedprice") > 0)
        .select(col("p_brand"),
          // 6 decimals: olsFit's DECIMAL(18,6) cast then holds the
          // points EXACTLY (a 9-rounded value would re-round inside)
          round(log(col("l_extendedprice").cast("double") /
            col("l_quantity").cast("double")), 6).as("x"),
          round(log(col("l_quantity").cast("double")), 6).as("y"))
      graft.operators.Features.olsFit(li, "p_brand", "x", "y")
        .orderBy("p_brand")
    }),

    // P154 — WoE/IV of order priority against the finished-status label
    "o30_woe" -> ((s, dir) => {
      val d = table(s, dir, "orders").select(col("o_orderpriority"),
        (col("o_orderstatus") === "F").as("is_final"))
      graft.operators.Features.woeEncode(d, "o_orderpriority", "is_final")
        .orderBy("o_orderpriority")
    }),

    // P155 — Gini concentration of per-customer revenue: the one-number
    // key-skew summary to read beside o27's Hill alpha
    "o31_gini" -> ((s, dir) => {
      val rev = table(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("revenue"))
      graft.operators.Features.gini(rev, "revenue")
    }),

    // P156 — leakage-safe temporal split: Jan-20 cutoff, 1-day embargo
    "sa16_timesplit" -> ((s, dir) => {
      graft.operators.Sampling.temporalSplit(
          graft.Graft.events(s, dir).select("event_id", "ts"),
          "ts", "2024-01-20 00:00:00", embargoMicros = 86400000000L)
        .select("event_id", "split")
        .orderBy("event_id")
    }),

    // P157 — additive seasonal decomposition of the daily mean value
    // per event type: 7-day centered trend, weekday seasonal, residual
    "o32_decompose" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      graft.operators.TimeSeries.seasonalDecompose(daily,
          "event_type", "day", "v")
        .select("event_type", "day", "v", "dow", "trend", "seasonal",
          "resid")
        .orderBy("event_type", "day")
    }),

    // P150 — Mann-Kendall monotone-trend test on the daily mean value
    // per event type (30-point resampled series — the quadratic pair
    // stage is a per-key constant)
    "o29_trend" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
      graft.operators.TimeSeries.mannKendall(daily, "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P351 — max drawdown + longest underwater run per event-type
    // daily-mean series: decimal running peak, argmax day tie-broken on
    // day, gaps-and-islands for the run length
    "o111_drawdown" -> ((s, dir) => {
      graft.operators.TimeSeries.maxDrawdown(
          dailyMeans(s, dir), "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P352 — turning-point randomness test on the same series: strict
    // local extrema vs E = 2(n−2)/3, Var = (16n−29)/90 (measured z ∈
    // [−0.74, 1.49] on this corpus — an honest i.i.d. null, every
    // verdict 'random')
    "o112_turning" -> ((s, dir) => {
      graft.operators.TimeSeries.turningPoints(
          dailyMeans(s, dir), "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P356 — Pareto concentration per nation: the customers covering
    // 50% / 80% of nation revenue (exact integer-scaled decimal bar
    // crossing — no float thresholds)
    "q32_pareto" -> ((s, dir) => {
      val df = table(s, dir, "orders")
        .join(table(s, dir, "customer").hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_custkey"),
          col("o_totalprice"))
      graft.operators.Features.paretoCut(df, "nation", "o_custkey",
          "o_totalprice", Seq(("p50", 1, 2), ("p80", 4, 5)))
        .orderBy("nation", "bar")
    }),

    // P358 — Dickey–Fuller lag-1 unit-root test on the daily series:
    // the stationarity pre-check the o67/o82 reads assume (these
    // mean-reverting daily means test strongly stationary)
    "o114_adf" -> ((s, dir) => {
      graft.operators.TimeSeries.adfTest(
          dailyMeans(s, dir), "event_type", "day", "v")
        .orderBy("event_type")
    }),

    // P382 — the o64 reliability diagram folded to its decision
    // numbers: ECE / MCE over the same 10 buckets + the Brier score
    // over the raw scored rows (a pipeline thresholds on ONE number)
    "o121_calibration" -> ((s, dir) => {
      val frame = graft.operators.TimeSeries.churnLabels(
        graft.Graft.events(s, dir)
          .select("user_id", "event_type", "ts", "value"),
        Seq("user_id", "event_type"), "ts", "value", horizonDays = 2)
      val scored = frame.select(
        round(lit(1.0) / (col("n_events") + 1).cast("double"), 6)
          .as("score"), col("churned"))
      graft.operators.Features.calibrationSummary(scored, "score",
        "churned", bins = 10)
    }),

    // P380 — Chao1 richness from the %20-order lineitem sample: unseen
    // part-key cardinality estimated from the sample's abundance
    // spectrum, true full-corpus distinct riding as the audit column
    // (the d25 growth lesson as an ESTIMATOR)
    "sk19_chao1" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val est = graft.operators.Sketches.chao1Richness(
        li.where(col("l_orderkey") % 20 === 0)
          .select(col("l_partkey").as("item")), "item")
      val truth = li.agg(
        countDistinct(col("l_partkey")).as("true_distinct"))
      est.crossJoin(broadcast(truth))
    }),

    // P381 — direct standardization of the high-balance rate per
    // nation to the corpus segment mix: the crude−std gap per nation
    // is the composition effect
    "o120_std_rate" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") > 5000).as("rich"))
      graft.operators.Features.directStandardization(c, "c_nationkey",
          "c_mktsegment", "rich")
        .orderBy("c_nationkey")
    }),

    // P374 — Ansari–Bradley scale test between the click and view
    // daily-mean distributions: the dispersion companion to o15's
    // location read on the same rank machinery
    "o119_ansari" -> ((s, dir) => {
      val d = dailyMeans(s, dir)
        .where(col("event_type").isin("click", "view"))
      graft.operators.Features.ansariBradley(d, "event_type", "v",
        "click", "view")
    }),

    // P368 — Lo–MacKinlay variance ratio VR(5) on the same daily
    // series: the horizon-scaling read beside o114's unit-root t-ratio
    // (these mean-reverting daily means test VR well below 1)
    "o118_varratio" -> ((s, dir) => {
      graft.operators.TimeSeries.varianceRatio(
          dailyMeans(s, dir), "event_type", "day", "v", q = 5, band = 0.2)
        .orderBy("event_type")
    }),

    // P359 — spectral entropy over the o102 periodogram ladder
    // {3,5,7,10}: one number per series for "how concentrated is the
    // spectrum" (near 0 = one dominant cycle, near 1 = flat)
    "o115_spec_entropy" -> ((s, dir) => {
      val daily = dailyMeans(s, dir)
        .select(col("event_type"),
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("long").as("di"),
          col("v"))
      graft.operators.TimeSeries.spectralEntropy(daily, "event_type",
          "di", "v", Seq(3, 5, 7, 10))
        .orderBy("event_type")
    }),

    // P360 — exponentially decayed counts (0.9/day from the corpus max
    // day): the trending-now leaderboard beside the plain totals
    "sk18_decay" -> ((s, dir) => {
      graft.operators.Sketches.decayedCounts(
          graft.Graft.events(s, dir), "event_type", "ts",
          decay = 0.9, maxAgeDays = 64)
        .orderBy("event_type")
    }),

    // P353 — Grubbs single-outlier audit per event type at G > 6
    // (measured gmax 5.97–8.69 at the gate SF so both verdicts occur;
    // all-false at sf0.001 — the honest small-sample read)
    "o113_grubbs" -> ((s, dir) => {
      graft.operators.Features.grubbs(
          graft.Graft.events(s, dir), "event_type", "value", "event_id",
          threshold = 6.0)
        .orderBy("event_type")
    }),

    // P151 — Neyman allocation of a 1000-sample budget across order
    // priorities by N_h·sigma_h; largest-remainder makes it sum exactly
    "sa15_neyman" -> ((s, dir) => {
      graft.operators.Sampling.neymanAllocation(
          table(s, dir, "orders"), "o_orderpriority", "o_totalprice",
          budget = 1000L)
        .orderBy("o_orderpriority")
    }),

    // P349 — the payoff table behind sa15: stratified-mean variance of
    // the SAME budget under equal / Neyman / proportional allocation
    // ("use Neyman" as a measured percentage on this corpus)
    "sa22_alloc_var" -> ((s, dir) => {
      graft.operators.Sampling.allocationVarianceCompare(
          table(s, dir, "orders"), "o_orderpriority", "o_totalprice",
          budget = 1000L)
        .orderBy("scheme")
    }),

    // P152 — dbt-style not_null/unique battery over five order columns
    // in one fused pass
    "dq6_column_tests" -> ((s, dir) => {
      graft.operators.Profiling.columnTests(table(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"))
        .orderBy("column")
    }),

    // P148 — difference-in-differences over the event stream: odd users
    // "treated", the Jan-16 cut splits pre/post; one fused 8-cell agg
    "o28_did" -> ((s, dir) => {
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      val d = graft.Graft.events(s, dir).select(
        (col("user_id") % 2 === 1).as("treat"),
        (col("ts") >= cut).as("post"), col("value"))
      graft.operators.Features.didEstimate(d, "treat", "post", "value")
    }),

    // P149 — referential-integrity audit: two intact FK relations and a
    // deliberately broken one (customer thinned to every 3rd key)
    "dq5_referential" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      val lineitem = table(s, dir, "lineitem")
      val customer = table(s, dir, "customer")
      graft.operators.Profiling.fkAudit(Seq(
        ("lineitem.orderkey->orders", lineitem, "l_orderkey",
          orders, "o_orderkey"),
        ("orders.custkey->customer", orders, "o_custkey",
          customer, "c_custkey"),
        ("orders.custkey->customer_mod3", orders, "o_custkey",
          customer.where(col("c_custkey") % 3 === 0), "c_custkey")))
        .orderBy("relation")
    }),

    // P127 — Welch's t between returned and non-returned line prices
    // (the parametric companion to o15 on the same data): both groups'
    // decimal moments from ONE fused agg
    "o23_welch" -> ((s, dir) => {
      graft.operators.Features.welchTTest(
          table(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice", groupA = "R", groupB = "N")
    }),

    // P125 — CUPED variance reduction over the event stream: pre-period
    // (first 15 days) per-user value sum as covariate, post-period sum
    // as metric; theta from one decimal-exact moment row
    "o22_cuped" -> ((s, dir) => {
      val cut = expr("timestamp'2024-01-16 00:00:00'")
      val dec = col("value").cast("decimal(18,6)")
      val perUser = graft.Graft.events(s, dir)
        .groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("ts") < cut, dec)), lit(BigDecimal(0)))
          .cast("double").as("x"),
          coalesce(sum(when(col("ts") >= cut, dec)), lit(BigDecimal(0)))
            .cast("double").as("y"))
      graft.operators.Features.cupedAdjust(perUser, "x", "y")
        .orderBy("user_id")
    }),

    // P126 — declarative row expectations over orders in ONE fused agg;
    // the not-millennial rule fails deliberately so both outcomes occur
    "dq4_expectations" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      graft.operators.Profiling.expectRows(o, Seq(
        "orderkey_not_null" -> col("o_orderkey").isNotNull,
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "priority_format" -> col("o_orderpriority").rlike("^[1-5]-"),
        "totalprice_positive" -> (col("o_totalprice") > 0),
        "orderkey_not_millennial" -> (col("o_orderkey") % 1000 =!= 0)))
        .orderBy("rule")
    }),

    // P121 — lag-1 autocorrelation of each event type's value series:
    // one keyed lag window, decimal-exact moment sums, the o11 closing
    // double sequence
    "o21_autocorr" -> ((s, dir) => {
      graft.operators.TimeSeries.autocorrelation(
          graft.Graft.events(s, dir), "event_type", "ts", "event_id",
          "value", lag = 1)
        .orderBy("event_type")
    }),

    // P120 — 8-way range-partition plan for lineitem prices from a 25%
    // portable-hash sample, audited by bucketing the full table against
    // the broadcast cutoffs (ties land low)
    "z3_boundaries" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      graft.operators.Skew.rangeBoundaries(li, "l_extendedprice",
          concat_ws("_", col("l_orderkey"), col("l_linenumber")),
          numPartitions = 8, samplePct = 0.25)
        .orderBy("part")
    }),

    // P114 — KMV bottom-16 distinct-user sketch per event type beside
    // the exact count: portable MD5 hashes, exact k-th minimum, one
    // shared estimator literal on both sides
    "sk6_kmv" -> ((s, dir) => {
      graft.operators.Sketches.kmvDistinct(
          table(s, dir, "events"), "user_id", Seq("event_type"), k = 16)
        .orderBy("event_type")
    }),

    // P115 — key-skew diagnostics over three prospective shuffle keys
    // (dense user_id, 5-level event_type, near-unique value): share /
    // Gini / entropy per column from one frequency agg each
    "dq2_skew" -> ((s, dir) => {
      graft.operators.Profiling.keySkew(
          table(s, dir, "events"), Seq("user_id", "event_type", "value"),
          topK = 10)
        .orderBy("column")
    }),

    // P116 — snapshot CDC between two constructed order-table versions:
    // old = keys %3≠0; new = keys %5≠0 with +1.00 on %7 totals (exact
    // through DECIMAL) and a flipped %11 status — every class present
    "dq3_cdc" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val prev = o.where(col("o_orderkey") % 3 =!= 0)
        .select("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderpriority")
      val next = o.where(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0,
            (col("o_totalprice").cast("decimal(18,2)") +
              lit(BigDecimal("1.00"))).cast("double"))
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          col("o_orderpriority"))
      graft.operators.Profiling.cdcDiff(prev, next, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderkey")
    }),

    // P107 — Pearson correlation matrix over the four lineitem
    // measures: all moment sums in ONE decimal-exact aggregate, pair
    // rows projected from the single 1-row frame
    "o16_corr" -> ((s, dir) => {
      graft.operators.Features.corrMatrix(
          table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),

    // P108 — Spearman rank correlation between quantity and price:
    // doubled average ranks (exact BIGINTs), DECIMAL-summed products,
    // one closing double sequence
    "o17_spearman" -> ((s, dir) => {
      graft.operators.Features.spearman(
          table(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
    }),

    // P111 — 6-hour OHLC bars of event values per event type: open and
    // close via min_by/max_by over the (ts, event_id) struct, sum
    // through DECIMAL; one map-side-combinable agg
    "o18_ohlc" -> ((s, dir) => {
      graft.operators.TimeSeries.ohlcBars(
          graft.Graft.events(s, dir), "event_type", "ts", "event_id",
          "value", bucketMicros = 21600000000L)
        .select("event_type", "bucket", "bucket_start_us", "open", "high",
          "low", "close", "n", "vsum")
        .orderBy("event_type", "bucket")
    }),

    // P112 — CUSUM upward-shift detection per event type (reference 60
    // above the ~49.6 value mean, threshold 400): the closed-form
    // prefix-sum/running-min rewrite, exact DECIMAL end to end
    "o19_cusum" -> ((s, dir) => {
      graft.operators.TimeSeries.cusum(
          graft.Graft.events(s, dir), "event_type", "ts", "event_id",
          "value", reference = BigDecimal(60), threshold = BigDecimal(400))
        .select("event_type", "event_id", "value", "s", "alarm")
        .orderBy("event_id")
    }),

    // P113 — 6-hour forward-filled resampling of each user's value
    // series: per-(user, bucket) last value, sequence()-minted grid,
    // one keyed ignore-nulls fill window
    "o20_resample" -> ((s, dir) => {
      graft.operators.TimeSeries.resampleFfill(
          graft.Graft.events(s, dir), "user_id", "ts", "event_id", "value",
          bucketMicros = 21600000000L)
        .withColumnRenamed("key", "user_id")
        .select("user_id", "bucket", "bucket_us", "obs", "ffill", "is_gap")
        .orderBy("user_id", "bucket")
    }),

    // P93 — truncated adjusted EWMA over each user's event values,
    // α = 0.25, lookback 8: the weight ladder is embedded as literals on
    // BOTH sides (neither engine calls pow), the weighted sum is an
    // explicit left-to-right chain — see TimeSeries.ewma
    "o12_ewma" -> ((s, dir) => {
      graft.operators.TimeSeries.ewma(
          graft.Graft.events(s, dir), "user_id", "ts", "event_id", "value",
          alpha = 0.25, lookback = 8)
        .select("user_id", "event_id", "value", "ewma")
        .orderBy("event_id")
    }),

    // P44 — per-user rolling features over the event stream: lag delta,
    // trailing-5-row count/mean (decimal-summed), lifetime sequence
    // number; ONE window shuffle for the whole feature set. The oracle
    // states the identical frames; event_id tiebreak makes the order
    // total on both engines
    "o6_rolling" -> ((s, dir) => {
      graft.operators.TimeSeries.rollingFeatures(
          graft.Graft.events(s, dir), "user_id", "ts", "event_id", "value",
          lookback = 5)
        .select(col("user_id"), col("event_id"), col("seq"), col("prev_n"),
          round(col("delta"), 6).as("delta"), col("prev_mean"))
        .orderBy("user_id", "seq")
    }),

    // P47 — per-event-type z-score standardization: one window shuffle,
    // decimal-summed moments; the oracle replays the identical op
    // sequence (decimal sums → double mean/variance/sd), so both engines
    // compute the same doubles and the 6-decimal round is pure insurance
    "o7_zscore" -> ((s, dir) => {
      graft.operators.Features.zscore(
          graft.Graft.events(s, dir), "event_type", "value")
        .select(col("event_id"), col("event_type"), round(col("z"), 6).as("z"))
        .orderBy("event_id")
    }),

    // P48 — fixed-width value histogram per event type: 20 bins over
    // [0, 500), outliers clamped to the edge bins; one map-side-combinable
    // groupBy
    "o8_histogram" -> ((s, dir) => {
      graft.operators.Features.histogram(
          graft.Graft.events(s, dir), "event_type", "value",
          lo = 0.0, hi = 500.0, bins = 20)
        .orderBy("event_type", "bin")
    }),

    // CUBE: all grouping-set combinations with level ids
    "o4_cube" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping_id(col("l_returnflag"), col("l_linestatus")).as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    "o1_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "o2_setops" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_custkey % 17 = 0
        |ORDER BY o_custkey""".stripMargin,

    "o3_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sk1_salted_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // registers rebuilt from the portable-MD5 fold: low 6 bits route, the
    // 50-bit quotient's leading-zero rank via bin(); per-register terms are
    // CAST(pow(2,51−mj) AS BIGINT) summed exactly, absent registers add
    // 2^51 each from the present-count — then the same α·m²·2^51/S vs
    // m·ln(m/V) branch as the operator. e0 literals force DOUBLE (DuckDB
    // parses bare decimals as DECIMAL, which would break IEEE parity)
    // per-p register replay through the sk2 machinery (generator — the
    // α_m / 2^maxRank / linear-counting-bar constants are the DRIVER's
    // doubles, embedded as shortest-round-trip literals)
    "sk17_hll_err" -> {
      def one(p: Int): String = {
        val m = 1 << p
        val maxRank = 56 - p + 1
        val scale = math.pow(2.0, maxRank).toLong
        val aL = graft.operators.Features.sqlDoubleLiteral(
          graft.operators.Sketches.hllAlpha(m))
        val mm = m.toLong * m
        val lcBar = graft.operators.Features.sqlDoubleLiteral(2.5 * m)
        s"""SELECT $p AS p, CAST($m AS BIGINT) AS m, round(CASE
           |      WHEN v > 0 AND ($aL * ${mm}.0e0 * ${scale}.0e0 / s) <= $lcBar
           |      THEN ${m}.0e0 * ln(${m}.0e0 / v)
           |      ELSE $aL * ${mm}.0e0 * ${scale}.0e0 / s END, 3) AS hll_est
           |  FROM (
           |    SELECT CAST(s_present + ($m - n_regs) * CAST($scale AS BIGINT)
           |        AS BIGINT) AS s,
           |      $m - n_regs AS v
           |    FROM (
           |      SELECT sum(CAST(pow(2.0e0, $maxRank - mj) AS BIGINT))
           |          AS s_present,
           |        count(*) AS n_regs
           |      FROM (
           |        SELECT hv % $m AS register,
           |          max(CASE WHEN hv // $m = 0 THEN $maxRank
           |              ELSE $maxRank - length(bin(hv // $m)) END) AS mj
           |        FROM hv GROUP BY 1)))""".stripMargin
      }
      s"""WITH it AS (
         |  SELECT DISTINCT CAST(event_id AS VARCHAR) AS item
         |  FROM events WHERE event_id IS NOT NULL),
         |hv AS (
         |  SELECT list_reduce([CAST(instr('0123456789abcdef', ch) - 1
         |        AS BIGINT)
         |      FOR ch IN string_split(substr(md5('hll:' || item), 1, 14),
         |        '')],
         |    (acc, x) -> acc * 16 + x) AS hv
         |  FROM it),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM it),
         |lad AS (
         |${one(4)}
         |UNION ALL
         |${one(6)}
         |UNION ALL
         |${one(8)}
         |UNION ALL
         |${one(10)})
         |SELECT p, m, hll_est, n_exact,
         |  CASE WHEN n_exact > 0 THEN
         |    round((hll_est - CAST(n_exact AS DOUBLE)) /
         |      CAST(n_exact AS DOUBLE), 6) END AS rel_err
         |FROM lad, ex ORDER BY p""".stripMargin
    },

    "sk2_hll" ->
      """WITH hll AS (
        |  SELECT event_type, colname, round(CASE
        |      WHEN v > 0 AND (0.709e0 * 4096.0e0 * 2251799813685248.0e0 / s) <= 160.0e0
        |      THEN 64.0e0 * ln(64.0e0 / v)
        |      ELSE 0.709e0 * 4096.0e0 * 2251799813685248.0e0 / s END, 3) AS est
        |  FROM (
        |    SELECT event_type, colname,
        |      CAST(s_present + (64 - n_regs) * CAST(2251799813685248 AS BIGINT) AS BIGINT) AS s,
        |      64 - n_regs AS v
        |    FROM (
        |      SELECT event_type, colname,
        |        sum(CAST(pow(2.0e0, 51 - mj) AS BIGINT)) AS s_present,
        |        count(*) AS n_regs
        |      FROM (
        |        SELECT event_type, colname, hv % 64 AS register,
        |          max(CASE WHEN hv // 64 = 0 THEN 51
        |              ELSE 51 - length(bin(hv // 64)) END) AS mj
        |        FROM (
        |          SELECT event_type, colname,
        |            list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |                FOR ch IN string_split(substr(md5('hll:' || coalesce(item, '')), 1, 14), '')],
        |              (acc, x) -> acc * 16 + x) AS hv
        |          FROM (
        |            SELECT DISTINCT event_type, 'u' AS colname,
        |              CAST(user_id AS VARCHAR) AS item FROM events
        |            UNION ALL
        |            SELECT DISTINCT event_type, 'e' AS colname,
        |              CAST(event_id AS VARCHAR) AS item FROM events))
        |        GROUP BY 1, 2, 3)
        |      GROUP BY 1, 2))),
        |exact AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |    COUNT(DISTINCT event_id) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT x.event_type, u.est AS hll_users, x.n_users,
        |  e.est AS hll_events, x.n_events
        |FROM exact x
        |JOIN hll u ON u.event_type = x.event_type AND u.colname = 'u'
        |JOIN hll e ON e.event_type = x.event_type AND e.colname = 'e'
        |ORDER BY x.event_type""".stripMargin,

    "z1_morton" ->
      """SELECT o_orderkey,
        |  list_reduce([
        |    (((o_custkey % 1024) >> j) & 1) * (1::BIGINT << (2*j)) +
        |    (((o_orderkey % 1024) >> j) & 1) * (1::BIGINT << (2*j + 1))
        |    FOR j IN range(0, 10)], (a, b) -> a + b) AS zval
        |FROM orders ORDER BY zval, o_orderkey""".stripMargin,

    // the xy2d walk as a fold: state packs (x, y, d) into one BIGINT
    // (x + y·2^20 + d·2^40 — x,y stay < 2^20, d < 2^20 at bits=10, so
    // everything is far inside int64); each step reads rx/ry from the
    // packed fields, rotates, and accumulates the quadrant rank
    "z2_hilbert" -> {
      val X = "(acc % 1048576)"
      val Y = "((acc // 1048576) % 1048576)"
      val D = "(acc // 1099511627776)"
      val RX = s"(($X) // s)" // 0/1: the quadrant-local walk keeps x,y < 2s
      val RY = s"(($Y) // s)"
      val XL = s"($X - $RX * s)"
      val YL = s"($Y - $RY * s)"
      val rot = s"CASE WHEN $RX = 0 AND $RY = 0 THEN 0 " +
        s"WHEN $RX = 0 THEN 1 WHEN $RY = 0 THEN 3 ELSE 2 END"
      val newD = s"($D + s * s * ($rot))"
      val newX = s"(CASE WHEN $RY = 1 THEN $XL WHEN $RX = 0 THEN $YL " +
        s"ELSE s - 1 - $YL END)"
      val newY = s"(CASE WHEN $RY = 1 THEN $YL WHEN $RX = 0 THEN $XL " +
        s"ELSE s - 1 - $XL END)"
      val svals = (0 until 10).map(i => 1L << (9 - i)).mkString(", ")
      s"""SELECT o_orderkey,
         |  list_reduce(list_concat(
         |      [CAST((o_custkey % 1024) + (o_orderkey % 1024) * 1048576 AS BIGINT)],
         |      [$svals]),
         |    (acc, s) -> $newX + $newY * 1048576 + $newD * 1099511627776)
         |    // 1099511627776 AS hval
         |FROM orders ORDER BY hval, o_orderkey""".stripMargin
    },

    "o5_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // median rounded at 6 BEFORE deviations (the operator's cascade
    // firewall); MAD = 0 pins z = 0; flags compare the ROUNDED z
    "o10_mad" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5e0), 6) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |         abs(e.value - m.med) AS d
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, round(quantile_cont(d, 0.5e0), 6) AS mad
        |  FROM dev GROUP BY 1),
        |z AS (
        |  SELECT dev.event_id, dev.event_type, dev.value, dev.med, mad.mad,
        |    CASE WHEN mad.mad > 0
        |         THEN round(0.6745e0 * (dev.value - dev.med) / mad.mad, 6)
        |         ELSE 0.0e0 END AS mz
        |  FROM dev JOIN mad USING (event_type))
        |SELECT event_id, event_type, value, med, mad, mz,
        |       abs(mz) > 1.2e0 AS outlier
        |FROM z ORDER BY event_id""".stripMargin,

    // quintile cutoffs via quantile_cont (R-7 = Spark percentile); scores
    // count strictly-exceeded cutoffs, ties land low on both engines
    "q10_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    MAX(CAST(o_orderdate AS DATE)) AS recency_date,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |c2 AS (SELECT *,
        |         CAST(recency_date - DATE '1970-01-01' AS BIGINT) AS recency_days
        |       FROM cust),
        |q AS (SELECT
        |    quantile_cont(recency_days, [0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS qr,
        |    quantile_cont(frequency,    [0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS qf,
        |    quantile_cont(monetary,     [0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS qm
        |  FROM c2),
        |s AS (SELECT c2.*,
        |    CAST(1 + (CASE WHEN recency_days > qr[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN recency_days > qr[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN recency_days > qr[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN recency_days > qr[4] THEN 1 ELSE 0 END) AS INT)
        |      AS recency_days_score,
        |    CAST(1 + (CASE WHEN frequency > qf[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN frequency > qf[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN frequency > qf[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN frequency > qf[4] THEN 1 ELSE 0 END) AS INT)
        |      AS frequency_score,
        |    CAST(1 + (CASE WHEN monetary > qm[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN monetary > qm[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN monetary > qm[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN monetary > qm[4] THEN 1 ELSE 0 END) AS INT)
        |      AS monetary_score
        |  FROM c2, q)
        |SELECT o_custkey, recency_date, frequency, monetary, recency_days,
        |  recency_days_score, frequency_score, monetary_score,
        |  CAST(recency_days_score * 100 + frequency_score * 10 +
        |       monetary_score AS INT) AS rfm
        |FROM s ORDER BY o_custkey""".stripMargin,

    // bands and flags computed on UNROUNDED quantiles (raw CTE), exactly
    // like the operator; only the output columns round at 4
    "o9_winsorize" ->
      """WITH bands AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05e0) AS blo,
        |    quantile_cont(l_extendedprice, 0.95e0) AS bhi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  l.l_extendedprice,
        |  round(b.blo, 4) AS lo, round(b.bhi, 4) AS hi,
        |  round(least(greatest(l.l_extendedprice, b.blo), b.bhi), 4)
        |    AS winsorized,
        |  (l.l_extendedprice < b.blo OR l.l_extendedprice > b.bhi) AS clipped
        |FROM lineitem l JOIN bands b USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // profile branches generated per (column, side) from one helper so
    // the six branches cannot drift; numeric stats mirror the operator's
    // round/decimal ops, string columns carry null numeric stats
    "dq1_drift" -> {
      def branch(c: String, isNum: Boolean, side: Int): String = {
        val numStats = if (isNum)
          s"""round(CAST(MIN($c) AS DOUBLE), 6) AS min_v,
             |    round(CAST(MAX($c) AS DOUBLE), 6) AS max_v,
             |    round(CAST(SUM(CAST($c AS DECIMAL(38,12))) AS DOUBLE) /
             |          CAST(COUNT($c) AS DOUBLE), 6) AS mean_v""".stripMargin
        else
          "CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, " +
            "CAST(NULL AS DOUBLE) AS mean_v"
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_null,
           |    CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |    $numStats
           |  FROM events WHERE event_id % 2 = $side""".stripMargin
      }
      def side(s: Int): String = Seq(
        branch("user_id", isNum = true, s),
        branch("event_type", isNum = false, s),
        branch("value", isNum = true, s)).mkString("\n  UNION ALL\n  ")
      s"""WITH pa AS (
         |  ${side(0)}),
         |pb AS (
         |  ${side(1)})
         |SELECT pa."column",
         |  pa.n_rows AS n_rows_a, pa.n_null AS n_null_a,
         |  pa.n_distinct AS n_distinct_a, pa."min_v" AS min_v_a,
         |  pa."max_v" AS max_v_a, pa."mean_v" AS mean_v_a,
         |  pb.n_rows AS n_rows_b, pb.n_null AS n_null_b,
         |  pb.n_distinct AS n_distinct_b, pb."min_v" AS min_v_b,
         |  pb."max_v" AS max_v_b, pb."mean_v" AS mean_v_b,
         |  round(abs(CAST(pa.n_null AS DOUBLE) / CAST(pa.n_rows AS DOUBLE) -
         |            CAST(pb.n_null AS DOUBLE) / CAST(pb.n_rows AS DOUBLE)), 6)
         |    AS d_null_rate,
         |  CASE WHEN pa.n_distinct > 0
         |       THEN round(CAST(pb.n_distinct AS DOUBLE) /
         |                  CAST(pa.n_distinct AS DOUBLE), 6) END AS r_distinct,
         |  round(abs(pa."mean_v" - pb."mean_v"), 6) AS d_mean
         |FROM pa JOIN pb ON pb."column" = pa."column"
         |ORDER BY pa."column"""".stripMargin
    },

    // doubled average ranks keep the rank sum in exact BIGINTs; the
    // closing z mirrors the operator's parenthesization op for op
    "o15_mannwhitney" ->
      """WITH pool AS (
        |  SELECT CAST(l_returnflag AS VARCHAR) AS g, l_extendedprice AS v
        |  FROM lineitem
        |  WHERE l_returnflag IN ('R', 'N') AND l_extendedprice IS NOT NULL),
        |ranked AS (
        |  SELECT g, v,
        |    CAST(rank() OVER (ORDER BY v) AS BIGINT) AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) AS t
        |  FROM pool),
        |ties AS (
        |  SELECT CAST(coalesce(SUM(tt * tt * tt - tt), 0) AS BIGINT) AS tie3
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM pool GROUP BY v)),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN g = 'R' THEN 2 * minr + t - 1 ELSE 0 END)
        |         AS DOUBLE) / 2.0e0 AS r_a
        |  FROM ranked),
        |f AS (
        |  SELECT n_a, n_b, r_a, tie3,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(n_a + n_b AS DOUBLE) AS nn
        |  FROM a CROSS JOIN ties),
        |g AS (
        |  SELECT n_a, n_b, r_a, na, nb, nn, tie3,
        |    r_a - (na * (na + 1.0e0) / 2.0e0) AS u_a
        |  FROM f)
        |SELECT n_a, n_b, r_a, u_a, na * nb - u_a AS u_b,
        |  CASE WHEN sqrt((na * nb / 12.0e0) * ((nn + 1.0e0) -
        |         CAST(tie3 AS DOUBLE) / (nn * (nn - 1.0e0)))) > 0
        |       THEN round((u_a - na * nb / 2.0e0) /
        |         sqrt((na * nb / 12.0e0) * ((nn + 1.0e0) -
        |           CAST(tie3 AS DOUBLE) / (nn * (nn - 1.0e0)))), 6)
        |  END AS z
        |FROM g""".stripMargin,

    // digit chain and Benford masses generated from the operator's own
    // count-then-rank replay; the tie-break (n DESC, v ASC) is the
    // operator's contract, spelled identically
    "o110_mode" ->
      """WITH counts AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, v, n,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY n DESC, v ASC) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS nd
        |  FROM counts)
        |SELECT l_returnflag, v AS mode, n AS mode_n, nd AS n_distinct
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // constants (Features.benfordPLiterals) so the sides cannot drift;
    // densified grid, l1 = DECIMAL sum of 9-rounded deviations
    // the o14 recipe with the second-digit extraction ((v // 10^(p-1))
    // % 10 under the same magnitude CASE) and the BenfordP2 literals
    "o109_benford2" -> {
      val ps = graft.operators.Features.benfordP2Literals
      val pCase = (0 to 9)
        .map(d => s"WHEN digit = $d THEN ${ps(d)}").mkString(" ")
      val sdCase = (18 to 1 by -1).map { p =>
        val pow = (1 to p).foldLeft(1L)((a, _) => a * 10)
        s"WHEN cents >= $pow THEN (cents // ${pow / 10}) % 10"
      }.mkString("\n         ")
      s"""WITH vals AS (
         |  SELECT o_orderpriority,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM orders),
         |f AS (
         |  SELECT o_orderpriority,
         |    CASE $sdCase END AS digit
         |  FROM vals WHERE cents >= 10),
         |counts AS (
         |  SELECT o_orderpriority, digit, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM f GROUP BY 1, 2),
         |grid AS (
         |  SELECT o_orderpriority, unnest(range(0, 10)) AS digit
         |  FROM (SELECT DISTINCT o_orderpriority FROM counts)),
         |g AS (
         |  SELECT grid.o_orderpriority, grid.digit,
         |    CAST(coalesce(counts.n, 0) AS BIGINT) AS n
         |  FROM grid LEFT JOIN counts
         |    ON counts.o_orderpriority = grid.o_orderpriority
         |   AND counts.digit = grid.digit),
         |t AS (
         |  SELECT *,
         |    CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |      AS total,
         |    CASE $pCase END AS benford_p
         |  FROM g),
         |x AS (
         |  SELECT *,
         |    abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - benford_p)
         |      AS devr
         |  FROM t)
         |SELECT o_orderpriority, digit, n, total,
         |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
         |  benford_p,
         |  round(devr, 6) AS dev,
         |  round(CAST(SUM(CAST(round(devr, 9) AS DECIMAL(28,9)))
         |      OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6) AS l1
         |FROM x ORDER BY o_orderpriority, digit""".stripMargin
    },

    // the q17 CTEs crossed with the q15 SRM closing — one verdict row
    "pipe15_ab_readout" ->
      """WITH m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_ctrl,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x_ctrl
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |c AS (
        |  SELECT *,
        |    CAST(x_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) AS p1,
        |    CAST(x_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) AS p0,
        |    CAST(x_treat + x_ctrl AS DOUBLE)
        |      / CAST(n_treat + n_ctrl AS DOUBLE) AS pp
        |  FROM m),
        |zc AS (
        |  SELECT n_treat, n_ctrl, x_treat, x_ctrl,
        |    CASE WHEN n_treat > 0 THEN round(p1, 6) END AS p_treat,
        |    CASE WHEN n_ctrl > 0 THEN round(p0, 6) END AS p_ctrl,
        |    CASE WHEN n_treat > 0 AND n_ctrl > 0 AND pp > 0 AND pp < 1
        |         THEN round((p1 - p0) / sqrt(pp * (1.0e0 - pp) *
        |           (1.0e0 / CAST(n_treat AS DOUBLE)
        |            + 1.0e0 / CAST(n_ctrl AS DOUBLE))), 6)
        |    END AS z
        |  FROM c),
        |m2 AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS s_ctrl
        |  FROM events WHERE user_id IS NOT NULL),
        |c2 AS (
        |  SELECT CASE WHEN s_treat + s_ctrl > 0 THEN round(
        |      (CAST(s_treat AS DOUBLE)
        |        - CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0)
        |      * (CAST(s_treat AS DOUBLE)
        |         - CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0)
        |      / (CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0)
        |      + (CAST(s_ctrl AS DOUBLE)
        |         - CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0)
        |        * (CAST(s_ctrl AS DOUBLE)
        |           - CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0)
        |        / (CAST(s_treat + s_ctrl AS DOUBLE) * 0.5e0), 6)
        |    END AS srm_chi2
        |  FROM m2)
        |SELECT zc.n_treat, zc.n_ctrl, zc.x_treat, zc.x_ctrl, zc.p_treat,
        |  zc.p_ctrl, zc.z,
        |  CASE WHEN zc.z IS NULL THEN NULL ELSE abs(zc.z) > 1.96e0 END
        |    AS significant,
        |  c2.srm_chi2,
        |  CASE WHEN c2.srm_chi2 IS NULL THEN NULL
        |       ELSE c2.srm_chi2 > 3.841459e0 END AS srm
        |FROM zc CROSS JOIN c2""".stripMargin,

    "o14_benford" -> {
      val ps = graft.operators.Features.benfordPLiterals
      val pCase = (1 to 9)
        .map(d => s"WHEN digit = $d THEN ${ps(d - 1)}").mkString(" ")
      val fdCase = (18 to 1 by -1).map { p =>
        val pow = (1 to p).foldLeft(1L)((a, _) => a * 10)
        s"WHEN cents >= $pow THEN cents // $pow"
      }.mkString("\n         ")
      s"""WITH vals AS (
         |  SELECT o_orderpriority,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |f AS (
         |  SELECT o_orderpriority,
         |    CASE $fdCase ELSE cents END AS digit
         |  FROM vals WHERE cents > 0),
         |counts AS (
         |  SELECT o_orderpriority, digit, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM f GROUP BY 1, 2),
         |grid AS (
         |  SELECT o_orderpriority, unnest(range(1, 10)) AS digit
         |  FROM (SELECT DISTINCT o_orderpriority FROM counts)),
         |g AS (
         |  SELECT grid.o_orderpriority, grid.digit,
         |    CAST(coalesce(counts.n, 0) AS BIGINT) AS n
         |  FROM grid LEFT JOIN counts
         |    ON counts.o_orderpriority = grid.o_orderpriority
         |   AND counts.digit = grid.digit),
         |t AS (
         |  SELECT *,
         |    CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total,
         |    CASE $pCase END AS benford_p
         |  FROM g),
         |x AS (
         |  SELECT *,
         |    abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - benford_p) AS devr
         |  FROM t)
         |SELECT o_orderpriority, digit, n, total,
         |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
         |  benford_p,
         |  round(devr, 6) AS dev,
         |  round(CAST(SUM(CAST(round(devr, 9) AS DECIMAL(28,9)))
         |      OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6) AS l1
         |FROM x ORDER BY o_orderpriority, digit""".stripMargin
    },

    // margins/N exact BIGINT windows over the cell frame; e and the
    // contributions are the operator's double sequences; chi2 =
    // DECIMAL-sum of 9-rounded contributions
    "o13_chisq" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS band,
        |         CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, band, o,
        |    CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
        |    CAST(SUM(o) OVER (PARTITION BY band) AS BIGINT) AS col_n,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells),
        |x AS (
        |  SELECT *, CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) /
        |            CAST(n AS DOUBLE) AS e_raw
        |  FROM m),
        |c AS (
        |  SELECT *, round((CAST(o AS DOUBLE) - e_raw) *
        |                  (CAST(o AS DOUBLE) - e_raw) / e_raw, 9) AS contrib9
        |  FROM x),
        |lv AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ra,
        |              CAST(COUNT(DISTINCT band) AS BIGINT) AS cb FROM cells)
        |SELECT event_type, band, o, row_n, col_n, n,
        |  round(e_raw, 6) AS expected,
        |  round(CAST(SUM(CAST(contrib9 AS DECIMAL(28,9))) OVER () AS DOUBLE), 6)
        |    AS chi2,
        |  CAST((lv.ra - 1) * (lv.cb - 1) AS BIGINT) AS dof,
        |  round(contrib9, 6) AS contrib
        |FROM c CROSS JOIN lv
        |ORDER BY event_type, band""".stripMargin,

    // the identical lag ladder, weight literals and left-to-right
    // term chain as TimeSeries.ewma (weights generated from the same
    // helper, so the two sides cannot drift)
    "o12_ewma" -> {
      val ws = graft.operators.TimeSeries.ewmaWeightLiterals(0.25, 8)
      val lags = (1 until 8)
        .map(l => s"lag(value, $l) OVER w AS x$l").mkString(",\n    ")
      def term(l: Int) = {
        val x = if (l == 0) "value" else s"x$l"
        s"CASE WHEN $x IS NOT NULL THEN ${ws(l)} * $x ELSE 0.0e0 END"
      }
      def wterm(l: Int) = {
        val x = if (l == 0) "value" else s"x$l"
        s"CASE WHEN $x IS NOT NULL THEN ${ws(l)} ELSE 0.0e0 END"
      }
      val num = (0 until 8).map(term).mkString("\n      + ")
      val den = (0 until 8).map(wterm).mkString("\n      + ")
      s"""WITH f AS (
         |  SELECT user_id, event_id, value,
         |    $lags
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |g AS (
         |  SELECT user_id, event_id, value,
         |    $num AS num,
         |    $den AS den
         |  FROM f)
         |SELECT user_id, event_id, value,
         |  CASE WHEN den > 0 THEN round(num / den, 6) END AS ewma
         |FROM g ORDER BY event_id""".stripMargin
    },

    // five exact decimal moment sums → the identical closed-form double
    // sequence (same parenthesization as Features.olsFit); slope guard
    // den > 0, r2 additionally deny > 0. Product casts are DECIMAL(19,6):
    // DuckDB multiplies two width-18 decimals in int64 and overflows —
    // width 19 forces int128 (product type (38,12)); the rationals are
    // exact either way, so Spark's (18,6)-based products match
    "o11_ols" ->
      """WITH s AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) *
        |             CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) *
        |             CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) *
        |             CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |f AS (
        |  SELECT l_suppkey, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM s)
        |SELECT l_suppkey, n,
        |  CASE WHEN den > 0 THEN round(num / den, 6) END AS slope,
        |  CASE WHEN den > 0
        |       THEN round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |  END AS intercept,
        |  CASE WHEN den > 0 AND deny > 0
        |       THEN round(num * num / (den * deny), 6) END AS r2
        |FROM f ORDER BY l_suppkey""".stripMargin,

    // the shared daily CTE day-paired per series pair, then the o11
    // moment machinery; the orthogonal slope one fixed double sequence
    "o82_deming" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pairs AS (
        |  SELECT 'click~view' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'signup~purchase' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'signup' AND b.event_type = 'purchase'),
        |s AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM pairs
        |  WHERE x IS NOT NULL AND y IS NOT NULL
        |  GROUP BY 1),
        |f AS (
        |  SELECT pair, n, sx, sy,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS uxx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS uyy,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS uxy
        |  FROM s)
        |SELECT pair, n,
        |  CASE WHEN uxy <> 0 AND uxx > 0 THEN
        |    round((uyy - uxx + sqrt((uyy - uxx) * (uyy - uxx) +
        |      4.0e0 * uxy * uxy)) / (2.0e0 * uxy), 6) END AS slope,
        |  CASE WHEN uxy <> 0 AND uxx > 0 THEN
        |    round((sy - ((uyy - uxx + sqrt((uyy - uxx) * (uyy - uxx) +
        |      4.0e0 * uxy * uxy)) / (2.0e0 * uxy)) * sx) /
        |      CAST(n AS DOUBLE), 6) END AS intercept,
        |  CASE WHEN uxy <> 0 AND uxx > 0 THEN
        |    round(uxy / uxx, 6) END AS ols_slope
        |FROM f ORDER BY pair""".stripMargin,

    // three day-paired series, the o11 r² replay, VIF on the ROUNDED r²
    "o85_vif" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pairs AS (
        |  SELECT 'click~view' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'click~purchase' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'view~purchase' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'view' AND b.event_type = 'purchase'),
        |s AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1),
        |f AS (
        |  SELECT pair, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny
        |  FROM s),
        |r AS (
        |  SELECT pair, n,
        |    CASE WHEN den > 0 AND deny > 0 THEN
        |      round(num * num / (den * deny), 6) END AS r2
        |  FROM f)
        |SELECT pair, n, r2,
        |  CASE WHEN r2 IS NOT NULL AND r2 < 1.0e0 THEN
        |    round(1.0e0 / (1.0e0 - r2), 6) END AS vif
        |FROM r ORDER BY pair""".stripMargin,

    // count(value) (not count(*)) so null-skipping matches Spark's frame
    // count; the decimal sum replays the operator's money-sum discipline
    "o6_rolling" ->
      """WITH f AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER w AS seq,
        |    value - lag(value) OVER w AS d,
        |    count(value) OVER wf AS prev_n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wf AS DOUBLE) AS s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, seq, prev_n,
        |  round(d, 6) AS delta,
        |  CASE WHEN prev_n > 0 THEN round(s / prev_n, 6) END AS prev_mean
        |FROM f ORDER BY user_id, seq""".stripMargin,

    // identical op sequence as Features.zscore: exact decimal window sums
    // → double mean → variance (clamped at 0) → sd → z
    "o7_zscore" ->
      """WITH f AS (
        |  SELECT event_id, event_type, value,
        |    CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER g AS DOUBLE) AS msum,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,12))) OVER g AS DOUBLE) AS qsum,
        |    CAST(COUNT(value) OVER g AS DOUBLE) AS n
        |  FROM events
        |  WINDOW g AS (PARTITION BY event_type))
        |SELECT event_id, event_type,
        |  round(CASE
        |    WHEN sqrt(greatest(qsum / n - (msum / n) * (msum / n), 0)) > 0
        |    THEN (value - msum / n) /
        |         sqrt(greatest(qsum / n - (msum / n) * (msum / n), 0))
        |    ELSE 0 END, 6) AS z
        |FROM f ORDER BY event_id""".stripMargin,

    "o8_histogram" ->
      """SELECT event_type,
        |  LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 25.0) AS BIGINT), 0), 19) AS bin,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the identical cumulative window and (cum − size) // target bin
    // assignment; all integers
    "z4_compaction" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars, CAST((cum - n_chars) // 5000 AS BIGINT) AS bin
        |  FROM f)
        |SELECT doc_id, n_chars, bin,
        |  CAST(SUM(n_chars) OVER (PARTITION BY bin) AS BIGINT) AS bin_bytes,
        |  CAST(COUNT(*) OVER (PARTITION BY bin) AS BIGINT) AS bin_files
        |FROM b ORDER BY doc_id""".stripMargin,

    // exact-decimal conditional sums and |delta| ordering; report
    // columns round at 2 only after the cut
    "o24_movers" ->
      """WITH p AS (
        |  SELECT o_custkey,
        |    coalesce(SUM(CASE WHEN year(o_orderdate) = 1995
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS a,
        |    coalesce(SUM(CASE WHEN year(o_orderdate) = 1996
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS b
        |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        |  GROUP BY 1),
        |d AS (
        |  SELECT o_custkey, a, b, b - a AS dd FROM p
        |  ORDER BY abs(b - a) DESC, o_custkey LIMIT 25)
        |SELECT o_custkey,
        |  round(CAST(a AS DOUBLE), 2) AS val_a,
        |  round(CAST(b AS DOUBLE), 2) AS val_b,
        |  round(CAST(dd AS DOUBLE), 2) AS delta,
        |  CAST(row_number() OVER (ORDER BY abs(dd) DESC, o_custkey) AS INT)
        |    AS rank
        |FROM d ORDER BY rank""".stripMargin,

    // decimal sums both sides, the identical
    // (s + m·(gs/gn)) / (n + m) double sequence, round at 6 (NOT 9 —
    // 9 fractional digits on a 6-integer-digit double is the last-ulp
    // zone where engines' roundings legitimately differ; P134 lesson)
    "o25_target_enc" ->
      """WITH g AS (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |      AS gs,
        |    CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL),
        |p AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
        |  GROUP BY 1)
        |SELECT o_custkey, n,
        |  round((s + 20.0e0 * (gs / CAST(gn AS DOUBLE)))
        |    / (CAST(n AS DOUBLE) + 20.0e0), 6) AS encoded
        |FROM p, g ORDER BY o_custkey""".stripMargin,

    // one z5-style per-file/overlap replay per layout (generator below),
    // folded to the same one-line readouts and unioned
    "z11_layout_compare" -> {
      def one(name: String, orderBy: String): String =
        s"""SELECT '$name' AS layout, n_files, files_disjoint,
           |  round(CAST(ov AS DOUBLE) /
           |    CAST(greatest(n_files, 1) AS DOUBLE), 6) AS avg_overlaps,
           |  round(CAST(files_disjoint AS DOUBLE) /
           |    CAST(greatest(n_files, 1) AS DOUBLE), 6) AS share_disjoint
           |FROM (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(coalesce(SUM(CASE WHEN ov_n = 0 THEN 1 END), 0)
           |      AS BIGINT) AS files_disjoint,
           |    CAST(SUM(ov_n) AS BIGINT) AS ov
           |  FROM (
           |    -- ov_n, not "overlaps": OVERLAPS is a reserved operator
           |    -- keyword in DuckDB and a bare column reference breaks
           |    -- the parse (z5 only ever ALIASES it, never reads it)
           |    SELECT f.file_id,
           |      CAST(coalesce(SUM(CASE WHEN o.file_id IS NOT NULL
           |        THEN 1 END), 0) AS BIGINT) AS ov_n
           |    FROM (
           |      SELECT CAST((rn - 1) // 2000 AS BIGINT) AS file_id,
           |        min(sd) AS lo, max(sd) AS hi
           |      FROM (SELECT sd,
           |              row_number() OVER (ORDER BY $orderBy) AS rn
           |            FROM d) GROUP BY 1) f
           |    LEFT JOIN (
           |      SELECT CAST((rn - 1) // 2000 AS BIGINT) AS file_id,
           |        min(sd) AS lo, max(sd) AS hi
           |      FROM (SELECT sd,
           |              row_number() OVER (ORDER BY $orderBy) AS rn
           |            FROM d) GROUP BY 1) o
           |      ON f.file_id <> o.file_id
           |        AND f.lo <= o.hi AND o.lo <= f.hi
           |    GROUP BY 1))""".stripMargin
      s"""WITH d AS (
         |  SELECT CAST(l_shipdate AS DATE) AS sd, l_orderkey,
         |    l_linenumber, l_suppkey
         |  FROM lineitem WHERE l_shipdate IS NOT NULL)
         |${one("by_orderkey", "l_orderkey, l_linenumber")}
         |UNION ALL
         |${one("by_shipdate", "sd, l_orderkey, l_linenumber")}
         |UNION ALL
         |${one("by_suppkey", "l_suppkey, l_orderkey, l_linenumber")}
         |ORDER BY layout""".stripMargin
    },

    // the identical layout window, integer file cut, and band-intersection
    // self-join; bands are exact DATE data values
    "z5_zonemap" ->
      """WITH d AS (
        |  SELECT CAST(l_shipdate AS DATE) AS sd, l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_shipdate IS NOT NULL),
        |r AS (
        |  SELECT sd,
        |    row_number() OVER (ORDER BY sd, l_orderkey, l_linenumber) AS rn
        |  FROM d),
        |f AS (
        |  SELECT CAST((rn - 1) // 2000 AS BIGINT) AS file_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    min(sd) AS lo, max(sd) AS hi
        |  FROM r GROUP BY 1)
        |SELECT f.file_id, f.n_rows, f.lo, f.hi,
        |  CAST(coalesce(SUM(CASE WHEN o.file_id IS NOT NULL THEN 1 END), 0)
        |    AS BIGINT) AS overlaps
        |FROM f LEFT JOIN f o
        |  ON f.file_id <> o.file_id AND f.lo <= o.hi AND o.lo <= f.hi
        |GROUP BY 1, 2, 3, 4 ORDER BY f.file_id""".stripMargin,

    // per-item counts, the portable-MD5 sign replay (the sa13 fold), all
    // arithmetic exact BIGINT until the final audited ratio
    "sk7_ams" ->
      """WITH counts AS (
        |  SELECT user_id AS item, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM counts),
        |e AS (SELECT unnest(range(0, 16)) AS estimator),
        |h AS (
        |  SELECT e.estimator, c.c,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('ams' ||
        |          CAST(e.estimator AS VARCHAR) || ':' ||
        |          CAST(c.item AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM e, counts c),
        |s AS (
        |  SELECT estimator,
        |    CAST(SUM((1 - 2 * (hv % 2)) * c) AS BIGINT) AS counter
        |  FROM h GROUP BY 1)
        |SELECT CAST(estimator AS INT) AS estimator, counter,
        |  counter * counter AS est, f2_exact,
        |  round(CAST(counter * counter AS DOUBLE) /
        |    CAST(f2_exact AS DOUBLE), 6) AS ratio
        |FROM s, ex ORDER BY estimator""".stripMargin,

    // the identical epoch-day weekday and (s/n)/(gs/gn) double sequence;
    // decimal sums both sides, round at 6
    "o26_seasonality" ->
      """WITH d AS (
        |  SELECT datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7
        |      AS dow,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |g AS (
        |  SELECT CAST(SUM(v) AS DOUBLE) AS gs, CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM d),
        |p AS (
        |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS DOUBLE) AS s
        |  FROM d GROUP BY 1)
        |SELECT CAST(dow AS INT) AS dow, n,
        |  round(s / CAST(n AS DOUBLE), 6) AS mean_v,
        |  round((s / CAST(n AS DOUBLE)) / (gs / CAST(gn AS DOUBLE)), 6)
        |    AS seas_idx
        |FROM p, g ORDER BY dow""".stripMargin,

    // identical top-k multiset (ties at the cut share a value), 9-rounded
    // decimal-summed ln ratios, one closing double division
    "o27_hill" ->
      """WITH top AS (
        |  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        |  ORDER BY v DESC LIMIT 500),
        |r AS (SELECT min(v) AS xk, CAST(COUNT(*) AS BIGINT) AS k FROM top),
        |t AS (
        |  SELECT k, xk, CAST(round(ln(v / xk), 9) AS DECIMAL(28,9)) AS t
        |  FROM top, r),
        |s AS (SELECT k, xk, CAST(SUM(t) AS DOUBLE) AS h FROM t GROUP BY 1, 2)
        |SELECT k, xk,
        |  CASE WHEN h > 0 THEN round(CAST(k AS DOUBLE) / h, 6) END AS alpha
        |FROM s""".stripMargin,

    // VALUES fold frame × events; interval arithmetic on exact micros
    "sa19_rolling_cv" ->
      """WITH f(fold, cutoff) AS (VALUES
        |  (1, TIMESTAMP '2024-01-10 00:00:00'),
        |  (2, TIMESTAMP '2024-01-15 00:00:00'),
        |  (3, TIMESTAMP '2024-01-20 00:00:00')),
        |l AS (
        |  SELECT f.fold, f.cutoff,
        |    CASE WHEN e.ts < f.cutoff THEN 'train'
        |         WHEN e.ts < f.cutoff + INTERVAL 5 DAY THEN 'test' END
        |      AS split
        |  FROM events e, f WHERE e.ts IS NOT NULL)
        |SELECT CAST(fold AS INT) AS fold, cutoff, split,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM l WHERE split IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY fold, split""".stripMargin,

    // the identical (x, y, id)-ordered running-min dominance test —
    // exact data values only
    "o40_skyline" ->
      """WITH d AS (
        |  SELECT p_partkey, p_retailprice, p_size FROM part
        |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |m AS (
        |  SELECT *, min(p_size) OVER (
        |    ORDER BY p_retailprice, p_size, p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
        |  FROM d)
        |SELECT p_partkey, p_retailprice, p_size FROM m
        |WHERE pmin IS NULL OR p_size < pmin
        |ORDER BY p_retailprice, p_size, p_partkey""".stripMargin,

    // the o32 residual chain; both variances from decimal moments over
    // the pre-rounded columns; clamps mirror the operator
    "o41_seas_strength" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, v,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |      / 7.0e0, 6) AS tr
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT event_type, day, v,
        |    CASE WHEN wn = 7 THEN tr END AS trend,
        |    CAST(datediff('day', DATE '1970-01-05', day) % 7 AS INT) AS dow
        |  FROM t),
        |dt AS (SELECT *, CASE WHEN trend IS NOT NULL
        |         THEN round(v - trend, 6) END AS detr FROM t2),
        |se AS (
        |  SELECT event_type, dow,
        |    round(CAST(SUM(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS seasonal
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2),
        |res2 AS (
        |  SELECT d.event_type, round(d.v - d.trend, 6) AS detr,
        |    round(d.v - d.trend - se.seasonal, 6) AS resid
        |  FROM dt d JOIN se
        |    ON se.event_type = d.event_type AND se.dow = d.dow
        |  WHERE d.trend IS NOT NULL AND se.seasonal IS NOT NULL),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) AS sd,
        |    CAST(SUM(CAST(detr AS DECIMAL(19,6)) *
        |      CAST(detr AS DECIMAL(19,6))) AS DOUBLE) AS qd,
        |    CAST(SUM(CAST(resid AS DECIMAL(18,6))) AS DOUBLE) AS sr,
        |    CAST(SUM(CAST(resid AS DECIMAL(19,6)) *
        |      CAST(resid AS DECIMAL(19,6))) AS DOUBLE) AS qr
        |  FROM res2 GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN greatest(qd / CAST(n AS DOUBLE)
        |      - (sd / CAST(n AS DOUBLE)) * (sd / CAST(n AS DOUBLE)),
        |      0.0e0) > 0
        |  THEN round(greatest(1.0e0 -
        |    greatest(qr / CAST(n AS DOUBLE)
        |      - (sr / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE)), 0.0e0)
        |    / greatest(qd / CAST(n AS DOUBLE)
        |      - (sd / CAST(n AS DOUBLE)) * (sd / CAST(n AS DOUBLE)), 0.0e0),
        |    0.0e0), 6) END AS strength
        |FROM m ORDER BY event_type""".stripMargin,

    // the identical 4 conditional cells; pooled-rate se with the
    // identical parenthesization; significant reads the rounded z
    "q17_twoprop" ->
      """WITH m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_ctrl,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x_ctrl
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |c AS (
        |  SELECT *,
        |    CAST(x_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) AS p1,
        |    CAST(x_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) AS p0,
        |    CAST(x_treat + x_ctrl AS DOUBLE)
        |      / CAST(n_treat + n_ctrl AS DOUBLE) AS pp
        |  FROM m),
        |zc AS (
        |  SELECT n_treat, n_ctrl, x_treat, x_ctrl,
        |    CASE WHEN n_treat > 0 THEN round(p1, 6) END AS p_treat,
        |    CASE WHEN n_ctrl > 0 THEN round(p0, 6) END AS p_ctrl,
        |    CASE WHEN n_treat > 0 AND n_ctrl > 0 AND pp > 0 AND pp < 1
        |         THEN round((p1 - p0) / sqrt(pp * (1.0e0 - pp) *
        |           (1.0e0 / CAST(n_treat AS DOUBLE)
        |            + 1.0e0 / CAST(n_ctrl AS DOUBLE))), 6)
        |    END AS z
        |  FROM c)
        |SELECT n_treat, n_ctrl, x_treat, x_ctrl, p_treat, p_ctrl, z,
        |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) > 1.96e0 END
        |    AS significant
        |FROM zc""".stripMargin,

    // exact conditional counts + the sorted distinct offender sample
    "dq8_accepted" ->
      """WITH s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations
        |  FROM orders),
        |sm AS (
        |  SELECT coalesce(string_agg(v, ',' ORDER BY v), '')
        |    AS sample_values
        |  FROM (SELECT DISTINCT CAST(o_orderstatus AS VARCHAR) AS v
        |        FROM orders
        |        WHERE o_orderstatus IS NOT NULL
        |          AND o_orderstatus NOT IN ('O', 'F')
        |        ORDER BY v LIMIT 5))
        |SELECT n_rows, n_null, n_violations,
        |  round(CAST(n_violations AS DOUBLE) /
        |    CAST(greatest(n_rows - n_null, 1) AS DOUBLE), 6)
        |    AS violation_rate,
        |  sample_values
        |FROM s, sm""".stripMargin,

    // both MD5 sample draws replayed ('capA:'/'capB:'), exact counts,
    // LP and Chapman closing sequences
    "o39_capture" ->
      """WITH ids AS (
        |  SELECT DISTINCT c_custkey FROM customer
        |  WHERE c_custkey IS NOT NULL),
        |h AS (
        |  SELECT c_custkey,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |        FOR c IN string_split(substr(md5('capA:' ||
        |          CAST(c_custkey AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 100 AS ba,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |        FOR c IN string_split(substr(md5('capB:' ||
        |          CAST(c_custkey AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 100 AS bb
        |  FROM ids),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN ba < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN bb < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN ba < 30 AND bb < 30 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS n_true
        |  FROM h)
        |SELECT n1, n2, m,
        |  CASE WHEN m > 0 THEN round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / CAST(m AS DOUBLE), 2) END AS est_lp,
        |  round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
        |    / CAST(m + 1 AS DOUBLE) - 1.0e0, 2) AS est_chapman,
        |  n_true
        |FROM m""".stripMargin,

    // the o13 cell/margin/contrib replay closed by one agg; V reads the
    // 6-rounded chi2 and exact BIGINT n·min(r−1, c−1)
    "o42_cramersv" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS band,
        |         CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, band, o,
        |    CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
        |    CAST(SUM(o) OVER (PARTITION BY band) AS BIGINT) AS col_n,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells),
        |x AS (
        |  SELECT *, CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) /
        |            CAST(n AS DOUBLE) AS e_raw
        |  FROM m),
        |c AS (
        |  SELECT *, round((CAST(o AS DOUBLE) - e_raw) *
        |                  (CAST(o AS DOUBLE) - e_raw) / e_raw, 9) AS contrib9
        |  FROM x),
        |agg AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    round(CAST(SUM(CAST(contrib9 AS DECIMAL(28,9))) AS DOUBLE), 6)
        |      AS chi2
        |  FROM c),
        |lv AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ra,
        |              CAST(COUNT(DISTINCT band) AS BIGINT) AS cb FROM cells)
        |SELECT agg.n AS n, CAST((lv.ra - 1) * (lv.cb - 1) AS BIGINT) AS dof,
        |  lv.ra AS ra, lv.cb AS cb, agg.chi2 AS chi2,
        |  CASE WHEN least(lv.ra, lv.cb) > 1 THEN
        |    round(sqrt(agg.chi2 /
        |      CAST(agg.n * (least(lv.ra, lv.cb) - 1) AS DOUBLE)), 6) END AS v
        |FROM agg CROSS JOIN lv""".stripMargin,

    // pairwise sign counts on the 6-rounded daily means and exact daily
    // counts; every aggregate an explicit BIGINT, one closing sqrt
    "o43_kendall" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS dx,
        |    CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS dy
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |g AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        |    CAST(SUM(CASE WHEN dx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS sx,
        |    CAST(SUM(CASE WHEN dy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS sy
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_pairs, cc AS concordant, dd AS discordant,
        |  CASE WHEN sx > 0 AND sy > 0 THEN
        |    round(CAST(cc - dd AS DOUBLE) / sqrt(CAST(sx * sy AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM g ORDER BY event_type""".stripMargin,

    // the micro-unit integer-moment replay: w = v·10⁶ exact BIGINT,
    // S BIGINT / Q DECIMAL(38,0) prefix sums, one double SSE sequence
    // descaled by 1e12, argmin by (cost, day)
    "o45_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wv AS (
        |  SELECT event_type, day,
        |    CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS w
        |  FROM daily),
        |pref AS (
        |  SELECT event_type, day, w,
        |    CAST(row_number() OVER win AS BIGINT) AS i,
        |    CAST(SUM(w) OVER win AS BIGINT) AS s,
        |    SUM(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0)))
        |      OVER win AS q,
        |    lead(day, 1) OVER win AS next_day
        |  FROM wv WINDOW win AS (PARTITION BY event_type ORDER BY day)),
        |tot AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(w) AS BIGINT) AS sn,
        |    SUM(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))) AS qn
        |  FROM wv GROUP BY 1),
        |cand AS (
        |  SELECT p.event_type, p.next_day, t.n,
        |    round((CAST(t.qn AS DOUBLE) - CAST(t.sn AS DOUBLE) *
        |        CAST(t.sn AS DOUBLE) / CAST(t.n AS DOUBLE)) / 1.0e12, 6)
        |      AS sse_total,
        |    round(((CAST(p.q AS DOUBLE) - CAST(p.s AS DOUBLE) *
        |        CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE)) +
        |      (CAST(t.qn - p.q AS DOUBLE) - CAST(t.sn - p.s AS DOUBLE) *
        |        CAST(t.sn - p.s AS DOUBLE) / CAST(t.n - p.i AS DOUBLE)))
        |      / 1.0e12, 6) AS cost
        |  FROM pref p JOIN tot t ON t.event_type = p.event_type
        |  WHERE p.i >= 3 AND p.i <= t.n - 3),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY cost, next_day) AS rn
        |  FROM cand)
        |SELECT event_type, n AS n_days, next_day AS change_day,
        |  sse_total, cost AS sse_split, round(sse_total - cost, 6) AS gain
        |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // the o53 replay with the harmonic c(n) factor inside the raw
    // adjustment (9-rounded terms DECIMAL-summed)
    "o69_by_fdr" ->
      """WITH h AS (
        |  SELECT c_custkey,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('bh:' ||
        |          CAST(c_custkey AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM customer
        |  WHERE c_custkey % 50 = 0 AND c_custkey IS NOT NULL),
        |t AS (
        |  SELECT c_custkey AS test_id,
        |    CASE WHEN c_custkey % 500 = 0 THEN round(u / 100.0e0, 9)
        |         ELSE round(u, 9) END AS p
        |  FROM (SELECT c_custkey,
        |          CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0 AS u
        |        FROM h)),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
        |hc AS (
        |  SELECT CAST(SUM(CAST(round(1.0e0 / CAST(i AS DOUBLE), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) AS c
        |  FROM (SELECT unnest(generate_series(1,
        |          (SELECT n FROM nn))) AS i)),
        |r AS (
        |  SELECT test_id, p,
        |    CAST(row_number() OVER (ORDER BY p, test_id) AS BIGINT)
        |      AS rank,
        |    nn.n, hc.c
        |  FROM t CROSS JOIN nn CROSS JOIN hc),
        |x AS (
        |  SELECT test_id, p, rank,
        |    round(p * CAST(n AS DOUBLE) * c / CAST(rank AS DOUBLE), 9)
        |      AS raw
        |  FROM r),
        |y AS (
        |  SELECT test_id, p, rank,
        |    LEAST(MIN(raw) OVER (ORDER BY rank ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING), 1.0e0) AS q
        |  FROM x)
        |SELECT test_id, p, rank, q, (q <= 0.05e0) AS reject
        |FROM y ORDER BY rank""".stripMargin,

    // per-width cell replay (salted md5 buckets), min-over-rows
    // estimates, exact integer errors, the e·N/w bound
    "sk12_cms_error" -> {
      val eLit = math.E.toString + "e0"
      def hvExpr(saltPrefix: String) =
        s"""list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
           |      FOR ch IN string_split(substr(md5('$saltPrefix' || tok),
           |        1, 14), '')],
           |    (acc, x) -> acc * 16 + x)""".stripMargin
      def setting(w: Int) = {
        val cellSelects = (0 until 4).map(r =>
          s"SELECT $r AS r, ${hvExpr(s"cmsw$w:$r:")} % $w AS bucket FROM tk")
          .mkString("\n         |    UNION ALL\n         |    ").stripMargin
        val probeSelects = (0 until 4).map(r =>
          s"SELECT tok, f, $r AS r, ${hvExpr(s"cmsw$w:$r:")} % $w AS bucket FROM tf")
          .mkString("\n         |    UNION ALL\n         |    ").stripMargin
        s"""cells_$w AS (
           |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
           |    $cellSelects)
           |  GROUP BY 1, 2),
           |est_$w AS (
           |  SELECT p.tok, p.f, MIN(c.n) AS est FROM (
           |    $probeSelects) p
           |  JOIN cells_$w c ON c.r = p.r AND c.bucket = p.bucket
           |  GROUP BY 1, 2),
           |row_$w AS (
           |  SELECT $w AS width, CAST(COUNT(*) AS BIGINT) AS n_items,
           |    CAST(SUM(CASE WHEN est - f > 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_over,
           |    round(CAST(SUM(est - f) AS DOUBLE) /
           |      CAST(COUNT(*) AS DOUBLE), 6) AS mean_err,
           |    CAST(MAX(est - f) AS BIGINT) AS max_err,
           |    round($eLit * (SELECT CAST(SUM(f) AS DOUBLE) FROM tf) /
           |      ${w.toDouble}e0, 6) AS bound
           |  FROM est_$w)""".stripMargin
      }
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
         |    '\\s+'), x -> x <> '')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tk
         |       GROUP BY 1),
         |${setting(64)},
         |${setting(256)},
         |${setting(1024)},
         |u AS (SELECT * FROM row_64 UNION ALL SELECT * FROM row_256
         |      UNION ALL SELECT * FROM row_1024)
         |SELECT width, n_items, n_over, mean_err, max_err, bound
         |FROM u ORDER BY width""".stripMargin
    },

    // the bh: uniform replay, exact rank/n BIGINTs, suffix-min window
    "o53_bh" ->
      """WITH h AS (
        |  SELECT c_custkey,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('bh:' ||
        |          CAST(c_custkey AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM customer
        |  WHERE c_custkey % 50 = 0 AND c_custkey IS NOT NULL),
        |t AS (
        |  SELECT c_custkey AS test_id,
        |    CASE WHEN c_custkey % 500 = 0 THEN round(u / 100.0e0, 9)
        |         ELSE round(u, 9) END AS p
        |  FROM (SELECT c_custkey,
        |          CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0 AS u
        |        FROM h)),
        |r AS (
        |  SELECT test_id, p,
        |    CAST(row_number() OVER (ORDER BY p, test_id) AS BIGINT) AS rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM t),
        |x AS (
        |  SELECT test_id, p, rank,
        |    round(p * CAST(n AS DOUBLE) / CAST(rank AS DOUBLE), 9) AS raw
        |  FROM r),
        |y AS (
        |  SELECT test_id, p, rank,
        |    LEAST(MIN(raw) OVER (ORDER BY rank ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING), 1.0e0) AS q
        |  FROM x)
        |SELECT test_id, p, rank, q, (q <= 0.05e0) AS reject
        |FROM y ORDER BY rank""".stripMargin,

    // 4-rounded decile bounds, raw-value comparisons against them,
    // DECIMAL sums for all three means
    "o51_trimmed" ->
      """WITH b AS (
        |  SELECT event_type AS k, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |bounds AS (
        |  SELECT k, round(quantile_cont(v, 0.1e0), 4) AS lo_bound,
        |    round(quantile_cont(v, 0.9e0), 4) AS hi_bound
        |  FROM b GROUP BY 1),
        |j AS (
        |  SELECT b.k, b.v, lo_bound, hi_bound,
        |    (b.v >= lo_bound AND b.v <= hi_bound) AS inb,
        |    LEAST(GREATEST(b.v, lo_bound), hi_bound) AS cl
        |  FROM b JOIN bounds ON bounds.k = b.k)
        |SELECT k AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  lo_bound, hi_bound,
        |  CAST(SUM(CASE WHEN inb THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed,
        |  round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_raw,
        |  round(CAST(SUM(CASE WHEN inb THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) /
        |    CAST(SUM(CASE WHEN inb THEN 1 ELSE 0 END) AS DOUBLE), 6)
        |    AS mean_trimmed,
        |  round(CAST(SUM(CAST(cl AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_winsor
        |FROM j GROUP BY 1, 3, 4 ORDER BY event_type""".stripMargin,

    // the μ-rounded ratio terms through the ln firewall; theil_norm
    // reads the rounded T over the 9-rounded ln(n)
    "o52_theil" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS k, o_totalprice AS v FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND o_totalprice > 0),
        |m AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS mu
        |  FROM b GROUP BY 1),
        |t AS (
        |  SELECT b.k, m.n, m.mu,
        |    round((b.v / m.mu) * round(ln(b.v / m.mu), 9), 9) AS tt
        |  FROM b JOIN m ON m.k = b.k),
        |g AS (
        |  SELECT k, n, mu,
        |    round(CAST(SUM(CAST(tt AS DECIMAL(28,9))) AS DOUBLE) /
        |      CAST(n AS DOUBLE), 6) AS theil
        |  FROM t GROUP BY 1, 2, 3)
        |SELECT k AS o_orderpriority, n, mu, theil,
        |  CASE WHEN n > 1 THEN
        |    round(theil / round(ln(CAST(n AS DOUBLE)), 9), 6) END
        |    AS theil_norm
        |FROM g ORDER BY o_orderpriority""".stripMargin,

    // exact decimal sums, 6-rounded replicates scaled to micro BIGINTs,
    // the SS expansion n·Σm² − (Σm)² in 38-digit-safe decimal products,
    // one closing sqrt sequence
    "o54_jackknife" ->
      """WITH b AS (
        |  SELECT l_returnflag AS k, l_extendedprice AS x, l_quantity AS y
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_quantity IS NOT NULL),
        |s AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS DECIMAL(18,6))) AS sx,
        |    SUM(CAST(y AS DECIMAL(18,6))) AS sy
        |  FROM b GROUP BY 1),
        |t AS (
        |  SELECT k, n, sx, sy,
        |    round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE), 6) AS theta
        |  FROM s),
        |r AS (
        |  SELECT b.k, t.n, t.theta,
        |    CAST(CAST(round(
        |        CAST(t.sx - CAST(b.x AS DECIMAL(18,6)) AS DOUBLE) /
        |        CAST(t.sy - CAST(b.y AS DECIMAL(18,6)) AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS mi
        |  FROM b JOIN t ON t.k = b.k),
        |m AS (
        |  SELECT k, n, theta, CAST(SUM(mi) AS BIGINT) AS sm,
        |    SUM(CAST(mi AS DECIMAL(19,0)) * CAST(mi AS DECIMAL(19,0)))
        |      AS sm2
        |  FROM r GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT k, n, theta,
        |    round(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1.0e6, 6)
        |      AS theta_loo_mean,
        |    CAST(CAST(sm2 AS DECIMAL(25,0)) * CAST(n AS DECIMAL(13,0)) -
        |      CAST(sm AS DECIMAL(19,0)) * CAST(sm AS DECIMAL(19,0))
        |      AS DOUBLE) AS ssn
        |  FROM m)
        |SELECT k AS l_returnflag, n, theta, theta_loo_mean,
        |  round((CAST(n AS DOUBLE) - 1.0e0) *
        |    CAST(CAST(theta_loo_mean AS DECIMAL(18,6)) -
        |      CAST(theta AS DECIMAL(18,6)) AS DOUBLE), 6) AS bias_jack,
        |  round(sqrt(((CAST(n AS DOUBLE) - 1.0e0) * ssn) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1.0e12), 6)
        |    AS se_jack
        |FROM f ORDER BY l_returnflag""".stripMargin,

    // the o55 chain with both margins reading the click series
    "o67_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |x AS (SELECT day, v AS xv FROM daily WHERE event_type = 'click'),
        |y AS (SELECT day AS yday, v AS yv FROM daily
        |      WHERE event_type = 'click'),
        |l AS (SELECT unnest(generate_series(0, 10)) AS lag),
        |p AS (
        |  SELECT l.lag, x.xv, y.yv
        |  FROM x CROSS JOIN l
        |  JOIN y ON y.yday = x.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(xv AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(yv AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xv AS DECIMAL(19,6)) * CAST(yv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(xv AS DECIMAL(19,6)) * CAST(xv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(yv AS DECIMAL(19,6)) * CAST(yv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS syy
        |  FROM p GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN n > 1 AND (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        |        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
        |    THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS ccf
        |FROM m ORDER BY lag""".stripMargin,

    // the shared daily CTE, a generate_series lag ladder, and the P121
    // five-sum moment discipline per lag
    "o55_ccf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |x AS (SELECT day, v AS xv FROM daily WHERE event_type = 'click'),
        |y AS (SELECT day AS yday, v AS yv FROM daily
        |      WHERE event_type = 'purchase'),
        |l AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |p AS (
        |  SELECT l.lag, x.xv, y.yv
        |  FROM x CROSS JOIN l
        |  JOIN y ON y.yday = x.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(xv AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(yv AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xv AS DECIMAL(19,6)) * CAST(yv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(xv AS DECIMAL(19,6)) * CAST(xv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(yv AS DECIMAL(19,6)) * CAST(yv AS DECIMAL(19,6)))
        |      AS DOUBLE) AS syy
        |  FROM p GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN n > 1 AND (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        |        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
        |    THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS ccf
        |FROM m ORDER BY lag""".stripMargin,

    // the scalar split day via cross join, threshold pair flags, exact
    // integer discordant cells, one closing double division
    "o56_mcnemar" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS day
        |  FROM events WHERE user_id IS NOT NULL),
        |s AS (SELECT MIN(day) + 15 AS split FROM e),
        |p AS (
        |  SELECT user_id, s.split,
        |    SUM(CASE WHEN event_type = 'click' AND day < s.split
        |      THEN 1 ELSE 0 END) >= 7 AS bf,
        |    SUM(CASE WHEN event_type = 'click' AND day >= s.split
        |      THEN 1 ELSE 0 END) >= 7 AS af
        |  FROM e CROSS JOIN s GROUP BY 1, 2),
        |g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN bf AND af THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both,
        |    CAST(SUM(CASE WHEN NOT bf AND NOT af THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neither,
        |    CAST(SUM(CASE WHEN bf AND NOT af THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b_only,
        |    CAST(SUM(CASE WHEN NOT bf AND af THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_only
        |  FROM p)
        |SELECT n, n_both, n_neither, b_only, c_only,
        |  CASE WHEN b_only + c_only > 0 THEN
        |    round(CAST((b_only - c_only) * (b_only - c_only) AS DOUBLE) /
        |      CAST(b_only + c_only AS DOUBLE), 6) END AS chi2,
        |  CASE WHEN b_only + c_only > 0 THEN
        |    round(CAST((b_only - c_only) * (b_only - c_only) AS DOUBLE) /
        |      CAST(b_only + c_only AS DOUBLE), 6) > 3.841e0 END
        |    AS significant
        |FROM g""".stripMargin,

    // bit-exact bloom replay: per-hash salted MD5 positions, the bit
    // set as a UNION, membership as k IN-subquery conjuncts; theory =
    // observed fill raised by left-assoc multiplication
    "sk10_bloom" -> {
      def hv(salt: String, key: String) =
        s"""list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
           |      FOR ch IN string_split(substr(md5('$salt' ||
           |        COALESCE(CAST($key AS VARCHAR), '')), 1, 14), '')],
           |    (acc, x) -> acc * 16 + x)""".stripMargin
      def cfg(tag: String, saltBase: String, m: Int, k: Int) = {
        val bitSelects = (0 until k).map(i =>
          s"SELECT DISTINCT ${hv(s"$saltBase$i:", "ik")} % $m AS bit FROM ins")
          .mkString("\nUNION\n")
        val conjuncts = (0 until k).map(i =>
          s"${hv(s"$saltBase$i:", "pk")} % $m IN (SELECT bit FROM bits_$tag)")
          .mkString("\n  AND ")
        s"""bits_$tag AS (
           |$bitSelects),
           |fp_$tag AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_fp FROM nm
           |  WHERE $conjuncts),
           |row_$tag AS (
           |  SELECT $m AS m, $k AS k,
           |    CAST((SELECT COUNT(*) FROM ins) AS BIGINT) AS n_insert,
           |    CAST((SELECT COUNT(*) FROM bits_$tag) AS BIGINT)
           |      AS n_bits_set,
           |    CAST((SELECT COUNT(*) FROM nm) AS BIGINT) AS n_probes,
           |    (SELECT n_fp FROM fp_$tag) AS n_fp)""".stripMargin
      }
      def theory(k: Int) =
        "(" + Seq.fill(k)("f").mkString(" * ") + ")"
      s"""WITH ins AS (
         |  SELECT DISTINCT c_custkey AS ik FROM customer
         |  WHERE c_mktsegment = 'BUILDING' AND c_custkey IS NOT NULL),
         |nm AS (
         |  SELECT DISTINCT c_custkey AS pk FROM customer
         |  WHERE c_custkey IS NOT NULL
         |    AND c_custkey NOT IN (SELECT ik FROM ins)),
         |${cfg("a", "bfA:", 256, 2)},
         |${cfg("b", "bfB:", 4096, 4)},
         |u AS (SELECT * FROM row_a UNION ALL SELECT * FROM row_b),
         |w AS (
         |  SELECT *, round(CAST(n_bits_set AS DOUBLE) / CAST(m AS DOUBLE),
         |    9) AS f
         |  FROM u)
         |SELECT m, k, n_insert, n_bits_set, n_probes, n_fp,
         |  round(CAST(n_fp AS DOUBLE) /
         |    CAST(greatest(n_probes, 1) AS DOUBLE), 6) AS fpr_emp,
         |  CASE WHEN k = 2 THEN round(${theory(2)}, 9)
         |       ELSE round(${theory(4)}, 9) END AS fpr_theory
         |FROM w ORDER BY m""".stripMargin
    },

    // per-user 6-rounded means, exact decimal pairwise diffs, the o5
    // median rule at 4, decimal mean at 6
    "o74_hl_shift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(value) AS DOUBLE), 6) AS mv,
        |    CAST(user_id % 2 = 1 AS VARCHAR) AS arm
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(mv AS DECIMAL(18,6)) AS va FROM pu
        |      WHERE mv IS NOT NULL AND arm = 'true'),
        |b AS (SELECT CAST(mv AS DECIMAL(18,6)) AS vb FROM pu
        |      WHERE mv IS NOT NULL AND arm = 'false'),
        |d AS (SELECT va - vb AS d FROM a CROSS JOIN b)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(quantile_cont(CAST(d AS DOUBLE), 0.5e0), 4) AS hl_shift,
        |  round(CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_shift
        |FROM d""".stripMargin,

    // epoch-day weeks, per-type lag window, decimal deltas
    "dq14_wow" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |      AS sum_v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, wk, sum_v,
        |    lag(sum_v) OVER (PARTITION BY event_type ORDER BY wk)
        |      AS prev_v
        |  FROM weekly)
        |SELECT event_type, wk, sum_v, prev_v,
        |  CAST(CAST(sum_v AS DECIMAL(18,6)) -
        |    CAST(prev_v AS DECIMAL(18,6)) AS DOUBLE) AS delta,
        |  CASE WHEN prev_v <> 0 THEN
        |    round(CAST(CAST(sum_v AS DECIMAL(18,6)) -
        |      CAST(prev_v AS DECIMAL(18,6)) AS DOUBLE) / prev_v, 6) END
        |    AS pct_change
        |FROM l ORDER BY event_type, wk""".stripMargin,

    // 6-rounded cell means, block-local doubled ranks, exact rank-sum
    // squares, one fixed closing sequence
    "o72_friedman" ->
      """WITH b AS (
        |  SELECT user_id AS bk, event_type AS t, value AS v FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL),
        |cells AS (
        |  SELECT bk, t,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS m
        |  FROM b GROUP BY 1, 2),
        |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells),
        |wb AS (SELECT *, COUNT(*) OVER (PARTITION BY bk) AS bn FROM cells),
        |comp AS (SELECT wb.* FROM wb CROSS JOIN k WHERE bn = k.k),
        |r AS (
        |  SELECT bk, t,
        |    CAST(rank() OVER (PARTITION BY bk ORDER BY m) AS BIGINT)
        |      AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY bk, m) AS BIGINT) AS tt
        |  FROM comp),
        |pt AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(2 * minr + tt - 1) AS BIGINT) AS r2
        |  FROM r GROUP BY 1),
        |cl AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
        |    CAST(MAX((SELECT k FROM k)) AS BIGINT) AS k_treatments,
        |    CAST(SUM(r2 * r2) AS BIGINT) AS s4
        |  FROM pt)
        |SELECT n_blocks, k_treatments,
        |  CASE WHEN n_blocks > 0 AND k_treatments > 1 THEN
        |    round(12.0e0 * CAST(s4 AS DOUBLE) / 4.0e0 /
        |      (CAST(n_blocks AS DOUBLE) * CAST(k_treatments AS DOUBLE) *
        |        (CAST(k_treatments AS DOUBLE) + 1.0e0)) -
        |      3.0e0 * CAST(n_blocks AS DOUBLE) *
        |        (CAST(k_treatments AS DOUBLE) + 1.0e0), 6) END AS chi2_f,
        |  CASE WHEN n_blocks > 0 THEN CAST(k_treatments - 1 AS BIGINT) END
        |    AS dof
        |FROM cl""".stripMargin,

    // one fused conditional agg; exact counts, fixed double closings
    "o73_ratetest" ->
      """WITH b AS (
        |  SELECT (user_id % 2 = 1) AS arm, user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |g AS (
        |  SELECT
        |    CAST(COUNT(DISTINCT CASE WHEN arm THEN user_id END) AS BIGINT)
        |      AS units_a,
        |    CAST(COUNT(DISTINCT CASE WHEN NOT arm THEN user_id END)
        |      AS BIGINT) AS units_b,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS events_a,
        |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS events_b
        |  FROM b)
        |SELECT units_a, units_b, events_a, events_b,
        |  CASE WHEN units_a > 0 THEN
        |    round(CAST(events_a AS DOUBLE) / CAST(units_a AS DOUBLE), 6)
        |  END AS rate_a,
        |  CASE WHEN units_b > 0 THEN
        |    round(CAST(events_b AS DOUBLE) / CAST(units_b AS DOUBLE), 6)
        |  END AS rate_b,
        |  CASE WHEN units_a > 0 AND units_b > 0
        |        AND events_a + events_b > 0 AND events_b > 0 THEN
        |    round((CAST(events_a AS DOUBLE) / CAST(units_a AS DOUBLE)) /
        |      (CAST(events_b AS DOUBLE) / CAST(units_b AS DOUBLE)), 6)
        |  END AS rate_ratio,
        |  CASE WHEN units_a > 0 AND units_b > 0
        |        AND events_a + events_b > 0 THEN
        |    round((CAST(events_a AS DOUBLE) -
        |      (CAST(events_a AS DOUBLE) + CAST(events_b AS DOUBLE)) *
        |        (CAST(units_a AS DOUBLE) /
        |          (CAST(units_a AS DOUBLE) + CAST(units_b AS DOUBLE)))) /
        |      sqrt((CAST(events_a AS DOUBLE) + CAST(events_b AS DOUBLE)) *
        |        (CAST(units_a AS DOUBLE) /
        |          (CAST(units_a AS DOUBLE) + CAST(units_b AS DOUBLE))) *
        |        (1.0e0 - CAST(units_a AS DOUBLE) /
        |          (CAST(units_a AS DOUBLE) + CAST(units_b AS DOUBLE)))),
        |      6)
        |  END AS z
        |FROM g""".stripMargin,

    // 6-rounded cell means, pooled doubled ranks, 6-rounded R²/4n terms
    // decimal-summed, exact tie cubes, one fixed closing sequence
    "o75_kruskal" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY user_id, event_type),
        |r AS (
        |  SELECT g,
        |    CAST(rank() OVER (ORDER BY v) AS BIGINT) AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) AS tt
        |  FROM b),
        |pg AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(2 * minr + tt - 1) AS BIGINT) AS r2
        |  FROM r GROUP BY 1),
        |terms AS (
        |  SELECT n, CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) /
        |      4.0e0 / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)) AS term
        |  FROM pg),
        |ties AS (
        |  SELECT CAST(coalesce(SUM(t3 * t3 * t3 - t3), 0) AS BIGINT)
        |    AS tie3
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t3 FROM b GROUP BY v)),
        |cl AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    SUM(term) AS s
        |  FROM terms)
        |SELECT n_total, k_groups,
        |  CASE WHEN k_groups > 1 AND n_total > 1 THEN
        |    round(12.0e0 * CAST(s AS DOUBLE) /
        |      (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0e0))
        |      - 3.0e0 * (CAST(n_total AS DOUBLE) + 1.0e0), 6) END AS h,
        |  CASE WHEN k_groups > 1 AND n_total > 1 AND
        |      1.0e0 - CAST(tie3 AS DOUBLE) /
        |        (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) *
        |          CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) > 0
        |    THEN
        |    round(round(12.0e0 * CAST(s AS DOUBLE) /
        |      (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0e0))
        |      - 3.0e0 * (CAST(n_total AS DOUBLE) + 1.0e0), 6) /
        |      (1.0e0 - CAST(tie3 AS DOUBLE) /
        |        (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) *
        |          CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))), 6)
        |  END AS h_tie_corrected,
        |  CASE WHEN k_groups > 1 THEN CAST(k_groups - 1 AS BIGINT) END
        |    AS dof
        |FROM cl CROSS JOIN ties""".stripMargin,

    // exact integer column/row totals; Q is one double ratio on BIGINTs
    "o76_cochranq" ->
      """WITH b AS (
        |  SELECT user_id AS bk, event_type AS t,
        |    CASE WHEN COUNT(*) >= 14 THEN 1 ELSE 0 END AS x
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM b),
        |c AS (
        |  SELECT CAST(SUM(cc * cc) AS BIGINT) AS sc2,
        |    CAST(SUM(cc) AS BIGINT) AS tt
        |  FROM (SELECT CAST(SUM(x) AS BIGINT) AS cc FROM b GROUP BY t)),
        |r AS (
        |  SELECT CAST(SUM(rr * rr) AS BIGINT) AS sr2,
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks
        |  FROM (SELECT CAST(SUM(x) AS BIGINT) AS rr FROM b GROUP BY bk))
        |SELECT n_blocks, k.k AS k_treatments, c.tt AS t_total,
        |  CASE WHEN k.k > 1 AND k.k * c.tt - r.sr2 > 0 THEN
        |    round(CAST((k.k - 1) * (k.k * c.sc2 - c.tt * c.tt) AS DOUBLE) /
        |      CAST(k.k * c.tt - r.sr2 AS DOUBLE), 6) END AS q,
        |  CASE WHEN k.k > 1 THEN CAST(k.k - 1 AS BIGINT) END AS dof
        |FROM r CROSS JOIN c CROSS JOIN k""".stripMargin,

    // exact BIGINT variance numerators — the n(n−1) denominators cancel
    "o77_cronbach" ->
      """WITH b AS (
        |  SELECT user_id AS u, event_type AS i,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM b),
        |k AS (SELECT CAST(COUNT(DISTINCT i) AS BIGINT) AS k FROM b),
        |it AS (
        |  SELECT CAST(SUM(n.n * sx2 - sx * sx) AS BIGINT) AS sivn
        |  FROM (SELECT CAST(SUM(x * x) AS BIGINT) AS sx2,
        |          CAST(SUM(x) AS BIGINT) AS sx
        |        FROM b GROUP BY i) CROSS JOIN n),
        |un AS (
        |  SELECT CAST(SUM(t * t) AS BIGINT) AS st2,
        |    CAST(SUM(t) AS BIGINT) AS st
        |  FROM (SELECT CAST(SUM(x) AS BIGINT) AS t FROM b GROUP BY u))
        |SELECT n.n AS n_units, k.k AS k_items, it.sivn AS sum_item_var_num,
        |  CAST(n.n * un.st2 - un.st * un.st AS BIGINT) AS total_var_num,
        |  CASE WHEN k.k > 1 AND n.n * un.st2 - un.st * un.st > 0 THEN
        |    round(CAST(k.k AS DOUBLE) / CAST(k.k - 1 AS DOUBLE) *
        |      (1.0e0 - CAST(it.sivn AS DOUBLE) /
        |        CAST(n.n * un.st2 - un.st * un.st AS DOUBLE)), 6)
        |  END AS alpha
        |FROM n CROSS JOIN k CROSS JOIN it CROSS JOIN un""".stripMargin,

    // per-FD two-level exact counts; the g3 repair measure Σ(g − max)
    "dq15_fd" -> {
      def branch(tbl: String, a: String, b: String): String =
        s"""SELECT '$a->$b' AS fd,
           |    CAST(coalesce(SUM(g), 0) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_groups,
           |    CAST(coalesce(SUM(CASE WHEN g > m THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_violating_groups,
           |    CAST(coalesce(SUM(g - m), 0) AS BIGINT) AS n_violations
           |  FROM (
           |    SELECT CAST(SUM(n) AS BIGINT) AS g, CAST(MAX(n) AS BIGINT) AS m
           |    FROM (SELECT $a AS a, $b AS bb, CAST(COUNT(*) AS BIGINT) AS n
           |          FROM $tbl WHERE $a IS NOT NULL AND $b IS NOT NULL
           |          GROUP BY 1, 2)
           |    GROUP BY a)""".stripMargin
      s"""WITH u AS (
         |  ${branch("lineitem", "l_partkey", "l_suppkey")}
         |  UNION ALL
         |  ${branch("orders", "o_orderkey", "o_orderstatus")}
         |  UNION ALL
         |  ${branch("orders", "o_custkey", "o_orderpriority")}
         |  UNION ALL
         |  ${branch("customer", "c_nationkey", "c_mktsegment")})
         |SELECT fd, n_rows, n_groups, n_violating_groups, n_violations,
         |  CASE WHEN n_rows > 0 THEN
         |    round(CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         |  END AS violation_rate,
         |  (n_violations = 0) AS holds
         |FROM u ORDER BY fd""".stripMargin
    },

    // the o11 fit replay per type, exact micro-unit residuals, exact
    // DECIMAL(19,0)-product sums, one closing ratio
    "o78_dw" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |d2 AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', day) AS BIGINT) AS x, v
        |  FROM daily),
        |s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
        |  FROM d2 WHERE x IS NOT NULL AND v IS NOT NULL GROUP BY 1),
        |f AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den, sx, sy
        |  FROM s),
        |fit AS (
        |  SELECT event_type,
        |    CAST(round(num / den, 6) AS DECIMAL(18,6)) AS sl,
        |    CAST(round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS ic
        |  FROM f WHERE den > 0),
        |res AS (
        |  SELECT d2.event_type, d2.x,
        |    CAST(CAST(CAST(d2.v AS DECIMAL(18,6)) - fit.ic -
        |        fit.sl * CAST(d2.x AS DECIMAL(9,0)) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS em
        |  FROM d2 JOIN fit ON fit.event_type = d2.event_type
        |  WHERE d2.x IS NOT NULL AND d2.v IS NOT NULL),
        |lagd AS (
        |  SELECT event_type, em,
        |    em - lag(em) OVER (PARTITION BY event_type ORDER BY x) AS dm
        |  FROM res),
        |cl AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    SUM(CAST(dm AS DECIMAL(19,0)) * CAST(dm AS DECIMAL(19,0)))
        |      AS num,
        |    SUM(CAST(em AS DECIMAL(19,0)) * CAST(em AS DECIMAL(19,0)))
        |      AS den
        |  FROM lagd GROUP BY 1)
        |SELECT event_type, n_obs,
        |  CASE WHEN den > 0 AND num IS NOT NULL THEN
        |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS dw
        |FROM cl ORDER BY event_type""".stripMargin,

    // one union-tagged agg (no join), 9-rounded shares, IEEE sqrt on
    // identical operands, DECIMAL-summed terms, fixed closings
    "dq16_hellinger" ->
      """WITH u AS (
        |  SELECT event_type AS c,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS ia
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |pc AS (
        |  SELECT c, CAST(SUM(ia) AS BIGINT) AS na,
        |    CAST(SUM(1 - ia) AS BIGINT) AS nb
        |  FROM u GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(na) AS BIGINT) AS ta,
        |    CAST(SUM(nb) AS BIGINT) AS tb
        |  FROM pc),
        |terms AS (
        |  SELECT ta, tb,
        |    CAST(round((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 9)
        |      AS DECIMAL(28,9)) AS h2,
        |    CAST(round(sqrt(p) * sqrt(q), 9) AS DECIMAL(28,9)) AS bcterm
        |  FROM (SELECT ta, tb,
        |      CASE WHEN ta > 0 THEN
        |        round(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE), 9) END AS p,
        |      CASE WHEN tb > 0 THEN
        |        round(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE), 9) END AS q
        |    FROM pc CROSS JOIN t))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_categories, ta AS n_a,
        |  tb AS n_b,
        |  round(CAST(SUM(bcterm) AS DOUBLE), 6) AS bc,
        |  round(sqrt(CAST(SUM(h2) AS DOUBLE) / 2.0e0), 6) AS hellinger
        |FROM terms GROUP BY ta, tb""".stripMargin,

    // the operator's own sprtConstants driver literals on both sides;
    // 9-rounded daily increments DECIMAL-summed per arm
    "o79_sprt" -> {
      val (la, lb, up6, lo6) =
        graft.operators.Features.sprtConstants(0.17, 0.20, 0.05, 0.05)
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      s"""WITH d AS (
         |  SELECT (user_id % 2 = 1) AS arm, CAST(ts AS DATE) AS period,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conversions,
         |    CAST(COUNT(*) AS BIGINT) AS trials
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |t AS (
         |  SELECT arm, period, conversions, trials,
         |    CAST(round(CAST(conversions AS DOUBLE) * ${l(la)} +
         |      CAST(trials - conversions AS DOUBLE) * ${l(lb)}, 9)
         |      AS DECIMAL(28,9)) AS tt
         |  FROM d),
         |l2 AS (
         |  SELECT arm, period, conversions, trials,
         |    round(CAST(SUM(tt) OVER (PARTITION BY arm ORDER BY period
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS DOUBLE), 6) AS llr
         |  FROM t)
         |SELECT arm, period, conversions, trials, llr,
         |  ${l(up6)} AS upper_bound, ${l(lo6)} AS lower_bound,
         |  (llr >= ${l(up6)}) AS crossed_upper,
         |  (llr <= ${l(lo6)}) AS crossed_lower
         |FROM l2 ORDER BY arm, period""".stripMargin
    },

    // 6-rounded block maxima, o11-discipline decimal moments, then each
    // derived stat a fixed double sequence on the PREVIOUS rounded
    // column with the operator's own driver literals
    "o80_evt" -> {
      val (c1, g, c2) = graft.operators.TimeSeries.gumbelConstants
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      s"""WITH m AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(MAX(CAST(value AS DOUBLE)), 6) AS mx
         |  FROM events
         |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |s AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |    CAST(SUM(CAST(mx AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(mx AS DECIMAL(19,6)) *
         |             CAST(mx AS DECIMAL(19,6))) AS DOUBLE) AS sxx
         |  FROM m GROUP BY 1),
         |a AS (
         |  SELECT event_type, n_blocks,
         |    round(sx / CAST(n_blocks AS DOUBLE), 6) AS mean_max,
         |    CASE WHEN n_blocks > 1 AND
         |        (CAST(n_blocks AS DOUBLE) * sxx - sx * sx) /
         |          (CAST(n_blocks AS DOUBLE) *
         |            (CAST(n_blocks AS DOUBLE) - 1.0e0)) > 0 THEN
         |      round(sqrt((CAST(n_blocks AS DOUBLE) * sxx - sx * sx) /
         |        (CAST(n_blocks AS DOUBLE) *
         |          (CAST(n_blocks AS DOUBLE) - 1.0e0))), 6) END AS sd_max
         |  FROM s),
         |b AS (
         |  SELECT *, CASE WHEN sd_max IS NOT NULL THEN
         |    round(sd_max * ${l(c1)}, 6) END AS beta
         |  FROM a),
         |c AS (
         |  SELECT *, CASE WHEN beta IS NOT NULL THEN
         |    round(mean_max - ${l(g)} * beta, 6) END AS mu
         |  FROM b)
         |SELECT event_type, n_blocks, mean_max, sd_max, beta, mu,
         |  CASE WHEN beta IS NOT NULL THEN
         |    round(mu - beta * ${l(c2)}, 6) END AS rl100
         |FROM c ORDER BY event_type""".stripMargin
    },

    // the shared daily CTE; exact decimal moves, fixed double limits,
    // the flag compares 6-rounded exact decimals
    "o81_imr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, day, CAST(v AS DECIMAL(18,6)) AS v,
        |    abs(CAST(v AS DECIMAL(18,6)) -
        |      lag(CAST(v AS DECIMAL(18,6))) OVER (PARTITION BY event_type
        |        ORDER BY day)) AS mr
        |  FROM daily),
        |lim AS (
        |  SELECT event_type,
        |    round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |      AS center,
        |    CASE WHEN COUNT(mr) > 0 THEN
        |      round(CAST(SUM(mr) AS DOUBLE) / CAST(COUNT(mr) AS DOUBLE), 6)
        |    END AS mr_bar
        |  FROM m GROUP BY 1),
        |lim2 AS (
        |  SELECT event_type, center, mr_bar,
        |    CASE WHEN mr_bar IS NOT NULL THEN
        |      round(center + 2.66e0 * mr_bar, 6) END AS ucl,
        |    CASE WHEN mr_bar IS NOT NULL THEN
        |      round(center - 2.66e0 * mr_bar, 6) END AS lcl
        |  FROM lim)
        |SELECT m.event_type, m.day, CAST(m.v AS DOUBLE) AS "value",
        |  round(CAST(m.mr AS DOUBLE), 6) AS mr,
        |  lim2.center, lim2.ucl, lim2.lcl,
        |  CASE WHEN lim2.ucl IS NOT NULL THEN
        |    (CAST(m.v AS DOUBLE) > lim2.ucl OR CAST(m.v AS DOUBLE) < lim2.lcl)
        |  END AS out_of_control
        |FROM m JOIN lim2 ON lim2.event_type = m.event_type
        |ORDER BY m.event_type, m.day""".stripMargin,

    // the sa13 two-phase shape replayed: per-bucket runs + edge values,
    // one boundary stitch over the bucket frame, exact counts
    "z10_rle" -> {
      def branch(c: String, expr: String): String =
        s"""SELECT '$c' AS "column", n_rows, n_runs,
           |    CASE WHEN n_runs > 0 THEN
           |      round(CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE), 6)
           |    END AS avg_run_len,
           |    (SELECT CAST(COUNT(DISTINCT CAST($expr AS VARCHAR))
           |        AS BIGINT)
           |     FROM orders WHERE o_orderkey IS NOT NULL) AS n_distinct
           |  FROM (
           |    SELECT CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS n_rows,
           |      CAST(coalesce(SUM(runs - dup), 0) AS BIGINT) AS n_runs
           |    FROM (
           |      SELECT b, runs, cnt,
           |        CASE WHEN lag(lv) OVER (ORDER BY b)
           |               IS NOT DISTINCT FROM fv
           |             THEN 1 ELSE 0 END AS dup
           |      FROM (
           |        SELECT b, CAST(SUM(nw) AS BIGINT) AS runs,
           |          arg_min(v, k) AS fv, arg_max(v, k) AS lv,
           |          CAST(COUNT(*) AS BIGINT) AS cnt
           |        FROM (
           |          SELECT b, k, v,
           |            CASE WHEN row_number() OVER w = 1 THEN 1
           |                 WHEN lag(v) OVER w IS NOT DISTINCT FROM v
           |                 THEN 0 ELSE 1 END AS nw
           |          FROM (
           |            SELECT CAST(o_orderkey AS BIGINT) AS k,
           |              CAST($expr AS VARCHAR) AS v,
           |              CAST(floor(o_orderkey / 1024) AS BIGINT) AS b
           |            FROM orders WHERE o_orderkey IS NOT NULL)
           |          WINDOW w AS (PARTITION BY b ORDER BY k))
           |        GROUP BY b)))""".stripMargin
      s"""WITH u AS (
         |  ${branch("o_orderstatus", "o_orderstatus")}
         |  UNION ALL
         |  ${branch("o_orderpriority", "o_orderpriority")}
         |  UNION ALL
         |  ${branch("o_year", "year(o_orderdate)")})
         |SELECT * FROM u ORDER BY "column"""".stripMargin
    },

    // the dq1 profiler replay split at the o22 timestamp
    "pipe11_drift" -> {
      def branch(c: String, isNum: Boolean, cond: String): String = {
        val numStats = if (isNum)
          s"""round(CAST(MIN($c) AS DOUBLE), 6) AS min_v,
             |    round(CAST(MAX($c) AS DOUBLE), 6) AS max_v,
             |    round(CAST(SUM(CAST($c AS DECIMAL(38,12))) AS DOUBLE) /
             |          CAST(COUNT($c) AS DOUBLE), 6) AS mean_v""".stripMargin
        else
          "CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, " +
            "CAST(NULL AS DOUBLE) AS mean_v"
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_null,
           |    CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |    $numStats
           |  FROM events WHERE $cond""".stripMargin
      }
      def side(cond: String): String = Seq(
        branch("user_id", isNum = true, cond),
        branch("event_type", isNum = false, cond),
        branch("value", isNum = true, cond)).mkString("\n  UNION ALL\n  ")
      s"""WITH pa AS (
         |  ${side("ts < TIMESTAMP '2024-01-16'")}),
         |pb AS (
         |  ${side("ts >= TIMESTAMP '2024-01-16'")})
         |SELECT pa."column",
         |  pa.n_rows AS n_rows_a, pa.n_null AS n_null_a,
         |  pa.n_distinct AS n_distinct_a, pa."min_v" AS min_v_a,
         |  pa."max_v" AS max_v_a, pa."mean_v" AS mean_v_a,
         |  pb.n_rows AS n_rows_b, pb.n_null AS n_null_b,
         |  pb.n_distinct AS n_distinct_b, pb."min_v" AS min_v_b,
         |  pb."max_v" AS max_v_b, pb."mean_v" AS mean_v_b,
         |  round(abs(CAST(pa.n_null AS DOUBLE) / CAST(pa.n_rows AS DOUBLE) -
         |            CAST(pb.n_null AS DOUBLE) / CAST(pb.n_rows AS DOUBLE)), 6)
         |    AS d_null_rate,
         |  CASE WHEN pa.n_distinct > 0
         |       THEN round(CAST(pb.n_distinct AS DOUBLE) /
         |                  CAST(pa.n_distinct AS DOUBLE), 6) END AS r_distinct,
         |  round(abs(pa."mean_v" - pb."mean_v"), 6) AS d_mean
         |FROM pa JOIN pb ON pb."column" = pa."column"
         |ORDER BY pa."column"""".stripMargin
    },

    // 6-rounded per-half means, doubled average ranks on exact |d|
    // decimals, exact tie cubes, one closing sqrt sequence
    "o70_wilcoxon" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    round(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |        THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) /
        |      CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |        THEN 1 ELSE 0 END) AS DOUBLE), 6) AS x,
        |    round(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |        THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) /
        |      CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |        THEN 1 ELSE 0 END) AS DOUBLE), 6) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT CAST(y AS DECIMAL(18,6)) - CAST(x AS DECIMAL(18,6)) AS d,
        |    abs(CAST(y AS DECIMAL(18,6)) - CAST(x AS DECIMAL(18,6))) AS ad
        |  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL
        |    AND CAST(y AS DECIMAL(18,6)) - CAST(x AS DECIMAL(18,6)) <> 0),
        |r AS (
        |  SELECT d, ad,
        |    CAST(rank() OVER (ORDER BY ad) AS BIGINT) AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY ad) AS BIGINT) AS t
        |  FROM d),
        |ties AS (
        |  SELECT CAST(coalesce(SUM(tt * tt * tt - tt), 0) AS BIGINT)
        |    AS tie3
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM d GROUP BY ad)),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(SUM(CASE WHEN d > 0 THEN 2 * minr + t - 1 ELSE 0 END)
        |      AS BIGINT) AS w2
        |  FROM r)
        |SELECT n_pairs, n_pos, n_neg,
        |  round(CAST(w2 AS DOUBLE) / 2.0e0, 6) AS w_plus,
        |  CASE WHEN n_pairs > 0 AND
        |      CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0e0) *
        |        (2.0e0 * CAST(n_pairs AS DOUBLE) + 1.0e0) / 24.0e0 -
        |        CAST(ties.tie3 AS DOUBLE) / 48.0e0 > 0
        |    THEN round((CAST(w2 AS DOUBLE) / 2.0e0 -
        |      CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0e0) /
        |        4.0e0) /
        |      sqrt(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) +
        |          1.0e0) *
        |        (2.0e0 * CAST(n_pairs AS DOUBLE) + 1.0e0) / 24.0e0 -
        |        CAST(ties.tie3 AS DOUBLE) / 48.0e0), 6)
        |  END AS z
        |FROM a CROSS JOIN ties""".stripMargin,

    // the q20 frame, exact confusion cells, decimal-product numerator,
    // two exact double products under sqrts
    "o71_mcc" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |m AS (SELECT MAX(dy) AS maxd FROM e),
        |k AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT)
        |      AS n_events,
        |    MAX(dy) AS last_day
        |  FROM e GROUP BY 1, 2),
        |c AS (
        |  SELECT (n_events <= 7) AS pred,
        |    (datediff('day', last_day, m.maxd) > 2) AS lbl
        |  FROM k CROSS JOIN m),
        |g AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN pred AND lbl THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(SUM(CASE WHEN pred AND NOT lbl THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN NOT pred AND NOT lbl THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn,
        |    CAST(SUM(CASE WHEN NOT pred AND lbl THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn
        |  FROM c)
        |SELECT tp, fp, tn, fn,
        |  CASE WHEN sqrt(CAST((tp + fp) AS DOUBLE) *
        |        CAST((tp + fn) AS DOUBLE)) *
        |      sqrt(CAST((tn + fp) AS DOUBLE) *
        |        CAST((tn + fn) AS DOUBLE)) > 0
        |    THEN round(CAST(CAST(tp AS DECIMAL(19,0)) *
        |        CAST(tn AS DECIMAL(19,0)) -
        |        CAST(fp AS DECIMAL(19,0)) * CAST(fn AS DECIMAL(19,0))
        |        AS DOUBLE) /
        |      (sqrt(CAST((tp + fp) AS DOUBLE) * CAST((tp + fn) AS DOUBLE)) *
        |       sqrt(CAST((tn + fp) AS DOUBLE) * CAST((tn + fn) AS DOUBLE))),
        |      6)
        |  END AS mcc,
        |  round(CAST(tp + tn AS DOUBLE) /
        |    CAST(tp + fp + tn + fn AS DOUBLE), 6) AS accuracy,
        |  CASE WHEN tp + fp > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END
        |    AS precision,
        |  CASE WHEN tp + fn > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END
        |    AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    round(CAST(2 * tp AS DOUBLE) /
        |      CAST(2 * tp + fp + fn AS DOUBLE), 6) END AS f1
        |FROM g""".stripMargin,

    // the sk2 register math per tag, the union as register-wise MAX,
    // the identical closing for all three estimates
    "sk13_hll_union" ->
      """WITH b AS (
        |  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END
        |      AS t,
        |    CAST(user_id AS VARCHAR) AS it
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND event_type IN ('click', 'purchase')),
        |h AS (
        |  SELECT t,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('hllu:' ||
        |          COALESCE(it, '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM b),
        |regs AS (
        |  SELECT t, hv % 64 AS register,
        |    MAX(CASE WHEN hv // 64 = 0 THEN 51
        |        ELSE 51 - length(bin(hv // 64)) END) AS mj
        |  FROM h GROUP BY 1, 2),
        |uni AS (SELECT 'u' AS t, register, MAX(mj) AS mj
        |        FROM regs GROUP BY 2),
        |allr AS (SELECT * FROM regs UNION ALL SELECT * FROM uni),
        |est AS (
        |  SELECT t, round(CASE
        |      WHEN v > 0 AND (0.709e0 * 4096.0e0 * 2251799813685248.0e0
        |        / s) <= 160.0e0
        |      THEN 64.0e0 * ln(64.0e0 / v)
        |      ELSE 0.709e0 * 4096.0e0 * 2251799813685248.0e0 / s END, 3)
        |      AS est
        |  FROM (
        |    SELECT t,
        |      CAST(s_present + (64 - n_regs) *
        |        CAST(2251799813685248 AS BIGINT) AS BIGINT) AS s,
        |      64 - n_regs AS v
        |    FROM (
        |      SELECT t, sum(CAST(pow(2.0e0, 51 - mj) AS BIGINT))
        |          AS s_present,
        |        count(*) AS n_regs
        |      FROM allr GROUP BY 1))),
        |ex AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS n_a_exact,
        |    CAST(SUM(ib) AS BIGINT) AS n_b_exact,
        |    CAST(COUNT(*) AS BIGINT) AS n_union_exact
        |  FROM (
        |    SELECT it, MAX(CASE WHEN t = 'a' THEN 1 ELSE 0 END) AS ia,
        |      MAX(CASE WHEN t = 'b' THEN 1 ELSE 0 END) AS ib
        |    FROM b GROUP BY 1))
        |SELECT 6 AS p, a.est AS est_a, bb.est AS est_b,
        |  u.est AS est_union, ex.n_a_exact, ex.n_b_exact, ex.n_union_exact
        |FROM est a, est bb, est u, ex
        |WHERE a.t = 'a' AND bb.t = 'b' AND u.t = 'u'""".stripMargin,

    // one fused conditional agg; exact DECIMAL(19,0) cell products, the
    // 6-rounded ln firewall, one IEEE sqrt/exp per bound
    "o87_odds" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 14)
        |      AS e,
        |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14) AS o
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(CAST(CAST(a AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
        |        AS DOUBLE) /
        |      CAST(CAST(b AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
        |        AS DOUBLE), 6) END AS odds_ratio,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(round(ln(
        |      CAST(CAST(a AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
        |        AS DOUBLE) /
        |      CAST(CAST(b AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
        |        AS DOUBLE)), 6) -
        |      1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE) +
        |        1.0e0 / CAST(b AS DOUBLE) + 1.0e0 / CAST(c AS DOUBLE) +
        |        1.0e0 / CAST(d AS DOUBLE))), 6) END AS ci_low,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(round(ln(
        |      CAST(CAST(a AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
        |        AS DOUBLE) /
        |      CAST(CAST(b AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
        |        AS DOUBLE)), 6) +
        |      1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE) +
        |        1.0e0 / CAST(b AS DOUBLE) + 1.0e0 / CAST(c AS DOUBLE) +
        |        1.0e0 / CAST(d AS DOUBLE))), 6) END AS ci_high
        |FROM g""".stripMargin,

    // same u/g CTEs as o87 (the shared heavyUserFrame); RR and Katz CI
    // through the 6-rounded ln firewall; Yule's Q through exact decimal
    // products (width-18 here so the add stays under DuckDB's 38 cap)
    "o89_riskratio" ->
      """WITH u AS (
        |  SELECT user_id,
        |    (SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 14)
        |      AS e,
        |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14) AS o
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  CASE WHEN a > 0 AND c > 0 THEN
        |    round(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) /
        |      (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)), 6)
        |  END AS risk_ratio,
        |  CASE WHEN a > 0 AND c > 0 THEN
        |    round(exp(round(ln(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) /
        |        (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))), 6) -
        |      1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE) -
        |        1.0e0 / CAST(a + b AS DOUBLE) + 1.0e0 / CAST(c AS DOUBLE) -
        |        1.0e0 / CAST(c + d AS DOUBLE))), 6) END AS ci_low,
        |  CASE WHEN a > 0 AND c > 0 THEN
        |    round(exp(round(ln(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) /
        |        (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))), 6) +
        |      1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE) -
        |        1.0e0 / CAST(a + b AS DOUBLE) + 1.0e0 / CAST(c AS DOUBLE) -
        |        1.0e0 / CAST(c + d AS DOUBLE))), 6) END AS ci_high,
        |  CASE WHEN CAST(a AS DECIMAL(18,0)) * CAST(d AS DECIMAL(18,0)) +
        |      CAST(b AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)) > 0 THEN
        |    round(CAST(CAST(a AS DECIMAL(18,0)) * CAST(d AS DECIMAL(18,0)) -
        |        CAST(b AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))
        |        AS DOUBLE) /
        |      CAST(CAST(a AS DECIMAL(18,0)) * CAST(d AS DECIMAL(18,0)) +
        |        CAST(b AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))
        |        AS DOUBLE), 6) END AS yule_q
        |FROM g""".stripMargin,

    // per-segment 2×2 cells, per-stratum ratio terms 9-rounded and
    // DECIMAL(28,9)-summed (double Σ is partition-order-dependent),
    // MH quotient and CMH χ² rounded at 6
    "o88_mh" ->
      """WITH oc AS (
        |  SELECT o_custkey, count(*) AS no FROM orders GROUP BY 1),
        |cu AS (
        |  SELECT c_mktsegment AS seg, c_acctbal > 5000.0e0 AS e,
        |    coalesce(no, 0) >= 10 AS y
        |  FROM customer LEFT JOIN oc ON oc.o_custkey = c_custkey),
        |cells AS (
        |  SELECT seg,
        |    CAST(SUM(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(SUM(CASE WHEN NOT e AND y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(SUM(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM cu GROUP BY 1),
        |t AS (
        |  SELECT a + b + c + d AS n,
        |    CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) /
        |      CAST(a + b + c + d AS DOUBLE), 9) AS DECIMAL(28,9)) AS r,
        |    CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) /
        |      CAST(a + b + c + d AS DOUBLE), 9) AS DECIMAL(28,9)) AS s,
        |    CASE WHEN a + b + c + d > 1 THEN
        |      CAST(round(CAST(a AS DOUBLE) -
        |        round(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) /
        |          CAST(a + b + c + d AS DOUBLE), 9), 9) AS DECIMAL(28,9))
        |    ELSE CAST(0 AS DECIMAL(28,9)) END AS ae,
        |    CASE WHEN a + b + c + d > 1 THEN
        |      CAST(round(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) *
        |        CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE) /
        |        (CAST(a + b + c + d AS DOUBLE) *
        |         CAST(a + b + c + d AS DOUBLE) *
        |         (CAST(a + b + c + d AS DOUBLE) - 1.0e0)), 9)
        |        AS DECIMAL(28,9))
        |    ELSE CAST(0 AS DECIMAL(28,9)) END AS v
        |  FROM cells)
        |SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |  CAST(SUM(n) AS BIGINT) AS n,
        |  CASE WHEN CAST(SUM(s) AS DOUBLE) > 0 THEN
        |    round(CAST(SUM(r) AS DOUBLE) / CAST(SUM(s) AS DOUBLE), 6)
        |  END AS mh_or,
        |  CASE WHEN CAST(SUM(v) AS DOUBLE) > 0 THEN
        |    round(CAST(SUM(ae) AS DOUBLE) * CAST(SUM(ae) AS DOUBLE) /
        |      CAST(SUM(v) AS DOUBLE), 6) END AS cmh
        |FROM t""".stripMargin,

    // the o82 day-paired CTEs; CCC/r/C_b from the same five exact
    // decimal moments, one fixed double closing sequence each
    "o90_ccc" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~view' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'signup~purchase' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'signup' AND b.event_type = 'purchase'),
        |m AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM wide GROUP BY 1),
        |u AS (
        |  SELECT pair, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS uxy,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS uxx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS uyy,
        |    (sx - sy) * (sx - sy) AS gap
        |  FROM m)
        |SELECT pair, n,
        |  CASE WHEN uxx > 0 AND uyy > 0 THEN
        |    round(uxy / sqrt(uxx * uyy), 6) END AS r,
        |  CASE WHEN uxx + uyy + gap > 0 THEN
        |    round(2.0e0 * uxy / (uxx + uyy + gap), 6) END AS ccc,
        |  CASE WHEN uxx > 0 AND uyy > 0 AND uxy <> 0 THEN
        |    round(2.0e0 * uxy / (uxx + uyy + gap) /
        |      (uxy / sqrt(uxx * uyy)), 6) END AS c_b
        |FROM u ORDER BY pair""".stripMargin,

    // same wide CTE; exact DECIMAL(18,6) differences, key-scalar limits
    // joined back for the inclusive within-limits count
    "o91_bland_altman" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~view' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'signup~purchase' AS pair, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'signup' AND b.event_type = 'purchase'),
        |pts AS (
        |  SELECT pair, CAST(CAST(x AS DECIMAL(18,6)) -
        |    CAST(y AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS d
        |  FROM wide),
        |m AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(d) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(d AS DECIMAL(19,6)) * CAST(d AS DECIMAL(19,6)))
        |      AS DOUBLE) AS s2
        |  FROM pts GROUP BY 1),
        |st AS (
        |  SELECT pair, n, s1 / CAST(n AS DOUBLE) AS mean,
        |    CASE WHEN n > 1 AND
        |        (CAST(n AS DOUBLE) * s2 - s1 * s1) /
        |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)) > 0 THEN
        |      sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1) /
        |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)))
        |    END AS sd
        |  FROM m),
        |st2 AS (
        |  SELECT pair, n, mean, sd,
        |    mean - 1.96e0 * sd AS lo, mean + 1.96e0 * sd AS hi
        |  FROM st),
        |w AS (
        |  SELECT p.pair,
        |    CAST(SUM(CASE WHEN s.lo IS NOT NULL AND
        |      CAST(p.d AS DOUBLE) >= s.lo AND CAST(p.d AS DOUBLE) <= s.hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS win
        |  FROM pts p JOIN st2 s ON s.pair = p.pair GROUP BY 1)
        |SELECT s.pair, s.n, round(s.mean, 6) AS mean_diff,
        |  round(s.sd, 6) AS sd_diff, round(s.lo, 6) AS loa_low,
        |  round(s.hi, 6) AS loa_high,
        |  CASE WHEN s.sd IS NOT NULL THEN
        |    round(CAST(w.win AS DOUBLE) / CAST(s.n AS DOUBLE), 6)
        |  END AS within_share
        |FROM st2 s JOIN w ON w.pair = s.pair
        |ORDER BY s.pair""".stripMargin,

    // exact decimal totals joined back; share squares 9-rounded through
    // DECIMAL(28,9); CR4 a ratio of exact decimals
    "o100_hhi" ->
      """WITH rev AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS rev
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT p_brand AS brand, p_partkey AS pk,
        |    CAST(rev AS DECIMAL(18,6)) AS v
        |  FROM part JOIN rev ON l_partkey = p_partkey
        |  WHERE rev > 0),
        |tot AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |    SUM(v) AS t
        |  FROM j GROUP BY 1),
        |hhi AS (
        |  SELECT j.brand, CAST(SUM(CAST(round(
        |    (CAST(v AS DOUBLE) / CAST(t AS DOUBLE)) *
        |    (CAST(v AS DOUBLE) / CAST(t AS DOUBLE)), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) AS h
        |  FROM j JOIN tot ON tot.brand = j.brand GROUP BY 1),
        |rk AS (
        |  SELECT brand, v, row_number() OVER (PARTITION BY brand
        |    ORDER BY v DESC, pk) AS rn
        |  FROM j),
        |cr AS (SELECT brand, SUM(v) AS top4 FROM rk WHERE rn <= 4
        |  GROUP BY 1)
        |SELECT t.brand, t.n_entities, CAST(t.t AS DOUBLE) AS total,
        |  round(h.h, 6) AS hhi,
        |  round(CAST(c.top4 AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS cr4
        |FROM tot t JOIN hhi h ON h.brand = t.brand
        |JOIN cr c ON c.brand = t.brand
        |ORDER BY t.brand""".stripMargin,

    // ln terms 6-rounded through DECIMAL(28,6) (the o33/q11 firewall),
    // Hoover terms 9-rounded, one runtime exp per key
    "o101_atkinson" ->
      """WITH spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS spend
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT c_mktsegment AS segment, CAST(spend AS DECIMAL(18,6))
        |    AS v
        |  FROM customer JOIN spend ON o_custkey = c_custkey
        |  WHERE spend > 0),
        |tot AS (
        |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS t
        |  FROM j GROUP BY 1),
        |terms AS (
        |  SELECT j.segment,
        |    CAST(SUM(CAST(round(ln(CAST(v AS DOUBLE)), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS sl,
        |    CAST(SUM(CAST(round(abs(CAST(v AS DOUBLE) /
        |      CAST(t AS DOUBLE) - 1.0e0 / CAST(n AS DOUBLE)), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS sh
        |  FROM j JOIN tot ON tot.segment = j.segment GROUP BY 1)
        |SELECT t.segment, t.n, CAST(t.t AS DOUBLE) AS total,
        |  round(CAST(t.t AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS mean,
        |  CASE WHEN t.n > 0 THEN
        |    round(1.0e0 - exp(s.sl / CAST(t.n AS DOUBLE)) /
        |      (CAST(t.t AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
        |  END AS atkinson,
        |  round(0.5e0 * s.sh, 6) AS hoover
        |FROM tot t JOIN terms s ON s.segment = t.segment
        |ORDER BY t.segment""".stripMargin,

    // the o83 pooled-ACF CTEs at h=3 + the Durbin–Levinson closing on
    // the 6-rounded rhos; order-3 branch nested in the order-2 guard
    "o103_pacf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |mn AS (
        |  SELECT event_type,
        |    CAST(round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS mean
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT daily.event_type AS k, day,
        |    CAST((CAST(v AS DECIMAL(18,6)) - mean) * 1000000 AS BIGINT)
        |      AS dm
        |  FROM daily JOIN mn ON mn.event_type = daily.event_type),
        |l AS (
        |  SELECT k, dm, lag(dm, 1) OVER w AS l1, lag(dm, 2) OVER w AS l2,
        |    lag(dm, 3) OVER w AS l3
        |  FROM d WINDOW w AS (PARTITION BY k ORDER BY day)),
        |s AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dm * dm) AS BIGINT) AS den,
        |    CAST(SUM(CASE WHEN l1 IS NOT NULL THEN dm * l1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN l2 IS NOT NULL THEN dm * l2 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN l3 IS NOT NULL THEN dm * l3 ELSE 0 END)
        |      AS BIGINT) AS n3
        |  FROM l GROUP BY 1),
        |r AS (
        |  SELECT k, n,
        |    round(CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r1,
        |    round(CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r2,
        |    round(CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r3
        |  FROM s WHERE den > 0),
        |p2 AS (
        |  SELECT k, n, r1, r2, r3,
        |    CASE WHEN 1.0e0 - r1 * r1 <> 0 THEN
        |      (r2 - r1 * r1) / (1.0e0 - r1 * r1) END AS phi22
        |  FROM r),
        |p3 AS (SELECT *, r1 - phi22 * r1 AS phi21 FROM p2),
        |p4 AS (SELECT *, 1.0e0 - phi21 * r1 - phi22 * r2 AS den3 FROM p3)
        |SELECT k AS event_type, n, r1 AS rho1, r2 AS rho2, r3 AS rho3,
        |  CASE WHEN n > 2 THEN r1 END AS pacf1,
        |  CASE WHEN n > 3 AND phi22 IS NOT NULL THEN round(phi22, 6)
        |    END AS pacf2,
        |  CASE WHEN phi22 IS NOT NULL AND n > 4 AND den3 <> 0 THEN
        |    round((r3 - phi21 * r2 - phi22 * r1) / den3, 6)
        |  END AS pacf3
        |FROM p4 ORDER BY event_type""".stripMargin,

    // per-(type, regime) o11 moments; pooled moments are the exact
    // decimal sums of the regime sums; SSEs and F are fixed double
    // closings rounded at 6
    "o96_chow" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |pts AS (
        |  SELECT event_type,
        |    CAST(day - DATE '2024-01-01' AS BIGINT) AS di, v,
        |    day >= DATE '2024-01-16' AS late
        |  FROM daily),
        |m AS (
        |  SELECT event_type, late, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(di AS DECIMAL(18,6))) AS sx,
        |    SUM(CAST(v AS DECIMAL(18,6))) AS sy,
        |    SUM(CAST(di AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6)))
        |      AS sxy,
        |    SUM(CAST(di AS DECIMAL(19,6)) * CAST(di AS DECIMAL(19,6)))
        |      AS sxx,
        |    SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6)))
        |      AS syy
        |  FROM pts GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |     CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) -
        |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) /
        |    CAST(n AS DOUBLE) END AS sse
        |  FROM m),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n) AS BIGINT) AS n,
        |    MAX(CASE WHEN NOT late THEN n END) AS n_a,
        |    MAX(CASE WHEN late THEN n END) AS n_b,
        |    MAX(CASE WHEN NOT late THEN sse END) AS sse1,
        |    MAX(CASE WHEN late THEN sse END) AS sse2,
        |    SUM(sx) AS psx, SUM(sy) AS psy, SUM(sxy) AS psxy,
        |    SUM(sxx) AS psxx, SUM(syy) AS psyy
        |  FROM r GROUP BY 1),
        |p AS (
        |  SELECT *, CASE WHEN CAST(n AS DOUBLE) * CAST(psxx AS DOUBLE) -
        |      CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(psyy AS DOUBLE) -
        |     CAST(psy AS DOUBLE) * CAST(psy AS DOUBLE) -
        |     (CAST(n AS DOUBLE) * CAST(psxy AS DOUBLE) -
        |      CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)) *
        |     (CAST(n AS DOUBLE) * CAST(psxy AS DOUBLE) -
        |      CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)) /
        |     (CAST(n AS DOUBLE) * CAST(psxx AS DOUBLE) -
        |      CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE))) /
        |    CAST(n AS DOUBLE) END AS ssep
        |  FROM a)
        |SELECT event_type, n, n_a, n_b,
        |  CASE WHEN k = 2 AND n > 4 AND sse1 IS NOT NULL AND
        |      sse2 IS NOT NULL AND ssep IS NOT NULL AND sse1 + sse2 > 0
        |    THEN round(ssep, 6) END AS sse_pooled,
        |  CASE WHEN k = 2 AND n > 4 AND sse1 IS NOT NULL AND
        |      sse2 IS NOT NULL AND ssep IS NOT NULL AND sse1 + sse2 > 0
        |    THEN round(sse1, 6) END AS sse_a,
        |  CASE WHEN k = 2 AND n > 4 AND sse1 IS NOT NULL AND
        |      sse2 IS NOT NULL AND ssep IS NOT NULL AND sse1 + sse2 > 0
        |    THEN round(sse2, 6) END AS sse_b,
        |  CASE WHEN k = 2 AND n > 4 AND sse1 IS NOT NULL AND
        |      sse2 IS NOT NULL AND ssep IS NOT NULL AND sse1 + sse2 > 0
        |    THEN round((ssep - (sse1 + sse2)) / 2.0e0 /
        |      ((sse1 + sse2) / (CAST(n AS DOUBLE) - 4.0e0)), 6)
        |  END AS chow_f
        |FROM p ORDER BY event_type""".stripMargin,

    // the o11 fit replayed per pair, squared residuals 6-rounded into
    // exact DECIMAL(18,6), then a second o11 fit on (x, e²); LM = n·r²
    "o97_bp" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~view' AS pair, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'signup~purchase' AS pair, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'signup' AND b.event_type = 'purchase'),
        |s AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
        |  FROM wide GROUP BY 1),
        |f AS (
        |  SELECT pair, n, sx, sy,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den
        |  FROM s),
        |fit AS (
        |  SELECT pair,
        |    CASE WHEN den > 0 THEN round(num / den, 6) END AS b1,
        |    CASE WHEN den > 0 THEN
        |      round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |    END AS b0
        |  FROM f),
        |pts AS (
        |  SELECT w.pair, CAST(w.x AS DECIMAL(18,6)) AS dx,
        |    CAST(round((w.y - (b0 + b1 * w.x)) *
        |      (w.y - (b0 + b1 * w.x)), 6) AS DECIMAL(18,6)) AS e2
        |  FROM wide w JOIN fit ON fit.pair = w.pair
        |  WHERE b1 IS NOT NULL),
        |s2 AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dx) AS DOUBLE) AS sx2,
        |    CAST(SUM(e2) AS DOUBLE) AS sy2,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,6)) *
        |             CAST(e2 AS DECIMAL(19,6))) AS DOUBLE) AS sxy2,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,6)) *
        |             CAST(dx AS DECIMAL(19,6))) AS DOUBLE) AS sxx2,
        |    CAST(SUM(CAST(e2 AS DECIMAL(19,6)) *
        |             CAST(e2 AS DECIMAL(19,6))) AS DOUBLE) AS syy2
        |  FROM pts GROUP BY 1),
        |f2 AS (
        |  SELECT pair, n,
        |    CAST(n AS DOUBLE) * sxy2 - sx2 * sy2 AS num2,
        |    CAST(n AS DOUBLE) * sxx2 - sx2 * sx2 AS den2,
        |    CAST(n AS DOUBLE) * syy2 - sy2 * sy2 AS deny2
        |  FROM s2),
        |aux AS (
        |  SELECT pair, n,
        |    CASE WHEN den2 > 0 AND deny2 > 0 THEN
        |      round(num2 * num2 / (den2 * deny2), 6) END AS r2_aux
        |  FROM f2)
        |SELECT a.pair, a.n, fit.b1 AS slope, fit.b0 AS intercept,
        |  a.r2_aux,
        |  CASE WHEN a.r2_aux IS NOT NULL THEN
        |    round(CAST(a.n AS DOUBLE) * a.r2_aux, 6) END AS lm
        |FROM aux a JOIN fit ON fit.pair = a.pair
        |ORDER BY a.pair""".stripMargin,

    // the o11 fit + leverage/Cook chain; SSE sums 9-rounded e² through
    // DECIMAL(28,9); top-5 by 6-rounded D with day tiebreak, ranked
    // inside each pair (partitioned window)
    "o98_influence" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~view' AS pair, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  UNION ALL
        |  SELECT 'signup~purchase' AS pair, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'signup' AND b.event_type = 'purchase'),
        |s AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
        |  FROM wide GROUP BY 1),
        |f AS (
        |  SELECT pair, n, sx, sy, sxx,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den
        |  FROM s),
        |fit AS (
        |  SELECT pair, n, sx AS msx, sxx AS msxx,
        |    CASE WHEN den > 0 THEN round(num / den, 6) END AS b1,
        |    CASE WHEN den > 0 THEN
        |      round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |    END AS b0
        |  FROM f),
        |base AS (
        |  SELECT w.pair, w.day, w.x, w.y, f.n, f.b1, f.b0, f.msx, f.msxx
        |  FROM wide w JOIN fit f ON f.pair = w.pair
        |  WHERE f.b1 IS NOT NULL AND f.n > 2),
        |sse AS (
        |  SELECT pair, CAST(SUM(CAST(round(
        |    (y - (b0 + b1 * x)) * (y - (b0 + b1 * x)), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) AS sse
        |  FROM base GROUP BY 1),
        |pts AS (
        |  SELECT b.pair, b.day, b.x, b.y,
        |    1.0e0 / CAST(n AS DOUBLE) +
        |      (b.x - msx / CAST(n AS DOUBLE)) *
        |      (b.x - msx / CAST(n AS DOUBLE)) /
        |      (msxx - msx * msx / CAST(n AS DOUBLE)) AS h,
        |    b.y - (b0 + b1 * b.x) AS e,
        |    s.sse / (CAST(n AS DOUBLE) - 2.0e0) AS s2
        |  FROM base b JOIN sse s ON s.pair = b.pair),
        |d AS (
        |  SELECT pair, day, x, y, h, e,
        |    CASE WHEN s2 > 0 AND h < 1.0e0 THEN
        |      e * e * h / (2.0e0 * s2 * (1.0e0 - h) * (1.0e0 - h))
        |    END AS dd
        |  FROM pts),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY pair
        |    ORDER BY round(dd, 6) DESC NULLS LAST, day) AS rnk
        |  FROM d)
        |SELECT pair, day, x, y, round(h, 6) AS leverage,
        |  round(e, 6) AS resid, round(dd, 6) AS cooks_d,
        |  CAST(rnk AS INTEGER) AS rnk
        |FROM rk WHERE rnk <= 5 ORDER BY pair, rnk""".stripMargin,

    // two calendar self-joins score the SAME day set; exact decimal
    // error sums, sMAPE ratios 9-rounded through DECIMAL(28,9)
    "o99_forecast_skill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |j AS (
        |  SELECT d.event_type, d.v, f.v AS fv, p.v AS pv
        |  FROM daily d
        |  JOIN daily f ON f.event_type = d.event_type
        |    AND f.day = d.day - 7
        |  JOIN daily p ON p.event_type = d.event_type
        |    AND p.day = d.day - 1),
        |t AS (
        |  SELECT event_type, v, fv,
        |    CAST(CAST(v AS DECIMAL(18,6)) - CAST(fv AS DECIMAL(18,6))
        |      AS DECIMAL(18,6)) AS d,
        |    CAST(CAST(v AS DECIMAL(18,6)) - CAST(pv AS DECIMAL(18,6))
        |      AS DECIMAL(18,6)) AS d1
        |  FROM j),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(abs(d)) AS DOUBLE) AS sad,
        |    CAST(SUM(CAST(d AS DECIMAL(19,6)) * CAST(d AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sd2,
        |    CAST(SUM(abs(d1)) AS DOUBLE) AS sad1,
        |    CAST(SUM(CASE WHEN abs(v) + abs(fv) <> 0 THEN
        |      CAST(round(2.0e0 * abs(CAST(d AS DOUBLE)) /
        |        (abs(v) + abs(fv)), 9) AS DECIMAL(28,9)) END) AS DOUBLE)
        |      AS ssm,
        |    CAST(COUNT(CASE WHEN abs(v) + abs(fv) <> 0 THEN 1 END)
        |      AS BIGINT) AS nsm
        |  FROM t GROUP BY 1)
        |SELECT event_type, n,
        |  round(sad / CAST(n AS DOUBLE), 6) AS mae,
        |  round(sqrt(sd2 / CAST(n AS DOUBLE)), 6) AS rmse,
        |  CASE WHEN nsm > 0 THEN round(ssm / CAST(nsm AS DOUBLE), 6)
        |    END AS smape,
        |  CASE WHEN sad1 > 0 THEN round(sad / CAST(n AS DOUBLE) /
        |    (sad1 / CAST(n AS DOUBLE)), 6) END AS mase
        |FROM a ORDER BY event_type""".stripMargin,

    // exact order-statistic median from a domain-sized cumulative scan;
    // per-group χ² terms 9-rounded and DECIMAL(28,9)-summed
    "o92_mood" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS DECIMAL(18,6)) AS v
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
        |cum AS (
        |  SELECT v, CAST(SUM(COUNT(*)) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM b GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM b),
        |med AS (
        |  SELECT min(v) AS med FROM cum CROSS JOIN tot
        |  WHERE cum >= CAST(floor(CAST(nn + 1 AS DOUBLE) / 2.0e0)
        |    AS BIGINT)),
        |cells AS (
        |  SELECT g,
        |    CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(COUNT(*) AS BIGINT) AS ng, max(med) AS med2
        |  FROM b CROSS JOIN med GROUP BY 1),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS above,
        |    max(med2) AS med3 FROM cells),
        |chi AS (
        |  SELECT CAST(SUM(CASE WHEN above > 0 AND above < n THEN
        |    CAST(round(
        |    (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(above AS DOUBLE)
        |      / CAST(n AS DOUBLE)) *
        |    (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(above AS DOUBLE)
        |      / CAST(n AS DOUBLE)) /
        |    (CAST(ng AS DOUBLE) * CAST(above AS DOUBLE) /
        |      CAST(n AS DOUBLE)) +
        |    (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) *
        |      CAST(n - above AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) *
        |      CAST(n - above AS DOUBLE) / CAST(n AS DOUBLE)) /
        |    (CAST(ng AS DOUBLE) * CAST(n - above AS DOUBLE) /
        |      CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9))
        |    ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE) AS chiv
        |  FROM cells CROSS JOIN t)
        |SELECT k_groups, n, CAST(med3 AS DOUBLE) AS grand_median, above,
        |  CASE WHEN above > 0 AND above < n AND k_groups > 1 THEN
        |    round(chiv, 6) END AS chi2,
        |  CAST(k_groups - 1 AS BIGINT) AS dof
        |FROM t CROSS JOIN chi""".stripMargin,

    // group variances from exact (18,6)² moments; every ln runs on a
    // 6-rounded operand and is 6-rounded (the o33/q11 firewall); the
    // three k-term sums 9-rounded through DECIMAL(28,9)
    "o93_bartlett" ->
      """WITH b AS (
        |  SELECT event_type AS g, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |g AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sg,
        |    CAST(SUM(CAST(v AS DECIMAL(19,6)) *
        |             CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS qg
        |  FROM b GROUP BY 1),
        |g2 AS (
        |  SELECT ng,
        |    CASE WHEN ng > 1 THEN
        |      round((CAST(ng AS DOUBLE) * qg - sg * sg) /
        |        (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0e0)), 6)
        |    END AS s6
        |  FROM g),
        |g3 AS (
        |  SELECT ng, s6,
        |    CASE WHEN s6 > 0 THEN round(ln(s6), 6) END AS l6
        |  FROM g2),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    min(ng) AS minn, min(s6) AS mins,
        |    CAST(SUM(CAST(round((CAST(ng AS DOUBLE) - 1.0e0) * s6, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS spnum,
        |    CAST(SUM(CAST(round((CAST(ng AS DOUBLE) - 1.0e0) * l6, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS lsum,
        |    CAST(SUM(CASE WHEN ng > 1 THEN
        |      CAST(round(1.0e0 / (CAST(ng AS DOUBLE) - 1.0e0), 9)
        |      AS DECIMAL(28,9)) END) AS DOUBLE) AS csum
        |  FROM g3)
        |SELECT k_groups, n,
        |  CASE WHEN k_groups > 1 AND minn > 1 AND mins > 0 THEN
        |    round(spnum / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE)),
        |      6) END AS pooled_var,
        |  CASE WHEN k_groups > 1 AND minn > 1 AND mins > 0 THEN
        |    round(1.0e0 + (csum - 1.0e0 /
        |      (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))) /
        |      (3.0e0 * (CAST(k_groups AS DOUBLE) - 1.0e0)), 6)
        |  END AS c,
        |  CASE WHEN k_groups > 1 AND minn > 1 AND mins > 0 THEN
        |    round(((CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE)) *
        |      round(ln(spnum /
        |        (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))), 6) -
        |      lsum) /
        |      (1.0e0 + (csum - 1.0e0 /
        |        (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))) /
        |        (3.0e0 * (CAST(k_groups AS DOUBLE) - 1.0e0))), 6)
        |  END AS t_stat,
        |  CAST(k_groups - 1 AS BIGINT) AS dof
        |FROM t""".stripMargin,

    // the o57 moment CTEs + Σn² — ICC(1,1) from the same ssb/ssw with
    // the unbalanced k₀ correction, all closing doubles rounded at 6
    "o94_icc" ->
      """WITH b AS (
        |  SELECT user_id AS k, value AS v FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |g AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS ng,
        |    SUM(CAST(v AS DECIMAL(18,6))) AS sg,
        |    SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))) AS qg
        |  FROM b GROUP BY 1),
        |g2 AS (
        |  SELECT *, CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
        |    CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6)) AS tg FROM g),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    SUM(sg) AS s, SUM(qg) AS q, SUM(tg) AS bsum,
        |    SUM(CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0)))
        |      AS ng2
        |  FROM g2),
        |o AS (
        |  SELECT k_groups, n, ng2,
        |    round(CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) *
        |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ssb,
        |    CAST(round(CAST(q AS DECIMAL(30,12)) -
        |      CAST(bsum AS DECIMAL(24,6)), 6) AS DOUBLE) AS ssw
        |  FROM t),
        |o2 AS (
        |  SELECT k_groups, n, ssw,
        |    ssb / (CAST(k_groups AS DOUBLE) - 1.0e0) AS msb,
        |    ssw / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE)) AS msw,
        |    (CAST(n AS DOUBLE) - CAST(ng2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(k_groups AS DOUBLE) - 1.0e0) AS k0
        |  FROM o)
        |SELECT k_groups, n,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 AND
        |      msb + (k0 - 1.0e0) * msw > 0 THEN round(msb, 6)
        |  END AS msb,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 AND
        |      msb + (k0 - 1.0e0) * msw > 0 THEN round(msw, 6)
        |  END AS msw,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 AND
        |      msb + (k0 - 1.0e0) * msw > 0 THEN round(k0, 6)
        |  END AS k0,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 AND
        |      msb + (k0 - 1.0e0) * msw > 0 THEN
        |    round((msb - msw) / (msb + (k0 - 1.0e0) * msw), 6)
        |  END AS icc
        |FROM o2""".stripMargin,

    // the o72 rank CTEs + a j·R' closing over the named order; the z
    // closing one fixed double sequence with one sqrt
    "o105_page" ->
      """WITH b AS (
        |  SELECT user_id AS bk, event_type AS t, value AS v FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL
        |    AND event_type IN ('click', 'error', 'purchase', 'signup',
        |      'view')),
        |cells AS (
        |  SELECT bk, t,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS m
        |  FROM b GROUP BY 1, 2),
        |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells),
        |wb AS (SELECT *, COUNT(*) OVER (PARTITION BY bk) AS bn FROM cells),
        |comp AS (SELECT wb.* FROM wb CROSS JOIN k WHERE bn = k.k),
        |r AS (
        |  SELECT bk, t,
        |    CAST(rank() OVER (PARTITION BY bk ORDER BY m) AS BIGINT)
        |      AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY bk, m) AS BIGINT) AS tt
        |  FROM comp),
        |pt AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(2 * minr + tt - 1) AS BIGINT) AS r2
        |  FROM r GROUP BY 1),
        |cl AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
        |    CAST(MAX((SELECT k FROM k)) AS BIGINT) AS k_treatments,
        |    SUM(CAST(CASE t WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |        WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
        |        WHEN 'view' THEN 5 END AS DECIMAL(19,0)) *
        |      CAST(r2 AS DECIMAL(19,0))) AS l2
        |  FROM pt)
        |SELECT n_blocks, k_treatments,
        |  CASE WHEN n_blocks > 0 THEN
        |    round(CAST(l2 AS DOUBLE) / 2.0e0, 6) END AS l,
        |  CASE WHEN n_blocks > 0 AND k_treatments = 5 THEN
        |    round((CAST(l2 AS DOUBLE) / 2.0e0 -
        |      CAST(n_blocks AS DOUBLE) * CAST(k_treatments AS DOUBLE) *
        |      (CAST(k_treatments AS DOUBLE) + 1.0e0) *
        |      (CAST(k_treatments AS DOUBLE) + 1.0e0) / 4.0e0) /
        |      sqrt(CAST(n_blocks AS DOUBLE) *
        |        CAST(k_treatments AS DOUBLE) *
        |        CAST(k_treatments AS DOUBLE) *
        |        (CAST(k_treatments AS DOUBLE) + 1.0e0) *
        |        (CAST(k_treatments AS DOUBLE) *
        |         CAST(k_treatments AS DOUBLE) - 1.0e0) / 144.0e0), 6)
        |  END AS z
        |FROM cl""".stripMargin,

    // the o72 rank CTEs + a (block, value) tie agg; W from exact
    // decimal-widened deviation squares, one closing quotient
    "o95_kendallw" ->
      """WITH b AS (
        |  SELECT user_id AS bk, event_type AS t, value AS v FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL),
        |cells AS (
        |  SELECT bk, t,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS m
        |  FROM b GROUP BY 1, 2),
        |k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells),
        |wb AS (SELECT *, COUNT(*) OVER (PARTITION BY bk) AS bn FROM cells),
        |comp AS (SELECT wb.* FROM wb CROSS JOIN k WHERE bn = k.k),
        |r AS (
        |  SELECT bk, t,
        |    CAST(rank() OVER (PARTITION BY bk ORDER BY m) AS BIGINT)
        |      AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY bk, m) AS BIGINT) AS tt
        |  FROM comp),
        |pt AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(2 * minr + tt - 1) AS BIGINT) AS r2
        |  FROM r GROUP BY 1),
        |ties AS (
        |  SELECT bk, m, CAST(COUNT(*) AS BIGINT) AS tc
        |  FROM comp GROUP BY 1, 2),
        |tsum AS (
        |  SELECT coalesce(CAST(SUM(tc * tc * tc - tc) AS BIGINT),
        |    CAST(0 AS BIGINT)) AS tie_sum FROM ties),
        |cl AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
        |    CAST(MAX((SELECT k FROM k)) AS BIGINT) AS k_treatments,
        |    SUM(CAST(r2 - n * ((SELECT k FROM k) + 1) AS DECIMAL(19,0)) *
        |        CAST(r2 - n * ((SELECT k FROM k) + 1) AS DECIMAL(19,0)))
        |      AS s4
        |  FROM pt)
        |SELECT n_blocks, k_treatments, tie_sum,
        |  CASE WHEN n_blocks > 0 AND k_treatments > 1 AND
        |      CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) *
        |      (CAST(k_treatments AS DOUBLE) * CAST(k_treatments AS DOUBLE)
        |        * CAST(k_treatments AS DOUBLE) -
        |        CAST(k_treatments AS DOUBLE)) -
        |      CAST(n_blocks AS DOUBLE) * CAST(tie_sum AS DOUBLE) > 0 THEN
        |    round(3.0e0 * CAST(s4 AS DOUBLE) /
        |      (CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) *
        |      (CAST(k_treatments AS DOUBLE) * CAST(k_treatments AS DOUBLE)
        |        * CAST(k_treatments AS DOUBLE) -
        |        CAST(k_treatments AS DOUBLE)) -
        |      CAST(n_blocks AS DOUBLE) * CAST(tie_sum AS DOUBLE)), 6)
        |  END AS w
        |FROM cl CROSS JOIN tsum""".stripMargin,

    // two direction branches over one day-paired frame, the o11-style
    // nine-moment agg, closed-form two-regressor SSEs, one F closing
    // the o11 olsFit chain on the pair levels, residuals 6-rounded with
    // the FIT'S rounded α/β, then the o114 ADF chain partitioned by
    // series at the EG critical −3.34
    "o117_coint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~purchase' AS series, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'view~signup' AS series, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'view' AND b.event_type = 'signup'),
        |m AS (
        |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
        |      AS DOUBLE) AS sxx
        |  FROM wide WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1),
        |fit AS (
        |  SELECT series,
        |    CASE WHEN den > 0 THEN round(num / den, 6) END AS beta,
        |    CASE WHEN den > 0 THEN
        |      round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |    END AS alpha
        |  FROM (SELECT series, n, sx, sy,
        |          CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |          CAST(n AS DOUBLE) * sxx - sx * sx AS den FROM m)),
        |res AS (
        |  SELECT wide.series, wide.day,
        |    round(wide.y - (fit.alpha + fit.beta * wide.x), 6) AS r
        |  FROM wide JOIN fit ON fit.series = wide.series
        |  WHERE wide.x IS NOT NULL AND wide.y IS NOT NULL
        |    AND fit.beta IS NOT NULL AND fit.alpha IS NOT NULL),
        |l AS (
        |  SELECT series, CAST(r AS DECIMAL(18,6)) AS cv,
        |    CAST(lag(r) OVER (PARTITION BY series ORDER BY day)
        |      AS DECIMAL(18,6)) AS pv
        |  FROM res),
        |b AS (
        |  SELECT series, pv AS x, CAST(cv - pv AS DECIMAL(18,6)) AS y
        |  FROM l WHERE pv IS NOT NULL),
        |s AS (
        |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM b GROUP BY 1),
        |c AS (
        |  SELECT series, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny
        |  FROM s),
        |f AS (
        |  SELECT series, n, den, num / den AS slope,
        |    (deny - (num / den) * num) /
        |      ((CAST(n AS DOUBLE) - 2.0e0) * den) AS se2
        |  FROM c),
        |adf AS (
        |  SELECT series, n,
        |    CASE WHEN n > 2 AND den > 0 AND se2 > 0
        |      THEN round(slope / sqrt(se2), 6) END AS df_stat,
        |    CASE WHEN n > 2 AND den > 0 AND se2 > 0 THEN
        |      CASE WHEN round(slope / sqrt(se2), 6) < -3.34e0
        |        THEN 'cointegrated' ELSE 'no_cointegration' END
        |    END AS verdict
        |  FROM f)
        |SELECT adf.series, adf.n, fit.beta, fit.alpha, adf.df_stat,
        |  adf.verdict
        |FROM adf JOIN fit ON fit.series = adf.series
        |ORDER BY adf.series""".stripMargin,

    "o86_granger" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wide AS (
        |  SELECT 'click~purchase' AS series, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'view~signup' AS series, a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON b.day = a.day
        |  WHERE a.event_type = 'view' AND b.event_type = 'signup'),
        |d1 AS (
        |  SELECT series, 'x->y' AS direction, y AS yy, lag(y) OVER w AS u,
        |    lag(x) OVER w AS v
        |  FROM wide WINDOW w AS (PARTITION BY series ORDER BY day)),
        |d2 AS (
        |  SELECT series, 'y->x' AS direction, x AS yy, lag(x) OVER w AS u,
        |    lag(y) OVER w AS v
        |  FROM wide WINDOW w AS (PARTITION BY series ORDER BY day)),
        |flt AS (
        |  SELECT * FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |  WHERE u IS NOT NULL AND v IS NOT NULL),
        |m AS (
        |  SELECT series, direction, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(yy AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(u AS DECIMAL(18,6))) AS DOUBLE) AS su,
        |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(yy AS DECIMAL(19,6)) *
        |             CAST(yy AS DECIMAL(19,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(u AS DECIMAL(19,6)) *
        |             CAST(u AS DECIMAL(19,6))) AS DOUBLE) AS suu,
        |    CAST(SUM(CAST(v AS DECIMAL(19,6)) *
        |             CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS svv,
        |    CAST(SUM(CAST(u AS DECIMAL(19,6)) *
        |             CAST(yy AS DECIMAL(19,6))) AS DOUBLE) AS suy,
        |    CAST(SUM(CAST(v AS DECIMAL(19,6)) *
        |             CAST(yy AS DECIMAL(19,6))) AS DOUBLE) AS svy,
        |    CAST(SUM(CAST(u AS DECIMAL(19,6)) *
        |             CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS suv
        |  FROM flt GROUP BY 1, 2),
        |uu AS (
        |  SELECT series, direction, n,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS uyy,
        |    CAST(n AS DOUBLE) * suu - su * su AS uuu,
        |    CAST(n AS DOUBLE) * svv - sv * sv AS uvv,
        |    CAST(n AS DOUBLE) * suy - su * sy AS uuy,
        |    CAST(n AS DOUBLE) * svy - sv * sy AS uvy,
        |    CAST(n AS DOUBLE) * suv - su * sv AS uuv
        |  FROM m),
        |cl AS (
        |  SELECT series, direction, n, uyy, uuu,
        |    uuu * uvv - uuv * uuv AS det,
        |    (uvv * uuy - uuv * uvy) / (uuu * uvv - uuv * uuv) AS b,
        |    (uuu * uvy - uuv * uuy) / (uuu * uvv - uuv * uuv) AS c,
        |    uuy, uvy
        |  FROM uu)
        |SELECT series, direction, n,
        |  CASE WHEN n > 3 AND uuu > 0 AND det > 0 AND uyy > 0
        |        AND uyy - b * uuy - c * uvy > 0 THEN
        |    round(((uyy - uuy * uuy / uuu) - (uyy - b * uuy - c * uvy)) *
        |      (CAST(n AS DOUBLE) - 3.0e0) /
        |      (uyy - b * uuy - c * uvy), 6) END AS f_stat,
        |  CASE WHEN n > 3 AND uuu > 0 AND det > 0 AND uyy > 0
        |        AND uyy - b * uuy - c * uvy > 0 THEN
        |    round(1.0e0 - (uyy - uuy * uuy / uuu) / uyy, 6)
        |  END AS r2_restricted,
        |  CASE WHEN n > 3 AND uuu > 0 AND det > 0 AND uyy > 0
        |        AND uyy - b * uuy - c * uvy > 0 THEN
        |    round(1.0e0 - (uyy - b * uuy - c * uvy) / uyy, 6)
        |  END AS r2_unrestricted
        |FROM cl ORDER BY series, direction""".stripMargin,

    // the q29 shipping windows on the dq11 densified spine; completions
    // release the next day (lag over the dense spine), cumulative sums
    // exact BIGINT
    "q21_wip_series" ->
      """WITH j AS (
        |  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS a,
        |    max(CAST(l_shipdate AS DATE)) AS c
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
        |arr AS (SELECT a AS day, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM j GROUP BY 1),
        |cmp AS (SELECT c AS day, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM j GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
        |    AS DATE) AS day
        |  FROM (SELECT MIN(a) AS mn, MAX(c) AS mx FROM j)),
        |s AS (
        |  SELECT spine.day, coalesce(arr.n, 0) AS arrivals,
        |    coalesce(cmp.n, 0) AS completions
        |  FROM spine LEFT JOIN arr ON arr.day = spine.day
        |             LEFT JOIN cmp ON cmp.day = spine.day),
        |t AS (
        |  SELECT day, arrivals, completions,
        |    coalesce(lag(completions) OVER (ORDER BY day), 0) AS rel
        |  FROM s)
        |SELECT day, CAST(arrivals AS BIGINT) AS arrivals,
        |  CAST(completions AS BIGINT) AS completions,
        |  CAST(SUM(arrivals - rel) OVER (ORDER BY day) AS BIGINT) AS wip
        |FROM t ORDER BY day""".stripMargin,

    // the shared daily CTE, micro-unit deviations from the 6-rounded
    // mean, 7 lag windows, exact integer lag products, 9-rounded terms
    // DECIMAL-summed, one closing sequence
    // exact +1/−1 delta sweep over the day spine; area/durations are
    // exact integer day arithmetic, three closing divisions
    "q29_littleslaw" ->
      """WITH jobs AS (
        |  SELECT MIN(CAST(l_shipdate AS DATE)) AS a,
        |    MAX(CAST(l_shipdate AS DATE)) AS c
        |  FROM lineitem GROUP BY l_orderkey),
        |d AS (
        |  SELECT a AS day, CAST(1 AS BIGINT) AS dd FROM jobs
        |  UNION ALL SELECT c + 1, CAST(-1 AS BIGINT) FROM jobs),
        |g AS (SELECT day, CAST(SUM(dd) AS BIGINT) AS delta FROM d
        |  GROUP BY 1),
        |sw AS (
        |  SELECT day,
        |    CAST(SUM(delta) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS wip,
        |    lead(day) OVER (ORDER BY day) AS nxt
        |  FROM g),
        |segs AS (SELECT wip * CAST(nxt - day AS BIGINT) AS area, wip
        |  FROM sw WHERE nxt IS NOT NULL),
        |aa AS (SELECT CAST(SUM(area) AS BIGINT) AS area,
        |  CAST(MAX(wip) AS BIGINT) AS wip_peak FROM segs),
        |ja AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_jobs, MIN(a) AS a0,
        |    MAX(c) AS c1,
        |    CAST(SUM(CAST(c - a AS BIGINT) + 1) AS BIGINT) AS dur
        |  FROM jobs)
        |SELECT n_jobs,
        |  CAST(CAST(c1 - a0 AS BIGINT) + 1 AS BIGINT) AS t_days,
        |  CASE WHEN n_jobs > 0 THEN round(CAST(n_jobs AS DOUBLE) /
        |    CAST(CAST(c1 - a0 AS BIGINT) + 1 AS DOUBLE), 6)
        |  END AS lambda_per_day,
        |  CASE WHEN n_jobs > 0 THEN round(CAST(dur AS DOUBLE) /
        |    CAST(n_jobs AS DOUBLE), 6) END AS w_days,
        |  CASE WHEN n_jobs > 0 THEN round(CAST(area AS DOUBLE) /
        |    CAST(CAST(c1 - a0 AS BIGINT) + 1 AS DOUBLE), 6) END AS l_avg,
        |  wip_peak
        |FROM ja CROSS JOIN aa""".stripMargin,

    // integer-space inclusion hv·k < size·2^56 (the pv7 rule) with the
    // portable-MD5 fold; estimate terms 9-rounded through DECIMAL(28,9)
    "sa21_ht" ->
      """WITH sp AS (
        |  SELECT o_custkey AS id, CAST(count(*) AS BIGINT) AS sz,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT id, sz, CAST(spend AS DECIMAL(18,6)) AS v FROM sp
        |  WHERE id IS NOT NULL AND sz IS NOT NULL AND spend IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(v) AS DOUBLE) AS tt FROM b),
        |h AS (
        |  SELECT sz, v,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5(
        |          'ht:' || CAST(id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM b),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |    CAST(SUM(CAST(round(CAST(v AS DOUBLE) /
        |      least(1.0e0, CAST(sz AS DOUBLE) / 32.0e0), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS ht
        |  FROM h WHERE hv * 32 < sz * 72057594037927936)
        |SELECT tot.n, s.n_sampled, tot.tt AS true_total,
        |  round(s.ht, 6) AS ht_estimate,
        |  CASE WHEN tot.tt <> 0 THEN round((s.ht - tot.tt) / tot.tt, 6)
        |    END AS rel_err
        |FROM tot CROSS JOIN s""".stripMargin,

    // portable-MD5 bucket replay (the hv fold idiom); ln on an exact
    // integer ratio, 6-rounded
    "sk16_linear" ->
      """WITH b AS (
        |  SELECT event_type, user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |h AS (
        |  SELECT event_type, user_id,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5(
        |          CAST(user_id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 256 AS bucket
        |  FROM b),
        |a AS (
        |  SELECT event_type,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact,
        |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS occupied
        |  FROM h GROUP BY 1)
        |SELECT event_type, 256 AS m, exact, occupied,
        |  CASE WHEN occupied < 256 THEN
        |    round(256.0e0 * round(ln(256.0e0 /
        |      CAST(256 - occupied AS DOUBLE)), 6), 6) END AS lc_estimate,
        |  CASE WHEN occupied < 256 AND exact > 0 THEN
        |    round((256.0e0 * round(ln(256.0e0 /
        |      CAST(256 - occupied AS DOUBLE)), 6) -
        |      CAST(exact AS DOUBLE)) / CAST(exact AS DOUBLE), 6)
        |  END AS rel_err
        |FROM a ORDER BY event_type""".stripMargin,

    // the fourierLadder cos/sin driver literals selected by an integer
    // di % p CASE (no runtime trig on either side); per-row products
    // 9-rounded through DECIMAL(28,9)
    "o102_periodogram" -> {
      val periods = Seq(3, 5, 7, 10)
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      val branches = periods.map { p =>
        val lad = graft.operators.TimeSeries.fourierLadder(p)
        def cc(sel: ((Double, Double)) => Double) = lad.zipWithIndex
          .map { case (v, r) => s"WHEN $r THEN ${l(sel(v))}" }
          .mkString(" ")
        s"""SELECT event_type, $p AS period, n, round(c, 6) AS c_sum,
           |  round(s, 6) AS s_sum, round(c * c + s * s, 6) AS power
           |FROM (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CAST(round(v * CASE di % $p ${cc(_._1)} END, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS c,
           |    CAST(SUM(CAST(round(v * CASE di % $p ${cc(_._2)} END, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS s
           |  FROM pts GROUP BY 1) x$p""".stripMargin
      }
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS v
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |pts AS (
         |  SELECT event_type,
         |    CAST(day - DATE '2024-01-01' AS BIGINT) AS di, v
         |  FROM daily)
         |${branches.mkString("\n|UNION ALL\n|")}
         |ORDER BY event_type, period""".stripMargin
    },

    "o83_ljungbox" -> {
      val h = 7
      val lagCols = (1 to h).map(k => s"lag(dm, $k) OVER w AS l$k")
        .mkString(",\n        |    ")
      val sumCols = (1 to h).map(k =>
        s"CAST(SUM(CASE WHEN l$k IS NOT NULL THEN dm * l$k ELSE 0 END) " +
          s"AS BIGINT) AS n$k").mkString(",\n        |    ")
      val rhoCols = (1 to h).map(k =>
        s"round(CAST(n$k AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r$k")
        .mkString(",\n        |    ")
      val termSum = (1 to h).map(k =>
        s"CASE WHEN n > $k THEN CAST(round(r$k * r$k / " +
          s"(CAST(n AS DOUBLE) - $k.0e0), 9) AS DECIMAL(28,9)) " +
          "ELSE CAST(0 AS DECIMAL(28,9)) END").mkString(" +\n        |    ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS v
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |mn AS (
         |  SELECT event_type,
         |    CAST(round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS mean
         |  FROM daily GROUP BY 1),
         |d AS (
         |  SELECT daily.event_type AS k, day,
         |    CAST((CAST(v AS DECIMAL(18,6)) - mean) * 1000000 AS BIGINT)
         |      AS dm
         |  FROM daily JOIN mn ON mn.event_type = daily.event_type),
         |l AS (
         |  SELECT k, dm,
         |    $lagCols
         |  FROM d WINDOW w AS (PARTITION BY k ORDER BY day)),
         |s AS (
         |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(dm * dm) AS BIGINT) AS den,
         |    $sumCols
         |  FROM l GROUP BY 1),
         |r AS (
         |  SELECT k, n,
         |    $rhoCols
         |  FROM s WHERE den > 0),
         |t AS (
         |  SELECT k, n,
         |    $termSum AS terms
         |  FROM r)
         |SELECT k AS event_type, n, $h AS h,
         |  CASE WHEN n > ${h + 1} THEN
         |    round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0e0) *
         |      CAST(terms AS DOUBLE), 6) END AS q_stat,
         |  CAST($h AS BIGINT) AS dof
         |FROM t ORDER BY event_type""".stripMargin
    },

    // scale-exploded block means, micro-unit variance moments, driver
    // ln-m literals, 6-rounded runtime ln (the o33 firewall), the o11
    // slope replay, H = 1 + slope/2 on the ROUNDED slope
    "o84_hurst" -> {
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      val scales = graft.operators.TimeSeries.HurstScales
      val xCase = scales.map(m =>
        s"WHEN $m THEN ${l(math.log(m.toDouble))}").mkString(" ")
      val vard = "(CAST(nb AS DOUBLE) * CAST(s2 AS DOUBLE) - " +
        "CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
        "(CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0e0)) / " +
        "1000000000000.0e0"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS v
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |di AS (
         |  SELECT event_type AS k,
         |    CAST(datediff('day', DATE '2024-01-01', day) AS BIGINT) AS o,
         |    CAST(v AS DECIMAL(18,6)) AS v
         |  FROM daily),
         |ex AS (
         |  SELECT k, o, v, m
         |  FROM di CROSS JOIN (
         |    SELECT unnest([${scales.mkString(", ")}]) AS m)),
         |bl AS (
         |  SELECT k, m, floor(o / m) AS b, COUNT(*) AS cnt,
         |    CAST(round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
         |      6) AS DECIMAL(18,6)) AS bm
         |  FROM ex GROUP BY 1, 2, 3),
         |mm AS (
         |  SELECT k, m, CAST(bm * 1000000 AS BIGINT) AS mmv
         |  FROM bl WHERE cnt = m),
         |vr AS (
         |  SELECT k, m, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(mmv) AS BIGINT) AS s,
         |    CAST(SUM(mmv * mmv) AS BIGINT) AS s2
         |  FROM mm GROUP BY 1, 2),
         |pt AS (
         |  SELECT k, CASE m $xCase END AS x,
         |    round(ln($vard), 6) AS y
         |  FROM vr WHERE nb > 1 AND $vard > 0),
         |so AS (
         |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
         |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
         |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
         |  FROM pt WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1),
         |f AS (
         |  SELECT k, n,
         |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
         |    CAST(n AS DOUBLE) * sxx - sx * sx AS den
         |  FROM so)
         |SELECT k AS event_type, n AS n_scales,
         |  CASE WHEN den > 0 THEN round(num / den, 6) END AS slope,
         |  CASE WHEN den > 0 THEN
         |    round(1.0e0 + round(num / den, 6) / 2.0e0, 6) END AS hurst
         |FROM f ORDER BY event_type""".stripMargin
    },

    // two cell replays over the t12 hash idiom, a (r, bucket) product
    // join, a densified row-spine min, the exact keyed audit beside
    "sk15_cms_join" ->
      """WITH a AS (
        |  SELECT CAST(user_id AS VARCHAR) AS it FROM events
        |  WHERE event_type = 'click' AND user_id IS NOT NULL),
        |b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS it FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |ca AS (
        |  SELECT r.r,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('cmsj' || r.r || ':' ||
        |          it), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 256 AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS na
        |  FROM a CROSS JOIN range(3) r(r) GROUP BY 1, 2),
        |cb AS (
        |  SELECT r.r,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('cmsj' || r.r || ':' ||
        |          it), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 256 AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM b CROSS JOIN range(3) r(r) GROUP BY 1, 2),
        |prod AS (
        |  SELECT ca.r, CAST(SUM(na * nb) AS BIGINT) AS rowest
        |  FROM ca JOIN cb ON cb.r = ca.r AND cb.bucket = ca.bucket
        |  GROUP BY 1),
        |est AS (
        |  SELECT CAST(MIN(coalesce(prod.rowest, 0)) AS BIGINT) AS est_join
        |  FROM range(3) r(r) LEFT JOIN prod ON prod.r = r.r),
        |exact AS (
        |  SELECT CAST(coalesce(SUM(x.c * y.c), 0) AS BIGINT) AS exact_join
        |  FROM (SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM a GROUP BY 1)
        |    x
        |  JOIN (SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1)
        |    y USING (it))
        |SELECT 3 AS "rows", 256 AS width, est_join, exact_join,
        |  CASE WHEN exact_join > 0 THEN
        |    round(CAST(est_join - exact_join AS DOUBLE) /
        |      CAST(exact_join AS DOUBLE), 6) END AS rel_err
        |FROM est CROSS JOIN exact""".stripMargin,

    // the sk13 register/closing replay + one inclusion–exclusion line
    // over the three 3-rounded estimates; exact intersect beside
    "sk14_hll_intersect" ->
      """WITH b AS (
        |  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END
        |      AS t,
        |    CAST(user_id AS VARCHAR) AS it
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND event_type IN ('click', 'purchase')),
        |h AS (
        |  SELECT t,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('hllu:' ||
        |          COALESCE(it, '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM b),
        |regs AS (
        |  SELECT t, hv % 64 AS register,
        |    MAX(CASE WHEN hv // 64 = 0 THEN 51
        |        ELSE 51 - length(bin(hv // 64)) END) AS mj
        |  FROM h GROUP BY 1, 2),
        |uni AS (SELECT 'u' AS t, register, MAX(mj) AS mj
        |        FROM regs GROUP BY 2),
        |allr AS (SELECT * FROM regs UNION ALL SELECT * FROM uni),
        |est AS (
        |  SELECT t, round(CASE
        |      WHEN v > 0 AND (0.709e0 * 4096.0e0 * 2251799813685248.0e0
        |        / s) <= 160.0e0
        |      THEN 64.0e0 * ln(64.0e0 / v)
        |      ELSE 0.709e0 * 4096.0e0 * 2251799813685248.0e0 / s END, 3)
        |      AS est
        |  FROM (
        |    SELECT t,
        |      CAST(s_present + (64 - n_regs) *
        |        CAST(2251799813685248 AS BIGINT) AS BIGINT) AS s,
        |      64 - n_regs AS v
        |    FROM (
        |      SELECT t, sum(CAST(pow(2.0e0, 51 - mj) AS BIGINT))
        |          AS s_present,
        |        count(*) AS n_regs
        |      FROM allr GROUP BY 1))),
        |ex AS (
        |  SELECT CAST(SUM(ia * ib) AS BIGINT) AS n_intersect_exact
        |  FROM (
        |    SELECT it, MAX(CASE WHEN t = 'a' THEN 1 ELSE 0 END) AS ia,
        |      MAX(CASE WHEN t = 'b' THEN 1 ELSE 0 END) AS ib
        |    FROM b GROUP BY 1))
        |SELECT 6 AS p, a.est AS est_a, bb.est AS est_b,
        |  u.est AS est_union,
        |  round(a.est + bb.est - u.est, 3) AS est_intersect,
        |  ex.n_intersect_exact
        |FROM est a, est bb, est u, ex
        |WHERE a.t = 'a' AND bb.t = 'b' AND u.t = 'u'""".stripMargin,

    // dyadic fractions = exact integer hash bounds (a VALUES ladder);
    // the o23 moment chain per rung
    "sa20_sample_curve" -> {
      val rungs = Seq(6, 4, 2, 0).sorted.reverse.map { e =>
        s"(${1.0 / (1L << e)}e0, CAST(${1L << (56 - e)} AS BIGINT))"
      }.mkString(", ")
      s"""WITH l(fraction, thr) AS (VALUES $rungs),
         |b AS (
         |  SELECT
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('curve:' ||
         |          COALESCE(CAST(event_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS hv,
         |    value AS v
         |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
         |g AS (
         |  SELECT l.fraction, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s,
         |    CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6)))
         |      AS DOUBLE) AS q
         |  FROM b CROSS JOIN l WHERE b.hv < l.thr GROUP BY 1)
         |SELECT fraction, n,
         |  round(s / CAST(n AS DOUBLE), 6) AS mean_v,
         |  CASE WHEN n > 1 THEN
         |    round(sqrt(greatest((q - s * s / CAST(n AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) - 1.0e0), 0.0e0)), 6) END AS sd,
         |  CASE WHEN n > 1 THEN
         |    round(1.96e0 * sqrt(greatest((q - s * s / CAST(n AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) - 1.0e0), 0.0e0)) /
         |      sqrt(CAST(n AS DOUBLE)), 6) END AS ci_half
         |FROM g ORDER BY fraction""".stripMargin
    },

    // the o22 theta/adjustment CTEs verbatim, then the o23 Welch chain
    // run twice (raw y and y_cuped) and union-tagged
    "o68_cuped_gain" -> {
      def welch(vExpr: String, tag: String) =
        s"""m_$tag AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN g = 'true' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_a,
           |    CAST(SUM(CASE WHEN g = 'false' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_b,
           |    CAST(SUM(CASE WHEN g = 'true' THEN
           |      CAST($vExpr AS DECIMAL(18,6)) END) AS DOUBLE) AS sa,
           |    CAST(SUM(CASE WHEN g = 'false' THEN
           |      CAST($vExpr AS DECIMAL(18,6)) END) AS DOUBLE) AS sb,
           |    CAST(SUM(CASE WHEN g = 'true' THEN
           |      CAST($vExpr AS DECIMAL(19,6)) *
           |      CAST($vExpr AS DECIMAL(19,6)) END) AS DOUBLE) AS qa,
           |    CAST(SUM(CASE WHEN g = 'false' THEN
           |      CAST($vExpr AS DECIMAL(19,6)) *
           |      CAST($vExpr AS DECIMAL(19,6)) END) AS DOUBLE) AS qb
           |  FROM armed WHERE $vExpr IS NOT NULL
           |    AND (g = 'true' OR g = 'false')),
           |z_$tag AS (
           |  SELECT '$tag' AS metric, n_a, n_b,
           |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
           |    sa, sb, qa, qb,
           |    sa / CAST(n_a AS DOUBLE) AS ma,
           |    sb / CAST(n_b AS DOUBLE) AS mb,
           |    greatest((qa - sa * sa / CAST(n_a AS DOUBLE)) /
           |      (CAST(n_a AS DOUBLE) - 1.0e0), 0.0e0) AS va,
           |    greatest((qb - sb * sb / CAST(n_b AS DOUBLE)) /
           |      (CAST(n_b AS DOUBLE) - 1.0e0), 0.0e0) AS vb
           |  FROM m_$tag),
           |r_$tag AS (
           |  SELECT metric, n_a, n_b, round(ma, 6) AS mean_a,
           |    round(mb, 6) AS mean_b,
           |    CASE WHEN n_a >= 2 AND n_b >= 2 AND va / na + vb / nb > 0
           |      THEN round((ma - mb) / sqrt(va / na + vb / nb), 6) END
           |      AS t,
           |    CASE WHEN n_a >= 2 AND n_b >= 2 AND va / na + vb / nb > 0
           |      THEN round(((va / na + vb / nb) * (va / na + vb / nb)) /
           |        ((va / na) * (va / na) / (na - 1.0e0) +
           |         (vb / nb) * (vb / nb) / (nb - 1.0e0)), 6) END AS dof
           |  FROM z_$tag)""".stripMargin
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CAST(coalesce(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
         |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS x,
         |    CAST(coalesce(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
         |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS y
         |  FROM events GROUP BY 1),
         |mm AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
         |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
         |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
         |  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
         |tt AS (
         |  SELECT n, sx,
         |    CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
         |         THEN (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |              (CAST(n AS DOUBLE) * sxx - sx * sx)
         |         ELSE 0.0e0 END AS th
         |  FROM mm),
         |armed AS (
         |  SELECT user_id, y,
         |    round(y - th * (x - sx / CAST(n AS DOUBLE)), 6) AS y_cuped,
         |    CAST(user_id % 2 = 1 AS VARCHAR) AS g
         |  FROM pu CROSS JOIN tt),
         |${welch("y", "raw")},
         |${welch("y_cuped", "cuped")},
         |u AS (SELECT * FROM r_cuped UNION ALL SELECT * FROM r_raw)
         |SELECT metric, n_a, n_b, mean_a, mean_b, t, dof
         |FROM u ORDER BY metric""".stripMargin
    },

    // the day spine against the (day, user) dedup with a bounded range
    // predicate; exact distincts, one rounded ratio
    "q22_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT d AS day FROM du),
        |dau AS (
        |  SELECT d AS day, CAST(COUNT(DISTINCT u) AS BIGINT) AS dau
        |  FROM du GROUP BY 1),
        |wau AS (
        |  SELECT days.day, CAST(COUNT(DISTINCT du.u) AS BIGINT)
        |    AS window_users
        |  FROM days JOIN du ON du.d > days.day - 7 AND du.d <= days.day
        |  GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.window_users,
        |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.window_users AS DOUBLE),
        |    6) AS stickiness
        |FROM dau JOIN wau ON wau.day = dau.day
        |ORDER BY dau.day""".stripMargin,

    // the child-count left join, fixed bands, one scalar total
    "dq13_fanout" ->
      """WITH cc AS (
        |  SELECT l_orderkey AS ck, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(cc.cn, 0) AS n
        |  FROM orders o LEFT JOIN cc ON cc.ck = o.o_orderkey
        |  WHERE o.o_orderkey IS NOT NULL),
        |b AS (
        |  SELECT CASE WHEN n = 0 THEN 0 WHEN n = 1 THEN 1
        |    WHEN n <= 5 THEN 2 WHEN n <= 10 THEN 3 ELSE 4 END AS band_id,
        |    n
        |  FROM j),
        |g AS (
        |  SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n_parents,
        |    CAST(SUM(n) AS BIGINT) AS n_children
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_parents) AS BIGINT) AS tt FROM g)
        |SELECT band_id,
        |  CASE WHEN band_id = 0 THEN '0' WHEN band_id = 1 THEN '1'
        |    WHEN band_id = 2 THEN '2-5' WHEN band_id = 3 THEN '6-10'
        |    ELSE '11+' END AS band,
        |  n_parents, n_children,
        |  round(CAST(n_parents AS DOUBLE) / CAST(tt AS DOUBLE), 6)
        |    AS share_parents
        |FROM g CROSS JOIN t ORDER BY band_id""".stripMargin,

    // per-column distinct value sets from the two month slices,
    // set differences via NOT IN (values never null), one union
    "dq19_cat_churn" -> {
      val cols = Seq("l_partkey", "l_suppkey", "o_custkey")
      def slice(tag: String, name: String, from: String, to: String) =
        s"""${tag}_$name AS (
           |  SELECT DISTINCT CAST($name AS VARCHAR) AS v
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  WHERE CAST(o.o_orderdate AS DATE) >= DATE '$from'
           |    AND CAST(o.o_orderdate AS DATE) < DATE '$to'
           |    AND $name IS NOT NULL)""".stripMargin
      val ctes = cols.flatMap(c => Seq(
        slice("a", c, "1995-01-01", "1995-02-01"),
        slice("b", c, "1995-02-01", "1995-03-01"))).mkString(",\n")
      val blocks = cols.map(c =>
        s"""SELECT '$c' AS col_name,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a_$c) AS n_a,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b_$c) AS n_b,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b_$c
           |   WHERE v NOT IN (SELECT v FROM a_$c)) AS n_new,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a_$c
           |   WHERE v NOT IN (SELECT v FROM b_$c)) AS n_vanished"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH
         |$ctes,
         |u AS (
         |$blocks)
         |SELECT col_name, n_a, n_b, n_new, n_vanished,
         |  CASE WHEN n_a + n_new > 0 THEN
         |    round(CAST(n_a - n_vanished AS DOUBLE) /
         |      CAST(n_a + n_new AS DOUBLE), 6) END AS set_jaccard
         |FROM u ORDER BY col_name""".stripMargin
    },

    // exact integer day spans (DATE subtraction ↔ datediff), one keyed
    // agg, two divisions rounded at 6
    "dq18_date_order" ->
      """WITH j AS (
        |  SELECT o.o_orderpriority,
        |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        |      AS BIGINT) AS span
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderpriority IS NOT NULL
        |    AND o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN span < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations,
        |  round(CAST(SUM(CASE WHEN span < 0 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS violation_rate,
        |  CAST(MIN(span) AS BIGINT) AS min_span_days,
        |  round(CAST(SUM(span) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_span_days,
        |  CAST(MAX(span) AS BIGINT) AS max_span_days
        |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // 4-rounded quintile thresholds on the hour covariate, per-stratum
    // conditional decimal means, decimal diffs, one weighted pool
    "o65_strata" -> {
      val qs = (1 to 4).map(i =>
        s"round(quantile_cont(c, ${i / 5.0}e0), 4) AS t${i - 1}")
        .mkString(",\n    ")
      val strat = (0 until 4).map(i =>
        s"(CASE WHEN c >= q.t$i THEN 1 ELSE 0 END)").mkString(" +\n      ")
      s"""WITH b AS (
         |  SELECT (user_id % 2 = 1) AS arm, CAST(hour(ts) AS DOUBLE) AS c,
         |    value AS v
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND value IS NOT NULL),
         |q AS (
         |  SELECT $qs
         |  FROM b),
         |st AS (
         |  SELECT $strat AS stratum, arm, v
         |  FROM b CROSS JOIN q),
         |g AS (
         |  SELECT stratum,
         |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    round(CAST(SUM(CASE WHEN arm THEN CAST(v AS DECIMAL(18,6))
         |      END) AS DOUBLE) /
         |      CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS DOUBLE), 6)
         |      AS mean_a,
         |    round(CAST(SUM(CASE WHEN NOT arm THEN CAST(v AS
         |      DECIMAL(18,6)) END) AS DOUBLE) /
         |      CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS DOUBLE),
         |      6) AS mean_b
         |  FROM st GROUP BY 1),
         |d AS (
         |  SELECT *, CASE WHEN n_a > 0 AND n_b > 0 THEN
         |      CAST(CAST(mean_a AS DECIMAL(18,6)) -
         |        CAST(mean_b AS DECIMAL(18,6)) AS DOUBLE) END AS diff
         |  FROM g),
         |p AS (
         |  SELECT round(CAST(SUM(CAST(diff AS DECIMAL(18,6)) *
         |      CAST(n_a + n_b AS DECIMAL(13,0))) AS DOUBLE) /
         |    CAST(SUM(n_a + n_b) AS DOUBLE), 6) AS pooled_diff
         |  FROM d WHERE diff IS NOT NULL)
         |SELECT stratum, n_a, n_b, mean_a, mean_b, diff, pooled_diff
         |FROM d CROSS JOIN p ORDER BY stratum""".stripMargin
    },

    // per-customer decimal spend, 4-rounded decile thresholds, the
    // triangular-join cumulative (no window), exact share ratios
    "o66_lorenz" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(spend, ${i / 10.0}e0), 4) AS b${i - 1}")
        .mkString(",\n    ")
      val bk = (0 until 9).map(i =>
        s"(CASE WHEN spend >= q.b$i THEN 1 ELSE 0 END)")
        .mkString(" +\n      ")
      s"""WITH sp AS (
         |  SELECT o_custkey,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         |      AS spend
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |q AS (
         |  SELECT $qs
         |  FROM sp),
         |c AS (
         |  SELECT $bk AS bucket, spend
         |  FROM sp CROSS JOIN q),
         |per AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_units,
         |    SUM(CAST(spend AS DECIMAL(18,6))) AS sv
         |  FROM c GROUP BY 1),
         |tot AS (SELECT SUM(sv) AS tt FROM per),
         |cum AS (
         |  SELECT a.bucket, a.n_units, a.sv, SUM(b.sv) AS cumsv
         |  FROM per a JOIN per b ON b.bucket <= a.bucket
         |  GROUP BY 1, 2, 3)
         |SELECT bucket, n_units, round(CAST(sv AS DOUBLE), 6) AS sum_v,
         |  round(CAST(sv AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share,
         |  round(CAST(cumsv AS DOUBLE) / CAST(tt AS DOUBLE), 6)
         |    AS cum_share
         |FROM cum CROSS JOIN tot ORDER BY bucket""".stripMargin
    },

    // three-feature melt by UNION ALL, the o23 conditional moments per
    // feature, one sqrt closing sequence per row
    "o63_balance" ->
      """WITH b AS (
        |  SELECT 'value' AS feature, (user_id % 2 = 1) AS arm, value AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  UNION ALL
        |  SELECT 'hod', (user_id % 2 = 1), CAST(hour(ts) AS DOUBLE)
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  UNION ALL
        |  SELECT 'plen', (user_id % 2 = 1), CAST(length(props) AS DOUBLE)
        |  FROM events WHERE user_id IS NOT NULL AND props IS NOT NULL),
        |m AS (
        |  SELECT feature,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN arm THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN NOT arm THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN arm THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN NOT arm THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qb
        |  FROM b GROUP BY 1),
        |v AS (
        |  SELECT feature, n_a, n_b, CAST(n_a AS DOUBLE) AS na,
        |    CAST(n_b AS DOUBLE) AS nb, sa, sb, qa, qb,
        |    sa / CAST(n_a AS DOUBLE) AS ma, sb / CAST(n_b AS DOUBLE) AS mb,
        |    greatest((qa - sa * sa / CAST(n_a AS DOUBLE)) /
        |      (CAST(n_a AS DOUBLE) - 1.0e0), 0.0e0) AS va,
        |    greatest((qb - sb * sb / CAST(n_b AS DOUBLE)) /
        |      (CAST(n_b AS DOUBLE) - 1.0e0), 0.0e0) AS vb
        |  FROM m),
        |z AS (
        |  SELECT feature, n_a, n_b, round(ma, 6) AS mean_a,
        |    round(mb, 6) AS mean_b,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND (va + vb) / 2.0e0 > 0
        |      THEN round((ma - mb) / sqrt((va + vb) / 2.0e0), 6) END
        |      AS smd
        |  FROM v)
        |SELECT feature, n_a, n_b, mean_a, mean_b, smd,
        |  CASE WHEN smd IS NULL THEN NULL
        |       ELSE abs(smd) < 0.1e0 END AS balanced
        |FROM z ORDER BY feature""".stripMargin,

    // the q20 frame, an exact-integer inverse-volume score, 4-rounded
    // decile thresholds, comparison-count buckets, decimal gap
    "o64_calibration" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(score, ${i / 10.0}e0), 4) AS b${i - 1}")
        .mkString(",\n    ")
      val bucket = (0 until 9).map(i =>
        s"(CASE WHEN score >= q.b$i THEN 1 ELSE 0 END)")
        .mkString(" +\n      ")
      s"""WITH e AS (
         |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND ts IS NOT NULL),
         |m AS (SELECT MAX(dy) AS maxd FROM e),
         |k AS (
         |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT)
         |      AS n_events,
         |    MAX(dy) AS last_day
         |  FROM e GROUP BY 1, 2),
         |sc AS (
         |  SELECT round(1.0e0 / CAST(n_events + 1 AS DOUBLE), 6) AS score,
         |    (datediff('day', last_day, m.maxd) > 2) AS churned
         |  FROM k CROSS JOIN m),
         |q AS (
         |  SELECT $qs
         |  FROM sc),
         |c AS (
         |  SELECT $bucket AS bucket, score, churned
         |  FROM sc CROSS JOIN q)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |  round(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) /
         |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_score,
         |  round(CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS DOUBLE) /
         |    CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate,
         |  CAST(CAST(round(CAST(SUM(CAST(score AS DECIMAL(18,6)))
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) -
         |    CAST(round(CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6))
         |    AS DOUBLE) AS gap
         |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    // the o64 bucket machinery folded: n·|gap| exact (12,0)×(18,6)
    // DECIMAL products, Brier diffs re-cast to (18,6) before squaring
    // (the (19,6)² Spark cap trap), three closing divisions
    "o121_calibration" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(score, ${i / 10.0}e0), 4) AS b${i - 1}")
        .mkString(",\n    ")
      val bucket = (0 until 9).map(i =>
        s"(CASE WHEN score >= q.b$i THEN 1 ELSE 0 END)")
        .mkString(" +\n      ")
      s"""WITH e AS (
         |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND ts IS NOT NULL),
         |m AS (SELECT MAX(dy) AS maxd FROM e),
         |k AS (
         |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT)
         |      AS n_events,
         |    MAX(dy) AS last_day
         |  FROM e GROUP BY 1, 2),
         |sc AS (
         |  SELECT round(1.0e0 / CAST(n_events + 1 AS DOUBLE), 6) AS score,
         |    (datediff('day', last_day, m.maxd) > 2) AS churned
         |  FROM k CROSS JOIN m),
         |q AS (
         |  SELECT $qs
         |  FROM sc),
         |c AS (
         |  SELECT $bucket AS bucket, score, churned
         |  FROM sc CROSS JOIN q),
         |g AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(CAST(round(CAST(SUM(CAST(score AS DECIMAL(18,6)))
         |        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |        AS DECIMAL(18,6)) -
         |      CAST(round(CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END)
         |        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |        AS DECIMAL(18,6))
         |      AS DOUBLE) AS gap
         |  FROM c GROUP BY 1),
         |fold AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS n,
         |    SUM(CAST(n AS DECIMAL(12,0)) * CAST(abs(gap) AS DECIMAL(18,6)))
         |      AS wgap,
         |    MAX(CAST(abs(gap) AS DECIMAL(18,6))) AS mce
         |  FROM g),
         |br AS (
         |  SELECT
         |    CAST(SUM(
         |      CAST(CAST(score AS DECIMAL(18,6)) -
         |        CAST(CASE WHEN churned THEN 1 ELSE 0 END
         |          AS DECIMAL(18,6)) AS DECIMAL(18,6)) *
         |      CAST(CAST(score AS DECIMAL(18,6)) -
         |        CAST(CASE WHEN churned THEN 1 ELSE 0 END
         |          AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DOUBLE) AS bsum,
         |    CAST(COUNT(*) AS BIGINT) AS bn
         |  FROM sc)
         |SELECT n,
         |  CASE WHEN n > 0 THEN
         |    round(CAST(wgap AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS ece,
         |  round(CAST(mce AS DOUBLE), 6) AS mce,
         |  CASE WHEN bn > 0 THEN round(bsum / CAST(bn AS DOUBLE), 6) END
         |    AS brier
         |FROM fold CROSS JOIN br""".stripMargin
    },

    // the o23 moment chain with the ±5.0 margin in the two one-sided
    // statistics; the verdict reads the rounded t's against 1.645
    "o62_tost" ->
      """WITH pool AS (
        |  SELECT CAST(user_id % 2 AS VARCHAR) AS g, value AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN g = '1' THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN g = '0' THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN g = '1' THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN g = '0' THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qb
        |  FROM pool),
        |f AS (
        |  SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS na,
        |         CAST(n_b AS DOUBLE) AS nb, sa, sb, qa, qb
        |  FROM m),
        |v AS (
        |  SELECT *, sa / na AS ma, sb / nb AS mb,
        |    greatest((qa - sa * sa / na) / (na - 1.0e0), 0.0e0) AS va,
        |    greatest((qb - sb * sb / nb) / (nb - 1.0e0), 0.0e0) AS vb
        |  FROM f),
        |z AS (SELECT *, va / na + vb / nb AS se2 FROM v),
        |t AS (
        |  SELECT *,
        |    round((ma - mb + 5.0e0) / sqrt(se2), 6) AS tlo,
        |    round((ma - mb - 5.0e0) / sqrt(se2), 6) AS thi,
        |    (n_a >= 2 AND n_b >= 2 AND se2 > 0) AS ok
        |  FROM z)
        |SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  5.0e0 AS margin,
        |  CASE WHEN ok THEN tlo END AS t_lo,
        |  CASE WHEN ok THEN thi END AS t_hi,
        |  CASE WHEN ok THEN (tlo > 1.645e0 AND thi < -1.645e0) END
        |    AS equivalent
        |FROM t""".stripMargin,

    // the portable bottom-k sketch algebra: one shared hash per user,
    // the smaller k-th minimum as theta, sub-theta membership counts
    "sk11_kmv_setops" ->
      """WITH b AS (
        |  SELECT DISTINCT
        |    CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS t,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('kmvset:' ||
        |          COALESCE(CAST(user_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS h
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND event_type IN ('click', 'purchase')),
        |kth AS (
        |  SELECT COALESCE(MIN(h), 72057594037927936) AS theta FROM (
        |    SELECT h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) AS r
        |    FROM b) WHERE r = 64),
        |fl AS (
        |  SELECT h, MAX(CASE WHEN t = 'a' THEN 1 ELSE 0 END) AS ia,
        |    MAX(CASE WHEN t = 'b' THEN 1 ELSE 0 END) AS ib
        |  FROM b GROUP BY 1),
        |cnt AS (
        |  SELECT MAX(kth.theta) AS theta,
        |    CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(ib) AS BIGINT) AS cb,
        |    CAST(COUNT(*) AS BIGINT) AS cu,
        |    CAST(SUM(ia * ib) AS BIGINT) AS ci
        |  FROM fl CROSS JOIN kth WHERE h < kth.theta),
        |ex AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS n_a_exact,
        |    CAST(SUM(ib) AS BIGINT) AS n_b_exact,
        |    CAST(COUNT(*) AS BIGINT) AS n_union_exact,
        |    CAST(SUM(ia * ib) AS BIGINT) AS n_inter_exact
        |  FROM (
        |    SELECT user_id,
        |      MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ia,
        |      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |        AS ib
        |    FROM events
        |    WHERE user_id IS NOT NULL
        |      AND event_type IN ('click', 'purchase')
        |    GROUP BY 1))
        |SELECT 64 AS k, n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
        |  round(CAST(ca AS DOUBLE) * 72057594037927936.0e0 /
        |    CAST(theta AS DOUBLE), 6) AS est_a,
        |  round(CAST(cb AS DOUBLE) * 72057594037927936.0e0 /
        |    CAST(theta AS DOUBLE), 6) AS est_b,
        |  round(CAST(cu AS DOUBLE) * 72057594037927936.0e0 /
        |    CAST(theta AS DOUBLE), 6) AS est_union,
        |  round(CAST(ci AS DOUBLE) * 72057594037927936.0e0 /
        |    CAST(theta AS DOUBLE), 6) AS est_inter,
        |  round(CAST(ci AS DOUBLE) / CAST(cu AS DOUBLE), 6) AS jaccard_est
        |FROM ex CROSS JOIN cnt""".stripMargin,

    // the q20 per-(user,type) frame replayed, distinct 4-rounded decile
    // thresholds, the identical gini double sequence, argmin via scalar
    // subqueries (no window)
    "o61_stump" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(f, ${i / 10.0}e0), 4)").mkString(",\n    ")
      s"""WITH e AS (
         |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND ts IS NOT NULL),
         |m AS (SELECT MAX(dy) AS maxd FROM e),
         |k AS (
         |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT)
         |      AS n_events,
         |    MAX(dy) AS last_day
         |  FROM e GROUP BY 1, 2),
         |feat AS (
         |  SELECT CAST(n_events AS DOUBLE) AS f,
         |    (datediff('day', last_day, m.maxd) > 2) AS l
         |  FROM k CROSS JOIN m),
         |q AS (SELECT [
         |    $qs] AS ql FROM feat),
         |thr AS (SELECT DISTINCT unnest(ql) AS thr FROM q),
         |c AS (
         |  SELECT t.thr,
         |    CAST(SUM(CASE WHEN f <= t.thr THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_left,
         |    CAST(SUM(CASE WHEN f <= t.thr AND l THEN 1 ELSE 0 END)
         |      AS BIGINT) AS pos_left,
         |    CAST(SUM(CASE WHEN f > t.thr THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_right,
         |    CAST(SUM(CASE WHEN f > t.thr AND l THEN 1 ELSE 0 END)
         |      AS BIGINT) AS pos_right
         |  FROM feat CROSS JOIN thr t GROUP BY 1),
         |s AS (
         |  SELECT thr, n_left, pos_left, n_right, pos_right,
         |    round((
         |      CASE WHEN n_left > 0 THEN CAST(n_left AS DOUBLE) *
         |        (1.0e0 -
         |          (CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)) *
         |          (CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)) -
         |          ((CAST(n_left AS DOUBLE) - CAST(pos_left AS DOUBLE)) /
         |            CAST(n_left AS DOUBLE)) *
         |          ((CAST(n_left AS DOUBLE) - CAST(pos_left AS DOUBLE)) /
         |            CAST(n_left AS DOUBLE)))
         |      ELSE 0.0e0 END +
         |      CASE WHEN n_right > 0 THEN CAST(n_right AS DOUBLE) *
         |        (1.0e0 -
         |          (CAST(pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)) *
         |          (CAST(pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)) -
         |          ((CAST(n_right AS DOUBLE) - CAST(pos_right AS DOUBLE)) /
         |            CAST(n_right AS DOUBLE)) *
         |          ((CAST(n_right AS DOUBLE) - CAST(pos_right AS DOUBLE)) /
         |            CAST(n_right AS DOUBLE)))
         |      ELSE 0.0e0 END) /
         |      CAST(n_left + n_right AS DOUBLE), 6) AS gini_split
         |  FROM c),
         |bg AS (SELECT MIN(gini_split) AS bg FROM s),
         |bt AS (SELECT MIN(thr) AS bt FROM s, bg
         |       WHERE s.gini_split = bg.bg)
         |SELECT s.thr, s.n_left, s.pos_left, s.n_right, s.pos_right,
         |  s.gini_split,
         |  (s.gini_split = bg.bg AND s.thr = bt.bt) AS is_best
         |FROM s, bg, bt ORDER BY s.thr""".stripMargin
    },

    // integer hash-parity coins per round, 6-rounded arm means
    // subtracted in decimal, the ±1-corrected exact-count p
    "o59_permtest" ->
      """WITH b AS (
        |  SELECT event_id AS id, (user_id % 2 = 1) AS g, value AS v
        |  FROM events
        |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL),
        |obs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(
        |      CAST(round(CAST(SUM(CASE WHEN g THEN
        |          CAST(v AS DECIMAL(18,6)) END) AS DOUBLE) /
        |        CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS DOUBLE), 6)
        |        AS DECIMAL(18,6)) -
        |      CAST(round(CAST(SUM(CASE WHEN NOT g THEN
        |          CAST(v AS DECIMAL(18,6)) END) AS DOUBLE) /
        |        CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS DOUBLE), 6)
        |        AS DECIMAL(18,6)) AS DOUBLE) AS diff_obs
        |  FROM b),
        |lad AS (SELECT unnest(generate_series(0, 31)) AS r),
        |p AS (
        |  SELECT lad.r, b.v,
        |    (list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('perm:' ||
        |          CAST(lad.r AS VARCHAR) || ':' || CAST(b.id AS VARCHAR)),
        |          1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 2 = 0) AS flag
        |  FROM b CROSS JOIN lad),
        |g2 AS (
        |  SELECT r,
        |    SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN NOT flag THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN flag THEN CAST(v AS DECIMAL(18,6)) END) AS sa,
        |    SUM(CASE WHEN NOT flag THEN CAST(v AS DECIMAL(18,6)) END) AS sb
        |  FROM p GROUP BY 1),
        |d AS (
        |  SELECT r,
        |    CAST(round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) -
        |    CAST(round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS diff
        |  FROM g2 WHERE na > 0 AND nb > 0)
        |SELECT obs.n_a, obs.n_b, obs.diff_obs,
        |  CAST(COUNT(*) AS BIGINT) AS n_perms,
        |  CAST(SUM(CASE WHEN abs(d.diff) >=
        |      abs(CAST(obs.diff_obs AS DECIMAL(18,6)))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
        |  round(CAST(SUM(CASE WHEN abs(d.diff) >=
        |      abs(CAST(obs.diff_obs AS DECIMAL(18,6)))
        |    THEN 1 ELSE 0 END) + 1 AS DOUBLE) /
        |    CAST(COUNT(*) + 1 AS DOUBLE), 6) AS p_value
        |FROM d CROSS JOIN obs
        |GROUP BY 1, 2, 3""".stripMargin,

    // decimal group moments, 6-rounded S²/n terms DECIMAL-summed, the
    // Q−B difference rounded in decimal (o46), fixed closing sequence
    "o57_anova" ->
      """WITH b AS (
        |  SELECT event_type AS k, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |g AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS ng,
        |    SUM(CAST(v AS DECIMAL(18,6))) AS sg,
        |    SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))) AS qg
        |  FROM b GROUP BY 1),
        |g2 AS (
        |  SELECT *, CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
        |    CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6)) AS tg FROM g),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    SUM(sg) AS s, SUM(qg) AS q, SUM(tg) AS bsum
        |  FROM g2),
        |o AS (
        |  SELECT k_groups, n,
        |    round(CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) *
        |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ssb,
        |    CAST(round(CAST(q AS DECIMAL(30,12)) -
        |      CAST(bsum AS DECIMAL(24,6)), 6) AS DOUBLE) AS ssw
        |  FROM t)
        |SELECT k_groups, n, ssb, ssw,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 THEN
        |    round((ssb / (CAST(k_groups AS DOUBLE) - 1.0e0)) /
        |      (ssw / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))), 6)
        |  END AS f,
        |  CASE WHEN CAST(CAST(ssb AS DECIMAL(28,6)) +
        |      CAST(ssw AS DECIMAL(28,6)) AS DOUBLE) > 0 THEN
        |    round(ssb / CAST(CAST(ssb AS DECIMAL(28,6)) +
        |      CAST(ssw AS DECIMAL(28,6)) AS DOUBLE), 6)
        |  END AS eta2
        |FROM o""".stripMargin,

    // 4-rounded medians, exact decimal |deviations|, then the o57
    // chain verbatim over (k, z)
    "o58_levene" ->
      """WITH raw AS (
        |  SELECT event_type AS k, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |med AS (
        |  SELECT k, round(quantile_cont(v, 0.5e0), 4) AS md
        |  FROM raw GROUP BY 1),
        |b AS (
        |  SELECT raw.k AS k,
        |    CAST(abs(CAST(raw.v AS DECIMAL(18,6)) -
        |      CAST(med.md AS DECIMAL(18,4))) AS DOUBLE) AS v
        |  FROM raw JOIN med ON med.k = raw.k),
        |g AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS ng,
        |    SUM(CAST(v AS DECIMAL(18,6))) AS sg,
        |    SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))) AS qg
        |  FROM b GROUP BY 1),
        |g2 AS (
        |  SELECT *, CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
        |    CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6)) AS tg FROM g),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    SUM(sg) AS s, SUM(qg) AS q, SUM(tg) AS bsum
        |  FROM g2),
        |o AS (
        |  SELECT k_groups, n,
        |    round(CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) *
        |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ssb,
        |    CAST(round(CAST(q AS DECIMAL(30,12)) -
        |      CAST(bsum AS DECIMAL(24,6)), 6) AS DOUBLE) AS ssw
        |  FROM t)
        |SELECT k_groups, n, ssb, ssw,
        |  CASE WHEN k_groups > 1 AND n > k_groups AND ssw > 0 THEN
        |    round((ssb / (CAST(k_groups AS DOUBLE) - 1.0e0)) /
        |      (ssw / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))), 6)
        |  END AS f,
        |  CASE WHEN CAST(CAST(ssb AS DECIMAL(28,6)) +
        |      CAST(ssw AS DECIMAL(28,6)) AS DOUBLE) > 0 THEN
        |    round(ssb / CAST(CAST(ssb AS DECIMAL(28,6)) +
        |      CAST(ssw AS DECIMAL(28,6)) AS DOUBLE), 6)
        |  END AS eta2
        |FROM o""".stripMargin,

    // the scalar high-water day via cross join; counts/dates exact,
    // mean through the decimal sum
    "q20_churn" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy, value
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |m AS (SELECT MAX(dy) AS maxd FROM e),
        |k AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT dy) AS BIGINT) AS active_days,
        |    MIN(dy) AS first_day, MAX(dy) AS last_day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(value) AS DOUBLE), 6) AS mean_value
        |  FROM e GROUP BY 1, 2)
        |SELECT user_id, event_type, n_events, active_days, first_day,
        |  last_day,
        |  CAST(datediff('day', last_day, m.maxd) AS INTEGER)
        |    AS recency_days,
        |  datediff('day', last_day, m.maxd) > 2 AS churned, mean_value
        |FROM k CROSS JOIN m ORDER BY user_id, event_type""".stripMargin,

    // both orderings replayed over the same hashed shards; exact
    // decimal deltas, the o5 percentile rule on their doubles
    "z9_delta" -> {
      def aggCte(src: String, t: String) =
        s"""SELECT '$t' AS tag, shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  round(CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) /
           |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_abs_delta,
           |  round(quantile_cont(CAST(d AS DOUBLE), 0.9e0), 4)
           |    AS p90_abs_delta,
           |  round(CAST(MAX(d) AS DOUBLE), 6) AS max_abs_delta
           |FROM $src WHERE d IS NOT NULL GROUP BY 1, 2""".stripMargin
      s"""WITH base AS (
         |  SELECT o_orderkey AS id, o_totalprice AS raw,
         |    CAST(o_totalprice AS DECIMAL(19,6)) AS v,
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('delta:' ||
         |          COALESCE(CAST(o_orderkey AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) % 8 AS shard
         |  FROM orders
         |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
         |srt AS (
         |  SELECT shard, abs(v - lag(v) OVER (PARTITION BY shard
         |    ORDER BY raw, id)) AS d FROM base),
         |arr AS (
         |  SELECT shard, abs(v - lag(v) OVER (PARTITION BY shard
         |    ORDER BY id, id)) AS d FROM base),
         |u AS (
         |${aggCte("srt", "sorted")}
         |UNION ALL
         |${aggCte("arr", "arrival")})
         |SELECT * FROM u ORDER BY tag, shard""".stripMargin
    },

    // 4-rounded dyadic-fraction boundaries (exact double literals),
    // bucket = count of boundaries ≤ v, exact share ratios
    "z8_rangebalance" -> {
      val bs = (1 until 8).map(i =>
        s"round(quantile_cont(v, ${i / 8.0}e0), 4) AS b${i - 1}")
        .mkString(",\n    ")
      val bucket = (0 until 7).map(i =>
        s"(CASE WHEN v >= b$i THEN 1 ELSE 0 END)").mkString(" +\n    ")
      s"""WITH b AS (
         |  SELECT o_totalprice AS v FROM orders
         |  WHERE o_totalprice IS NOT NULL),
         |q AS (
         |  SELECT $bs
         |  FROM b),
         |c AS (
         |  SELECT $bucket AS bucket
         |  FROM b CROSS JOIN q),
         |g AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM c GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM g)
         |SELECT bucket, n_rows,
         |  round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6)
         |    AS share,
         |  round(CAST(n_rows AS DOUBLE) * 8 / CAST(total AS DOUBLE), 6)
         |    AS ratio_to_even
         |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin
    },

    // exact decimal charge recompute (9,6 factors keep both engines
    // under the 38-digit multiply ceiling), LEFT join, decimal diffs;
    // the median reads diff doubles at 4 (the o5 rule)
    "dq12_reconcile" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ck,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |      (CAST(1.0 AS DECIMAL(8,6)) -
        |        CAST(l_discount AS DECIMAL(8,6))) *
        |      (CAST(1.0 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6))))
        |      AS DECIMAL(18,6)) AS csum
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderstatus, li.csum,
        |    CAST(o.o_totalprice AS DECIMAL(18,6)) - li.csum AS diff
        |  FROM orders o LEFT JOIN li ON li.ck = o.o_orderkey
        |  WHERE o.o_orderstatus IS NOT NULL)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_parents,
        |  CAST(SUM(CASE WHEN csum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_missing,
        |  CAST(SUM(CASE WHEN abs(diff) <= CAST(0.01 AS DECIMAL(18,6))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_tol,
        |  round(quantile_cont(CAST(diff AS DOUBLE), 0.5e0), 4) AS p50_diff,
        |  round(CAST(MAX(abs(diff)) AS DOUBLE), 6) AS max_abs_diff
        |FROM j GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    // per-fraction scalar quantile subselects; gap reads the 4-rounded
    // quantiles (difference of 4-decimal values — no half boundary)
    "o50_qq" -> {
      val rows = (1 to 9).map { i =>
        val p = i / 10.0
        s"""SELECT CAST($p AS DOUBLE) AS p,
           |  (SELECT round(quantile_cont(v, ${p}e0), 4) FROM b WHERE t)
           |    AS q_treat,
           |  (SELECT round(quantile_cont(v, ${p}e0), 4) FROM b WHERE NOT t)
           |    AS q_ctrl""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH b AS (
         |  SELECT (user_id % 2 = 1) AS t, value AS v FROM events
         |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
         |u AS (
         |$rows)
         |SELECT p, q_treat, q_ctrl, round(q_treat - q_ctrl, 4) AS gap
         |FROM u ORDER BY p""".stripMargin
    },

    // exact BIGINT daily counts + trailing-window integer moments; z
    // reads the raw mean/sd sequence, the flag reads the ROUNDED z
    "dq11_volume" ->
      """WITH counted AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
        |    AS DATE) AS day
        |  FROM (SELECT MIN(day) AS mn, MAX(day) AS mx FROM counted)),
        |daily AS (
        |  SELECT s.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
        |  FROM spine s LEFT JOIN counted c ON c.day = s.day),
        |w AS (
        |  SELECT day, n_rows,
        |    CAST(COUNT(n_rows) OVER win AS BIGINT) AS n_prior,
        |    CAST(SUM(n_rows) OVER win AS BIGINT) AS s,
        |    CAST(SUM(n_rows * n_rows) OVER win AS BIGINT) AS q
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING
        |                 AND 1 PRECEDING)),
        |x AS (
        |  SELECT day, n_rows, n_prior,
        |    CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE) AS meanr,
        |    sqrt(greatest(CAST(q AS DOUBLE) / CAST(n_prior AS DOUBLE) -
        |      (CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE)) *
        |      (CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE)), 0.0e0)) AS sdr
        |  FROM w),
        |y AS (
        |  SELECT day, n_rows, n_prior,
        |    CASE WHEN n_prior > 0 THEN round(meanr, 6) END AS mean_prior,
        |    CASE WHEN n_prior > 0 THEN round(sdr, 6) END AS sd_prior,
        |    CASE WHEN n_prior = 7 AND sdr > 0 THEN
        |      round((CAST(n_rows AS DOUBLE) - meanr) / sdr, 6) END AS z
        |  FROM x)
        |SELECT day, n_rows, n_prior, mean_prior, sd_prior, z,
        |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) > 3.0e0 END AS anomalous
        |FROM y ORDER BY day""".stripMargin,

    // the o16 moment replay specialized to the triple; the partial reads
    // the three 6-rounded r's only
    "o48_partialcorr" ->
      """WITH c AS (
        |  SELECT l_quantity AS x, l_extendedprice AS y, l_discount AS z
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(z AS DECIMAL(18,6))) AS DOUBLE) AS sz,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pxz,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pyz,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pyy,
        |    CAST(SUM(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)))
        |      AS DOUBLE) AS pzz
        |  FROM c),
        |r AS (
        |  SELECT n,
        |    CASE WHEN (CAST(n AS DOUBLE) * pxx - sx * sx) > 0
        |          AND (CAST(n AS DOUBLE) * pyy - sy * sy) > 0 THEN
        |      round((CAST(n AS DOUBLE) * pxy - sx * sy) /
        |        (sqrt(CAST(n AS DOUBLE) * pxx - sx * sx) *
        |         sqrt(CAST(n AS DOUBLE) * pyy - sy * sy)), 6) END AS r_xy,
        |    CASE WHEN (CAST(n AS DOUBLE) * pxx - sx * sx) > 0
        |          AND (CAST(n AS DOUBLE) * pzz - sz * sz) > 0 THEN
        |      round((CAST(n AS DOUBLE) * pxz - sx * sz) /
        |        (sqrt(CAST(n AS DOUBLE) * pxx - sx * sx) *
        |         sqrt(CAST(n AS DOUBLE) * pzz - sz * sz)), 6) END AS r_xz,
        |    CASE WHEN (CAST(n AS DOUBLE) * pyy - sy * sy) > 0
        |          AND (CAST(n AS DOUBLE) * pzz - sz * sz) > 0 THEN
        |      round((CAST(n AS DOUBLE) * pyz - sy * sz) /
        |        (sqrt(CAST(n AS DOUBLE) * pyy - sy * sy) *
        |         sqrt(CAST(n AS DOUBLE) * pzz - sz * sz)), 6) END AS r_yz
        |  FROM m)
        |SELECT n, r_xy, r_xz, r_yz,
        |  CASE WHEN r_xy IS NOT NULL AND r_xz IS NOT NULL
        |        AND r_yz IS NOT NULL
        |        AND ((1.0e0 - r_xz * r_xz) * (1.0e0 - r_yz * r_yz)) > 0 THEN
        |    round((r_xy - r_xz * r_yz) /
        |      sqrt((1.0e0 - r_xz * r_xz) * (1.0e0 - r_yz * r_yz)), 6)
        |  END AS r_partial
        |FROM r""".stripMargin,

    // the o23 conditional-moment recipe; d reads raw sums, the label
    // reads the ROUNDED d
    "o49_cohensd" ->
      """WITH b AS (
        |  SELECT (user_id % 2 = 1) AS t, value AS v FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN t THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS s1,
        |    CAST(SUM(CASE WHEN NOT t THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS s0,
        |    CAST(SUM(CASE WHEN t THEN
        |      CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6)) END)
        |      AS DOUBLE) AS q1,
        |    CAST(SUM(CASE WHEN NOT t THEN
        |      CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6)) END)
        |      AS DOUBLE) AS q0
        |  FROM b),
        |x AS (
        |  SELECT *, q1 - s1 * s1 / CAST(n1 AS DOUBLE) AS ss1,
        |            q0 - s0 * s0 / CAST(n0 AS DOUBLE) AS ss0
        |  FROM m),
        |y AS (
        |  SELECT *, sqrt((ss1 + ss0) /
        |    (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0e0)) AS sp
        |  FROM x),
        |z AS (
        |  SELECT n1, n0, s1, s0, sp,
        |    CASE WHEN n1 >= 2 AND n0 >= 2 AND sp > 0 THEN
        |      round((s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE))
        |        / sp, 6) END AS d
        |  FROM y)
        |SELECT n1 AS n_treat, n0 AS n_ctrl,
        |  CASE WHEN n1 > 0 THEN round(s1 / CAST(n1 AS DOUBLE), 6) END
        |    AS mean_treat,
        |  CASE WHEN n0 > 0 THEN round(s0 / CAST(n0 AS DOUBLE), 6) END
        |    AS mean_ctrl,
        |  CASE WHEN n1 >= 2 AND n0 >= 2 THEN round(sp, 6) END AS pooled_sd,
        |  d,
        |  CASE WHEN d IS NULL THEN NULL
        |       WHEN abs(d) < 0.2e0 THEN 'negligible'
        |       WHEN abs(d) < 0.5e0 THEN 'small'
        |       WHEN abs(d) < 0.8e0 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM z""".stripMargin,

    // milli-unit integer moments (deviation 3-rounded in DECIMAL, the
    // o46 boundary rule), 19-digit product chain, one IEEE sqrt
    "o47_jarque" ->
      """WITH b AS (
        |  SELECT event_type AS k, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |m AS (
        |  SELECT k, round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean
        |  FROM b GROUP BY 1),
        |wv AS (
        |  SELECT b.k,
        |    CAST(round(CAST(b.v AS DECIMAL(18,6)) -
        |      CAST(m.mean AS DECIMAL(18,6)), 3) * 1000 AS BIGINT) AS w
        |  FROM b JOIN m ON m.k = b.k),
        |g AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(w * w) AS BIGINT) AS s2,
        |    SUM(CAST(w * w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0)))
        |      AS s3,
        |    SUM(CAST(w * w AS DECIMAL(19,0)) * CAST(w * w AS DECIMAL(19,0)))
        |      AS s4
        |  FROM wv GROUP BY 1),
        |x AS (
        |  SELECT k, n, s2,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS m3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS m4
        |  FROM g),
        |y AS (
        |  SELECT k, n, s2,
        |    m3 / (m2 * sqrt(m2)) AS skew,
        |    m4 / (m2 * m2) - 3.0e0 AS kex
        |  FROM x),
        |z AS (
        |  SELECT k, n,
        |    CASE WHEN s2 > 0 THEN round(skew, 6) END AS skewness,
        |    CASE WHEN s2 > 0 THEN round(kex, 6) END AS kurtosis_ex,
        |    CASE WHEN s2 > 0 THEN
        |      round(CAST(n AS DOUBLE) / 6.0e0 *
        |        (skew * skew + kex * kex / 4.0e0), 6) END AS jb
        |  FROM y)
        |SELECT k AS event_type, n, skewness, kurtosis_ex, jb,
        |  CASE WHEN jb IS NULL THEN NULL ELSE jb < 5.99e0 END AS normal_ish
        |FROM z ORDER BY event_type""".stripMargin,

    // exact BIGINT bucket cumulatives, fixed interpolation sequence,
    // R-7 exact side — everything at the o5 4-rounding
    "sk9_histq" ->
      """WITH b AS (
        |  SELECT event_type AS k, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |hist AS (
        |  SELECT k, CAST(floor(v / 25.0e0) AS BIGINT) AS bkt,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |cum AS (
        |  SELECT k, bkt, c,
        |    CAST(coalesce(SUM(c) OVER (PARTITION BY k ORDER BY bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum0
        |  FROM hist),
        |tot AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |grid(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
        |est AS (
        |  SELECT c2.k, g.p, t.n,
        |    round(CAST(c2.bkt AS DOUBLE) * 25.0e0 +
        |      25.0e0 * (g.p * CAST(t.n AS DOUBLE) - CAST(c2.cum0 AS DOUBLE))
        |        / CAST(c2.c AS DOUBLE), 4) AS est_q
        |  FROM cum c2 JOIN tot t ON t.k = c2.k CROSS JOIN grid g
        |  WHERE CAST(c2.cum0 AS DOUBLE) < g.p * CAST(t.n AS DOUBLE)
        |    AND CAST(c2.cum0 + c2.c AS DOUBLE) >= g.p * CAST(t.n AS DOUBLE)),
        |ex AS (
        |  SELECT k, CAST(0.5 AS DOUBLE) AS p,
        |    round(quantile_cont(v, 0.5e0), 4) AS exact_q FROM b GROUP BY 1
        |  UNION ALL
        |  SELECT k, CAST(0.95 AS DOUBLE),
        |    round(quantile_cont(v, 0.95e0), 4) FROM b GROUP BY 1)
        |SELECT est.k AS event_type, est.p AS p, est.n, est.est_q,
        |  ex.exact_q, round(abs(est.est_q - ex.exact_q), 4) AS abs_err
        |FROM est JOIN ex ON ex.k = est.k AND ex.p = est.p
        |ORDER BY event_type, est.p""".stripMargin,

    // R-7 quartiles at the o5 4-rounding; fence arithmetic entirely in
    // DECIMAL on the rounded quartiles (a double round of q1 − 1.5·iqr
    // hit a half-ulp boundary on this data), counts compare raw values
    "o46_tukey" ->
      """WITH b AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |f AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    round(quantile_cont(value, 0.25e0), 4) AS q1,
        |    round(quantile_cont(value, 0.75e0), 4) AS q3
        |  FROM b GROUP BY 1),
        |f2 AS (SELECT *, CAST(q1 AS DECIMAL(18,4)) AS q1d,
        |              CAST(q3 AS DECIMAL(18,4)) AS q3d FROM f),
        |fi AS (SELECT *, (q3d - q1d) AS iqrd FROM f2),
        |f3 AS (SELECT event_type, n, q1, q3,
        |    CAST(iqrd AS DOUBLE) AS iqr,
        |    CAST(q1d - CAST(1.5 AS DECIMAL(5,4)) * iqrd AS DOUBLE) AS lo,
        |    CAST(q3d + CAST(1.5 AS DECIMAL(5,4)) * iqrd AS DOUBLE) AS hi
        |  FROM fi)
        |SELECT f3.event_type AS event_type, n, q1, q3, iqr, lo, hi,
        |  CAST(SUM(CASE WHEN b.value < f3.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(SUM(CASE WHEN b.value > f3.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high
        |FROM b JOIN f3 ON f3.event_type = b.event_type
        |GROUP BY 1, 2, 3, 4, 5, 6, 7
        |ORDER BY f3.event_type""".stripMargin,

    // one fused count/exact-distinct pass unpivoted to rows
    "dq10_keys" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(o_orderkey) AS BIGINT) AS nn1,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
        |    CAST(COUNT(o_custkey) AS BIGINT) AS nn2,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
        |    CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3,
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3
        |  FROM orders),
        |u AS (
        |  SELECT 'o_orderkey' AS column_name, n_rows,
        |    nn1 AS n_nonnull, nd1 AS n_distinct FROM m
        |  UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2 FROM m
        |  UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3 FROM m)
        |SELECT column_name, n_rows, n_nonnull, n_distinct,
        |  CASE WHEN n_nonnull > 0 THEN
        |    round(CAST(n_nonnull - n_distinct AS DOUBLE) /
        |      CAST(n_nonnull AS DOUBLE), 6) END AS dup_rate,
        |  (n_nonnull = n_rows AND n_distinct = n_rows) AS is_key
        |FROM u ORDER BY column_name""".stripMargin,

    // the plain box scan — the covering ranges plus the exact predicate
    // must reproduce it row for row (identity proof)
    "z7_hilbert_ranges" ->
      """SELECT o_orderkey,
        |  CAST(o_custkey % 1024 AS BIGINT) AS qx,
        |  CAST(o_orderkey % 1024 AS BIGINT) AS qy
        |FROM orders
        |WHERE (o_custkey % 1024) BETWEEN 100 AND 399
        |  AND (o_orderkey % 1024) BETWEEN 200 AND 599
        |ORDER BY o_orderkey""".stripMargin,

    // the smoothed-share PSI replay: exact BIGINT band counts, ln at 9,
    // contributions at 9 DECIMAL-summed, flags read the ROUNDED total
    "dq9_psi" ->
      """WITH cells AS (
        |  SELECT CAST(floor(value / 25.0e0) AS BIGINT) AS band,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
        |    CAST(SUM(n_cur) AS BIGINT) AS tc,
        |    CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM cells),
        |x AS (
        |  SELECT band, n_ref, n_cur,
        |    CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE) AS p,
        |    CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE) AS q
        |  FROM cells CROSS JOIN t),
        |c AS (
        |  SELECT *, round((p - q) * round(ln(p / q), 9), 9) AS contrib9
        |  FROM x),
        |s AS (
        |  SELECT round(CAST(SUM(CAST(contrib9 AS DECIMAL(28,9)))
        |    AS DOUBLE), 6) AS psi
        |  FROM c)
        |SELECT band, n_ref, n_cur,
        |  round(p, 6) AS p_ref, round(q, 6) AS p_cur,
        |  round(contrib9, 6) AS contrib, s.psi AS psi,
        |  CASE WHEN s.psi < 0.1e0 THEN 'stable'
        |       WHEN s.psi < 0.25e0 THEN 'moderate'
        |       ELSE 'shifted' END AS drift_flag
        |FROM c CROSS JOIN s ORDER BY band""".stripMargin,

    // the boot:b:id hash-multiplicity replay against the shared
    // Poisson(1) CDF ladder literals; R-7 quantiles on 6-rounded means
    "o44_bootstrap" -> {
      val cdf = graft.operators.Features.poissonCdfLiterals(5)
      val kExpr = cdf.map(c => s"(CASE WHEN u > $c THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val bVals = (0 until 32).map(i => s"($i)").mkString(", ")
      s"""WITH b(b) AS (VALUES $bVals),
         |r AS (
         |  SELECT b.b, o.o_totalprice AS v,
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('boot:' ||
         |          CAST(b.b AS VARCHAR) || ':' ||
         |          CAST(o.o_orderkey AS VARCHAR)), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS hv
         |  FROM orders o CROSS JOIN b
         |  WHERE o.o_orderkey IS NOT NULL AND o.o_totalprice IS NOT NULL),
         |kk AS (
         |  SELECT b, v,
         |    CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0 AS u
         |  FROM r),
         |k2 AS (SELECT b, v, CAST($kExpr AS BIGINT) AS k FROM kk),
         |means AS (
         |  SELECT b, CAST(SUM(k) AS BIGINT) AS m,
         |    SUM(CAST(CAST(v AS DECIMAL(18,6)) * k AS DECIMAL(28,6))) AS sw
         |  FROM k2 GROUP BY b),
         |mm AS (
         |  SELECT round(CAST(sw AS DOUBLE) / CAST(m AS DOUBLE), 6) AS mean_b
         |  FROM means WHERE m > 0),
         |f AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS mean_full
         |  FROM orders
         |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
         |ci AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
         |    round(quantile_cont(mean_b, 0.025e0), 6) AS ci_lo,
         |    round(quantile_cont(mean_b, 0.975e0), 6) AS ci_hi
         |  FROM mm)
         |SELECT f.n_rows, f.mean_full, ci.n_resamples, ci.ci_lo, ci.ci_hi
         |FROM f CROSS JOIN ci""".stripMargin
    },

    // the o32 residual chain closed by the o10 med/MAD replay at 2.5
    "pipe6_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, v,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |      / 7.0e0, 6) AS tr
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT event_type, day, v,
        |    CASE WHEN wn = 7 THEN tr END AS trend,
        |    CAST(datediff('day', DATE '1970-01-05', day) % 7 AS INT) AS dow
        |  FROM t),
        |dt AS (SELECT *, CASE WHEN trend IS NOT NULL
        |         THEN round(v - trend, 6) END AS detr FROM t2),
        |se AS (
        |  SELECT event_type, dow,
        |    round(CAST(SUM(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS seasonal
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2),
        |res AS (
        |  SELECT d.event_type, d.day,
        |    round(d.v - d.trend - se.seasonal, 6) AS resid
        |  FROM dt d JOIN se
        |    ON se.event_type = d.event_type AND se.dow = d.dow
        |  WHERE d.trend IS NOT NULL AND se.seasonal IS NOT NULL),
        |med AS (SELECT event_type, round(quantile_cont(resid, 0.5), 6) AS med
        |        FROM res GROUP BY 1),
        |dev AS (
        |  SELECT r.event_type, r.day, r.resid, m.med,
        |    abs(r.resid - m.med) AS dv
        |  FROM res r JOIN med m ON m.event_type = r.event_type),
        |mad AS (SELECT event_type, round(quantile_cont(dv, 0.5), 6) AS mad
        |        FROM dev GROUP BY 1),
        |z AS (
        |  SELECT d.event_type, d.day, d.resid, d.med, mad.mad,
        |    CASE WHEN mad.mad > 0
        |         THEN round(0.6745e0 * (d.resid - d.med) / mad.mad, 6)
        |         ELSE 0.0e0 END AS mz
        |  FROM dev d JOIN mad ON mad.event_type = d.event_type)
        |SELECT event_type, day, resid, med, mad, mz,
        |  abs(mz) > 2.5e0 AS outlier
        |FROM z ORDER BY event_type, day""".stripMargin,

    // pairwise 9-rounded slopes, R-7 median per key
    "o38_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    round((b.v - a.v) /
        |      CAST(datediff('day', a.day, b.day) AS DOUBLE), 9) AS slope
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(quantile_cont(slope, 0.5), 6) AS slope
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,

    // decimal moments; the z-sum is the shared driver literal (neither
    // engine's inverse-normal is consulted); identical double sequence
    "q16_power" ->
      """WITH m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(19,6)) *
        |      CAST(value AS DECIMAL(19,6))) AS DOUBLE) AS q
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1)
        |SELECT event_type, n,
        |  round(s / CAST(n AS DOUBLE), 6) AS mean_v,
        |  round(sqrt(greatest(q / CAST(n AS DOUBLE)
        |    - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)), 0.0e0)), 6)
        |    AS sd,
        |  CASE WHEN n >= 2 AND greatest(q / CAST(n AS DOUBLE)
        |      - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)), 0.0e0) > 0
        |  THEN round(2.801585e0 * sqrt(greatest(q / CAST(n AS DOUBLE)
        |      - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)), 0.0e0))
        |    * 2.0e0 / sqrt(CAST(n AS DOUBLE)), 6) END AS mde_abs,
        |  CASE WHEN n >= 2 AND greatest(q / CAST(n AS DOUBLE)
        |      - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)), 0.0e0) > 0
        |    AND s / CAST(n AS DOUBLE) <> 0
        |  THEN round((2.801585e0 * sqrt(greatest(q / CAST(n AS DOUBLE)
        |      - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)), 0.0e0))
        |    * 2.0e0 / sqrt(CAST(n AS DOUBLE)))
        |    / (s / CAST(n AS DOUBLE)), 6) END AS mde_rel
        |FROM m ORDER BY event_type""".stripMargin,

    // per-distinct-value cumulative counts, exact-int ratios rounded at
    // 9 before the closing max
    // 6-rounded half-means, the o11 moment discipline on the (even,
    // odd) pairs, one SB closing
    "o107_splithalf" ->
      """WITH b AS (
        |  SELECT user_id AS u, ((event_id % 2) + 2) % 2 AS h,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
        |    AND value IS NOT NULL),
        |hm AS (
        |  SELECT u, h, round(CAST(SUM(v) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS m
        |  FROM b GROUP BY 1, 2),
        |wide AS (
        |  SELECT u, MAX(CASE WHEN h = 0 THEN m END) AS e,
        |    MAX(CASE WHEN h = 1 THEN m END) AS o
        |  FROM hm GROUP BY 1),
        |w2 AS (SELECT * FROM wide WHERE e IS NOT NULL AND o IS NOT NULL),
        |mm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(e AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(o AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(e AS DECIMAL(19,6)) *
        |             CAST(o AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(e AS DECIMAL(19,6)) *
        |             CAST(e AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(o AS DECIMAL(19,6)) *
        |             CAST(o AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM w2),
        |u AS (
        |  SELECT n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS uxy,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS uxx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS uyy
        |  FROM mm)
        |SELECT n AS n_units,
        |  CASE WHEN n > 1 AND uxx > 0 AND uyy > 0 THEN
        |    round(uxy / sqrt(uxx * uyy), 6) END AS r,
        |  CASE WHEN n > 1 AND uxx > 0 AND uyy > 0 THEN
        |    CASE WHEN 1.0e0 + uxy / sqrt(uxx * uyy) <> 0 THEN
        |      round(2.0e0 * (uxy / sqrt(uxx * uyy)) /
        |        (1.0e0 + uxy / sqrt(uxx * uyy)), 6) END
        |  END AS spearman_brown
        |FROM u""".stripMargin,

    // one keyed integer-moment agg; dispersion/χ² fixed double closings
    "o108_dispersion" ->
      """WITH c AS (
        |  SELECT event_type AS g, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
        |      AS DOUBLE) AS s2
        |  FROM c GROUP BY 1)
        |SELECT g AS event_type, n AS n_units,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  CASE WHEN n > 1 THEN
        |    round((CAST(n AS DOUBLE) * s2 -
        |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)), 6)
        |  END AS variance,
        |  CASE WHEN n > 1 AND s1 > 0 THEN
        |    round(((CAST(n AS DOUBLE) * s2 -
        |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0))) /
        |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |  END AS dispersion,
        |  CASE WHEN n > 1 AND s1 > 0 THEN
        |    round((CAST(n AS DOUBLE) - 1.0e0) *
        |      ((CAST(n AS DOUBLE) * s2 -
        |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0))) /
        |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |  END AS chi2,
        |  CAST(n - 1 AS BIGINT) AS dof
        |FROM m ORDER BY event_type""".stripMargin,

    // the o37 pooled-ECDF CTEs; per-value (ca+cb)·gap² terms 9-rounded
    // through DECIMAL(28,9), one closing factor
    // the o106 pooled-ECDF chain; (N·M − n·B) in DECIMAL(19,0)
    // products, one fixed double expression per term, 9-rounded
    // DECIMAL(28,9) sums; the B = N endpoint excluded (0/0 weight)
    "o116_anderson" ->
      """WITH d AS (
        |  SELECT CAST(l_returnflag AS VARCHAR) AS g, l_extendedprice AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IN ('R', 'N')),
        |counts AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM d),
        |cum AS (
        |  SELECT ca, cb,
        |    CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM counts),
        |t AS (
        |  SELECT tot.n_a, tot.n_b,
        |    CAST(ca + cb AS DOUBLE) AS ld,
        |    CAST(n_a + n_b AS DOUBLE) AS nd,
        |    CAST(cuma + cumb AS DOUBLE) AS bd,
        |    CAST(CAST(n_a + n_b AS DECIMAL(19,0)) *
        |        CAST(cuma AS DECIMAL(19,0)) -
        |      CAST(n_a AS DECIMAL(19,0)) *
        |        CAST(cuma + cumb AS DECIMAL(19,0)) AS DOUBLE) AS da,
        |    CAST(CAST(n_a + n_b AS DECIMAL(19,0)) *
        |        CAST(cumb AS DECIMAL(19,0)) -
        |      CAST(n_b AS DECIMAL(19,0)) *
        |        CAST(cuma + cumb AS DECIMAL(19,0)) AS DOUBLE) AS db
        |  FROM cum, tot
        |  WHERE n_a > 0 AND n_b > 0 AND cuma + cumb < n_a + n_b),
        |terms AS (
        |  SELECT n_a, n_b,
        |    CAST(round(ld * da * da / (nd * bd * (nd - bd) *
        |      CAST(n_a AS DOUBLE)), 9) AS DECIMAL(28,9)) AS ta,
        |    CAST(round(ld * db * db / (nd * bd * (nd - bd) *
        |      CAST(n_b AS DOUBLE)), 9) AS DECIMAL(28,9)) AS tb
        |  FROM t)
        |SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_support,
        |  round(CAST(SUM(ta) AS DOUBLE) + CAST(SUM(tb) AS DOUBLE), 6)
        |    AS a2
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "o106_cvm" ->
      """WITH d AS (
        |  SELECT CAST(l_returnflag AS VARCHAR) AS g, l_extendedprice AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IN ('R', 'N')),
        |counts AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM d),
        |cum AS (
        |  SELECT ca, cb,
        |    CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM counts),
        |u AS (
        |  SELECT tot.n_a, tot.n_b,
        |    CAST(SUM(CAST(round(CAST(ca + cb AS DOUBLE) *
        |      ((CAST(cuma AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |        CAST(cumb AS DOUBLE) / CAST(n_b AS DOUBLE)) *
        |       (CAST(cuma AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |        CAST(cumb AS DOUBLE) / CAST(n_b AS DOUBLE))), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS uu
        |  FROM cum, tot WHERE n_a > 0 AND n_b > 0 GROUP BY 1, 2)
        |SELECT n_a, n_b,
        |  round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
        |    ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
        |     (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) * uu, 6)
        |    AS t_stat
        |FROM u""".stripMargin,

    // the q10 quantile_cont cutoffs replayed for both halves; ties at a
    // cutoff land in the lower bucket on both sides
    "q30_decile_migration" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(coalesce(SUM(CASE WHEN CAST(o_orderdate AS DATE) <
        |      DATE '1998-05-01' THEN CAST(o_totalprice AS DECIMAL(18,2))
        |      END), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS h1,
        |    CAST(coalesce(SUM(CASE WHEN CAST(o_orderdate AS DATE) >=
        |      DATE '1998-05-01' THEN CAST(o_totalprice AS DECIMAL(18,2))
        |      END), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS h2
        |  FROM orders GROUP BY 1),
        |q AS (SELECT
        |    quantile_cont(h1, [0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS q1,
        |    quantile_cont(h2, [0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS q2
        |  FROM per),
        |s AS (SELECT
        |    CAST(1 + (CASE WHEN h1 > q1[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h1 > q1[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h1 > q1[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h1 > q1[4] THEN 1 ELSE 0 END) AS INT)
        |      AS h1_score,
        |    CAST(1 + (CASE WHEN h2 > q2[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h2 > q2[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h2 > q2[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN h2 > q2[4] THEN 1 ELSE 0 END) AS INT)
        |      AS h2_score
        |  FROM per CROSS JOIN q),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM s),
        |g AS (SELECT h1_score, h2_score, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s GROUP BY 1, 2)
        |SELECT h1_score, h2_score, n,
        |  round(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share
        |FROM g CROSS JOIN t
        |ORDER BY h1_score, h2_score""".stripMargin,

    "o37_ks" ->
      """WITH d AS (
        |  SELECT CAST(l_returnflag AS VARCHAR) AS g, l_extendedprice AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IN ('R', 'N')),
        |counts AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM d),
        |cum AS (
        |  SELECT
        |    CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM counts)
        |SELECT tot.n_a, tot.n_b,
        |  max(round(abs(CAST(cuma AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(cumb AS DOUBLE) / CAST(n_b AS DOUBLE)), 9)) AS d_stat
        |FROM cum, tot GROUP BY 1, 2""".stripMargin,

    // exact conditional counts; (o−e)²/e with the identical expected
    // doubles; srm reads the rounded chi2
    "q15_srm" ->
      """WITH m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_ctrl
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (
        |  SELECT n_treat, n_ctrl,
        |    CASE WHEN n_treat + n_ctrl > 0 THEN round(
        |      (CAST(n_treat AS DOUBLE)
        |        - CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0)
        |      * (CAST(n_treat AS DOUBLE)
        |         - CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0)
        |      / (CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0)
        |      + (CAST(n_ctrl AS DOUBLE)
        |         - CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0)
        |        * (CAST(n_ctrl AS DOUBLE)
        |           - CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0)
        |        / (CAST(n_treat + n_ctrl AS DOUBLE) * 0.5e0), 6)
        |    END AS chi2
        |  FROM m)
        |SELECT n_treat, n_ctrl, chi2,
        |  CASE WHEN chi2 IS NULL THEN NULL
        |       ELSE chi2 > 3.841459e0 END AS srm
        |FROM c""".stripMargin,

    // keyed max-ts + the broadcast global high-water mark; exact micros,
    // integer-div seconds
    "dq7_freshness" ->
      """WITH per AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    max(ts) AS max_ts
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT max(max_ts) AS gmax FROM per)
        |SELECT event_type, n, max_ts,
        |  CAST((epoch_us(gmax) - epoch_us(max_ts)) // 1000000 AS BIGINT)
        |    AS staleness_s
        |FROM per, g ORDER BY event_type""".stripMargin,

    // the calendar self-join (never a row lag), per-row decimal error
    // terms, the 9-rounded ratio before the decimal sum
    "o35_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.v, b.v AS f
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.day = a.day - 7)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(abs(v - f) AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mae,
        |  CASE WHEN COUNT(CASE WHEN v <> 0 THEN 1 END) > 0 THEN
        |    round(CAST(SUM(CASE WHEN v <> 0 THEN
        |        CAST(round(abs(v - f) / abs(v), 9) AS DECIMAL(28,9)) END)
        |      AS DOUBLE) /
        |      CAST(COUNT(CASE WHEN v <> 0 THEN 1 END) AS DOUBLE), 6)
        |  END AS mape,
        |  round(CAST(SUM(CAST(v - f AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS bias
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,

    // 6-rounded median, IS DISTINCT FROM run boundaries, the identical
    // double mu/sigma sequence on exact counts
    "o36_runs" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |med AS (SELECT event_type, round(quantile_cont(v, 0.5), 6) AS m
        |        FROM daily GROUP BY 1),
        |sided AS (
        |  SELECT d.event_type, d.day, d.v > med.m AS above
        |  FROM daily d JOIN med ON med.event_type = d.event_type
        |  WHERE d.v <> med.m),
        |flg AS (
        |  SELECT event_type, above,
        |    CASE WHEN lag(above) OVER (PARTITION BY event_type ORDER BY day)
        |         IS DISTINCT FROM above THEN 1 ELSE 0 END AS nw
        |  FROM sided),
        |a AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |    CAST(SUM(nw) AS BIGINT) AS runs
        |  FROM flg GROUP BY 1),
        |zc AS (
        |  SELECT event_type, n1, n2, runs,
        |    CASE WHEN n1 > 0 AND n2 > 0 AND
        |      2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
        |        (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) /
        |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0)) > 0
        |    THEN round((CAST(runs AS DOUBLE) -
        |      (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) /
        |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0)) /
        |      sqrt(2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
        |        (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) /
        |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0))), 6)
        |    END AS z
        |  FROM a)
        |SELECT event_type, n1, n2, runs, z,
        |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) < 1.96e0 END AS random
        |FROM zc ORDER BY event_type""".stripMargin,

    // the z5 band construction + a VALUES workload; inclusive range
    // intersection, one closing division
    "z6_prune_sim" ->
      """WITH d AS (
        |  SELECT CAST(l_shipdate AS DATE) AS sd, l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_shipdate IS NOT NULL),
        |r AS (
        |  SELECT sd,
        |    row_number() OVER (ORDER BY sd, l_orderkey, l_linenumber) AS rn
        |  FROM d),
        |f AS (
        |  SELECT CAST((rn - 1) // 2000 AS BIGINT) AS file_id,
        |    min(sd) AS lo, max(sd) AS hi
        |  FROM r GROUP BY 1),
        |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM f),
        |p(pred_id, p_lo, p_hi) AS (VALUES
        |  (1, DATE '1995-01-01', DATE '1995-06-30'),
        |  (2, DATE '1996-01-01', DATE '1996-12-31'),
        |  (3, DATE '1999-01-01', DATE '2001-12-31'),
        |  (4, DATE '1995-03-01', DATE '1995-03-31'),
        |  (5, DATE '1990-01-01', DATE '1994-12-31')),
        |j AS (
        |  SELECT p.pred_id, p.p_lo, p.p_hi,
        |    CAST(SUM(CASE WHEN f.file_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_scanned
        |  FROM p LEFT JOIN f ON f.lo <= p.p_hi AND p.p_lo <= f.hi
        |  GROUP BY 1, 2, 3)
        |SELECT pred_id, p_lo, p_hi, n_scanned, n_files,
        |  round(CAST(n_scanned AS DOUBLE) /
        |    CAST(greatest(n_files, 1) AS DOUBLE), 6) AS scan_frac
        |FROM j, nf ORDER BY pred_id""".stripMargin,

    // the shared hdrLadder CASE both sides; all-integer bucketing and
    // cumulative ranks; quantile_cont is the R-7 exact side
    "sk8_hdr" -> {
      val whens = graft.operators.Sketches.hdrLadder
        .map { case (thr, w) => s"WHEN c >= $thr THEN CAST($w AS BIGINT)" }
        .mkString(" ")
      s"""WITH v AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS c
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |d AS (SELECT c FROM v WHERE c >= 1),
         |b AS (SELECT c, CASE $whens ELSE CAST(1 AS BIGINT) END AS w FROM d),
         |counts AS (
         |  SELECT CAST((c // w) * w AS BIGINT) AS bucket_lo,
         |    COUNT(*) AS cnt
         |  FROM b GROUP BY 1),
         |cum AS (
         |  SELECT bucket_lo, SUM(cnt) OVER (ORDER BY bucket_lo
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM counts),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         quantile_cont(c, [0.5, 0.9, 0.99]) AS qs FROM d),
         |qg(q, qi) AS (VALUES (0.5e0, 1), (0.9e0, 2), (0.99e0, 3)),
         |t AS (
         |  SELECT q, qi,
         |    CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT) AS target_rank
         |  FROM qg, ex),
         |est AS (
         |  SELECT t.q, t.qi, t.target_rank, min(c2.bucket_lo) AS est_lo
         |  FROM t JOIN cum c2 ON c2.cum >= t.target_rank
         |  GROUP BY 1, 2, 3)
         |SELECT est.q, est.target_rank, CAST(est.est_lo AS BIGINT) AS est_lo,
         |  round(ex.qs[est.qi], 6) AS exact,
         |  CASE WHEN ex.qs[est.qi] > 0
         |       THEN round(CAST(est.est_lo AS DOUBLE) / ex.qs[est.qi], 6)
         |  END AS ratio
         |FROM est, ex ORDER BY est.q""".stripMargin
    },

    // the o22 per-user construction closed by one decimal moment row;
    // sample (n−1) sd, identical parenthesization
    "o34_paired_t" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |            THEN CAST(value AS DECIMAL(18,6)) END), 0)
        |       - coalesce(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |            THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE)
        |      AS d
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(d AS DECIMAL(19,6)) * CAST(d AS DECIMAL(19,6)))
        |      AS DOUBLE) AS q
        |  FROM pu WHERE d IS NOT NULL)
        |SELECT n, round(s / CAST(n AS DOUBLE), 6) AS mean_d,
        |  CASE WHEN n >= 2 THEN round(sqrt(greatest(
        |    (q - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))
        |       * (s / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0e0),
        |    0.0e0)), 6) END AS sd_d,
        |  CASE WHEN n >= 2 AND greatest(
        |    (q - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))
        |       * (s / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0e0),
        |    0.0e0) > 0
        |  THEN round((s / CAST(n AS DOUBLE)) / (sqrt(greatest(
        |    (q - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))
        |       * (s / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0e0),
        |    0.0e0)) / sqrt(CAST(n AS DOUBLE))), 6) END AS t
        |FROM m""".stripMargin,

    // the o11 moment replay over 6-rounded log-log points (pre-rounded
    // so the DECIMAL(18,6) point casts are exact on both sides)
    "o33_elasticity" ->
      """WITH pts AS (
        |  SELECT p.p_brand,
        |    CAST(round(ln(CAST(l.l_extendedprice AS DOUBLE) /
        |      CAST(l.l_quantity AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(l.l_quantity AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS y
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
        |s AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS syy
        |  FROM pts GROUP BY 1),
        |f AS (
        |  SELECT p_brand, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM s)
        |SELECT p_brand, n,
        |  CASE WHEN den > 0 THEN round(num / den, 6) END AS slope,
        |  CASE WHEN den > 0
        |       THEN round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |  END AS intercept,
        |  CASE WHEN den > 0 AND deny > 0
        |       THEN round(num * num / (den * deny), 6) END AS r2
        |FROM f ORDER BY p_brand""".stripMargin,

    // exact conditional counts, 9-rounded post-ln woe read by iv_term,
    // decimal-summed iv window
    "o30_woe" ->
      """WITH per AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n0
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
        |               CAST(SUM(n0) AS BIGINT) AS t0 FROM per),
        |x AS (
        |  SELECT o_orderpriority, n1, n0, t1, t0,
        |    round(ln(((CAST(n1 AS DOUBLE) + 0.5e0) / CAST(t1 AS DOUBLE)) /
        |             ((CAST(n0 AS DOUBLE) + 0.5e0) / CAST(t0 AS DOUBLE))), 9)
        |      AS woe
        |  FROM per, tot),
        |y AS (
        |  SELECT o_orderpriority, n1, n0, woe,
        |    round((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
        |           - CAST(n0 AS DOUBLE) / CAST(t0 AS DOUBLE)) * woe, 9)
        |      AS iv_term
        |  FROM x),
        |z AS (SELECT *, round(CAST(SUM(CAST(iv_term AS DECIMAL(28,9)))
        |        OVER () AS DOUBLE), 6) AS iv FROM y)
        |SELECT o_orderpriority, n1, n0, woe, iv_term, iv FROM z
        |ORDER BY o_orderpriority""".stripMargin,

    // decimal rank-value products, one closing double sequence
    "o31_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x ASC) AS BIGINT)
        |        AS i FROM rev),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DECIMAL(28,2)) AS sx,
        |    CAST(SUM(CAST(x AS DECIMAL(19,2)) * CAST(i AS DECIMAL(19,0)))
        |      AS DECIMAL(38,2)) AS six
        |  FROM r)
        |SELECT n, round(CAST(sx AS DOUBLE), 2) AS total,
        |  CASE WHEN sx > 0 THEN
        |    round((2.0e0 * CAST(six AS DOUBLE)
        |           - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        |  END AS gini
        |FROM a""".stripMargin,

    // pure projection replay; cutoff − 1 day = Jan 19
    "sa16_timesplit" ->
      """SELECT event_id,
        |  CASE WHEN ts < TIMESTAMP '2024-01-19 00:00:00' THEN 'train'
        |       WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 'test'
        |       ELSE 'embargo' END AS split
        |FROM events WHERE ts IS NOT NULL ORDER BY event_id""".stripMargin,

    // the identical full-window-gated 7-day trend, pre-rounded detrended
    // values, per-(key, dow) seasonal means, left-joined residuals
    "o32_decompose" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, v,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |      / 7.0e0, 6) AS tr
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT event_type, day, v,
        |    CASE WHEN wn = 7 THEN tr END AS trend,
        |    CAST(datediff('day', DATE '1970-01-05', day) % 7 AS INT) AS dow
        |  FROM t),
        |dt AS (SELECT *, CASE WHEN trend IS NOT NULL
        |         THEN round(v - trend, 6) END AS detr FROM t2),
        |se AS (
        |  SELECT event_type, dow,
        |    round(CAST(SUM(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS seasonal
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.v, d.dow, d.trend, se.seasonal,
        |  CASE WHEN d.trend IS NOT NULL AND se.seasonal IS NOT NULL
        |       THEN round(d.v - d.trend - se.seasonal, 6) END AS resid
        |FROM dt d LEFT JOIN se
        |  ON se.event_type = d.event_type AND se.dow = d.dow
        |ORDER BY d.event_type, d.day""".stripMargin,

    // pairwise signs on the 6-rounded daily means, exact BIGINT S and
    // tie sums, one /18 division; z reads the UNrounded variance, the
    // trend label reads the ROUNDED z (both sides)
    "o29_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |      ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM daily GROUP BY 1),
        |t AS (SELECT event_type,
        |        CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |      FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
        |            FROM daily GROUP BY 1, 2)
        |      GROUP BY 1),
        |j AS (
        |  SELECT n.event_type, n.n, s.s,
        |    CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tsum AS DOUBLE)
        |      / 18.0e0 AS vs
        |  FROM n JOIN s ON s.event_type = n.event_type
        |         JOIN t ON t.event_type = n.event_type),
        |zc AS (
        |  SELECT event_type, n, s, round(vs, 6) AS var_s,
        |    CASE WHEN vs > 0 THEN
        |      round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(vs)
        |                 WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(vs)
        |                 ELSE 0.0e0 END, 6)
        |    END AS z
        |  FROM j)
        |SELECT event_type, n, s, var_s, z,
        |  CASE WHEN z IS NULL THEN NULL
        |       WHEN z >= 1.96e0 THEN 'increasing'
        |       WHEN z <= -1.96e0 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM zc ORDER BY event_type""".stripMargin,

    // entity decimal sums, per-nation (v desc, e) rank + running sum,
    // exact integer-scaled bar crossings (cum·den ≥ tot·num with the
    // predecessor below), one branch per bar
    "q32_pareto" -> {
      def bar(label: String, num: Int, den: Int): String =
        s"""SELECT nation, '$label' AS bar, rk AS n_to_bar, n_entities,
           |  round(CAST(rk AS DOUBLE) / CAST(n_entities AS DOUBLE), 6)
           |    AS entity_share,
           |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           |    AS covered_share
           |FROM j
           |WHERE cum * CAST($den AS DECIMAL(4,0)) >=
           |    tot * CAST($num AS DECIMAL(4,0))
           |  AND (cum - v) * CAST($den AS DECIMAL(4,0)) <
           |    tot * CAST($num AS DECIMAL(4,0))""".stripMargin
      s"""WITH ent AS (
         |  SELECT n_name AS nation, o_custkey AS e,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         |      AS DECIMAL(30,2)) AS v
         |  FROM orders
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON n_nationkey = c_nationkey
         |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT nation, e, v,
         |    CAST(row_number() OVER (PARTITION BY nation
         |      ORDER BY v DESC, e) AS BIGINT) AS rk,
         |    CAST(SUM(v) OVER (PARTITION BY nation ORDER BY v DESC, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS DECIMAL(30,2)) AS cum
         |  FROM ent),
         |t AS (SELECT nation, CAST(SUM(v) AS DECIMAL(30,2)) AS tot,
         |        CAST(COUNT(*) AS BIGINT) AS n_entities
         |      FROM ent GROUP BY 1),
         |j AS (SELECT r.nation, r.v, r.rk, r.cum, t.tot, t.n_entities
         |      FROM r JOIN t USING (nation))
         |${bar("p50", 1, 2)}
         |UNION ALL
         |${bar("p80", 4, 5)}
         |ORDER BY nation, bar""".stripMargin
    },

    // the daily CTE, decimal running peak, (dd desc, day) argmax, and
    // gaps-and-islands over the underwater rows
    "o111_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, day, CAST(v AS DECIMAL(18,6)) AS v,
        |    MAX(CAST(v AS DECIMAL(18,6))) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS peak
        |  FROM daily),
        |dd AS (SELECT event_type, day, v, peak, peak - v AS dd FROM d),
        |ix AS (SELECT event_type, dd,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM dd),
        |uw AS (SELECT event_type,
        |  i - row_number() OVER (PARTITION BY event_type ORDER BY i) AS grp
        |  FROM ix WHERE dd > 0),
        |runs AS (SELECT event_type, CAST(MAX(c) AS BIGINT)
        |    AS longest_underwater
        |  FROM (SELECT event_type, grp, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM uw GROUP BY 1, 2) GROUP BY 1),
        |worst AS (
        |  SELECT event_type, CAST(dd AS DOUBLE) AS max_dd, day AS dd_day,
        |    CAST(peak AS DOUBLE) AS peak
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |          ORDER BY dd DESC, day) AS r FROM dd)
        |  WHERE r = 1),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |      FROM daily GROUP BY 1)
        |SELECT n.event_type, n.n_days, worst.max_dd, worst.dd_day,
        |  worst.peak,
        |  CAST(coalesce(runs.longest_underwater, 0) AS BIGINT)
        |    AS longest_underwater
        |FROM n JOIN worst USING (event_type)
        |       LEFT JOIN runs USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // lag/lead on the 6-rounded series; E and Var from the BIGINT n
    // through the IDENTICAL double expressions, one sqrt/divide
    "o112_turning" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type, v, lag(v) OVER w AS p, lead(v) OVER w AS f
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(CASE WHEN p IS NOT NULL AND f IS NOT NULL AND
        |      ((v > p AND v > f) OR (v < p AND v < f)) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_turning
        |  FROM x GROUP BY 1)
        |SELECT event_type, n_days, n_turning,
        |  round(2.0e0 * (CAST(n_days AS DOUBLE) - 2.0e0) / 3.0e0, 6)
        |    AS expected,
        |  CASE WHEN n_days >= 3 THEN
        |    round((CAST(n_turning AS DOUBLE) -
        |      2.0e0 * (CAST(n_days AS DOUBLE) - 2.0e0) / 3.0e0) /
        |      sqrt((16.0e0 * CAST(n_days AS DOUBLE) - 29.0e0) / 90.0e0), 6)
        |  END AS z,
        |  CASE WHEN n_days >= 3 THEN
        |    CASE WHEN abs(round((CAST(n_turning AS DOUBLE) -
        |      2.0e0 * (CAST(n_days AS DOUBLE) - 2.0e0) / 3.0e0) /
        |      sqrt((16.0e0 * CAST(n_days AS DOUBLE) - 29.0e0) / 90.0e0), 6))
        |      <= 1.96e0 THEN 'random' ELSE 'nonrandom' END
        |  END AS verdict
        |FROM a ORDER BY event_type""".stripMargin,

    // the olsFit moment discipline on (x = v_{t−1}, y = Δv): exact
    // (18,6)² product sums cast double, ONE fixed expression chain to
    // slope/SE/stat, verdict on the ROUNDED stat
    "o114_adf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, CAST(v AS DECIMAL(18,6)) AS cv,
        |    CAST(lag(v) OVER (PARTITION BY event_type ORDER BY day)
        |      AS DECIMAL(18,6)) AS pv
        |  FROM daily),
        |b AS (
        |  SELECT event_type, pv AS x, CAST(cv - pv AS DECIMAL(18,6)) AS y
        |  FROM l WHERE pv IS NOT NULL),
        |s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM b GROUP BY 1),
        |c AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny
        |  FROM s),
        |f AS (
        |  SELECT event_type, n, den, num / den AS slope,
        |    (deny - (num / den) * num) /
        |      ((CAST(n AS DOUBLE) - 2.0e0) * den) AS se2
        |  FROM c)
        |SELECT event_type, n,
        |  CASE WHEN n > 2 AND den > 0 THEN round(slope, 6) END AS slope,
        |  CASE WHEN n > 2 AND den > 0 AND se2 > 0
        |    THEN round(slope / sqrt(se2), 6) END AS df_stat,
        |  CASE WHEN n > 2 AND den > 0 AND se2 > 0 THEN
        |    CASE WHEN round(slope / sqrt(se2), 6) < -2.89e0
        |      THEN 'stationary' ELSE 'unit_root' END END AS verdict
        |FROM f ORDER BY event_type""".stripMargin,

    // abundance spectrum counts exact; the bias-corrected closing is
    // total (f2 = 0 divides by 2)
    "sk19_chao1" ->
      """WITH s AS (
        |  SELECT l_partkey AS item FROM lineitem
        |  WHERE l_orderkey % 20 = 0 AND l_partkey IS NOT NULL),
        |c AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM s
        |      GROUP BY 1),
        |sp AS (
        |  SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n_items,
        |    CAST(COUNT(*) AS BIGINT) AS d_sample,
        |    CAST(coalesce(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS f1,
        |    CAST(coalesce(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS f2
        |  FROM c),
        |t AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        |        AS true_distinct FROM lineitem)
        |SELECT n_items, d_sample, f1, f2,
        |  round(CAST(d_sample AS DOUBLE) +
        |    CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0e0) /
        |      (2.0e0 * (CAST(f2 AS DOUBLE) + 1.0e0)), 6) AS chao1,
        |  true_distinct
        |FROM sp CROSS JOIN t""".stripMargin,

    // stratum weights × cell rates: each term 9-rounded and
    // DECIMAL-summed (exact-integer-ratio doubles on both sides)
    "o120_std_rate" ->
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal > 5000 AS rich
        |  FROM customer
        |  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        |    AND c_acctbal IS NOT NULL),
        |ref AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ns
        |        FROM base GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        |cells AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN rich THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM base GROUP BY 1, 2),
        |j AS (
        |  SELECT cells.c_nationkey, cells.c, cells.p,
        |    round((CAST(ref.ns AS DOUBLE) / CAST(t.n AS DOUBLE)) *
        |      (CAST(cells.p AS DOUBLE) / CAST(cells.c AS DOUBLE)), 9)
        |      AS term
        |  FROM cells JOIN ref USING (c_mktsegment) CROSS JOIN t)
        |SELECT c_nationkey, CAST(SUM(c) AS BIGINT) AS n,
        |  round(CAST(SUM(p) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
        |    AS crude_rate,
        |  round(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6)
        |    AS std_rate
        |FROM j GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    // the o15 pooled doubled mid-ranks, AB-scored min(d, 2(N+1)−d) in
    // BIGINT; parity-split classical null moments, one fixed double
    // chain mirrored operation for operation
    "o119_ansari" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type AS g, v FROM daily
        |  WHERE event_type IN ('click', 'view') AND v IS NOT NULL),
        |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS pooled FROM p),
        |r AS (
        |  SELECT g,
        |    CAST(rank() OVER (ORDER BY v ASC) AS BIGINT) AS minr,
        |    CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) AS t
        |  FROM p),
        |a AS (SELECT g, 2 * minr + t - 1 AS d FROM r),
        |s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN g = 'click'
        |      THEN LEAST(d, 2 * (pooled + 1) - d) ELSE 0 END) AS BIGINT)
        |      AS t2
        |  FROM a CROSS JOIN n0),
        |c AS (
        |  SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS na,
        |    CAST(n_b AS DOUBLE) AS nb, CAST(n_a + n_b AS DOUBLE) AS nn,
        |    (n_a + n_b) % 2 = 0 AS ev, CAST(t2 AS DOUBLE) / 2.0e0 AS t
        |  FROM s),
        |f AS (
        |  SELECT n_a, n_b, t,
        |    CASE WHEN ev THEN na * (nn + 2.0e0) / 4.0e0
        |         ELSE na * (nn + 1.0e0) * (nn + 1.0e0) / (4.0e0 * nn)
        |    END AS e,
        |    CASE WHEN ev THEN na * nb * (nn + 2.0e0) * (nn - 2.0e0) /
        |           (48.0e0 * (nn - 1.0e0))
        |         ELSE na * nb * (nn + 1.0e0) * (3.0e0 + nn * nn) /
        |           (48.0e0 * nn * nn)
        |    END AS var
        |  FROM c)
        |SELECT n_a, n_b, t AS ab_stat,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND var > 0
        |    THEN round((t - e) / sqrt(var), 6) END AS z,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND var > 0 THEN
        |    CASE WHEN abs(round((t - e) / sqrt(var), 6)) <= 1.96e0
        |      THEN 'same_scale' ELSE 'scale_differs' END END AS verdict
        |FROM f""".stripMargin,

    // the o114 moment discipline with two diff lags: exact (18,6)
    // differences, (18,6)² product sums cast double, one fixed chain to
    // the two population variances; verdict bands spelled (1±0.2) as
    // the sim8 rule (the Scala side computes 1.0 ± band)
    "o118_varratio" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, CAST(v AS DECIMAL(18,6)) AS cv,
        |    CAST(lag(v, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AS DECIMAL(18,6)) AS p1,
        |    CAST(lag(v, 5) OVER (PARTITION BY event_type ORDER BY day)
        |      AS DECIMAL(18,6)) AS pq
        |  FROM daily),
        |d AS (
        |  SELECT event_type, CAST(cv - p1 AS DECIMAL(18,6)) AS d1,
        |    CAST(cv - pq AS DECIMAL(18,6)) AS dq
        |  FROM l),
        |s AS (
        |  SELECT event_type,
        |    CAST(COUNT(d1) AS BIGINT) AS n1, CAST(SUM(d1) AS DOUBLE) AS s1,
        |    CAST(SUM(d1 * d1) AS DOUBLE) AS s11,
        |    CAST(COUNT(dq) AS BIGINT) AS nq, CAST(SUM(dq) AS DOUBLE) AS sq,
        |    CAST(SUM(dq * dq) AS DOUBLE) AS sqq
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT event_type, n1, nq,
        |    (CAST(n1 AS DOUBLE) * s11 - s1 * s1) /
        |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS var1,
        |    (CAST(nq AS DOUBLE) * sqq - sq * sq) /
        |      (CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE)) AS varq
        |  FROM s)
        |SELECT event_type, n1 AS n_diffs, nq AS n_qdiffs,
        |  CASE WHEN n1 > 1 AND nq > 1 AND var1 > 0
        |    THEN round(varq / (5.0e0 * var1), 6) END AS vr,
        |  CASE WHEN n1 > 1 AND nq > 1 AND var1 > 0 THEN
        |    CASE WHEN round(varq / (5.0e0 * var1), 6) < (1.0e0 - 0.2e0)
        |           THEN 'mean_reverting'
        |         WHEN round(varq / (5.0e0 * var1), 6) > (1.0e0 + 0.2e0)
        |           THEN 'trending'
        |         ELSE 'random_walk' END END AS verdict
        |FROM c ORDER BY event_type""".stripMargin,

    // the o102 power branches → DECIMAL(28,6) totals → t18-style
    // 9-rounded share·ln(share) terms / driver ln(#periods)
    "o115_spec_entropy" -> {
      val periods = Seq(3, 5, 7, 10)
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      val branches = periods.map { p =>
        val lad = graft.operators.TimeSeries.fourierLadder(p)
        def cc(sel: ((Double, Double)) => Double) = lad.zipWithIndex
          .map { case (v, r) => s"WHEN $r THEN ${l(sel(v))}" }
          .mkString(" ")
        s"""SELECT event_type, round(c * c + s * s, 6) AS power
           |FROM (
           |  SELECT event_type,
           |    CAST(SUM(CAST(round(v * CASE di % $p ${cc(_._1)} END, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS c,
           |    CAST(SUM(CAST(round(v * CASE di % $p ${cc(_._2)} END, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS s
           |  FROM pts GROUP BY 1) x$p""".stripMargin
      }
      val negLnP = -math.log(periods.size.toDouble)
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS v
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |pts AS (
         |  SELECT event_type,
         |    CAST(day - DATE '2024-01-01' AS BIGINT) AS di, v
         |  FROM daily),
         |pw AS (
         |${branches.mkString("\nUNION ALL\n")}),
         |pd AS (SELECT event_type, CAST(power AS DECIMAL(28,6)) AS p
         |       FROM pw),
         |tot AS (SELECT event_type, SUM(p) AS t,
         |          CAST(COUNT(*) AS BIGINT) AS n_periods
         |        FROM pd GROUP BY 1),
         |terms AS (
         |  SELECT pd.event_type, tot.n_periods, tot.t,
         |    CASE WHEN tot.t > 0 AND pd.p > 0 THEN
         |      CAST(round((CAST(pd.p AS DOUBLE) / CAST(tot.t AS DOUBLE)) *
         |        ln(CAST(pd.p AS DOUBLE) / CAST(tot.t AS DOUBLE)), 9)
         |        AS DECIMAL(28,9))
         |    ELSE CAST(0.0e0 AS DECIMAL(28,9)) END AS term
         |  FROM pd JOIN tot ON tot.event_type = pd.event_type)
         |SELECT event_type, CAST(MIN(n_periods) AS BIGINT) AS n_periods,
         |  round(CAST(MIN(t) AS DOUBLE), 6) AS total_power,
         |  CASE WHEN MIN(t) > 0 THEN
         |    round(CAST(SUM(term) AS DOUBLE) / ${l(negLnP)}, 6)
         |  END AS spec_entropy
         |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the decayLadder driver literals selected by an integer age CASE
    // (no runtime pow on either side); n·w products 9-rounded through
    // DECIMAL(28,9)
    "sk18_decay" -> {
      val lad = graft.operators.Sketches.decayLadder(0.9, 64)
      def l(d: Double) = graft.operators.Features.sqlDoubleLiteral(d)
      val cases = lad.zipWithIndex
        .map { case (v, a) => s"WHEN $a THEN ${l(v)}" }.mkString(" ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |ref AS (SELECT MAX(day) AS r FROM daily),
         |aged AS (
         |  SELECT event_type, n,
         |    CASE date_diff('day', day, r) $cases END AS w
         |  FROM daily CROSS JOIN ref)
         |SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total,
         |  CAST(COUNT(*) AS BIGINT) AS n_days,
         |  round(CAST(SUM(CAST(round(CAST(n AS DOUBLE) * w, 9)
         |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS decayed,
         |  round(CAST(SUM(CAST(round(CAST(n AS DOUBLE) * w, 9)
         |    AS DECIMAL(28,9))) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
         |    AS decay_ratio
         |FROM aged GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the o7 zscore moment discipline verbatim, then the per-type
    // (g desc, id) argmax and the threshold verdict on the ROUNDED g
    "o113_grubbs" ->
      """WITH f AS (
        |  SELECT event_id, event_type, value,
        |    CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER g AS DOUBLE)
        |      AS msum,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,12))) OVER g
        |      AS DOUBLE) AS qsum,
        |    CAST(COUNT(value) OVER g AS DOUBLE) AS n,
        |    CAST(COUNT(*) OVER g AS BIGINT) AS cnt
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND event_id IS NOT NULL
        |  WINDOW g AS (PARTITION BY event_type)),
        |s AS (
        |  SELECT event_id, event_type, value, cnt,
        |    round(abs(CASE
        |      WHEN sqrt(greatest(qsum / n - (msum / n) * (msum / n), 0)) > 0
        |      THEN (value - msum / n) /
        |           sqrt(greatest(qsum / n - (msum / n) * (msum / n), 0))
        |      ELSE 0 END), 6) AS g
        |  FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY g DESC, event_id) AS r FROM s)
        |SELECT event_type, cnt AS n, g, value AS outlier_value,
        |  event_id AS outlier_id, g > 6.0e0 AS suspect
        |FROM r WHERE r = 1 ORDER BY event_type""".stripMargin,

    // the sa15 moment/sd/weight chain, then one fold per scheme over
    // 9-rounded DECIMAL-summed variance terms (theoretical fractional
    // n_h — no allocation rounding to replay); zero-sd strata
    // contribute nothing
    "sa22_alloc_var" -> {
      def fold(scheme: String, nh: String): String =
        s"""SELECT '$scheme' AS scheme,
           |  CAST(v AS DOUBLE) AS var_mean,
           |  round(sqrt(CAST(v AS DOUBLE)), 6) AS se_mean
           |FROM (
           |  SELECT coalesce(SUM(CASE WHEN sd > 0 THEN
           |      CAST(round(wh * wh * (sd * sd) / ($nh), 3)
           |        AS DECIMAL(28,3))
           |      ELSE CAST(0 AS DECIMAL(28,3)) END),
           |    CAST(0 AS DECIMAL(28,3))) AS v
           |  FROM terms)""".stripMargin
      s"""WITH m AS (
         |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_stratum,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6)) *
         |      CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE) AS q
         |  FROM orders
         |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
         |  GROUP BY 1),
         |w AS (
         |  SELECT o_orderpriority, n_stratum,
         |    round(sqrt(greatest(q / CAST(n_stratum AS DOUBLE) -
         |      (s / CAST(n_stratum AS DOUBLE)) *
         |      (s / CAST(n_stratum AS DOUBLE)), 0.0e0)), 6) AS sd
         |  FROM m),
         |w2 AS (SELECT *, CAST(round(CAST(n_stratum AS DOUBLE) * sd, 6)
         |         AS DECIMAL(28,6)) AS wgt FROM w),
         |tot AS (SELECT SUM(wgt) AS tw, CAST(SUM(n_stratum) AS BIGINT) AS tn,
         |        CAST(COUNT(*) AS BIGINT) AS th FROM w2),
         |terms AS (
         |  SELECT w2.o_orderpriority, w2.sd,
         |    CAST(w2.n_stratum AS DOUBLE) / tot.tn AS wh,
         |    1000.0e0 * CAST(w2.n_stratum AS DOUBLE) / CAST(tot.tn AS DOUBLE)
         |      AS np,
         |    CASE WHEN CAST(tot.tw AS DOUBLE) > 0
         |         THEN 1000.0e0 * CAST(w2.wgt AS DOUBLE)
         |              / CAST(tot.tw AS DOUBLE) END AS nn,
         |    1000.0e0 / CAST(tot.th AS DOUBLE) AS ne
         |  FROM w2, tot)
         |${fold("equal", "ne")}
         |UNION ALL
         |${fold("neyman", "nn")}
         |UNION ALL
         |${fold("proportional", "np")}
         |ORDER BY scheme""".stripMargin
    },

    // 6-rounded sd and N·sd weights DECIMAL-summed; quota/floor/
    // remainder the identical double sequence; largest-remainder rank
    // with stratum tie-break
    "sa15_neyman" ->
      """WITH m AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_stratum,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6)) *
        |      CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE) AS q
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |w AS (
        |  SELECT o_orderpriority, n_stratum,
        |    round(sqrt(greatest(q / CAST(n_stratum AS DOUBLE) -
        |      (s / CAST(n_stratum AS DOUBLE)) *
        |      (s / CAST(n_stratum AS DOUBLE)), 0.0e0)), 6) AS sd
        |  FROM m),
        |w2 AS (SELECT *, CAST(round(CAST(n_stratum AS DOUBLE) * sd, 6)
        |         AS DECIMAL(28,6)) AS wgt FROM w),
        |tot AS (SELECT SUM(wgt) AS tw, CAST(SUM(n_stratum) AS BIGINT) AS tn
        |        FROM w2),
        |qt AS (
        |  SELECT w2.*,
        |    CASE WHEN tot.tw > 0
        |         THEN 1000.0e0 * CAST(wgt AS DOUBLE) / CAST(tw AS DOUBLE)
        |         ELSE 1000.0e0 * CAST(n_stratum AS DOUBLE)
        |              / CAST(tn AS DOUBLE) END AS quota
        |  FROM w2, tot),
        |b AS (SELECT *, CAST(floor(quota) AS BIGINT) AS base,
        |        round(quota - floor(quota), 6) AS rem FROM qt),
        |sp AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS spare FROM b),
        |r AS (SELECT b.*, row_number() OVER
        |        (ORDER BY rem DESC, o_orderpriority ASC) AS rk FROM b)
        |SELECT o_orderpriority, n_stratum, sd, round(quota, 6) AS quota,
        |  CAST(base + CASE WHEN rk <= sp.spare THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM r, sp ORDER BY o_orderpriority""".stripMargin,

    // one sub-audit per column, unioned; exact counts only
    "dq6_column_tests" -> {
      val colSql = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority").map { c =>
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(COUNT($c) - COUNT(DISTINCT $c) AS BIGINT)
           |    AS dup_violations,
           |  (COUNT(*) - COUNT($c) = 0 AND
           |   COUNT($c) - COUNT(DISTINCT $c) = 0) AS is_unique
           |FROM orders""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\n")
      s"""SELECT * FROM ($colSql) ORDER BY "column""""
    },

    // the identical 8 conditional cells and the identical
    // (m_tpost − m_tpre) − (m_cpost − m_cpre) double sequence
    "o28_did" ->
      """WITH d AS (
        |  SELECT (user_id % 2 = 1) AS t,
        |    (ts >= TIMESTAMP '2024-01-16 00:00:00') AS p,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN t AND NOT p THEN v END) AS DOUBLE) AS s_tpre,
        |    CAST(COUNT(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT) AS n_tpre,
        |    CAST(SUM(CASE WHEN t AND p THEN v END) AS DOUBLE) AS s_tpost,
        |    CAST(COUNT(CASE WHEN t AND p THEN 1 END) AS BIGINT) AS n_tpost,
        |    CAST(SUM(CASE WHEN NOT t AND NOT p THEN v END) AS DOUBLE)
        |      AS s_cpre,
        |    CAST(COUNT(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT)
        |      AS n_cpre,
        |    CAST(SUM(CASE WHEN NOT t AND p THEN v END) AS DOUBLE) AS s_cpost,
        |    CAST(COUNT(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT) AS n_cpost
        |  FROM d)
        |SELECT n_tpre, n_tpost, n_cpre, n_cpost,
        |  CASE WHEN n_tpre > 0
        |       THEN round(s_tpre / CAST(n_tpre AS DOUBLE), 6) END AS m_tpre,
        |  CASE WHEN n_tpost > 0
        |       THEN round(s_tpost / CAST(n_tpost AS DOUBLE), 6) END AS m_tpost,
        |  CASE WHEN n_cpre > 0
        |       THEN round(s_cpre / CAST(n_cpre AS DOUBLE), 6) END AS m_cpre,
        |  CASE WHEN n_cpost > 0
        |       THEN round(s_cpost / CAST(n_cpost AS DOUBLE), 6) END AS m_cpost,
        |  CASE WHEN n_tpre > 0 AND n_tpost > 0 AND n_cpre > 0 AND n_cpost > 0
        |       THEN round((s_tpost / CAST(n_tpost AS DOUBLE)
        |                   - s_tpre / CAST(n_tpre AS DOUBLE))
        |                  - (s_cpost / CAST(n_cpost AS DOUBLE)
        |                     - s_cpre / CAST(n_cpre AS DOUBLE)), 6)
        |  END AS did
        |FROM m""".stripMargin,

    // three scalar audits unioned; NOT EXISTS replays the left-anti
    "dq5_referential" ->
      """WITH r1 AS (
        |  SELECT 'lineitem.orderkey->orders' AS relation,
        |    CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
        |    CAST((SELECT COUNT(l_orderkey) FROM lineitem) AS BIGINT)
        |      AS n_nonnull,
        |    CAST((SELECT COUNT(*) FROM lineitem c
        |          WHERE c.l_orderkey IS NOT NULL AND NOT EXISTS (
        |            SELECT 1 FROM orders p
        |            WHERE p.o_orderkey = c.l_orderkey)) AS BIGINT)
        |      AS n_orphans),
        |r2 AS (
        |  SELECT 'orders.custkey->customer' AS relation,
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
        |    CAST((SELECT COUNT(o_custkey) FROM orders) AS BIGINT)
        |      AS n_nonnull,
        |    CAST((SELECT COUNT(*) FROM orders c
        |          WHERE c.o_custkey IS NOT NULL AND NOT EXISTS (
        |            SELECT 1 FROM customer p
        |            WHERE p.c_custkey = c.o_custkey)) AS BIGINT)
        |      AS n_orphans),
        |r3 AS (
        |  SELECT 'orders.custkey->customer_mod3' AS relation,
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
        |    CAST((SELECT COUNT(o_custkey) FROM orders) AS BIGINT)
        |      AS n_nonnull,
        |    CAST((SELECT COUNT(*) FROM orders c
        |          WHERE c.o_custkey IS NOT NULL AND NOT EXISTS (
        |            SELECT 1 FROM customer p
        |            WHERE p.c_custkey % 3 = 0
        |              AND p.c_custkey = c.o_custkey)) AS BIGINT)
        |      AS n_orphans)
        |SELECT relation, n_child, n_nonnull, n_orphans,
        |  round(CAST(n_orphans AS DOUBLE) /
        |    CAST(greatest(n_nonnull, 1) AS DOUBLE), 6) AS orphan_rate
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |      UNION ALL SELECT * FROM r3)
        |ORDER BY relation""".stripMargin,

    // the operator's exact conditional moment sums and the identical
    // mean/variance/se2/dof parenthesization; variances clamp at 0
    "o23_welch" ->
      """WITH pool AS (
        |  SELECT CAST(l_returnflag AS VARCHAR) AS g, l_extendedprice AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IN ('R', 'N')),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN g = 'R' THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN g = 'N' THEN CAST(v AS DECIMAL(18,6)) END)
        |      AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN g = 'R' THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN g = 'N' THEN CAST(v AS DECIMAL(19,6)) *
        |      CAST(v AS DECIMAL(19,6)) END) AS DOUBLE) AS qb
        |  FROM pool),
        |f AS (
        |  SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |         sa, sb, qa, qb
        |  FROM m),
        |v AS (
        |  SELECT *, sa / na AS ma, sb / nb AS mb,
        |    greatest((qa - sa * sa / na) / (na - 1.0e0), 0.0e0) AS va,
        |    greatest((qb - sb * sb / nb) / (nb - 1.0e0), 0.0e0) AS vb
        |  FROM f),
        |z AS (SELECT *, va / na + vb / nb AS se2 FROM v)
        |SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
        |       THEN round((ma - mb) / sqrt(se2), 6) END AS t,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
        |       THEN round((se2 * se2) /
        |         ((va / na) * (va / na) / (na - 1.0e0) +
        |          (vb / nb) * (vb / nb) / (nb - 1.0e0)), 6) END AS dof
        |FROM z""".stripMargin,

    // per-user halves replay the decimal conditional sums; theta and mu
    // come from the identical moment row and the adjustment mirrors the
    // operator's parenthesization
    "o22_cuped" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS x,
        |    CAST(coalesce(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx
        |  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
        |t AS (
        |  SELECT n, sx,
        |    CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        |         THEN (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |              (CAST(n AS DOUBLE) * sxx - sx * sx)
        |         ELSE 0.0e0 END AS th
        |  FROM m)
        |SELECT user_id, x, y,
        |  round(th, 6) AS theta,
        |  round(y - th * (x - sx / CAST(n AS DOUBLE)), 6) AS y_cuped
        |FROM pu CROSS JOIN t ORDER BY user_id""".stripMargin,

    // one fused CASE-sum aggregate, reshaped per rule; regex via RE2
    "dq4_expectations" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END)
        |      AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN coalesce(o_orderstatus IN ('O','F','P'), false)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN coalesce(
        |        regexp_matches(o_orderpriority, '^[1-5]-'), false)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN coalesce(o_totalprice > 0, false)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN coalesce(o_orderkey % 1000 <> 0, false)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v5
        |  FROM orders)
        |SELECT rule, n_rows, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'orderkey_not_null' AS rule, n_rows, v1 AS n_violations FROM a
        |  UNION ALL SELECT 'status_in_domain', n_rows, v2 FROM a
        |  UNION ALL SELECT 'priority_format', n_rows, v3 FROM a
        |  UNION ALL SELECT 'totalprice_positive', n_rows, v4 FROM a
        |  UNION ALL SELECT 'orderkey_not_millennial', n_rows, v5 FROM a)
        |ORDER BY rule""".stripMargin,

    // the o11 moment-cast pattern over lag pairs; the acf formula
    // mirrors the operator's parenthesization op for op
    "o21_autocorr" ->
      """WITH p AS (
        |  SELECT event_type, value AS y,
        |    lag(value, 1) OVER (PARTITION BY event_type
        |                        ORDER BY ts, event_id) AS x
        |  FROM events),
        |f AS (SELECT event_type, x, y FROM p
        |      WHERE x IS NOT NULL AND y IS NOT NULL),
        |s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) *
        |             CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) *
        |             CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM f GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        |        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
        |       THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |         (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |          sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS acf
        |FROM s ORDER BY event_type""".stripMargin,

    // sample membership replays uniform01 (md5 + 1 over 2^56 — the sa8
    // idiom) with the binary-exact 0.25 compare; cutoffs via
    // quantile_cont on the identical sample (o5 R-7 parity); strict->
    // bucketing with ties low (the q10 rule)
    "z3_boundaries" ->
      """WITH keyed AS (
        |  SELECT l_extendedprice AS k,
        |    CAST(l_orderkey AS VARCHAR) || '_' ||
        |      CAST(l_linenumber AS VARCHAR) AS sk
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |samp AS (
        |  SELECT k FROM (
        |    SELECT k,
        |      CAST(list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                        FOR c IN string_split(
        |                          substr(md5('rb:' || sk), 1, 14), '')],
        |        (acc, x) -> acc * 16 + x) + 1 AS DOUBLE)
        |        / 72057594037927936.0e0 AS u
        |    FROM keyed)
        |  WHERE u <= 0.25e0),
        |cuts AS (
        |  SELECT quantile_cont(k, [0.125e0, 0.25e0, 0.375e0, 0.5e0,
        |                           0.625e0, 0.75e0, 0.875e0]) AS c
        |  FROM samp),
        |b AS (
        |  SELECT
        |    (CASE WHEN k > c[1] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[2] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[3] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[4] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[5] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[6] THEN 1 ELSE 0 END) +
        |    (CASE WHEN k > c[7] THEN 1 ELSE 0 END) AS part
        |  FROM keyed CROSS JOIN cuts),
        |g AS (SELECT CAST(part AS INT) AS part, CAST(COUNT(*) AS BIGINT) AS n_rows
        |      FROM b GROUP BY 1)
        |SELECT g.part,
        |  CASE WHEN g.part > 0 THEN round(c[g.part], 4) END AS lo,
        |  CASE WHEN g.part < 7 THEN round(c[g.part + 1], 4) END AS hi,
        |  g.n_rows
        |FROM g CROSS JOIN cuts ORDER BY g.part""".stripMargin,

    // hashes replay Sampling.hashValue with the 'kmv:' salt; the
    // estimator numerator literal is generated from Sketches.kmvScale
    // so the sides cannot drift
    "sk6_kmv" -> {
      val scale = graft.operators.Sketches.kmvScaleLiteral(16)
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |                 FOR c IN string_split(
         |                   substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
         |                          1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS hv
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (
         |  SELECT event_type, hv,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |  FROM h),
         |a AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hashes,
         |         max(CASE WHEN rn = 16 THEN hv END) AS hk
         |  FROM r GROUP BY 1),
         |e AS (
         |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         |SELECT e.event_type, e.n_exact, a.n_hashes,
         |  round(CASE WHEN a.n_hashes < 16 THEN CAST(a.n_hashes AS DOUBLE)
         |        ELSE $scale / CAST(a.hk AS DOUBLE) END, 6) AS kmv_estimate
         |FROM e JOIN a ON a.event_type = e.event_type
         |ORDER BY e.event_type""".stripMargin
    },

    // per-column frequency frame replayed with the identical rank/total
    // windows; Gini from the exact integer rank-weighted sum, entropy
    // terms round at 9 and DECIMAL-sum (the libm firewall); generated
    // per column from the operator's own column list
    "dq2_skew" -> {
      def block(c: String) =
        s"""SELECT '$c' AS "column", n_rows, n_keys,
           |  round(CAST(max_f AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS max_share,
           |  round(CAST(top_f AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top_share,
           |  round(2.0e0 * CAST(srf AS DOUBLE) /
           |        (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)) -
           |        CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE), 6) AS gini,
           |  round(CAST(ent AS DOUBLE), 6) AS entropy
           |FROM (
           |  SELECT CAST(MAX(nn) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_keys,
           |    CAST(MAX(f) AS BIGINT) AS max_f,
           |    CAST(SUM(CASE WHEN rd <= 10 THEN f ELSE 0 END) AS BIGINT) AS top_f,
           |    CAST(SUM(r * f) AS BIGINT) AS srf,
           |    SUM(CAST(round(-(CAST(f AS DOUBLE) / CAST(nn AS DOUBLE)) *
           |        ln(CAST(f AS DOUBLE) / CAST(nn AS DOUBLE)), 9)
           |      AS DECIMAL(28,9))) AS ent
           |  FROM (
           |    SELECT f, k,
           |      CAST(row_number() OVER (ORDER BY f ASC, k ASC) AS BIGINT) AS r,
           |      CAST(row_number() OVER (ORDER BY f DESC, k DESC) AS BIGINT) AS rd,
           |      CAST(SUM(f) OVER () AS BIGINT) AS nn
           |    FROM (
           |      SELECT coalesce(CAST($c AS VARCHAR), '') AS k,
           |        CAST(COUNT(*) AS BIGINT) AS f
           |      FROM events GROUP BY 1)))""".stripMargin
      Seq("user_id", "event_type", "value").map(block)
        .mkString("\nUNION ALL\n") + "\nORDER BY \"column\""
    },

    // full-outer on the key, null-safe IS DISTINCT FROM change tests,
    // changed column names joined in declaration order; +1.00 replayed
    // through DECIMAL so both engines see identical doubles
    "dq3_cdc" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) +
        |                   CAST(1.00 AS DECIMAL(18,2)) AS DOUBLE)
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |j AS (
        |  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
        |    o.o_totalprice AS otp, n.o_totalprice AS ntp,
        |    o.o_orderstatus AS ost, n.o_orderstatus AS nst,
        |    o.o_orderpriority AS opr, n.o_orderpriority AS npr
        |  FROM o FULL OUTER JOIN n ON n.o_orderkey = o.o_orderkey),
        |c AS (
        |  SELECT coalesce(ko, kn) AS o_orderkey,
        |    CASE WHEN kn IS NULL THEN 'removed'
        |         WHEN ko IS NULL THEN 'added'
        |         WHEN (otp IS DISTINCT FROM ntp) OR (ost IS DISTINCT FROM nst)
        |              OR (opr IS DISTINCT FROM npr) THEN 'changed'
        |         ELSE 'unchanged' END AS change_type,
        |    concat_ws(',',
        |      CASE WHEN otp IS DISTINCT FROM ntp THEN 'o_totalprice' END,
        |      CASE WHEN ost IS DISTINCT FROM nst THEN 'o_orderstatus' END,
        |      CASE WHEN opr IS DISTINCT FROM npr THEN 'o_orderpriority' END)
        |      AS cc
        |  FROM j)
        |SELECT o_orderkey, change_type,
        |  CASE WHEN change_type = 'changed' THEN cc ELSE '' END AS changed_cols
        |FROM c WHERE change_type <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    // moment names and the r formula are generated from the operator's
    // own column list so the sides cannot drift; products at (19,6)
    // (the o11 int128 rule), listwise-complete rows
    "o16_corr" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val sums = cols.map(c =>
        s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) AS s_$c")
      val prods = for {
        (a, i) <- cols.zipWithIndex; b <- cols.drop(i)
      } yield s"""CAST(SUM(CAST($a AS DECIMAL(19,6)) *
                 |             CAST($b AS DECIMAL(19,6))) AS DOUBLE) AS p_${a}_$b""".stripMargin
      val pairSelects = (for {
        (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
      } yield {
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
           |  CASE WHEN (CAST(n AS DOUBLE) * p_${a}_$a - s_$a * s_$a) > 0
           |        AND (CAST(n AS DOUBLE) * p_${b}_$b - s_$b * s_$b) > 0
           |       THEN round((CAST(n AS DOUBLE) * p_${a}_$b - s_$a * s_$b) /
           |         (sqrt(CAST(n AS DOUBLE) * p_${a}_$a - s_$a * s_$a) *
           |          sqrt(CAST(n AS DOUBLE) * p_${b}_$b - s_$b * s_$b)), 6)
           |  END AS r
           |FROM m""".stripMargin
      }).mkString("\nUNION ALL\n")
      s"""WITH c AS (
         |  SELECT * FROM lineitem
         |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    ${(sums ++ prods).mkString(",\n    ")}
         |  FROM c)
         |SELECT col_a, col_b, n, r FROM (
         |$pairSelects)
         |ORDER BY col_a, col_b""".stripMargin
    },

    // the o15 doubled-rank discipline: 2·minrank + (t−1) BIGINTs,
    // DECIMAL(38,0)-exact moment sums, the operator's closing double
    // sequence verbatim
    "o17_spearman" ->
      """WITH pool AS (
        |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r AS (
        |  SELECT
        |    2 * CAST(rank() OVER (ORDER BY x) AS BIGINT) +
        |      CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) - 1 AS dx,
        |    2 * CAST(rank() OVER (ORDER BY y) AS BIGINT) +
        |      CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS dy
        |  FROM pool),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
        |         AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
        |         AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
        |         AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(dx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(dy AS DECIMAL(38,0))) AS DOUBLE) AS sy
        |  FROM r)
        |SELECT n,
        |  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        |        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
        |       THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |         (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |          sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS rho
        |FROM s""".stripMargin,

    // open/close via rank-1 rows under the identical (us, event_id)
    // total order; vsum replays the decimal money-sum rule
    "o18_ohlc" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 21600000000 AS bucket,
        |         epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |                       ORDER BY us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |                       ORDER BY us DESC, event_id DESC) AS rd
        |  FROM b)
        |SELECT event_type, bucket,
        |  CAST(bucket * 21600000000 AS BIGINT) AS bucket_start_us,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS vsum
        |FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    // the closed-form rewrite replayed in exact DECIMAL: running sum of
    // (x − 60), inclusive running min, s = p − least(0, min); only the
    // report column casts to double
    "o19_cusum" ->
      """WITH s AS (
        |  SELECT event_type, ts, event_id, value,
        |    SUM(CAST(value AS DECIMAL(18,6)) - CAST(60 AS DECIMAL(18,6)))
        |      OVER (PARTITION BY event_type ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM events),
        |t AS (
        |  SELECT event_type, event_id, value, p,
        |    MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM s)
        |SELECT event_type, event_id, value,
        |  round(CAST(p - LEAST(CAST(0 AS DECIMAL(38,6)), mn) AS DOUBLE), 6) AS s,
        |  (p - LEAST(CAST(0 AS DECIMAL(38,6)), mn)) > CAST(400 AS DECIMAL(18,6))
        |    AS alarm
        |FROM t ORDER BY event_id""".stripMargin,

    // per-bucket last value under the (us, event_id) order, range-
    // unnested grid, ignore-nulls fill (DuckDB's default cumulative
    // frame matches Spark's)
    "o20_resample" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) // 21600000000 AS bucket,
        |         epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |lastv AS (
        |  SELECT user_id, bucket, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY us DESC, event_id DESC) AS rd
        |    FROM o)
        |  WHERE rd = 1),
        |spanr AS (
        |  SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |  FROM o GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM spanr),
        |j AS (
        |  SELECT g.user_id, g.bucket, l.value AS obs
        |  FROM grid g LEFT JOIN lastv l
        |    ON l.user_id = g.user_id AND l.bucket = g.bucket)
        |SELECT user_id, bucket, CAST(bucket * 21600000000 AS BIGINT) AS bucket_us,
        |  obs,
        |  last_value(obs IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY bucket) AS ffill,
        |  obs IS NULL AS is_gap
        |FROM j ORDER BY user_id, bucket""".stripMargin,

    "o4_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CASE WHEN GROUPING(l_returnflag) = 1 AND GROUPING(l_linestatus) = 1 THEN 3
        |       WHEN GROUPING(l_returnflag) = 1 THEN 2
        |       WHEN GROUPING(l_linestatus) = 1 THEN 1
        |       ELSE 0 END AS lvl
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin
  )
}
