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

  test("winsorize clamps into the group's R-7 band and flags clipped rows") {
    // group a: 0..10 → p25 = 2.5 (interpolated), p75 = 7.5
    val a = (0 to 10).map(i => ("a", i.toLong, i.toDouble))
    val b = Seq(("b", 100L, 5.0), ("b", 101L, 5.0)) // constant group: lo = hi
    val got = Features.winsorize((a ++ b).toDF("k", "id", "x"), "k", "x",
        pLo = 0.25, pHi = 0.75)
      .collect()
      .map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(0L) == ((2.5, 7.5, 2.5, true)))
    assert(got(2L) == ((2.5, 7.5, 2.5, true)))    // 2 < 2.5 → clipped up
    assert(got(5L) == ((2.5, 7.5, 5.0, false)))
    assert(got(8L) == ((2.5, 7.5, 7.5, true)))
    assert(got(100L) == ((5.0, 5.0, 5.0, false))) // degenerate band keeps value
    intercept[IllegalArgumentException](
      Features.winsorize(a.toDF("k", "id", "x"), "k", "x", 0.9, 0.1))
  }

  test("mannWhitney: textbook U with ties; degenerate data pins z null") {
    // A = {1, 2, 2}, B = {2, 3}: pooled avg ranks 1, 3, 3, 3, 5
    // R_A = 7, U_A = 7 - 3*4/2 = 1, U_B = 3*2 - 1 = 5
    // ties: value 2 has t = 3 -> tie3 = 24; N = 5
    // sigma^2 = (6/12) * (6 - 24/20) = 2.4, z = (1 - 3)/sqrt(2.4)
    val rows = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("g", "v")
    val r = Features.mannWhitney(rows, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 7.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 5.0)
    val expZ = BigDecimal(-2.0 / math.sqrt(2.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == expZ)
    // identical samples -> U = n^2/2, z = 0
    val same = Seq(("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val r2 = Features.mannWhitney(same, "g", "v", "A", "B").collect().head
    assert(r2.isNullAt(5)) // all tied: sigma = 0
    intercept[IllegalArgumentException](
      Features.mannWhitney(rows, "g", "v", "A", "A"))
  }

  test("benfordAudit: exact digits, densified grid, l1 with absent-digit mass") {
    // group a: 1..99 -> every first digit appears exactly 11 times;
    // group b: constant 5 -> digit 5 holds all mass, the other 8 rows
    // come from densification with n = 0
    val rows = ((1L to 99L).map(v => ("a", v)) ++ Seq(("b", 5L), ("b", 5L)) ++
      Seq(("a", 0L), ("a", -3L))).toDF("g", "v") // non-positive dropped
    // columns: g, digit, n, total, benford_p, share, dev, l1
    val got = Features.benfordAudit(rows, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(7)))).toMap
    assert(got.size == 18)
    for (d <- 1L to 9L) {
      val (n, total, p, share, _) = got(("a", d))
      assert(n == 11L && total == 99L && p == Features.BenfordP(d.toInt - 1))
      assert(share == BigDecimal(11.0 / 99.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got(("b", 5L))._1 == 2L && got(("b", 5L))._2 == 2L)
    assert(got(("b", 1L))._1 == 0L)
    // l1(b) = (1 - p5) + sum of the other digits' expected masses
    val p5 = Features.BenfordP(4)
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expectedL1 = ((1 to 9).map(d =>
      if (d == 5) r9(1.0 - p5) else r9(Features.BenfordP(d - 1)))
      .sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("b", 5L))._5 == expectedL1)
    // multi-digit magnitudes strip to the leading digit
    val wide = Seq(("c", 123456789L), ("c", 900000000000000000L))
      .toDF("g", "v")
    val digs = Features.benfordAudit(wide, "g", "v")
      .where(col("n") > 0).collect().map(_.getLong(1)).sorted.toSeq
    assert(digs == Seq(1L, 9L))
  }

  test("chiSquare: textbook 2x2 contingency table") {
    // observed: (a,1)=10 (a,2)=20 (b,1)=20 (b,2)=10 → e = 15 everywhere,
    // contrib = 25/15 each, chi2 = 4 * 1.666666667 = 6.666667, dof = 1
    val rows = (Seq.fill(10)(("a", 1)) ++ Seq.fill(20)(("a", 2)) ++
      Seq.fill(20)(("b", 1)) ++ Seq.fill(10)(("b", 2))).toDF("k", "v")
    val got = Features.chiSquare(rows, "k", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getLong(8), r.getDouble(9))))
      .toMap
    assert(got.size == 4)
    val cell = got(("a", 1))
    assert(cell == ((10L, 30L, 30L, 60L, 15.0, 6.666667, 1L, 1.666667)))
    assert(got.values.forall(c => c._6 == 6.666667 && c._7 == 1L))
    // a uniform table has zero statistic
    val flat = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 2)) ++
      Seq.fill(5)(("b", 1)) ++ Seq.fill(5)(("b", 2))).toDF("k", "v")
    assert(Features.chiSquare(flat, "k", "v").collect()
      .forall(r => r.getDouble(7) == 0.0))
  }

  test("olsFit recovers exact lines and nulls out degenerate groups") {
    val df = Seq(
      // a: perfect line y = 2x - 1
      ("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 3.0, 5.0),
      // b: constant x -> no fit
      ("b", 2.0, 1.0), ("b", 2.0, 9.0),
      // c: constant y -> slope 0, intercept y, r2 undefined (0/0)
      ("c", 1.0, 4.0), ("c", 3.0, 4.0)
    ).toDF("k", "x", "y")
    val got = Features.olsFit(df, "k", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got("a") == ((3L, Some(2.0), Some(-1.0), Some(1.0))))
    assert(got("b") == ((2L, None, None, None)))
    assert(got("c") == ((2L, Some(0.0), Some(4.0), None)))
    // null coordinates drop the whole observation from every sum
    val withNull = Seq(("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(3.0)),
      ("a", Some(3.0), Some(5.0)), ("a", None, Some(99.0)), ("a", Some(9.0), None))
      .toDF("k", "x", "y")
    val g2 = Features.olsFit(withNull, "k", "x", "y").collect().head
    assert(g2.getLong(1) == 3L && g2.getDouble(2) == 2.0)
  }

  test("quantileScores buckets by strict cutoff comparison, ties land low") {
    // 1..10 quintile cutoffs (R-7): 2.8, 4.6, 6.4, 8.2
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val got = Features.quantileScores(df, Seq("x"), buckets = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      6L -> 3, 7L -> 4, 8L -> 4, 9L -> 5, 10L -> 5))
    // constant column: every cutoff equals the value, strict > → all score 1
    val const = Seq((1L, 7.0), (2L, 7.0)).toDF("id", "x")
    assert(Features.quantileScores(const, Seq("x"), 5)
      .collect().map(_.getInt(2)).toSet == Set(1))
    // nulls score 1 and multiple columns score independently
    val multi = Seq((1L, Some(1.0), 10.0), (2L, Some(9.0), 1.0),
      (3L, None, 5.0)).toDF("id", "x", "y")
    val m = Features.quantileScores(multi, Seq("x", "y"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(m(1L) == ((1, 2)) && m(2L) == ((2, 1)) && m(3L)._1 == 1)
    intercept[IllegalArgumentException](Features.quantileScores(df, Nil, 5))
    intercept[IllegalArgumentException](Features.quantileScores(df, Seq("x"), 1))
  }

  test("madOutliers flags by modified z; MAD-0 groups flag nothing") {
    // group a: median 5.5; deviations {4.5,1.5,0.5,0.5,3.5,94.5} sorted
    // → MAD = (1.5 + 3.5) / 2 = 2.5
    val a = Seq(1.0, 4.0, 5.0, 6.0, 9.0, 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
    // group b: >half identical → MAD 0 → z = 0 everywhere, no flags
    val b = Seq((10L, "b", 7.0), (11L, "b", 7.0), (12L, "b", 99.0))
    val got = Features.madOutliers((a ++ b).toDF("id", "k", "x"), "k", "x",
        cutoff = 3.5)
      .collect() // columns: (k, id, x, med, mad, mz, outlier)
      .map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(2L) == ((5.5, 2.5, -0.1349, false)))
    val big = got(5L)
    assert(big._1 == 5.5 && big._2 == 2.5 && big._4,
      "the 100.0 point must be flagged")
    assert(math.abs(big._3 - 0.6745 * 94.5 / 2.5) < 1e-5)
    assert(Seq(10L, 11L, 12L).forall(i => got(i)._3 == 0.0 && !got(i)._4))
    intercept[IllegalArgumentException](
      Features.madOutliers(a.toDF("id", "k", "x"), "k", "x", 0.0))
  }

  test("corrMatrix: upper-triangle pairs, listwise deletion, degenerate nulls") {
    val df = Seq(
      (Some(1.0), 2.0, 4.0, 5.0), (Some(2.0), 4.0, 3.0, 5.0),
      (Some(3.0), 6.0, 2.0, 5.0), (Some(4.0), 8.0, 1.0, 5.0),
      (None, 1.0, 1.0, 1.0)) // null a → row excluded everywhere
      .toDF("a", "b", "c", "d")
    val got = Features.corrMatrix(df, Seq("a", "b", "c", "d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3))))).toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == ((4L, Some(1.0))))    // b = 2a exactly
    assert(got(("a", "c")) == ((4L, Some(-1.0))))   // c = 5 − a
    assert(got(("b", "c")) == ((4L, Some(-1.0))))
    // constant column d: zero variance → null r, but n still 4
    assert(got(("a", "d")) == ((4L, None)))
    assert(got(("b", "d")) == ((4L, None)))
    assert(got(("c", "d")) == ((4L, None)))
    intercept[IllegalArgumentException](Features.corrMatrix(df, Seq("a")))
    intercept[IllegalArgumentException](Features.corrMatrix(df, Seq("a", "a")))
  }

  test("welchTTest: textbook symmetric case, degenerate null guard") {
    // identical groups: t = 0; var = 1 each → se2 = 2/3, dof = 4
    val df = (Seq(1.0, 2.0, 3.0).map(("R", _)) ++
      Seq(1.0, 2.0, 3.0).map(("N", _)) ++
      Seq(("X", 99.0))) // unrelated group is ignored
      .toDF("g", "v")
    val r = Features.welchTTest(df, "g", "v", "R", "N").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 4.0)
    // a genuinely shifted pair has a negative t of the mirrored size
    val shifted = (Seq(1.0, 2.0, 3.0).map(("R", _)) ++
      Seq(11.0, 12.0, 13.0).map(("N", _))).toDF("g", "v")
    val s = Features.welchTTest(shifted, "g", "v", "R", "N").head
    assert(s.getDouble(4) < -10 && s.getDouble(5) == 4.0)
    // both groups constant: zero pooled se → t and dof null
    val const = Seq(("R", 5.0), ("R", 5.0), ("N", 7.0), ("N", 7.0))
      .toDF("g", "v")
    val c = Features.welchTTest(const, "g", "v", "R", "N").head
    assert(c.isNullAt(4) && c.isNullAt(5))
    intercept[IllegalArgumentException](
      Features.welchTTest(df, "g", "v", "R", "R"))
  }

  test("cupedAdjust: exact-covariate adjustment kills all variance") {
    // y = 2x exactly → theta = 2, mu = 2 → every adjusted value is 4
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0))
      .toDF("id", "x", "y")
    val got = Features.cupedAdjust(df, "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == Map(1L -> ((2.0, 4.0)), 2L -> ((2.0, 4.0)),
      3L -> ((2.0, 4.0))))
    // zero pre-period variance: theta 0, metric unchanged
    val const = Seq((1L, 5.0, 2.0), (2L, 5.0, 9.0)).toDF("id", "x", "y")
    val c = Features.cupedAdjust(const, "x", "y")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(c == Map(1L -> ((0.0, 2.0)), 2L -> ((0.0, 9.0))))
  }

  test("spearman: monotone ±1, average ranks on ties, constant → null") {
    // strictly monotone, wildly nonlinear: rho = 1 regardless of shape
    val mono = Seq((1.0, 10.0), (2.0, 100.0), (3.0, 1e6)).toDF("x", "y")
    assert(Features.spearman(mono, "x", "y").head.getDouble(1) == 1.0)
    val anti = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 1.0)).toDF("x", "y")
    assert(Features.spearman(anti, "x", "y").head.getDouble(1) == -1.0)
    // ties take average ranks on both sides: doubled-rank vectors equal
    val tied = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 7.0)).toDF("x", "y")
    val r = Features.spearman(tied, "x", "y").head
    assert(r.getLong(0) == 3L && r.getDouble(1) == 1.0)
    // constant x: zero rank variance → null; null rows drop first
    val const = Seq((Some(1.0), 1.0), (Some(1.0), 2.0),
      (Option.empty[Double], 3.0)).toDF("x", "y")
    val c = Features.spearman(const, "x", "y").head
    assert(c.getLong(0) == 2L && c.isNullAt(1))
  }

  test("targetEncode pulls rare categories to the prior, big ones to " +
      "their mean; nulls drop") {
    // global mean over non-null rows = (10·4 + 20·1)/5 = 12
    val df = Seq(("a", Some(10.0)), ("a", Some(10.0)), ("a", Some(10.0)),
      ("a", Some(10.0)), ("b", Some(20.0)), ("b", Option.empty[Double]))
      .toDF("cat", "y")
    val got = Features.targetEncode(df, "cat", "y", smoothing = 4.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // a: (40 + 4·12)/(4+4) = 11; b: (20 + 48)/5 = 13.6
    assert(got == Map("a" -> ((4L, 11.0)), "b" -> ((1L, 13.6))))
    // smoothing 0 degenerates to the raw category mean
    val raw = Features.targetEncode(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(raw == Map("a" -> 10.0, "b" -> 20.0))
    intercept[IllegalArgumentException](
      Features.targetEncode(df, "cat", "y", smoothing = -1.0))
  }

  test("hillTailIndex: exact Pareto tail recovers alpha; flat tail → null") {
    import spark.implicits._
    // doubling ladder: top-5 = {320, 160, 80, 40, 20}, xk = 20 —
    // ratios 16, 8, 4, 2, 1 are EXACT doubles, so the spec's ln
    // operands match the operator's bit-for-bit
    val xs = Seq(320.0, 160.0, 80.0, 40.0, 20.0, 10.0, 5.0).toDF("v")
    val r = Features.hillTailIndex(xs, "v", k = 5).head
    val h = Seq(16.0, 8.0, 4.0, 2.0, 1.0)
      .map(x => BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum
    assert(r.getLong(0) == 5L && r.getDouble(1) == 20.0)
    assert(r.getDouble(2) == BigDecimal(5.0 / h.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant values: every ln ratio is 0 → no tail exponent
    val flat = Seq.fill(6)(7.0).toDF("v")
    assert(Features.hillTailIndex(flat, "v", k = 4).head.isNullAt(2))
    // non-positive values are excluded before the cut
    val mixed = (Seq(-5.0, 0.0) ++ (1 to 4).map(_.toDouble)).toDF("v")
    assert(Features.hillTailIndex(mixed, "v", k = 10).head.getLong(0) == 4L)
    intercept[IllegalArgumentException](Features.hillTailIndex(xs, "v", 1))
  }

  test("didEstimate: textbook 2x2; empty cell pins did null") {
    import spark.implicits._
    // treat: 10 → 13 (+3); control: 20 → 21 (+1) → DiD = +2
    val rows = Seq(
      (true, false, 10.0), (true, true, 13.0),
      (false, false, 20.0), (false, true, 21.0))
      .toDF("t", "p", "y")
    val r = Features.didEstimate(rows, "t", "p", "y").head
    assert((0 to 3).map(r.getLong) == Seq(1L, 1L, 1L, 1L))
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 13.0)
    assert(r.getDouble(6) == 20.0 && r.getDouble(7) == 21.0)
    assert(r.getDouble(8) == 2.0)
    // missing control-post cell → no estimate
    val sparse = rows.where(!($"t" === false && $"p" === true))
    val s = Features.didEstimate(sparse, "t", "p", "y").head
    assert(s.getLong(3) == 0L && s.isNullAt(7) && s.isNullAt(8))
  }

  test("woeEncode: Laplace-guarded log odds and the IV sum") {
    import spark.implicits._
    // cat a: 3 pos / 1 neg; cat b: 1 pos / 3 neg; N1 = N0 = 4
    val rows = Seq(("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false)).toDF("c", "y")
    val got = Features.woeEncode(rows, "c", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wa = r9(math.log((3.5 / 4.0) / (1.5 / 4.0)))
    val wb = r9(math.log((1.5 / 4.0) / (3.5 / 4.0)))
    assert(got("a")._1 == 3L && got("a")._2 == 1L && got("a")._3 == wa)
    assert(got("b")._3 == wb)
    // iv = Σ (p1 − p0)·woe over both categories, every term positive
    val iv = BigDecimal(r9((3.0 / 4 - 1.0 / 4) * wa)) +
      BigDecimal(r9((1.0 / 4 - 3.0 / 4) * wb))
    assert(got("a")._4 == iv.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble)
    assert(got("a")._4 == got("b")._4) // the sum repeats on every row
  }

  test("gini: 0 for equality, (n-1)/n-scaled for total concentration") {
    import spark.implicits._
    val equal = Seq.fill(4)(5.0).toDF("v")
    assert(Features.gini(equal, "v").head.getDouble(2) == 0.0)
    // all value on one unit of n=4: G = (n−1)/n · … textbook: with
    // x = (0,0,0,12): Σi·x = 48, G = (96 − 5·12)/(4·12) = 0.75
    val conc = Seq(0.0, 0.0, 0.0, 12.0).toDF("v")
    val c = Features.gini(conc, "v").head
    assert(c.getLong(0) == 4L && c.getDouble(1) == 12.0 &&
      c.getDouble(2) == 0.75)
    // all-zero totals: no defined coefficient
    assert(Features.gini(Seq(0.0, 0.0).toDF("v"), "v").head.isNullAt(2))
  }

  test("pairedTTest: textbook t on differences; degenerate spread → null") {
    import spark.implicits._
    // d = {1, 2, 3}: mean 2, sample sd 1, t = 2/(1/sqrt(3)) = 2·sqrt(3)
    val r = Features.pairedTTest(Seq(1.0, 2.0, 3.0).toDF("d"), "d").head
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0 &&
      r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == BigDecimal(2.0 * math.sqrt(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant differences: sd 0 → no t
    val c = Features.pairedTTest(Seq(5.0, 5.0).toDF("d"), "d").head
    assert(c.getDouble(2) == 0.0 && c.isNullAt(3))
    // single observation: no sd at all
    assert(Features.pairedTTest(Seq(4.0).toDF("d"), "d").head.isNullAt(2))
  }

  test("runsTest: alternating maximizes runs, blocks minimize; ties drop") {
    import spark.implicits._
    // perfectly alternating 1,9 x4 around median 5: 8 runs of size 1
    val alt = (1 to 8).map(i => ("a", i.toLong,
      if (i % 2 == 0) 9.0 else 1.0))
    // two blocks: 1,1,1,1,9,9,9,9 → 2 runs
    val blk = (1 to 8).map(i => ("b", i.toLong,
      if (i <= 4) 1.0 else 9.0))
    // a value AT the median is discarded: {1, 5, 9} → n1 = n2 = 1
    val tie = Seq(("c", 1L, 1.0), ("c", 2L, 5.0), ("c", 3L, 9.0))
    val got = Features.runsTest((alt ++ blk ++ tie).toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((4L, 4L, 8L)))
    assert(got("b") == ((4L, 4L, 2L)))
    assert(got("c") == ((1L, 1L, 2L)))
    // mu for n1=n2=4 is 5; alternating z > 0, blocked z < 0
    val zs = Features.runsTest((alt ++ blk).toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(zs("a") > 0 && zs("b") < 0)
  }

  test("ksTest: disjoint supports → D = 1; identical samples → D = 0") {
    import spark.implicits._
    val far = (1 to 5).map(i => ("a", i.toDouble)) ++
      (11 to 15).map(i => ("b", i.toDouble))
    val r = Features.ksTest(far.toDF("g", "v"), "g", "v", "a", "b").head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L && r.getDouble(2) == 1.0)
    val same = (1 to 4).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
    assert(Features.ksTest(same.toDF("g", "v"), "g", "v", "a", "b")
      .head.getDouble(2) == 0.0)
    // textbook small case: a = {1, 2}, b = {2, 3} → max gap at v = 1: 0.5
    val mid = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
    assert(Features.ksTest(mid.toDF("g", "v"), "g", "v", "a", "b")
      .head.getDouble(2) == 0.5)
  }

  test("srmCheck: balanced split passes, skew alarms, ratio honored") {
    import spark.implicits._
    val ok = (1 to 100).map(i => i % 2 == 0).toDF("t")
    val r1 = Features.srmCheck(ok, "t").head
    assert(r1.getLong(0) == 50L && r1.getDouble(2) == 0.0 && !r1.getBoolean(3))
    // 70/30 on n = 100 under a 50/50 design: chi2 = 2·400/50 = 16 → alarm
    val skew = ((1 to 70).map(_ => true) ++ (1 to 30).map(_ => false)).toDF("t")
    val r2 = Features.srmCheck(skew, "t").head
    assert(r2.getDouble(2) == 16.0 && r2.getBoolean(3))
    // the same 70/30 under a 70/30 DESIGN is exactly on target
    assert(Features.srmCheck(skew, "t", 0.7).head.getDouble(2) == 0.0)
    intercept[IllegalArgumentException](Features.srmCheck(ok, "t", 1.0))
  }

  test("mdeEstimate: the closed form on a known sigma; degenerates null") {
    import spark.implicits._
    // sigma = 1 (values ±1 around mean 10), n = 4:
    // mde_abs = 2.801585 · 1 · 2 / 2 = 2.801585
    val rows = Seq(("a", 9.0), ("a", 11.0), ("a", 9.0), ("a", 11.0),
      ("b", 7.0)).toDF("k", "v")
    val got = Features.mdeEstimate(rows, "k", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 4L && a.getDouble(2) == 10.0 &&
      a.getDouble(3) == 1.0)
    assert(a.getDouble(4) == 2.801585)
    assert(a.getDouble(5) == BigDecimal(2.801585 / 10.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // singleton stratum: no variance, no MDE
    assert(got("b").isNullAt(4) && got("b").isNullAt(5))
  }

  test("twoProportionTest: textbook z; degenerate pooled rate nulls out") {
    import spark.implicits._
    // treat: 30/100 convert; ctrl: 20/100 → p̂ = 0.25,
    // z = 0.1 / sqrt(0.25·0.75·(2/100))
    val rows = ((1 to 30).map(_ => (true, true)) ++
      (1 to 70).map(_ => (true, false)) ++
      (1 to 20).map(_ => (false, true)) ++
      (1 to 80).map(_ => (false, false))).toDF("t", "s")
    val r = Features.twoProportionTest(rows, "t", "s").head
    assert((0 to 3).map(r.getLong) == Seq(100L, 100L, 30L, 20L))
    assert(r.getDouble(4) == 0.3 && r.getDouble(5) == 0.2)
    val z = BigDecimal((0.3 - 0.2) /
      math.sqrt(0.25 * (1.0 - 0.25) * (1.0 / 100 + 1.0 / 100)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == z && !r.getBoolean(7) == (math.abs(z) <= 1.96))
    // nobody converts anywhere: pooled rate 0 → no test
    val dead = Seq((true, false), (false, false)).toDF("t", "s")
    assert(Features.twoProportionTest(dead, "t", "s").head.isNullAt(6))
  }

  test("skyline2D keeps exactly the non-dominated rows") {
    import spark.implicits._
    val pts = Seq(
      (1L, 1.0, 9L),   // frontier
      (2L, 2.0, 5L),   // frontier
      (3L, 3.0, 5L),   // dominated by 2 (same y, higher x)
      (4L, 4.0, 2L),   // frontier
      (5L, 5.0, 3L),   // dominated by 4
      (6L, 1.0, 9L))   // coordinate-duplicate of 1 → collapses
      .toDF("id", "x", "y")
    val got = Features.skyline2D(pts, "x", "y", "id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
    // shard count must not change the frontier (two-phase = global pass)
    val one = Features.skyline2D(pts, "x", "y", "id", localShards = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == got)
  }

  test("tukeyFences: textbook quartiles, fences, outlier counts") {
    import spark.implicits._
    // 1..11 plus outliers −100 and 100: 13 sorted values, R-7 rank
    // p·12 → q1 = idx 3 = 3, q3 = idx 9 = 9, iqr = 6 → lo −6, hi 18
    val vals = ((1 to 11).map(_.toDouble) ++ Seq(-100.0, 100.0))
      .map(("g", _))
    val r = Features.tukeyFences(vals.toDF("k", "v"), "k", "v").head
    assert(r.getLong(1) == 13L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 9.0)
    assert(r.getDouble(4) == 6.0)
    assert(r.getDouble(5) == -6.0 && r.getDouble(6) == 18.0)
    assert(r.getLong(7) == 1L && r.getLong(8) == 1L)
    intercept[IllegalArgumentException](
      Features.tukeyFences(vals.toDF("k", "v"), "k", "v", k = 0.0))
  }

  test("benjaminiHochberg: textbook step-up, suffix-min monotone q") {
    import spark.implicits._
    // p = (.001, .01, .03, .5, .9): raw = (.005, .025, .05, .625, .9);
    // suffix-min leaves them as-is → ranks 1..3 reject at 5%
    val df = Seq((1L, 0.001), (2L, 0.01), (3L, 0.03), (4L, 0.5),
      (5L, 0.9)).toDF("id", "p")
    val got = Features.benjaminiHochberg(df, "id", "p")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((1L, 0.005, true)))
    assert(got(2L) == ((2L, 0.025, true)))
    assert(got(3L) == ((3L, 0.05, true)))
    assert(got(4L) == ((4L, 0.625, false)))
    assert(got(5L) == ((5L, 0.9, false)))
    // a later small p pulls earlier q's DOWN (the step-up property)
    val pull = Seq((1L, 0.04), (2L, 0.041)).toDF("id", "p")
    val q = Features.benjaminiHochberg(pull, "id", "p")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(q(1L) == 0.041 && q(2L) == 0.041) // min(0.08, 0.041)
    intercept[IllegalArgumentException](
      Features.benjaminiHochberg(df, "id", "p", alphaPct = 0))
    // corrupt p fails loudly
    val bad = Seq((1L, 1.5)).toDF("id", "p")
    intercept[Exception](
      Features.benjaminiHochberg(bad, "id", "p").collect())
  }

  test("trimmedMeans: the outlier moves the raw mean, not the trimmed one") {
    import spark.implicits._
    // 1..9 plus 100: bounds 1.9/18.1 (R-7 at 10%/90%), trim keeps 2..9
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("k", "v")
    val r = Features.trimmedMeans(df, "k", "v").head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 1.9 && r.getDouble(3) == 18.1)
    assert(r.getLong(4) == 8L)
    assert(r.getDouble(5) == 14.5)      // raw mean chases the outlier
    assert(r.getDouble(6) == 5.5)       // trimmed mean does not
    assert(r.getDouble(7) == 6.4)       // winsorized: clamped tails
    intercept[IllegalArgumentException](
      Features.trimmedMeans(df, "k", "v", trimPct = 50))
  }

  test("theilIndex: zero on equal values, positive under concentration") {
    import spark.implicits._
    val even = (1 to 5).map(_ => ("e", 4.0)).toDF("k", "v")
    val r0 = Features.theilIndex(even, "k", "v").head
    assert(r0.getDouble(3) == 0.0 && r0.getDouble(4) == 0.0)
    // (1,1,1,1,6): μ = 2 → T = (4·0.5·ln0.5 + 3·ln3)/5 through the
    // 9-rounded firewall = 0.381909
    val skewed = (Seq.fill(4)(1.0) :+ 6.0).map(("s", _)).toDF("k", "v")
    val r1 = Features.theilIndex(skewed, "k", "v").head
    assert(r1.getLong(1) == 5L && r1.getDouble(2) == 2.0)
    assert(r1.getDouble(3) == 0.381909)
    assert(r1.getDouble(4) > 0.2 && r1.getDouble(4) < 0.25)
    // non-positive rows are excluded, not crashed on
    val mixed = Seq(("m", 0.0), ("m", -1.0), ("m", 2.0), ("m", 2.0))
      .toDF("k", "v")
    assert(Features.theilIndex(mixed, "k", "v").head.getLong(1) == 2L)
  }

  test("qqPoints: a pure location shift shows a constant gap") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (false, i.toDouble)) ++
      (1 to 100).map(i => (true, i.toDouble + 10.0))).toDF("t", "v")
    val rows = Features.qqPoints(df, "t", "v").orderBy("p").collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getDouble(3) == 10.0))
    // decile check: p=0.1 over 1..100 is R-7 rank 9.9 → 10.9
    assert(rows.head.getDouble(2) == 10.9 && rows.head.getDouble(1) == 20.9)
    intercept[IllegalArgumentException](
      Features.qqPoints(df, "t", "v", ps = Seq(0.0)))
  }

  test("partialCorrelation: confounder removal zeroes a spurious link") {
    import spark.implicits._
    // x and y are both EXACTLY z (plus nothing): r_xy = 1 via z; the
    // partial is 0/0 → null (z explains everything)
    val driven = (1 to 10).map { i =>
      (i.toDouble, i.toDouble, i.toDouble) }.toDF("x", "y", "z")
    assert(Features.partialCorrelation(driven, "x", "y", "z").head.isNullAt(4))
    // independent-ish x,y with irrelevant constant-free z: partial ≈ r_xy
    val mixed = Seq(
      (1.0, 2.0, 5.0), (2.0, 1.0, 7.0), (3.0, 4.0, 6.0), (4.0, 3.0, 8.0),
      (5.0, 6.0, 5.5), (6.0, 5.0, 7.5)).toDF("x", "y", "z")
    val r = Features.partialCorrelation(mixed, "x", "y", "z").head
    assert(r.getLong(0) == 6L && !r.isNullAt(4))
    intercept[IllegalArgumentException](
      Features.partialCorrelation(mixed, "x", "x", "z"))
  }

  test("cohensD: textbook pooled effect size and labels") {
    import spark.implicits._
    // treat {2,4,6}, ctrl {1,2,3}: means 4 and 2, ss1 = 8, ss0 = 2,
    // sp = sqrt(10/4) = 1.581139, d = 2/1.581139 = 1.264911 → large
    val df = Seq((true, 2.0), (true, 4.0), (true, 6.0),
      (false, 1.0), (false, 2.0), (false, 3.0)).toDF("t", "v")
    val r = Features.cohensD(df, "t", "v").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.581139 && r.getDouble(5) == 1.264911)
    assert(r.getString(6) == "large")
    // identical arms → d = 0, negligible; singleton arm → null d
    val same = Seq((true, 1.0), (true, 2.0), (false, 1.0), (false, 2.0))
      .toDF("t", "v")
    val s = Features.cohensD(same, "t", "v").head
    assert(s.getDouble(5) == 0.0 && s.getString(6) == "negligible")
    val tiny = Seq((true, 1.0), (false, 1.0), (false, 2.0)).toDF("t", "v")
    assert(Features.cohensD(tiny, "t", "v").head.isNullAt(5))
  }

  test("jarqueBera: symmetric data has zero skew, constants null out") {
    import spark.implicits._
    // {1..5}: m2=2, m3=0, m4=6.8 → skew 0, excess kurtosis −1.3,
    // JB = 5/6 · (1.69/4) = 0.352083 — comfortably "normal-ish"
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = Features.jarqueBera(df, "k", "v").head
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == -1.3)
    assert(r.getDouble(4) == 0.352083 && r.getBoolean(5))
    // right-skewed data: positive skewness
    val sk = (Seq.fill(9)(1.0) ++ Seq(100.0)).map(("s", _)).toDF("k", "v")
    assert(Features.jarqueBera(sk, "k", "v").head.getDouble(2) > 1.0)
    // constant group: zero variance → all nulls
    val const = Seq(("c", 2.0), ("c", 2.0)).toDF("k", "v")
    val c = Features.jarqueBera(const, "k", "v").head
    assert(c.isNullAt(2) && c.isNullAt(4) && c.isNullAt(5))
  }

  test("cramersV: perfect association on observed cells, degenerate null") {
    import spark.implicits._
    // 2×2 with only the diagonal observed: chi2 = 2 over 4 rows,
    // V = sqrt(2 / (4·1)) = 0.707107 (observed-cell semantics, as o13)
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L)).toDF("a", "b")
    val r = Features.cramersV(df, "a", "b").head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L)       // n, dof
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)       // ra, cb
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 0.707107)
    // one-level side → no defined V
    val flat = Seq(("A", 1L), ("A", 2L)).toDF("a", "b")
    assert(Features.cramersV(flat, "a", "b").head.isNullAt(5))
  }

  test("bootstrapMeanCI: constant data pins the band, CI brackets") {
    import spark.implicits._
    val const = (1 to 100).map(i => (i.toLong, 7.5)).toDF("id", "v")
    val r = Features.bootstrapMeanCI(const, "id", "v").head
    assert(r.getLong(0) == 100L && r.getDouble(1) == 7.5)
    assert(r.getLong(2) == 32L)
    assert(r.getDouble(3) == 7.5 && r.getDouble(4) == 7.5)
    // varied data: lo ≤ full mean ≤ hi, band strictly inside the range
    val varied = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val v = Features.bootstrapMeanCI(varied, "id", "v").head
    assert(v.getDouble(3) <= v.getDouble(1) && v.getDouble(1) <= v.getDouble(4))
    assert(v.getDouble(3) > 1.0 && v.getDouble(4) < 200.0)
    intercept[IllegalArgumentException](
      Features.bootstrapMeanCI(const, "id", "v", resamples = 1))
  }

  test("jackknifeRatio: hand-checked replicates, zero bias/SE on a constant ratio") {
    import spark.implicits._
    // x = (1,2,3), y = (1,1,1): θ = 2; replicates 2.5, 2.0, 1.5 →
    // θ̄ = 2, bias 0, SS = 0.5, v = (2/3)·0.5 → se = √(1/3) = 0.57735
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0))
      .toDF("k", "x", "y")
    val r = Features.jackknifeRatio(df, "k", "x", "y").head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.57735)
    // x proportional to y → every replicate equals θ: se exactly 0
    val const = Seq(("c", 2.0, 1.0), ("c", 4.0, 2.0), ("c", 6.0, 3.0))
      .toDF("k", "x", "y")
    val rc = Features.jackknifeRatio(const, "k", "x", "y").head
    assert(rc.getDouble(2) == 2.0 && rc.getDouble(4) == 0.0 &&
      rc.getDouble(5) == 0.0)
    // a leave-one-out denominator of zero must raise, not return junk
    val degenerate = Seq(("d", 1.0, 5.0), ("d", 1.0, -5.0), ("d", 1.0, 5.0))
      .toDF("k", "x", "y")
    intercept[Exception](
      Features.jackknifeRatio(degenerate, "k", "x", "y").collect())
  }

  test("mcnemarTest: discordant cells only, null on none") {
    import spark.implicits._
    // 3 both, 2 neither, 4 yes→no, 1 no→yes: χ² = 9/5 = 1.8
    val pairs = (Seq.fill(3)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(4)((true, false)) :+ ((false, true))).toDF("b", "a")
    val r = Features.mcnemarTest(pairs, "b", "a").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 4L && r.getLong(4) == 1L)
    assert(r.getDouble(5) == 1.8 && !r.getBoolean(6))
    // strongly one-sided flips clear the 3.841 bar: b=15, c=1 → 12.25
    val strong = (Seq.fill(15)((true, false)) :+ ((false, true)))
      .toDF("b", "a")
    val s = Features.mcnemarTest(strong, "b", "a").head
    assert(s.getDouble(5) == 12.25 && s.getBoolean(6))
    // all concordant → no information → null chi2 and significance
    val conc = Seq.fill(5)((true, true)).toDF("b", "a")
    val c = Features.mcnemarTest(conc, "b", "a").head
    assert(c.isNullAt(5) && c.isNullAt(6))
  }

  test("oneWayAnova: textbook decomposition, degenerate nulls") {
    import spark.implicits._
    // groups (1,2,3) and (4,5,6): grand mean 3.5, SSB = 13.5, SSW = 4,
    // F = 13.5 / (4/4) = 13.5, η² = 13.5/17.5 = 0.771429
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("k", "v")
    val r = Features.oneWayAnova(df, "k", "v").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 13.5 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 13.5 && r.getDouble(5) == 0.771429)
    // one group → no between-groups df → null F, η² = 0 (SSB = 0)
    val one = Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v")
    val o = Features.oneWayAnova(one, "k", "v").head
    assert(o.isNullAt(4) && o.getDouble(5) == 0.0)
    // constant data → SST = 0 → null η² and F
    val const = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0)).toDF("k", "v")
    val cc = Features.oneWayAnova(const, "k", "v").head
    assert(cc.isNullAt(4) && cc.isNullAt(5))
  }

  test("leveneBrownForsythe: unequal spreads flagged, equal spreads not") {
    import spark.implicits._
    // same medians, wildly different spreads
    val spread = (Seq(-9.0, -1.0, 0.0, 1.0, 9.0).map(("wide", _)) ++
      Seq(-0.2, -0.1, 0.0, 0.1, 0.2).map(("narrow", _))).toDF("k", "v")
    val r = Features.leveneBrownForsythe(spread, "k", "v").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L)
    assert(r.getDouble(4) > 3.0)      // spreads clearly differ (F = 3.58)
    // identical distributions → between-group deviation spread is zero
    // up to the 6-rounded group terms (±1e-6 — round(4/3, 6) summed
    // vs the unrounded S²/N)
    val same = (Seq(1.0, 2.0, 3.0).map(("x", _)) ++
      Seq(1.0, 2.0, 3.0).map(("y", _))).toDF("k", "v")
    val s = Features.leveneBrownForsythe(same, "k", "v").head
    assert(math.abs(s.getDouble(2)) <= 1e-6)
  }

  test("permutationTestMeans: huge effect → minimal p, null effect → large p") {
    import spark.implicits._
    // arms fully separated by 100: no random re-labeling beats it
    val strong = ((1 to 50).map(i => (i.toLong, true, 100.0 + i % 3)) ++
      (1 to 50).map(i => (100L + i, false, i % 3.toDouble)))
      .toDF("id", "g", "v")
    val r = Features.permutationTestMeans(strong, "id", "g", "v", 32).head
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L)
    assert(r.getDouble(2) > 99.0)
    assert(r.getLong(3) == 32L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == math.rint(1.0 / 33.0 * 1e6) / 1e6)
    // identical arms: every permuted |diff| ≥ 0 = |obs| → p = 1
    val nullEff = ((1 to 50).map(i => (i.toLong, true, 5.0)) ++
      (1 to 50).map(i => (100L + i, false, 5.0))).toDF("id", "g", "v")
    val n = Features.permutationTestMeans(nullEff, "id", "g", "v", 32).head
    assert(n.getDouble(2) == 0.0 && n.getDouble(5) == 1.0)
    intercept[IllegalArgumentException](
      Features.permutationTestMeans(strong, "id", "g", "v", 4))
  }

  test("benjaminiHochberg dependence=true inflates q by the harmonic factor") {
    import spark.implicits._
    val tests = Seq((1L, 0.001), (2L, 0.02), (3L, 0.2), (4L, 0.8))
      .toDF("id", "p")
    val bh = Features.benjaminiHochberg(tests, "id", "p")
      .orderBy("rank").collect()
    val by = Features.benjaminiHochberg(tests, "id", "p", dependence = true)
      .orderBy("rank").collect()
    // c(4) = 1 + 1/2 + 1/3 + 1/4 = 2.083333333 (9-rounded terms)
    val c = 1.0 + 0.5 + math.rint(1.0 / 3 * 1e9) / 1e9 + 0.25
    bh.zip(by).foreach { case (a, b) =>
      assert(b.getDouble(3) >= a.getDouble(3))     // BY never smaller
      assert(b.getDouble(3) <= 1.0)
    }
    // the top test's q scales by exactly c before the suffix-min/clamp
    assert(math.abs(by.head.getDouble(3) - bh.head.getDouble(3) * c) < 1e-6)
  }

  test("hodgesLehmannShift: robust to the outlier the mean chases") {
    import spark.implicits._
    // B = A + 5 except one wild outlier in A
    val df = (((1 to 20).map(i => ("a", i.toDouble)) :+ (("a", 1000.0))) ++
      (1 to 21).map(i => ("b", i + 5.0))).toDF("g", "v")
    val r = Features.hodgesLehmannShift(df, "g", "v", "b", "a").head
    assert(r.getLong(0) == 21L && r.getLong(1) == 21L &&
      r.getLong(2) == 441L)
    // the HL median shift stays ~5; the mean shift is dragged far off
    assert(math.abs(r.getDouble(3) - 5.0) <= 1.0)
    assert(r.getDouble(4) < -30.0)
    // the all-pairs guard fires loudly on oversized input
    val big = (1 to 3000).map(i => ("a", i.toDouble)) ++
      (1 to 3000).map(i => ("b", i.toDouble))
    intercept[Exception](Features.hodgesLehmannShift(
      big.toDF("g", "v"), "g", "v", "a", "b", maxPairs = 1000L).collect())
  }

  test("friedmanTest: consistent treatment ordering maxes the statistic") {
    import spark.implicits._
    // every block ranks c > b > a identically: χ²F = 12·n·... at max.
    // n = 10 blocks, k = 3: Rj = (10, 20, 30) → χ² = 12·1400/(10·3·4)
    // − 3·10·4 = 140 − 120 = 20
    val df = (1 to 10).flatMap(b => Seq(
      (b.toLong, "a", 1.0), (b.toLong, "b", 2.0), (b.toLong, "c", 3.0)))
      .toDF("blk", "trt", "v")
    val r = Features.friedmanTest(df, "blk", "trt", "v").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 20.0 && r.getLong(3) == 2L)
    // incomplete blocks drop: block 11 has only 2 treatments
    val withPartial = df.union(
      Seq((11L, "a", 9.0), (11L, "b", 1.0)).toDF("blk", "trt", "v"))
    val p = Features.friedmanTest(withPartial, "blk", "trt", "v").head
    assert(p.getLong(0) == 10L)
    // all-tied values: every rank averages → χ² = 0
    val flat = (1 to 5).flatMap(b => Seq(
      (b.toLong, "a", 2.0), (b.toLong, "b", 2.0), (b.toLong, "c", 2.0)))
      .toDF("blk", "trt", "v")
    val f = Features.friedmanTest(flat, "blk", "trt", "v").head
    assert(f.getDouble(2) == 0.0)
  }

  test("poissonRateTest: balanced rates → z near 0, skewed rates flag") {
    import spark.implicits._
    // arm A: 10 units × 6 events; arm B: 10 units × 2 events
    val skew = ((1 to 10).flatMap(u => Seq.fill(6)((true, u.toLong))) ++
      (11 to 20).flatMap(u => Seq.fill(2)((false, u.toLong))))
      .toDF("arm", "u")
    val r = Features.poissonRateTest(skew, "arm", "u").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 60L && r.getLong(3) == 20L)
    assert(r.getDouble(4) == 6.0 && r.getDouble(5) == 2.0)
    assert(r.getDouble(6) == 3.0)
    // z = (60 − 80·0.5)/sqrt(80·0.25) = 20/sqrt(20) = 4.472136
    assert(r.getDouble(7) == 4.472136)
    val even = ((1 to 10).flatMap(u => Seq.fill(3)((true, u.toLong))) ++
      (11 to 20).flatMap(u => Seq.fill(3)((false, u.toLong))))
      .toDF("arm", "u")
    val e = Features.poissonRateTest(even, "arm", "u").head
    assert(e.getDouble(7) == 0.0 && e.getDouble(6) == 1.0)
  }

  test("wilcoxonSignedRank: one-sided shifts push z, zeros drop") {
    import spark.implicits._
    // y = x + 1 for 20 pairs, plus 3 exact ties (dropped)
    val up = ((1 to 20).map(i => (i.toDouble, i + 1.0)) ++
      (1 to 3).map(i => (50.0 + i, 50.0 + i))).toDF("x", "y")
    val r = Features.wilcoxonSignedRank(up, "x", "y").head
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L && r.getLong(2) == 0L)
    // all positive, all |d| tied at 1: W+ = n(n+1)/2 = 210
    assert(r.getDouble(3) == 210.0)
    // fully tied |d| zeroes the variance: n(n+1)(2n+1)/24 = t³−t/48 here
    // → z is null only if var hits 0; with one tie group of 20:
    // var = 20·21·41/24 − (8000−20)/48 = 717.5 − 166.25 > 0
    assert(r.getDouble(4) > 3.0)
    // balanced signs → z near 0
    val bal = (1 to 20).map(i =>
      (i.toDouble, i + (if (i % 2 == 0) 1.0 else -1.0))).toDF("x", "y")
    val b = Features.wilcoxonSignedRank(bal, "x", "y").head
    assert(math.abs(b.getDouble(4)) < 1.0)
  }

  test("matthewsCorrelation: perfect, inverted, and degenerate predictors") {
    import spark.implicits._
    val perfect = ((1 to 30).map(_ => (true, true)) ++
      (1 to 70).map(_ => (false, false))).toDF("p", "l")
    val r = Features.matthewsCorrelation(perfect, "p", "l").head
    assert(r.getLong(0) == 30L && r.getLong(2) == 70L)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 &&
      r.getDouble(8) == 1.0)
    val inverted = ((1 to 30).map(_ => (false, true)) ++
      (1 to 70).map(_ => (true, false))).toDF("p", "l")
    val i = Features.matthewsCorrelation(inverted, "p", "l").head
    assert(i.getDouble(4) == -1.0)
    // constant predictor: a zero margin → null MCC, accuracy still real
    val const = ((1 to 30).map(_ => (true, true)) ++
      (1 to 70).map(_ => (true, false))).toDF("p", "l")
    val c = Features.matthewsCorrelation(const, "p", "l").head
    assert(c.isNullAt(4) && c.getDouble(5) == 0.3)
  }

  test("cohensKappa: perfect, chance-level, and skew-corrected agreement") {
    import spark.implicits._
    val perfect = Seq.fill(10)(("x", "x")) ++ Seq.fill(5)(("y", "y"))
    val p = Features.cohensKappa(perfect.toDF("a", "b"), "a", "b").head
    assert(p.getLong(0) == 15L && p.getDouble(1) == 1.0 &&
      p.getDouble(3) == 1.0)
    // 2x2: diag 45, n 70 → po 9/14; pe = (25·40 + 45·30)/70²
    val mixed = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(20)(("y", "x")) :+ (("y", "y"))) ++ Seq.fill(24)(("y", "y"))
    val m = Features.cohensKappa(mixed.toDF("a", "b"), "a", "b").head
    assert(m.getLong(0) == 70L)
    assert(m.getDouble(1) == math.rint(45.0 / 70.0 * 1e6) / 1e6)
    // constant table: pe = 1 → kappa undefined
    val const = Seq.fill(8)(("x", "x"))
    val c = Features.cohensKappa(const.toDF("a", "b"), "a", "b").head
    assert(c.getDouble(1) == 1.0 && c.isNullAt(3))
  }

  test("decisionStump: a separable feature cuts where the label flips") {
    import spark.implicits._
    // label = v > 50, feature = v: some decile threshold separates
    // perfectly → gini_split 0 at the best row
    val df = (1 to 100).map(i => (i.toDouble, i > 50)).toDF("f", "l")
    val rows = Features.decisionStump(df, "f", "l").orderBy("thr").collect()
    val best = rows.filter(_.getBoolean(6))
    assert(best.length == 1)
    assert(best.head.getDouble(5) == 0.0)       // pure split exists
    assert(best.head.getDouble(0) == 50.5)      // the median threshold
    // counts are consistent at every candidate
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) == 100L)
      assert(r.getLong(2) + r.getLong(4) == 50L)
    }
    intercept[IllegalArgumentException](Features.decisionStump(df, "f", "l", 1))
  }

  test("tostEquivalence: tight arms equivalent, shifted arms not") {
    import spark.implicits._
    // arms differ by ~0.1 with tiny spread, n=100: well inside ±5
    val tight = ((1 to 100).map(i => ("a", 50.0 + (i % 3) * 0.1)) ++
      (1 to 100).map(i => ("b", 50.1 + (i % 3) * 0.1))).toDF("g", "v")
    val t = Features.tostEquivalence(tight, "g", "v", "a", "b", 5.0).head
    assert(t.getLong(0) == 100L && t.getDouble(4) == 5.0)
    assert(t.getBoolean(7))
    assert(t.getDouble(5) > 1.645 && t.getDouble(6) < -1.645)
    // a 10-point shift exceeds the margin: t_hi cannot clear its bar
    val shifted = ((1 to 100).map(i => ("a", 60.0 + (i % 3) * 0.1)) ++
      (1 to 100).map(i => ("b", 50.0 + (i % 3) * 0.1))).toDF("g", "v")
    val s = Features.tostEquivalence(shifted, "g", "v", "a", "b", 5.0).head
    assert(!s.getBoolean(7))
    intercept[IllegalArgumentException](
      Features.tostEquivalence(tight, "g", "v", "a", "a", 5.0))
    intercept[IllegalArgumentException](
      Features.tostEquivalence(tight, "g", "v", "a", "b", 0.0))
  }

  test("covariateBalance: the imbalanced feature flags, the balanced passes") {
    import spark.implicits._
    // f1 identical across arms; f2 shifted by ~2 sd
    val df = ((1 to 50).map(i => (true, (i % 10).toDouble, 20.0 + i % 5)) ++
      (1 to 50).map(i => (false, (i % 10).toDouble, 10.0 + i % 5)))
      .toDF("arm", "f1", "f2")
    val rows = Features.covariateBalance(df, "arm", Seq("f1", "f2"))
      .orderBy("feature").collect()
    assert(rows.length == 2)
    val f1 = rows(0); val f2 = rows(1)
    assert(f1.getString(0) == "f1" && f1.getDouble(5) == 0.0 &&
      f1.getBoolean(6))
    assert(f2.getString(0) == "f2" && f2.getDouble(5) > 2.0 &&
      !f2.getBoolean(6))
    // a constant feature on both sides → zero pooled variance → nulls
    val const = Seq((true, 1.0), (true, 1.0), (false, 1.0), (false, 1.0))
      .toDF("arm", "f")
    val c = Features.covariateBalance(const, "arm", Seq("f")).head
    assert(c.isNullAt(5) && c.isNullAt(6))
    intercept[IllegalArgumentException](
      Features.covariateBalance(df, "arm", Nil))
  }

  test("calibrationTable: a perfectly calibrated score shows zero gap") {
    import spark.implicits._
    // score s ∈ {0.2, 0.8}, labels exactly matching the rate
    val rows = (1 to 100).map { i =>
      if (i <= 50) (0.2, i % 5 == 0)        // 10/50 = 0.2 positive
      else (0.8, i % 5 != 0)                // 40/50 = 0.8 positive
    }
    val got = Features.calibrationTable(rows.toDF("s", "l"), "s", "l",
      bins = 4).orderBy("bucket").collect()
    assert(got.map(_.getLong(1)).sum == 100L)
    got.foreach { r =>
      assert(math.abs(r.getDouble(4)) < 1e-9,
        s"bucket ${r.getLong(0)} gap ${r.getDouble(4)}")
    }
    intercept[IllegalArgumentException](
      Features.calibrationTable(rows.toDF("s", "l"), "s", "l", 1))
  }

  test("stratifiedDiff: a constant within-stratum effect pools exactly") {
    import spark.implicits._
    // value = 10·cov + (arm ? 3 : 0): raw arm means are confounded by
    // cov, but within every stratum the difference is exactly 3 (arm
    // assignment is independent of cov — decade parity vs digit)
    val df = (1 to 200).map { i =>
      val arm = (i / 10) % 2 == 1
      val cov = (i % 10).toDouble
      (arm, cov, 10.0 * cov + (if (arm) 3.0 else 0.0))
    }.toDF("arm", "cov", "v")
    val rows = Features.stratifiedDiff(df, "arm", "cov", "v", strata = 5)
      .orderBy("stratum").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) == 3.0, s"stratum ${r.get(0)}: ${r.getDouble(5)}")
      assert(r.getDouble(6) == 3.0)
    }
    intercept[IllegalArgumentException](
      Features.stratifiedDiff(df, "arm", "cov", "v", 1))
  }

  test("lorenzPoints: shares sum to 1, cumulative is monotone") {
    import spark.implicits._
    val df = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val rows = Features.lorenzPoints(df, "v", buckets = 4)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(1)).sum == 100L)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(math.abs(cums.last - 1.0) < 1e-9)
    // uniform 1..100: the top quartile (76..100) holds 44% of the mass
    assert(rows.last.getDouble(3) > 0.4 && rows.last.getDouble(3) < 0.5)
    intercept[IllegalArgumentException](Features.lorenzPoints(df, "v", 1))
  }

  test("kruskalWallis: shifted groups score, ties null the correction") {
    import spark.implicits._
    // a = {1,2,3}, b = {4,5,6}: no ties, R_a = 6, R_b = 15,
    // H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 174/7 − 21 = 3.857143
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Features.kruskalWallis(df, "g", "v").head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 3.857143)
    assert(r.getDouble(3) == 3.857143) // tie3 = 0 → C = 1
    assert(r.getLong(4) == 1L)
    // all-tied values: H = 0 and the tie correction degenerates (C = 0)
    val flat = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val f = Features.kruskalWallis(flat, "g", "v").head
    assert(f.getDouble(2) == 0.0 && f.isNullAt(3))
    // one group: the statistic is undefined
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val o = Features.kruskalWallis(one, "g", "v").head
    assert(o.isNullAt(2) && o.isNullAt(3) && o.isNullAt(4))
  }

  test("cochranQ: hand Q and invariance to all-0/all-1 blocks") {
    import spark.implicits._
    // blocks 1,2 informative; 3 all-1, 4 all-0: C=(3,2,1), T=6, ΣR²=14,
    // ΣC²=14 → Q = 2·(3·14 − 36)/(3·6 − 14) = 12/4 = 3
    val full = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", false), (2L, "c", false),
      (3L, "a", true), (3L, "b", true), (3L, "c", true),
      (4L, "a", false), (4L, "b", false), (4L, "c", false))
      .toDF("blk", "trt", "f")
    val r = Features.cochranQ(full, "blk", "trt", "f").head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 3.0 && r.getLong(4) == 2L)
    // dropping the invariant blocks leaves Q unchanged (the property the
    // scaladoc claims makes absent-cell-as-0 input safe)
    val informative = full.where(col("blk") <= 2L)
    val i = Features.cochranQ(informative, "blk", "trt", "f").head
    assert(i.getLong(0) == 2L && i.getDouble(3) == 3.0)
    // an invariant-only table nulls Q (kT = ΣR²)
    val inv = full.where(col("blk") >= 3L)
    assert(Features.cochranQ(inv, "blk", "trt", "f").head.isNullAt(3))
  }

  test("cronbachAlpha: hand alpha; absent cells behave as zero scores") {
    import spark.implicits._
    // perfectly correlated items with different scales: Σitem_var_num =
    // 24 + 96 = 120, total_var_num = 216 → α = 2·(1 − 120/216) = 0.888889
    val df = Seq((1L, "i1", 2L), (1L, "i2", 4L), (2L, "i1", 4L),
      (2L, "i2", 8L), (3L, "i1", 6L), (3L, "i2", 12L))
      .toDF("u", "i", "x")
    val r = Features.cronbachAlpha(df, "u", "i", "x").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 120L && r.getLong(3) == 216L)
    assert(r.getDouble(4) == 0.888889)
    // a unit whose second item is ABSENT equals one whose score is an
    // explicit 0 (the sparse-frame contract)
    val sparse = df.union(Seq((4L, "i1", 1L)).toDF("u", "i", "x"))
    val dense = df.union(Seq((4L, "i1", 1L), (4L, "i2", 0L))
      .toDF("u", "i", "x"))
    val rs = Features.cronbachAlpha(sparse, "u", "i", "x").head
    val rd = Features.cronbachAlpha(dense, "u", "i", "x").head
    assert(rs.getDouble(4) == rd.getDouble(4) &&
      rs.getLong(2) == rd.getLong(2) && rs.getLong(3) == rd.getLong(3))
    // one item: alpha undefined
    val one = df.where(col("i") === "i1")
    assert(Features.cronbachAlpha(one, "u", "i", "x").head.isNullAt(4))
  }

  test("durbinWatson: alternating residuals → 4, smooth → 0, exact → null") {
    import spark.implicits._
    // residuals alternate sign around a flat-ish line → DW near 4
    val alt = (1 to 20).map(i =>
      ("k", i.toLong, if (i % 2 == 0) -1.0 else 1.0)).toDF("k", "x", "y")
    val a = Features.durbinWatson(alt, "k", "x", "y").head
    assert(a.getLong(1) == 20L && a.getDouble(2) > 3.0)
    // smooth parabola residuals (positive autocorrelation) → DW near 0
    val smooth = (1 to 20).map(i => ("k", i.toLong, (i * i).toDouble))
      .toDF("k", "x", "y")
    val sm = Features.durbinWatson(smooth, "k", "x", "y").head
    assert(sm.getDouble(2) < 1.0)
    // an exact line has zero residual energy → dw null
    val line = (1 to 10).map(i => ("k", i.toLong, 2.0 * i + 1.0))
      .toDF("k", "x", "y")
    assert(Features.durbinWatson(line, "k", "x", "y").head.isNullAt(2))
  }

  test("sprtLadder: strong arms cross their boundaries monotonically") {
    import spark.implicits._
    // arm true: 50/100 per period under H0 p=0.1 vs H1 p=0.3 → strongly
    // H1 (crosses upper); arm false: 0/100 → strongly H0 (crosses lower)
    val daily = (1 to 3).flatMap(d => Seq(
      (true, d, 50L, 100L), (false, d, 0L, 100L)))
      .toDF("arm", "day", "conv", "trials")
    val rows = Features.sprtLadder(daily, "arm", "day", "conv", "trials",
        p0 = 0.1, p1 = 0.3)
      .orderBy("arm", "period").collect()
    assert(rows.length == 6)
    val (lo, hi) = (rows.take(3), rows.drop(3))
    // boundaries at alpha = beta = 0.05: ±ln(19) = ±2.944439
    assert(hi.head.getDouble(5) == 2.944439 &&
      hi.head.getDouble(6) == -2.944439)
    assert(hi.forall(r => r.getDouble(4) > 0 && r.getBoolean(7)))
    assert(lo.forall(r => r.getDouble(4) < 0 && r.getBoolean(8)))
    // cumulative: period 3 is 3× period 1 (identical increments)
    assert(math.abs(hi(2).getDouble(4) - 3 * hi(0).getDouble(4)) < 1e-4)
    intercept[IllegalArgumentException](
      Features.sprtLadder(daily, "arm", "day", "conv", "trials", 0.3, 0.1))
  }

  test("demingFit: exact line recovered; x-noise attenuates OLS only") {
    import spark.implicits._
    // exact y = 2x: both fits read slope 2, intercept 0
    val line = (1 to 5).map(i => ("k", i.toDouble, 2.0 * i))
      .toDF("k", "x", "y")
    val l = Features.demingFit(line, "k", "x", "y").head
    assert(l.getDouble(2) == 2.0 && l.getDouble(3) == 0.0 &&
      l.getDouble(4) == 2.0)
    // symmetric x-noise around (1, 2): U_xx=20, U_yy=40, U_xy=20 →
    // OLS 1.0 (attenuated), Deming (20+√2000)/40 = 1.618034
    val noisy = Seq(("k", 0.0, 0.0), ("k", 1.0, 2.0), ("k", 2.0, 4.0),
      ("k", 2.0, 2.0), ("k", 0.0, 2.0)).toDF("k", "x", "y")
    val n = Features.demingFit(noisy, "k", "x", "y").head
    assert(n.getDouble(4) == 1.0)
    assert(n.getDouble(2) == 1.618034 && n.getDouble(3) == 0.381966)
    // constant x: no fit
    val flat = Seq(("k", 1.0, 1.0), ("k", 1.0, 2.0)).toDF("k", "x", "y")
    assert(Features.demingFit(flat, "k", "x", "y").head.isNullAt(2))
  }

  test("oddsRatio: hand OR and Woolf CI; zero cells null out") {
    import spark.implicits._
    // a=20 b=10 c=10 d=20 → OR = 400/100 = 4
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(20)((false, false)))
      .toDF("e", "o")
    val r = Features.oddsRatio(df, "e", "o").head
    assert(r.getLong(0) == 20L && r.getLong(1) == 10L &&
      r.getLong(2) == 10L && r.getLong(3) == 20L)
    assert(r.getDouble(4) == 4.0)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val se = math.sqrt(1.0 / 20 + 1.0 / 10 + 1.0 / 10 + 1.0 / 20)
    val ln4 = r6(math.log(4.0))
    assert(r.getDouble(5) == r6(math.exp(ln4 - 1.96 * se)))
    assert(r.getDouble(6) == r6(math.exp(ln4 + 1.96 * se)))
    assert(r.getDouble(5) > 1.0) // the association is CI-significant
    // a zero cell: classical estimator undefined
    val zero = df.where(!(col("e") && col("o")))
    val z = Features.oddsRatio(zero, "e", "o").head
    assert(z.getLong(0) == 0L && z.isNullAt(4) && z.isNullAt(5))
  }

  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  private def r9(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  test("mantelHaenszel: hand MH-OR and CMH over two strata; " +
      "singleton stratum contributes nothing") {
    import spark.implicits._
    // stratum s1: (10,5,5,10), s2: (4,2,2,4) — both OR 4 → MH-OR 4
    def rows(k: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((k, true, true)) ++ Seq.fill(b)((k, true, false)) ++
        Seq.fill(c)((k, false, true)) ++ Seq.fill(d)((k, false, false))
    val df = (rows("s1", 10, 5, 5, 10) ++ rows("s2", 4, 2, 2, 4))
      .toDF("k", "e", "o")
    val r = Features.mantelHaenszel(df, "k", "e", "o").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 42L)
    assert(r.getDouble(2) == 4.0)
    // CMH: s1 E=7.5 V=50625/26100, s2 E=3 V=1296/1584 (terms 9-rounded)
    val v = r9(50625.0 / 26100.0) + r9(1296.0 / 1584.0)
    assert(r.getDouble(3) == r6(3.5 * 3.5 / v))
    // a singleton stratum has V undefined — contributes 0, not null
    val one = (rows("s1", 10, 5, 5, 10) ++ Seq(("s2", true, true)))
      .toDF("k", "e", "o")
    val r1 = Features.mantelHaenszel(one, "k", "e", "o").head
    assert(r1.getLong(0) == 2L &&
      r1.getDouble(3) == r6(2.5 * 2.5 / r9(50625.0 / 26100.0)))
  }

  test("riskRatio: hand RR, Katz CI, Yule's Q; zero exposed-case nulls " +
      "RR but not Q") {
    import spark.implicits._
    // a=20 b=30 c=10 d=40 → risks 0.4 vs 0.2 → RR 2
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(30)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(40)((false, false)))
      .toDF("e", "o")
    val r = Features.riskRatio(df, "e", "o").head
    assert(r.getDouble(4) == 2.0)
    val se = math.sqrt(1.0 / 20 - 1.0 / 50 + 1.0 / 10 - 1.0 / 50)
    val ln2 = r6(math.log(2.0))
    assert(r.getDouble(5) == r6(math.exp(ln2 - 1.96 * se)))
    assert(r.getDouble(6) == r6(math.exp(ln2 + 1.96 * se)))
    // Yule's Q = (800-300)/(800+300)
    assert(r.getDouble(7) == r6(500.0 / 1100.0))
    // a = 0: RR/CI null, Q still defined (= -1: bc dominates fully)
    val z = Features.riskRatio(df.where(!(col("e") && col("o"))), "e", "o")
      .head
    assert(z.isNullAt(4) && z.isNullAt(5) && z.getDouble(7) == -1.0)
  }

  test("linCCC: identity scores 1; a constant shift keeps r but drops " +
      "ccc to the hand value") {
    import spark.implicits._
    val ident = (1 to 5).map(i => ("k", i.toDouble, i.toDouble))
      .toDF("k", "x", "y")
    val i = Features.linCCC(ident, "k", "x", "y").head
    assert(i.getDouble(2) == 1.0 && i.getDouble(3) == 1.0 &&
      i.getDouble(4) == 1.0)
    // y = x + 1: uxy=uxx=uyy=50, gap=25 → ccc = 100/125 = 0.8, r = 1
    val shift = (1 to 5).map(i => ("k", i.toDouble, i + 1.0))
      .toDF("k", "x", "y")
    val s = Features.linCCC(shift, "k", "x", "y").head
    assert(s.getDouble(2) == 1.0 && s.getDouble(3) == 0.8 &&
      s.getDouble(4) == 0.8)
    // constant y: degenerate cloud nulls r and c_b
    val flat = (1 to 4).map(i => ("k", i.toDouble, 7.0)).toDF("k", "x", "y")
    val f = Features.linCCC(flat, "k", "x", "y").head
    assert(f.isNullAt(2) && f.isNullAt(4))
  }

  test("blandAltman: hand limits and within-share; constant diffs null " +
      "the SD family") {
    import spark.implicits._
    // 19 diffs of 0 + one of 10: mean .5, sample var 5 → sd 2.236068,
    // limits [.5 ∓ 1.96·sd] exclude exactly the one 10 → within .95
    val df = ((1 to 19).map(i => ("k", i.toDouble, i.toDouble)) ++
      Seq(("k", 30.0, 20.0))).toDF("k", "x", "y")
    val r = Features.blandAltman(df, "k", "x", "y").head
    assert(r.getLong(1) == 20L && r.getDouble(2) == 0.5)
    val sd = math.sqrt(5.0)
    assert(r.getDouble(3) == r6(sd))
    assert(r.getDouble(4) == r6(0.5 - 1.96 * sd) &&
      r.getDouble(5) == r6(0.5 + 1.96 * sd))
    assert(r.getDouble(6) == 0.95)
    // constant difference: sd/limits/share all null, bias kept
    val c = Features.blandAltman(
      (1 to 3).map(i => ("k", i + 2.0, i.toDouble)).toDF("k", "x", "y"),
      "k", "x", "y").head
    assert(c.getDouble(2) == 2.0 && c.isNullAt(3) && c.isNullAt(6))
  }

  test("moodMedianTest: hand χ² on a split design; a one-sided cut " +
      "nulls the statistic") {
    import spark.implicits._
    // pooled 1..6 → lower median = 3; group a all ≤ 3, b all > 3 →
    // per-group terms 1.5 each → χ² = 6
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Features.moodMedianTest(df, "g", "v").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 3.0 && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 6.0 && r.getLong(5) == 1L)
    // constant values: nothing above the median → χ² undefined
    val flat = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0)).toDF("g", "v")
    val f = Features.moodMedianTest(flat, "g", "v").head
    assert(f.getLong(3) == 0L && f.isNullAt(4))
  }

  test("bartlettTest: equal variances score 0; singleton group nulls") {
    import spark.implicits._
    // two groups, both sample variance 1 → pooled 1, ln terms 0, T = 0,
    // C = 1 + (1/2 + 1/2 − 1/4)/3 = 1.25
    val eq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Features.bartlettTest(eq, "g", "v").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.25 &&
      r.getDouble(4) == 0.0 && r.getLong(5) == 1L)
    // clearly unequal variances: positive statistic
    val ne = (Seq.tabulate(10)(i => ("a", i * 10.0)) ++
      Seq.tabulate(10)(i => ("b", 50.0 + i * 0.1))).toDF("g", "v")
    assert(Features.bartlettTest(ne, "g", "v").head.getDouble(4) > 10.0)
    // a singleton group: classical statistic undefined
    val single = eq.where(!(col("g") === "b" && col("v") > 4.0))
    assert(Features.bartlettTest(single, "g", "v").head.isNullAt(4))
  }

  test("iccOneWay: hand ICC on a balanced two-group design; zero " +
      "within-variance nulls") {
    import spark.implicits._
    // groups {1,2} and {5,6}: SSB=16, SSW=1 → MSB=16, MSW=0.5, k0=2,
    // ICC = 15.5/16.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0))
      .toDF("g", "v")
    val r = Features.iccOneWay(df, "g", "v").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 16.0 && r.getDouble(3) == 0.5 &&
      r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == r6(15.5 / 16.5))
    // zero within-variance: reliability is degenerate, not 1.0
    val exact = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    assert(Features.iccOneWay(exact, "g", "v").head.isNullAt(5))
  }

  test("kendallW: perfect concordance scores 1; all-tied design nulls; " +
      "χ²_F = m(k−1)·W") {
    import spark.implicits._
    // 3 blocks all ranking t1 < t2 < t3 → W = 1
    val perfect = (1 to 3).flatMap(b => Seq(
      (s"b$b", "t1", 1.0), (s"b$b", "t2", 2.0), (s"b$b", "t3", 3.0)))
      .toDF("b", "t", "v")
    val p = Features.kendallW(perfect, "b", "t", "v").head
    assert(p.getLong(0) == 3L && p.getLong(1) == 3L &&
      p.getLong(2) == 0L && p.getDouble(3) == 1.0)
    // every block fully tied: tie_sum = m(k³−k) → denominator 0 → null
    val tied = (1 to 3).flatMap(b => Seq(
      (s"b$b", "t1", 5.0), (s"b$b", "t2", 5.0), (s"b$b", "t3", 5.0)))
      .toDF("b", "t", "v")
    val t = Features.kendallW(tied, "b", "t", "v").head
    assert(t.getLong(2) == 3L * 24L && t.isNullAt(3))
    // mixed TIE-FREE data: the Friedman χ² (untied formula) is exactly
    // m(k−1)·W (both 6-rounded, so compare at 1e-5)
    val mixed = (Seq(("b1", "t1", 1.0), ("b1", "t2", 3.0), ("b1", "t3", 2.0),
      ("b2", "t1", 2.0), ("b2", "t2", 2.5), ("b2", "t3", 1.0),
      ("b3", "t1", 1.0), ("b3", "t2", 2.0), ("b3", "t3", 3.0)))
      .toDF("b", "t", "v")
    val w = Features.kendallW(mixed, "b", "t", "v").head.getDouble(3)
    val chi = Features.friedmanTest(mixed, "b", "t", "v").head.getDouble(2)
    assert(math.abs(chi - 3 * 2 * w) < 1e-5)
  }

  test("concentrationIndex: hand HHI/CR4; monopoly reads 1; " +
      "non-positive values drop") {
    import spark.implicits._
    // shares .5/.3/.1/.05/.05 → HHI .355, CR4 = 95/100
    val df = Seq(("k", "a", 50.0), ("k", "b", 30.0), ("k", "c", 10.0),
      ("k", "d", 5.0), ("k", "e", 5.0), ("k", "z", -3.0), ("k", "y", 0.0))
      .toDF("g", "e", "v")
    val r = Features.concentrationIndex(df, "g", "e", "v").head
    assert(r.getLong(1) == 5L && r.getDouble(2) == 100.0)
    assert(r.getDouble(3) == 0.355 && r.getDouble(4) == 0.95)
    val mono = Seq(("k", "a", 100.0)).toDF("g", "e", "v")
    val m = Features.concentrationIndex(mono, "g", "e", "v").head
    assert(m.getDouble(3) == 1.0 && m.getDouble(4) == 1.0)
  }

  test("inequalityIndices: equal values score 0; hand Atkinson/Hoover " +
      "on a 1-vs-9 split") {
    import spark.implicits._
    val eq = (1 to 4).map(i => ("k", 5.0)).toDF("g", "v")
    val e = Features.inequalityIndices(eq, "g", "v").head
    assert(e.getDouble(3) == 5.0 && e.getDouble(4) == 0.0 &&
      e.getDouble(5) == 0.0)
    // {1, 9}: mean 5, geomean 3 → Atkinson 0.4; shares .1/.9 → Hoover .4
    val uneq = Seq(("k", 1.0), ("k", 9.0)).toDF("g", "v")
    val u = Features.inequalityIndices(uneq, "g", "v").head
    assert(math.abs(u.getDouble(4) - 0.4) < 1e-5)
    assert(u.getDouble(5) == 0.4)
  }

  test("chowTest: hand SSEs and F on a shifted-intercept break; a " +
      "missing regime nulls") {
    import spark.implicits._
    // regime a: 4 points around y=x (SSE/n = .2); regime b: same shape
    // shifted +16 in y → pooled fit is terrible → large F
    val df = (Seq((0.0, 0.0), (1.0, 1.0), (2.0, 1.0), (3.0, 2.0))
      .map { case (x, y) => ("k", false, x, y) } ++
      Seq((4.0, 20.0), (5.0, 21.0), (6.0, 23.0), (7.0, 24.0))
        .map { case (x, y) => ("k", true, x, y) })
      .toDF("k", "late", "x", "y")
    val r = Features.chowTest(df, "k", "late", "x", "y").head
    assert(r.getLong(1) == 8L && r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getDouble(5) == 0.2 && r.getDouble(6) == 0.2)
    // pooled SSE: uxx=336, uyy=7152, uxy=1424 → (7152−1424²/336)/8
    val ssep = (7152.0 - 1424.0 * 1424.0 / 336.0) / 8.0
    assert(r.getDouble(4) == r6(ssep))
    assert(r.getDouble(7) == r6((ssep - 0.4) / 2.0 / (0.4 / 4.0)))
    // single regime: no break to test
    val one = df.where(!col("late"))
    assert(Features.chowTest(one, "k", "late", "x", "y").head.isNullAt(7))
  }

  test("breuschPagan: exact fit nulls the aux r²; variance growing " +
      "with x flags") {
    import spark.implicits._
    val exact = (1 to 6).map(i => ("k", i.toDouble, 2.0 * i))
      .toDF("k", "x", "y")
    val e = Features.breuschPagan(exact, "k", "x", "y").head
    assert(e.getDouble(2) == 2.0 && e.isNullAt(4) && e.isNullAt(5))
    // residuals ±x/5 around y=x: e² = x²/25 grows with x
    val het = (1 to 10).map { i =>
      val eps = if (i % 2 == 0) i / 5.0 else -i / 5.0
      ("k", i.toDouble, i + eps)
    }.toDF("k", "x", "y")
    val h = Features.breuschPagan(het, "k", "x", "y").head
    assert(h.getDouble(4) > 0.3)
    assert(h.getDouble(5) == r6(h.getLong(1) * h.getDouble(4)))
  }

  test("regressionInfluence: the planted outlier tops Cook's ranking; " +
      "extreme x carries the leverage") {
    import spark.implicits._
    val df = ((1 to 9).map(i => ("k", i.toLong, i.toDouble, 2.0 * i)) :+
      ("k", 10L, 10.0, 40.0)).toDF("k", "id", "x", "y")
    val rows = Features.regressionInfluence(df, "k", "id", "x", "y", 3)
      .orderBy("rnk").collect()
    assert(rows.length == 3)
    // the (10, 40) point (true 2x = 20) dominates influence
    assert(rows.head.getLong(1) == 10L)
    assert(rows.head.getDouble(6) > rows(1).getDouble(6))
    // x = 10 is the extreme x → max leverage among returned rows
    assert(rows.head.getDouble(4) == rows.map(_.getDouble(4)).max)
    // a 2-point key: n ≤ 2 rows drop entirely
    val tiny = Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 3.0))
      .toDF("k", "id", "x", "y")
    assert(Features.regressionInfluence(tiny, "k", "id", "x", "y", 3)
      .count() == 0)
  }

  test("pageTrendTest: perfect named-order trend hits the closed-form " +
      "z; the reverse flips its sign; a missing treatment nulls z") {
    import spark.implicits._
    // 3 blocks, values increasing along the named order → R = (3,6,9),
    // L = 42, E = 36, Var = 6 → z = 6/√6
    val up = (1 to 3).flatMap(b => Seq(
      (s"b$b", "t1", 1.0), (s"b$b", "t2", 2.0), (s"b$b", "t3", 3.0)))
      .toDF("b", "t", "v")
    val ord = Seq("t1", "t2", "t3")
    val r = Features.pageTrendTest(up, "b", "t", "v", ord).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 42.0)
    assert(r.getDouble(3) == r6(6.0 / math.sqrt(6.0)))
    val down = up.withColumn("v", org.apache.spark.sql.functions
      .lit(4.0) - col("v"))
    val d = Features.pageTrendTest(down, "b", "t", "v", ord).head
    assert(d.getDouble(2) == 30.0 &&
      d.getDouble(3) == r6(-6.0 / math.sqrt(6.0)))
    // a named treatment absent from the data: k < |order| → z null
    val sub = up.where(col("t") =!= "t3")
    assert(Features.pageTrendTest(sub, "b", "t", "v", ord).head.isNullAt(3))
    intercept[IllegalArgumentException](
      Features.pageTrendTest(up, "b", "t", "v", Seq("t1", "t2")))
  }

  test("cvmTest: hand integrated-ECDF statistic; identical samples " +
      "score 0") {
    import spark.implicits._
    // A = {1,2}, B = {3,4}: gaps .5, 1, .5, 0 → U = 1.5, factor = .25
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Features.cvmTest(df, "g", "v", "a", "b").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.375)
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Features.cvmTest(same, "g", "v", "a", "b").head
      .getDouble(2) == 0.0)
  }

  test("splitHalfReliability: identical halves score 1; perfect " +
      "anti-correlation nulls the SB step-up; one-sided units drop") {
    import spark.implicits._
    // unit value appears once in each parity with the same value → r=1
    val same = (1 to 4).flatMap(u => Seq(
      (s"u$u", 0L, u.toDouble), (s"u$u", 1L, u.toDouble)))
      .toDF("u", "id", "v")
    val r = Features.splitHalfReliability(same, "u", "id", "v").head
    assert(r.getLong(0) == 4L && r.getDouble(1) == 1.0 &&
      r.getDouble(2) == 1.0)
    // odd half mirrored around 2.5 → r = −1 → SB undefined
    val anti = (1 to 4).flatMap(u => Seq(
      (s"u$u", 0L, u.toDouble), (s"u$u", 1L, 5.0 - u)))
      .toDF("u", "id", "v")
    val a = Features.splitHalfReliability(anti, "u", "id", "v").head
    assert(a.getDouble(1) == -1.0 && a.isNullAt(2))
    // a unit with only even observations contributes nothing
    val oneSided = same.union(Seq(("u9", 0L, 7.0)).toDF("u", "id", "v"))
    assert(Features.splitHalfReliability(oneSided, "u", "id", "v")
      .head.getLong(0) == 4L)
  }

  test("poissonDispersion: hand index on {1,2,3}; constant counts " +
      "read 0; singleton groups null") {
    import spark.implicits._
    val df = Seq(("g", "a", 1L), ("g", "b", 2L), ("g", "c", 3L))
      .toDF("g", "u", "c")
    val r = Features.poissonDispersion(df, "g", "c").head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.0 &&
      r.getLong(6) == 2L)
    val flat = Seq(("g", "a", 4L), ("g", "b", 4L)).toDF("g", "u", "c")
    assert(Features.poissonDispersion(flat, "g", "c").head
      .getDouble(4) == 0.0)
    val one = Seq(("g", "a", 4L)).toDF("g", "u", "c")
    assert(Features.poissonDispersion(one, "g", "c").head.isNullAt(4))
  }

  test("benfordSecondDigit: hand digit extraction, densified grid, " +
      "masses sum to 1") {
    import spark.implicits._
    // 10 -> 0, 25 -> 5, 125 -> 2, 999 -> 9; 9 has no second digit
    val df = Seq(("g", 10L), ("g", 25L), ("g", 125L), ("g", 9L),
      ("g", 999L)).toDF("g", "v")
    val got = Features.benfordSecondDigit(df, "g", "v")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == (0L to 9L).toSet) // densified
    assert(got(0L)._1 == 1L && got(5L)._1 == 1L && got(2L)._1 == 1L &&
      got(9L)._1 == 1L && got(1L)._1 == 0L)
    assert(got.values.forall(_._2 == 4L)) // total excludes the 9
    // expected masses are the driver ladder and form a distribution
    assert(got(0L)._3 == Features.BenfordP2(0))
    assert(math.abs(Features.BenfordP2.sum - 1.0) < 1e-12)
    // second-digit Benford is flatter than first-digit (0.120 > p2(0)
    // > ... > p2(9) ~ 0.085)
    assert(Features.BenfordP2(0) > Features.BenfordP2(9))
  }

  test("modeBy: most frequent value, smallest-value tie-break, nulls out") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 3L), ("a", 1L),            // clear mode 3
      ("b", 7L), ("b", 2L), ("b", 7L), ("b", 2L), // tie → smaller value 2
      ("c", 9L))
      .toDF("k", "v")
      .union(Seq(("c", null.asInstanceOf[java.lang.Long]))
        .toDF("k", "v"))
    val got = Features.modeBy(df, "k", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == Map(
      "a" -> ((3L, 2L, 2L)),
      "b" -> ((2L, 2L, 2L)),
      "c" -> ((9L, 1L, 1L)))) // the null row neither counts nor groups
  }

  test("grubbs: worst standardized deviation, id tie-break, verdict on " +
      "the rounded score") {
    import spark.implicits._
    // group a: values 0,0,0,0,4 → mean .8, sd 1.6, G = |4-.8|/1.6 = 2.0
    // group b: constant → sd 0 → z 0 everywhere, smallest id reported
    val df = Seq(("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0),
      ("a", 4L, 0.0), ("a", 5L, 4.0),
      ("b", 7L, 5.0), ("b", 6L, 5.0)).toDF("k", "id", "v")
    val got = Features.grubbs(df, "k", "v", "id", threshold = 1.5)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 5L && a.getDouble(2) == 2.0)
    assert(a.getDouble(3) == 4.0 && a.getLong(4) == 5L)
    assert(a.getBoolean(5))
    val b = got("b")
    assert(b.getDouble(2) == 0.0 && b.getLong(4) == 6L && !b.getBoolean(5))
    // null value rows are excluded from both the moments and the argmax
    val withNull = df.union(Seq(("a", 9L, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "id", "v"))
    assert(Features.grubbs(withNull, "k", "v", "id").collect()
      .map(_.getLong(1)).sum == 7L)
    intercept[IllegalArgumentException](Features.grubbs(df, "k", "v", "id", 0.0))
  }

  test("andersonDarlingTest: hand pooled-ECDF terms land on E[A2] = 1") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: N = 4, pooled values 1, 2 contribute
    // (value 3 has B = N, excluded); every term is 4/24 or 8/24 and the
    // 9-rounded sum closes at exactly 1.0 — the H0 expectation
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Features.andersonDarlingTest(df, "g", "v", "a", "b").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L) // support values with B < N
    assert(r.getDouble(3) == 1.0)
    // disjoint supports: hand terms 4·(1/6) + 2·(1/2) → 1.666667, the
    // n=2 separation maximum — above the H0 expectation
    val sep = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0))
      .toDF("g", "v")
    val s = Features.andersonDarlingTest(sep, "g", "v", "a", "b").head
    assert(s.getDouble(3) == 1.666667)
    // a single shared pooled value is all endpoint (B = N) → no usable
    // support, the frame is honestly empty (matches the oracle's GROUP
    // BY over zero term rows)
    val same = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Features.andersonDarlingTest(same, "g", "v", "a", "b")
      .collect().isEmpty)
  }

  test("paretoCut: exact bar crossings, tie order, negative guard") {
    import spark.implicits._
    // entity totals 50, 30, 20: p50 crosses at rank 1 (cum 50 ≥ 50),
    // p80 at rank 2 (cum 80)
    val df = Seq(("g", 1L, 30.0), ("g", 2L, 50.0), ("g", 3L, 20.0),
      // ties on value → smaller entity id ranks first
      ("h", 5L, 10.0), ("h", 4L, 10.0)).toDF("k", "e", "v")
    val got = Features.paretoCut(df, "k", "e", "v",
      Seq(("p50", 1, 2), ("p80", 4, 5)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val g50 = got(("g", "p50"))
    assert(g50.getLong(2) == 1L && g50.getLong(3) == 3L)
    assert(g50.getDouble(4) == 0.333333 && g50.getDouble(5) == 0.5)
    val g80 = got(("g", "p80"))
    assert(g80.getLong(2) == 2L && g80.getDouble(5) == 0.8)
    // h: two equal halves — p50 crosses at the FIRST (smaller id) row
    assert(got(("h", "p50")).getLong(2) == 1L)
    assert(got(("h", "p80")).getLong(2) == 2L)
    val neg = Seq(("g", 1L, -5.0)).toDF("k", "e", "v")
    val ex = intercept[Exception](
      Features.paretoCut(neg, "k", "e", "v", Seq(("p50", 1, 2))).collect())
    assert(String.valueOf(ex.getMessage).contains("paretoCut") ||
      String.valueOf(ex.getCause).contains("paretoCut"))
    intercept[IllegalArgumentException](
      Features.paretoCut(df, "k", "e", "v", Nil))
    intercept[IllegalArgumentException](
      Features.paretoCut(df, "k", "e", "v", Seq(("bad", 3, 2))))
    intercept[IllegalArgumentException](Features.paretoCut(df, "k", "e",
      "v", Seq(("p50", 1, 2), ("p50", 1, 2))))
  }

  test("ansariBradley: extreme-distance scores, parity-split moments, " +
      "wide group scores low") {
    import spark.implicits._
    // odd N: A = {1, 9} (wide), B = {4, 5, 6} — pooled scores
    // 1,2,3,2,1 → T_A = 2; E = 2·36/20 = 3.6, Var = 1008/1200 = 0.84,
    // z = −1.6/√0.84 = −1.745743
    val odd = Seq(("a", 1.0), ("a", 9.0), ("b", 4.0), ("b", 5.0),
      ("b", 6.0)).toDF("g", "v")
    val ro = Features.ansariBradley(odd, "g", "v", "a", "b").head
    assert(ro.getLong(0) == 2L && ro.getLong(1) == 3L)
    assert(ro.getDouble(2) == 2.0)
    assert(ro.getDouble(3) == -1.745743 && ro.getString(4) == "same_scale")
    // even N: A = {1, 10}, B = {4, 5} → T_A = 2, E = 3, Var = 1/3,
    // z = −√3
    val even = Seq(("a", 1.0), ("a", 10.0), ("b", 4.0), ("b", 5.0))
      .toDF("g", "v")
    val re = Features.ansariBradley(even, "g", "v", "a", "b").head
    assert(re.getDouble(2) == 2.0 && re.getDouble(3) == -1.732051)
    // a missing group zeroes n and nulls the readout
    val ra = Features.ansariBradley(
      Seq(("b", 1.0)).toDF("g", "v"), "g", "v", "a", "b").head
    assert(ra.getLong(0) == 0L && ra.isNullAt(3) && ra.isNullAt(4))
    intercept[IllegalArgumentException](
      Features.ansariBradley(odd, "g", "v", "a", "a"))
  }

  test("fleissKappaBinary: perfect agreement 1, unanimity nulls, " +
      "systematic disagreement goes negative") {
    import spark.implicits._
    // both raters-all-agree items, split verdicts: κ = 1
    val perfect = Seq((true, true, true), (false, false, false))
      .toDF("r1", "r2", "r3")
    val rp = Features.fleissKappaBinary(perfect, Seq("r1", "r2", "r3"))
      .head
    assert(rp.getLong(0) == 2L && rp.getInt(1) == 3)
    assert(rp.getDouble(2) == 0.5 && rp.getDouble(5) == 1.0)
    // unanimous all-pass: P̄_e = 1, κ undefined → null
    val flat = Seq((true, true, true), (true, true, true))
      .toDF("r1", "r2", "r3")
    assert(Features.fleissKappaBinary(flat, Seq("r1", "r2", "r3"))
      .head.isNullAt(5))
    // a = 2, 1: P̄ = 1/3, P̄_e = 1/2 → κ = −1/3
    val dis = Seq((true, true, false), (true, false, false))
      .toDF("r1", "r2", "r3")
    val rd = Features.fleissKappaBinary(dis, Seq("r1", "r2", "r3")).head
    assert(rd.getDouble(3) == 0.333333 && rd.getDouble(5) == -0.333333)
    intercept[IllegalArgumentException](
      Features.fleissKappaBinary(perfect, Seq("r1")))
    intercept[IllegalArgumentException](
      Features.fleissKappaBinary(perfect, Seq("r1", "r1")))
  }

  test("calibrationSummary: ECE/MCE from the bucket gaps, Brier from " +
      "the raw rows") {
    import spark.implicits._
    val scored = Seq((0.9, true), (0.8, true), (0.2, false),
      (0.1, false)).toDF("score", "label")
    val r = Features.calibrationSummary(scored, "score", "label",
      bins = 2).head
    // buckets at the 0.5 median: high {0.9, 0.8} gap −0.15,
    // low {0.2, 0.1} gap 0.15 → ECE = MCE = 0.15;
    // Brier = (0.01 + 0.04 + 0.04 + 0.01)/4 = 0.025
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.15 && r.getDouble(2) == 0.15)
    assert(r.getDouble(3) == 0.025)
    // a perfectly calibrated constant scorer: ECE = |0.5 − 0.5| = 0
    val flat = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("score", "label")
    val rf = Features.calibrationSummary(flat, "score", "label", 2).head
    assert(rf.getDouble(1) == 0.0 && rf.getDouble(3) == 0.25)
  }

  test("directStandardization: crude differs from standardized when " +
      "mixes differ; absent strata contribute 0") {
    import spark.implicits._
    // strata mix: s1 has 4 rows, s2 has 4 → weights 0.5/0.5.
    // g1: all in s1, rate 1.0; g2: all in s2, rate 0.5.
    // std(g1) = 0.5·1.0 + 0 (no s2 cell) = 0.5; crude(g1) = 1.0
    val df = Seq(
      ("g1", "s1", true), ("g1", "s1", true), ("g1", "s1", true),
      ("g1", "s1", true),
      ("g2", "s2", true), ("g2", "s2", true), ("g2", "s2", false),
      ("g2", "s2", false)).toDF("g", "s", "f")
    val got = Features.directStandardization(df, "g", "s", "f")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert(g1.getLong(1) == 4L && g1.getDouble(2) == 1.0 &&
      g1.getDouble(3) == 0.5)
    val g2 = got("g2")
    assert(g2.getDouble(2) == 0.5 && g2.getDouble(3) == 0.25)
    // identical mixes: std equals crude
    val bal = Seq(("a", "s1", true), ("a", "s2", false),
      ("b", "s1", false), ("b", "s2", false)).toDF("g", "s", "f")
    val rb = Features.directStandardization(bal, "g", "s", "f")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rb("a").getDouble(2) == 0.5 && rb("a").getDouble(3) == 0.5)
    assert(rb("b").getDouble(3) == 0.0)
  }
}
