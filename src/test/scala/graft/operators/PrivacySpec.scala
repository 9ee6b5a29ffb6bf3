package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P77 k-anonymity semantics: QID multiplicities, the k gate, null
  * grouping, and input validation. */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  test("kAnonymityFilter counts QID groups and gates on k") {
    val rows = Seq(
      (1L, "us", "A"), (2L, "us", "A"), (3L, "us", "A"),
      (4L, "us", "B"),
      (5L, "de", "A"), (6L, "de", "A")
    ).toDF("id", "country", "segment")
    val got = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, true)) && got(2L) == ((3L, true)) && got(3L) == ((3L, true)))
    assert(got(4L) == ((1L, false))) // unique combination → suppressed
    assert(got(5L) == ((2L, true)) && got(6L) == ((2L, true)))
    // k = 1 releases everything
    val all = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 1)
    assert(all.where(!col("kept")).count() == 0)
    // higher k suppresses the pair too
    val strict = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(strict(5L) == false && strict(1L) == true)
  }

  test("nulls form their own QID group; validation rejects bad input") {
    val rows = Seq(
      (1L, Some("us")), (2L, None), (3L, None)
    ).toDF("id", "country")
    val got = Privacy.kAnonymityFilter(rows, Seq("country"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 2L)
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Seq("country"), k = 0))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Nil, k = 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Seq("nope"), k = 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows.withColumn("kept", lit(true)), Seq("country"), k = 2))
  }

  test("lDiversityFilter gates on distinct sensitive values and computes entropy") {
    // group (us): sensitive {x, x, y, z} → 3 distinct,
    //   entropy = −(½ln½ + ¼ln¼ + ¼ln¼) = 1.5·ln2 ≈ 1.039720771
    // group (de): sensitive {x, x}       → 1 distinct, entropy 0
    val rows = Seq(
      (1L, "us", "x"), (2L, "us", "x"), (3L, "us", "y"), (4L, "us", "z"),
      (5L, "de", "x"), (6L, "de", "x")
    ).toDF("id", "country", "diag")
    val got = Privacy.lDiversityFilter(rows, Seq("country"), "diag", l = 2)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val entUs = BigDecimal(-0.5 * math.log(0.5))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +
      2 * BigDecimal(-0.25 * math.log(0.25))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L && got(1L)._3 == true)
    // decimal-sum-then-convert vs double-added spec value: allow 1 ulp
    assert(math.abs(got(1L)._2 - entUs) < 1e-12)
    assert(got(5L) == ((1L, 0.0, false))) // homogeneous group suppressed
    // null sensitive values count as a value of their own
    val withNull = Seq((1L, "us", Some("x")), (2L, "us", None))
      .toDF("id", "country", "diag")
    val nd = Privacy.lDiversityFilter(withNull, Seq("country"), "diag", l = 2)
      .collect().map(r => r.getLong(3)).distinct
    assert(nd.toSeq == Seq(2L))
    intercept[IllegalArgumentException](
      Privacy.lDiversityFilter(rows, Seq("country"), "diag", l = 0))
    intercept[IllegalArgumentException](
      Privacy.lDiversityFilter(rows, Seq("country"), "country", l = 2))
    intercept[IllegalArgumentException](
      Privacy.lDiversityFilter(rows, Seq("country"), "nope", l = 2))
  }

  test("laplaceNoisyCounts: deterministic draw, scale, clamp, salt decorrelation") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    def run(eps: Double, salt: String = "dp") =
      Privacy.laplaceNoisyCounts(df, Seq("k"), epsilon = eps, salt = salt)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val got = run(0.5)
    // replay the draw by hand for one group: u from the shared helper
    val uA = spark.range(1)
      .select(graft.operators.Sampling.uniform01(lit("a"), "dp"))
      .head.getDouble(0)
    val pA = uA - 0.5
    val expA = BigDecimal(-2.0 * math.signum(pA) *
        math.log(math.max(1.0 - 2.0 * math.abs(pA), math.pow(2.0, -56))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a")._1 == 50L && got("a")._2 == expA)
    assert(got("a")._3 == math.max(0.0, 50.0 + expA))
    // re-running with the same salt reuses the identical draw
    assert(run(0.5) == got)
    // tighter ε → proportionally larger |noise| (b doubles, same u)
    val loose = run(0.25)
    for (k <- Seq("a", "b", "c"))
      assert(math.abs(loose(k)._2 - 2.0 * got(k)._2) < 1e-8, k)
    // a different salt draws fresh noise
    assert(run(0.5, salt = "dp2") != got)
    // small group + negative draw can clamp to zero, never below
    assert(got.values.forall(_._3 >= 0.0))
    intercept[IllegalArgumentException](
      Privacy.laplaceNoisyCounts(df, Seq("k"), epsilon = 0.0))
    intercept[IllegalArgumentException](
      Privacy.laplaceNoisyCounts(df, Nil, epsilon = 1.0))
  }

  test("tCloseness: ordered EMD against the global distribution") {
    // global over {1, 2} is uniform; A is all-1s, B all-2s, C balanced
    val df = Seq(
      ("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L), ("C", 1L), ("C", 2L))
      .toDF("qid", "v")
    val got = Privacy.tCloseness(df, Seq("qid"), "v", t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // m = 2 → emd = |cum_1(p − q)| = |1 − 0.5| = 0.5 for the skewed pair
    assert(got == Map(
      "A" -> ((2L, 0.5, false)),
      "B" -> ((2L, 0.5, false)),
      "C" -> ((2L, 0.0, true))))
    // a single global value: every class trivially matches (emd 0)
    val one = Seq(("A", 7L), ("B", 7L)).toDF("qid", "v")
    assert(Privacy.tCloseness(one, Seq("qid"), "v", 0.1)
      .collect().forall(r => r.getDouble(2) == 0.0 && r.getBoolean(3)))
    intercept[IllegalArgumentException](Privacy.tCloseness(df, Nil, "v", 0.1))
    intercept[IllegalArgumentException](
      Privacy.tCloseness(df, Seq("qid"), "v", 0.0))
    intercept[IllegalArgumentException](
      Privacy.tCloseness(df, Seq("v"), "v", 0.1))
  }

  test("pseudonymize: stable salted-MD5 tokens, join-preserving, audited") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 2L, 3L, 1L).toDF("id")
    val got = Privacy.pseudonymize(ids, "id", "s:")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size == 3) // distinct ids only
    // replay the construction by hand
    def tok(i: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"s:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(got(1L)._1 == tok(1L) && got(2L)._1 == tok(2L))
    assert(got.values.forall(_._2 == 0L)) // no collisions at this scale
    // stability: a different salt re-keys everything
    val rekeyed = Privacy.pseudonymize(ids, "id", "other:")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rekeyed(1L) != got(1L)._1)
  }

  test("laplaceNoisyMean: clipped, clamped, deterministic per salt") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", i.toDouble)) :+ (("g", 1000.0))
    val data = df.toDF("grp", "v")
    def run(salt: String) =
      Privacy.laplaceNoisyMean(data, Seq("grp"), "v", lo = 0.0, hi = 100.0,
        epsilon = 1.0, salt = salt).head
    val r = run("dpmean")
    assert(r.getLong(1) == 51L)
    // the 1000 outlier clips to 100: clipped sum 1275 + 100
    assert(r.getDouble(2) == 1375.0)
    // true mean reads the raw values: round(2275/51, 6)
    assert(r.getDouble(3) == 44.607843)
    val dp = r.getDouble(4)
    assert(dp >= 0.0 && dp <= 100.0)              // post-processing clamp
    assert(run("dpmean").getDouble(4) == dp)      // same salt → same release
    assert(run("fresh").getDouble(4) != dp)       // fresh salt → fresh draw
    intercept[IllegalArgumentException](
      Privacy.laplaceNoisyMean(data, Seq("grp"), "v", 5.0, 1.0, 1.0))
    intercept[IllegalArgumentException](
      Privacy.laplaceNoisyMean(data, Seq("grp"), "v", 0.0, 1.0, 0.0))
  }

  test("randomizedResponse: exact integer debias, deterministic flips") {
    val df = spark.range(1, 201)
      .select(col("id"), (col("id") <= 80).as("truth"), lit("g").as("grp"))
    val r = Privacy.randomizedResponse(df, "id", "truth", "grp",
      pPct = 75, salt = "rrspec:").head
    assert(r.getLong(1) == 200L)
    assert(r.getDouble(2) == 0.4)                    // rate_true audit
    val rep = r.getDouble(3); val est = r.getDouble(4)
    // the debias is exactly (r̂ − 0.25)/0.5 = 2r̂ − 0.5 at p = 75%
    assert(math.abs(est - (2 * rep - 0.5)) < 1e-9)
    // with n = 200 the flip noise keeps the estimate in the ballpark
    assert(est > 0.2 && est < 0.6)
    assert(math.abs(r.getDouble(5) - (est - 0.4)) < 1e-9)
    // determinism: the same salt reproduces the identical estimate
    val again = Privacy.randomizedResponse(df, "id", "truth", "grp",
      pPct = 75, salt = "rrspec:").head
    assert(again.getDouble(4) == est)
    intercept[IllegalArgumentException](
      Privacy.randomizedResponse(df, "id", "truth", "grp", pPct = 50))
    intercept[IllegalArgumentException](
      Privacy.randomizedResponse(df, "id", "truth", "grp", pPct = 100))
  }

  test("generalizationLadder: coarser bands release more rows") {
    // two nations, balances 0..199: width 10 → groups of 5 (all safe at
    // k=5); width 1 → singletons (none safe)
    val df = spark.range(200)
      .select((col("id") % 2).as("nat"), lit("S").as("seg"),
        (col("id") / 2).cast("double").as("bal"))
    val rows = Privacy.generalizationLadder(df, Seq("nat", "seg"), "bal",
      Seq(1L, 10L), k = 5).orderBy("width").collect()
    assert(rows.length == 2)
    val w1 = rows(0); val w10 = rows(1)
    assert(w1.getLong(0) == 1L && w1.getLong(1) == 200L)
    assert(w1.getLong(4) == 0L && w1.getDouble(5) == 0.0)
    // width 10: each (nat, band) holds 10 ids → 20 groups, all safe
    assert(w10.getLong(2) == 20L && w10.getLong(3) == 20L &&
      w10.getLong(4) == 200L && w10.getDouble(5) == 1.0)
    intercept[IllegalArgumentException](
      Privacy.generalizationLadder(df, Nil, "bal", Seq(10L), 5))
    intercept[IllegalArgumentException](
      Privacy.generalizationLadder(df, Seq("nat"), "bal", Seq(10L, 10L), 5))
    intercept[IllegalArgumentException](
      Privacy.generalizationLadder(df, Seq("nat"), "bal", Seq(10L), 1))
  }

  test("reidentificationRisk: attacker-model metrics over QID classes") {
    import spark.implicits._
    // classes: a×1 (unique), b×4 (risky), c×5 (at the bar)
    val rows = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(5)("c"))
      .zipWithIndex.map { case (q, i) => (i.toLong, q) }.toDF("id", "q")
    val r = Privacy.reidentificationRisk(rows, Seq("q")).head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L &&
      r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 1.0)       // prosecutor: the unique record
    assert(r.getDouble(5) == 0.3)       // 3 classes / 10 records
    assert(r.getDouble(6) == 0.5)       // (1 + 4) / 10 under k = 5
    // a null QID is its own (linkable) class
    val withNull = rows.union(Seq((99L, null.asInstanceOf[String]),
      (100L, null.asInstanceOf[String])).toDF("id", "q"))
    val n = Privacy.reidentificationRisk(withNull, Seq("q")).head
    assert(n.getLong(1) == 4L && n.getLong(0) == 12L)
    intercept[IllegalArgumentException](
      Privacy.reidentificationRisk(rows, Nil))
  }

  test("kMap: population class sizes drive the risk, not sample sizes") {
    import spark.implicits._
    // population: a×1, b×4, c×10; sample: one record from each class.
    // Sample-side k is 1 everywhere (pv9 would read all three as unique);
    // k-map reads the register: only 'a' is pop-unique, 'b' is under
    // k=5, 'c' is safe.
    val pop = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(10)("c"))
      .zipWithIndex.map { case (q, i) => (i.toLong, q) }.toDF("id", "q")
    val sample = Seq((0L, "a"), (1L, "b"), (5L, "c")).toDF("id", "q")
    val r = Privacy.kMap(sample, pop, Seq("q"), k = 5).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L) // a pop-unique; a,b under k
    assert(r.getDouble(5) == 0.666667)
    // exp risk = (1/1 + 1/4 + 1/10) / 3 = 1.35/3 = 0.45
    assert(r.getDouble(6) == 0.45)
    // a sample class absent from the population violates the contract
    val bad = Seq((7L, "zz")).toDF("id", "q")
    intercept[Exception] {
      Privacy.kMap(bad, pop, Seq("q"), k = 5).collect()
    }
    intercept[IllegalArgumentException](Privacy.kMap(sample, pop, Nil, 5))
    intercept[IllegalArgumentException](Privacy.kMap(sample, pop, Seq("q"), 1))
  }

  test("qidUnicitySweep: nested prefixes, grand total dropped, " +
      "labels follow the column order") {
    import spark.implicits._
    val rows = Seq(("A", "x", 1L), ("A", "x", 1L), ("A", "y", 2L),
      ("B", "x", 3L)).toDF("n", "s", "b")
    val got = Privacy.qidUnicitySweep(rows, Seq("n", "s", "b"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(1, 2, 3)) // no 0-QID rung
    val d1 = got(1)
    assert(d1.getString(1) == "n" && d1.getLong(2) == 4L &&
      d1.getLong(3) == 2L && d1.getLong(4) == 1L &&
      d1.getDouble(5) == 0.25 && d1.getDouble(6) == 2.0)
    val d2 = got(2)
    assert(d2.getString(1) == "n,s" && d2.getLong(3) == 3L &&
      d2.getLong(4) == 2L && d2.getDouble(5) == 0.5 &&
      d2.getDouble(6) == 1.333333)
    val d3 = got(3)
    assert(d3.getString(1) == "n,s,b" && d3.getLong(3) == 3L &&
      d3.getLong(4) == 2L)
    intercept[IllegalArgumentException](Privacy.qidUnicitySweep(rows, Nil))
  }
}
