package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch semantics: the CM upper-bound guarantee and collisions. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private lazy val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")

  test("cms estimates never undercount; wide sketches are exact") {
    val df = items.toDF("item")
    val exact = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)
    for ((rows, width) <- Seq((2, 1024), (3, 8), (1, 2))) {
      val sketch = Sketches.countMinSketch(df, "item", rows, width)
      val est = Sketches.cmsEstimate(sketch,
          df.select("item").distinct(), "item", rows, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((k, n) <- exact)
        assert(est(k) >= n, s"CM bound violated at rows=$rows width=$width: $k")
      if (width == 1024) assert(est == exact, "wide sketch must be collision-free")
    }
    // width 1 forces every item into one cell: estimate = total count
    val sat = Sketches.cmsEstimate(
        Sketches.countMinSketch(df, "item", 2, 1),
        df.select("item").distinct(), "item", 2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sat.values.toSet == Set(items.length.toLong))
  }

  test("sketch cells total rows×occurrences and buckets stay in range") {
    val df = items.toDF("item")
    val cells = Sketches.countMinSketch(df, "item", rows = 3, width = 4).collect()
    assert(cells.map(_.getLong(2)).sum == 3L * items.length)
    assert(cells.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 3))
    // unknown probes estimate from whatever collides — never negative,
    // and 0 when the probe's cells are all empty
    val ghost = Sketches.cmsEstimate(
        Sketches.countMinSketch(df, "item", 2, 1024),
        Seq("zzz").toDF("item"), "item", 2, 1024)
      .collect().map(r => r.getLong(1))
    assert(ghost.head == 0L)
    intercept[IllegalArgumentException](Sketches.countMinSketch(df, "item", 0, 4))
  }

  test("hll estimate tracks cardinality within the published error bound") {
    // 5000 distinct keys, each duplicated — m=64 gives σ ≈ 1.04/√64 = 13%;
    // 3σ = 39% is a deterministic check (the sketch has no RNG), the
    // margin just avoids pinning one hash layout's luck
    val df = (0 until 5000).flatMap(i => Seq(s"k$i", s"k$i")).toDF("item")
      .withColumn("g", lit("all"))
    val est = Sketches.hllDistinct(df, "item", Seq("g"))
      .collect().head.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.39, s"est=$est")
    // small range: 3 distinct of 64 registers → linear counting
    // m·ln(m/(m−3)) regardless of duplicates
    val small = Seq("a", "b", "c", "a").toDF("item").withColumn("g", lit("all"))
    val smallEst = Sketches.hllDistinct(small, "item", Seq("g"))
      .collect().head.getDouble(1)
    assert(smallEst == 64.0 * math.log(64.0 / 61.0))
    intercept[IllegalArgumentException](Sketches.hllDistinct(small, "item", Seq("g"), p = 3))
    // group columns must not shadow the sketch's internal names
    intercept[IllegalArgumentException](
      Sketches.hllDistinct(small.withColumnRenamed("g", "rank"), "item", Seq("rank")))
  }

  test("streaming cms cells equal the batch sketch of each window's events") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Sketches.streamingCountMin(
        input.toDF().toDF("ts", "item"), "ts", "item",
        rows = 2, width = 8, windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("scms")
      .outputMode("update").start()
    // two windows: [10:00,10:10) gets a,a,b — [10:10,10:20) gets a,c
    input.addData((ts(1), "a"), (ts(3), "a"), (ts(7), "b"), (ts(12), "a"), (ts(15), "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scms")
      .groupBy("window_start", "r", "bucket").agg(max("n").as("n")) // update mode: keep latest
      .collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    def batchCells(items: Seq[String]) =
      Sketches.countMinSketch(items.toDF("item"), "item", 2, 8)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w1 = batchCells(Seq("a", "a", "b"))
    val w2 = batchCells(Seq("a", "c"))
    val gotW1 = got.collect { case ((w, r, b), n) if w == ts(0) => (r, b) -> n }
    val gotW2 = got.collect { case ((w, r, b), n) if w == ts(10) => (r, b) -> n }
    assert(gotW1 == w1, "window 1 cells must equal the batch sketch")
    assert(gotW2 == w2, "window 2 cells must equal the batch sketch")
    intercept[IllegalArgumentException](
      Sketches.streamingCountMin(input.toDF().toDF("ts", "item"), "ts", "item",
        rows = 0, width = 8))
  }

  test("streaming hll registers equal the batch registers per window") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Sketches.streamingHllRegisters(
        input.toDF().toDF("ts", "item"), "ts", "item",
        p = 4, windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("shll")
      .outputMode("update").start()
    input.addData((ts(1), "a"), (ts(3), "b"), (ts(7), "a"),
      (ts(12), "c"), (ts(15), "d"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("shll")
      .groupBy("window_start", "register").agg(max("mj").as("mj"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getInt(2)).toMap
    // batch registers = the hllDistinct pipeline's cells; recompute them
    // through the same public surface: a wide-register estimate at p=4 on
    // each window's items must agree with an estimate derived from the
    // streamed cells, so compare the full register MAPS via the estimate
    def estimate(regs: Map[Long, Int]): Double = {
      val m = 16
      val maxRank = 53
      val sPresent = regs.values.map(mj => math.pow(2.0, maxRank - mj).toLong).sum
      val s = sPresent + (m - regs.size).toLong * math.pow(2.0, maxRank).toLong
      val v = m - regs.size
      val raw = 0.673 * (m.toLong * m).toDouble * math.pow(2.0, maxRank) / s
      if (v > 0 && raw <= 2.5 * m) m.toDouble * math.log(m.toDouble / v) else raw
    }
    def batchEst(items: Seq[String]): Double =
      Sketches.hllDistinct(items.toDF("item").withColumn("g", lit(1)),
          "item", Seq("g"), p = 4)
        .collect().head.getDouble(1)
    val w1 = got.collect { case ((w, r), mj) if w == ts(0) => r -> mj }
    val w2 = got.collect { case ((w, r), mj) if w == ts(10) => r -> mj }
    assert(estimate(w1) == batchEst(Seq("a", "b", "a")))
    assert(estimate(w2) == batchEst(Seq("c", "d")))
    intercept[IllegalArgumentException](
      Sketches.streamingHllRegisters(input.toDF().toDF("ts", "item"),
        "ts", "item", p = 3))
  }

  test("hll is partitioning-invariant and duplicate-insensitive") {
    val base = (0 until 300).map(i => s"v$i") ++ (0 until 300).map(i => s"v$i")
    val a = base.toDF("item").withColumn("g", pmod(length(col("item")), lit(2)))
    val b = base.toDF("item").repartition(7).withColumn("g", pmod(length(col("item")), lit(2)))
    val dedup = base.distinct.toDF("item").withColumn("g", pmod(length(col("item")), lit(2)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllDistinct(df, "item", Seq("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(run(a) == run(b), "same data, different partitioning → same sketch")
    assert(run(a) == run(dedup), "duplicates must not move any register")
  }

  test("heavy hitters returns exactly the items above n/k, any partitioning") {
    // n = 100: a=40, b=25, c=10 (= n/10, strictly excluded), 25 singletons
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (0 until 25).map(i => s"x$i")
    val expect = Map("a" -> 40L, "b" -> 25L) // cnt·10 > 100
    for (parts <- Seq(1, 3, 16)) {
      val df = data.toDF("item").repartition(parts)
      val got = Sketches.heavyHitters(df, "item", k = 10)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("heavy hitters: boundary strictness, nulls, long-tail superset pruning") {
    // exact-boundary item (cnt·k == n) must NOT appear
    val bnd = (Seq.fill(5)("e") ++ Seq.fill(5)("f")).toDF("item")
    assert(Sketches.heavyHitters(bnd, "item", k = 2).count() == 0)
    // nulls are neither hitters nor counted in the total: 3 of 4 non-null
    val withNull = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None, None)
      .toDF("item")
    val got = Sketches.heavyHitters(withNull, "item", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 4L)))
    // a pure long tail (every count = 1, k << distinct) yields nothing even
    // though MG nominates k candidates per partition
    val tail = (0 until 200).map(i => s"t$i").toDF("item").repartition(5)
    assert(Sketches.heavyHitters(tail, "item", k = 4).count() == 0)
    intercept[IllegalArgumentException](Sketches.heavyHitters(bnd, "item", 1))
  }

  test("kmvDistinct: exact below k, order-statistics estimate at k") {
    val items = (Seq("x", "y", "z", "w", "v", "x", "x").map(("a", _)) ++
      Seq(("b", "q"), ("b", "r"), ("b", "q")) ++
      Seq(("c", null))).toDF("g", "item")
    val got = Sketches.kmvDistinct(items, "item", Seq("g"), k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // null-only group vanishes entirely (no non-null items)
    assert(got.keySet == Set("a", "b"))
    // below k: the estimate IS the distinct-hash count
    assert(got("b") == ((2L, 2L, 2.0)))
    // at k: (k−1)·2^56 / h_(k), h_(k) replayed through the same hash
    val (nExact, nHashes, est) = got("a")
    assert(nExact == 5L && nHashes == 5L)
    val h3 = items.where($"g" === "a")
      .select(Sampling.hashValue($"item", "kmv:").as("h"))
      .distinct().orderBy($"h").collect().map(_.getLong(0)).apply(2)
    assert(est == BigDecimal(Sketches.kmvScale(3) / h3.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    intercept[IllegalArgumentException](
      Sketches.kmvDistinct(items, "item", Seq("g"), k = 1))
  }
  test("amsF2: counters replay the hash signs; est = counter^2; exact F2") {
    import spark.implicits._
    // items: a x3, b x2, c x1 -> F2 = 9 + 4 + 1 = 14
    val items = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .toDF("item")
    val got = Sketches.amsF2(items, "item", estimators = 4).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 4)
    // replay the signs by hand per estimator
    def sign(e: Int, item: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ams$e:$item".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      1L - 2L * (java.lang.Long.parseLong(hex, 16) % 2L)
    }
    for (e <- 0 until 4) {
      val counter = 3 * sign(e, "a") + 2 * sign(e, "b") + sign(e, "c")
      assert(got(e) == ((counter, counter * counter, 14L)))
    }
    intercept[IllegalArgumentException](Sketches.amsF2(items, "item", 0))
  }

  test("hdrQuantiles: two-digit buckets, rank crossing, exact side") {
    import spark.implicits._
    // values 1..100: buckets are exact below 100, [100] → bucket 100.
    // p50: target = ceil(0.5·100) = 50 → bucket 50 (exact = 50.5 by R-7)
    val vs = (1L to 100L).toDF("v")
    val got = Sketches.hdrQuantiles(vs, "v", Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0.5) == ((50L, 50L, 50.5)))
    assert(got(0.99)._2 == 99L)
    // a big value lands in a 10%-wide bucket: 123456 → width 10000 →
    // bucket_lo 120000; with 9 small values it IS the p99 target
    val skew = ((1L to 9L) :+ 123456L).toDF("v")
    val s = Sketches.hdrQuantiles(skew, "v", Seq(0.99)).head
    assert(s.getLong(2) == 120000L)
    // the bucket bound is within 10% of the true order statistic
    assert(120000L <= 123456L && 123456L < 120000L * 1.1)
    // non-positive values are excluded (no log bucket)
    assert(Sketches.hdrQuantiles(Seq(-5L, 0L, 7L).toDF("v"), "v", Seq(1.0))
      .head.getLong(2) == 7L)
    intercept[IllegalArgumentException](
      Sketches.hdrQuantiles(vs, "v", Seq.empty))
    intercept[IllegalArgumentException](
      Sketches.hdrQuantiles(vs, "v", Seq(1.5)))
  }

  test("captureRecapture: the estimate tracks the true population") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val r = Sketches.captureRecapture(ids, "id", samplePct = 30).head
    val (n1, n2, m, nTrue) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(5))
    assert(nTrue == 2000L && m > 0)
    // hand-check both closed forms against the returned counts
    assert(r.getDouble(3) == BigDecimal(n1.toDouble * n2.toDouble / m.toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Chapman lands within 25% of truth on a 30% sample of 2000
    assert(math.abs(r.getDouble(4) - 2000.0) < 500.0)
    // duplicate ids collapse before sampling
    val dup = (Seq(7L, 7L, 8L)).toDF("id")
    assert(Sketches.captureRecapture(dup, "id").head.getLong(5) == 2L)
    intercept[IllegalArgumentException](
      Sketches.captureRecapture(ids, "id", 0))
  }

  test("histQuantile: uniform data interpolates exactly, audit is honest") {
    import spark.implicits._
    // 0..99 in 10-wide buckets: p50 → bucket 4 boundary, est 50.0 vs
    // exact 49.5; p95 → est 95.0 vs exact 94.05
    val df = (0 until 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = Sketches.histQuantile(df, "k", "v", bandWidth = 10.0,
        ps = Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(0.5) == ((100L, 50.0, 49.5, 0.5)))
    assert(got(0.95) == ((100L, 95.0, 94.05, 0.95)))
    intercept[IllegalArgumentException](
      Sketches.histQuantile(df, "k", "v", 0.0, Seq(0.5)))
    intercept[IllegalArgumentException](
      Sketches.histQuantile(df, "k", "v", 10.0, Seq(1.5)))
  }

  test("bloomFpr: members never counted, saturation → certain FPs") {
    import spark.implicits._
    val ins = (1L to 50L).toDF("k")
    val probes = (1L to 500L).toDF("k")
    val r = Sketches.bloomFpr(ins, "k", probes, "k", m = 512, k = 3).head
    assert(r.getInt(0) == 512 && r.getInt(1) == 3)
    assert(r.getLong(2) == 50L)
    assert(r.getLong(4) == 450L)               // the 50 members excluded
    assert(r.getLong(3) <= 150L)               // ≤ k·n bits set
    // empirical FPR within sanity range of the fill-based prediction
    val fill = r.getLong(3).toDouble / 512.0
    assert(math.abs(r.getDouble(7) - math.pow(fill, 3)) < 1e-6)
    // a 2-bit filter saturates: every bit set, every probe a FP
    val tiny = Sketches.bloomFpr(ins, "k", probes, "k", m = 2, k = 2).head
    assert(tiny.getLong(3) == 2L && tiny.getLong(5) == 450L &&
      tiny.getDouble(6) == 1.0 && tiny.getDouble(7) == 1.0)
    intercept[IllegalArgumentException](
      Sketches.bloomFpr(ins, "k", probes, "k", m = 1, k = 2))
    intercept[IllegalArgumentException](
      Sketches.bloomFpr(ins, "k", probes, "k", m = 64, k = 0))
  }

  test("kmvSetOps: small sets are exact, estimates track the truth") {
    import spark.implicits._
    // A = 1..200, B = 101..300: union 300, intersection 100
    val items = ((1 to 200).map(i => (i.toLong, "x")) ++
      (101 to 300).map(i => (i.toLong, "y"))).toDF("id", "tag")
    // k far above both set sizes → theta = 2^56 → estimates are EXACT
    val ex = Sketches.kmvSetOps(items, "id", "tag", "x", "y", k = 512).head
    assert(ex.getLong(1) == 200L && ex.getLong(2) == 200L)
    assert(ex.getLong(3) == 300L && ex.getLong(4) == 100L)
    assert(ex.getDouble(5) == 200.0 && ex.getDouble(7) == 300.0 &&
      ex.getDouble(8) == 100.0)
    // honest sketching: k = 32 keeps estimates within a loose 2x band
    val sk = Sketches.kmvSetOps(items, "id", "tag", "x", "y", k = 32).head
    assert(sk.getDouble(7) > 150.0 && sk.getDouble(7) < 600.0)
    assert(sk.getDouble(9) >= 0.0 && sk.getDouble(9) <= 1.0)
    intercept[IllegalArgumentException](
      Sketches.kmvSetOps(items, "id", "tag", "x", "x", 32))
    intercept[IllegalArgumentException](
      Sketches.kmvSetOps(items, "id", "tag", "x", "y", 1))
  }

  test("cmsErrorCurve: overestimates only, wide sketches become exact") {
    import spark.implicits._
    val items = (1 to 1000).map(i => s"item${i % 50}").toDF("it")
    val rows = Sketches.cmsErrorCurve(items, "it", rows = 4,
      widths = Seq(8, 4096)).orderBy("width").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 50L)
      // CM never underestimates: max_err ≥ 0 and mean_err ≥ 0
      assert(r.getLong(4) >= 0L && r.getDouble(3) >= 0.0)
    }
    // 8 buckets over 50 items MUST collide; 4096 is collision-free
    assert(rows(0).getLong(2) > 0L)
    assert(rows(1).getLong(2) == 0L && rows(1).getDouble(3) == 0.0)
    intercept[IllegalArgumentException](
      Sketches.cmsErrorCurve(items, "it", 0, Seq(8)))
    intercept[IllegalArgumentException](
      Sketches.cmsErrorCurve(items, "it", 4, Seq(8, 8)))
  }

  test("hllUnion: merged estimate tracks the exact union") {
    import spark.implicits._
    val items = ((1 to 150).map(i => (i.toLong, "x")) ++
      (100 to 220).map(i => (i.toLong, "y"))).toDF("id", "tag")
    val r = Sketches.hllUnion(items, "id", "tag", "x", "y", p = 8).head
    assert(r.getInt(0) == 8)
    assert(r.getLong(4) == 150L && r.getLong(5) == 121L &&
      r.getLong(6) == 220L)
    // p=8 (256 registers) keeps relative error well under 20% here
    assert(math.abs(r.getDouble(3) - 220.0) / 220.0 < 0.2)
    assert(r.getDouble(3) >= r.getDouble(1) - 1e-9 &&
      r.getDouble(3) >= r.getDouble(2) - 1e-9) // union ≥ each side
    intercept[IllegalArgumentException](
      Sketches.hllUnion(items, "id", "tag", "x", "x", 8))
    intercept[IllegalArgumentException](
      Sketches.hllUnion(items, "id", "tag", "x", "y", 3))
  }

  test("hllIntersect: inclusion-exclusion over the shared union core") {
    import spark.implicits._
    val items = ((1 to 150).map(i => (i.toLong, "x")) ++
      (100 to 220).map(i => (i.toLong, "y"))).toDF("id", "tag")
    val r = Sketches.hllIntersect(items, "id", "tag", "x", "y", p = 8).head
    // exact |x ∩ y| = |{100..150}| = 51
    assert(r.getInt(0) == 8 && r.getLong(5) == 51L)
    // the estimate IS a + b − union of the shared core (same sketches
    // as hllUnion — refactor must not fork the state)
    val u = Sketches.hllUnion(items, "id", "tag", "x", "y", p = 8).head
    assert(r.getDouble(1) == u.getDouble(1) &&
      r.getDouble(2) == u.getDouble(2) && r.getDouble(3) == u.getDouble(3))
    val expected = BigDecimal(r.getDouble(1) + r.getDouble(2) -
      r.getDouble(3)).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(r.getDouble(4) == expected)
    // p=8 keeps the intersection estimate in the right ballpark
    assert(math.abs(r.getDouble(4) - 51.0) < 51.0)
  }

  test("cmsJoinSize: collision-free width is exact, width 1 is the bound") {
    import spark.implicits._
    val a = Seq(1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("k")
    // exact |A ⋈ B| = 2·1 + 1·2 = 4; a wide sketch has no collisions
    val wide = Sketches.cmsJoinSize(a, "k", b, "k", rows = 3,
      width = 4096).head
    assert(wide.getLong(3) == 4L && wide.getLong(2) == 4L &&
      wide.getDouble(4) == 0.0)
    // width 1: every key collides → est = |A|·|B| = 12, rel_err = 2
    val one = Sketches.cmsJoinSize(a, "k", b, "k", rows = 2, width = 1)
      .head
    assert(one.getLong(2) == 12L && one.getDouble(4) == 2.0)
    // disjoint sides: exact 0 → rel_err null, estimate still ≥ 0
    val dis = Sketches.cmsJoinSize(a, "k", Seq(9L).toDF("k"), "k", 3,
      4096).head
    assert(dis.getLong(3) == 0L && dis.isNullAt(4))
  }

  test("linearCounting: estimate replays from the occupied count; " +
      "saturation nulls") {
    import spark.implicits._
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val df = (1 to 8).map(i => ("g", s"v$i")).toDF("g", "v")
    val r = Sketches.linearCounting(df, "v", Seq("g"), 16).head
    assert(r.getInt(1) == 16 && r.getLong(2) == 8L)
    val occ = r.getLong(3)
    assert(occ >= 1L && occ <= 8L)
    assert(r.getDouble(4) ==
      r6(16.0 * r6(math.log(16.0 / (16.0 - occ)))))
    // 500 distinct values into 16 buckets: saturated bitmap -> null
    val big = (1 to 500).map(i => ("g", s"x$i")).toDF("g", "v")
    val b = Sketches.linearCounting(big, "v", Seq("g"), 16).head
    assert(b.getLong(3) == 16L && b.isNullAt(4))
    intercept[IllegalArgumentException](
      Sketches.linearCounting(df, "v", Seq("g"), 8))
  }

  test("hllErrorSweep: one ladder row per p, exact side shared, sane errors") {
    import spark.implicits._
    val df = (1L to 200L).map(i => i % 50).toDF("v") // 50 distinct, 4× dups
    val rows = Sketches.hllErrorSweep(df, "v", Seq(4, 8)).orderBy("p")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(4, 8))
    assert(rows.map(_.getLong(1)).toSeq == Seq(16L, 256L))
    assert(rows.forall(_.getLong(3) == 50L))
    // estimates live near the truth and rel_err is exactly their gap
    for (r <- rows) {
      val (est, exact, err) = (r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(math.abs(err) < 0.8, s"p=${r.getInt(0)} rel_err $err")
      assert(math.abs((est - exact) / exact - err) < 1e-6)
    }
    intercept[IllegalArgumentException](Sketches.hllErrorSweep(df, "v", Nil))
    intercept[IllegalArgumentException](
      Sketches.hllErrorSweep(df, "v", Seq(4, 4)))
    intercept[IllegalArgumentException](
      Sketches.hllErrorSweep(df, "v", Seq(3)))
  }

  test("decayedCounts: hand ladder weights, recency ratio, " +
      "beyond-ladder raise") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00")
    // key a: 2 events at age 2, 1 event at age 0 (ref = max day)
    // decayed = 2·0.81 + 1·1 = 2.62
    val ev = Seq(("a", ts(1)), ("a", ts(1)), ("a", ts(3)),
      ("b", ts(3))).toDF("k", "t")
    val got = Sketches.decayedCounts(ev, "k", "t", decay = 0.9,
        maxAgeDays = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L)
    assert(a.getDouble(3) == 2.62)
    assert(a.getDouble(4) == BigDecimal(2.62 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all activity on the reference day → ratio exactly 1
    val b = got("b")
    assert(b.getDouble(3) == 1.0 && b.getDouble(4) == 1.0)
    // a span beyond the ladder must raise, not silently weight NULL
    val ex = intercept[Exception](
      Sketches.decayedCounts(ev, "k", "t", 0.9, maxAgeDays = 1).collect())
    assert(String.valueOf(ex.getMessage).contains("decayedCounts") ||
      String.valueOf(ex.getCause).contains("decayedCounts"))
    intercept[IllegalArgumentException](
      Sketches.decayedCounts(ev, "k", "t", decay = 1.0))
    intercept[IllegalArgumentException](
      Sketches.decayedCounts(ev, "k", "t", 0.9, maxAgeDays = 0))
  }

  test("chao1Richness: abundance spectrum and the bias-corrected close") {
    import spark.implicits._
    // a,a,b,c,d: d=4, f1=3 (b,c,d), f2=1 (a) → chao1 = 4 + 3·2/4 = 5.5
    val s = Seq("a", "a", "b", "c", "d").toDF("i")
    val r = Sketches.chao1Richness(s, "i").head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L &&
      r.getLong(2) == 3L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 5.5)
    // every value seen ≥ 3 times: no correction, chao1 = d
    val sat = Seq("x", "x", "x", "y", "y", "y").toDF("i")
    val rs = Sketches.chao1Richness(sat, "i").head
    assert(rs.getLong(3) == 0L && rs.getDouble(4) == 2.0)
    // f2 present: a,b,b,c,c,d,e → d=5, f1=3, f2=2 → 5 + 3·2/6 = 6
    val mix = Seq("a", "b", "b", "c", "c", "d", "e").toDF("i")
    assert(Sketches.chao1Richness(mix, "i").head.getDouble(4) == 6.0)
  }
}
