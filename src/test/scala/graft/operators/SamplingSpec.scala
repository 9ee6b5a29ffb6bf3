package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic hash sampling/splitting invariants: stability, nesting,
  * cross-table consistency, weight coverage. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private val keys = (1L to 5000L).toDF("k")

  test("hashBucket is stable, in range, and insensitive to the carrying frame") {
    val a = keys.select(col("k"), Sampling.hashBucket(col("k"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.forall(b => b >= 0 && b < 100))
    // the same keys in a different table get identical buckets — the
    // property that keeps a user's rows in one split across EVERY table
    val other = (1L to 5000L).map(k => (k, s"payload$k")).toDF("k", "x")
    val b = other.select(col("k"), Sampling.hashBucket(col("k"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // a different salt decorrelates
    val salted = keys.select(Sampling.hashBucket(col("k"), 100, salt = "s2").as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(salted != keys.select(Sampling.hashBucket(col("k"), 100).as("b"))
      .collect().map(_.getLong(0)).toSeq)
  }

  test("hashSample hits the fraction within tolerance and nests by construction") {
    val n20 = Sampling.hashSample(keys, "k", 0.2).count()
    val n50 = Sampling.hashSample(keys, "k", 0.5).count()
    assert(math.abs(n20 - 1000L) < 150, s"0.2 sample drew $n20 of 5000")
    assert(math.abs(n50 - 2500L) < 250, s"0.5 sample drew $n50 of 5000")
    // bucket < 2000 implies bucket < 5000: the smaller sample is a strict
    // subset of the larger — re-drawing a bigger sample only ADDS rows
    val s20 = Sampling.hashSample(keys, "k", 0.2).select("k").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.hashSample(keys, "k", 0.5).select("k").collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s50))
    assert(Sampling.hashSample(keys, "k", 0.0).count() == 0)
    assert(Sampling.hashSample(keys, "k", 1.0).count() == 5000)
  }

  test("hashSplit covers every row once with roughly the requested weights") {
    val out = Sampling.hashSplit(keys, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000, "every row gets exactly one split")
    assert(math.abs(counts("train") - 4000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 150)
    assert(math.abs(counts("test") - 500L) < 150)
    // determinism: a second evaluation assigns identically
    val again = Sampling.hashSplit(keys, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
  }

  test("clusterSafeSplit lands every cluster member in one split, singletons as hashSplit") {
    // clusters: {1,2,3} (chain), {10,11}; singletons 20, 21
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.clusterSafeSplit(docs, "id", pairs, splits)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the LEAKAGE property: one split per cluster, keyed on the min label
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(1L)._1 == 1L)
    assert(got(10L) == got(11L) && got(10L)._1 == 10L)
    // singletons key on their own id — identical to a plain hashSplit
    val plain = Sampling.hashSplit(Seq(20L, 21L).toDF("split_key"), "split_key", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(20L) == ((20L, plain(20L))) && got(21L) == ((21L, plain(21L))))
    // every doc appears exactly once with a split
    assert(got.size == 7 && got.values.forall(v => Set("train", "val", "test")(v._2)))
    // a pre-existing split_key column is rejected, not silently replaced
    intercept[IllegalArgumentException](Sampling.clusterSafeSplit(
      docs.withColumn("split_key", lit(1L)), "id", pairs, splits))
  }

  test("weightedSample replays Efraimidis-Spirakis keys; heavy weights win more") {
    def hash56(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    def skey(id: Long, w: Long): Double = {
      val u = (hash56(id.toString) + 1L).toDouble / math.pow(2.0, 56)
      BigDecimal(-math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val docs = (1L to 20L).map(i => (i, i % 3 + 1)).toDF("id", "w")
    val got = Sampling.weightedSample(docs, "id", "w", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // the exact A-ES selection: 5 smallest keys, ties to the lowest id
    val expected = (1L to 20L).map(i => (i, i % 3 + 1, skey(i, i % 3 + 1)))
      .sortBy { case (id, _, s) => (s, id) }.take(5)
      .zipWithIndex.map { case ((id, w, s), r) => (id, w, s, r + 1) }
    assert(got.toSeq == expected)
    // statistical shape: weight 10 beats weight 1 in the winner set
    val skewed = (1L to 5000L).map(i => (i, if (i % 2 == 0) 10L else 1L))
      .toDF("id", "w")
    val winners = Sampling.weightedSample(skewed, "id", "w", k = 500)
      .collect().map(r => r.getLong(1))
    val heavy = winners.count(_ == 10L)
    assert(heavy > 350, s"weight-10 rows won only $heavy of 500")
    // partitioning-invariant
    val again = Sampling.weightedSample(docs.repartition(7), "id", "w", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.toSeq == got.toSeq)
    // non-positive weights raise rather than silently skewing the draw
    val bad = Seq((1L, 0L), (2L, 3L)).toDF("id", "w")
    val e = intercept[Exception](Sampling.weightedSample(bad, "id", "w", 1).collect())
    assert(e.getMessage.contains("non-positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
    intercept[IllegalArgumentException](Sampling.weightedSample(docs, "id", "w", 0))
  }

  test("cappedPerKey keeps at most N per key, deterministically, order-independent") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 1000L).map(k => (k % 5, k)).toDF("klass", "id")
    val capped = Sampling.cappedPerKey(df, "klass", "id", 7)
    val byClass = capped.groupBy("klass").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byClass.values.forall(_ == 7), s"every class capped at 7: $byClass")
    // a class smaller than the cap survives whole
    val small = Sampling.cappedPerKey(
      Seq((0L, 1L), (0L, 2L)).toDF("klass", "id"), "klass", "id", 7)
    assert(small.count() == 2)
    // determinism + input-order independence: a shuffled input keeps the
    // SAME rows (hash order is a function of the data, not the layout)
    val shuffled = df.orderBy(col("id").desc).repartition(7)
    val a = capped.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.cappedPerKey(shuffled, "klass", "id", 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("invalid fractions and weights are rejected") {
    intercept[IllegalArgumentException](Sampling.hashSample(keys, "k", 1.5))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(keys, "k", Seq("a" -> 0.5, "b" -> 0.3)))
    intercept[IllegalArgumentException](Sampling.hashBucket(col("k"), 0))
  }

  test("stratifiedSample keeps exactly round(fraction*n) per stratum, deterministically") {
    // uneven strata: sizes 10, 25, 3 — hashSample could miss the small one
    // entirely; the stratified allocation cannot
    val rows = ((1L to 10L).map(_ -> "a") ++ (11L to 35L).map(_ -> "b") ++
      (36L to 38L).map(_ -> "c")).toDF("id", "s")
    val out = Sampling.stratifiedSample(rows, "s", "id", 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perStratum = out.groupBy(_._2).view.mapValues(_.length).toMap
    // round(0.25*10)=3 (2.5 rounds half-up), round(0.25*25)=6, round(0.25*3)=1
    assert(perStratum == Map("a" -> 3, "b" -> 6, "c" -> 1))
    // re-run on a different partitioning → identical row set
    val again = Sampling.stratifiedSample(rows.repartition(7), "s", "id", 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet)
    // fraction edges: 0 keeps nothing, 1 keeps everything
    assert(Sampling.stratifiedSample(rows, "s", "id", 0.0).count() == 0)
    assert(Sampling.stratifiedSample(rows, "s", "id", 1.0).count() == 38)
    intercept[IllegalArgumentException](Sampling.stratifiedSample(rows, "s", "id", 1.5))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(rows.withColumn("__n", lit(1)), "s", "id", 0.5))
  }

  test("kFold deals balanced folds per stratum, deterministically") {
    // strata sizes 10, 7, 1: fold sizes must differ by ≤1 within each
    val rows = ((1L to 10L).map(_ -> "a") ++ (11L to 17L).map(_ -> "b") ++
      Seq(18L -> "c")).toDF("id", "s")
    val out = Sampling.kFold(rows, "s", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.length == 18 && out.forall(t => t._3 >= 0 && t._3 < 3))
    val sizes = out.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    assert(sizes(("a", 0)) == 4 && sizes(("a", 1)) == 3 && sizes(("a", 2)) == 3)
    assert(Seq(0, 1, 2).map(f => sizes.getOrElse(("b", f), 0)).sorted == Seq(2, 2, 3))
    assert(Seq(0, 1, 2).map(f => sizes.getOrElse(("c", f), 0)).sum == 1)
    // partitioning-independent
    val again = Sampling.kFold(rows.repartition(5), "s", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSet == again.toSet)
    // a different salt reshuffles the deal
    val salted = Sampling.kFold(rows, "s", "id", k = 3, salt = "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(salted.toSet != out.toSet)
    intercept[IllegalArgumentException](Sampling.kFold(rows, "s", "id", 1))
    intercept[IllegalArgumentException](
      Sampling.kFold(rows.withColumn("fold", lit(1)), "s", "id", 3))
  }

  test("negativeSample: deterministic draws, interaction filter, id range") {
    val inter = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 3L))
      .toDF("u", "it")
    val out = Sampling.negativeSample(inter, "u", "it",
        k = 8, itemMin = 1L, itemMax = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // draws land in the id range, never on one of the user's positives
    assert(out.nonEmpty)
    assert(out.forall(t => t._4 >= 1L && t._4 <= 3L))
    assert(out.filter(_._1 == 1L).forall(t => t._4 == 3L))
    assert(out.filter(_._1 == 2L).forall(t => t._4 != 3L))
    assert(out.forall(t => t._3 >= 0 && t._3 < 8))
    // duplicate interactions collapse: at most k rows per (u, it)
    assert(out.groupBy(t => (t._1, t._2)).values.forall(_.size <= 8))
    // partitioning-independent
    val again = Sampling.negativeSample(inter.repartition(5), "u", "it",
        k = 8, itemMin = 1L, itemMax = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
    intercept[IllegalArgumentException](
      Sampling.negativeSample(inter, "u", "it", 0, 1L, 3L))
    intercept[IllegalArgumentException](
      Sampling.negativeSample(inter, "u", "it", 2, 5L, 3L))
  }

  test("mixCorpus hits the target mix exactly, bound by the scarcest domain") {
    // availability: web 100, books 20, code 60; weights 1/2, 1/4, 1/4 →
    // N bound by books: min(200, 80, 240) = 80 → quotas 40 / 20 / 15? no:
    // floor(80·0.25) = 20 books (all of them), 20 code, 40 web
    val rows = ((1L to 100L).map(_ -> "web") ++ (101L to 120L).map(_ -> "books") ++
      (121L to 180L).map(_ -> "code")).toDF("id", "d")
    val out = Sampling.mixCorpus(rows, "d", "id",
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val per = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(per == Map("web" -> 40, "books" -> 20, "code" -> 20))
    // partitioning-independence: the kept row SET is a function of the data
    val again = Sampling.mixCorpus(rows.repartition(7).orderBy(col("id").desc),
      "d", "id", Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet)
    // domains outside the recipe are dropped, not mixed in
    val extra = rows.union(Seq((900L, "junk")).toDF("id", "d"))
    assert(Sampling.mixCorpus(extra, "d", "id",
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
      .where(col("d") === "junk").count() == 0)
    // an absent-but-weighted domain makes the mix unachievable → empty
    assert(Sampling.mixCorpus(rows, "d", "id",
      Map("web" -> 0.5, "absent" -> 0.5)).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.mixCorpus(rows, "d", "id", Map("web" -> 0.5, "books" -> 0.3)))
    intercept[IllegalArgumentException](
      Sampling.mixCorpus(rows.withColumn("__rn", lit(1)), "d", "id",
        Map("web" -> 1.0)))
    intercept[IllegalArgumentException](
      Sampling.mixCorpus(rows.withColumn("di", col("id") % 3), "di", "id",
        Map("0" -> 1.0)))
  }

  test("epochReplicate: floor(w) full epochs plus a frac(w) hash slice") {
    val rows = ((1L to 40L).map(_ -> "twice") ++ (41L to 80L).map(_ -> "half") ++
      (81L to 90L).map(_ -> "junk")).toDF("id", "d")
    val out = Sampling.epochReplicate(rows, "id", "d",
        Map("twice" -> 2.0, "half" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // integer weight: every row exactly w times, epochs numbered 0..w−1
    val twice = out.filter(_._2 == "twice")
    assert(twice.length == 80)
    assert(twice.groupBy(_._1).values.forall(_.map(_._3).sorted.sameElements(Seq(0L, 1L))))
    // fractional weight: a strict hash-chosen subset at epoch 0 only
    val half = out.filter(_._2 == "half")
    assert(half.nonEmpty && half.length < 40 && half.forall(_._3 == 0L))
    // unmapped domains drop out; determinism under repartition
    assert(!out.exists(_._2 == "junk"))
    val again = Sampling.epochReplicate(rows.repartition(7), "id", "d",
        Map("twice" -> 2.0, "half" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == again.toSet && out.length == again.length)
    // w = 2.5: between 2 and 3 copies per row, never outside
    val mid = Sampling.epochReplicate(rows.where(col("d") === "twice"), "id", "d",
        Map("twice" -> 2.5))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(mid.values.forall(n => n == 2 || n == 3) && mid.values.exists(_ == 3))
    intercept[IllegalArgumentException](
      Sampling.epochReplicate(rows, "id", "d", Map.empty[String, Double]))
    intercept[IllegalArgumentException](
      Sampling.epochReplicate(rows.withColumn("epoch", lit(1)), "id", "d",
        Map("twice" -> 1.0)))
  }

  test("tokenBudget keeps the hash-order prefix that fits the domain budget") {
    val rows = (1L to 30L).map(i => (i, if (i <= 20) "a" else "b", 10L))
      .toDF("id", "d", "toks")
    // a: 20 docs × 10 tokens, budget 95 → exactly 9 kept; b: all 10 fit
    val out = Sampling.tokenBudget(rows, "d", "id", "toks",
        Map("a" -> 95L, "b" -> 1000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val (as, bs) = out.partition(_._2 == "a")
    assert(as.length == 9 && as.map(_._3).max == 90L)
    assert(bs.length == 10 && bs.map(_._3).max == 100L)
    // the kept set is the hash-order prefix, invariant under partitioning
    val again = Sampling.tokenBudget(rows.repartition(7), "d", "id", "toks",
        Map("a" -> 95L, "b" -> 1000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSet == again.toSet)
    // zero budget keeps nothing but zero-token rows never sneak past −1
    assert(Sampling.tokenBudget(rows, "d", "id", "toks",
      Map("a" -> 0L)).count() == 0)
    val zeroTok = Seq((1L, "c", 0L)).toDF("id", "d", "toks")
    assert(Sampling.tokenBudget(zeroTok, "d", "id", "toks",
      Map("c" -> 0L)).count() == 1) // 0 tokens fit a 0 budget
    assert(Sampling.tokenBudget(zeroTok, "d", "id", "toks",
      Map("other" -> 5L)).count() == 0) // unbudgeted domain dropped
    intercept[IllegalArgumentException](
      Sampling.tokenBudget(rows, "d", "id", "toks", Map("a" -> -1L)))
    intercept[IllegalArgumentException](
      Sampling.tokenBudget(rows.withColumn("cum_tokens", lit(1)), "d", "id",
        "toks", Map("a" -> 5L)))
    // a negative token count would break the monotone strict-prefix cut —
    // it must fail loudly, not let later rows re-enter under the budget
    val negative = Seq((1L, "a", 60L), (2L, "a", -30L)).toDF("id", "d", "toks")
    val ex = intercept[Exception](
      Sampling.tokenBudget(negative, "d", "id", "toks", Map("a" -> 100L)).count())
    assert(ex.getMessage != null)
  }

  test("temperatureSample flattens domain shares toward the tempered distribution") {
    // 80/20 skew, T = 2: rates are sqrt(p_min/p_d) → small keeps 1.0,
    // big keeps sqrt(20/80) = 0.5
    val docs = (1L to 100L).map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("id", "domain")
    val got = Sampling.temperatureSample(docs, "domain", "id", temperature = 2.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.length == 100)
    val byDomain = got.groupBy(_._2)
    assert(byDomain("big").forall(r => r._3 == 80L && r._4 == 0.5))
    assert(byDomain("small").forall(r => r._3 == 20L && r._4 == 1.0))
    // the smallest domain keeps EVERY row (u <= 1 always)
    assert(byDomain("small").forall(_._5))
    // the big domain keeps roughly half (hash-uniform; exact set is pinned
    // by determinism below, the bound guards gross rate misapplication)
    val keptBig = byDomain("big").count(_._5)
    assert(keptBig > 20 && keptBig < 60, s"kept $keptBig of 80 at rate 0.5")
    // T = 1 is the identity: every rate 1, everything kept
    val id = Sampling.temperatureSample(docs, "domain", "id", temperature = 1.0)
      .collect()
    assert(id.forall(r => r.getDouble(3) == 1.0 && r.getBoolean(4)))
    // deterministic under repartitioning
    val again = Sampling.temperatureSample(docs.repartition(7), "domain", "id", 2.0)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(again == got.map(r => (r._1, r._5)).sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](
      Sampling.temperatureSample(docs, "domain", "id", 0.0))
  }

  test("weightedSamplePerKey is an independent weightedSample inside every key") {
    val docs = (1L to 60L).map(i => (i, s"k${i % 3}", i % 7 + 1)).toDF("id", "key", "w")
    val got = Sampling.weightedSamplePerKey(docs, "key", "id", "w", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(4)))
    // ≤ k winners per key, ranks 1..n contiguous within each key
    val byKey = got.groupBy(_._1)
    assert(byKey.keySet == Set("k0", "k1", "k2"))
    byKey.values.foreach { rows =>
      assert(rows.length <= 4)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // each key's winners = the global operator restricted to that key
    for (k <- Seq("k0", "k1", "k2")) {
      val solo = Sampling.weightedSample(docs.where(col("key") === k), "id", "w", k = 4)
        .collect().map(_.getLong(0)).toSet
      assert(byKey(k).map(_._2).toSet == solo, s"key $k diverges from weightedSample")
    }
    // deterministic under repartitioning
    val again = Sampling.weightedSamplePerKey(docs.repartition(7), "key", "id", "w", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(4))).sorted.toSeq
    assert(again == got.sorted.toSeq)
    // non-positive weights raise; k is validated
    val bad = Seq((1L, "a", 0)).toDF("id", "key", "w")
    intercept[Exception](Sampling.weightedSamplePerKey(bad, "key", "id", "w", 1).collect())
    intercept[IllegalArgumentException](
      Sampling.weightedSamplePerKey(docs, "key", "id", "w", 0))
  }

  test("systematicSample: exact ceil(n/k) rows, stable, k=1 keeps all") {
    val df = (1L to 7L).map(i => (i, s"p$i")).toDF("id", "payload")
    val got = Sampling.systematicSample(df, "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 3)                              // ceil(7/3)
    assert(got.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)) // dense ranks
    // deterministic: the same call returns the identical row set
    val again = Sampling.systematicSample(df, "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.sortBy(_._2).toSeq == got.sortBy(_._2).toSeq)
    assert(Sampling.systematicSample(df, "id", k = 1).count() == 7)
    intercept[IllegalArgumentException](
      Sampling.systematicSample(df, "id", 0))
  }

  test("balancedDownsample keeps exactly min-class-count rows per class") {
    import spark.implicits._
    val rows = ((1L to 10L).map(i => (i, "big")) ++
      (11L to 13L).map(i => (i, "small")) ++
      Seq((99L, null.asInstanceOf[String]))).toDF("id", "cls")
    val got = Sampling.balancedDownsample(rows, "cls", "id")
    val byClass = got.collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byClass == Map("big" -> 3, "small" -> 3))
    // ranks are dense 1..minN within each class
    assert(got.collect().groupBy(_.getString(1)).values
      .forall(_.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L)))
    // deterministic: identical keep set on re-run
    val again = Sampling.balancedDownsample(rows, "cls", "id")
    assert(again.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq ==
      got.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    // the small class keeps EVERY row (it defines the quota)
    assert(got.collect().filter(_.getString(1) == "small")
      .map(_.getLong(0)).toSet == Set(11L, 12L, 13L))
  }

  test("allocationVarianceCompare: Neyman beats proportional exactly " +
      "when SDs differ; zero-SD strata cost nothing") {
    import spark.implicits._
    // A: sd 0 (contributes no variance anywhere); B: n=2, values {0,20}
    // → W_B=0.5, sd=10, tw=20. equal n_B=50 → 0.25·100/50 = 0.5;
    // proportional n_B=50 → 0.5; Neyman puts ALL 100 on B → 0.25.
    // (values chosen so every term is exact at the 3-decimal term round)
    val rows = Seq(("A", 0.0), ("A", 0.0), ("B", 0.0), ("B", 20.0))
      .toDF("g", "v")
    val got = Sampling.allocationVarianceCompare(rows, "g", "v", 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got("equal") == ((0.5, 0.707107)))
    assert(got("proportional") == ((0.5, 0.707107)))
    assert(got("neyman") == ((0.25, 0.5)))
    // all-zero-SD corpus: every scheme reads exactly zero variance
    val flat = Seq(("A", 1.0), ("B", 2.0)).toDF("g", "v")
    val z = Sampling.allocationVarianceCompare(flat, "g", "v", 10L)
      .collect()
    assert(z.forall(r => r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0))
    intercept[IllegalArgumentException](
      Sampling.allocationVarianceCompare(rows, "g", "v", 0L))
  }

  test("neymanAllocation: n·sigma weighting, exact budget, spread-0 fallback") {
    import spark.implicits._
    // stratum a: sd 1 over 4 rows (w=4); b: sd 2 over 2 rows (w=4);
    // c: constant (sd 0, w 0) → quota 0, remainder rule decides spares
    val rows = Seq(("a", 1.0), ("a", 3.0), ("a", 1.0), ("a", 3.0),
      ("b", 0.0), ("b", 4.0), ("c", 9.0), ("c", 9.0)).toDF("s", "v")
    val got = Sampling.neymanAllocation(rows, "s", "v", budget = 9L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(4)))).toMap
    assert(got("a") == ((4L, 1.0, 5L)))   // quota 4.5, rem .5, rank 1 → +1
    assert(got("b") == ((2L, 2.0, 4L)))   // quota 4.5, rem .5, rank 2
    assert(got("c") == ((2L, 0.0, 0L)))
    assert(got.values.map(_._3).sum == 9L) // sums to the budget exactly
    // all-constant strata fall back to N_h weighting
    val flat = Seq(("x", 1.0), ("x", 1.0), ("y", 2.0)).toDF("s", "v")
    val f = Sampling.neymanAllocation(flat, "s", "v", budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(f == Map("x" -> 2L, "y" -> 1L))
    intercept[IllegalArgumentException](
      Sampling.neymanAllocation(rows, "s", "v", -1L))
  }

  test("temporalSplit labels train/embargo/test around the cutoff") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-10 00:00:00"),  // train
      (2L, "2024-01-18 23:59:59"),  // train (just before the gap)
      (3L, "2024-01-19 00:00:00"),  // embargo (gap start, inclusive)
      (4L, "2024-01-19 23:59:59"),  // embargo
      (5L, "2024-01-20 00:00:00"),  // test (cutoff, inclusive)
      (6L, "2024-01-25 12:00:00"))  // test
      .toDF("id", "t")
      .select($"id", org.apache.spark.sql.functions.to_timestamp($"t").as("t"))
    val got = Sampling.temporalSplit(ev, "t", "2024-01-20 00:00:00",
        embargoMicros = 86400000000L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test", 6L -> "test"))
    // zero embargo degenerates to a plain two-way split
    val z = Sampling.temporalSplit(ev, "t", "2024-01-20 00:00:00", 0L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!z.values.exists(_ == "embargo"))
    intercept[IllegalArgumentException](
      Sampling.temporalSplit(ev, "t", "2024-01-20 00:00:00", -1L))
  }

  test("splitLeakageAudit: crossing cells expose train/eval twins") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("i", "j")
    val assign = Seq((1L, "train"), (2L, "test"),  // crossing
      (3L, "train"), (4L, "train"),                // contained
      (5L, "test"), (6L, "train")).toDF("id", "split")
    val got = Sampling.splitLeakageAudit(pairs, assign, "i", "j",
        "id", "split")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // both crossing pairs land in the SAME ordered (test, train) cell
    assert(got == Map(("test", "train") -> ((2L, true)),
      ("train", "train") -> ((1L, false))))
  }

  test("importanceReweight: target/current weights and the ESS honesty") {
    import spark.implicits._
    // 80 a's, 20 b's reweighted to 50/50: w_a = .5/.8, w_b = .5/.2
    val rows = ((1 to 80).map(_ => "a") ++ (1 to 20).map(_ => "b")).toDF("c")
    val got = Sampling.importanceReweight(rows, "c",
        Seq(("a", 0.5), ("b", 0.5)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("a")._2 == 0.8 && got("a")._3 == 0.625)
    assert(got("b")._2 == 0.2 && got("b")._3 == 2.5)
    // ESS = (80·.625 + 20·2.5)² / (80·.625² + 20·2.5²) = 10000/156.25 = 64
    assert(got.values.map(_._4).toSet == Set(64.0))
    // a class missing from the targets carries null weight
    val missing = Sampling.importanceReweight(rows, "c", Seq(("a", 1.0)))
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(!missing("a") && missing("b"))
    intercept[IllegalArgumentException](
      Sampling.importanceReweight(rows, "c", Nil))
  }

  test("rollingOriginSplits: expanding train windows, bounded test") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    // 10 daily events Jan 1..10
    val ev = (1 to 10).map(d => (d.toLong, f"2024-01-$d%02d 12:00:00"))
      .toDF("id", "t")
      .select($"id", to_timestamp($"t").as("t"))
    val got = Sampling.rollingOriginSplits(ev, "t",
        Seq("2024-01-04 00:00:00", "2024-01-08 00:00:00"), horizonDays = 2)
      .collect().map(r => (r.getInt(0), r.getString(2)) -> r.getLong(3))
      .toMap
    // fold 1: train = Jan 1-3 (3), test = Jan 4-5 (2)
    // fold 2: train = Jan 1-7 (7), test = Jan 8-9 (2); Jan 10 drops
    assert(got == Map((1, "train") -> 3L, (1, "test") -> 2L,
      (2, "train") -> 7L, (2, "test") -> 2L))
    intercept[IllegalArgumentException](
      Sampling.rollingOriginSplits(ev, "t", Nil, 2))
    intercept[IllegalArgumentException](
      Sampling.rollingOriginSplits(ev, "t", Seq("2024-01-04 00:00:00"), 0))
  }

  test("sequencePack: bins partition the shard stream, straddlers counted") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, 10L + (i % 7))).toDF("id", "tok")
    val packed = Sampling.sequencePack(docs, "id", "tok",
      shards = 2, capacity = 64L, salt = "sp:").collect()
    // every doc lands in exactly one (shard, bin); token mass conserved
    assert(packed.map(_.getLong(3)).sum == (1L to 40L).map(i => 10L + i % 7).sum)
    assert(packed.map(_.getLong(2)).sum == 40L)
    assert(packed.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L))
    // bins are contiguous from 0 within each shard
    for ((sh, rows) <- packed.groupBy(_.getLong(0))) {
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0L && bins.toSeq == (0L until bins.length).toSeq,
        s"shard $sh bins not contiguous: ${bins.toSeq}")
    }
    // ~11-token docs into 64-token bins: straddlers must occur somewhere
    assert(packed.map(_.getLong(4)).sum > 0L)
    // determinism
    val again = Sampling.sequencePack(docs, "id", "tok",
      shards = 2, capacity = 64L, salt = "sp:").collect()
    assert(again.map(_.toSeq).toSet == packed.map(_.toSeq).toSet)
    // a negative token count must raise, not corrupt the prefix
    val bad = Seq((1L, -5L), (2L, 3L)).toDF("id", "tok")
    intercept[Exception](
      Sampling.sequencePack(bad, "id", "tok", 2, 64L).collect())
    intercept[IllegalArgumentException](
      Sampling.sequencePack(docs, "id", "tok", 0, 64L))
    intercept[IllegalArgumentException](
      Sampling.sequencePack(docs, "id", "tok", 2, 0L))
  }

  test("sampleConvergence: nested rungs, full rung is the exact stats") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val rows = Sampling.sampleConvergence(df, "id", "v", Seq(4, 0))
      .orderBy("fraction").collect()
    assert(rows.length == 2)
    val small = rows(0); val full = rows(1)
    assert(small.getDouble(0) == 0.0625 && full.getDouble(0) == 1.0)
    // the full rung is the whole frame — exact mean of 0..99 cycles
    assert(full.getLong(1) == 2000L && full.getDouble(2) == 49.5)
    // nesting: the small rung is a subset
    assert(small.getLong(1) < 2000L && small.getLong(1) > 0L)
    // error bars shrink with n
    assert(full.getDouble(4) < small.getDouble(4))
    intercept[IllegalArgumentException](
      Sampling.sampleConvergence(df, "id", "v", Nil))
    intercept[IllegalArgumentException](
      Sampling.sampleConvergence(df, "id", "v", Seq(2, 2)))
  }

  test("mixtureRebalance: weights = target/actual; unknown source flags") {
    import spark.implicits._
    // a holds 60 of 100 tokens, b 40; equal targets → a downweighted
    val df = Seq(("a", 20L), ("a", 40L), ("b", 40L), ("c", 10L))
      .toDF("src", "toks")
    val known = df.where(col("src") =!= "c")
    val got = Sampling.mixtureRebalance(known, "src", "toks",
        Seq(("a", 0.5), ("b", 0.5)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got("a") == ((2L, 60L, 0.6, 0.833333, 50L)))
    assert(got("b") == ((1L, 40L, 0.4, 1.25, 50L)))
    // a source missing from the target table gets a null weight, not 0
    val withC = Sampling.mixtureRebalance(df, "src", "toks",
        Seq(("a", 0.5), ("b", 0.5)))
      .where(col("source") === "c").head
    assert(withC.isNullAt(4) && withC.isNullAt(5) && withC.isNullAt(6))
    intercept[IllegalArgumentException](
      Sampling.mixtureRebalance(df, "src", "toks", Nil))
    intercept[IllegalArgumentException](
      Sampling.mixtureRebalance(df, "src", "toks",
        Seq(("a", 0.5), ("a", 0.5))))
  }

  test("horvitzThompson: certainty inclusion reproduces the exact " +
      "total; out-of-range sizes raise") {
    import spark.implicits._
    // every size >= k -> pi = 1 -> the whole frame is the sample
    val all = (1 to 10).map(i => (i.toLong, 40L, 10.0)).toDF("id", "sz", "y")
    val r = Sampling.horvitzThompson(all, "id", "sz", "y", k = 32).head
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 100.0 &&
      r.getDouble(4) == 0.0)
    // sub-certainty sizes: a strict subset is drawn, estimate upweights
    val sub = (1 to 200).map(i => (i.toLong, 8L, 5.0)).toDF("id", "sz", "y")
    val s = Sampling.horvitzThompson(sub, "id", "sz", "y", k = 32).head
    assert(s.getLong(1) > 0L && s.getLong(1) < 200L)
    // every kept row contributes y/pi = 5/0.25 = 20
    assert(s.getDouble(3) == 20.0 * s.getLong(1))
    val bad = Seq((1L, 0L, 1.0)).toDF("id", "sz", "y")
    val ex = intercept[Exception](
      Sampling.horvitzThompson(bad, "id", "sz", "y", k = 32).collect())
    assert(ex.getMessage.contains("horvitzThompson") ||
      String.valueOf(ex.getCause).contains("horvitzThompson"))
  }
}
