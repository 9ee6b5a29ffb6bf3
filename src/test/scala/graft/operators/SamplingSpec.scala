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
}
