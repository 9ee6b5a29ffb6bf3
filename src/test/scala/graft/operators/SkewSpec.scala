package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted aggregation equals plain aggregation; generated domains render. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 1000 rows, 10 cold keys with 10 each
    val hot = (1 to 1000).map(i => ("HOT", i.toDouble))
    val cold = for (k <- 1 to 10; i <- 1 to 10) yield (s"K$k", i.toDouble)
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedCountSum matches the unsalted aggregation exactly") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salt is a content hash: partition layout cannot change row salts") {
    // a task retry re-reads its rows under a different layout — the salt
    // must depend only on row CONTENT, so every physical arrangement
    // yields bit-identical salted partials
    def salted(df: org.apache.spark.sql.DataFrame) =
      Skew.saltedCountSum(df, Seq("k"), "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val base = salted(skewed)
    assert(salted(skewed.repartition(7)) == base)
    assert(salted(skewed.repartition(1)) == base)
    assert(salted(skewed.orderBy(desc("v"))) == base)
    // and the per-row salt itself is layout-invariant, not just the sums
    def salts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__s", Skew.salt(16, df.columns.map(col).toSeq: _*))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(salts(skewed.repartition(13)) == salts(skewed))
  }

  test("saltedCountSum tolerates un-hashable (map) columns") {
    // xxhash64 rejects MapType at analysis; the salt must skip such
    // columns instead of failing the whole aggregation
    val withMap = skewed.withColumn("m", map(col("k"), col("v")))
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(withMap, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
    // nested maps are un-hashable too; top-level and nested both filtered
    assert(!Skew.isHashable(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))))
  }

  test("saltFor actually spreads a hot key (not constant per key)") {
    val spread = skewed.withColumn("__s", Skew.saltFor(skewed, 16))
      .where(col("k") === "HOT").select("__s").distinct().count()
    assert(spread > 4, s"hot key landed in only $spread salt buckets")
    // and the degenerate empty-column call is rejected, not silent
    intercept[IllegalArgumentException](Skew.salt(16))
  }

  test("saltedDistinctCount is exact") {
    val out = Skew.saltedDistinctCount(skewed, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("HOT") == 1000)
    assert(out("K1") == 10)
  }

  test("hotKeySplitJoin equals a plain join") {
    val dim = Seq(("HOT", "hot-dim"), ("K1", "k1-dim"), ("K2", "k2-dim"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val split = Skew.hotKeySplitJoin(skewed, dim, "k", Seq("HOT"))
      .groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(split == plain)
  }

  test("approx_count_distinct stays within its error bound on a known cardinality") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    // 10k distinct values; HLL++ at rsd=0.05 must land within ±3·rsd —
    // the sketch is the 100-TB replacement for the exact salted distinct
    // (fixed-size state per group vs a shuffle of the distinct values)
    val exact = 10000
    val df = (1 to exact).map(i => (i % 7, i)).toDF("g", "v")
    val approx = df.agg(approx_count_distinct(col("v"), rsd = 0.05)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx=$approx vs exact=$exact drifted beyond 15%")
  }

  test("rangeBoundaries: R-7 cutoffs at full sample, ties low, end nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // samplePct 1.0 → the sample IS the table; keys 1..8 into 4 parts:
    // cutoffs q(.25)=2.75, q(.5)=4.5, q(.75)=6.25 → 2 rows per part
    val df = (1L to 8L).map(i => (i, i.toDouble)).toDF("id", "k")
    val got = Skew.rangeBoundaries(df, "k", col("id"), numPartitions = 4,
        samplePct = 1.0)
      .collect().map(r => r.getInt(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getLong(3)))).toMap
    assert(got == Map(
      0 -> ((None, Some(2.75), 2L)),
      1 -> ((Some(2.75), Some(4.5), 2L)),
      2 -> ((Some(4.5), Some(6.25), 2L)),
      3 -> ((Some(6.25), None, 2L))))
    // a value exactly AT a cutoff lands in the lower part (strict >)
    val ties = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 2.0))
      .toDF("id", "k")
    val t = Skew.rangeBoundaries(ties, "k", col("id"), 2, 1.0)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(t == Map(0 -> 3L, 1 -> 1L)) // median 1.0; the three 1.0s land low
    intercept[IllegalArgumentException](
      Skew.rangeBoundaries(df, "k", col("id"), 1, 1.0))
    intercept[IllegalArgumentException](
      Skew.rangeBoundaries(df, "k", col("id"), 4, 0.0))
  }
}

/** G4 generated domains materialize and validate. */
class GeneratedDomainsSpec extends SparkSpec {

  test("relsub entries render with reciprocal augmentation") {
    val df = GeneratedDomains.relsub(spark, Seq(
      RelsubEntry("ST", "A", "B", "MOTHER, BIOLOGICAL"),
      RelsubEntry("ST", "C", "D", "SPOUSE")))
    assert(df.count() == 4) // both reciprocals appended
    assert(df.columns.toSeq == Seq("STUDYID", "DOMAIN", "USUBJID", "RSUBJID", "SREL"))
  }

  test("co/relrec/relspec render with the documented shapes") {
    assert(GeneratedDomains.co(spark, Seq(CoEntry("ST", "AE", "S1", 1, "note")))
      .columns.toSeq == Seq("STUDYID", "DOMAIN", "RDOMAIN", "USUBJID", "COSEQ", "COVAL", "CODTC"))
    assert(GeneratedDomains.relrec(spark, Seq(
      RelrecEntry("ST", "AE", "S1", "AESEQ", "1", "ONE", "R1"))).count() == 1)
    assert(GeneratedDomains.relspec(spark, Seq(
      RelspecEntry("ST", "S1", "SPEC1", "BLOOD"))).count() == 1)
  }
}
