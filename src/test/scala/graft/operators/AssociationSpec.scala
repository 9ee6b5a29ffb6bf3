package graft.operators

import graft.SparkSpec

/** Association-rule semantics: counts, measures, direction asymmetry,
  * threshold and dedup behavior. */
class AssociationSpec extends SparkSpec {

  import spark.implicits._

  test("assocRules computes support/confidence/lift per direction") {
    // 4 baskets: {a,b}, {a,b}, {a}, {c}; n_a=3, n_b=2, n_ab=2, N=4
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "c")).toDF("basket", "item")
    val got = Association.assocRules(df, "basket", "item", minPairCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.size == 2)
    // a -> b: support 2/4, confidence 2/3, lift 2*4/(3*2) = 4/3
    val ab = got(("a", "b"))
    assert(ab._1 == 2L && ab._2 == 3L && ab._3 == 2L)
    assert(ab._4 == 0.5 && ab._5 == 0.666667 && ab._6 == 1.333333)
    // b -> a: same pair count, confidence 2/2 = 1
    val ba = got(("b", "a"))
    assert(ba._2 == 2L && ba._5 == 1.0 && ba._6 == ab._6)
  }

  test("assocRules dedups repeated items per basket and applies the threshold") {
    // item repeated within one basket must count once
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val got = Association.assocRules(df, "basket", "item", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
    // threshold above the pair count removes every rule
    assert(Association.assocRules(df, "basket", "item", minPairCount = 3L)
      .count() == 0L)
    intercept[IllegalArgumentException](
      Association.assocRules(df, "basket", "item", minPairCount = 0L))
  }

  test("sequentialRules: support/confidence/lift over consecutive pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    // user 1: a→b→a→b  (pairs ab, ba, ab); user 2: a→b (pair ab)
    // pairs: ab x3, ba x1 → n = 4; from a: 3, from b: 1;
    // into b: 3, into a: 1
    val ev = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (1L, "2024-01-01 00:00:02", 2L, "b"),
      (1L, "2024-01-01 00:00:03", 3L, "a"),
      (1L, "2024-01-01 00:00:04", 4L, "b"),
      (2L, "2024-01-01 00:00:01", 5L, "a"),
      (2L, "2024-01-01 00:00:02", 6L, "b"))
      .toDF("u", "t", "e", "ty")
      .select($"u", to_timestamp($"t").as("t"), $"e", $"ty")
    val got = Association.sequentialRules(ev, "u", "t", "e", "ty")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // a→b: support 3/4, conf 3/3 = 1, lift 1 / (3/4) = 4/3
    assert(got(("a", "b")) == ((3L, 0.75, 1.0, 1.333333)))
    // b→a: support 1/4, conf 1, lift 1 / (1/4) = 4
    assert(got(("b", "a")) == ((1L, 0.25, 1.0, 4.0)))
    // minCount filters rules but NOT the marginals they're judged by
    val filtered = Association.sequentialRules(ev, "u", "t", "e", "ty",
        minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(filtered == Map(("a", "b") -> 0.75))
    intercept[IllegalArgumentException](
      Association.sequentialRules(ev, "u", "t", "e", "ty", 0L))
  }

  test("ruleMetrics: hand leverage/conviction; confidence-1 rules " +
      "null conviction") {
    import spark.implicits._
    // baskets: 2x{a,b}, {a,c}, {b}, 2x{d,e} -> N = 6
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (5L, "d"), (5L, "e"),
      (6L, "d"), (6L, "e")).toDF("b", "i")
    val got = Association.ruleMetrics(df, "b", "i", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(7), r.getDouble(8), Option(r.get(9))))).toMap
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // a->b: lift 2*6/9, leverage 2/6 - (3/6)(3/6), conviction
    // (1 - 3/6)/(1 - 2/3)
    val (lift, lev, conv) = got(("a", "b"))
    assert(lift == r6(2.0 * 6 / 9) && lev == r6(2.0 / 6 - 0.25))
    assert(conv == Some(r6(0.5 / (1.0 - 2.0 / 6 / (3.0 / 6)))))
    // d->e is a confidence-1 rule: conviction undefined
    assert(got(("d", "e"))._3.isEmpty)
    assert(got(("d", "e"))._2 == r6(2.0 / 6 - (2.0 / 6) * (2.0 / 6)))
  }

  test("frequentTriples: id-ordered triples, minCount bar, lift3 from " +
      "the three margins") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "d"),
      (4L, "d")).toDF("b", "i")
    val got = Association.frequentTriples(df, "b", "i", minCount = 2L)
      .collect()
    assert(got.length == 1) // (a,b,d) occurs once and drops
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" &&
      r.getString(2) == "c")
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L &&
      r.getLong(5) == 3L && r.getLong(6) == 2L)
    assert(r.getDouble(7) == 0.5) // 2 of 4 baskets
    // lift3 = 2·16/(3·3·2) = 1.777778
    assert(r.getDouble(8) == 1.777778)
    // minCount 1 admits (a,b,d) too
    assert(Association.frequentTriples(df, "b", "i", 1L).count() == 2L)
    intercept[IllegalArgumentException](
      Association.frequentTriples(df, "b", "i", 0L))
  }
}
