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
}
