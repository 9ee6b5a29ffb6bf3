package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sorted-neighborhood blocking semantics + the JW kernel/driver parity. */
class LinkageSpec extends SparkSpec {

  import spark.implicits._

  test("jaroWinkler kernel equals the driver-side mapping scorer") {
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("USUBJID", "SUBJID"),
      ("", "abc"), ("same", "same"), ("a", "b"))
    val got = pairs.toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    for (((a, b), jw) <- pairs.zip(got))
      assert(jw == graft.functions.JaroWinkler.similarity(a, b), s"($a, $b)")
    // null-safe: null input → null similarity
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("sortedNeighborhood pairs each row with its next window-1 neighbors") {
    // block X sorted: (1,aaa) (3,aab) (2,abb) (4,bbb); block Y: (5,aaa) (6,aac)
    val df = Seq(
      (1L, "aaa", "X"), (2L, "abb", "X"), (3L, "aab", "X"), (4L, "bbb", "X"),
      (5L, "aaa", "Y"), (6L, "aac", "Y"))
      .toDF("id", "name", "seg")
    val got = Linkage.sortedNeighborhood(df, "id", "name", "seg", window = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 3L), (1L, 2L),   // rank 1 → ranks 2, 3
      (3L, 2L), (3L, 4L),
      (2L, 4L),
      (5L, 6L)))            // never across blocks
    // equal sort keys order by id: two 'aaa' rows rank by id deterministically
    val tied = Seq((7L, "aaa", "Z"), (8L, "aaa", "Z")).toDF("id", "name", "seg")
    val tp = Linkage.sortedNeighborhood(tied, "id", "name", "seg", 2).collect()
    assert(tp.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((7L, 8L)))
    assert(tp.head.getDouble(5) == 1.0) // identical keys score 1
    intercept[IllegalArgumentException](
      Linkage.sortedNeighborhood(df, "id", "name", "seg", 1))
  }

  test("qgramBlocking: rare-gram candidates, frequency cap, JW verify") {
    val df = Seq(
      (1L, "jonathan smith"), (2L, "jonathan smyth"),   // near-match
      (3L, "martha jones"), (4L, "zzzz")                // unrelated
    ).toDF("id", "name")
    val got = Linkage.qgramBlocking(df, "id", "name", q = 4,
        maxGramFreq = 3L, minJw = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
    assert(got.head._3 > 0.9 && got.head._3 < 1.0)
    // a stop-gram shared by everyone generates no candidates once capped:
    // three rows sharing only the frequent prefix pair up only via rare tails
    val stop = Seq((1L, "aaaa1"), (2L, "aaaa2"), (3L, "aaaa3"))
      .toDF("id", "name")
    assert(Linkage.qgramBlocking(stop, "id", "name", 4, 2L, 0.0).count() == 0)
    // raising the cap re-admits the shared gram -> all three pairs
    assert(Linkage.qgramBlocking(stop, "id", "name", 4, 3L, 0.0).count() == 3)
    // keys shorter than q match on the whole-string gram
    val short = Seq((1L, "ab"), (2L, "ab"), (3L, "cd")).toDF("id", "name")
    val sp = Linkage.qgramBlocking(short, "id", "name", 4, 5L, 0.0).collect()
    assert(sp.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    intercept[IllegalArgumentException](
      Linkage.qgramBlocking(df, "id", "name", 1, 5L, 0.5))
    intercept[IllegalArgumentException](
      Linkage.qgramBlocking(df, "id", "name", 3, 5L, 1.5))
  }
}
