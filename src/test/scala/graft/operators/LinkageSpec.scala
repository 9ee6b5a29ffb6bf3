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
}
