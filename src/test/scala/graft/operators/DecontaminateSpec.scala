package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graded contamination (Dedup.ngramContamination): fractions, gram-less docs, thresholds, determinism. */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], probes: Seq[String],
      n: Int = 3, threshold: Double = 0.5) =
    Dedup.ngramContamination(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        probes.toDF("text"), "text", n, threshold)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("scores the distinct-trigram overlap fraction against the probe set") {
    val probe = "the quick brown fox jumps over the lazy dog"
    val out = run(
      docs = Seq(
        1L -> probe,                        // verbatim: all 7 trigrams hit
        2L -> "the quick brown fox sat still today ok", // 2 of 6 hit
        3L -> "completely different words entirely here now", // 0 of 4
        4L -> "too short"),                 // < 3 tokens: no trigrams
      probes = Seq(probe))
    assert(out(1L) == ((7L, 7L, 1.0, true)))
    assert(out(2L)._1 == 6L && out(2L)._2 == 2L && !out(2L)._4)
    assert(out(2L)._3 == 2.0 / 6.0)
    assert(out(3L) == ((4L, 0L, 0.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, false)))
  }

  test("repeated n-grams count once and the threshold is inclusive") {
    // doc = 'a b c a b c a b c': distinct trigrams {abc, bca, cab};
    // probe contains exactly 'a b c' → 1 of 3 ≈ 0.3333, flagged at 1/3
    val out = run(Seq(1L -> "a b c a b c a b c"), Seq("a b c"),
      threshold = 1.0 / 3.0)
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0, true)))
    intercept[IllegalArgumentException](run(Seq(1L -> "x"), Seq("x"), n = 5))
    intercept[IllegalArgumentException](run(Seq(1L -> "x"), Seq("x"), threshold = 1.5))
  }

  test("partitioning-invariant") {
    val docs = (0L until 40L).map(i => i -> s"tok$i tok${i + 1} tok${i + 2} tok${i + 3}")
    val probes = Seq("tok5 tok6 tok7 tok8 tok9")
    val a = run(docs, probes)
    val b = Dedup.ngramContamination(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text",
        probes.toDF("text").repartition(3), "text", 3, 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(a == b)
  }
}
