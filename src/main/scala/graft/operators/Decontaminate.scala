package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — the training-data hygiene step that keeps
 * evaluation material out of a training corpus: score every document by
 * how much of it appears verbatim (at n-gram granularity) in a probe
 * (benchmark) corpus, then flag the overlapping ones for removal.
 */
object Decontaminate {

  /**
   * P52 — n-gram contamination score: the fraction of each document's
   * DISTINCT token n-grams that occur anywhere in the probe corpus, plus
   * a removal flag at `flagThreshold`.
   *
   * Scale shape: both sides collapse to DISTINCT 56-bit portable hashes
   * of their n-grams before the join, so the shuffle carries 8-byte keys
   * — never the gram strings — and the probe side is its distinct gram
   * set (benchmark corpora are orders of magnitude smaller than the
   * training corpus, so AQE broadcasts it when it fits; no hint is
   * forced because a 100-TB probe union can legitimately exceed any
   * broadcast budget). Hash collisions mark a gram contaminated in both
   * engines identically (the hash IS the key on both sides), keeping the
   * operator deterministic. Documents with fewer than n tokens have no
   * n-grams and score 0.
   */
  def ngramContamination(docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 3,
      flagThreshold: Double = 0.5): DataFrame = {
    require(n >= 1 && n <= 4, s"ngramContamination: n must be in [1,4], got $n")
    require(flagThreshold >= 0.0 && flagThreshold <= 1.0,
      s"ngramContamination: flagThreshold must be in [0,1], got $flagThreshold")
    def grams(c: org.apache.spark.sql.Column) =
      array_distinct(TextAnalysis.ngramArray(TextAnalysis.tokens(c), n))
    // explode_outer keeps gram-less docs as one null-gram row, so they
    // survive to the output with n_ngrams = 0 (count skips the null)
    val docGrams = docs.select(col(idCol).as("doc_id"),
      explode_outer(grams(col(textCol))).as("g"))
      .select(col("doc_id"), Sampling.hashValue(col("g"), "dc:").as("gh"),
        col("g").isNotNull.as("present"))
    val probeGrams = probes
      .select(explode(grams(col(probeTextCol))).as("g"))
      .select(Sampling.hashValue(col("g"), "dc:").as("gh"))
      .distinct()
      .withColumn("hit", lit(1))
    docGrams
      .join(probeGrams, Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(
        count(when(col("present"), lit(1))).as("n_ngrams"),
        count(when(col("present"), col("hit"))).as("n_contaminated"))
      .withColumn("contamination",
        when(col("n_ngrams") === 0L, lit(0.0))
          .otherwise(col("n_contaminated").cast("double") / col("n_ngrams")))
      .withColumn("flagged", col("contamination") >= lit(flagThreshold))
  }
}
