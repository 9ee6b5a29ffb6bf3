package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Privacy gates for training-data pipelines. Sibling of the PII redaction
 * pass (`TextAnalysis.redactPii`): redaction scrubs values INSIDE a
 * document, these operators suppress rows whose mere combination of
 * attributes re-identifies someone.
 */
object Privacy {

  /**
   * P77 — k-anonymity filter (Sweeney): a row is releasable only if its
   * quasi-identifier combination is shared by at least `k` rows — rarer
   * combinations (the 87%-of-Americans zip/birthdate/sex effect) are
   * flagged for suppression. Emits every input row plus `qid_group_n`
   * (the combination's multiplicity) and `kept` (n ≥ k), so callers can
   * suppress, generalize, or audit; nulls in a QID column form their own
   * group (SQL window semantics), which is the conservative choice — an
   * absent attribute is itself identifying.
   *
   * Scale shape: ONE window shuffle keyed by the QID tuple — no joins,
   * no driver-side state; a skewed (huge) QID group costs one partition's
   * count, the sa2 rule. Generalize-then-refilter loops just call this
   * again on the coarsened columns.
   */
  def kAnonymityFilter(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"kAnonymityFilter: k must be >= 1, got $k")
    require(qidCols.nonEmpty, "kAnonymityFilter: at least one quasi-identifier column")
    val missing = qidCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"kAnonymityFilter: quasi-identifier columns not in input: ${missing.mkString(", ")}")
    require(!df.columns.contains("qid_group_n") && !df.columns.contains("kept"),
      "kAnonymityFilter: input already has a qid_group_n/kept column — rename it first")
    val w = Window.partitionBy(qidCols.map(col): _*)
    df.withColumn("qid_group_n", count(lit(1)).over(w))
      .withColumn("kept", col("qid_group_n") >= k)
  }

  /**
   * P84 — Laplace-mechanism noisy counts (Dwork et al.): per-group exact
   * counts released with additive Laplace(sensitivity/ε) noise — the
   * ε-differentially-private aggregate release behind private telemetry
   * and training-data statistics. Returns (groupCols…, n, noise,
   * noisy_n) with noisy_n = max(0, n + noise) clamped at the standard
   * non-negativity post-processing (post-processing preserves DP).
   *
   * The noise draw is DERANDOMIZED the repo's way ([[Sampling.uniform01]]
   * on the group key + salt): same data + salt → same release, every
   * engine replays it. That makes repeated calls with the same salt
   * reuse ONE draw (which is exactly what the ε budget requires — fresh
   * randomness per release needs a fresh salt, and callers own that
   * budget accounting). Inverse-CDF: noise = −b·sign(u−½)·ln(1−2|u−½|),
   * the log argument clamped at 2⁻⁵⁶ (u = 1 would otherwise hit ln 0),
   * rounded at 9 decimals — the sa8 libm firewall, so the one ln() call
   * sees identical operands on every engine. Scale shape: one keyed agg
   * with map-side combine; noise is a pure projection.
   */
  def laplaceNoisyCounts(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, sensitivity: Double = 1.0,
      salt: String = "dp"): DataFrame = {
    require(groupCols.nonEmpty, "laplaceNoisyCounts: at least one group column")
    require(epsilon > 0, s"laplaceNoisyCounts: epsilon must be > 0, got $epsilon")
    require(sensitivity > 0,
      s"laplaceNoisyCounts: sensitivity must be > 0, got $sensitivity")
    val b = sensitivity / epsilon
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val u = Sampling.uniform01(key, salt)
    val p = u - lit(0.5)
    val noise = round(
      -lit(b) * signum(p) *
        log(greatest(lit(1.0) - lit(2.0) * abs(p), lit(math.pow(2.0, -56)))),
      9)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", noise)
      .withColumn("noisy_n",
        greatest(lit(0.0), col("n").cast("double") + col("noise")))
  }
}
