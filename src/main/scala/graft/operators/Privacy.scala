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
}
