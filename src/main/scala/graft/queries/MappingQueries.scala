package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{Mapping, VarMeta}

/**
 * Mapping-engine coverage (SURVEY §2.4 F1-F4). Hint building is the
 * data-touching part (one fused scan, SQL-expressible → full oracle);
 * scoring/assignment run on the driver over names and are checked
 * rows-only here plus exhaustively in ScalaTest.
 */
object MappingQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — per-column hints in one aggregation pass
    "f1_hints" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      Mapping.columnHintsDf(o, Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
        .withColumnRenamed("column", "colname")
        .orderBy("colname")
    }),

    // F2 — deterministic sample values (distinct non-empty, sorted, limit 5)
    "f2_samples" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val vals = Mapping.sampleValues(o, "o_orderpriority", 5)
      import s.implicits._
      vals.toDF("v").orderBy("v")
    }),

    // F3/F4 — scorer + greedy 1:1 assignment over an SDTM-ish renamed frame;
    // JW math is driver-side (rows-only check here, exact cases in ScalaTest)
    "f3_suggest" -> ((s, dir) => {
      val src = table(s, dir, "customer").select(
        col("c_name").as("SUBJID"),
        col("c_custkey").as("AESEQ"),
        col("c_mktsegment").as("AETERM"),
        col("c_nationkey").as("NATIONCD"))
      val hints = Mapping.columnHints(src)
      val vars = Seq(
        VarMeta("USUBJID", Some("Unique Subject Identifier")),
        VarMeta("AESEQ", Some("Sequence Number")),
        VarMeta("AETERM", Some("Reported Term for the Adverse Event")),
        VarMeta("AEDECOD", Some("Dictionary-Derived Term")))
      val out = Mapping.suggestAll(src.columns.toSeq, vars, hints, minConfidence = 0.5)
      import s.implicits._
      out.map(x => (x.sourceColumn, x.targetVariable,
          math.rint(x.score * 1e6) / 1e6))
        .toDF("source_column", "target_variable", "score")
        .orderBy("target_variable")
    })
  )

  private def hintOracle(c: String): String =
    s"""SELECT '$c' AS colname,
       |  (cnt_nonblank > 0 AND CAST(cnt_num AS DOUBLE) / cnt_nonblank > 0.9) AS is_numeric,
       |  CASE WHEN cnt_nonblank > 0 THEN CAST(cnt_uniq AS DOUBLE) / cnt_nonblank ELSE 0.0 END AS unique_ratio,
       |  CASE WHEN cnt_total > 0 THEN CAST(cnt_blank AS DOUBLE) / cnt_total ELSE 1.0 END AS null_ratio
       |FROM (SELECT COUNT(*) AS cnt_total,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) = '' THEN 1 ELSE 0 END) AS cnt_blank,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> '' THEN 1 ELSE 0 END) AS cnt_nonblank,
       |        COUNT(DISTINCT CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> ''
       |                            THEN trim(CAST($c AS VARCHAR)) END) AS cnt_uniq,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> ''
       |                  AND regexp_matches(trim(CAST($c AS VARCHAR)),
       |                      '^[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?$$')
       |             THEN 1 ELSE 0 END) AS cnt_num
       |      FROM orders)""".stripMargin

  val oracles: Map[String, String] = Map(
    "f1_hints" ->
      (Seq("o_orderkey", "o_orderstatus", "o_orderpriority").map(hintOracle)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY colname")),

    "f2_samples" ->
      """SELECT v FROM (
        |  SELECT DISTINCT trim(o_orderpriority) AS v FROM orders
        |  WHERE trim(coalesce(o_orderpriority,'')) <> ''
        |  ORDER BY v LIMIT 5) ORDER BY v""".stripMargin
    // f3_suggest: JW scoring is not SQL-expressible → rows-only check.
  )
}
