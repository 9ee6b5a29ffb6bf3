package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.session.StudySession

/**
 * End-to-end pipeline coverage: a DM-shaped CSV derived from `customer`
 * runs the FULL lifecycle — CSV scan (S1), hints (F1), Jaro-Winkler
 * auto-mapping (F3/F4), rule inference (the planner), and the one-projection
 * normalization (N1-N10) — and the DuckDB oracle restates every derivation
 * in SQL. Exact-name columns make the greedy mapping deterministic.
 */
object SessionQueries {

  private def studyCsv(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val d = Paths.get("target", "tmp", s"session_$tag")
    val src = table(s, dir, "customer").select(
      col("c_custkey").as("SUBJID"),
      date_format(expr("timestamp '1995-06-01' + make_interval(0,0,0,c_custkey % 300)"),
        "yyyy-MM-dd").as("RFSTDTC"),
      date_format(expr("timestamp '1970-01-01' + make_interval(c_custkey % 50,0,0,c_custkey % 28)"),
        "dd.MM.yyyy").as("BRTHDTC"),
      (col("c_custkey") % 90 + 18).as("AGE"),
      when(col("c_custkey") % 3 === 0, lit("male"))
        .when(col("c_custkey") % 3 === 1, lit("F"))
        .otherwise(lit("other")).as("SEX"))
      .orderBy(col("SUBJID").cast("long"))
    Fixtures.writeSingleCsv(src, d, "dm.csv")
    d.toString
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_dm_pipeline" -> ((s, dir) => {
      val folder = studyCsv(s, dir)
      val session = StudySession.create(s, "GRAFT", folder, Map("DM" -> "dm.csv"))
      session.preview("DM").get
        .select(col("STUDYID"), col("DOMAIN"), col("USUBJID"), col("SUBJID"),
          col("RFSTDTC"), col("BRTHDTC"), col("AGE"), col("SEX"))
        .orderBy(col("SUBJID").cast("long"))
    })
  )

  val oracles: Map[String, String] = Map(
    "e1_dm_pipeline" ->
      """SELECT 'GRAFT' AS STUDYID, 'DM' AS DOMAIN,
        |  'GRAFT-' || CAST(c_custkey AS VARCHAR) AS USUBJID,
        |  CAST(c_custkey AS VARCHAR) AS SUBJID,
        |  strftime(TIMESTAMP '1995-06-01' + to_days(CAST(c_custkey % 300 AS INT)), '%Y-%m-%d') AS RFSTDTC,
        |  strftime(TIMESTAMP '1970-01-01' + to_years(CAST(c_custkey % 50 AS INT))
        |           + to_days(CAST(c_custkey % 28 AS INT)), '%Y-%m-%d') AS BRTHDTC,
        |  CAST(c_custkey % 90 + 18 AS DOUBLE) AS AGE,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'M'
        |       WHEN c_custkey % 3 = 1 THEN 'F'
        |       ELSE 'other' END AS SEX
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
