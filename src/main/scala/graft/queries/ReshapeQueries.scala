package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{Reshape, SuppColumnConfig}

/**
 * Reshape/generation coverage (SURVEY §2.7 G1/G3, §2.3 M1/M2) with plain-SQL
 * oracles: the SUPP unpivot is a UNION ALL per qualifier, the RELSUB
 * reciprocal augmentation a NOT-EXISTS + CASE lookup, the codelist decode a
 * CASE expression.
 */
object ReshapeQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1 — SUPP builder: wide → long, empty USUBJID/QVAL rows dropped
    "g1_supp" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val src = o.select(
        // every 13th subject blanked to pin the USUBJID filter
        when(col("o_orderkey") % 13 === 0, lit(" "))
          .otherwise(col("o_custkey").cast("string")).as("USUBJID"),
        col("o_orderpriority").as("OPRIO"),
        // every 7th value blanked to pin the QVAL filter
        when(col("o_orderkey") % 7 === 0, lit(""))
          .otherwise(col("o_orderstatus")).as("OSTAT"))
      Reshape.buildSupp("AE", "GRAFT", src, Seq(
        "OPRIO" -> SuppColumnConfig("QOPRIO", "Order Priority", "CRF"),
        "OSTAT" -> SuppColumnConfig("QOSTAT", "Order Status", "CRF"))).get
        .orderBy("QNAM", "USUBJID", "QVAL")
    }),

    // G3 — RELSUB reciprocal augmentation
    "g3_relsub" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val relsub = c.select(
        lit("GRAFT").as("STUDYID"),
        lit("RELSUB").as("DOMAIN"),
        concat(lit("S"), col("c_custkey")).as("USUBJID"),
        when(col("c_custkey") % 5 === 0, concat(lit("S"), col("c_custkey") - 1))
          .otherwise(concat(lit("S"), col("c_custkey") + 1)).as("RSUBJID"),
        when(col("c_custkey") % 4 === 0, lit("MOTHER, BIOLOGICAL"))
          .when(col("c_custkey") % 4 === 1, lit("SPOUSE"))
          .when(col("c_custkey") % 4 === 2, lit("HUSBAND"))
          .otherwise(lit("GUARDIAN")).as("SREL"),
        col("c_custkey").as("_row_id"))
      Reshape.ensureRelsubBidirectional(relsub)
        .select("STUDYID", "DOMAIN", "USUBJID", "RSUBJID", "SREL")
        .orderBy("USUBJID", "RSUBJID", "SREL")
    }),

    // M1/M2 — study-codelist decode: CD column decodes into base name,
    // misses stay null
    "m1_decode" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus").as("OSTATCD"))
      Reshape.applyStudyCodelists(o,
        Map("OSTATCD" -> Map("O" -> "OPEN", "F" -> "FINISHED")))
        .orderBy("o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "g1_supp" ->
      """WITH src AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN ' '
        |              ELSE CAST(o_custkey AS VARCHAR) END AS usubjid,
        |         o_orderpriority AS oprio,
        |         CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE o_orderstatus END AS ostat
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'GRAFT' AS STUDYID, 'AE' AS RDOMAIN, trim(usubjid) AS USUBJID,
        |         'USUBJID' AS IDVAR, trim(usubjid) AS IDVARVAL,
        |         'QOPRIO' AS QNAM, 'Order Priority' AS QLABEL, trim(oprio) AS QVAL,
        |         'CRF' AS QORIG, '' AS QEVAL
        |  FROM src WHERE trim(coalesce(usubjid,'')) <> '' AND trim(coalesce(oprio,'')) <> ''
        |  UNION ALL
        |  SELECT 'GRAFT', 'AE', trim(usubjid), 'USUBJID', trim(usubjid),
        |         'QOSTAT', 'Order Status', trim(ostat), 'CRF', ''
        |  FROM src WHERE trim(coalesce(usubjid,'')) <> '' AND trim(coalesce(ostat,'')) <> '')
        |ORDER BY QNAM, USUBJID, QVAL""".stripMargin,

    "g3_relsub" ->
      """WITH relsub AS (
        |  SELECT 'GRAFT' AS STUDYID, 'RELSUB' AS DOMAIN,
        |         'S' || CAST(c_custkey AS VARCHAR) AS USUBJID,
        |         CASE WHEN c_custkey % 5 = 0 THEN 'S' || CAST(c_custkey - 1 AS VARCHAR)
        |              ELSE 'S' || CAST(c_custkey + 1 AS VARCHAR) END AS RSUBJID,
        |         CASE WHEN c_custkey % 4 = 0 THEN 'MOTHER, BIOLOGICAL'
        |              WHEN c_custkey % 4 = 1 THEN 'SPOUSE'
        |              WHEN c_custkey % 4 = 2 THEN 'HUSBAND'
        |              ELSE 'GUARDIAN' END AS SREL
        |  FROM customer),
        |recip AS (
        |  SELECT STUDYID, DOMAIN, RSUBJID AS USUBJID, USUBJID AS RSUBJID,
        |         CASE SREL WHEN 'MOTHER, BIOLOGICAL' THEN 'CHILD, BIOLOGICAL'
        |                   WHEN 'SPOUSE' THEN 'SPOUSE'
        |                   WHEN 'HUSBAND' THEN 'WIFE' END AS SREL
        |  FROM relsub r
        |  WHERE SREL IN ('MOTHER, BIOLOGICAL', 'SPOUSE', 'HUSBAND')
        |    AND NOT EXISTS (SELECT 1 FROM relsub x
        |                    WHERE x.USUBJID = r.RSUBJID AND x.RSUBJID = r.USUBJID))
        |SELECT STUDYID, DOMAIN, USUBJID, RSUBJID, SREL FROM relsub
        |UNION ALL
        |SELECT STUDYID, DOMAIN, USUBJID, RSUBJID, SREL FROM recip
        |ORDER BY USUBJID, RSUBJID, SREL""".stripMargin,

    "m1_decode" ->
      """SELECT o_orderkey, o_orderstatus AS OSTATCD,
        |  CASE trim(o_orderstatus) WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FINISHED'
        |       ELSE NULL END AS OSTAT
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
