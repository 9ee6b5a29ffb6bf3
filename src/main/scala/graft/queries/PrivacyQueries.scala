package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.Privacy

/**
 * Privacy-gate coverage. pv1: k-anonymity over (nation, market segment,
 * account-balance band) quasi-identifiers — every row annotated with its
 * QID multiplicity and releasability, replayed exactly by a window count
 * in SQL.
 */
object PrivacyQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P77 — k = 5 over a QID grid sparse enough that both outcomes occur
    "pv1_kanon" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      Privacy.kAnonymityFilter(c,
          Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
        .orderBy("c_custkey")
    })
  )

  val oracles: Map[String, String] = Map(
    // floor() before the BIGINT cast — CAST(double AS BIGINT) ROUNDS in
    // DuckDB while Spark's floor().cast matches floor semantics
    "pv1_kanon" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment, bal_band,
        |  CAST(COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band) AS BIGINT) AS qid_group_n,
        |  COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band) >= 5 AS kept
        |FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
        |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin
  )
}
