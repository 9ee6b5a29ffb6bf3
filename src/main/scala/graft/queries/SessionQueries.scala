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

  /** Multi-domain study fixture for the E3 export path: DM from `customer`,
    * AE from `orders`, LB from `lineitem` — exact-name columns so the
    * greedy mapper resolves deterministically, three sizes of domain so the
    * export scales with the sf directory. */
  private val e3StudyCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def multiDomainStudy(s: SparkSession, dir: String): String =
    // per-JVM memo: the source parquet is immutable within one process, so
    // repeated bench rounds time the EXPORT, not fixture CSV regeneration
    // (a fresh process still rebuilds — no stale-fixture risk across runs)
    e3StudyCache.computeIfAbsent(dir, _ => buildMultiDomainStudy(s, dir))

  private def buildMultiDomainStudy(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val d = Paths.get("target", "tmp", s"e3_study_$tag")
    val dm = table(s, dir, "customer").select(
      col("c_custkey").as("SUBJID"),
      date_format(expr("timestamp '1995-06-01' + make_interval(0,0,0,c_custkey % 300)"),
        "yyyy-MM-dd").as("RFSTDTC"),
      (col("c_custkey") % 90 + 18).as("AGE"),
      when(col("c_custkey") % 2 === 0, lit("M")).otherwise(lit("F")).as("SEX"))
      .orderBy(col("SUBJID").cast("long"))
    Fixtures.writeSingleCsv(dm, d, "dm.csv")
    val ae = table(s, dir, "orders").select(
      col("o_custkey").as("SUBJID"),
      col("o_orderpriority").as("AETERM"),
      when(col("o_orderkey") % 3 === 0, lit("MILD"))
        .when(col("o_orderkey") % 3 === 1, lit("MODERATE"))
        .otherwise(lit("SEVERE")).as("AESEV"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("AESTDTC"))
      .orderBy(col("o_orderkey").cast("long"))
    Fixtures.writeSingleCsv(ae, d, "ae.csv")
    val lb = table(s, dir, "lineitem").select(
      col("l_orderkey").as("SUBJID"),
      concat(lit("T"), col("l_linenumber")).as("LBTESTCD"),
      col("l_quantity").cast("string").as("LBORRES"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("LBDTC"))
      .orderBy(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
    Fixtures.writeSingleCsv(lb, d, "lb.csv")
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
    }),

    // E3 end-to-end: ingest + map + normalize + export THREE domains to
    // XPT/Dataset-XML/Define-XML, then read each XPT back (TS-140 parser)
    // and report its row count — the oracle replays the counts from the
    // source tables, so a dropped/duplicated row anywhere in the pipeline
    // (or an XPT member that doesn't round-trip) fails the gate. The heavy
    // work is deliberately EAGER inside the builder: this entry exists to
    // give the export path a wall-clock bench number.
    "e3_export_study" -> ((s, dir) => {
      val folder = multiDomainStudy(s, dir)
      val session = StudySession.create(s, "GRAFT", folder,
        Map("DM" -> "dm.csv", "AE" -> "ae.csv", "LB" -> "lb.csv"))
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val out = Paths.get("target", "tmp", s"e3_out_$tag")
      session.exportAll(out.toString)
      val counts = Seq("dm", "ae", "lb").map { ds =>
        (ds, graft.sinks.XptReader.countRows(out.resolve(s"$ds.xpt").toString))
      }
      import s.implicits._
      counts.toDF("dataset", "xpt_rows").orderBy("dataset")
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
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "e3_export_study" ->
      """SELECT dataset, xpt_rows FROM (
        |  SELECT 'ae' AS dataset, count(*) AS xpt_rows FROM orders
        |  UNION ALL SELECT 'dm', count(*) FROM customer
        |  UNION ALL SELECT 'lb', count(*) FROM lineitem)
        |ORDER BY dataset""".stripMargin
  )
}
