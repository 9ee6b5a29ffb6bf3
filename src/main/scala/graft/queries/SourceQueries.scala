package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.sources.CsvIngest

/**
 * Source-operator coverage (SURVEY §2.1 S1-S6): parquet → CSV → CsvIngest
 * round trip proves header probe, all-string schema, `_row_id` ordering and
 * distributed header-skip against the DuckDB view of the original table.
 */
object SourceQueries {

  /** Materialize a table as a single CSV file (driver-adjacent tmp dir). */
  private def toCsv(s: SparkSession, df: DataFrame, tag: String): String =
    Fixtures.writeSingleCsv(df, Paths.get("target", "tmp", s"csv_$tag"), "data.csv")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S4 — CSV scan round trip with header probe + row-order preservation
    "s1_csv_roundtrip" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val src = table(s, dir, "nation").orderBy("n_nationkey")
      val path = toCsv(s, src, s"nation_$tag")
      val (df, headers) = CsvIngest.readCsvTable(s, path, headerRows = 1)
      require(headers.columns == src.columns.toSeq)
      df.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey").cast("long"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_csv_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
        |  n_name,
        |  CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}
