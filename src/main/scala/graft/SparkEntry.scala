package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live under [[graft.queries]]; each map entry is one
  * operator from SURVEY §2 (or a scale-path operator) with a DuckDB oracle. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++
      NormalizeQueries.defs ++
      ValidateQueries.defs ++
      MappingQueries.defs ++
      SourceQueries.defs ++
      ReshapeQueries.defs ++
      SinkQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      TextQueries.defs ++
      StreamQueries.defs ++
      MultimodalQueries.defs ++
      SessionQueries.defs ++
      SemiStructuredQueries.defs ++
      OlapQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      NormalizeQueries.oracles ++
      ValidateQueries.oracles ++
      MappingQueries.oracles ++
      SourceQueries.oracles ++
      ReshapeQueries.oracles ++
      SinkQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      TextQueries.oracles ++
      StreamQueries.oracles ++
      MultimodalQueries.oracles ++
      SessionQueries.oracles ++
      SemiStructuredQueries.oracles ++
      OlapQueries.oracles
}
