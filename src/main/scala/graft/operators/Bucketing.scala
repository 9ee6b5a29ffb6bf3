package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: co-locate repeatedly-joined tables on their join
 * key at WRITE time so every subsequent join/aggregation on that key runs
 * shuffle-free. At 100 TB this converts the dominant cost of a fact-fact
 * join (two full shuffles) into a local sort-merge per bucket pair — the
 * single highest-leverage physical design choice for a recurring pipeline.
 *
 * Spark requires bucketed data to live in the catalog (`saveAsTable`);
 * bucket counts must match on both sides for the shuffle to be elided.
 */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted catalog table. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket key — with matching
    * bucket counts the planner elides both shuffle exchanges. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Count shuffle exchanges in a frame's executed plan (0 for a correctly
    * co-located join) — the assertion hook for plan tests and CI. Matches
    * every shuffle flavor (hash, range, single-partition); broadcast
    * exchanges are not shuffles and are excluded. */
  def shuffleExchanges(df: DataFrame): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
}
