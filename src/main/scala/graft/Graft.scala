package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table helpers shared by the engine, Verify, Bench and tests. */
object Graft {

  /** Build a local session tuned for this container (32 threads, AQE on).
    * On a real cluster the same conf minus `master` applies; AQE handles
    * skew-joins and shuffle-partition coalescing at 100 TB. */
  def session(appName: String = "graft",
              master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // native expressions (graft_iso8601/graft_duration) on the SQL surface
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type —
      // read as long and rebuild micros in events() below.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one testdata table (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events table with `ts` normalized to a micros TimestampType (LTZ)
    * regardless of the physical parquet shape. The testdata has shipped
    * `ts` as TIMESTAMP(NANOS) (read as long via nanosAsLong) and as
    * Timestamp(isAdjustedToUTC=false, micros) (read as TIMESTAMP_NTZ) across
    * regenerations; downstream queries do epoch math (`unix_micros`,
    * `cast(... as bigint)`) that is NTZ-illegal, so all shapes funnel to LTZ
    * here — never patch the individual queries for a type drift. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: Column./ is DOUBLE division, and epoch nanos
        // (~1.7e18) exceed double's 53-bit mantissa — `div` keeps exact longs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is UTC, so the wall-clock reading equals the instant
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /**
   * Empty-string ≙ null normal form used by every validation / normalization
   * operator: the reference treats null and "" interchangeably
   * (`crates/tss-submit/src/validate/column_reader.rs:93-107`).
   */
  def txt(c: Column): Column = trim(coalesce(c.cast("string"), lit("")))

  /** Null-or-blank predicate in the same normal form. */
  def isBlank(c: Column): Column = txt(c) === ""
}
