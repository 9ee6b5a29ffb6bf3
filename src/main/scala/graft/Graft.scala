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

  /** Load one testdata table (TESTDATA.md), fanning an unsplittable
    * single-file scan out to the session's parallelism.
    *
    * The testdata parquet files are single-row-group (verified: 1 row
    * group each at every SF), so a scan reads as ONE split regardless of
    * `maxPartitionBytes` — and every map-side pass BEFORE the first
    * exchange (token explodes, minhash ladders, per-byte replays, md5
    * resample grids) then runs on one core of the whole machine. This is
    * the guide-§2.5 "unsplittable input" case: repartition right after
    * the read. The round-robin exchange moves only the base table's few
    * MB once and unlocks full parallelism for all downstream map work;
    * measured r11-opt at sf0.1 on local[32]: o44_bootstrap 8.7 → 1.9 s
    * (its 32× md5 resample grid was single-core), mm13_byteentropy
    * 3.8 → 1.7 s.
    *
    * Scale-adaptive, not a local-mode constant: the fanout fires only
    * when the file's estimated split count (size / maxPartitionBytes)
    * cannot reach the session's default parallelism AND the file is big
    * enough to matter (`spark.graft.scan.fanoutMinBytes`, default 256k —
    * broadcast-sized dims like nation/region skip the extra exchange).
    * At production sizes (files ≫ split size, or directory inputs,
    * which list many splittable files) the condition is false and the
    * scan stays exchange-free. `spark.graft.scan.fanout=false` disables.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    fanOutSmallScan(spark.read.parquet(s"$sfDir/$name.parquet"),
      spark, s"$sfDir/$name.parquet")

  /** The conditional fanout behind [[table]], reusable by any other
    * single-file reader (CsvIngest applies it after `_row_id` capture).
    * No-op unless the file is a regular file whose estimated split count
    * cannot reach the session's parallelism — see [[table]]'s scaladoc
    * for the gating rationale. */
  def fanOutSmallScan(df: DataFrame, spark: SparkSession,
      path: String): DataFrame = {
    if (!spark.conf.get("spark.graft.scan.fanout", "true").toBoolean) df
    else {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.isRegularFile(p)) df
      else {
        val size = java.nio.file.Files.size(p)
        def bytes(s: String): Long =
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
        val minBytes = bytes(
          spark.conf.get("spark.graft.scan.fanoutMinBytes", "256k"))
        val maxSplit = bytes(
          spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        val par = spark.sparkContext.defaultParallelism
        val estSplits = (size + maxSplit - 1) / math.max(maxSplit, 1L)
        if (size >= minBytes && estSplits < par) df.repartition(par) else df
      }
    }
  }

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
