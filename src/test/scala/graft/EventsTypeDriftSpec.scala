package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Guards the events-table data boundary against parquet timestamp-type
 * drift. The driver has regenerated `/root/testdata` with `ts` as INT64
 * epoch-nanos (r1–r7) and as Timestamp(isAdjustedToUTC=false, micros) =
 * TIMESTAMP_NTZ (r8) — the r8 drift broke three queries at ANALYSIS
 * (`unix_micros` and `cast(... as bigint)` are NTZ-illegal) and the
 * correctness gate silently shrank. This spec writes the SAME rows in all
 * three physical shapes and requires every events-consuming query shape to
 * produce identical results on each, so the next drift fails here first.
 */
class EventsTypeDriftSpec extends SparkSpec {

  // the three r8-broken queries plus the other events() consumers — cheap
  // at 90 rows, so run the full set
  private val eventQueries = Seq("rj1_interval_join", "rj2_overlap_join",
    "st2_sessions", "st5_interval_join", "st1_windowed_counts", "st3_sliding",
    "st4_asof", "sk3_streaming_cms", "sk4_streaming_hll")

  /** 90 events over 3 users / 3 types, spaced so the 30-min interval join
    * and 10-min range join both match some (not all) pairs. */
  private lazy val base: DataFrame = {
    import spark.implicits._
    (0 until 90).map { i =>
      val typ = Seq("click", "purchase", "error")(i % 3)
      // 7-minute spacing → purchases land 7 min after clicks (within 30m)
      // and clicks 14 min after errors (within 10m only when the gap wraps)
      // user decoupled from type (i/3, not i%3) so each group of three
      // consecutive events (click, purchase 7 min later, error) shares a
      // user — the st5 interval join and st4 as-of both get matches
      (i.toLong, "2024-01-01 00:00:00", i * 7L, (i / 3 % 3).toLong + 1L, typ,
        i * 1.5, s"""{"k":${i % 10}}""")
    }.toDF("event_id", "t0", "mins", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        (to_timestamp(col("t0")) + expr("make_interval(0,0,0,0,0,mins)")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }

  private def writeShape(shape: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"evdrift_$shape").toString
    val df = shape match {
      case "ltz"   => base
      case "ntz"   => base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case "nanos" => base.withColumn("ts",
        (unix_micros(col("ts")) * 1000L).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Graft.events normalizes all three physical ts shapes to TimestampType") {
    for (shape <- Seq("ltz", "ntz", "nanos")) {
      val dir = writeShape(shape)
      val ev = Graft.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"shape=$shape read back as ${ev.schema("ts").dataType}")
    }
  }

  test("every events-consuming query yields identical results on all shapes") {
    val dirs = Seq("ltz", "ntz", "nanos").map(s => s -> writeShape(s)).toMap
    for (q <- eventQueries) {
      val results = dirs.map { case (shape, dir) =>
        val rows =
          try SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
          catch { case e: Throwable =>
            fail(s"$q failed to run on shape=$shape: ${e.getMessage}")
          }
        shape -> rows
      }
      val ltz = results("ltz")
      assert(ltz.nonEmpty, s"$q returned 0 rows on the fixture — vacuous")
      for (shape <- Seq("ntz", "nanos"))
        assert(results(shape) == ltz, s"$q: shape=$shape diverges from ltz")
    }
  }
}
