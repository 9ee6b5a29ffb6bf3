package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable sketch summaries — fixed-size state over unbounded item
 * streams, the structure that lets a 100-TB pipeline keep frequency
 * estimates without per-key state. Hashing is the repo's portable 56-bit
 * MD5 ([[Sampling.hashValue]]), so sketch contents are a function of the
 * DATA alone: engines, re-runs, and partitionings all build the identical
 * sketch, and a SQL oracle can replay every cell.
 */
object Sketches {

  /**
   * P49 — count-min sketch over an item column (duplicates = occurrences):
   * `rows` independent hash rows of `width` buckets; cell (r, b) counts
   * the items whose row-r hash lands in bucket b. ONE keyed groupBy over
   * a constant `rows`-way row expansion — map-side combining collapses
   * every partition to ≤ rows·width cells, so shuffle volume is bounded
   * by the sketch size, not the corpus. Returns (r, bucket, n) — empty
   * cells are absent (estimate readers coalesce to 0).
   */
  def countMinSketch(items: DataFrame, itemCol: String, rows: Int, width: Int,
      salt: String = "cms"): DataFrame = {
    require(rows >= 1, s"countMinSketch: rows must be >= 1, got $rows")
    require(width >= 1, s"countMinSketch: width must be >= 1, got $width")
    items
      .select(explode(array((0 until rows).map { r =>
        struct(lit(r).as("r"),
          Sampling.hashBucket(col(itemCol), width, s"$salt$r:").as("bucket"))
      }: _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * P49 — point estimates from a count-min sketch: for each probe item,
   * est = min over hash rows of its cell count (the classic CM upper
   * bound: never below the true count, above it only when every row
   * collides). The probe side expands `rows`-way and left-joins the
   * sketch cells — broadcast-sized by construction (≤ rows·width cells).
   */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
      rows: Int, width: Int, salt: String = "cms"): DataFrame = {
    require(rows >= 1, s"cmsEstimate: rows must be >= 1, got $rows")
    require(width >= 1, s"cmsEstimate: width must be >= 1, got $width")
    probes
      .select(col(itemCol).as("item"), explode(array((0 until rows).map { r =>
        struct(lit(r).as("r"),
          Sampling.hashBucket(col(itemCol), width, s"$salt$r:").as("bucket"))
      }: _*)).as("cell"))
      .select(col("item"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }
}
