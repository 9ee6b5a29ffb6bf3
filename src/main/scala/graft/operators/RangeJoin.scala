package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Binned range (interval) join: points `pt` against intervals `[lo, hi]`
 * over a long-valued domain (epoch micros, positions, offsets, …).
 *
 * Spark plans a raw `points.join(intervals, pt between lo and hi)` as a
 * BroadcastNestedLoopJoin — every point compared against every interval,
 * O(|P|·|I|) work that cannot survive two large inputs. This operator bins
 * the domain: each interval replicates to the bins it covers (via
 * `sequence`), each point lands in exactly one bin, and the match becomes
 * an equi-join on the bin key plus the residual BETWEEN filter. The shuffle
 * key is (bin), so work scales with data volume and bin occupancy, never
 * with |P|·|I|.
 *
 * `binSize` trades interval replication (long intervals → many bins)
 * against bin fan-in; set it near the typical interval length. Domain
 * values must stay within 2^53 (the binning divides in double space) —
 * epoch micros through year 2255 qualify.
 */
object RangeJoin {

  private def binOf(c: Column, binSize: Long): Column =
    floor(c.cast("double") / binSize).cast("long")

  /**
   * Join each point row to every interval row whose `[lo, hi]` (inclusive)
   * contains its `pt`. Output carries all columns of both sides (callers
   * disambiguate names beforehand). One shuffle per side, on the bin key.
   */
  def intervalJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"intervalJoin: binSize must be positive, got $binSize")
    val p = points.withColumn("__bin", binOf(col(ptCol), binSize))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binSize), binOf(col(hiCol), binSize))))
    p.join(i, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
