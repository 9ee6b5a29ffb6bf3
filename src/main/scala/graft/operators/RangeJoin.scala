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

  /**
   * P68 — binned interval-OVERLAP join: every left interval `[llo, lhi]`
   * against every right interval `[rlo, rhi]` with a non-empty inclusive
   * intersection (`llo <= rhi && rlo <= lhi`). Same motivation as
   * [[intervalJoin]] — the naive `ON` form plans as a nested-loop join —
   * and the same cure: both sides replicate to the bins they cover and the
   * predicate becomes an equi-join on the bin key plus the exact residual
   * filter. A pair whose intervals share several bins would match once per
   * shared bin, so each pair is counted ONLY in the bin that contains the
   * start of the intersection (`greatest(llo, rlo)`) — every overlapping
   * pair has exactly one such bin, making the output duplicate-free
   * without a `distinct` shuffle. Column names must be disjoint across the
   * two sides (callers rename beforehand).
   */
  def overlapJoin(left: DataFrame, lloCol: String, lhiCol: String,
      right: DataFrame, rloCol: String, rhiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"overlapJoin: binSize must be positive, got $binSize")
    val l = left.withColumn("__bin",
      explode(sequence(binOf(col(lloCol), binSize), binOf(col(lhiCol), binSize))))
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(rloCol), binSize), binOf(col(rhiCol), binSize))))
    l.join(r, Seq("__bin"))
      .where(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol) &&
        col("__bin") === binOf(greatest(col(lloCol), col(rloCol)), binSize))
      .drop("__bin")
  }
}
