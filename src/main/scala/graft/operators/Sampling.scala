package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling and splitting.
 *
 * Training pipelines need samples and train/val/test splits that are (a)
 * stable across re-runs and engines — a row's split must never change when
 * the job is re-executed, scaled, or reimplemented — and (b) consistent
 * across tables: hashing a shared key puts a user's every row in the same
 * split, where `df.sample()` (RNG per partition, order-dependent) does
 * neither. Buckets come from the first 56 bits of standard MD5 of the key
 * (the same engine-portable construction the simhash dedup uses —
 * [[Dedup.portableTokenHash]]), so any engine with an md5() reproduces the
 * assignment bit-for-bit and a DuckDB oracle can replay it.
 *
 * Pure projections/filters — no shuffle, no RNG, codegen'd.
 */
object Sampling {

  /** Engine-portable deterministic bucket in [0, buckets): first 56 bits
    * of MD5 of (salt ++ key) mod buckets. `salt` decorrelates independent
    * samples over the same keys; nulls land in bucket 0 (empty-string
    * key), keeping the function total. */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column = {
    require(buckets >= 1, s"hashBucket: buckets must be >= 1, got $buckets")
    pmod(
      conv(substring(md5(concat(lit(salt), coalesce(key.cast("string"), lit("")))),
        1, 14), 16, 10).cast("long"),
      lit(buckets.toLong))
  }

  /** Deterministic `fraction` sample: keeps rows whose bucket falls below
    * fraction·buckets. Same key (+salt) → same verdict, forever. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "", buckets: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"hashSample: fraction must be in [0, 1], got $fraction")
    df.where(hashBucket(col(keyCol), buckets, salt) <
      lit(math.round(fraction * buckets)))
  }

  /** Train/val/test (or any) split assignment: appends `splitCol` naming
    * the split whose cumulative weight range the key's bucket falls into.
    * Weights must be positive and sum to ~1 (bucket rounding decides the
    * exact boundary rows, identically on every engine). */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: String = "", buckets: Int = 10000,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "hashSplit: need at least one split, all weights positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1, got $total")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * buckets))
    val b = hashBucket(col(keyCol), buckets, salt)
    // chained whens over cumulative bucket bounds; the LAST split is the
    // unconditional fallback, so every bucket lands somewhere even if
    // rounding left a gap at the top
    val out = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), rest) => when(b < lit(bound), lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, out)
  }
}
