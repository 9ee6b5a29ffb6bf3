package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation primitives for hot keys at scale. AQE's skew-join
 * handling (enabled in [[graft.Graft.session]]) covers joins at runtime;
 * these cover the aggregation side, where one giant key (a viral user, an
 * empty-string USUBJID, a default enum value) funnels into a single
 * reducer.
 *
 * Pattern: two-phase salted aggregation — partial aggregate on
 * (key, salt), then final aggregate on key. Both phases map-side combine,
 * so the hot key's rows split across `saltBuckets` reducers in phase one
 * and only `saltBuckets` pre-aggregated rows meet in phase two.
 */
object Skew {

  /** Deterministic salt in [0, buckets): a pure content hash of the given
    * columns, so a task retry under speculative execution re-salts every
    * row identically (monotonically_increasing_id would re-salt by the
    * retry's partition layout). Pass ALL row columns (see [[saltFor]]) to
    * spread a hot key; passing ONLY the grouping keys yields a CONSTANT
    * salt per key — zero spread, the mitigation silently does nothing —
    * so include columns that vary within a key. Byte-identical rows share
    * a bucket, which leaves counts/sums exact and only costs spread when
    * a hot key is dominated by literal duplicate rows. */
  def salt(buckets: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "salt needs at least one column")
    pmod(xxhash64(cols: _*), lit(buckets.toLong))
  }

  /** [[salt]] over every hashable column of `df` — the safe default: the
    * caller can't accidentally feed a key-only (constant-per-key) column
    * set, and un-hashable columns (maps, and nested types containing
    * maps, which xxhash64 rejects at analysis) are filtered out rather
    * than failing the whole frame. */
  def saltFor(df: DataFrame, buckets: Int): Column = {
    val hashable = df.schema.fields.filter(f => isHashable(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty, "no hashable columns to salt on")
    salt(buckets, hashable.toSeq: _*)
  }

  /** xxhash64 (HashExpression) rejects MapType — map iteration order is
    * undefined — including maps nested in arrays/structs. */
  private[operators] def isHashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType      => false
      case ArrayType(e, _) => isHashable(e)
      case s: StructType   => s.fields.forall(f => isHashable(f.dataType))
      case _               => true
    }
  }

  /**
   * Salted count/sum aggregation: semantically identical to
   * `df.groupBy(keys).agg(count, sum(valueCol))` but skew-proof.
   */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", saltFor(df, saltBuckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }

  /**
   * Salted distinct count (exact): phase one dedups (key, salt, value)
   * locally, phase two counts distinct values per key from the thinned
   * stream. For extreme cardinality prefer `approx_count_distinct`.
   */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    // value-derived salt: each distinct value lands in exactly ONE
    // (key, salt) bucket, so per-bucket distinct counts sum to the exact
    // total. Phase one counts distinct within (key, salt) — a hot key's
    // value set splits across `saltBuckets` reducers instead of one —
    // and phase two sums `saltBuckets` tiny partials per key.
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltBuckets.toLong)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(countDistinct(col(valueCol)).as("__part"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__part")).cast("long").as("n_distinct"))
  }

  /** Replicated broadcast join for a skewed build side is just
    * `broadcast()`; for large-large joins with known hot keys, split the
    * hot keys out, broadcast-join them, and union with the sort-merge rest. */
  def hotKeySplitJoin(facts: DataFrame, dim: DataFrame, key: String,
      hotKeys: Seq[Any]): DataFrame = {
    val hot = facts.where(col(key).isin(hotKeys: _*))
      .join(broadcast(dim.where(col(key).isin(hotKeys: _*))), key)
    val cold = facts.where(!col(key).isin(hotKeys: _*) || col(key).isNull)
      .join(dim.where(!col(key).isin(hotKeys: _*) || col(key).isNull), key)
    hot.unionByName(cold)
  }

  /**
   * P120 — range-partition boundary planner with a balance audit: what
   * Spark's RangePartitioner does internally (sample, take quantile
   * cutoffs), surfaced as a deterministic operator — sample rows by the
   * portable hash draw ([[Sampling.uniform01]] ≤ `samplePct`, so the
   * sample is a function of the DATA, not of partitioning or RNG), take
   * the (i/n)-quantile cutoffs of `keyCol` over the sample (exact R-7 —
   * one sorted buffer over the sample only, the o5 shape), then audit
   * the plan by bucketing the FULL table against the broadcast cutoffs
   * (ties land low — the quantileScores rule). Returns one row per
   * planned partition: (part, lo, hi, n_rows) with lo/hi the bounding
   * cutoffs (null at the ends, rounded at 4 for the report; bucketing
   * uses the unrounded doubles).
   *
   * Cross-engine: cutoffs are R-7 interpolations on identical sorted
   * sample operands; every full-table comparison is a strict `>`
   * against a cutoff BOTH engines computed identically, so ulp slack
   * cannot flip a row (the o9/q10 argument). Choose binary-exact
   * `samplePct` values (0.25, 0.5) so the sample-membership compare is
   * exact too.
   */
  def rangeBoundaries(df: DataFrame, keyCol: String, sampleKey: Column,
      numPartitions: Int, samplePct: Double): DataFrame = {
    require(numPartitions >= 2,
      s"rangeBoundaries: numPartitions must be >= 2, got $numPartitions")
    require(samplePct > 0 && samplePct <= 1,
      s"rangeBoundaries: samplePct must be in (0,1], got $samplePct")
    val fracs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val cuts = df
      .where(col(keyCol).isNotNull &&
        Sampling.uniform01(sampleKey, "rb:") <= samplePct)
      .agg(expr(s"percentile(`$keyCol`, array(${fracs.mkString(", ")}))")
        .as("__cuts"))
    val bucket = fracs.indices
      .map(i => when(col(keyCol) > element_at(col("__cuts"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    df.where(col(keyCol).isNotNull)
      .join(broadcast(cuts)) // 1-row scalar side
      .groupBy(bucket.cast("int").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        first(col("__cuts")).as("__c"))
      .select(col("part"),
        when(col("part") > 0, round(element_at(col("__c"), col("part")), 4))
          .as("lo"),
        when(col("part") < numPartitions - 1,
          round(element_at(col("__c"), col("part") + 1), 4)).as("hi"),
        col("n_rows"))
  }
}
