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
}
