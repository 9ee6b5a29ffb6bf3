package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column profiling and snapshot-drift detection — the data-contract
 * monitor a production pipeline runs between ingest batches: has a
 * column's null rate spiked, its cardinality collapsed, its value
 * distribution shifted? (Schema drift broke this repo's own round 8 —
 * the events.ts regeneration — which is exactly the class of change
 * this operator surfaces as data instead of as a 3 AM analysis error.)
 */
object Profiling {

  /**
   * P104 — one-pass column profile: for each requested column,
   * (column, n_rows, n_null, n_distinct, min_v, max_v, mean_v) — the
   * numeric stats (rounded at 6; mean DECIMAL-summed, the zscore
   * discipline) are null for non-numeric columns, whose min/max/mean
   * are not engine-portable as strings. n_distinct counts non-null
   * values; nulls count separately.
   *
   * Shape: ALL columns' statistics compute in ONE distributed
   * aggregation pass (count/null-count/distinct/min/max/sum per column
   * in a single agg row); the reshape to one-row-per-column happens on
   * the driver over that single k-stat row — bytes, not data (the o3
   * scalar pattern). Exact countDistinct is the correctness choice at
   * gate scale; swap approx_count_distinct in at 100 TB, same shape.
   */
  def profileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileStats: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profileStats: columns not in input: ${missing.mkString(", ")}")
    val numeric = cols.map(c =>
      c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
      val num = if (numeric(c)) Seq(
        round(min(col(c)).cast("double"), 6).as(s"__mn_$c"),
        round(max(col(c)).cast("double"), 6).as(s"__mx_$c"),
        round(sum(col(c).cast("decimal(38,12)")).cast("double") /
          count(col(c)).cast("double"), 6).as(s"__mean_$c"))
      else Nil
      base ++ num
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def opt(row: Row, name: String): Option[Double] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    }
    val out = cols.map { c =>
      val (mn, mx, mean) =
        if (numeric(c))
          (opt(r, s"__mn_$c"), opt(r, s"__mx_$c"), opt(r, s"__mean_$c"))
        else (None, None, None)
      (c, r.getLong(r.fieldIndex(s"__n_$c")),
        r.getLong(r.fieldIndex(s"__nn_$c")),
        r.getLong(r.fieldIndex(s"__nd_$c")), mn, mx, mean)
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("column", "n_rows", "n_null", "n_distinct",
      "min_v", "max_v", "mean_v")
  }

  /**
   * P104 — drift report between two snapshots: [[profileStats]] of each
   * side joined per column with the alarm measures — null-rate delta,
   * cardinality ratio (b/a, null when a has none), mean shift (numeric
   * only). Two one-pass aggregations + a k-row join; thresholds belong
   * to the caller (alerting policy, not engine semantics).
   */
  def driftReport(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = profileStats(a, cols)
    val pb = profileStats(b, cols)
    val sel = Seq("n_rows", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
    val left = pa.select(col("column") +: sel.map(c => col(c).as(s"${c}_a")): _*)
    val right = pb.select(col("column") +: sel.map(c => col(c).as(s"${c}_b")): _*)
    val nullRate = (s: String) =>
      col(s"n_null_$s").cast("double") / col(s"n_rows_$s").cast("double")
    // both sides profile the SAME column list, so the key sets are equal
    // by construction — an inner join (broadcastable k-row frames, no
    // sort-merge) over a full-outer (which forces SMJ) loses nothing
    left.join(broadcast(right), Seq("column"))
      .withColumn("d_null_rate", round(abs(nullRate("a") - nullRate("b")), 6))
      .withColumn("r_distinct",
        when(col("n_distinct_a") > 0,
          round(col("n_distinct_b").cast("double") /
            col("n_distinct_a").cast("double"), 6)))
      .withColumn("d_mean", round(abs(col("mean_v_a") - col("mean_v_b")), 6))
  }

  /**
   * P189 — Population Stability Index between a reference and a current
   * segment of one frame: over fixed-width value bands,
   * PSI = Σ (p − q)·ln(p/q) with p/q the smoothed band shares — THE
   * model-monitoring drift score (industry reading: < 0.1 stable,
   * 0.1–0.25 moderate shift, > 0.25 shifted — emitted as `drift_flag`
   * on every row from the ROUNDED total). Laplace-smoothed shares
   * (count+1)/(total+B) over the B observed bands keep one-sided bands
   * finite without dropping them — an empty current band IS the drift.
   * Emits one row per band: (band, n_ref, n_cur, p_ref, p_cur, contrib,
   * psi, drift_flag). Rows where the segment or value is null drop.
   *
   * Shapes: ONE map-side-combinable (band, segment) count agg; totals
   * and B from one tiny agg broadcast back (the P125 scalar-row idiom);
   * the PSI total is a window over the band frame (bounded by the band
   * ladder, never rows — the o13 class). Cross-engine: counts are exact
   * BIGINTs, p/q identical double sequences on them, each ln rounds
   * at 9, contributions round at 9 and DECIMAL-sum (the libm firewall),
   * outputs round at 6.
   */
  def populationStability(df: DataFrame, segCol: String, valueCol: String,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0,
      s"populationStability: bandWidth must be > 0, got $bandWidth")
    val cells = df
      .where(col(segCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / bandWidth).cast("long").as("band"))
      .agg(
        sum(when(!col(segCol), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col(segCol), 1L).otherwise(0L)).as("n_cur"))
    val tot = cells.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__b"))
    val p = (col("n_ref") + 1).cast("double") /
      (col("__tr") + col("__b")).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("__tc") + col("__b")).cast("double")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    cells.join(broadcast(tot)) // 1-row scalar side
      .withColumn("p_ref", p)
      .withColumn("p_cur", q)
      .withColumn("__contrib",
        round((col("p_ref") - col("p_cur")) *
          round(log(col("p_ref") / col("p_cur")), 9), 9))
      .withColumn("psi",
        round(sum(col("__contrib").cast("decimal(28,9)")).over(wAll)
          .cast("double"), 6))
      .withColumn("drift_flag",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("shifted"))
      .select(col("band"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        round(col("__contrib"), 6).as("contrib"),
        col("psi"), col("drift_flag"))
  }

  /**
   * P207 — ingest-volume anomaly screen: per day, the row count against
   * the mean/sd of the `trailing` PRIOR days' counts, z-scored — the
   * "did yesterday's feed half-arrive (or double-arrive)" monitor that
   * P170's freshness check (staleness only) cannot see. Emits
   * (day, n_rows, n_prior, mean_prior, sd_prior, z, anomalous); the
   * first `trailing` days carry partial baselines (z only when the
   * window is FULL and has spread — a constant baseline z would be
   * ±∞).
   *
   * Shape: one daily count agg joined onto a CALENDAR SPINE
   * (sequence(min_day, max_day), missing days coalesce to 0 — a
   * FULLY-ABSENT day is the worst volume anomaly and a bare groupBy
   * would make it invisible while the trailing frame silently reached
   * past the gap; the o35 calendar-vs-row-lag rule), then ONE ordered
   * window over the day frame — bounded by the calendar, never rows
   * (the o13 agg-sized class). Cross-engine: counts and windowed
   * count/sum/sum-of-squares are exact BIGINTs (n² ≪ 2⁶² for any daily
   * volume), mean/sd/z are fixed double sequences on them rounded at 6,
   * `anomalous` reads the ROUNDED z.
   */
  def volumeAnomaly(df: DataFrame, tsCol: String, trailing: Int = 7,
      zBar: Double = 3.0): DataFrame = {
    require(trailing >= 2, s"volumeAnomaly: trailing must be >= 2, got $trailing")
    require(zBar > 0, s"volumeAnomaly: zBar must be > 0, got $zBar")
    val counted = df.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__n"))
    val spine = counted.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val daily = spine
      .join(counted.hint("shuffle_hash"), Seq("day"), "left")
      .withColumn("n_rows", coalesce(col("__n"), lit(0L)))
      .drop("__n")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day").asc)
      .rowsBetween(-trailing, -1)
    val cnt = count(col("n_rows")).over(w)
    val s = sum(col("n_rows")).over(w)
    val q = sum(col("n_rows") * col("n_rows")).over(w)
    val meanRaw = s.cast("double") / cnt.cast("double")
    val varRaw = greatest(
      q.cast("double") / cnt.cast("double") - meanRaw * meanRaw, lit(0.0))
    daily
      .withColumn("n_prior", cnt)
      .withColumn("__mean", meanRaw)
      .withColumn("__sd", sqrt(varRaw))
      .withColumn("mean_prior",
        when(col("n_prior") > 0, round(col("__mean"), 6)))
      .withColumn("sd_prior",
        when(col("n_prior") > 0, round(col("__sd"), 6)))
      .withColumn("z",
        when(col("n_prior") === trailing && col("__sd") > 0,
          round((col("n_rows").cast("double") - col("__mean")) /
            col("__sd"), 6)))
      .withColumn("anomalous",
        when(col("z").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z")) > zBar))
      .drop("__mean", "__sd")
  }

  /**
   * P195 — candidate-key audit: for each monitored column, one row of
   * (column, n_rows, n_nonnull, n_distinct, dup_rate, is_key) — the
   * primary-key discovery + uniqueness-contract check (dbt `unique`)
   * in ONE scan: is_key iff the column is non-null everywhere and every
   * value distinct. dup_rate = (n_nonnull − n_distinct)/n_nonnull over
   * the non-null rows (null-rate is P149's column_tests' job).
   *
   * Shape: a single agg computing count + per-column exact distincts
   * (Catalyst expands multi-distinct into one pass with an Expand —
   * bounded by the monitored-column count), unpivoted to rows by
   * stack() on the 1-row frame. Exact BIGINTs; rate rounds at 6.
   */
  def candidateKeys(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "candidateKeys: at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"candidateKeys: no such column '$c'"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', __nn_$c, __nd_$c").mkString(", ")
    one.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) " +
          "AS (column_name, n_nonnull, n_distinct)"))
      .withColumn("dup_rate",
        when(col("n_nonnull") > 0,
          round((col("n_nonnull") - col("n_distinct")).cast("double") /
            col("n_nonnull").cast("double"), 6)))
      .withColumn("is_key",
        col("n_nonnull") === col("n_rows") &&
          col("n_distinct") === col("n_rows"))
      .select("column_name", "n_rows", "n_nonnull", "n_distinct", "dup_rate",
        "is_key")
  }

  /**
   * P115 — key-skew diagnostics: for each monitored column, one row of
   * distribution-shape measures over its value frequencies — row count,
   * key cardinality, heaviest-key share, top-`topK` share, Gini
   * coefficient and Shannon entropy — the report that predicts which
   * join/groupBy keys will hot-spot a 1000-executor shuffle BEFORE the
   * job runs (the operational companion to the P21 salting operators).
   *
   * Shape: per column, ONE keyed frequency agg (map-side combinable),
   * then rank/total windows over the FREQUENCY frame — bounded by
   * distinct keys, not rows (the o5 caveat applies only to that frame).
   * Portability: Gini comes from the exact integer rank-weighted sum
   * (2·Σrᵢfᵢ)/(n·N) − (n+1)/n — tie order cannot move it because equal
   * frequencies commute inside the sum — and entropy terms −p·ln p
   * round at 9 and DECIMAL-sum (the libm firewall). Null keys coalesce
   * to '' (the hashValue convention) so both engines group them alike.
   */
  def keySkew(df: DataFrame, keyCols: Seq[String], topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "keySkew: at least one column")
    require(topK >= 1, s"keySkew: topK must be >= 1, got $topK")
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"keySkew: columns not in input: ${missing.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val perCol = keyCols.map { c =>
      val freq = df
        .select(coalesce(col(c).cast("string"), lit("")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("f"))
      val wAsc = Window.orderBy(col("f").asc, col("k").asc)
      val wDesc = Window.orderBy(col("f").desc, col("k").desc)
      val wAll = Window.partitionBy()
      val p = col("f").cast("double") / col("nn").cast("double")
      val stats = freq
        .withColumn("r", row_number().over(wAsc).cast("long"))
        .withColumn("rd", row_number().over(wDesc).cast("long"))
        .withColumn("nn", sum(col("f")).over(wAll))
        .agg(max(col("nn")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("f")).as("__max_f"),
          sum(when(col("rd") <= topK, col("f")).otherwise(lit(0L))).as("__top_f"),
          sum(col("r") * col("f")).as("__srf"),
          sum(round(-p * log(p), 9).cast("decimal(28,9)")).as("__ent"))
      val nk = col("n_keys").cast("double")
      val nr = col("n_rows").cast("double")
      stats.select(lit(c).as("column"), col("n_rows"), col("n_keys"),
        round(col("__max_f").cast("double") / nr, 6).as("max_share"),
        round(col("__top_f").cast("double") / nr, 6).as("top_share"),
        round(lit(2.0) * col("__srf").cast("double") / (nk * nr) -
          (col("n_keys") + lit(1L)).cast("double") / nk, 6).as("gini"),
        round(col("__ent").cast("double"), 6).as("entropy"))
    }
    perCol.reduce(_ unionByName _)
  }

  /**
   * P126 — declarative row-level expectations (deequ/dbt-test style):
   * evaluate a named list of boolean rules over a table in ONE fused
   * aggregation pass and report (rule, n_rows, n_violations, pass) per
   * rule — the generic data-quality gate an ingest pipeline runs before
   * promoting a batch (the domain-specific V1–V8 validation family,
   * generalized). A row violates a rule when the predicate is false OR
   * null (three-valued logic is strict here: an unevaluable rule is a
   * violation, the conservative reading).
   *
   * Shape: one aggregate computes every rule's violation count
   * map-side-combinably; the per-rule reshape is a projection of the
   * single 1-row frame (the corrMatrix explode pattern). Rules are
   * arbitrary Column predicates — range, regex, set membership,
   * cross-column — anything row-local.
   */
  def expectRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectRows: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"expectRows: rule names must be distinct, got ${rules.map(_._1)}")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"))
    }
    row.select(col("__n"), explode(array(structs: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__n").as("n_rows"),
        coalesce(col("__r.n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /**
   * P116 — snapshot change-data-capture diff: classify every key of two
   * table versions as added / removed / changed (with the list of
   * changed columns) — the incremental-ingest delta detector that turns
   * "re-read 100 TB" into "process the rows that moved", and the audit
   * trail behind the P106 incremental pipeline. Unchanged keys are NOT
   * emitted (the whole point is that the delta is small).
   *
   * Shape: ONE full-outer join on the key — hinted shuffle_hash (Spark
   * supports full-outer in shuffled-hash since 3.1; unhinted, two
   * no-stats snapshot sides fall to sort-merge, the d11 rule) — then a
   * pure projection. Change tests are null-safe (`<=>` negated), so a
   * value flipping to/from null counts as a change; `changed_cols`
   * joins the differing column names with ',' in declaration order.
   */
  def cdcDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "cdcDiff: at least one compare column")
    val o = oldDf.select(col(keyCol).as("__ko") +:
      compareCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(col(keyCol).as("__kn") +:
      compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val diffs = compareCols.map(c =>
      c -> !(col(s"__o_$c") <=> col(s"__n_$c")))
    val anyDiff = diffs.map(_._2).reduce(_ || _)
    val changeType = when(col("__kn").isNull, lit("removed"))
      .when(col("__ko").isNull, lit("added"))
      .when(anyDiff, lit("changed"))
      .otherwise(lit("unchanged"))
    val changedCols = concat_ws(",",
      diffs.map { case (c, d) => when(d, lit(c)) }: _*)
    o.join(n.hint("shuffle_hash"), col("__ko") === col("__kn"), "full_outer")
      .withColumn("change_type", changeType)
      .where(col("change_type") =!= "unchanged")
      .select(coalesce(col("__ko"), col("__kn")).as(keyCol),
        col("change_type"),
        when(col("change_type") === "changed", changedCols)
          .otherwise(lit("")).as("changed_cols"))
  }

  /**
   * P183 — dbt `accepted_values` as an engine operator: rows whose
   * column value falls outside the allowlist, with up to `sampleK`
   * distinct offending values (smallest first — deterministic) joined
   * into one report row: (n_rows, n_null, n_violations, violation_rate,
   * sample_values). Nulls are counted separately, never as violations
   * (the P149 convention — use the not_null test for those).
   *
   * One fused conditional agg + one tiny distinct-offender aggregate
   * (sort_array before the join keeps the sample order
   * plan-independent). Exact counts, one closing division.
   */
  def acceptedValues(df: DataFrame, colName: String, allowed: Seq[String],
      sampleK: Int = 5): DataFrame = {
    require(allowed.nonEmpty, "acceptedValues: allowlist must be non-empty")
    require(sampleK >= 1, s"acceptedValues: sampleK must be >= 1, got $sampleK")
    val v = col(colName).cast("string")
    val allowedArr = array(allowed.map(lit): _*)
    val bad = v.isNotNull && !array_contains(allowedArr, v)
    val stats = df.agg(count(lit(1)).as("n_rows"),
      sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
    val sample = df.where(bad).select(v.as("__bad")).distinct()
      .orderBy(col("__bad").asc).limit(sampleK)
      .agg(array_join(sort_array(collect_list(col("__bad"))), ",")
        .as("sample_values"))
    stats.join(broadcast(sample)) // 1-row scalar side
      .withColumn("violation_rate",
        round(col("n_violations").cast("double") /
          greatest(col("n_rows") - col("n_null"), lit(1L)).cast("double"), 6))
      .select("n_rows", "n_null", "n_violations", "violation_rate",
        "sample_values")
  }

  /**
   * P172 — freshness/staleness audit: per key (source, table, topic…),
   * row count, latest timestamp, and staleness = global-latest −
   * key-latest in whole seconds — the "is source X stuck?" monitor
   * that catches a dead ingest BEFORE a consumer joins three-day-old
   * data against today's. One keyed agg + a broadcast global-max row;
   * exact microsecond integers, integer-div to seconds.
   */
  def freshness(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val per = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), max(col(tsCol)).as("max_ts"))
    val g = per.agg(max(col("max_ts")).as("__gmax"))
    per.join(broadcast(g)) // 1-row scalar side
      .withColumn("staleness_s",
        expr("(unix_micros(__gmax) - unix_micros(max_ts)) div 1000000"))
      .drop("__gmax")
  }

  /**
   * P152 — per-column test battery (dbt's `not_null` + `unique` generics
   * as one report): for each column, `n_null` (not-null violations),
   * `n_distinct` (exact), and `dup_violations` = non-null − distinct
   * (0 ⇔ the column could be a key) — the first audit run against any
   * inbound table, and the `is_unique` evidence a join planner wants
   * before trusting a "key".
   *
   * Shapes: ONE fused aggregate computes every column's count +
   * countDistinct in a single pass (distincts expand per-column —
   * Spark's standard multi-distinct expansion, still one scan), then
   * the 1-row frame reshapes per column via an explode of struct
   * literals (the dq4 reshape idiom). All exact BIGINTs.
   */
  def columnTests(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnTests: at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"), count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = explode(array(cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (col(s"__nn_$c") - col(s"__nd_$c")).as("dup_violations"))
    }: _*))
    one.select(rows.as("r")).select("r.*")
      .withColumn("is_unique",
        col("n_null") === 0L && col("dup_violations") === 0L)
  }

  /**
   * P149 — referential-integrity audit (the dbt `relationships` test as
   * an engine operator): for each named (child.fk → parent.pk) relation,
   * one row of `n_child` / `n_nonnull` / `n_orphans` / `orphan_rate` —
   * run BEFORE a pipeline consumes a join, because a silently dangling
   * FK turns an inner join into a row-dropper and a left join into a
   * null-sprayer. Null FKs are counted separately, not as orphans (the
   * SQL convention: null never references).
   *
   * Shapes per relation: one child-side fused count agg + one left-anti
   * join against the DISTINCT parent key (shuffle_hash — parent key
   * sets scale with the dimension, broadcast only if the caller already
   * knows it's small) reduced to a count, cross-joined scalar rows.
   * Relations union into one report frame.
   */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "fkAudit: at least one relation")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val nonNull = child.where(col(childKey).isNotNull)
        .select(col(childKey).as("__fk"))
      val stats = child.agg(count(lit(1)).as("n_child"),
        count(col(childKey)).as("n_nonnull"))
      val orphans = nonNull
        .join(parent.select(col(parentKey).as("__fk")).distinct()
          .hint("shuffle_hash"), Seq("__fk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      stats.join(orphans) // two 1-row frames
        .select(lit(name).as("relation"), col("n_child"), col("n_nonnull"),
          col("n_orphans"),
          round(col("n_orphans").cast("double") /
            greatest(col("n_nonnull"), lit(1L)).cast("double"), 6)
            .as("orphan_rate"))
    }.reduce(_.unionByName(_))
  }

  /**
   * P217 — parent/child total reconciliation: for every parent row,
   * compare its stored amount against the sum of its children's
   * amounts, then report per segment how many parents have NO children,
   * how many reconcile within `tol`, and the shape of the discrepancy
   * (median signed diff, max |diff|) — the classic ledger/rollup audit
   * ("does o_totalprice actually equal the lineitem recompute?"); on
   * this corpus it reports a real finding: the synthetic totals never
   * match the TPC-H charge formula. Emits (group, n_parents, n_missing,
   * n_within_tol, p50_diff, max_abs_diff).
   *
   * `childAmountCol` must be an exact DECIMAL whose per-parent sum fits
   * DECIMAL(18,6) — the caller builds the recompute formula in decimal
   * (never double: partition-order sums) before passing the frame in.
   *
   * Shapes: one keyed child sum (map-side combinable), one LEFT
   * shuffle-hash join on the parent key, one fused per-group agg.
   * Cross-engine: diffs are exact DECIMAL(19,6) differences; the median
   * reads the diff doubles at 4 (the o5 percentile rule), the max reads
   * an exact decimal cast at 6.
   */
  def reconcileTotals(parent: DataFrame, parentKeyCol: String,
      amountCol: String, groupCol: String, child: DataFrame,
      childKeyCol: String, childAmountCol: String,
      tol: Double = 0.01): DataFrame = {
    require(tol >= 0, s"reconcileTotals: tol must be >= 0, got $tol")
    val told = lit(new java.math.BigDecimal(tol)
      .setScale(6, java.math.RoundingMode.HALF_UP))
    val csums = child.where(col(childKeyCol).isNotNull)
      .groupBy(col(childKeyCol).as("__ck"))
      .agg(sum(col(childAmountCol)).cast("decimal(18,6)").as("__csum"))
    val diff = col(amountCol).cast("decimal(18,6)") - col("__csum")
    parent.where(col(groupCol).isNotNull)
      .join(csums.hint("shuffle_hash"),
        col(parentKeyCol) === col("__ck"), "left")
      .withColumn("__diff", diff)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_parents"),
        sum(when(col("__csum").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(abs(col("__diff")) <= told, 1L).otherwise(0L))
          .as("n_within_tol"),
        round(expr("percentile(CAST(__diff AS DOUBLE), 0.5)"), 4)
          .as("p50_diff"),
        round(max(abs(col("__diff"))).cast("double"), 6).as("max_abs_diff"))
  }

  /**
   * P243 — join fan-out audit: for every parent key, how many child
   * rows it matches, banded into the distribution a join planner and a
   * DQ gate both care about (0 = orphan parent, 1 = clean 1:1, 11+ =
   * the multiplier that silently explodes a downstream join) — run
   * BEFORE shipping any parent⋈child pipeline: the "join blew up to
   * 40× rows" incident is this table unread. Emits per band (band_id,
   * band, n_parents, n_children, share_parents), bands fixed at
   * 0 / 1 / 2–5 / 6–10 / 11+.
   *
   * Shapes: one child count agg, one LEFT shuffle-hash join on the
   * parent key, one band agg + a 1-row total broadcast. Exact BIGINTs
   * and one rounded share.
   */
  def joinFanout(parent: DataFrame, parentKeyCol: String, child: DataFrame,
      childKeyCol: String): DataFrame = {
    val cc = child.where(col(childKeyCol).isNotNull)
      .groupBy(col(childKeyCol).as("__ck"))
      .agg(count(lit(1)).as("__cn"))
    val banded = parent.where(col(parentKeyCol).isNotNull)
      .join(cc.hint("shuffle_hash"), col(parentKeyCol) === col("__ck"),
        "left")
      .withColumn("__n", coalesce(col("__cn"), lit(0L)))
      .withColumn("band_id",
        when(col("__n") === 0, 0).when(col("__n") === 1, 1)
          .when(col("__n") <= 5, 2).when(col("__n") <= 10, 3)
          .otherwise(4))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_parents"), sum(col("__n")).as("n_children"))
    val total = banded.agg(sum(col("n_parents")).as("__t"))
    banded.join(broadcast(total)) // 1-row scalar side
      .withColumn("band",
        when(col("band_id") === 0, "0").when(col("band_id") === 1, "1")
          .when(col("band_id") === 2, "2-5")
          .when(col("band_id") === 3, "6-10").otherwise("11+"))
      .withColumn("share_parents",
        round(col("n_parents").cast("double") / col("__t").cast("double"),
          6))
      .select(col("band_id"), col("band"), col("n_parents"),
        col("n_children"), col("share_parents"))
  }

  /**
   * P268 — functional-dependency violation audit: for each candidate
   * FD A → B, the g3 repair measure — the minimum number of rows to
   * delete so the dependency holds, Σ_groups(A) (rows_in_group −
   * max_B rows_with_that_B) — plus the violating-group count and rate.
   * The schema-discovery complement to P128's candidateKeys: keys say
   * "A identifies the row", FDs say "A determines B" (the dimension
   * worth normalizing out, the column safe to drop from a feature set,
   * the denormalization bug when violations > 0 on a contract that
   * promised 0). Emits per FD (fd, n_rows, n_groups, n_violating_groups,
   * n_violations, violation_rate, holds), ordered by fd.
   *
   * Shape: per FD, two keyed aggregations — groupBy(A, B) then
   * groupBy(A) — both partition-parallel on the determinant hash; the
   * per-FD results union over a handful of audited pairs (a k-sized
   * frame). Null determinant/dependent rows drop (SQL FD semantics
   * grade nulls separately — they are the dq6 null-contract's job).
   * Cross-engine: all counts exact BIGINTs; one closing double
   * division rounded at 6.
   */
  def fdViolations(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdViolations: need at least one (A, B) pair")
    require(pairs.forall { case (a, b) => a != b },
      s"fdViolations: degenerate pair(s) ${pairs.filter(p => p._1 == p._2)}")
    val per = pairs.map { case (a, b) =>
      df.where(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__a"))
        .agg(sum(col("__n")).as("__g"), max(col("__n")).as("__m"))
        .agg(coalesce(sum(col("__g")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("__g") > col("__m"), 1L).otherwise(0L)),
            lit(0L)).as("n_violating_groups"),
          coalesce(sum(col("__g") - col("__m")), lit(0L)).as("n_violations"))
        .select(lit(s"$a->$b").as("fd"), col("n_rows"), col("n_groups"),
          col("n_violating_groups"), col("n_violations"))
    }
    per.reduce(_ unionByName _)
      .withColumn("violation_rate",
        when(col("n_rows") > 0,
          round(col("n_violations").cast("double") /
            col("n_rows").cast("double"), 6)))
      .withColumn("holds", col("n_violations") === 0L)
      .orderBy(col("fd"))
  }

  /**
   * P272 — Hellinger drift between two snapshots' categorical mixes:
   * H = √(Σ(√p − √q)² / 2) ∈ [0, 1] plus the Bhattacharyya coefficient
   * BC = Σ√(pq) — the bounded, symmetric drift distance to read beside
   * P189's PSI (PSI explodes on vanishing bins; H stays finite, so it
   * is the alarm threshold you can actually fix). A category absent
   * from one side contributes its full mass (√p − 0)² — no epsilon
   * flooring. Emits ONE row (n_categories, n_a, n_b, bc, hellinger);
   * an empty side nulls both statistics.
   *
   * Shape: the two sides union with a side tag into ONE keyed
   * aggregation (no join at all — the dq1 full-outer SMJ trap never
   * opens), then a 1-row totals broadcast. Cross-engine: counts exact;
   * shares are 9-rounded doubles; √ is IEEE-exact on identical
   * operands; the per-category terms are 9-rounded and
   * DECIMAL(28,9)-summed; closing round at 6.
   */
  def hellingerDrift(a: DataFrame, b: DataFrame,
      catCol: String): DataFrame = {
    val u = a.where(col(catCol).isNotNull)
      .select(col(catCol).as("__c"), lit(1L).as("__ia"))
      .unionByName(b.where(col(catCol).isNotNull)
        .select(col(catCol).as("__c"), lit(0L).as("__ia")))
    val perCat = u.groupBy(col("__c"))
      .agg(sum(col("__ia")).as("__na"),
        sum(lit(1L) - col("__ia")).as("__nb"))
    val totals = perCat.agg(sum(col("__na")).as("__ta"),
      sum(col("__nb")).as("__tb"))
    val p = when(col("__ta") > 0,
      round(col("__na").cast("double") / col("__ta").cast("double"), 9))
    val q = when(col("__tb") > 0,
      round(col("__nb").cast("double") / col("__tb").cast("double"), 9))
    val terms = perCat.crossJoin(broadcast(totals)) // 1-row scalar side
      .select(col("__ta"), col("__tb"),
        round((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 9)
          .cast("decimal(28,9)").as("__h2"),
        round(sqrt(p) * sqrt(q), 9).cast("decimal(28,9)").as("__bc"))
    terms.groupBy(col("__ta"), col("__tb"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__h2")).as("__s"), sum(col("__bc")).as("__b"))
      .select(col("n_categories"), col("__ta").as("n_a"),
        col("__tb").as("n_b"),
        round(col("__b").cast("double"), 6).as("bc"),
        round(sqrt(col("__s").cast("double") / lit(2.0)), 6).as("hellinger"))
  }

  /**
   * P321 — null-pattern profile: group rows by their presence BITMASK
   * over `cols` ('1' = present, position = column order) and count —
   * the missingness-STRUCTURE read a per-column null rate hides
   * (co-missing columns = one upstream failure; a non-monotone pattern
   * in a sequential pipeline = a data bug). Emits per pattern:
   * pattern, n_rows, share.
   *
   * Shape: one map-side-combinable agg over ≤ 2^k patterns + a 1-row
   * broadcast total. Cross-engine: counts exact; share one double
   * division rounded at 6.
   */
  def nullPatternProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 16,
      s"nullPatternProfile: need 1..16 columns, got ${cols.size}")
    val pat = concat(cols.map(c =>
      when(col(c).isNotNull, lit("1")).otherwise(lit("0"))): _*)
    val t = df.agg(count(lit(1)).as("__t"))
    df.select(pat.as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(t)) // 1-row scalar side
      .select(col("pattern"), col("n_rows"),
        round(col("n_rows").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
      .orderBy("pattern")
  }

  /**
   * P386 — category-churn audit between two snapshots: per column, the
   * distinct-VALUE set difference — how many categories appeared, how
   * many vanished, and the set Jaccard. The DISCRETE companion to dq1
   * (moments/null drift) and dq9 (distribution shift on bands): a new
   * enum value or a vanished partner id is a SCHEMA-level event those
   * continuous reads smear into "distribution moved a little", and it
   * is usually the one that breaks downstream dimension joins. Emits
   * one row per column: (column, n_a, n_b, n_new, n_vanished,
   * set_jaccard) with |A∩B| = n_a − vanished, |A∪B| = n_a + new.
   *
   * Shape: per column, two distinct projections + two left-anti joins
   * + four 1-row count folds cross-joined — value-set-sized, never
   * row-sized. Values compare as strings (cross-type-safe); counts
   * exact; the Jaccard one division rounded at 6.
   */
  def categoryChurn(a: DataFrame, b: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "categoryChurn: no columns")
    require(cols.distinct.size == cols.size,
      "categoryChurn: duplicate columns")
    val rows = cols.map { c =>
      val av = a.where(col(c).isNotNull)
        .select(col(c).cast("string").as("v")).distinct()
      val bv = b.where(col(c).isNotNull)
        .select(col(c).cast("string").as("v")).distinct()
      val na = av.agg(count(lit(1)).as("n_a"))
      val nb = bv.agg(count(lit(1)).as("n_b"))
      val nw = bv.join(av, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_new"))
      val vn = av.join(bv, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_vanished"))
      // "col_name", not "column" — a bare `column` reference is a
      // keyword hazard in the oracle dialect (the z11 OVERLAPS lesson)
      na.crossJoin(nb).crossJoin(nw).crossJoin(vn) // four 1-row frames
        .select(lit(c).as("col_name"), col("n_a"), col("n_b"),
          col("n_new"), col("n_vanished"),
          when(col("n_a") + col("n_new") > 0,
            round((col("n_a") - col("n_vanished")).cast("double") /
              (col("n_a") + col("n_new")).cast("double"), 6))
            .as("set_jaccard"))
    }
    rows.reduce(_ unionAll _)
  }

  /**
   * P378 — cross-field date-order audit: per group, how often does the
   * `endCol` date precede the `startCol` date it must follow, plus the
   * span distribution (min/mean/max days)? The CROSS-COLUMN consistency
   * gate per-column profiling (dq1/dq6) cannot express — a ship date
   * and an order date can each be individually valid while their PAIR
   * is impossible; on this corpus the read is a real finding (ship
   * dates are generated independently of order dates — ~20% of spans
   * are negative, the q29 lesson surfaced as a first-class audit).
   * Emits (group, n_rows, n_violations, violation_rate, min_span_days,
   * mean_span_days, max_span_days).
   *
   * Shape: ONE keyed map-side-combinable agg over the joined frame the
   * caller provides. Cross-engine: spans are exact integer day diffs
   * (datediff on DATE casts ↔ DATE subtraction), sums exact BIGINTs,
   * the two ratios single divisions rounded at 6.
   */
  def dateOrderAudit(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val span = datediff(col(endCol).cast("date"), col(startCol).cast("date"))
      .cast("long")
    df.where(col(groupCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull)
      .select(col(groupCol), span.as("__span"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__span") < 0, 1L).otherwise(0L)).as("n_violations"),
        min(col("__span")).as("min_span_days"),
        max(col("__span")).as("max_span_days"),
        sum(col("__span")).as("__sum"))
      .select(col(groupCol), col("n_rows"), col("n_violations"),
        round(col("n_violations").cast("double") /
          col("n_rows").cast("double"), 6).as("violation_rate"),
        col("min_span_days"),
        round(col("__sum").cast("double") / col("n_rows").cast("double"), 6)
          .as("mean_span_days"),
        col("max_span_days"))
  }
}
