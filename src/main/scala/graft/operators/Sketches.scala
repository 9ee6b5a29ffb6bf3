package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The rows-way (r, bucket) cell expansion every CMS entry point shares
    * — ONE definition so sketch build, point estimates, and the streaming
    * variant can never drift apart in salt composition or struct shape
    * (the cells must stay bit-identical across all three AND the SQL
    * oracles). */
  private def cmsCells(itemCol: Column, rows: Int, width: Int,
      salt: String): Column = {
    require(rows >= 1, s"count-min sketch: rows must be >= 1, got $rows")
    require(width >= 1, s"count-min sketch: width must be >= 1, got $width")
    explode(array((0 until rows).map { r =>
      struct(lit(r).as("r"),
        Sampling.hashBucket(itemCol, width, s"$salt$r:").as("bucket"))
    }: _*))
  }

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
      salt: String = "cms"): DataFrame =
    items
      .select(cmsCells(col(itemCol), rows, width, salt).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /**
   * P49 — point estimates from a count-min sketch: for each probe item,
   * est = min over hash rows of its cell count (the classic CM upper
   * bound: never below the true count, above it only when every row
   * collides). The sketch side is ≤ rows·width cells — broadcast when
   * that bound is small (the design point), left to the planner when a
   * caller configures a sketch too large to pin on every executor.
   */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
      rows: Int, width: Int, salt: String = "cms"): DataFrame = {
    // force-broadcast only sketches clearly inside Spark's default 10 MB
    // broadcast budget (2^18 cells ≈ 6 MB of (int, long, long) rows);
    // larger caller-configured sketches fall back to the planner, which
    // still broadcasts when its own threshold allows
    val sketchSide =
      if (rows.toLong * width <= (1L << 18)) broadcast(sketch) else sketch
    probes
      .select(col(itemCol).as("item"),
        cmsCells(col(itemCol), rows, width, salt).as("cell"))
      .select(col("item"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(sketchSide, Seq("r", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }

  /**
   * P58 — streaming count-min sketch: the batch [[countMinSketch]] cells
   * per tumbling event-time window, over an unbounded stream. Plain
   * windowed aggregation — no custom state — so Spark's incremental
   * aggregation maintains the cells and the watermark expires them:
   * state is O(windows-in-watermark · rows · width), a CONSTANT per
   * window regardless of stream rate, which is the entire point of
   * sketching a stream. Cells are the same portable-MD5 buckets as the
   * batch sketch, so a window's cells equal the batch sketch of that
   * window's events — replayable by any engine.
   */
  def streamingCountMin(stream: DataFrame, tsCol: String, itemCol: String,
      rows: Int, width: Int, windowLen: String = "1 hour",
      watermark: String = "2 hours", salt: String = "cms"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), cmsCells(col(itemCol), rows, width, salt).as("cell"))
      .groupBy(window(col(tsCol), windowLen),
        col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("r"),
        col("bucket"), col("n"))

  /**
   * P293 — CMS join-size estimation: |A ⋈ B| on a key is estimated
   * from two count-min sketches as min over hash rows of the cell-wise
   * inner product Σ_b A[r][b]·B[r][b] — the AQE-style cardinality
   * estimate a planner reads from sketch-sized state instead of
   * shuffling either side (never an underestimate: colliding keys only
   * add mass). Emits ONE row (rows, width, est_join, exact_join,
   * rel_err); rel_err = (est − exact)/exact, ≥ 0 by construction.
   *
   * Shape: two [[countMinSketch]] cell aggs (bounded by rows·width),
   * one (r, bucket)-keyed equi-join of the two sketch frames, one
   * rows-sized min; the exact audit is a keyed count-join (the thing
   * the sketch path avoids at scale). All counts/products exact
   * BIGINTs; one closing double division rounded at 6.
   */
  def cmsJoinSize(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      rows: Int, width: Int, salt: String = "cmsj"): DataFrame = {
    val sa = countMinSketch(a.where(col(aCol).isNotNull), aCol, rows,
      width, salt).withColumnRenamed("n", "__na")
    val sb = countMinSketch(b.where(col(bCol).isNotNull), bCol, rows,
      width, salt).withColumnRenamed("n", "__nb")
    val prod = sa.join(sb.hint("shuffle_hash"), Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("__na") * col("__nb")).as("__rowEst"))
    // densify over the row spine: a hash row with ZERO colliding buckets
    // means the estimate is 0, not "skip this row in the min"
    val rIdx = a.sparkSession.range(rows.toLong)
      .select(col("id").cast("int").as("r"))
    val est = rIdx.join(prod.hint("shuffle_hash"), Seq("r"), "left")
      .agg(min(coalesce(col("__rowEst"), lit(0L))).as("est_join"))
    val ca = a.where(col(aCol).isNotNull).groupBy(col(aCol).as("__key"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.where(col(bCol).isNotNull).groupBy(col(bCol).as("__key"))
      .agg(count(lit(1)).as("__cb"))
    val exact = ca.join(cb.hint("shuffle_hash"), Seq("__key"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
        .as("exact_join"))
    est.crossJoin(broadcast(exact)) // 1-row scalar side
      .select(lit(rows).as("rows"), lit(width).as("width"),
        coalesce(col("est_join"), lit(0L)).as("est_join"),
        col("exact_join"),
        when(col("exact_join") > 0,
          round((coalesce(col("est_join"), lit(0L)) - col("exact_join"))
            .cast("double") / col("exact_join").cast("double"), 6))
          .as("rel_err"))
  }

  /** The (register, max rank) cells of an HLL — ONE definition shared by
    * the batch estimate and the streaming variant, so their sketches can
    * never drift: low p bits of the portable 56-bit hash route to a
    * register, the quotient's leading-zero rank is the register value. */
  private def hllRegisters(items: DataFrame, itemCol: String,
      group: Seq[Column], p: Int, salt: String): DataFrame = {
    val m = 1 << p
    val maxRank = 56 - p + 1
    val h = Sampling.hashValue(col(itemCol), salt)
    val w = shiftright(h, p)
    val rank = when(w === 0L, lit(maxRank))
      .otherwise(lit(maxRank) - length(bin(w)))
    items
      .select(group :+ h.bitwiseAND(lit((m - 1).toLong)).as("register")
        :+ rank.as("rank"): _*)
      .groupBy(group :+ col("register"): _*)
      .agg(max(col("rank")).as("mj"))
  }

  /**
   * P63 — streaming HyperLogLog registers per tumbling event-time window:
   * [[hllRegisters]] maintained by plain incremental aggregation (max is
   * an incremental-friendly monoid), watermark-expired — state is
   * O(windows-in-watermark · 2^p), constant per window regardless of
   * stream rate. A window's registers equal the batch registers of
   * exactly that window's events (spec-pinned), so the batch estimator
   * finishes any window's cells offline.
   */
  def streamingHllRegisters(stream: DataFrame, tsCol: String, itemCol: String,
      p: Int = 6, windowLen: String = "1 hour", watermark: String = "2 hours",
      salt: String = "hll:"): DataFrame = {
    require(p >= 4 && p <= 16,
      s"streamingHllRegisters: p must be in [4, 16], got $p")
    // the window struct is projected FIRST so the shared register helper
    // can group by it as a plain column (its own select drops tsCol)
    val windowed = stream.withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowLen).as("__w"), col(itemCol))
    hllRegisters(windowed, itemCol, Seq(col("__w")), p, salt)
      .select(col("__w.start").as("window_start"),
        col("register"), col("mj"))
  }

  /** Flajolet et al.'s bias constant α_m for an m-register HLL.
    * private[graft]: the sk17 oracle generator embeds the IDENTICAL
    * driver-computed constant (the o12 literal-ladder rule). */
  private[graft] def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /**
   * P51 — HyperLogLog distinct estimate per group: 2^p registers, each
   * holding the max leading-zero rank of the 56-bit portable hash routed
   * to it (low p bits = register, high bits = rank source). Two keyed
   * shuffles, BOTH bounded by the sketch, not the data: the (group,
   * register) combine emits ≤ 2^p cells per group per partition, and the
   * final fold sums the register terms as exact powers-of-two LONGS
   * (Σ 2^(maxRank−M_j) ≤ 2^58) so the harmonic mean is order-independent
   * — the float sum a naive port would use is partition-order-dependent
   * and would break replay. Small-range linear counting (E ≤ 2.5m with
   * empty registers) matches the published estimator. Returns groupCols
   * + `hll_est` (double, unrounded).
   */
  def hllDistinct(items: DataFrame, itemCol: String, groupCols: Seq[String],
      p: Int = 6, salt: String = "hll:"): DataFrame = {
    require(p >= 4 && p <= 16, s"hllDistinct: p must be in [4, 16], got $p")
    val internal = Set("register", "rank", "mj", "s_present", "n_regs",
      "s", "v", "hll_est")
    val clash = groupCols.filter(internal)
    require(clash.isEmpty,
      s"hllDistinct: group column(s) ${clash.mkString(", ")} collide with " +
        "internal names — rename them first")
    val m = 1 << p
    val maxRank = 56 - p + 1 // w has 56-p bits; all-zero w ranks maxRank
    val group = groupCols.map(col)
    // register term 2^(maxRank−M_j) as an exact long (pow of 2 is exact in
    // double, and the cast is safe: maxRank ≤ 53); empty registers — never
    // shuffled — contribute 2^maxRank each, added from the present-count
    val registers = hllRegisters(items, itemCol, group, p, salt)
    hllClose(registers, group, p)
  }

  /**
   * P345 — HLL register-budget error sweep: the SAME item column
   * sketched at several precisions p (m = 2^p registers), each estimate
   * beside the exact distinct count and its signed relative error — the
   * d21/sk12 lesson applied to cardinality sketches: 1.04/√m is an
   * asymptotic promise, and the register budget that meets an error
   * target on THIS id distribution is a measured table, not a formula
   * (pick the 100 TB sketch size from the table, not the textbook).
   * Emits per p: (p, m, hll_est, n_exact, rel_err), estimates at the
   * sk2 3-decimal convention, rel_err at 6.
   *
   * Shapes: one register agg + closing per p ([[hllDistinct]], sketch-
   * bounded), the exact count ONE countDistinct shared across the
   * ladder as a 1-row broadcast; a |ps|-row union. SAMPLE/ID-SIZED
   * exact side by design — the audit needs the truth, which is the
   * point (the d18 contract).
   */
  def hllErrorSweep(items: DataFrame, itemCol: String, ps: Seq[Int],
      salt: String = "hll:"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 4 && p <= 16),
      s"hllErrorSweep: every p must be in [4, 16], got $ps")
    require(ps.distinct.size == ps.size, s"hllErrorSweep: duplicate p in $ps")
    val clean = items.where(col(itemCol).isNotNull)
    val exact = clean.agg(countDistinct(col(itemCol)).as("n_exact"))
    ps.sorted.map { p =>
      hllDistinct(clean, itemCol, Seq.empty, p, salt)
        .select(lit(p).as("p"), lit((1 << p).toLong).as("m"),
          round(col("hll_est"), 3).as("hll_est"))
        .crossJoin(broadcast(exact)) // 1-row scalar side
        .withColumn("rel_err",
          when(col("n_exact") > 0,
            round((col("hll_est") - col("n_exact").cast("double")) /
              col("n_exact").cast("double"), 6)))
    }.reduce(_.unionByName(_))
  }

  /** The ONE register→estimate closing (linear-counting gate + raw
    * harmonic estimate) shared by [[hllDistinct]] and [[hllUnion]] —
    * the sketch algebra is only sound if merged registers close with
    * the IDENTICAL arithmetic the per-set estimates used. */
  private def hllClose(registers: DataFrame, group: Seq[Column],
      p: Int): DataFrame = {
    val m = 1 << p
    val maxRank = 56 - p + 1
    val scaleTerm = math.pow(2.0, maxRank).toLong
    val numerator = hllAlpha(m) * (m.toLong * m).toDouble * scaleTerm.toDouble
    val est = registers
      .groupBy(group: _*)
      .agg(
        sum(pow(lit(2.0), lit(maxRank) - col("mj")).cast("long")).as("s_present"),
        count(lit(1)).as("n_regs"))
      .withColumn("s", col("s_present") + (lit(m.toLong) - col("n_regs")) * lit(scaleTerm))
      .withColumn("v", lit(m.toLong) - col("n_regs"))
    val raw: Column = lit(numerator) / col("s")
    est.select(group :+
      when(col("v") > 0L && raw <= lit(2.5 * m),
        lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(raw).as("hll_est"): _*)
  }

  /**
   * P256 — HLL set-union merge: per-set registers over ONE shared hash,
   * the union sketch as the register-wise MAX, and all three estimates
   * through the IDENTICAL closing — the mergeability property that
   * makes HLL the 1000-executor distinct counter demonstrated and
   * audited (max-merge is exactly what tree-aggregating partial
   * sketches does), with the exact counts beside (the sk2 audit
   * convention). Emits ONE row (p, est_a, est_b, est_union, n_a_exact,
   * n_b_exact, n_union_exact); estimates round at 3 (the sk2
   * ulp-absorption level — the small-range branch holds one ln call).
   *
   * Shapes: one register agg keyed by (tag, register), the union a
   * register-keyed max over the TWO-tag register frame (sketch-sized),
   * closings and exact audits as 1-row broadcast joins.
   */
  def hllUnion(items: DataFrame, itemCol: String, tagCol: String,
      tagA: String, tagB: String, p: Int = 6,
      salt: String = "hllu:"): DataFrame =
    hllTwoSetFrame(items, itemCol, tagCol, tagA, tagB, p, salt)
      .select(col("p"), col("est_a"), col("est_b"), col("est_union"),
        col("n_a_exact"), col("n_b_exact"), col("n_union_exact"))

  /** The shared two-set sketch core behind [[hllUnion]] and
    * [[hllIntersect]]: per-tag registers over ONE hash, the union as
    * the register-wise MAX, the identical closing for all three
    * estimates, and the exact three-way audit — ONE definition so the
    * two query surfaces cannot drift. */
  private def hllTwoSetFrame(items: DataFrame, itemCol: String,
      tagCol: String, tagA: String, tagB: String, p: Int,
      salt: String): DataFrame = {
    require(p >= 4 && p <= 16,
      s"hllUnion/hllIntersect: p must be in [4, 16], got $p")
    require(tagA != tagB, "hllUnion/hllIntersect: tags must differ")
    val t = col(tagCol).cast("string")
    val base = items
      .where(col(itemCol).isNotNull && (t === tagA || t === tagB))
      .select(when(t === tagA, lit("a")).otherwise(lit("b")).as("__t"),
        col(itemCol).cast("string").as("__it"))
    val regs = hllRegisters(base, "__it", Seq(col("__t")), p, salt)
      .select(col("__t"), col("register"), col("mj"))
    val union = regs.groupBy(col("register")).agg(max(col("mj")).as("mj"))
      .select(lit("u").as("__t"), col("register"), col("mj"))
    val ests = hllClose(regs.unionByName(union), Seq(col("__t")), p)
    def one(tag: String, out: String) = ests.where(col("__t") === tag)
      .select(round(col("hll_est"), 3).as(out))
    val exact = base.groupBy(col("__it"))
      .agg(max(when(col("__t") === "a", 1L).otherwise(0L)).as("__ia"),
        max(when(col("__t") === "b", 1L).otherwise(0L)).as("__ib"))
      .agg(sum(col("__ia")).as("n_a_exact"), sum(col("__ib")).as("n_b_exact"),
        count(lit(1)).as("n_union_exact"),
        sum(col("__ia") * col("__ib")).as("n_intersect_exact"))
    one("a", "est_a").join(one("b", "est_b")).join(one("u", "est_union"))
      .join(broadcast(exact)) // four 1-row frames
      .select(lit(p).as("p"), col("est_a"), col("est_b"), col("est_union"),
        col("n_a_exact"), col("n_b_exact"), col("n_union_exact"),
        col("n_intersect_exact"))
  }

  /**
   * P288 — HLL set-intersection estimate by inclusion–exclusion:
   * est(A∩B) = est(A) + est(B) − est(A∪B) over the [[hllUnion]]
   * sketches — the overlap readout ("how many click users also
   * purchase") from sketches that MERGE, where exact distinct-pair
   * counting needs a full shuffle of both sides. The error grows with
   * |A∪B|/|A∩B| (inclusion–exclusion subtracts two big numbers — the
   * documented caveat; KMV is the sketch with a native intersection
   * when that ratio explodes). Emits ONE row (p, est_a, est_b,
   * est_union, est_intersect, n_intersect_exact).
   *
   * Shape/portability: identical to [[hllUnion]] (shared core); the
   * intersect estimate is one fixed double sequence over the three
   * 3-rounded estimates, rounded at 3.
   */
  def hllIntersect(items: DataFrame, itemCol: String, tagCol: String,
      tagA: String, tagB: String, p: Int = 6,
      salt: String = "hllu:"): DataFrame =
    hllTwoSetFrame(items, itemCol, tagCol, tagA, tagB, p, salt)
      .select(col("p"), col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 3)
          .as("est_intersect"),
        col("n_intersect_exact"))

  /**
   * P114 — KMV (k minimum values, "bottom-k") distinct-count sketch per
   * group: hash every item with the portable 56-bit MD5, keep each
   * group's k smallest DISTINCT hashes, and estimate distinct counts as
   * (k−1)·2⁵⁶/h₍ₖ₎ — the classic order-statistics estimator, and (unlike
   * HLL) a sketch whose state supports set-INTERSECTION estimates too.
   * Groups with fewer than k distinct hashes report them exactly.
   * Returns (group, n_exact, n_hashes, kmv_estimate) with the exact
   * count beside the estimate (the sk2 audit convention).
   *
   * Shapes: one distinct on (group, hash) — hash collisions between
   * distinct items merge, exactly as the estimator assumes — then a
   * per-group bottom-k (window over the DISTINCT-hash frame; at 100 TB
   * per-group distinct counts swap in a bottom-k typed aggregate, same
   * output) and one keyed agg; the exact side is one countDistinct,
   * joined with the shuffle_hash hint (post-agg no-stats rule).
   * Portability: hashes are data-determined integers, the k-th minimum
   * is exact, and the estimate is ONE double division on identical
   * operands with the scale numerator embedded as a shared literal.
   */
  def kmvDistinct(items: DataFrame, itemCol: String, groupCols: Seq[String],
      k: Int, salt: String = "kmv:"): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val group = groupCols.map(col)
    val nonNull = items.where(col(itemCol).isNotNull)
    val hashes = nonNull
      .select(group :+ Sampling.hashValue(col(itemCol), salt).as("__h"): _*)
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group: _*).orderBy(col("__h").asc)
    val sketch = hashes
      .withColumn("__r", row_number().over(w))
      .groupBy(group: _*)
      .agg(count(lit(1)).as("n_hashes"),
        max(when(col("__r") === k, col("__h"))).as("__hk"))
    val exact = nonNull.groupBy(group: _*)
      .agg(countDistinct(col(itemCol)).as("n_exact"))
    val est = when(col("n_hashes") < k, col("n_hashes").cast("double"))
      .otherwise(lit(kmvScale(k)) / col("__hk").cast("double"))
    exact.join(sketch.hint("shuffle_hash"), groupCols)
      .withColumn("kmv_estimate", round(est, 6))
      .drop("__hk")
  }

  /**
   * P254 — count-min error curve: at each sketch width, the measured
   * overestimate (est − true, never negative — the CM guarantee) across
   * every distinct item, beside the classical e·N/w bound — the sizing
   * table for P49's sketch ("256 buckets overestimates hot tokens by
   * ~40 on this stream; 1024 is exact") measured instead of assumed,
   * the P247 discipline applied to the other sketch family. Emits per
   * width (width, n_items, n_over, mean_err, max_err, bound).
   *
   * Shapes: per width one bounded row-expansion agg (the sketch), a
   * probe join on (r, bucket) — both sides sketch/vocab-sized — and a
   * min-over-rows agg; the ladder unions. Cross-engine: counts exact
   * BIGINTs (the estimate is a min of exact cell counts), the bound
   * one double product with the shared Euler literal, rounded at 6.
   */
  def cmsErrorCurve(items: DataFrame, itemCol: String, rows: Int,
      widths: Seq[Int], salt: String = "cmsw"): DataFrame = {
    require(rows >= 1 && rows <= 8,
      s"cmsErrorCurve: rows must be in 1..8, got $rows")
    require(widths.nonEmpty && widths.forall(_ >= 2),
      s"cmsErrorCurve: widths must be >= 2, got $widths")
    require(widths.distinct.size == widths.size,
      s"cmsErrorCurve: duplicate widths in $widths")
    val base = items.where(col(itemCol).isNotNull)
      .select(col(itemCol).as("__it"))
    val truth = base.groupBy(col("__it")).agg(count(lit(1)).as("__f"))
    val totals = truth.agg(sum(col("__f")).as("__nn"))
    widths.sorted.map { w =>
      val cells = countMinSketch(base, "__it", rows, w, s"$salt$w:")
      val probes = truth
        .select(col("__it"), col("__f"),
          explode(array((0 until rows).map { r =>
            struct(lit(r).as("r"),
              Sampling.hashBucket(col("__it"), w, s"$salt$w:$r:")
                .as("bucket"))
          }: _*)).as("__cell"))
        .select(col("__it"), col("__f"), col("__cell.r").as("r"),
          col("__cell.bucket").as("bucket"))
      val est = probes.join(cells.hint("shuffle_hash"), Seq("r", "bucket"))
        .groupBy(col("__it"), col("__f"))
        .agg(min(col("n")).as("__est"))
        .withColumn("__err", col("__est") - col("__f"))
      est.agg(count(lit(1)).as("n_items"),
        sum(when(col("__err") > 0, 1L).otherwise(0L)).as("n_over"),
        round(sum(col("__err")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_err"),
        max(col("__err")).as("max_err"))
        .join(broadcast(totals)) // 1-row scalar side
        .select(lit(w).as("width"), col("n_items"), col("n_over"),
          col("mean_err"), col("max_err"),
          round(lit(math.E) * col("__nn").cast("double") /
            lit(w.toDouble), 6).as("bound"))
    }.reduce(_.unionByName(_))
  }

  /**
   * P235 — KMV/theta-sketch set operations: bottom-k sketches of two
   * key sets over the SAME hash (so a shared key owns one hash in
   * both), θ = the smaller k-th minimum, and union/intersection
   * estimated by counting sub-θ hashes — the mergeable way to answer
   * "how many users did BOTH" across 1000 executors without a distinct
   * over the union (the P113 single-set estimator completed with the
   * algebra that makes sketches composable). Emits ONE row (k,
   * n_a_exact, n_b_exact, n_union_exact, n_inter_exact, est_a, est_b,
   * est_union, est_inter, jaccard_est) — the exact columns are the
   * simulation audit a production run would drop.
   *
   * Shapes: per-set distinct-hash aggs with a per-set (partitioned)
   * rank window for the k-th minimum, θ broadcast as a 1-row scalar,
   * sub-θ counts as conditional aggs. Cross-engine: hashes are the
   * portable 56-bit MD5 prefix; counts exact BIGINTs; estimates are
   * cnt·2⁵⁶/θ double sequences rounded at 6; the Jaccard estimate is
   * an exact integer ratio.
   */
  def kmvSetOps(items: DataFrame, itemCol: String, tagCol: String,
      tagA: String, tagB: String, k: Int,
      salt: String = "kmvset:"): DataFrame = {
    require(k >= 2, s"kmvSetOps: k must be >= 2, got $k")
    require(tagA != tagB, "kmvSetOps: tags must differ")
    val t = col(tagCol).cast("string")
    val base = items
      .where(col(itemCol).isNotNull && (t === tagA || t === tagB))
      .select(when(t === tagA, lit("a")).otherwise(lit("b")).as("__t"),
        Sampling.hashValue(col(itemCol), salt).as("__h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__t")).orderBy(col("__h").asc)
    val kth = base
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === k)
      .groupBy().agg(min(col("__h")).as("__theta")) // smaller k-th min
      .select(coalesce(col("__theta"), lit(1L << 56)).as("__theta"))
    val flagged = base.groupBy(col("__h"))
      .agg(max(when(col("__t") === "a", 1L).otherwise(0L)).as("__ina"),
        max(when(col("__t") === "b", 1L).otherwise(0L)).as("__inb"))
      .crossJoin(broadcast(kth)) // 1-row scalar side
      .where(col("__h") < col("__theta"))
    val counts = flagged.agg(
      first(col("__theta")).as("__theta"),
      sum(col("__ina")).as("__ca"), sum(col("__inb")).as("__cb"),
      count(lit(1)).as("__cu"),
      sum(col("__ina") * col("__inb")).as("__ci"))
    val exact = items
      .where(col(itemCol).isNotNull && (t === tagA || t === tagB))
      .select(when(t === tagA, lit("a")).otherwise(lit("b")).as("__t"),
        col(itemCol).as("__i"))
      .groupBy(col("__i"))
      .agg(max(when(col("__t") === "a", 1L).otherwise(0L)).as("__ia"),
        max(when(col("__t") === "b", 1L).otherwise(0L)).as("__ib"))
      .agg(sum(col("__ia")).as("n_a_exact"), sum(col("__ib")).as("n_b_exact"),
        count(lit(1)).as("n_union_exact"),
        sum(col("__ia") * col("__ib")).as("n_inter_exact"))
    val td = col("__theta").cast("double")
    def est(c: org.apache.spark.sql.Column) =
      round(c.cast("double") * lit(math.pow(2.0, 56)) / td, 6)
    exact.join(broadcast(counts)) // two 1-row frames
      .select(lit(k).as("k"), col("n_a_exact"), col("n_b_exact"),
        col("n_union_exact"), col("n_inter_exact"),
        est(col("__ca")).as("est_a"), est(col("__cb")).as("est_b"),
        est(col("__cu")).as("est_union"), est(col("__ci")).as("est_inter"),
        round(col("__ci").cast("double") / col("__cu").cast("double"), 6)
          .as("jaccard_est"))
  }

  /** The (k−1)·2⁵⁶ estimator numerator, computed once so the operator
    * and any oracle generator embed the IDENTICAL double literal (the
    * EWMA weight-ladder rule); exact for any sane k (k−1 < 2⁷). */
  def kmvScale(k: Int): Double = (k - 1).toDouble * math.pow(2.0, 56)

  /** [[kmvScale]] as a SQL double literal (shortest round-trip repr,
    * e0-suffixed when bare). */
  def kmvScaleLiteral(k: Int): String = {
    val s = kmvScale(k).toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /**
   * P79 — exact heavy hitters via the classic two-pass shape: a
   * Misra–Gries pass per partition nominates candidates, an exact second
   * pass over only candidate rows verifies. Returns EXACTLY the items
   * whose true count exceeds n/k (with `cnt` the exact count and
   * `n_total` the corpus size) — a deterministic answer, not an estimate:
   *
   *   - Pass 1 (`mapPartitions`): Misra–Gries with k counters per
   *     partition. A global heavy hitter (cnt > n/k = Σnₚ/k) exceeds
   *     nₚ/k on at least one partition (pigeonhole), and MG with k
   *     counters keeps every item whose local count exceeds nₚ/(k+1)
   *     < nₚ/k — so the union of partition survivors is a GUARANTEED
   *     superset of the heavy hitters. It is partitioning-dependent,
   *     but only as a superset.
   *   - Pass 2: broadcast the ≤ k·numPartitions candidates, left-semi
   *     filter the corpus, one keyed count, strict `cnt·k > n` filter.
   *     Any partitioning-dependent extra candidate fails the exact
   *     filter, so the OUTPUT is invariant under repartitioning.
   *
   * Scale shape: pass 1 is a narrow scan emitting ≤ k items per
   * partition; pass 2 shuffles only rows matching ≤ k·P candidate
   * values (map-side combine bounds it further to ≤ k·P groups per
   * partition). The corpus is scanned twice but never shuffled in bulk
   * — the right trade at 100 TB, where a single full groupBy on a
   * long-tail item column shuffles billions of singleton groups.
   * `n_total` counts non-null items only (nulls can't be hitters).
   */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters: k must be >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val vals = items
      .select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val candidates = vals.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { s =>
        counters.get(s) match {
          case Some(c) => counters(s) = c + 1
          case None if counters.size < k => counters(s) = 1L
          case None =>
            // decrement-all: each of the k+1 distinct items (the k
            // counters plus the arrival) pays 1 — ≤ nₚ/(k+1) decrements
            val dead = counters.iterator.collect {
              case (key, 1L) => key
            }.toList
            counters.keysIterator.toList.foreach(key => counters(key) -= 1)
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    val total = vals.groupBy().agg(count(lit(1)).as("n_total"))
    vals
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .where(col("cnt") * lit(k.toLong) > col("n_total"))
  }

  /** The [[hdrQuantiles]] bucket ladder: (threshold, width) pairs — a
    * value ≥ threshold rounds down to a multiple of the paired width;
    * below 100 buckets are exact singletons. ONE definition feeds the
    * operator and any oracle generator (the cmsCells shared-cells rule). */
  def hdrLadder: Seq[(Long, Long)] = {
    def p10(e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * 10)
    (17 to 2 by -1).map(d => (p10(d), p10(d - 1)))
  }

  /**
   * P162 — HDR-style log-bucketed quantile histogram: integer values
   * round down to two significant decimal digits (buckets of relative
   * width ≤ 10%, ≤ ~1,700 buckets over the full BIGINT range), counts
   * per bucket, and each requested quantile estimated as the lowest
   * bucket whose cumulative count reaches ceil(q·n) — the MERGEABLE
   * quantile structure (bucket counts add across partitions, shards,
   * days) that replaces exact percentile sort-buffers at 100 TB, with
   * a hard relative-error bound instead of a sampling guarantee.
   * Emits per quantile: (q, target_rank, est_lo, exact, ratio) — the
   * exact R-7 percentile rides along so the query IS the error audit.
   *
   * Shapes: one keyed bucket agg (map-side combinable), a cumulative
   * window over the ≤1,700-bucket frame, the exact side one percentile
   * aggregate. Cross-engine: bucketing is integer CASE-ladder
   * arithmetic ([[hdrLadder]] both sides); ceil(q·n) runs the
   * IDENTICAL double product (a non-binary-exact q may ceil "up a
   * rank" — deterministically, on both engines).
   */
  def hdrQuantiles(df: DataFrame, valueCol: String,
      quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty, "hdrQuantiles: at least one quantile")
    require(quantiles.forall(q => q > 0 && q <= 1),
      s"hdrQuantiles: quantiles must be in (0, 1], got $quantiles")
    val c = col(valueCol).cast("long")
    val d = df.where(col(valueCol).isNotNull && c >= 1L).select(c.as("__c"))
    val widthCase = hdrLadder
      .map { case (thr, w) => s"WHEN __c >= ${thr}L THEN ${w}L" }
      .mkString("CASE ", " ", " ELSE 1L END")
    val counts = d
      .withColumn("bucket_lo", expr(s"(__c div ($widthCase)) * ($widthCase)"))
      .groupBy(col("bucket_lo")).agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_lo").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts.withColumn("__cum", sum(col("__cnt")).over(w))
    val exact = d.agg(count(lit(1)).as("__n"),
      expr(s"percentile(__c, array(${quantiles.mkString(", ")}))").as("__ex"))
    val qf = quantiles.zipWithIndex.map { case (q, i) =>
      struct(lit(q).as("q"), lit(i + 1).as("__qi"))
    }
    val grid = cum.join(broadcast(exact))
      .select(col("bucket_lo"), col("__cum"), col("__n"), col("__ex"),
        explode(array(qf: _*)).as("__q"))
      .select(col("__q.q").as("q"), col("__q.__qi").as("__qi"),
        col("bucket_lo"), col("__cum"), col("__n"), col("__ex"))
      .withColumn("target_rank",
        ceil(col("q") * col("__n").cast("double")).cast("long"))
      .where(col("__cum") >= col("target_rank"))
    grid.groupBy(col("q"), col("__qi"), col("target_rank"))
      .agg(min(col("bucket_lo")).as("est_lo"),
        max(element_at(col("__ex"), col("__qi"))).as("__exact"))
      .withColumn("exact", round(col("__exact"), 6))
      .withColumn("ratio",
        when(col("__exact") > 0,
          round(col("est_lo").cast("double") / col("__exact"), 6)))
      .select("q", "target_rank", "est_lo", "exact", "ratio")
  }

  /**
   * P178 — capture–recapture (Lincoln–Petersen with Chapman's
   * correction) population estimate: draw two INDEPENDENT deterministic
   * hash samples, count the overlap m, and N̂ = (n₁+1)(n₂+1)/(m+1) − 1 —
   * the "how big is the real corpus" estimator when you can sample but
   * not enumerate (how many distinct pages does this domain have? how
   * many unique users hit this path?). The true count rides along here
   * because the table IS enumerable — the query audits the estimator.
   * One row: (n1, n2, m, est_lp, est_chapman, n_true); m = 0 → null LP
   * (Chapman stays finite — that's its point).
   *
   * Shapes: pure hash-bucket projections ([[Sampling.hashBucket]] with
   * independent salts), one inner join for m, scalar counts. Exact
   * integers; the estimates are one double sequence rounded at 2.
   */
  def captureRecapture(df: DataFrame, idCol: String,
      samplePct: Int = 30): DataFrame = {
    require(samplePct >= 1 && samplePct <= 99,
      s"captureRecapture: samplePct must be in [1, 99], got $samplePct")
    val ids = df.where(col(idCol).isNotNull).select(col(idCol)).distinct()
    val a = ids.where(Sampling.hashBucket(col(idCol), 100, "capA:") < samplePct)
    val b = ids.where(Sampling.hashBucket(col(idCol), 100, "capB:") < samplePct)
    val m = a.join(b.hint("shuffle_hash"), Seq(idCol.toString), "left_semi")
      .agg(count(lit(1)).as("m"))
    val counts = ids.agg(count(lit(1)).as("n_true"))
      .join(broadcast(a.agg(count(lit(1)).as("n1")))) // 1-row scalar sides
      .join(broadcast(b.agg(count(lit(1)).as("n2"))))
      .join(broadcast(m))
    counts
      .withColumn("est_lp",
        when(col("m") > 0, round(col("n1").cast("double") *
          col("n2").cast("double") / col("m").cast("double"), 2)))
      .withColumn("est_chapman",
        round((col("n1") + 1).cast("double") *
          (col("n2") + 1).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0), 2))
      .select("n1", "n2", "m", "est_lp", "est_chapman", "n_true")
  }

  /**
   * P202 — histogram-quantile estimator with its own error audit: per
   * key, quantiles read off an equi-width histogram by within-bucket
   * linear interpolation, BESIDE the exact R-7 percentile and the
   * absolute error — the mergeable-sketch quantile path (bucket counts
   * add across shards/windows, which exact percentiles never do) with
   * the "how wrong is it on THIS data" column built in (the sim9/sk7
   * audit discipline). Emits (key, p, n, est_q, exact_q, abs_err).
   *
   * Shapes: one (key, bucket) count agg, a per-KEY cumulative window
   * (partitioned), totals joined back shuffle_hash, the target grid a
   * broadcast k-row cross join; the exact side is the o5 percentile
   * class (per-group buffers — at 100 TB the estimator column IS the
   * answer and the exact column is dropped). Cross-engine: bucket
   * counts and cumulatives are exact BIGINTs, t = p·n and the
   * interpolation are fixed double sequences on them, est/exact/err
   * all round at 4 (the o5 interpolation-slack rule).
   */
  def histQuantile(df: DataFrame, keyCol: String, valueCol: String,
      bandWidth: Double, ps: Seq[Double]): DataFrame = {
    require(bandWidth > 0, s"histQuantile: bandWidth must be > 0")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"histQuantile: fractions must sit in (0,1), got $ps")
    val base = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
    val hist = base
      .groupBy(col("__k"), floor(col("__v") / bandWidth).cast("long")
        .as("__b"))
      .agg(count(lit(1)).as("__c"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val totals = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.createDataFrame(ps.map(Tuple1(_))).toDF("p")
    val t = col("p") * col("n").cast("double")
    val est = hist
      .withColumn("__cum0", coalesce(sum(col("__c")).over(wc), lit(0L)))
      .join(totals.hint("shuffle_hash"), Seq("__k"))
      .crossJoin(broadcast(grid))
      .where(col("__cum0").cast("double") < t &&
        (col("__cum0") + col("__c")).cast("double") >= t)
      .select(col("__k"), col("p"), col("n"),
        round(col("__b").cast("double") * bandWidth +
          lit(bandWidth) * (t - col("__cum0").cast("double")) /
            col("__c").cast("double"), 4).as("est_q"))
    val exacts = ps.zipWithIndex.map { case (p, i) =>
      round(expr(s"percentile(__v, $p)"), 4).as(s"__x$i")
    }
    val stackArgs = ps.zipWithIndex
      .map { case (p, i) => s"CAST($p AS DOUBLE), __x$i" }.mkString(", ")
    val exact = base.groupBy(col("__k"))
      .agg(exacts.head, exacts.tail: _*)
      .select(col("__k"),
        expr(s"stack(${ps.size}, $stackArgs) AS (p, exact_q)"))
    est.join(exact.hint("shuffle_hash"), Seq("__k", "p"))
      .withColumn("abs_err", round(abs(col("est_q") - col("exact_q")), 4))
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * P138 — AMS (Alon–Matias–Szegedy) F₂ sketch: `estimators` independent
   * ±1-sign counters, each Σᵢ signᵣ(i)·fᵢ; counter² is an unbiased
   * estimate of the second frequency moment Σᵢ fᵢ² — the self-join size,
   * THE statistic a join planner wants before picking a strategy on a
   * skewed key (F₂ ≫ n ⇒ the equi-join explodes). Emits per-estimator
   * (counter, est) beside the exact F₂ and the ratio, so the query IS
   * the estimator-quality audit.
   *
   * Shapes: one keyed count per item, one bounded explode (R rows per
   * DISTINCT item, not per row), one keyed agg — all exact BIGINT
   * arithmetic (counter ≤ n < 2³¹ keeps counter² < 2⁶², the ANSI bound).
   * Signs replay from the portable MD5 ([[Sampling.hashValue]] of
   * "r:item" with the "ams" salt) — any engine reproduces the sketch
   * bit-for-bit, which is the point: sketches are only mergeable across
   * systems when the hash is a contract, not an implementation detail.
   */
  def amsF2(items: DataFrame, itemCol: String, estimators: Int): DataFrame = {
    require(estimators >= 1, s"amsF2: estimators must be >= 1, got $estimators")
    val counts = items.where(col(itemCol).isNotNull)
      .groupBy(col(itemCol).as("__item"))
      .agg(count(lit(1)).as("__c"))
    val exact = counts.agg(sum(col("__c") * col("__c")).as("f2_exact"))
    counts
      .select(col("__item"), col("__c"),
        explode(sequence(lit(0), lit(estimators - 1))).as("estimator"))
      .withColumn("__sign", lit(1L) - lit(2L) *
        pmod(Sampling.hashValue(concat(col("estimator").cast("string"),
          lit(":"), col("__item").cast("string")), "ams"), lit(2L)))
      .groupBy(col("estimator"))
      .agg(sum(col("__sign") * col("__c")).as("counter"))
      .withColumn("est", col("counter") * col("counter"))
      .join(broadcast(exact)) // 1-row scalar side
      .withColumn("ratio",
        round(col("est").cast("double") / col("f2_exact").cast("double"), 6))
  }

  /**
   * P222 — Bloom filter false-positive audit: build the k-hash bit set
   * over `insert`'s keys, probe it with `probe`'s keys (true members
   * excluded first — only NON-members can false-positive), and report
   * the measured FPR beside the fill-based prediction
   * (n_bits_set/m)^k — the calibration check run before shipping a
   * Bloom side-filter (P37's anti-join): an overloaded filter (fill →
   * 1) silently stops filtering, and THIS query is how you see it.
   * Emits ONE row (m, k, n_insert, n_bits_set, n_probes, n_fp,
   * fpr_emp, fpr_theory).
   *
   * Bit positions are pmod([[Sampling.hashValue]](key, salt+i), m) —
   * engine-portable, so a SQL oracle replays the exact bit set and
   * every probe verdict (the mm3 brute-replay idiom). Shapes: bits =
   * one explode + distinct (≤ m rows); probes explode to k rows each
   * and semi-join the bit set on an equi-key (shuffle_hash — the bit
   * frame is agg-sized but post-distinct has no stats); a probe is FP
   * iff all k positions hit. Cross-engine: fprs are double divisions
   * of exact BIGINTs rounded at 9/6; the theory power unrolls to
   * explicit multiplications (no libm pow anywhere).
   */
  def bloomFpr(insert: DataFrame, insertKeyCol: String, probe: DataFrame,
      probeKeyCol: String, m: Int, k: Int,
      salt: String = "bf:"): DataFrame = {
    require(m >= 2, s"bloomFpr: m must be >= 2, got $m")
    require(k >= 1 && k <= 16, s"bloomFpr: k must be in 1..16, got $k")
    def positions(key: org.apache.spark.sql.Column) =
      array((0 until k).map(i =>
        pmod(Sampling.hashValue(key, s"$salt$i:"), lit(m.toLong))): _*)
    val ins = insert.where(col(insertKeyCol).isNotNull)
      .select(col(insertKeyCol).as("__ik")).distinct()
    val bits = ins.select(explode(positions(col("__ik"))).as("bit"))
      .distinct()
    val nonMembers = probe.where(col(probeKeyCol).isNotNull)
      .select(col(probeKeyCol).as("__pk")).distinct()
      .join(ins, col("__pk") === col("__ik"), "left_anti")
    val hits = nonMembers
      .select(col("__pk"), explode(positions(col("__pk"))).as("bit"))
      .join(bits.hint("shuffle_hash"), Seq("bit"), "left_semi")
      .groupBy(col("__pk")).agg(count(lit(1)).as("__nhit"))
      .where(col("__nhit") === k)
    val stats = ins.agg(count(lit(1)).as("n_insert"))
      .join(bits.agg(count(lit(1)).as("n_bits_set")))
      .join(nonMembers.agg(count(lit(1)).as("n_probes")))
      .join(hits.agg(count(lit(1)).as("n_fp"))) // four 1-row frames
    val fill = round(col("n_bits_set").cast("double") /
      lit(m.toDouble), 9)
    val theory = (1 until k).foldLeft(fill)((acc, _) => acc * fill)
    stats
      .select(lit(m).as("m"), lit(k).as("k"), col("n_insert"),
        col("n_bits_set"), col("n_probes"), col("n_fp"),
        round(col("n_fp").cast("double") /
          greatest(col("n_probes"), lit(1L)).cast("double"), 6)
          .as("fpr_emp"),
        round(theory, 9).as("fpr_theory"))
  }

  /**
   * P320 — linear counting per group: hash values into `m` buckets and
   * estimate the distinct count from the EMPTY-bucket fraction,
   * n̂ = m·ln(m/empty) — the small-cardinality regime where it beats
   * HLL (P51's own low-range correction IS linear counting; this is
   * the standalone sketch: one bitmap, mergeable by OR, exact audit
   * beside it). Emits per group: m, exact, occupied, lc_estimate,
   * rel_err; a saturated bitmap (no empty buckets) nulls the estimate
   * — the classical undefined case, the caller sizes m up.
   *
   * Shape: ONE keyed agg (two count-distincts — the bucket distinct is
   * the bitmap's |occupied|). Cross-engine: buckets come from the
   * portable 56-bit MD5 hash ([[Sampling.hashBucket]]) so the oracle
   * replays every bucket; the ln runs on an exact integer ratio and
   * rounds at 6 (the firewall); outputs round at 6.
   */
  def linearCounting(df: DataFrame, valueCol: String,
      groupCols: Seq[String], m: Int): DataFrame = {
    require(m >= 16 && m <= (1 << 24),
      s"linearCounting: m must be in [16, 2^24], got $m")
    require(groupCols.nonEmpty, "linearCounting: need group columns")
    val base = df.where(col(valueCol).isNotNull)
    val agg = base.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("exact"),
        countDistinct(Sampling.hashBucket(col(valueCol), m))
          .as("occupied"))
    val md = lit(m.toDouble)
    val empty = (lit(m.toLong) - col("occupied")).cast("double")
    val lcRaw = md * round(log(md / empty), 6)
    val exd = col("exact").cast("double")
    agg.select(groupCols.map(col) ++ Seq(lit(m).as("m"), col("exact"),
      col("occupied"),
      when(col("occupied") < m, round(lcRaw, 6)).as("lc_estimate"),
      when(col("occupied") < m && col("exact") > 0,
        round((lcRaw - exd) / exd, 6)).as("rel_err")): _*)
  }

  /** The decay weight ladder decay^age for age = 0..maxAge — computed
    * ONCE on the driver so [[decayedCounts]] and any oracle generator
    * embed IDENTICAL double literals (the o12 EWMA weight-ladder rule:
    * neither engine calls pow at runtime). */
  def decayLadder(decay: Double, maxAge: Int): Seq[Double] = {
    require(decay > 0.0 && decay < 1.0,
      s"decayLadder: decay must sit in (0,1), got $decay")
    require(maxAge >= 1 && maxAge <= 512,
      s"decayLadder: maxAge must sit in 1..512, got $maxAge")
    (0 to maxAge).map(a => math.pow(decay, a))
  }

  /**
   * P360 — exponentially time-decayed counts per key: every event
   * contributes decay^(age in days from the corpus max day), so the
   * leaderboard favors RECENT activity — the batch replay of the
   * streaming "trending now" counter (a plain count never forgets; a
   * sliding window forgets all at once; exponential decay is the
   * standard in-between, and decayed counts MERGE like any sum). Emits
   * (key, n_total, n_days, decayed, decay_ratio) — ratio near 1 = all
   * activity recent, near decay^span = all activity old.
   *
   * Cross-engine: weights are [[decayLadder]] driver literals selected
   * by an integer age CASE (no runtime pow); per-day n·w products
   * 9-rounded through DECIMAL(28,9). Ages beyond the ladder raise
   * loudly. Shapes: one (key, day) agg, ONE 1-row broadcast reference
   * join (the adjudicated scalar cross-join class), one keyed fold.
   */
  def decayedCounts(df: DataFrame, keyCol: String, tsCol: String,
      decay: Double = 0.9, maxAgeDays: Int = 64): DataFrame = {
    val ladder = decayLadder(decay, maxAgeDays)
    val daily = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val ref = daily.agg(max(col("__day")).as("__ref"))
    val weight = ladder.zipWithIndex.tail
      .foldLeft(when(col("__age") === 0, lit(ladder.head))) {
        case (acc, (v, a)) => acc.when(col("__age") === a, lit(v))
      }
      .otherwise(raise_error(lit("decayedCounts: age beyond the ladder")))
    val dec = sum(round(col("__n").cast("double") * col("__w"), 9)
      .cast("decimal(28,9)")).cast("double")
    daily.crossJoin(broadcast(ref))
      .withColumn("__age", datediff(col("__ref"), col("__day")))
      .withColumn("__w", weight)
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_total"), count(lit(1)).as("n_days"),
        round(dec, 6).as("decayed"),
        round(dec / sum(col("__n")).cast("double"), 6).as("decay_ratio"))
  }

  /**
   * P380 — Chao1 species-richness estimate from a sample: how many
   * DISTINCT values does the full population hold, estimated from the
   * sample's abundance spectrum alone — Ŝ = d + f₁(f₁−1)/(2(f₂+1))
   * (bias-corrected form; f₁ = values seen once, f₂ = seen twice).
   * The capacity-planning read DISTINCT-on-the-sample understates by
   * construction (unseen values exist — the d25 growth-curve lesson as
   * an ESTIMATOR instead of a measurement): vocabulary sizing,
   * entity-cardinality forecasts, dictionary-encoding budgets. Emits
   * ONE row: (n_items, d_sample, f1, f2, chao1).
   *
   * Shape: one item-keyed count agg + one 3-number fold — map-side
   * combinable, sample-sized. Cross-engine: counts exact BIGINTs;
   * the correction is one fixed double chain rounded at 6. The
   * bias-corrected form is total (f₂ = 0 divides by 2, not 0).
   */
  def chao1Richness(sample: DataFrame, itemCol: String): DataFrame = {
    val counts = sample.where(col(itemCol).isNotNull)
      .groupBy(col(itemCol)).agg(count(lit(1)).as("__c"))
    val spec = counts.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_items"),
      count(lit(1)).as("d_sample"),
      coalesce(sum(when(col("__c") === 1, 1L).otherwise(0L)), lit(0L))
        .as("f1"),
      coalesce(sum(when(col("__c") === 2, 1L).otherwise(0L)), lit(0L))
        .as("f2"))
    val f1d = col("f1").cast("double")
    spec.select(col("n_items"), col("d_sample"), col("f1"), col("f2"),
      round(col("d_sample").cast("double") +
        f1d * (f1d - lit(1.0)) /
          (lit(2.0) * (col("f2").cast("double") + lit(1.0))), 6)
        .as("chao1"))
  }
}
