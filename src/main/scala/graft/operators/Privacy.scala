package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Privacy gates for training-data pipelines. Sibling of the PII redaction
 * pass (`TextAnalysis.redactPii`): redaction scrubs values INSIDE a
 * document, these operators suppress rows whose mere combination of
 * attributes re-identifies someone.
 */
object Privacy {

  /**
   * P77 — k-anonymity filter (Sweeney): a row is releasable only if its
   * quasi-identifier combination is shared by at least `k` rows — rarer
   * combinations (the 87%-of-Americans zip/birthdate/sex effect) are
   * flagged for suppression. Emits every input row plus `qid_group_n`
   * (the combination's multiplicity) and `kept` (n ≥ k), so callers can
   * suppress, generalize, or audit; nulls in a QID column form their own
   * group (SQL window semantics), which is the conservative choice — an
   * absent attribute is itself identifying.
   *
   * Scale shape: ONE window shuffle keyed by the QID tuple — no joins,
   * no driver-side state; a skewed (huge) QID group costs one partition's
   * count, the sa2 rule. Generalize-then-refilter loops just call this
   * again on the coarsened columns.
   */
  def kAnonymityFilter(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"kAnonymityFilter: k must be >= 1, got $k")
    require(qidCols.nonEmpty, "kAnonymityFilter: at least one quasi-identifier column")
    val missing = qidCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"kAnonymityFilter: quasi-identifier columns not in input: ${missing.mkString(", ")}")
    require(!df.columns.contains("qid_group_n") && !df.columns.contains("kept"),
      "kAnonymityFilter: input already has a qid_group_n/kept column — rename it first")
    val w = Window.partitionBy(qidCols.map(col): _*)
    df.withColumn("qid_group_n", count(lit(1)).over(w))
      .withColumn("kept", col("qid_group_n") >= k)
  }

  /**
   * P89 — ℓ-diversity filter (Machanavajjhala et al.): k-anonymity keeps
   * a row when its QID group is big enough, but a big group whose
   * SENSITIVE attribute is constant still leaks (the homogeneity
   * attack). A row is releasable only if its QID group carries at least
   * `l` DISTINCT sensitive values. Emits every input row plus
   * `sens_distinct` (the group's distinct sensitive count),
   * `sens_entropy` (the group's Shannon entropy in nats — entropy
   * ℓ-diversity compares it against ln ℓ) and `kept` (distinct ≥ l).
   * Null sensitive values form their own value (conservative — an
   * absent attribute is itself a disclosure).
   *
   * Scale shape: a (QID, sensitive) pair-count agg (map-side
   * combinable), a window over the pair frame (one row per distinct
   * pair — tiny relative to the data) for group totals, a per-QID
   * re-agg, and one shuffle_hash join back onto the rows (post-agg side
   * has no stats — the d11 rule). Entropy terms go through the libm
   * firewall: −p·ln p is rounded at 9 and DECIMAL-summed, so every
   * engine adds identical operands in any order.
   */
  def lDiversityFilter(df: DataFrame, qidCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"lDiversityFilter: l must be >= 1, got $l")
    require(qidCols.nonEmpty, "lDiversityFilter: at least one quasi-identifier column")
    val missing = (qidCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"lDiversityFilter: columns not in input: ${missing.mkString(", ")}")
    require(!qidCols.contains(sensitiveCol),
      s"lDiversityFilter: sensitive column $sensitiveCol cannot be a quasi-identifier")
    val reserved = Seq("sens_distinct", "sens_entropy", "kept")
    require(!reserved.exists(df.columns.contains),
      s"lDiversityFilter: input already has one of ${reserved.mkString("/")} — rename it first")
    val pairs = df.groupBy((qidCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(qidCols.map(col): _*)
    val p = col("__cnt").cast("double") / col("__gn").cast("double")
    val groups = pairs
      .withColumn("__gn", sum(col("__cnt")).over(w))
      .withColumn("__term",
        round(-p * log(p), 9).cast("decimal(28,9)"))
      .groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("sens_distinct"),
        sum(col("__term")).cast("double").as("sens_entropy"))
    df.join(groups.hint("shuffle_hash"), qidCols)
      .withColumn("kept", col("sens_distinct") >= l)
  }

  /**
   * P84 — Laplace-mechanism noisy counts (Dwork et al.): per-group exact
   * counts released with additive Laplace(sensitivity/ε) noise — the
   * ε-differentially-private aggregate release behind private telemetry
   * and training-data statistics. Returns (groupCols…, n, noise,
   * noisy_n) with noisy_n = max(0, n + noise) clamped at the standard
   * non-negativity post-processing (post-processing preserves DP).
   *
   * The noise draw is DERANDOMIZED the repo's way ([[Sampling.uniform01]]
   * on the group key + salt): same data + salt → same release, every
   * engine replays it. That makes repeated calls with the same salt
   * reuse ONE draw (which is exactly what the ε budget requires — fresh
   * randomness per release needs a fresh salt, and callers own that
   * budget accounting). Inverse-CDF: noise = −b·sign(u−½)·ln(1−2|u−½|),
   * the log argument clamped at 2⁻⁵⁶ (u = 1 would otherwise hit ln 0),
   * rounded at 9 decimals — the sa8 libm firewall, so the one ln() call
   * sees identical operands on every engine. Scale shape: one keyed agg
   * with map-side combine; noise is a pure projection.
   */
  def laplaceNoisyCounts(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, sensitivity: Double = 1.0,
      salt: String = "dp"): DataFrame = {
    require(groupCols.nonEmpty, "laplaceNoisyCounts: at least one group column")
    require(epsilon > 0, s"laplaceNoisyCounts: epsilon must be > 0, got $epsilon")
    require(sensitivity > 0,
      s"laplaceNoisyCounts: sensitivity must be > 0, got $sensitivity")
    val b = sensitivity / epsilon
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", laplaceNoise(key, salt, b))
      .withColumn("noisy_n",
        greatest(lit(0.0), col("n").cast("double") + col("noise")))
  }

  /** The ONE derandomized Laplace(b) draw shared by every DP release
    * ([[laplaceNoisyCounts]], [[laplaceNoisyMean]]) and replayed by
    * their oracles — inverse-CDF on the portable uniform, log argument
    * clamped at 2⁻⁵⁶, rounded at 9 (the sa8 libm firewall). A forked
    * per-site copy could drift; this cannot. */
  private[operators] def laplaceNoise(key: Column, salt: String,
      b: Double): Column = {
    val p = Sampling.uniform01(key, salt) - lit(0.5)
    round(
      -lit(b) * signum(p) *
        log(greatest(lit(1.0) - lit(2.0) * abs(p), lit(math.pow(2.0, -56)))),
      9)
  }

  /**
   * P200 — ε-differentially-private mean (Laplace mechanism): per
   * group, values CLIP to [lo, hi] (clipping bounds each row's
   * contribution — that IS the sensitivity argument), the clipped sum
   * and the count are released with independent Laplace draws (budget
   * split ε/2 each: sum noise b = (hi−lo)/(ε/2), count noise
   * b = 1/(ε/2)), and the mean = noisy_sum / max(1, noisy_n), clamped
   * back to [lo, hi] (post-processing preserves DP) — private
   * per-segment averages for telemetry and training-data statistics.
   * Emits (groupCols…, n, sum_clipped, true_mean, dp_mean). RELEASE
   * CONTRACT: `dp_mean` is the ONLY ε-DP column — `n`, `sum_clipped`
   * and `true_mean` are exact audit columns (sum_clipped/n IS the
   * un-noised clipped mean), so an actual release ships the groups +
   * dp_mean and NOTHING else.
   *
   * Derandomization and budget accounting as in [[laplaceNoisyCounts]]
   * (same salt → same ONE release; fresh release needs a fresh salt);
   * the two draws use distinct derived salts. Shapes: one keyed agg
   * (map-side combinable) + pure projections. Clipped sums go through
   * DECIMAL; the closing sequence is fixed doubles on the 9-rounded
   * draws, rounded at 6.
   */
  def laplaceNoisyMean(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, epsilon: Double,
      salt: String = "dpmean"): DataFrame = {
    require(groupCols.nonEmpty, "laplaceNoisyMean: at least one group column")
    require(epsilon > 0, s"laplaceNoisyMean: epsilon must be > 0, got $epsilon")
    require(hi > lo, s"laplaceNoisyMean: need hi > lo, got [$lo, $hi]")
    val bSum = (hi - lo) / (epsilon / 2.0)
    val bCnt = 1.0 / (epsilon / 2.0)
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)),
      lit(hi))
    df.where(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(clipped.cast("decimal(18,6)")).cast("double"), 6)
          .as("sum_clipped"),
        round(sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("true_mean"))
      .withColumn("__ns", laplaceNoise(key, s"$salt:s:", bSum))
      .withColumn("__nc", laplaceNoise(key, s"$salt:c:", bCnt))
      .withColumn("dp_mean",
        round(least(greatest(
          (col("sum_clipped") + col("__ns")) /
            greatest(lit(1.0), col("n").cast("double") + col("__nc")),
          lit(lo)), lit(hi)), 6))
      .drop("__ns", "__nc")
  }

  /**
   * P123 — t-closeness audit (Li et al.): per quasi-identifier class,
   * the earth-mover's distance between the class's sensitive-value
   * distribution and the GLOBAL one — the attack k-anonymity and
   * l-diversity both miss (a class can be diverse yet skewed: "all
   * high-salary"). For an ORDERED numeric sensitive attribute with the
   * standard equal-spacing metric, EMD = Σᵢ |Σ_{j≤i}(pⱼ−qⱼ)| / (m−1)
   * over the m global values in order. Returns one row per class:
   * (qid…, n, emd, kept = emd ≤ t).
   *
   * Shape: one global value agg (m bounded by the generalized bands —
   * callers pass BANDED sensitives, that's the t-closeness setting),
   * one (class, value) agg, a classes × values grid via a broadcast
   * cross join of the tiny value frame, and ONE class-keyed window.
   * Portability: cumulative sums run over exact INTEGER counts (a
   * double cumsum would pair additions differently across engines —
   * DuckDB's windowed sums are segment trees); each |r| is a fixed
   * double sequence on exact ints, rounded at 9, DECIMAL-summed.
   */
  def tCloseness(df: DataFrame, qidCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(qidCols.nonEmpty, "tCloseness: at least one quasi-identifier column")
    require(t > 0 && t < 1, s"tCloseness: t must be in (0,1), got $t")
    require(!qidCols.contains(sensitiveCol),
      s"tCloseness: sensitive column $sensitiveCol cannot be a quasi-identifier")
    val base = df.where(col(sensitiveCol).isNotNull)
    val global = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gc"))
    val vw = org.apache.spark.sql.expressions.Window.orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val values = global
      .withColumn("__cumg", sum(col("__gc")).over(vw))
      .withColumn("__gtot",
        sum(col("__gc")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__m",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select("__v", "__cumg", "__gtot", "__m")
    val classCnt = base
      .groupBy((qidCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__cc"))
    val classes = base.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val grid = classes.crossJoin(broadcast(values))
      .join(classCnt.hint("shuffle_hash"), qidCols :+ "__v", "left")
      .withColumn("__cc", coalesce(col("__cc"), lit(0L)))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCols.map(col): _*).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val r = col("__cumc").cast("double") / col("n").cast("double") -
      col("__cumg").cast("double") / col("__gtot").cast("double")
    grid
      .withColumn("__cumc", sum(col("__cc")).over(cw))
      .withColumn("__term", round(abs(r), 9).cast("decimal(28,9)"))
      .groupBy((qidCols.map(col) :+ col("n")): _*)
      .agg(sum(col("__term")).cast("double").as("__s"),
        max(col("__m")).as("__mm"))
      // m = 1: one global value → every class matches it → distance 0
      .withColumn("emd", when(col("__mm") > 1L,
        round(col("__s") / (col("__mm") - lit(1L)).cast("double"), 6))
        .otherwise(lit(0.0)))
      .withColumn("kept", col("emd") <= t)
      .drop("__s", "__mm")
  }

  /**
   * P160 — deterministic keyed pseudonymization + collision audit: each
   * id maps to the first 16 hex chars of MD5(salt ‖ id) — a stable,
   * join-preserving pseudonym (the same id tokenizes identically across
   * tables and runs, so referential structure survives
   * de-identification) — plus `collisions` (distinct ids − distinct
   * pseudonyms, repeated on every row): the audit that the 64-bit token
   * space didn't fold two subjects together. NOT encryption: the salt
   * must stay secret, and rotating it re-keys the corpus (operational
   * contract, documented here on purpose).
   *
   * Shapes: one distinct + projection; the audit is a 1-row broadcast
   * scalar (P125 idiom). Engine-portable by the same MD5 contract as
   * every hash in this repo.
   */
  def pseudonymize(df: DataFrame, idCol: String, salt: String): DataFrame = {
    val mapped = df.where(col(idCol).isNotNull)
      .select(col(idCol)).distinct()
      .withColumn("pseudonym",
        substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 16))
    val audit = mapped.agg(count(lit(1)).as("__nid"),
      countDistinct(col("pseudonym")).as("__npseud"))
    mapped.join(broadcast(audit)) // 1-row scalar side
      .withColumn("collisions", (col("__nid") - col("__npseud")).cast("long"))
      .drop("__nid", "__npseud")
  }

  /**
   * P218 — randomized response (Warner's design): each unit reports its
   * true binary attribute with probability p = pPct/100 and the FLIPPED
   * answer otherwise, giving plausible deniability per respondent while
   * the population rate stays estimable:
   * π̂ = (r̂ − (1−p))/(2p−1) debiases the reported rate. The local-DP
   * ancestor of RAPPOR-style telemetry — what a client-side collector
   * does before anything reaches the pipeline. Emits per group
   * (group, n, rate_true, rate_reported, est_rate, err); `rate_true`
   * and `err` are the simulation's audit columns (a real deployment
   * never sees them).
   *
   * The coin is [[Sampling.hashValue]] on (salt ++ id), compared in
   * INTEGER space (hv·100 < pPct·2⁵⁶ — no double threshold to agree
   * on), so the flip set is deterministic and engine-replayable. The
   * debiased estimate reduces to the exact BIGINT ratio
   * (100·n_rep − (100−pPct)·n) / (n·(2·pPct − 100)) — one double
   * division on exact operands, rounded at 6; `err` subtracts the
   * 6-rounded rates in DECIMAL (the o46 boundary rule). One fused
   * map-side-combinable agg; no shuffle beyond the group-by.
   */
  def randomizedResponse(df: DataFrame, idCol: String, truthCol: String,
      groupCol: String, pPct: Int = 75, salt: String = ""): DataFrame = {
    require(pPct >= 51 && pPct <= 99,
      s"randomizedResponse: pPct must be in 51..99, got $pPct")
    val hv = Sampling.hashValue(col(idCol), salt)
    val truth = col(truthCol).cast("boolean")
    // hv < 2^56 so hv·100 < 2^63; the comparison is exact integer math
    val tellsTruth = hv * lit(100L) < lit(pPct.toLong << 56)
    val reported = when(tellsTruth, truth).otherwise(!truth)
    val agg = df.where(col(groupCol).isNotNull && truth.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(truth, 1L).otherwise(0L)).as("__nt"),
        sum(when(reported, 1L).otherwise(0L)).as("__nr"))
    val nd = col("n").cast("double")
    val est = (lit(100L) * col("__nr") - lit((100 - pPct).toLong) * col("n"))
      .cast("double") /
      (col("n") * lit((2 * pPct - 100).toLong)).cast("double")
    agg
      .withColumn("rate_true", round(col("__nt").cast("double") / nd, 6))
      .withColumn("rate_reported", round(col("__nr").cast("double") / nd, 6))
      .withColumn("est_rate", round(est, 6))
      .withColumn("err",
        (col("est_rate").cast("decimal(18,6)") -
          col("rate_true").cast("decimal(18,6)")).cast("double"))
      .drop("__nt", "__nr")
  }

  /**
   * P233 — k-anonymity generalization ladder: for each candidate band
   * `width` over the numeric quasi-identifier, report how much of the
   * table becomes releasable ((static QIDs, ⌊v/width⌋) groups of size
   * ≥ k) — the coarsening curve an anonymization pass walks before
   * choosing its generalization level ("bands of 1000 leak 40% of
   * rows; 4000 protects 97% — ship 4000"). Emits per width (width,
   * n_rows, n_groups, n_safe_groups, n_safe_rows, share_safe), one
   * row per ladder rung.
   *
   * Shapes: one QID group agg + one rollup agg per rung (the rung
   * count is a small literal ladder; each pass is map-side
   * combinable), unioned. Cross-engine: bands are floor of a double
   * division (2-decimal money over integer widths — the pv1
   * adjudicated construction); everything else is exact BIGINT counts
   * and one rounded ratio.
   */
  def generalizationLadder(df: DataFrame, staticQids: Seq[String],
      numericCol: String, widths: Seq[Long], k: Int): DataFrame = {
    require(staticQids.nonEmpty, "generalizationLadder: need static QIDs")
    require(widths.nonEmpty && widths.forall(_ >= 1),
      s"generalizationLadder: widths must be >= 1, got $widths")
    require(widths.distinct.size == widths.size,
      s"generalizationLadder: duplicate widths in $widths")
    require(k >= 2, s"generalizationLadder: k must be >= 2, got $k")
    val qids = staticQids.map(col)
    widths.sorted.map { width =>
      val grouped = df
        .withColumn("__band", floor(col(numericCol) / width).cast("long"))
        .groupBy((qids :+ col("__band")): _*)
        .agg(count(lit(1)).as("__gn"))
      grouped.agg(
        sum(col("__gn")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__gn") >= k, 1L).otherwise(0L)).as("n_safe_groups"),
        sum(when(col("__gn") >= k, col("__gn")).otherwise(0L))
          .as("n_safe_rows"))
        .select(lit(width).as("width"), col("n_rows"), col("n_groups"),
          col("n_safe_groups"), col("n_safe_rows"),
          round(col("n_safe_rows").cast("double") /
            col("n_rows").cast("double"), 6).as("share_safe"))
    }.reduce(_.unionByName(_))
  }

  /**
   * P294 — re-identification risk metrics over quasi-identifier
   * equivalence classes: the three standard attacker models in one
   * row — prosecutor max risk 1/min(k) (the attacker KNOWS their
   * target is in the data), expected record risk Σ_records 1/k / n
   * (= n_classes/n_records — the neat identity), and the share of
   * records in classes below k = 5 (the publishable-microdata bar
   * [[kAnonymityFilter]] enforces; this is the measurement BEFORE the
   * enforcement). Emits ONE row (n_records, n_classes, min_class_k,
   * unique_records, max_risk, expected_risk, pct_under_5). Null QID
   * values form their own class (they are linkable values too).
   *
   * Shape: one QID-keyed agg + one closing agg — partition-parallel at
   * any cardinality. All counts exact BIGINTs; three closing double
   * divisions rounded at 6.
   */
  def reidentificationRisk(df: DataFrame,
      qidCols: Seq[String]): DataFrame = {
    require(qidCols.nonEmpty, "reidentificationRisk: no QID columns")
    val classes = df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__k"))
    classes.agg(sum(col("__k")).as("n_records"),
        count(lit(1)).as("n_classes"),
        min(col("__k")).as("min_class_k"),
        coalesce(sum(when(col("__k") === 1, 1L).otherwise(0L)), lit(0L))
          .as("unique_records"),
        coalesce(sum(when(col("__k") < 5, col("__k")).otherwise(0L)),
          lit(0L)).as("__risky"))
      .select(col("n_records"), col("n_classes"), col("min_class_k"),
        col("unique_records"),
        when(col("min_class_k") > 0,
          round(lit(1.0) / col("min_class_k").cast("double"), 6))
          .as("max_risk"),
        when(col("n_records") > 0,
          round(col("n_classes").cast("double") /
            col("n_records").cast("double"), 6)).as("expected_risk"),
        when(col("n_records") > 0,
          round(col("__risky").cast("double") /
            col("n_records").cast("double"), 6)).as("pct_under_5"))
  }

  /**
   * P340 — k-map risk (El Emam's journalist model): the read
   * [[reidentificationRisk]] (pv9) cannot give — when the release is a
   * SUBSET of a known population register, an attacker matches released
   * records against the REGISTER, so the class size that bounds the
   * match probability is the population's, not the sample's (sample-side
   * k systematically overstates risk: a sample-unique record sitting in
   * a populous register class is near-unlinkable). Per released record,
   * risk = 1/pop_class_size; emits ONE summary row (n_records,
   * n_classes, min_pop_k, pop_unique_records, under_k_records,
   * share_under_k, exp_risk). A sample class ABSENT from the population
   * violates the sample ⊆ population contract and raises loudly (the
   * guard rides inside the output column — a silent inner-join drop
   * would deflate every risk number).
   *
   * Shapes: two keyed aggs + ONE shuffle-hash join on the QID tuple
   * (class-count-sized relations), then a 1-row fold. Cross-engine: the
   * per-class risk terms n/pop_k are 9-rounded doubles summed in
   * DECIMAL(28,9) (the o88 per-stratum rule — a raw double sum is
   * partition-order-dependent); shares are single divisions rounded
   * at 6.
   */
  def kMap(sample: DataFrame, population: DataFrame, qidCols: Seq[String],
      k: Int): DataFrame = {
    require(qidCols.nonEmpty, "kMap: no QID columns")
    require(k >= 2, s"kMap: k must be >= 2, got $k")
    val sc = sample.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val pc = population.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__pk"))
    val guarded = sc.join(pc.hint("shuffle_hash"), qidCols, "left")
      .select(col("__n"),
        when(col("__pk").isNull,
          raise_error(concat(
            lit("kMap: sample class missing from population: "),
            concat_ws(",", qidCols.map(c => col(c).cast("string")): _*)))
            .cast("long"))
          .otherwise(col("__pk")).as("__pk"))
    guarded.agg(
        sum(col("__n")).as("n_records"),
        count(lit(1)).as("n_classes"),
        min(col("__pk")).as("min_pop_k"),
        coalesce(sum(when(col("__pk") === 1, col("__n")).otherwise(0L)),
          lit(0L)).as("pop_unique_records"),
        coalesce(sum(when(col("__pk") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("under_k_records"),
        sum(round(col("__n").cast("double") / col("__pk").cast("double"), 9)
          .cast("decimal(28,9)")).as("__risksum"))
      .select(col("n_records"), col("n_classes"), col("min_pop_k"),
        col("pop_unique_records"), col("under_k_records"),
        when(col("n_records") > 0,
          round(col("under_k_records").cast("double") /
            col("n_records").cast("double"), 6)).as("share_under_k"),
        when(col("n_records") > 0,
          round(col("__risksum").cast("double") /
            col("n_records").cast("double"), 6)).as("exp_risk"))
  }

  /**
   * P369 — QID-subset unicity sweep (Sweeney's attribute-accretion
   * read): for each NESTED prefix of the quasi-identifier list, the
   * share of records whose combination is unique in the dataset — the
   * marginal re-identification cost of releasing ONE MORE attribute,
   * which [[generalizationLadder]] (fixed QID set, varying band width)
   * and [[kMap]] (fixed QID set, external register) cannot show. One
   * row per prefix depth: records, equivalence classes, unique records,
   * unicity share, mean class size.
   *
   * Shape: ONE rollup pass (Spark expands the prefixes map-side — no
   * per-depth rescan) + a depth-keyed re-agg; the grand-total rung is
   * dropped (a 0-QID "class" is the whole table, not a disclosure
   * read). grouping_id lives inside the agg (Spark requirement); depth
   * labels resolve from the rollup's 2^j−1 gid pattern on the driver.
   * Ratios are single divisions of exact BIGINTs rounded at 6.
   */
  def qidUnicitySweep(df: DataFrame, qidCols: Seq[String]): DataFrame = {
    require(qidCols.nonEmpty, "qidUnicitySweep: no QID columns")
    require(qidCols.size <= 8,
      s"qidUnicitySweep: at most 8 QIDs (rollup fan-out), got ${qidCols.size}")
    val m = qidCols.size
    val classes = df
      .rollup(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), grouping_id().as("__gid"))
      .where(col("__gid") < lit((1L << m) - 1L))
    val perDepth = classes.groupBy(col("__gid")).agg(
      count(lit(1)).as("n_classes"),
      sum(col("__cnt")).cast("bigint").as("n_records"),
      sum(when(col("__cnt") === 1, 1L).otherwise(0L)).cast("bigint")
        .as("n_unique"))
    // rollup gids are exactly 2^j − 1 for j aggregated trailing columns
    val depthOf = (1 to m).map { d =>
      ((1L << (m - d)) - 1L, d, qidCols.take(d).mkString(","))
    }
    val depth = depthOf.foldLeft(lit(null).cast("int")) {
      case (acc, (gid, d, _)) =>
        when(col("__gid") === gid, lit(d)).otherwise(acc)
    }
    val label = depthOf.foldLeft(lit(null).cast("string")) {
      case (acc, (gid, _, qs)) =>
        when(col("__gid") === gid, lit(qs)).otherwise(acc)
    }
    perDepth.select(depth.as("depth"), label.as("qids"),
      col("n_records"), col("n_classes"), col("n_unique"),
      when(col("n_records") > 0,
        round(col("n_unique").cast("double") /
          col("n_records").cast("double"), 6)).as("unicity"),
      when(col("n_classes") > 0,
        round(col("n_records").cast("double") /
          col("n_classes").cast("double"), 6)).as("mean_class_size"))
  }
}
