package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.Privacy

/**
 * Privacy-gate coverage. pv1: k-anonymity over (nation, market segment,
 * account-balance band) quasi-identifiers — every row annotated with its
 * QID multiplicity and releasability, replayed exactly by a window count
 * in SQL.
 */
object PrivacyQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P77 — k = 5 over a QID grid sparse enough that both outcomes occur
    "pv1_kanon" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      Privacy.kAnonymityFilter(c,
          Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
        .orderBy("c_custkey")
    }),

    // P294 — re-identification risk over the pv1 QID grid BEFORE any
    // filtering: prosecutor max risk, expected record risk, and the
    // share of records under the k = 5 bar pv1 enforces
    "pv9_reid_risk" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      Privacy.reidentificationRisk(c,
        Seq("c_nationkey", "c_mktsegment", "bal_band"))
    }),

    // P340 — k-map over the customer register: the release is every 7th
    // customer, the population is the full table, QIDs = (nation,
    // 2000-wide balance band) — ~150 register classes over the customer
    // table, sized so classes STRADDLE k = 5 (the pv9-style
    // (nation, segment, fine-band) QIDs measured 99.5% under-k at the
    // gate SF — a saturated read that adds nothing over pv9)
    "pv10_kmap" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      Privacy.kMap(c.where(col("c_custkey") % 7 === 0), c,
        Seq("c_nationkey", "bal_band"), k = 5)
    }),

    // P89 — ℓ = 10 over (nation, segment) QID groups with the balance
    // band as the sensitive attribute: ~125 groups of ~12 rows at
    // sf0.01, distinct bands straddle 10, so both outcomes occur
    "pv3_ldiversity" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      Privacy.lDiversityFilter(c,
          Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 10)
        .orderBy("c_custkey")
    }),

    // P123 — t = 0.1 closeness of each market segment's balance-band
    // distribution against the global one: ordered EMD from exact
    // integer cumulative counts; both outcomes occur
    // P160 — stable keyed pseudonyms for customer ids + the collision
    // audit (distinct ids vs distinct 64-bit tokens)
    "pv5_pseudonym" -> ((s, dir) => {
      graft.operators.Privacy.pseudonymize(
          table(s, dir, "customer"), "c_custkey", "pv5:")
        .orderBy("c_custkey")
    }),

    "pv4_tcloseness" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      Privacy.tCloseness(c, Seq("c_mktsegment"), "bal_band", t = 0.1)
        .orderBy("c_mktsegment")
    }),

    // P84 — ε = 0.5 Laplace counts per (event_type, value-band): the
    // banded second key makes group sizes range widely, so clamping and
    // both noise signs occur; the oracle replays the md5 uniform and the
    // clamped inverse-CDF through the 9-decimal firewall
    "pv2_dp_counts" -> ((s, dir) => {
      val e = table(s, dir, "events").select(col("event_type"),
        floor(col("value") / 25).cast("long").as("band"))
      Privacy.laplaceNoisyCounts(e, Seq("event_type", "band"),
          epsilon = 0.5)
        .orderBy("event_type", "band")
    }),

    // P200 — ε = 1 DP mean of the event value per type, clipped to
    // [0, 400]; both halved-budget draws replay through the firewall,
    // true_mean rides along as the utility audit
    "pv6_dpmean" -> ((s, dir) => {
      Privacy.laplaceNoisyMean(
          table(s, dir, "events").select("event_type", "value"),
          Seq("event_type"), "value", lo = 0.0, hi = 400.0, epsilon = 1.0)
        .orderBy("event_type")
    }),

    // P233 — generalization ladder over (nation, segment, balance
    // band): the coarsening curve from 3.5% releasable at width 1000
    // to ~74% at 8000 (measured at sf0.01)
    "pv8_generalize" -> ((s, dir) => {
      Privacy.generalizationLadder(
          table(s, dir, "customer")
            .select("c_nationkey", "c_mktsegment", "c_acctbal"),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal",
          widths = Seq(1000L, 2000L, 4000L, 8000L), k = 5)
        .orderBy("width")
    }),

    // P218 — Warner randomized response at p = 75% on "is a BUILDING
    // customer", estimated per nation: ~12 respondents per group at
    // sf0.01, so the per-group flip noise is visible in `err` while the
    // integer-ratio debias stays exact
    // P385 — suppression gain: the pv9 risk panel BEFORE and AFTER the
    // pv1-style k = 5 filter on ONE QID grid — the one-table answer to
    // "what did suppression buy" (after-rows have min class k ≥ 5 by
    // construction, so max_risk caps at 0.2 and under-5 share at 0).
    // Grid = (nation, 8000-band): the only sweep member whose
    // keep/drop split is non-trivial at BOTH SFs (measured 73/77 at
    // sf0.001, 1473/27 at sf0.01 — pv1's finer grid suppresses
    // EVERYTHING at sf0.001 and the coarse ones drop nothing at
    // sf0.01)
    "pv12_suppression_gain" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") / 8000).cast("long").as("bal_band"))
      val qids = Seq("c_nationkey", "bal_band")
      val kept = Privacy.kAnonymityFilter(c, qids, k = 5)
        .where(col("kept"))
        .select(col("c_custkey"), col("c_nationkey"), col("bal_band"))
      def tag(stage: String, r: org.apache.spark.sql.DataFrame) =
        r.select(lit(stage).as("stage"), col("n_records"),
          col("n_classes"), col("min_class_k"), col("unique_records"),
          col("max_risk"), col("expected_risk"), col("pct_under_5"))
      tag("raw", Privacy.reidentificationRisk(c, qids))
        .unionAll(tag("suppressed",
          Privacy.reidentificationRisk(kept, qids)))
        .orderBy("stage")
    }),

    // P369 — unicity sweep over nested QIDs (nation → +segment →
    // +100-wide balance band): the marginal re-identification cost of
    // each additional released attribute — pv8 coarsens a FIXED QID
    // set, this accretes the set itself
    "pv11_unicity" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100).cast("long").as("bal_band"))
      Privacy.qidUnicitySweep(c,
          Seq("c_nationkey", "c_mktsegment", "bal_band"))
        .orderBy("depth")
    }),

    "pv7_randresp" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(
        col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("sensitive"),
        col("c_nationkey"))
      Privacy.randomizedResponse(c, "c_custkey", "sensitive",
          "c_nationkey", pPct = 75, salt = "rr:")
        .orderBy("c_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    // one class agg + one closing agg; expected risk = classes/records
    "pv9_reid_risk" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |  FROM customer),
        |cl AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k
        |  FROM c GROUP BY c_nationkey, c_mktsegment, bal_band)
        |SELECT CAST(SUM(k) AS BIGINT) AS n_records,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(MIN(k) AS BIGINT) AS min_class_k,
        |  CAST(coalesce(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS unique_records,
        |  CASE WHEN MIN(k) > 0 THEN
        |    round(1.0e0 / CAST(MIN(k) AS DOUBLE), 6) END AS max_risk,
        |  CASE WHEN SUM(k) > 0 THEN
        |    round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6)
        |  END AS expected_risk,
        |  CASE WHEN SUM(k) > 0 THEN
        |    round(CAST(coalesce(SUM(CASE WHEN k < 5 THEN k ELSE 0 END), 0)
        |      AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6)
        |  END AS pct_under_5
        |FROM cl""".stripMargin,
    // population classes from the full register, sample classes from the
    // every-7th release, risk terms 9-rounded then exactly summed
    "pv10_kmap" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
        |  FROM customer),
        |pc AS (
        |  SELECT c_nationkey, bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS pk
        |  FROM c GROUP BY 1, 2),
        |sc AS (
        |  SELECT c_nationkey, bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM c WHERE c_custkey % 7 = 0 GROUP BY 1, 2),
        |j AS (
        |  SELECT sc.n, pc.pk FROM sc JOIN pc USING
        |    (c_nationkey, bal_band))
        |SELECT CAST(SUM(n) AS BIGINT) AS n_records,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(MIN(pk) AS BIGINT) AS min_pop_k,
        |  CAST(coalesce(SUM(CASE WHEN pk = 1 THEN n ELSE 0 END), 0)
        |    AS BIGINT) AS pop_unique_records,
        |  CAST(coalesce(SUM(CASE WHEN pk < 5 THEN n ELSE 0 END), 0)
        |    AS BIGINT) AS under_k_records,
        |  CASE WHEN SUM(n) > 0 THEN
        |    round(CAST(coalesce(SUM(CASE WHEN pk < 5 THEN n ELSE 0 END), 0)
        |      AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |  END AS share_under_k,
        |  CASE WHEN SUM(n) > 0 THEN
        |    round(CAST(SUM(CAST(round(CAST(n AS DOUBLE) /
        |      CAST(pk AS DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE) /
        |      CAST(SUM(n) AS DOUBLE), 6)
        |  END AS exp_risk
        |FROM j""".stripMargin,

    // the identical salted-MD5 prefix; collisions from one scalar audit
    "pv5_pseudonym" ->
      """WITH m AS (
        |  SELECT DISTINCT c_custkey,
        |    substr(md5('pv5:' || CAST(c_custkey AS VARCHAR)), 1, 16)
        |      AS pseudonym
        |  FROM customer WHERE c_custkey IS NOT NULL),
        |a AS (SELECT CAST(COUNT(*) - COUNT(DISTINCT pseudonym) AS BIGINT)
        |        AS collisions FROM m)
        |SELECT c_custkey, pseudonym, collisions FROM m, a
        |ORDER BY c_custkey""".stripMargin,

    // cumulative counts stay exact BIGINTs on both sides (window double
    // sums pair additions differently — DuckDB's windowed aggregation is
    // a segment tree); |r| rounds at 9 and DECIMAL-sums
    "pv4_tcloseness" ->
      """WITH base AS (
        |  SELECT c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS gc FROM base GROUP BY 1),
        |vals AS (
        |  SELECT v,
        |    CAST(SUM(gc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumg,
        |    CAST(SUM(gc) OVER () AS BIGINT) AS gtot,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM g),
        |cc AS (SELECT c_mktsegment, v, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM base GROUP BY 1, 2),
        |cls AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM base GROUP BY 1),
        |grid AS (
        |  SELECT cls.c_mktsegment, cls.n, vals.v, vals.cumg, vals.gtot, vals.m,
        |    CAST(coalesce(cc.cnt, 0) AS BIGINT) AS cnt
        |  FROM cls CROSS JOIN vals
        |  LEFT JOIN cc ON cc.c_mktsegment = cls.c_mktsegment AND cc.v = vals.v),
        |x AS (
        |  SELECT c_mktsegment, n, m, cumg, gtot,
        |    CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumc
        |  FROM grid),
        |e AS (
        |  SELECT c_mktsegment, n,
        |    SUM(CAST(round(abs(CAST(cumc AS DOUBLE) / CAST(n AS DOUBLE) -
        |        CAST(cumg AS DOUBLE) / CAST(gtot AS DOUBLE)), 9)
        |      AS DECIMAL(28,9))) AS s,
        |    CAST(MAX(m) AS BIGINT) AS mm
        |  FROM x GROUP BY 1, 2)
        |SELECT c_mktsegment, n,
        |  CASE WHEN mm > 1
        |       THEN round(CAST(s AS DOUBLE) / CAST(mm - 1 AS DOUBLE), 6)
        |       ELSE 0.0e0 END AS emd,
        |  (CASE WHEN mm > 1
        |        THEN round(CAST(s AS DOUBLE) / CAST(mm - 1 AS DOUBLE), 6)
        |        ELSE 0.0e0 END) <= 0.1e0 AS kept
        |FROM e ORDER BY c_mktsegment""".stripMargin,

    // floor() before the BIGINT cast — CAST(double AS BIGINT) ROUNDS in
    // DuckDB while Spark's floor().cast matches floor semantics
    "pv1_kanon" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment, bal_band,
        |  CAST(COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band) AS BIGINT) AS qid_group_n,
        |  COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band) >= 5 AS kept
        |FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
        |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    // entropy terms −p·ln p rounded at 9 then DECIMAL-summed (the libm
    // firewall); the decimal cast collapses the p=1 group's −0.0 to 0 on
    // both engines
    "pv3_ldiversity" ->
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |  FROM customer),
        |pc AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band AS sv,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM base GROUP BY 1, 2, 3),
        |pw AS (
        |  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment)
        |                 AS BIGINT) AS gn
        |  FROM pc),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(COUNT(*) AS BIGINT) AS sens_distinct,
        |    CAST(SUM(CAST(round(-(CAST(cnt AS DOUBLE) / CAST(gn AS DOUBLE)) *
        |          ln(CAST(cnt AS DOUBLE) / CAST(gn AS DOUBLE)), 9)
        |        AS DECIMAL(28,9))) AS DOUBLE) AS sens_entropy
        |  FROM pw GROUP BY 1, 2)
        |SELECT b.c_custkey, b.c_nationkey, b.c_mktsegment, b.bal_band,
        |  g.sens_distinct, g.sens_entropy,
        |  g.sens_distinct >= 10 AS kept
        |FROM base b JOIN g USING (c_nationkey, c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,

    // uniform = the repo-standard (md5-fold + 1) / 2^56; b = 1/0.5 = 2;
    // log argument clamped at 2^-56 exactly like the operator; e0
    // suffixes force DOUBLE literals
    "pv2_dp_counts" ->
      """WITH g AS (
        |  SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS band,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (
        |  SELECT event_type, band, n,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('dp' ||
        |          concat_ws('|', event_type, CAST(band AS VARCHAR))), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM g),
        |d AS (
        |  SELECT event_type, band, n,
        |    round(-2.0e0 * sign(uu - 0.5e0) *
        |      ln(greatest(1.0e0 - 2.0e0 * abs(uu - 0.5e0),
        |                  1.0e0 / 72057594037927936.0e0)), 9) AS noise
        |  FROM (SELECT *, CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0 AS uu
        |        FROM h))
        |SELECT event_type, band, n, noise,
        |  greatest(0.0e0, CAST(n AS DOUBLE) + noise) AS noisy_n
        |FROM d ORDER BY event_type, band""".stripMargin,

    // the same inverse-CDF replay twice (sum b=800, count b=2) over the
    // clipped decimal sums; dp_mean clamps back to [0, 400]
    "pv6_dpmean" ->
      """WITH g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    round(CAST(SUM(CAST(LEAST(GREATEST(value, 0.0e0), 400.0e0)
        |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_clipped,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE), 6) AS true_mean
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |h AS (
        |  SELECT *,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('dpmean:s:' || event_type),
        |          1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hs,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('dpmean:c:' || event_type),
        |          1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hc
        |  FROM g),
        |d AS (
        |  SELECT event_type, n, sum_clipped, true_mean,
        |    round(-800.0e0 * sign(us - 0.5e0) *
        |      ln(greatest(1.0e0 - 2.0e0 * abs(us - 0.5e0),
        |                  1.0e0 / 72057594037927936.0e0)), 9) AS ns,
        |    round(-2.0e0 * sign(uc - 0.5e0) *
        |      ln(greatest(1.0e0 - 2.0e0 * abs(uc - 0.5e0),
        |                  1.0e0 / 72057594037927936.0e0)), 9) AS nc
        |  FROM (SELECT *,
        |          CAST(hs + 1 AS DOUBLE) / 72057594037927936.0e0 AS us,
        |          CAST(hc + 1 AS DOUBLE) / 72057594037927936.0e0 AS uc
        |        FROM h))
        |SELECT event_type, n, sum_clipped, true_mean,
        |  round(LEAST(GREATEST(
        |    (sum_clipped + ns) /
        |      GREATEST(1.0e0, CAST(n AS DOUBLE) + nc),
        |    0.0e0), 400.0e0), 6) AS dp_mean
        |FROM d ORDER BY event_type""".stripMargin,

    // one group-size subquery per rung, exact BIGINT counts, floor-band
    // replay (the pv1 construction)
    "pv8_generalize" -> {
      val rung = (w: Long) =>
        s"""SELECT $w AS width, CAST(SUM(gn) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_groups,
           |  CAST(SUM(CASE WHEN gn >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_safe_groups,
           |  CAST(SUM(CASE WHEN gn >= 5 THEN gn ELSE 0 END) AS BIGINT)
           |    AS n_safe_rows
           |FROM (SELECT COUNT(*) AS gn FROM customer
           |      GROUP BY c_nationkey, c_mktsegment,
           |        CAST(floor(c_acctbal / $w) AS BIGINT))""".stripMargin
      s"""WITH u AS (
         |${Seq(1000L, 2000L, 4000L, 8000L).map(rung).mkString("\nUNION ALL\n")})
         |SELECT width, n_rows, n_groups, n_safe_groups, n_safe_rows,
         |  round(CAST(n_safe_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         |    AS share_safe
         |FROM u ORDER BY width""".stripMargin
    },

    // the pv9 aggregate twice — raw classes, then classes over the
    // window-filtered (gn ≥ 5) subset; one UNION, stage-tagged
    "pv12_suppression_gain" -> {
      val panel = (stage: String, src: String) =>
        s"""SELECT '$stage' AS stage, CAST(SUM(k) AS BIGINT) AS n_records,
           |  CAST(COUNT(*) AS BIGINT) AS n_classes,
           |  CAST(MIN(k) AS BIGINT) AS min_class_k,
           |  CAST(coalesce(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END), 0)
           |    AS BIGINT) AS unique_records,
           |  CASE WHEN MIN(k) > 0 THEN
           |    round(1.0e0 / CAST(MIN(k) AS DOUBLE), 6) END AS max_risk,
           |  CASE WHEN SUM(k) > 0 THEN
           |    round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6)
           |  END AS expected_risk,
           |  CASE WHEN SUM(k) > 0 THEN
           |    round(CAST(coalesce(SUM(CASE WHEN k < 5 THEN k ELSE 0 END),
           |      0) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6)
           |  END AS pct_under_5
           |FROM $src""".stripMargin
      s"""WITH c AS (
         |  SELECT c_custkey, c_nationkey,
         |    CAST(floor(c_acctbal / 8000) AS BIGINT) AS bal_band
         |  FROM customer),
         |cl AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k
         |  FROM c GROUP BY c_nationkey, bal_band),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT c_nationkey, bal_band,
         |      COUNT(*) OVER (PARTITION BY c_nationkey, bal_band) AS gn
         |    FROM c)
         |  WHERE gn >= 5),
         |cl2 AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k
         |  FROM kept GROUP BY c_nationkey, bal_band),
         |u AS (
         |${panel("raw", "cl")}
         |UNION ALL
         |${panel("suppressed", "cl2")})
         |SELECT * FROM u ORDER BY stage""".stripMargin
    },

    // one class-size subquery per prefix depth, exact BIGINT counts,
    // floor-band replay (the pv1 construction); ratios divide exact
    // BIGINTs and round at 6
    "pv11_unicity" -> {
      val rung = (d: Int, qids: String) =>
        s"""SELECT $d AS depth, '$qids' AS qids,
           |  CAST(SUM(gn) AS BIGINT) AS n_records,
           |  CAST(COUNT(*) AS BIGINT) AS n_classes,
           |  CAST(coalesce(SUM(CASE WHEN gn = 1 THEN 1 ELSE 0 END), 0)
           |    AS BIGINT) AS n_unique
           |FROM (SELECT COUNT(*) AS gn FROM base GROUP BY $qids)""".stripMargin
      s"""WITH base AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_band
         |  FROM customer),
         |u AS (
         |${Seq(
             rung(1, "c_nationkey"),
             rung(2, "c_nationkey,c_mktsegment"),
             rung(3, "c_nationkey,c_mktsegment,bal_band"))
           .mkString("\nUNION ALL\n")})
         |SELECT depth, qids, n_records, n_classes, n_unique,
         |  CASE WHEN n_records > 0 THEN
         |    round(CAST(n_unique AS DOUBLE) / CAST(n_records AS DOUBLE), 6)
         |  END AS unicity,
         |  CASE WHEN n_classes > 0 THEN
         |    round(CAST(n_records AS DOUBLE) / CAST(n_classes AS DOUBLE), 6)
         |  END AS mean_class_size
         |FROM u ORDER BY depth""".stripMargin
    },

    // the identical 56-bit coin in INTEGER space (hv·100 vs 75·2^56);
    // the debias is an exact BIGINT ratio, err a decimal difference of
    // the two 6-rounded rates
    "pv7_randresp" ->
      """WITH h AS (
        |  SELECT c_nationkey, (c_mktsegment = 'BUILDING') AS truth,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('rr:' ||
        |          COALESCE(CAST(c_custkey AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM customer
        |  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL),
        |r AS (
        |  SELECT c_nationkey, truth,
        |    CASE WHEN hv * 100 < 5404319552844595200 THEN truth
        |         ELSE NOT truth END AS rep
        |  FROM h),
        |g AS (
        |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(SUM(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS nr
        |  FROM r GROUP BY 1),
        |o AS (
        |  SELECT c_nationkey, n,
        |    round(CAST(nt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_true,
        |    round(CAST(nr AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS rate_reported,
        |    round(CAST(100 * nr - 25 * n AS DOUBLE) /
        |      CAST(n * 50 AS DOUBLE), 6) AS est_rate
        |  FROM g)
        |SELECT c_nationkey, n, rate_true, rate_reported, est_rate,
        |  CAST(CAST(est_rate AS DECIMAL(18,6)) -
        |    CAST(rate_true AS DECIMAL(18,6)) AS DOUBLE) AS err
        |FROM o ORDER BY c_nationkey""".stripMargin
  )
}
