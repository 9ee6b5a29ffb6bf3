package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table

/**
 * Pattern-mining coverage (operators/Association.scala): co-occurrence
 * rule extraction over basket-shaped data.
 */
object MiningQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P91 — association rules over order baskets (order = basket,
    // part = item), minPairCount = 2: at sf0.01 random co-purchases put
    // a long tail of pairs at exactly 2 baskets and a head higher, so
    // every measure exercises non-trivial values; both rule directions
    // emitted, tie-broken deterministically by the (antecedent,
    // consequent) sort
    // P168 — sequential rules over consecutive per-user events: the
    // ordered cousin of fi1 (adds the vs-independence lift q9's
    // probabilities lack)
    "fi2_seq_rules" -> ((s, dir) => {
      graft.operators.Association.sequentialRules(
          graft.Graft.events(s, dir), "user_id", "ts", "event_id",
          "event_type", minCount = 10L)
        .orderBy("from_type", "to_type")
    }),

    "fi1_assoc" -> ((s, dir) => {
      graft.operators.Association.assocRules(
          table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minPairCount = 2L)
        .orderBy("antecedent", "consequent")
    }),

    // P376 — frequent brand triples over order baskets (lineitem →
    // part brand — the part-key space is too sparse for any triple to
    // repeat): lift₃ separates genuine 3-way bundles from
    // pairwise-frequent coincidence
    "fi4_triples" -> ((s, dir) => {
      val baskets = table(s, dir, "lineitem")
        .join(table(s, dir, "part").hint("shuffle_hash"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.operators.Association.frequentTriples(baskets,
          "l_orderkey", "p_brand", minCount = 2L)
        .orderBy("ia", "ib", "ic")
    }),

    // P335 — the full rule-metric panel over the fi1 candidates:
    // leverage (additive excess, immune to lift's rare-pair explosion)
    // and conviction (implication direction) beside the classic three
    "fi3_rule_metrics" -> ((s, dir) => {
      graft.operators.Association.ruleMetrics(
          table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minPairCount = 2L)
        .orderBy("antecedent", "consequent")
    })
  )

  val oracles: Map[String, String] = Map(
    // two basket self-joins with id-order predicates, margin joins on
    // exact BIGINT counts, fixed double closings; `im` margins — an
    // `ic` CTE would shadow the output column
    "fi4_triples" ->
      """WITH bi AS (
        |  SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL),
        |n0 AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM bi),
        |im AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi
        |       GROUP BY 1),
        |p2 AS (
        |  SELECT a.b AS b, a.i AS ia, c.i AS ib
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i),
        |tr AS (
        |  SELECT p2.ia, p2.ib, d.i AS ic3,
        |    CAST(COUNT(*) AS BIGINT) AS n_abc
        |  -- d joins on the basket EQUI key directly: leaving it implied
        |  -- through a.b let the planner reorder into an inequality-only
        |  -- join (measured: 84 GB on a 50k-row relation)
        |  FROM p2 JOIN bi d ON d.b = p2.b AND p2.ib < d.i
        |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
        |SELECT tr.ia, tr.ib, tr.ic3 AS ic, tr.n_abc,
        |  x.n_i AS n_a, y.n_i AS n_b, z.n_i AS n_c,
        |  round(CAST(n_abc AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS support,
        |  round(CAST(n_abc AS DOUBLE) * CAST(nb AS DOUBLE) *
        |      CAST(nb AS DOUBLE) /
        |    (CAST(x.n_i AS DOUBLE) * CAST(y.n_i AS DOUBLE) *
        |      CAST(z.n_i AS DOUBLE)), 6) AS lift3
        |FROM tr JOIN im x ON x.i = tr.ia JOIN im y ON y.i = tr.ib
        |  JOIN im z ON z.i = tr.ic3
        |CROSS JOIN n0
        |ORDER BY ia, ib, ic""".stripMargin,

    // the q9 lead construction; marginals from windowed sums (CAST — a
    // windowed SUM(BIGINT) is HUGEINT, the r7 lesson); minCount filters
    // AFTER the totals
    "fi2_seq_rules" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT *,
        |    CAST(SUM(n_pair) OVER () AS BIGINT) AS n,
        |    CAST(SUM(n_pair) OVER (PARTITION BY from_type) AS BIGINT) AS nf,
        |    CAST(SUM(n_pair) OVER (PARTITION BY to_type) AS BIGINT) AS nt
        |  FROM c)
        |SELECT from_type, to_type, n_pair,
        |  round(CAST(n_pair AS DOUBLE) / CAST(n AS DOUBLE), 6) AS support,
        |  round(CAST(n_pair AS DOUBLE) / CAST(nf AS DOUBLE), 6)
        |    AS confidence,
        |  round((CAST(n_pair AS DOUBLE) / CAST(nf AS DOUBLE)) /
        |    (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS lift
        |FROM t WHERE n_pair >= 10
        |ORDER BY from_type, to_type""".stripMargin,

    // the same distinct-project / self-join / agg / measure sequence;
    // all measures are double ops on exact BIGINT counts with the
    // operator's parenthesization
    // the fi1 CTEs + the leverage/conviction closings; confidence-1
    // rules null conviction
    "fi3_rule_metrics" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM bi),
        |ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi
        |  GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS ia, c.i AS ib, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) >= 2),
        |rules AS (
        |  SELECT ia AS antecedent, ib AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT ib AS antecedent, ia AS consequent, n_ab FROM pairs)
        |SELECT r.antecedent, r.consequent, r.n_ab,
        |  a.n_i AS n_a, c.n_i AS n_b,
        |  round(CAST(r.n_ab AS DOUBLE) / CAST(n.nb AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(r.n_ab AS DOUBLE) / CAST(a.n_i AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(r.n_ab AS DOUBLE) * CAST(n.nb AS DOUBLE) /
        |        (CAST(a.n_i AS DOUBLE) * CAST(c.n_i AS DOUBLE)), 6)
        |    AS lift,
        |  round(CAST(r.n_ab AS DOUBLE) / CAST(n.nb AS DOUBLE) -
        |        CAST(a.n_i AS DOUBLE) / CAST(n.nb AS DOUBLE) *
        |        (CAST(c.n_i AS DOUBLE) / CAST(n.nb AS DOUBLE)), 6)
        |    AS leverage,
        |  CASE WHEN r.n_ab <> a.n_i THEN
        |    round((1.0e0 - CAST(c.n_i AS DOUBLE) / CAST(n.nb AS DOUBLE)) /
        |      (1.0e0 - CAST(r.n_ab AS DOUBLE) / CAST(a.n_i AS DOUBLE)), 6)
        |  END AS conviction
        |FROM rules r
        |JOIN ic a ON a.i = r.antecedent
        |JOIN ic c ON c.i = r.consequent
        |CROSS JOIN n
        |ORDER BY antecedent, consequent""".stripMargin,

    "fi1_assoc" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM bi),
        |ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS ia, c.i AS ib, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) >= 2),
        |rules AS (
        |  SELECT ia AS antecedent, ib AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT ib AS antecedent, ia AS consequent, n_ab FROM pairs)
        |SELECT r.antecedent, r.consequent, r.n_ab,
        |  a.n_i AS n_a, c.n_i AS n_b,
        |  round(CAST(r.n_ab AS DOUBLE) / CAST(n.nb AS DOUBLE), 6) AS support,
        |  round(CAST(r.n_ab AS DOUBLE) / CAST(a.n_i AS DOUBLE), 6) AS confidence,
        |  round(CAST(r.n_ab AS DOUBLE) * CAST(n.nb AS DOUBLE) /
        |        (CAST(a.n_i AS DOUBLE) * CAST(c.n_i AS DOUBLE)), 6) AS lift
        |FROM rules r
        |JOIN ic a ON a.i = r.antecedent
        |JOIN ic c ON c.i = r.consequent
        |CROSS JOIN n
        |ORDER BY antecedent, consequent""".stripMargin
  )
}
