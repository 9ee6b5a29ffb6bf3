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
