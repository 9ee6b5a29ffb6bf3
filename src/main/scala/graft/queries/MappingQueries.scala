package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{Mapping, VarMeta}

/**
 * Mapping-engine coverage (SURVEY §2.4 F1-F4). Hint building is the
 * data-touching part (one fused scan, SQL-expressible → full oracle);
 * scoring/assignment run on the driver over names and are checked
 * rows-only here plus exhaustively in ScalaTest.
 */
object MappingQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — per-column hints in one aggregation pass
    "f1_hints" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      Mapping.columnHintsDf(o, Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
        .withColumnRenamed("column", "colname")
        .orderBy("colname")
    }),

    // F2 — deterministic sample values (distinct non-empty, sorted, limit 5)
    "f2_samples" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val vals = Mapping.sampleValues(o, "o_orderpriority", 5)
      import s.implicits._
      vals.toDF("v").orderBy("v")
    }),

    // P83 — sorted-neighborhood linkage candidates: customers blocked by
    // market segment, sorted by name, window 4; jw runs the SAME
    // Jaro–Winkler as the mapping scorer, now as a codegen kernel, and
    // the oracle replays rank, neighbor offsets, and DuckDB's
    // jaro_winkler_similarity (parity established by f3)
    "f4_snm" -> ((s, dir) => {
      graft.operators.Linkage.sortedNeighborhood(
          table(s, dir, "customer"), "c_custkey", "c_name", "c_mktsegment",
          window = 4)
        .orderBy("id_a", "id_b")
    }),

    // P103 — q-gram blocking over customer names: rare-gram buckets
    // (freq <= 20) generate 7.4k candidates, JW >= 0.98 keeps ~100 true
    // near-matches; the oracle replays grams, the cap, the bucket join
    // and DuckDB's own jaro_winkler (the kernel's reference algorithm)
    "f5_qgram" -> ((s, dir) => {
      graft.operators.Linkage.qgramBlocking(
          table(s, dir, "customer"), "c_custkey", "c_name",
          q = 4, maxGramFreq = 20L, minJw = 0.98)
        .orderBy("id_a", "id_b")
    }),

    // F3/F4 — scorer + greedy 1:1 assignment over an SDTM-ish renamed frame;
    // JW math is driver-side (rows-only check here, exact cases in ScalaTest)
    "f3_suggest" -> ((s, dir) => {
      val src = table(s, dir, "customer").select(
        col("c_name").as("SUBJID"),
        col("c_custkey").as("AESEQ"),
        col("c_mktsegment").as("AETERM"),
        col("c_nationkey").as("NATIONCD"))
      val hints = Mapping.columnHints(src)
      val vars = Seq(
        VarMeta("USUBJID", Some("Unique Subject Identifier")),
        VarMeta("AESEQ", Some("Sequence Number")),
        VarMeta("AETERM", Some("Reported Term for the Adverse Event")),
        VarMeta("AEDECOD", Some("Dictionary-Derived Term")))
      val out = Mapping.suggestAll(src.columns.toSeq, vars, hints, minConfidence = 0.5)
      import s.implicits._
      // HALF_UP to 6 decimals — the same tie mode as DuckDB's ROUND and
      // Spark's round() used everywhere else (math.rint is half-to-even)
      out.map(x => (x.sourceColumn, x.targetVariable,
          BigDecimal(x.score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("source_column", "target_variable", "score")
        .orderBy("target_variable")
    })
  )

  private def hintOracle(c: String): String =
    s"""SELECT '$c' AS colname,
       |  (cnt_nonblank > 0 AND CAST(cnt_num AS DOUBLE) / cnt_nonblank > 0.9) AS is_numeric,
       |  CASE WHEN cnt_nonblank > 0 THEN CAST(cnt_uniq AS DOUBLE) / cnt_nonblank ELSE 0.0 END AS unique_ratio,
       |  CASE WHEN cnt_total > 0 THEN CAST(cnt_blank AS DOUBLE) / cnt_total ELSE 1.0 END AS null_ratio
       |FROM (SELECT COUNT(*) AS cnt_total,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) = '' THEN 1 ELSE 0 END) AS cnt_blank,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> '' THEN 1 ELSE 0 END) AS cnt_nonblank,
       |        COUNT(DISTINCT CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> ''
       |                            THEN trim(CAST($c AS VARCHAR)) END) AS cnt_uniq,
       |        SUM(CASE WHEN trim(coalesce(CAST($c AS VARCHAR),'')) <> ''
       |                  AND regexp_matches(trim(CAST($c AS VARCHAR)),
       |                      '^[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?$$')
       |             THEN 1 ELSE 0 END) AS cnt_num
       |      FROM orders)""".stripMargin

  val oracles: Map[String, String] = Map(
    "f1_hints" ->
      (Seq("o_orderkey", "o_orderstatus", "o_orderpriority").map(hintOracle)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY colname")),

    "f2_samples" ->
      """SELECT v FROM (
        |  SELECT DISTINCT trim(o_orderpriority) AS v FROM orders
        |  WHERE trim(coalesce(o_orderpriority,'')) <> ''
        |  ORDER BY v LIMIT 5) ORDER BY v""".stripMargin,

    // Full F3 scorer + F4 greedy assignment replayed in SQL. DuckDB's
    // jaro_winkler_similarity is the same rapidfuzz convention as our
    // kernel (0.7 boost threshold, prefix ≤4, p=0.1 — verified equal to 6
    // decimals on this pair matrix); boosts/penalties mirror
    // Mapping.computeScore and the recursive CTE replays the greedy
    // best-first 1:1 assignment with the same stable tie-break
    // (score DESC, then variable-then-column enumeration order). The
    // fixture names carry no separators, so normalizeName reduces to
    // lower().
    "f4_snm" ->
      """WITH r AS (
        |  SELECT c_mktsegment AS block, c_custkey AS id, c_name AS skey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_name, c_custkey) AS rnk
        |  FROM customer)
        |SELECT a.block, a.id AS id_a, b.id AS id_b,
        |  a.skey AS key_a, b.skey AS key_b,
        |  round(jaro_winkler_similarity(a.skey, b.skey), 6) AS jw
        |FROM r a JOIN r b
        |  ON a.block = b.block AND b.rnk - a.rnk BETWEEN 1 AND 3
        |ORDER BY id_a, id_b""".stripMargin,

    "f5_qgram" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS key
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        |    AND lower(trim(c_name)) <> ''),
        |grams AS (
        |  SELECT id, unnest(list_distinct(
        |    [substr(key, i + 1, 4)
        |     FOR i IN range(0, greatest(len(key) - 4, 0) + 1)])) AS gram
        |  FROM base),
        |rare AS (SELECT gram FROM grams GROUP BY 1 HAVING COUNT(*) <= 20),
        |blocked AS (SELECT g.gram, g.id FROM grams g JOIN rare USING (gram)),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM blocked a JOIN blocked b ON a.gram = b.gram AND a.id < b.id)
        |SELECT p.id_a, p.id_b, x.key AS key_a, y.key AS key_b,
        |  round(jaro_winkler_similarity(x.key, y.key), 6) AS jw
        |FROM pairs p
        |JOIN base x ON x.id = p.id_a
        |JOIN base y ON y.id = p.id_b
        |WHERE round(jaro_winkler_similarity(x.key, y.key), 6) >= 0.98e0
        |ORDER BY id_a, id_b""".stripMargin,

    "f3_suggest" ->
      """WITH RECURSIVE
        |src AS (SELECT c_name AS c1, CAST(c_custkey AS VARCHAR) AS c2,
        |               c_mktsegment AS c3, CAST(c_nationkey AS VARCHAR) AS c4 FROM customer),
        |numstats AS (
        |  SELECT 'SUBJID' AS col, 1 AS col_ord,
        |         SUM(CASE WHEN trim(c1) <> '' THEN 1 ELSE 0 END) AS nn,
        |         SUM(CASE WHEN trim(c1) <> '' AND regexp_full_match(trim(c1), '[+-]?((\d+\.?\d*)|(\.\d+))([eE][+-]?\d+)?') THEN 1 ELSE 0 END) AS num FROM src
        |  UNION ALL
        |  SELECT 'AESEQ', 2,
        |         SUM(CASE WHEN trim(c2) <> '' THEN 1 ELSE 0 END),
        |         SUM(CASE WHEN trim(c2) <> '' AND regexp_full_match(trim(c2), '[+-]?((\d+\.?\d*)|(\.\d+))([eE][+-]?\d+)?') THEN 1 ELSE 0 END) FROM src
        |  UNION ALL
        |  SELECT 'AETERM', 3,
        |         SUM(CASE WHEN trim(c3) <> '' THEN 1 ELSE 0 END),
        |         SUM(CASE WHEN trim(c3) <> '' AND regexp_full_match(trim(c3), '[+-]?((\d+\.?\d*)|(\.\d+))([eE][+-]?\d+)?') THEN 1 ELSE 0 END) FROM src
        |  UNION ALL
        |  SELECT 'NATIONCD', 4,
        |         SUM(CASE WHEN trim(c4) <> '' THEN 1 ELSE 0 END),
        |         SUM(CASE WHEN trim(c4) <> '' AND regexp_full_match(trim(c4), '[+-]?((\d+\.?\d*)|(\.\d+))([eE][+-]?\d+)?') THEN 1 ELSE 0 END) FROM src),
        |hints AS (SELECT col, col_ord, (nn > 0 AND num * 1.0 / nn > 0.9) AS is_num FROM numstats),
        |vars(var, var_ord) AS (VALUES ('USUBJID', 1), ('AESEQ', 2), ('AETERM', 3), ('AEDECOD', 4)),
        |scores AS (
        |  SELECT h.col, v.var, h.col_ord, v.var_ord,
        |    jaro_winkler_similarity(lower(h.col), lower(v.var))
        |    * (CASE WHEN h.col LIKE '%SEQ' AND v.var LIKE '%SEQ' THEN 1.05
        |            WHEN h.col LIKE '%SEQ' OR v.var LIKE '%SEQ' THEN 0.6 ELSE 1 END)
        |    * (CASE WHEN h.col LIKE '%CD' AND v.var NOT LIKE '%CD' THEN 0.7 ELSE 1 END)
        |    * (CASE WHEN v.var LIKE '%CD' AND h.col NOT LIKE '%CD' THEN 0.8 ELSE 1 END)
        |    * (CASE WHEN (v.var LIKE '%N') <> h.is_num THEN 0.85 ELSE 1 END) AS score
        |  FROM hints h CROSS JOIN vars v),
        |cand AS (SELECT * FROM scores WHERE score >= 0.5),
        |g(n, cols_used, vars_used, col, var, score) AS (
        |  SELECT 1, [c.col], [c.var], c.col, c.var, c.score
        |  FROM (SELECT * FROM cand ORDER BY score DESC, var_ord, col_ord LIMIT 1) c
        |  UNION ALL
        |  SELECT g.n + 1, list_append(g.cols_used, c.col), list_append(g.vars_used, c.var),
        |         c.col, c.var, c.score
        |  FROM g, LATERAL (
        |    SELECT * FROM cand
        |    WHERE NOT list_contains(g.cols_used, cand.col)
        |      AND NOT list_contains(g.vars_used, cand.var)
        |    ORDER BY score DESC, var_ord, col_ord LIMIT 1) c)
        |SELECT col AS source_column, var AS target_variable, ROUND(score, 6) AS score
        |FROM g ORDER BY target_variable""".stripMargin
  )
}
