package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.Similarity

/**
 * Similarity-search coverage over `embeddings`. Brute-force top-k carries a
 * full DuckDB oracle: scores round to 6 decimals and rank ties break on id,
 * so the 1-2 ulp accumulation differences between engines cannot flip the
 * comparison. IVF is approximate → rows-only here, recall pinned in
 * SimilaritySpec.
 */
object SimilarityQueries {

  // raw float arrays — VecL2Norm widens to double inside its codegen'd
  // kernel, so no interpreted transform-cast rides the corpus scan
  private def emb(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact cosine top-5 for 10 query vectors
    "sim1_brute_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 10)
      Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
        .select(col("query_id"), col("rank"), col("id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // IVF with centroid sample + 4 probes — "approximate" relative to exact
    // kNN, but fully DETERMINISTIC given the data: assignment, probing, and
    // ranking are pure double arithmetic in a fixed order, so the oracle
    // recomputes the identical pipeline (see oracle note below)
    "sim2_ivf_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("centroid_id"), col("v"))
      val queries = e.where(col("vec_id") < 10)
      val indexed = Similarity.ivfAssign(e, centroids, "vec_id", "v")
      Similarity.ivfTopK(indexed, centroids, queries, "vec_id", "v", k = 5, nProbe = 4)
        .select(col("query_id"), col("rank"), col("id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim1_brute_topk" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |         list_cosine_similarity(c.v, q.v) AS cos
        |  FROM e c JOIN e q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, id, ROUND(cos, 6) AS cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Full IVF pipeline replayed in SQL. Why this matches bit-for-bit: both
    // engines widen float→double exactly, and every reduction (norm, dot) is
    // a SEQUENTIAL left fold in index order — VecEval's while-loops on the
    // Spark side, list_reduce(list_prepend(0.0, …)) here — so the IEEE
    // doubles are identical, argmax routing and ranks agree exactly, and
    // the rounded cosines hash-match (verified at sf0.01 and sf0.1).
    "sim2_ivf_topk" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |norm AS (SELECT vec_id,
        |    CASE WHEN sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN v]), (a,b) -> a+b)) > 0
        |         THEN [x / sqrt(list_reduce(list_prepend(0.0, [y*y FOR y IN v]), (a,b) -> a+b)) FOR x IN v]
        |         ELSE [0.0 FOR x IN v] END AS v
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv FROM norm WHERE vec_id % 31 = 0),
        |assign AS (
        |  SELECT vec_id, v, centroid_id FROM (
        |    SELECT n.vec_id, n.v, c.centroid_id,
        |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |             ORDER BY list_reduce(list_prepend(0.0, [n.v[i] * c.cv[i] FOR i IN range(1, len(n.v)+1)]), (a,b) -> a+b) DESC,
        |             c.centroid_id ASC) AS rn
        |    FROM norm n CROSS JOIN cents c) WHERE rn = 1),
        |queries AS (SELECT vec_id AS query_id, v AS qv FROM norm WHERE vec_id < 10),
        |probes AS (
        |  SELECT query_id, qv, centroid_id FROM (
        |    SELECT q.query_id, q.qv, c.centroid_id,
        |           ROW_NUMBER() OVER (PARTITION BY q.query_id
        |             ORDER BY list_reduce(list_prepend(0.0, [q.qv[i] * c.cv[i] FOR i IN range(1, len(q.qv)+1)]), (a,b) -> a+b) DESC,
        |             c.centroid_id ASC) AS rn
        |    FROM queries q CROSS JOIN cents c) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS id,
        |         list_reduce(list_prepend(0.0, [a.v[i] * p.qv[i] FOR i IN range(1, len(a.v)+1)]), (a2,b2) -> a2+b2) AS cos
        |  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
        |  WHERE p.query_id <> a.vec_id),
        |ranked AS (
        |  SELECT query_id, id, ROUND(cos, 6) AS cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
