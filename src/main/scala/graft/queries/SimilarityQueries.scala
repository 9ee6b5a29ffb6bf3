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

    // IVF with centroid sample + 4 probes (approximate → rows-only)
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
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
