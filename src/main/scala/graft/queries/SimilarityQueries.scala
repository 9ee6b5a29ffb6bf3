package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.Similarity

/**
 * Similarity-search coverage over `embeddings`, all with full DuckDB
 * oracles. Brute-force top-k rounds scores to 6 decimals and breaks rank
 * ties on id, so 1-2 ulp accumulation differences between engines cannot
 * flip the comparison; sim2 (IVF) and sim3 (k-means refinement) replay the
 * exact pipeline in SQL — see the per-oracle notes for why each is
 * bit-exact. Approximation QUALITY (IVF recall, refinement inertia) is
 * pinned in SimilaritySpec.
 */
object SimilarityQueries {

  // raw float arrays — VecL2Norm widens to double inside its codegen'd
  // kernel, so no interpreted transform-cast rides the corpus scan
  private def emb(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P130 — hybrid retrieval (the RAG shape): BM25 lexical candidates
    // (top-50 on the iv2 query terms) re-ranked by exact embedding
    // cosine against doc 7's vector, top-10 out. Composition of two
    // verified stages — the oracle replays both; ranking on the ROUNDED
    // cosine with doc_id tie-break (the t6 rule)
    "pipe3_hybrid" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cands = graft.operators.TextAnalysis.bm25TopK(
          table(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "vector"), k = 50)
        .select(col("id").as("doc_id"), col("score").as("bm25"),
          col("rank").as("bm25_rank"))
      val e = emb(s, dir).select(col("vec_id").as("doc_id"),
        graft.operators.Dedup.l2Normalize(col("v")).as("nv"))
      val qv = e.where(col("doc_id") === 7).select(col("nv").as("qv"))
      cands.join(e.hint("shuffle_hash"), Seq("doc_id"))
        .where(col("doc_id") =!= 7)
        .crossJoin(broadcast(qv))
        .withColumn("cosine",
          round(graft.operators.Dedup.dotProduct(col("nv"), col("qv")), 6))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cosine").desc, col("doc_id").asc)))
        .where(col("rank") <= 10)
        .select("doc_id", "bm25", "bm25_rank", "cosine", "rank")
        .orderBy("rank")
    }),

    // P274 — corpus isotropy audit: mean pairwise cosine via the
    // sum-vector identity (one linear sweep, NO pairwise pass) + the
    // centroid norm — the drift alarm for d7/d12's cosine thresholds
    "sim12_isotropy" -> ((s, dir) => {
      Similarity.isotropyAudit(emb(s, dir), "vec_id", "v")
    }),

    // P331 — hubness audit: how often each vector appears in OTHER
    // points' top-5 (queries = the deterministic 20% hash slice — the
    // scale path; all-pairs is the documented brute class). High-skew
    // in-degree = distance concentration, the silent ANN-quality
    // killer sim9's recall number can't see
    "sim13_hubness" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") % 5 === 0)
      val knn = Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
      val top = knn.groupBy(col("id")).agg(count(lit(1)).as("n_occ"))
        .orderBy(col("n_occ").desc, col("id").asc).limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occ").desc, col("id").asc)
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("id"), col("n_occ"))
        .orderBy("rank")
    }),

    // exact cosine top-5 for 10 query vectors
    "sim1_brute_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 10)
      Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
        .select(col("query_id"), col("rank"), col("id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ONE spherical-k-means refinement round over the same seed centroids,
    // flattened to (centroid_id, n_members, pos, m) cells. One iteration is
    // the provably-deterministic case: the seed assignment replays sim2's
    // bit-exact machinery, cluster sums go through DECIMAL (exact, so both
    // engines agree to the last place), and the mean is then one double
    // division of identical operands — nothing downstream re-routes on the
    // means, so no argmax can flip. Multi-iteration refinement is covered
    // by SimilaritySpec (inertia-decrease + empty-cluster invariants).
    "sim3_kmeans_refine" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("centroid_id"), col("v"))
      val refined = Similarity.kmeansRefine(e, centroids, "vec_id", "v", iters = 1)
      // sizes re-run the assignment projection: in the fully-lazy no-cache
      // design (see the d5 lesson in CLAUDE.md) the means consumer and the
      // sizes consumer would each execute the scan anyway — sharing one
      // `assigned` frame between two groupBys does not merge the scans,
      // only a cache would, and caching inside a query builder blinds
      // plan pins and truncates lineage
      val sizes = Similarity.ivfAssign(e, centroids, "vec_id", "v")
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_members"))
      refined
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "m")))
        .join(sizes, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("n_members"), lit(0L)).as("n_members"),
          col("pos").cast("long").as("pos"), round(col("m"), 6).as("m"))
        .orderBy("centroid_id", "pos")
    }),

    // P45 — PQ encode: 64 float dims → 8 codes (codebooks = the 16
    // lowest-id vectors, read in place per subspace). Deterministic like
    // sim2: every squared-L2 fold runs in ascending dimension order on
    // both engines, so argmin routing (ties to the lowest code) is exact
    "sim4_pq_encode" -> ((s, dir) => {
      val e = emb(s, dir)
      val (books, dsub) = Similarity.pqCodebooks(e, "vec_id", "v", m = 8, k = 16)
      Similarity.pqEncode(e, books, dsub, "vec_id", "v")
        .select(col("id").as("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
        .orderBy("vec_id", "m")
    }),

    // P46 — ADC top-5 per query over the PQ codes: per-query distance
    // tables on the driver, one compiled pass over the codes column for
    // the whole query set; ranks on the 6-decimal-rounded distance with
    // an id tie-break (the t6 discipline)
    "sim5_adc_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val (books, dsub) = Similarity.pqCodebooks(e, "vec_id", "v", m = 8, k = 16)
      val codes = Similarity.pqEncode(e, books, dsub, "vec_id", "v")
      val queries = e.where(col("vec_id") % 125 === 0)
      Similarity.pqAdcTopK(codes, queries, books, dsub, "vec_id", "v", k = 5)
        .orderBy("query_id", "rank")
    }),

    // P73 — MMR re-ranking: top-20 candidates per query (rounded cosine,
    // id tie-break), then greedy λ-relevance / (1−λ)-redundancy selection
    // of 5; the oracle replays the greedy walk in a recursive CTE with
    // the identical rounded cosines and (1.0 − 0.7) penalty coefficient
    "sim8_mmr" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.mmrRerank(e, e.where(col("vec_id") % 1000 === 0),
          "vec_id", "v", nCandidates = 20, k = 5, lambda = 0.7)
        .withColumnRenamed("id", "vec_id")
        .orderBy("query_id", "rank")
    }),

    // P146 — farthest-first k-center coreset over the 1-in-7 pool:
    // seed = smallest id, then 11 max-min cosine-distance picks; the
    // oracle replays the walk in a recursive CTE (the sim8 mechanics)
    "sim10_kcenter" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.kCenterCoreset(e.where(col("vec_id") % 7 === 0),
          "vec_id", "v", k = 12)
        .orderBy("rank")
    }),

    // P61 — int8 scalar quantization: per-dim corpus extrema, then the
    // exact floor((x−min)·255/(max−min)+0.5) sequence per element — the
    // oracle recomputes extrema and codes with the identical IEEE ops, so
    // every (vec_id, pos, code) must match
    "sim7_sq_encode" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.sqQuantize(e, "vec_id", "v")
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("pos", "code")))
        .orderBy("vec_id", "pos")
    }),

    // P347 — the int8 loss table beside sim7's codes: per-dim MSE and
    // worst absolute error of the decoded reconstruction against the
    // raw vectors (the measured read "is int8 acceptable for THIS
    // distribution" — 64 rows)
    "sim14_sq_error" -> ((s, dir) => {
      Similarity.sqReconError(emb(s, dir), "vec_id", "v")
        .orderBy("d")
    }),

    // P50 — signed random projection: 64 → 16 dims with the MD5-derived
    // ±1 matrix and binary-exact 1/√16 = 0.25 scaling; the oracle
    // regenerates the same signs from md5 and folds in the same ascending
    // dimension order
    "sim6_random_projection" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.randomProject(e, "vec_id", "v", dOut = 16)
        .select(col("id").as("vec_id"), posexplode(col("rv")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos"), round(col("val"), 6).as("val"))
        .orderBy("vec_id", "pos")
    }),

    // P363 — PQ-ADC vs int8-SQ recall@5 against exact squared-L2 truth
    // for the sim9 query set: the "which quantizer" decision table
    // (sim14 measures SQ's recon loss; this measures what both losses
    // DO to retrieval). Measured: the untrained 16-entry codebook's
    // ADC recalls 0.16-0.22 while int8 SQ recalls 1.0 — 8×8-dim
    // subquantizers at iters=0 destroy retrieval on this corpus, int8
    // is retrieval-lossless
    "sim15_quantizer_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.quantizerRecallCompare(e, e.where(col("vec_id") < 10),
          "vec_id", "v", k = 5, m = 8, kCodes = 16)
        .orderBy("method", "query_id")
    }),

    // P105 — recall@5 of the IVF index against brute-force ground truth
    // for the same 10 query vectors: both rankings replay bit-exactly
    // (sim1/sim2), so the intersection counts are deterministic; this
    // corpus's 4-probe IVF recalls everything (recall 1.0 per query) —
    // the oracle proves THAT, not a trivial equality
    "sim9_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 10)
      val truth = Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
      val centroids = e.where(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("centroid_id"), col("v"))
      val indexed = Similarity.ivfAssign(e, centroids, "vec_id", "v")
      val approx = Similarity.ivfTopK(indexed, centroids, queries,
        "vec_id", "v", k = 5, nProbe = 4)
      Similarity.recallAtK(truth, approx, "query_id", "id", k = 5)
        .orderBy("query_id")
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
    }),

    // P377 — clustering stability: ARI between the %31 and %29
    // centroid-sample IVF assignments — near 1 = real structure,
    // near 0 = initialization noise (the read sim11's single-fit
    // silhouette cannot give)
    "sim16_ari" -> ((s, dir) => {
      val e = emb(s, dir)
      def cents(m: Int) = e.where(col("vec_id") % m === 0)
        .select(col("vec_id").as("centroid_id"), col("v"))
      val a = Similarity.ivfAssign(e, cents(31), "vec_id", "v")
        .select(col("id"), col("centroid_id"))
      val b = Similarity.ivfAssign(e, cents(29), "vec_id", "v")
        .select(col("id"), col("centroid_id"))
      Similarity.adjustedRandIndex(a, b, "id", "centroid_id")
    }),

    // P230 — simplified silhouette of the sim2 centroid set: per-cluster
    // tightness/separation before committing to the IVF bucketing
    "sim11_silhouette" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("centroid_id"), col("v"))
      Similarity.silhouetteSimplified(e, centroids, "vec_id", "v")
        .orderBy("centroid_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // the d7 normalization fold replayed per row (0.0-seeded left fold ≡
    // list_reduce), 6-rounded micro-unit elements, exact per-dim sums,
    // DECIMAL(19,0)-product squares, two fixed double closings
    "sim12_isotropy" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
        |nm AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |      (a, b) -> a + b)) AS norm
        |  FROM e WHERE len(v) > 0),
        |u AS (
        |  SELECT vec_id,
        |    CASE WHEN norm > 0 THEN list_transform(v, x -> x / norm)
        |         ELSE list_transform(v, x -> 0.0e0) END AS nv
        |  FROM nm),
        |ex AS (
        |  SELECT g.i,
        |    CAST(CAST(round(nv[g.i], 6) AS DECIMAL(9,6)) * 1000000
        |      AS BIGINT) AS m
        |  FROM u CROSS JOIN (
        |    SELECT unnest(generate_series(1,
        |      (SELECT MAX(len(v)) FROM e))) AS i) g
        |  WHERE g.i <= len(u.nv)),
        |pd AS (
        |  SELECT i, CAST(SUM(m) AS BIGINT) AS s,
        |    CAST(SUM(m * m) AS BIGINT) AS q
        |  FROM ex GROUP BY 1),
        |cl AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS dim,
        |    SUM(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))) AS ss,
        |    CAST(SUM(q) AS BIGINT) AS qq
        |  FROM pd)
        |SELECT n.n AS n_vectors, cl.dim,
        |  CASE WHEN n.n > 1 THEN
        |    round((CAST(ss AS DOUBLE) - CAST(qq AS DOUBLE)) /
        |      (CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1.0e0)) /
        |      1000000000000.0e0, 6) END AS mean_cosine,
        |  CASE WHEN n.n > 0 THEN
        |    round(sqrt(CAST(ss AS DOUBLE)) / CAST(n.n AS DOUBLE) /
        |      1000000.0e0, 6) END AS centroid_norm
        |FROM cl CROSS JOIN n""".stripMargin,

    // stage 1 is the iv2 BM25 replay at LIMIT 50; stage 2 the sim1
    // cosine replay against vec 7; final rank on the rounded cosine
    "pipe3_hybrid" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(len(l)) AS BIGINT) AS sdl FROM toks),
        |t AS (SELECT doc_id, len(l) AS dl, unnest(l) AS w FROM toks),
        |tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |       WHERE w IN ('hash', 'join', 'vector') GROUP BY 1, 2, 3),
        |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id,
        |    round(ln(1.0e0 + (st.n - df.df + 0.5e0) / (df.df + 0.5e0)) *
        |      (tf.tf * (1.2e0 + 1.0e0)) /
        |      (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * tf.dl /
        |        (CAST(st.sdl AS DOUBLE) / st.n))), 9) AS s
        |  FROM tf JOIN df USING (w) CROSS JOIN st),
        |agg AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
        |  FROM sc GROUP BY 1),
        |cand AS (
        |  SELECT doc_id, score AS bm25,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
        |      AS bm25_rank
        |  FROM agg ORDER BY score DESC, doc_id LIMIT 50),
        |e AS (SELECT vec_id,
        |        [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |qv AS (SELECT v FROM e WHERE vec_id = 7),
        |cosd AS (
        |  SELECT c.doc_id, c.bm25, c.bm25_rank,
        |    round(list_cosine_similarity(e.v, qv.v), 6) AS cosine
        |  FROM cand c JOIN e ON e.vec_id = c.doc_id CROSS JOIN qv
        |  WHERE c.doc_id <> 7)
        |SELECT doc_id, bm25, bm25_rank, cosine,
        |  CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rank
        |FROM cosd ORDER BY cosine DESC, doc_id LIMIT 10""".stripMargin,

    // the sim1 oracle shape over the 20% query slice, then in-degree
    // counts and a capped top-10 rank
    "sim13_hubness" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |         list_cosine_similarity(c.v, q.v) AS cos
        |  FROM e c JOIN e q ON q.vec_id % 5 = 0 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, id ASC) AS rank
        |  FROM scored),
        |cnt AS (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_occ
        |  FROM ranked WHERE rank <= 5 GROUP BY 1),
        |top AS (SELECT * FROM cnt ORDER BY n_occ DESC, id LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, id)
        |    AS INTEGER) AS rank, id, n_occ
        |FROM top ORDER BY rank""".stripMargin,

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

    // One Lloyd round replayed in SQL. Bit-exactness argument: the seed
    // assignment is sim2's verified machinery; per-(cluster, dim) sums go
    // through DECIMAL(38,18) — decimal addition is exact, so the two
    // engines' sums are the same rational number regardless of partition
    // or row order — and mean = CAST(sum AS DOUBLE) / n is one double op
    // on identical operands. ROUND(…, 6) then absorbs the last-ulp slack
    // in the decimal→double conversion itself. Empty clusters (possible
    // only with duplicate-vector centroids) keep the RAW seed centroid,
    // mirroring kmeansRefine's coalesce-to-previous.
    "sim3_kmeans_refine" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |norm AS (SELECT vec_id,
        |    CASE WHEN sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN v]), (a,b) -> a+b)) > 0
        |         THEN [x / sqrt(list_reduce(list_prepend(0.0, [y*y FOR y IN v]), (a,b) -> a+b)) FOR x IN v]
        |         ELSE [0.0 FOR x IN v] END AS v
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv FROM norm WHERE vec_id % 31 = 0),
        |raw_cents AS (SELECT vec_id AS centroid_id, v AS rv FROM e WHERE vec_id % 31 = 0),
        |positions AS (SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM norm) + 1)) AS i),
        |assign AS (
        |  SELECT vec_id, v, centroid_id FROM (
        |    SELECT n.vec_id, n.v, c.centroid_id,
        |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |             ORDER BY list_reduce(list_prepend(0.0, [n.v[i] * c.cv[i] FOR i IN range(1, len(n.v)+1)]), (a,b) -> a+b) DESC,
        |             c.centroid_id ASC) AS rn
        |    FROM norm n CROSS JOIN cents c) WHERE rn = 1),
        |sizes AS (SELECT centroid_id, COUNT(*) AS n_members FROM assign GROUP BY centroid_id),
        |cells AS (
        |  SELECT a.centroid_id, p.i - 1 AS pos,
        |         CAST(SUM(CAST(a.v[p.i] AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
        |  FROM assign a CROSS JOIN positions p
        |  GROUP BY a.centroid_id, p.i)
        |SELECT rc.centroid_id,
        |       COALESCE(s.n_members, 0) AS n_members,
        |       p.i - 1 AS pos,
        |       ROUND(COALESCE(c.m, rc.rv[p.i]), 6) AS m
        |FROM raw_cents rc CROSS JOIN positions p
        |LEFT JOIN cells c ON c.centroid_id = rc.centroid_id AND c.pos = p.i - 1
        |LEFT JOIN sizes s ON s.centroid_id = rc.centroid_id
        |ORDER BY rc.centroid_id, pos""".stripMargin,

    // extrema recomputed per dim, then the identical subtract/·255/
    // divide/+0.5/floor/clamp sequence (e0 literals keep every constant
    // a DOUBLE)
    "sim7_sq_encode" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings),
        |dims AS (
        |  SELECT d.d, min(e.v[d.d + 1]) AS mn, max(e.v[d.d + 1]) AS mx
        |  FROM e CROSS JOIN range(64) d(d) GROUP BY 1)
        |SELECT e.vec_id, CAST(m.d AS INT) AS pos,
        |  CASE WHEN m.mx - m.mn = 0 THEN 0
        |       ELSE CAST(least(greatest(
        |         floor((e.v[m.d + 1] - m.mn) * 255.0e0 / (m.mx - m.mn) + 0.5e0),
        |         0.0e0), 255.0e0) AS INT)
        |  END AS code
        |FROM e CROSS JOIN dims m
        |ORDER BY vec_id, pos""".stripMargin,

    // the sim7 dims/code replay, decoded back with the identical IEEE
    // recon sequence; 9-rounded errors squared and summed ENTIRELY in
    // DECIMAL(18,9)² (exact both engines)
    "sim14_sq_error" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings
        |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
        |dims AS (
        |  SELECT d.d, min(e.v[d.d + 1]) AS mn, max(e.v[d.d + 1]) AS mx
        |  FROM e CROSS JOIN range(64) d(d) GROUP BY 1),
        |pt AS (
        |  SELECT m.d, m.mn, m.mx, e.v[m.d + 1] AS x,
        |    CASE WHEN m.mx - m.mn = 0 THEN 0
        |         ELSE CAST(least(greatest(
        |           floor((e.v[m.d + 1] - m.mn) * 255.0e0 / (m.mx - m.mn)
        |             + 0.5e0),
        |           0.0e0), 255.0e0) AS INT)
        |    END AS code
        |  FROM e CROSS JOIN dims m),
        |er AS (
        |  SELECT d, mn, mx,
        |    round(x - (mn + (CAST(code AS DOUBLE) * (mx - mn)) / 255.0e0),
        |      9) AS err
        |  FROM pt)
        |SELECT CAST(d AS INT) AS d, mn, mx, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(err AS DECIMAL(18,9)) *
        |      CAST(err AS DECIMAL(18,9))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 9) AS mse,
        |  max(abs(err)) AS max_abs_err
        |FROM er GROUP BY 1, 2, 3 ORDER BY d""".stripMargin,

    // sign(j,i) = −1 iff the first hex nibble of md5('rp:j:i') ≥ 8 —
    // regenerated inline; the projection is the ascending-i ordered fold
    // (same IEEE op sequence as VecEval.matvec), then one exact ·0.25
    "sim6_random_projection" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |proj AS (
        |  SELECT e.vec_id, j.j,
        |    list_reduce(list_prepend(0.0,
        |      [e.v[CAST(i AS INT)] *
        |       (CASE WHEN instr('0123456789abcdef',
        |                substr(md5('rp:' || j.j || ':' || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1 >= 8
        |             THEN -1.0 ELSE 1.0 END)
        |       FOR i IN range(1, 65)]),
        |      (a, x) -> a + x) AS p
        |  FROM e CROSS JOIN range(16) j(j))
        |SELECT vec_id, CAST(j AS INT) AS pos, round(p * 0.25, 6) AS val
        |FROM proj ORDER BY vec_id, pos""".stripMargin,

    // PQ encode replayed in SQL: codebook row j of every subspace = the
    // j-th lowest-id vector, indexed in place at the subspace offsets;
    // each squared-L2 is the sequential ascending-dimension fold
    // (list_reduce over list_prepend(0.0, …) = VecEval's while-loop), so
    // distances are bit-identical and the argmin tie-break (lowest code)
    // routes identically
    "sim4_pq_encode" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |books AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v AS bv
        |  FROM e ORDER BY vec_id LIMIT 16),
        |dists AS (
        |  SELECT t.vec_id, m.m, b.code,
        |    list_reduce(list_prepend(0.0,
        |      [(t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)]) *
        |       (t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)])
        |       FOR i IN range(1, 9)]), (a, x) -> a + x) AS d
        |  FROM e t CROSS JOIN range(8) m(m) CROSS JOIN books b)
        |SELECT vec_id, m, code FROM (
        |  SELECT vec_id, m, code,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |                            ORDER BY d ASC, code ASC) AS rn
        |  FROM dists) WHERE rn = 1
        |ORDER BY vec_id, m""".stripMargin,

    // ADC replayed in SQL: the same encode CTEs, per-query tables via the
    // same sequential fold, and the per-row total = the ascending-m
    // ordered fold over the 8 table lookups (list(d ORDER BY m) fixes the
    // accumulation order; a plain SUM would be order-nondeterministic in
    // its last ulp). Ranks on the ROUNDED distance with id tie-break on
    // both sides
    // exact squared-L2 truth (three ascending-order dot folds), the
    // sim5 ADC chain and the sim7 decode chain replayed for the SAME
    // queries, then two id-set recall joins — every count exact
    "sim15_quantizer_recall" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |tr AS (
        |  SELECT query_id, id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(
        |          list_reduce(list_prepend(0.0, [c.v[i] * c.v[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b) +
        |          list_reduce(list_prepend(0.0, [q.v[i] * q.v[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b) -
        |          2.0e0 * list_reduce(list_prepend(0.0, [c.v[i] * q.v[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b), 6) ASC,
        |        c.vec_id ASC) AS rank
        |    FROM e c JOIN q ON c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |books AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v AS bv
        |  FROM e ORDER BY vec_id LIMIT 16),
        |enc_d AS (
        |  SELECT t.vec_id, m.m, b.code,
        |    list_reduce(list_prepend(0.0,
        |      [(t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)]) *
        |       (t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)])
        |       FOR i IN range(1, 9)]), (a, x) -> a + x) AS d
        |  FROM e t CROSS JOIN range(8) m(m) CROSS JOIN books b),
        |enc AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT vec_id, m, code,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |                              ORDER BY d ASC, code ASC) AS rn
        |    FROM enc_d) WHERE rn = 1),
        |qtab AS (
        |  SELECT q.vec_id AS query_id, m.m, b.code,
        |    list_reduce(list_prepend(0.0,
        |      [(q.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)]) *
        |       (q.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)])
        |       FOR i IN range(1, 9)]), (a, x) -> a + x) AS d
        |  FROM q CROSS JOIN range(8) m(m) CROSS JOIN books b),
        |tot AS (
        |  SELECT t.query_id, c.vec_id AS id,
        |         list_reduce(list_prepend(0.0, list(t.d ORDER BY t.m)),
        |                     (a, x) -> a + x) AS dtot
        |  FROM enc c JOIN qtab t ON t.m = c.m AND t.code = c.code
        |  GROUP BY t.query_id, c.vec_id),
        |pq AS (
        |  SELECT query_id, id FROM (
        |    SELECT query_id, id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY ROUND(dtot, 6) ASC, id ASC) AS rank
        |    FROM tot WHERE query_id <> id)
        |  WHERE rank <= 5),
        |dims AS (
        |  SELECT d.d, min(e.v[d.d + 1]) AS mn, max(e.v[d.d + 1]) AS mx
        |  FROM e CROSS JOIN range(64) d(d) GROUP BY 1),
        |sr AS (
        |  SELECT e.vec_id, m.d,
        |    m.mn + (CAST(CASE WHEN m.mx - m.mn = 0 THEN 0
        |      ELSE CAST(least(greatest(
        |        floor((e.v[m.d + 1] - m.mn) * 255.0e0 / (m.mx - m.mn)
        |          + 0.5e0), 0.0e0), 255.0e0) AS INT)
        |    END AS DOUBLE) * (m.mx - m.mn)) / 255.0e0 AS r
        |  FROM e CROSS JOIN dims m),
        |rl AS (SELECT vec_id, list(r ORDER BY d) AS rv FROM sr GROUP BY 1),
        |sq AS (
        |  SELECT query_id, id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(
        |          list_reduce(list_prepend(0.0, [c.rv[i] * c.rv[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b) +
        |          list_reduce(list_prepend(0.0, [q.v[i] * q.v[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b) -
        |          2.0e0 * list_reduce(list_prepend(0.0, [c.rv[i] * q.v[i]
        |            FOR i IN range(1, 65)]), (a, b) -> a + b), 6) ASC,
        |        c.vec_id ASC) AS rank
        |    FROM rl c JOIN q ON c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |qs AS (SELECT DISTINCT query_id FROM tr),
        |pm AS (SELECT tr.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
        |       FROM tr JOIN pq ON pq.query_id = tr.query_id
        |         AND pq.id = tr.id GROUP BY 1),
        |sm AS (SELECT tr.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
        |       FROM tr JOIN sq ON sq.query_id = tr.query_id
        |         AND sq.id = tr.id GROUP BY 1)
        |SELECT 'pq_adc' AS method, qs.query_id,
        |  CAST(coalesce(pm.n_match, 0) AS BIGINT) AS n_match,
        |  round(CAST(coalesce(pm.n_match, 0) AS DOUBLE) / 5.0e0, 6)
        |    AS recall
        |FROM qs LEFT JOIN pm USING (query_id)
        |UNION ALL
        |SELECT 'sq_int8' AS method, qs.query_id,
        |  CAST(coalesce(sm.n_match, 0) AS BIGINT) AS n_match,
        |  round(CAST(coalesce(sm.n_match, 0) AS DOUBLE) / 5.0e0, 6)
        |    AS recall
        |FROM qs LEFT JOIN sm USING (query_id)
        |ORDER BY method, query_id""".stripMargin,

    "sim5_adc_topk" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |books AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v AS bv
        |  FROM e ORDER BY vec_id LIMIT 16),
        |enc_d AS (
        |  SELECT t.vec_id, m.m, b.code,
        |    list_reduce(list_prepend(0.0,
        |      [(t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)]) *
        |       (t.v[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)])
        |       FOR i IN range(1, 9)]), (a, x) -> a + x) AS d
        |  FROM e t CROSS JOIN range(8) m(m) CROSS JOIN books b),
        |enc AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT vec_id, m, code,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |                              ORDER BY d ASC, code ASC) AS rn
        |    FROM enc_d) WHERE rn = 1),
        |queries AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 125 = 0),
        |qtab AS (
        |  SELECT q.query_id, m.m, b.code,
        |    list_reduce(list_prepend(0.0,
        |      [(q.qv[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)]) *
        |       (q.qv[CAST(m.m * 8 + i AS INT)] - b.bv[CAST(m.m * 8 + i AS INT)])
        |       FOR i IN range(1, 9)]), (a, x) -> a + x) AS d
        |  FROM queries q CROSS JOIN range(8) m(m) CROSS JOIN books b),
        |tot AS (
        |  SELECT t.query_id, c.vec_id AS id,
        |         list_reduce(list_prepend(0.0, list(t.d ORDER BY t.m)),
        |                     (a, x) -> a + x) AS dtot
        |  FROM enc c JOIN qtab t ON t.m = c.m AND t.code = c.code
        |  GROUP BY t.query_id, c.vec_id),
        |ranked AS (
        |  SELECT query_id, id, ROUND(dtot, 6) AS adc_dist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY ROUND(dtot, 6) ASC, id ASC) AS rank
        |  FROM tot WHERE query_id <> id)
        |SELECT query_id, id, adc_dist, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the sim8 recursion shape: pairwise 6-rounded cosines computed once
    // (psim), LATERAL argmax of 1 − max-sim-to-selected with id
    // tie-break; seed = min pool id with null d
    "sim10_kcenter" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |norm AS (SELECT vec_id,
        |    CASE WHEN sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN v]), (a,b) -> a+b)) > 0
        |         THEN [x / sqrt(list_reduce(list_prepend(0.0, [y*y FOR y IN v]), (a,b) -> a+b)) FOR x IN v]
        |         ELSE [0.0 FOR x IN v] END AS v
        |  FROM e),
        |pool AS (SELECT vec_id AS id, v FROM norm WHERE vec_id % 7 = 0),
        |psim AS (
        |  SELECT a.id AS ai, b.id AS bi,
        |    round(list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v)+1)]), (x,y) -> x+y), 6) AS sim
        |  FROM pool a JOIN pool b ON a.id <> b.id),
        |g(n, sel, id, d) AS (
        |  SELECT 1, [id], id, CAST(NULL AS DOUBLE)
        |  FROM (SELECT id FROM pool ORDER BY id LIMIT 1)
        |  UNION ALL
        |  SELECT g.n + 1, list_append(g.sel, c.id), c.id, c.d
        |  FROM g, LATERAL (
        |    SELECT c2.id,
        |      1.0e0 - (SELECT max(p.sim) FROM psim p
        |               WHERE p.ai = c2.id AND list_contains(g.sel, p.bi)) AS d
        |    FROM pool c2 WHERE NOT list_contains(g.sel, c2.id)
        |    ORDER BY d DESC, c2.id ASC LIMIT 1) c
        |  WHERE g.n < 12)
        |SELECT CAST(n AS INT) AS rank, id AS vec_id, d
        |FROM g ORDER BY rank""".stripMargin,

    // MMR replayed in SQL: sim2's normalization + ascending-index folds
    // give bit-identical rounded cosines; the greedy walk is a recursive
    // CTE whose LATERAL picks the (score DESC, id ASC) argmax each step —
    // the f3 greedy-replay mechanics. The penalty coefficient is written
    // (1.0e0 - 0.7e0), NOT 0.3e0: 0.3 is not binary-exact and the Scala
    // side computes 1.0 - lambda, so the literal would diverge in the
    // last ulp.
    "sim8_mmr" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |norm AS (SELECT vec_id,
        |    CASE WHEN sqrt(list_reduce(list_prepend(0.0, [x*x FOR x IN v]), (a,b) -> a+b)) > 0
        |         THEN [x / sqrt(list_reduce(list_prepend(0.0, [y*y FOR y IN v]), (a,b) -> a+b)) FOR x IN v]
        |         ELSE [0.0 FOR x IN v] END AS v
        |  FROM e),
        |qrys AS (SELECT vec_id AS query_id, v AS qv FROM norm WHERE vec_id % 1000 = 0),
        |scored AS (
        |  SELECT q.query_id, n.vec_id AS id, n.v,
        |    round(list_reduce(list_prepend(0.0, [n.v[i] * q.qv[i] FOR i IN range(1, len(n.v)+1)]), (a,b) -> a+b), 6) AS qs
        |  FROM norm n CROSS JOIN qrys q WHERE n.vec_id <> q.query_id),
        |cand AS (SELECT query_id, id, v, qs FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qs DESC, id ASC) AS rn
        |    FROM scored) WHERE rn <= 20),
        |psim AS (
        |  SELECT a.query_id, a.id AS ai, b.id AS bi,
        |    round(list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v)+1)]), (x,y) -> x+y), 6) AS sim
        |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id <> b.id),
        |g(query_id, n, sel, id, qs) AS (
        |  SELECT query_id, 1, [id], id, qs FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY 0.7e0 * qs DESC, id ASC) AS rn
        |    FROM cand) WHERE rn = 1
        |  UNION ALL
        |  SELECT g.query_id, g.n + 1, list_append(g.sel, c.id), c.id, c.qs
        |  FROM g, LATERAL (
        |    SELECT c2.id, c2.qs,
        |      0.7e0 * c2.qs - (1.0e0 - 0.7e0) * coalesce(
        |        (SELECT max(p.sim) FROM psim p
        |         WHERE p.query_id = g.query_id AND p.ai = c2.id
        |           AND list_contains(g.sel, p.bi)), 0.0e0) AS score
        |    FROM cand c2
        |    WHERE c2.query_id = g.query_id AND NOT list_contains(g.sel, c2.id)
        |    ORDER BY score DESC, c2.id ASC LIMIT 1) c
        |  WHERE g.n < 5)
        |SELECT query_id, id AS vec_id, qs, CAST(n AS INT) AS rank
        |FROM g ORDER BY query_id, rank""".stripMargin,

    // Full IVF pipeline replayed in SQL. Why this matches bit-for-bit: both
    // engines widen float→double exactly, and every reduction (norm, dot) is
    // a SEQUENTIAL left fold in index order — VecEval's while-loops on the
    // Spark side, list_reduce(list_prepend(0.0, …)) here — so the IEEE
    // doubles are identical, argmax routing and ranks agree exactly, and
    // the rounded cosines hash-match (verified at sf0.01 and sf0.1).
    // both rankings replayed verbatim from the sim1/sim2 oracles, then
    // intersected; the query universe comes from the truth side
    "sim9_recall" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |         list_cosine_similarity(c.v, q.v) AS cos
        |  FROM e c JOIN e q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |bt AS (
        |  SELECT query_id, id FROM (
        |    SELECT query_id, id,
        |           ROW_NUMBER() OVER (PARTITION BY query_id
        |                              ORDER BY cos DESC, id ASC) AS rank
        |    FROM bs) WHERE rank <= 5),
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
        |sc2 AS (
        |  SELECT p.query_id, a.vec_id AS id,
        |         list_reduce(list_prepend(0.0, [a.v[i] * p.qv[i] FOR i IN range(1, len(a.v)+1)]), (a2,b2) -> a2+b2) AS cos
        |  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
        |  WHERE p.query_id <> a.vec_id),
        |ai AS (
        |  SELECT query_id, id FROM (
        |    SELECT query_id, id,
        |           ROW_NUMBER() OVER (PARTITION BY query_id
        |                              ORDER BY cos DESC, id ASC) AS rank
        |    FROM sc2) WHERE rank <= 5),
        |m AS (
        |  SELECT bt.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
        |  FROM bt JOIN ai ON ai.query_id = bt.query_id AND ai.id = bt.id
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT query_id FROM bt)
        |SELECT qs.query_id, CAST(coalesce(m.n_match, 0) AS BIGINT) AS n_match,
        |  round(CAST(coalesce(m.n_match, 0) AS DOUBLE) / 5.0e0, 6) AS recall
        |FROM qs LEFT JOIN m ON m.query_id = qs.query_id
        |ORDER BY qs.query_id""".stripMargin,

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
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the sim2 assignment replay (argmax on unrounded cosine, smallest
    // cid on ties), 6-rounded cosines, a/b in exact decimal, decimal-
    // summed cluster means
    // two sim11-style argmax replays (%31 / %29 centroid samples),
    // contingency + margins as ΣC(c,2) size arithmetic (// = integer
    // division), one fixed double closing chain
    "sim16_ari" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings),
        |ca AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 29 = 0),
        |ra AS (
        |  SELECT id, cid FROM (
        |    SELECT p.vec_id AS id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_cosine_similarity(p.v, c.cv) DESC, c.cid ASC)
        |        AS rn
        |    FROM e p CROSS JOIN ca c) WHERE rn = 1),
        |rb AS (
        |  SELECT id, cid FROM (
        |    SELECT p.vec_id AS id, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_cosine_similarity(p.v, c.cv) DESC, c.cid ASC)
        |        AS rn
        |    FROM e p CROSS JOIN cb c) WHERE rn = 1),
        |j AS (SELECT ra.id, ra.cid AS x, rb.cid AS y
        |      FROM ra JOIN rb ON ra.id = rb.id),
        |ix AS (
        |  SELECT CAST(coalesce(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS idx,
        |    CAST(coalesce(SUM(n), 0) AS BIGINT) AS np
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY x, y)),
        |am AS (
        |  SELECT CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS a,
        |    CAST(COUNT(*) AS BIGINT) AS ka
        |  FROM (SELECT COUNT(*) AS c FROM j GROUP BY x)),
        |bm AS (
        |  SELECT CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS kb
        |  FROM (SELECT COUNT(*) AS c FROM j GROUP BY y))
        |SELECT np AS n_points, ka AS n_clusters_a, kb AS n_clusters_b,
        |  idx AS pair_index,
        |  CASE WHEN np > 1 THEN
        |    round(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) /
        |      CAST(np * (np - 1) // 2 AS DOUBLE), 6) END AS expected_index,
        |  round(CAST(a + b AS DOUBLE) / 2.0e0, 6) AS max_index,
        |  CASE WHEN np > 1 AND
        |    CAST(a + b AS DOUBLE) / 2.0e0 -
        |      CAST(a AS DOUBLE) * CAST(b AS DOUBLE) /
        |        CAST(np * (np - 1) // 2 AS DOUBLE) <> 0.0e0 THEN
        |    round((CAST(idx AS DOUBLE) -
        |      CAST(a AS DOUBLE) * CAST(b AS DOUBLE) /
        |        CAST(np * (np - 1) // 2 AS DOUBLE)) /
        |      (CAST(a + b AS DOUBLE) / 2.0e0 -
        |        CAST(a AS DOUBLE) * CAST(b AS DOUBLE) /
        |          CAST(np * (np - 1) // 2 AS DOUBLE)), 6) END AS ari
        |FROM ix CROSS JOIN am CROSS JOIN bm""".stripMargin,

    "sim11_silhouette" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
        |sim AS (
        |  SELECT p.vec_id AS id, c.cid,
        |    list_cosine_similarity(p.v, c.cv) AS rawcos
        |  FROM e p CROSS JOIN c),
        |rk AS (
        |  SELECT id, cid, round(rawcos, 6) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY id
        |      ORDER BY rawcos DESC, cid ASC) AS rn
        |  FROM sim),
        |own AS (SELECT id, cid AS centroid_id, cos AS cosown
        |        FROM rk WHERE rn = 1),
        |oth AS (
        |  SELECT rk.id, MAX(rk.cos) AS cosoth
        |  FROM rk JOIN own o ON o.id = rk.id AND rk.cid <> o.centroid_id
        |  GROUP BY 1),
        |j AS (
        |  SELECT o.id, o.centroid_id,
        |    CAST(1.0 AS DECIMAL(7,6)) - CAST(o.cosown AS DECIMAL(7,6))
        |      AS a,
        |    CAST(1.0 AS DECIMAL(7,6)) - CAST(t.cosoth AS DECIMAL(7,6))
        |      AS b
        |  FROM own o JOIN oth t ON t.id = o.id),
        |p AS (
        |  SELECT id, centroid_id, a, b,
        |    CASE WHEN GREATEST(a, b) > 0 THEN
        |      round(CAST(b - a AS DOUBLE) /
        |        CAST(GREATEST(a, b) AS DOUBLE), 6) END AS s
        |  FROM j)
        |SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  round(CAST(SUM(CAST(a AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_a,
        |  round(CAST(SUM(CAST(b AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_b,
        |  round(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(COUNT(s) AS DOUBLE), 6) AS mean_s
        |FROM p GROUP BY 1 ORDER BY centroid_id""".stripMargin
  )
}
