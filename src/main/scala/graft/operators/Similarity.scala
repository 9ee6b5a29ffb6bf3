package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Baseline: brute-force cosine top-k — a broadcast nested-loop of the
 * (small) query set against the corpus with a per-query window; the corpus
 * is scanned once, never shuffled. Scale path: IVF — corpus vectors are
 * bucketed by nearest centroid at index time, queries probe only the
 * `nProbe` nearest buckets, cutting the scan to nProbe/C of the corpus.
 * All math in double, index-order accumulation (Dedup.dotProduct).
 */
object Similarity {

  import Dedup.{dotProduct, l2Normalize}

  /**
   * Exact top-k by cosine: one row (query_id, id, cosine, rank) per match,
   * rank 1..k per query. `queries` must be small (it is broadcast); the
   * corpus side stays partitioned and is scanned exactly once.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), l2Normalize(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"),
        dotProduct(col("v"), col("qv")).as("cosine"))
      .where(col("query_id") =!= col("id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * P363 helper — exact squared-L2 top-k (the metric PQ's ADC tables
   * approximate; [[bruteForceTopK]] is the cosine twin): |c−q|² via the
   * three-dot identity c·c + q·q − 2·c·q, each dot the ascending-order
   * compiled fold, ranked on the 6-rounded distance with an id
   * tie-break. Same shapes as the cosine brute pass (broadcast query
   * cross join, query-partitioned rank).
   */
  def l2BruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"l2BruteTopK: k must be >= 1, got $k")
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val dist = round(dotProduct(col("v"), col("v")) +
      dotProduct(col("qv"), col("qv")) -
      lit(2.0) * dotProduct(col("v"), col("qv")), 6)
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"), dist.as("l2sq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2sq").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * IVF index: assign every corpus vector to its nearest centroid.
   * Centroids are any small deterministic sample (a k-means refinement can
   * replace them without touching the search path). Returns the corpus
   * tagged with `centroid_id` — at scale this is the partitioning/bucketing
   * key, so one bucket's vectors co-locate.
   *
   * Contract: the centroid set is collected EAGERLY on the driver at call
   * time (it is broadcast-small by construction — the reference object rides
   * into generated code) and must be non-empty. Assignment is then a pure
   * projection over the corpus scan: no crossJoin row expansion, no
   * exchange, and the per-row argmax is a compiled primitive loop
   * ([[graft.expressions.NearestCentroidIdx]]) — the expression tree stays
   * constant-size regardless of centroid count. The centroid-id output
   * column (named by `centroidIdCol`) keeps the source id column's values
   * and type verbatim (ties on cosine break toward the smallest centroid
   * id, matching a max-by-(sim, -id)).
   */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, centroidIdCol: String = "centroid_id"): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    val c = corpus.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    // ordered by id so the kernel's first-wins tie-break lands on the
    // smallest centroid id, deterministically
    val rows = centroids
      .select(col(centroidIdCol).as("cid"), l2Normalize(col(vecCol)).as("cv"))
      .orderBy(col("cid"))
      .collect()
    require(rows.nonEmpty, "ivfAssign: centroid set is empty")
    val matrix: Array[Array[Double]] = rows.map(_.getSeq[Double](1).toArray)
    // original id values (any orderable type) survive via array indexing
    val idLit = array(rows.toSeq.map(r => lit(r.get(0))): _*)
    val idx = exprCol(graft.expressions.NearestCentroidIdx(colExpr(col("v")), matrix))
    c.select(col("id"), col("v"),
      element_at(idLit, idx + 1).as(centroidIdCol))
  }

  /**
   * IVF search: probe the `nProbe` nearest centroids per query, then exact
   * cosine within those buckets only. Join key (centroid_id) is an
   * equi-join — the scan touches nProbe/C of the corpus.
   */
  def ivfTopK(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cents = centroids.select(col(centroidIdCol).as("cid"),
      l2Normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), l2Normalize(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__sim", dotProduct(col("qv"), col("cv")))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as(centroidIdCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    indexed.join(broadcast(probes), Seq(centroidIdCol))
      .select(col("query_id"), col("id"),
        dotProduct(col("v"), col("qv")).as("cosine"))
      .where(col("query_id") =!= col("id"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * Spherical k-means refinement of IVF centroids (Lloyd iterations): each
   * round assigns every corpus vector to its nearest centroid (the same
   * compiled [[ivfAssign]] projection the index build uses) and replaces
   * each centroid with its cluster's element-wise mean direction. Output
   * has the same `(centroidIdCol, vecCol)` shape as the input, so it drops
   * straight into [[ivfAssign]]/[[ivfTopK]].
   *
   * Scale shape: one corpus scan + one `(cluster, dimension)`-keyed
   * aggregation per iteration — partial aggregation does the heavy lifting
   * map-side, and nothing data-sized ever reaches the driver (only the
   * centroid set itself, which is broadcast-small by the IVF contract).
   * `iters` is a bounded hyperparameter, so the driver-side loop is fixed
   * work, not data-dependent. A cluster that captures no vectors keeps its
   * previous centroid rather than vanishing (k stays constant).
   */
  def kmeansRefine(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, iters: Int = 5,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    require(iters >= 0, s"kmeansRefine: iters must be >= 0, got $iters")
    var cents = centroids.select(col(centroidIdCol), col(vecCol))
    val spark = corpus.sparkSession
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(corpus, cents, idCol, vecCol, centroidIdCol)
      // element-wise cluster mean: explode to (cluster, dim) cells, average,
      // then reassemble the vector in dimension order
      // the mean goes through DECIMAL: a double sum's partition-merge order
      // is nondeterministic, so avg() would yield last-ulp-different
      // centroids run-to-run and a near-equidistant vector could flip its
      // ivfAssign bucket between runs (decimal addition is exact, hence
      // order-independent; components are unit-scale so 20 integer digits
      // can't overflow). The sum casts to double BEFORE the divide so the
      // mean is plain double arithmetic over a deterministic numerator —
      // an oracle can replay it without matching Spark's decimal-division
      // scale rules
      val means = assigned
        .select(col(centroidIdCol), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col(centroidIdCol), col("pos"))
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col(centroidIdCol))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          c => c.getField("m")).as(vecCol))
      // empty clusters keep their previous centroid (left join + coalesce)
      val next = cents.select(col(centroidIdCol), col(vecCol).as("__prev"))
        .join(means, Seq(centroidIdCol), "left")
        .select(col(centroidIdCol),
          coalesce(col(vecCol), col("__prev")).as(vecCol))
      // localize the refined set (broadcast-small by the IVF contract) so
      // each iteration's plan is independent — chaining the lazy plans
      // would re-execute every prior iteration's corpus aggregation at each
      // ivfAssign collect (O(iters²) corpus scans) and again on consumption
      cents = spark.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    cents
  }

  // ---- product quantization --------------------------------------------------

  /**
   * P45 — PQ codebooks: seeded from a deterministic sample (the `k`
   * lowest-id corpus vectors become the codebook rows of EVERY subspace —
   * row j of subspace m = sample vector j's dims [m·dsub, (m+1)·dsub),
   * read in place), then optionally refined by `iters` rounds of
   * per-subspace Lloyd k-means. Requires the dimension count to split
   * evenly into `m` subspaces.
   *
   * The refinement reuses the [[kmeansRefine]] shape with euclidean
   * geometry: the assignment step IS the compiled
   * [[graft.expressions.PqEncodeExpr]] kernel (per-subspace squared-L2
   * argmin — one projection assigns ALL m subspaces in a single corpus
   * pass), and the update step is ONE `(subspace, code, dim)`-keyed
   * aggregation whose means go through DECIMAL sums (the sim3 rule:
   * double partial-sum merge order is nondeterministic, and a
   * last-ulp-different centroid could flip a near-equidistant vector's
   * code between runs). Per iteration: one scan + one bounded shuffle
   * (≤ m·k·dsub = k·d cells), and only that k·d-sized mean table reaches
   * the driver — `iters` is a fixed hyperparameter, so driver work is
   * bounded, not data-dependent. A (subspace, code) cell that captures no
   * vectors keeps its previous row, so every subspace keeps exactly `k`
   * rows.
   *
   * Returns (books, dsub): `books(mi)(code)` is a FULL-length vector —
   * [[graft.expressions.PqEncodeExpr]] indexes it at the subspace
   * offsets (refined rows carry their subspace's means at those offsets
   * and the previous row's values elsewhere, which encode/ADC never
   * read).
   */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 0): (Array[Array[Array[Double]]], Int) = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    require(m >= 1, s"pqCodebooks: m must be >= 1, got $m")
    require(k >= 1, s"pqCodebooks: k must be >= 1, got $k")
    require(iters >= 0, s"pqCodebooks: iters must be >= 0, got $iters")
    val rows = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(k)
      .collect()
    require(rows.nonEmpty, "pqCodebooks: corpus is empty")
    val sample = rows.map(_.getSeq[Double](1).toArray)
    val d = sample.head.length
    require(d % m == 0, s"pqCodebooks: dimension $d does not split into $m subspaces")
    val dsub = d / m
    var books: Array[Array[Array[Double]]] = Array.fill(m)(sample)
    for (_ <- 1 to iters) {
      val cells = corpus
        .select(col(vecCol).cast("array<double>").as("v"))
        .select(col("v"),
          exprCol(graft.expressions.PqEncodeExpr(colExpr(col("v")), books, dsub))
            .as("codes"))
        .select(posexplode(col("v")).as(Seq("pos", "x")), col("codes"))
        .where(col("pos") < m * dsub)
        .select((col("pos") / dsub).cast("int").as("mi"), col("pos"),
          col("x"), col("codes"))
        .select(col("mi"), element_at(col("codes"), col("mi") + 1).as("code"),
          col("pos"), col("x"))
      val means = cells
        .groupBy(col("mi"), col("code"), col("pos"))
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("mx"))
        .collect()
      // empty (subspace, code) cells keep their previous row: start from a
      // deep copy and overwrite only the observed means
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      books = next
    }
    (books, dsub)
  }

  /**
   * P45 — product-quantization encode: compress each vector to `m`
   * small codes (the 100-TB ANN memory story: 64 float dims → 8 codes is
   * a 32× index shrink, and downstream search never touches the raw
   * vectors). A pure compiled projection over the corpus scan — the
   * codebook tensor rides into generated code as a reference object, no
   * join, no shuffle. Returns (id, codes array<int>).
   */
  def pqEncode(corpus: DataFrame, books: Array[Array[Array[Double]]],
      dsub: Int, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    require(books.nonEmpty && dsub >= 1, "pqEncode: empty codebooks or dsub < 1")
    corpus.select(col(idCol).as("id"),
      exprCol(graft.expressions.PqEncodeExpr(
        colExpr(col(vecCol).cast("array<double>")), books, dsub)).as("codes"))
  }

  /**
   * P61 — int8 scalar quantization: per-dimension min/max over the corpus
   * (exact extrema — no sums, so no order dependence), then each vector
   * encoded to uint8 codes by the compiled [[graft.expressions.SqEncodeExpr]]
   * kernel: floor((x−min)·255/(max−min) + 0.5), clamped; zero-range dims
   * code 0. The 4×-to-8× memory cut that makes billion-vector indexes fit
   * in RAM — PQ's simpler sibling (per-dim, no codebook training).
   *
   * Shape at scale: ONE map-side-combinable min/max aggregation (the
   * per-dim stats are 2·dims doubles to the driver — bytes, not data),
   * then a stateless compiled projection; the stats ride into codegen as
   * reference objects. Re-runs over the same corpus regenerate identical
   * codes — extrema are deterministic regardless of partitioning.
   */
  def sqQuantize(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    // uniform dimensionality among non-null vectors, checked on SIZES —
    // a per-dim count check alone cannot see zero-length vectors (they
    // contribute no exploded rows and would sail through to empty codes)
    val sizes = corpus.where(col(vecCol).isNotNull)
      .agg(min(size(col(vecCol))).as("mn"), max(size(col(vecCol))).as("mx"))
      .head()
    require(!sizes.isNullAt(0) && sizes.getInt(0) == sizes.getInt(1) &&
        sizes.getInt(0) >= 1,
      "sqQuantize: vectors must share one non-zero dimensionality " +
        s"(saw sizes ${if (sizes.isNullAt(0)) "none" else s"${sizes.getInt(0)}..${sizes.getInt(1)}"})")
    val (mins, maxs) = sqStats(corpus, vecCol)
    corpus.select(col(idCol).as("id"),
      exprCol(graft.expressions.SqEncodeExpr(
        colExpr(col(vecCol).cast("array<double>")), mins, maxs)).as("codes"))
  }

  /** The per-dimension corpus extrema [[sqQuantize]] trains on — ONE
    * definition so the encoder and [[sqDecode]] cannot disagree on the
    * grid (the dailyMeans dedup rule). Driver-collected: the stats
    * frame is dimension-count-sized. */
  private def sqStats(corpus: DataFrame,
      vecCol: String): (Array[Double], Array[Double]) = {
    val stats = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("d").collect()
    (stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /**
   * P363 helper — decode [[sqQuantize]]'s int8 codes back to vectors
   * (x̂_i = mn_i + code_i·(mx_i − mn_i)/255, the sim14 recon sequence):
   * what an SQ-backed index actually searches over. A stateless
   * compiled projection — the extrema ride in as literal arrays, no
   * join, no shuffle.
   */
  def sqDecode(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val clean = corpus.where(col(idCol).isNotNull && col(vecCol).isNotNull)
    val (mins, maxs) = sqStats(clean, vecCol)
    val minsA = array(mins.map(lit).toIndexedSeq: _*)
    val maxsA = array(maxs.map(lit).toIndexedSeq: _*)
    sqQuantize(clean, idCol, vecCol)
      .select(col("id"), transform(col("codes"), (c, i) =>
        element_at(minsA, i + 1) +
          (c.cast("double") *
            (element_at(maxsA, i + 1) - element_at(minsA, i + 1))) /
          lit(255.0)).as("v"))
  }

  /**
   * P347 — scalar-quantization reconstruction-error audit: decode
   * [[sqQuantize]]'s codes back (x̂ = mn + code·(mx−mn)/255) and report
   * per dimension the MSE and worst absolute error against the raw
   * vectors — the measured loss table that decides whether int8 is
   * acceptable for THIS embedding distribution before a billion-vector
   * index commits to it (the d18/sk17 audit convention: the sketch
   * beside its exact truth). Emits (d, mn, mx, n, mse, max_abs_err),
   * one row per dimension. Codes come from [[sqQuantize]] itself, so
   * the audit can never drift from the kernel it audits.
   *
   * Shapes: the sqQuantize projection + one (id, d)-keyed equi-join of
   * the two exploded frames (corpus-linear) + a broadcast of the
   * dim-count-sized stats frame + one keyed agg. Cross-engine: errors
   * are 9-rounded doubles (identical IEEE recon sequence both sides)
   * CAST to DECIMAL(18,9) — both engines land on the same exact decimal
   * — and squared/summed entirely in DECIMAL ((18,9)² = (37,18), exact
   * in both; the o46 rule — never re-round a double whose operands are
   * k-decimal-ish); max |err| is an exact double max.
   */
  def sqReconError(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val clean = corpus.where(col(idCol).isNotNull && col(vecCol).isNotNull)
    val codes = sqQuantize(clean, idCol, vecCol)
      .select(col("id"), posexplode(col("codes")).as(Seq("d", "code")))
    val pts = clean.select(col(idCol).as("id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
    val dims = pts.groupBy("d")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val err = pts
      .join(codes.hint("shuffle_hash"), Seq("id", "d"))
      .join(broadcast(dims), Seq("d"))
      .withColumn("__recon",
        col("mn") + (col("code").cast("double") * (col("mx") - col("mn"))) /
          lit(255.0))
      .withColumn("__err", round(col("x") - col("__recon"), 9))
    err.groupBy(col("d"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n"),
        sum(col("__err").cast("decimal(18,9)") *
          col("__err").cast("decimal(18,9)")).as("__sse"),
        max(abs(col("__err"))).as("max_abs_err"))
      .select(col("d"), col("mn"), col("mx"), col("n"),
        round(col("__sse").cast("double") / col("n").cast("double"), 9)
          .as("mse"),
        col("max_abs_err"))
  }

  /**
   * P363 — quantizer recall head-to-head: exact squared-L2 top-k as
   * ground truth, then the SAME queries through (a) PQ codes searched
   * by ADC lookup tables and (b) int8 SQ reconstructions searched
   * exactly — recall@k per (method, query). The decision table behind
   * "which quantizer do I build the billion-vector index on": sim14
   * measures SQ's per-dim reconstruction loss, this measures what both
   * losses DO to retrieval, on one metric, against one truth. All
   * three rankings are deterministic replays (the sim1/sim5/sim7-proven
   * chains), so the recall counts are exact integers.
   *
   * Shapes: three broadcast-query brute/ADC passes (each the
   * adjudicated query-vector broadcast class) + two id-set joins.
   */
  def quantizerRecallCompare(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int,
      kCodes: Int): DataFrame = {
    val truth = l2BruteTopK(corpus, queries, idCol, vecCol, k)
    val (books, dsub) = pqCodebooks(corpus, idCol, vecCol, m, kCodes)
    val codes = pqEncode(corpus, books, dsub, idCol, vecCol)
    val pq = pqAdcTopK(codes, queries, books, dsub, idCol, vecCol, k)
    val sq = l2BruteTopK(
      sqDecode(corpus, idCol, vecCol)
        .select(col("id").as(idCol), col("v").as(vecCol)),
      queries, idCol, vecCol, k)
    recallAtK(truth, pq, "query_id", "id", k)
      .select(lit("pq_adc").as("method"), col("query_id"),
        col("n_match"), col("recall"))
      .unionByName(recallAtK(truth, sq, "query_id", "id", k)
        .select(lit("sq_int8").as("method"), col("query_id"),
          col("n_match"), col("recall")))
  }

  /**
   * P50 — signed random projection (Johnson–Lindenstrauss): project each
   * vector to `dOut` dims with a ±1 sign matrix, scaled by 1/√dOut — the
   * dimensionality-reduction front end that cuts ANN/LSH cost before any
   * index is built. The sign matrix is a pure function of (salt, j, i)
   * through portable MD5 (first hex nibble ≥ 8 → −1), so it is never
   * stored, any engine regenerates it bit-identically, and at 100 TB the
   * operator is a stateless compiled projection (matrix rides into
   * codegen as a reference object) — no shuffle, no broadcast, no join.
   */
  def randomProject(corpus: DataFrame, idCol: String, vecCol: String,
      dOut: Int, salt: String = "rp"): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    require(dOut >= 1, s"randomProject: dOut must be >= 1, got $dOut")
    // dimension from the first NON-NULL vector (the embeddingNearDupsLsh
    // rule — a null first row must not crash the probe); null vectors
    // project to null, shorter/longer rows use matvec's overlap-prefix
    val head = corpus.select(col(vecCol))
      .where(col(vecCol).isNotNull).limit(1).collect()
    require(head.nonEmpty, "randomProject: corpus has no non-null vectors")
    val dIn = head(0).getSeq[Any](0).length
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs: Array[Array[Double]] = Array.tabulate(dOut, dIn) { (j, i) =>
      val b = md.digest(s"$salt:$j:$i".getBytes("UTF-8"))(0)
      if ((b & 0x80) != 0) -1.0 else 1.0
    }
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    corpus.select(col(idCol).as("id"),
      exprCol(graft.expressions.MatVecExpr(
        colExpr(col(vecCol).cast("array<double>")), signs, scale)).as("rv"))
  }

  /**
   * P46 — asymmetric-distance (ADC) top-k over PQ codes: each query
   * precomputes its distance table to every codebook row (driver-side —
   * queries are broadcast-small by the [[bruteForceTopK]] contract), and
   * the WHOLE query set is then answered in one compiled pass over the
   * codes column (per row: m table lookups per query, never the raw
   * vectors). One posexplode + one per-query window: rank by the
   * 6-decimal-rounded distance with an id tie-break (the t6 rank
   * discipline — ADC distances are approximations, so a stable tiny-eps
   * rank needs the rounding on BOTH engines).
   */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame,
      books: Array[Array[Array[Double]]], dsub: Int,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    val qRows = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .orderBy(col("qid"))
      .collect()
    require(qRows.nonEmpty, "pqAdcTopK: query set is empty")
    val tables: Array[Array[Array[Double]]] = qRows.map { r =>
      val qv = r.getSeq[Double](1).toArray
      books.zipWithIndex.map { case (book, mi) =>
        val off = mi * dsub
        book.map { c =>
          val n = math.min(off + dsub, math.min(c.length, qv.length))
          var d = 0.0
          var i = off
          while (i < n) { val t = qv(i) - c(i); d += t * t; i += 1 }
          d
        }
      }
    }
    val qidLit = array(qRows.toSeq.map(r => lit(r.get(0))): _*)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("id").asc)
    codes
      .select(col("id"), posexplode(
        exprCol(graft.expressions.PqAdcDistsExpr(colExpr(col("codes")), tables)))
        .as(Seq("__q", "__d")))
      .select(element_at(qidLit, col("__q") + 1).as("query_id"), col("id"),
        round(col("__d"), 6).as("adc_dist"))
      .where(col("query_id") =!= col("id"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * P73 — Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
   * 1998): from each query's `nCandidates` nearest neighbors, greedily
   * select `k` balancing relevance against redundancy —
   * score(d) = λ·cos(q,d) − (1−λ)·max over selected s of cos(d,s).
   * The retrieval-augmentation shape: the index returns near-duplicates
   * of one passage; MMR swaps redundant hits for diverse ones.
   *
   * Scale shape: the candidate stage is [[bruteForceTopK]]'s plan (an IVF
   * candidate stage drops in identically) — corpus scanned once, queries
   * broadcast, per-query window cut. The greedy stage is inherently
   * sequential per query over |queries|·nCandidates rows, k-sized by
   * construction — a sanctioned driver collect (the pqAdcTopK rule), never
   * corpus-sized. Determinism: all cosines round at 6 decimals, score
   * ties break on the smaller id, and the penalty coefficient is computed
   * as `1.0 - lambda` on BOTH engines (0.3 is not binary-exact — an
   * oracle writing the literal would diverge in the last ulp). `idCol`
   * must be long-castable (embedding ids). Returns
   * (query_id, id, qs, rank 1..≤k per query).
   */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nCandidates: Int = 20, k: Int = 5,
      lambda: Double = 0.7): DataFrame = {
    require(nCandidates >= 1, s"mmrRerank: nCandidates must be >= 1, got $nCandidates")
    require(k >= 1 && k <= nCandidates,
      s"mmrRerank: k must be in [1, nCandidates], got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrRerank: lambda must be in [0, 1], got $lambda")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).cast("long").as("id"),
      l2Normalize(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      l2Normalize(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qs").desc, col("id").asc)
    val cands = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        round(dotProduct(col("v"), col("qv")), 6).as("qs"), col("v"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nCandidates)
    val rows = cands.select("query_id", "id", "qs", "v").collect()
    // ragged or null-normed vectors make the candidate kernel emit null
    // cosines and would give the greedy stage a THIRD dot semantics —
    // reject loudly (the sim7 ragged-corpus rule) instead of diverging
    // from the oracle
    rows.foreach { r =>
      require(!r.isNullAt(2),
        s"mmrRerank: null cosine for id ${r.getLong(1)} — ragged vector?")
    }
    val dims = rows.map(_.getSeq[Double](3).length).distinct
    require(dims.length <= 1,
      s"mmrRerank: candidate vectors must share one dimensionality, saw ${dims.sorted.mkString(",")}")
    val mu = 1.0 - lambda
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 } // ascending — the VecEval fold
      s
    }
    final case class Cand(id: Long, qs: Double, v: Array[Double])
    val out = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).flatMap {
      case (qid, rs) =>
        val cs = rs.map(r => Cand(r.getLong(1), r.getDouble(2),
          r.getSeq[Double](3).toArray)).sortBy(c => (-c.qs, c.id))
        // one rounded sim per candidate pair, computed once (the oracle's
        // psim CTE) — the walk below only looks sims up
        val idx = cs.zipWithIndex.map { case (c, i) => c.id -> i }.toMap
        val sim = Array.tabulate(cs.length, cs.length) { (i, j) =>
          if (i == j) 1.0 else round6(dot(cs(i).v, cs(j).v))
        }
        val sel = scala.collection.mutable.ArrayBuffer.empty[Cand]
        while (sel.size < k && sel.size < cs.length) {
          val best = cs.iterator.filterNot(c => sel.exists(_.id == c.id))
            .map { cand =>
              val maxSim =
                if (sel.isEmpty) 0.0
                else sel.iterator.map(s => sim(idx(cand.id))(idx(s.id))).max
              (lambda * cand.qs - mu * maxSim, cand)
            }
            .reduceLeft { (a, b) =>
              if (b._1 > a._1 || (b._1 == a._1 && b._2.id < a._2.id)) b else a
            }
          sel += best._2
        }
        sel.iterator.zipWithIndex.map { case (s, i) => (qid, s.id, s.qs, i + 1) }
    }
    import spark.implicits._
    out.toDF("query_id", "id", "qs", "rank")
  }

  /**
   * P105 — recall@k ranking evaluation: given a ground-truth result set
   * and an approximate one (both (query, id) frames, e.g.
   * [[bruteForceTopK]] vs [[ivfTopK]]), the per-query overlap fraction
   * |truth ∩ approx| / k — the quality audit every ANN deployment runs
   * before trading exactness for speed, as an engine operator instead
   * of a notebook. Queries whose approximate set misses everything
   * still appear (recall 0) — the query universe comes from the TRUTH
   * side, so an empty approximate result can never silently inflate
   * the average.
   *
   * Shape: one (query, id)-keyed join for the intersection, a keyed
   * count, and a left join back onto the distinct query list — all
   * equi-joins, any corpus size. Exact integer counts; recall is one
   * double division rounded at 6.
   */
  def recallAtK(truth: DataFrame, approx: DataFrame, queryCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"recallAtK: k must be >= 1, got $k")
    val t = truth.select(col(queryCol).as("query_id"), col(idCol).as("id"))
    val a = approx.select(col(queryCol).as("query_id"), col(idCol).as("id"))
    val qs = t.select("query_id").distinct()
    val m = t.join(a.hint("shuffle_hash"), Seq("query_id", "id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_match"))
    qs.join(m.hint("shuffle_hash"), Seq("query_id"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .withColumn("recall",
        round(col("n_match").cast("double") / lit(k.toDouble), 6))
  }

  /**
   * P177 — reciprocal-rank fusion (Cormack et al. 2009): fuse N
   * rankings of the same candidate space by Σ 1/(c + rank) — the
   * standard score-free ensemble for heterogeneous retrievers (BM25
   * scores and cosine scores aren't commensurable; RANKS are), and
   * empirically hard to beat without training. Emits the fused top-`k`
   * with `n_lists` (how many rankings surfaced the id — agreement is
   * its own signal). c = 60 is the published default.
   *
   * Shapes: union of the (already tiny, top-k-sized) ranking frames,
   * one keyed agg, TakeOrderedAndProject. Terms round at 9 and
   * DECIMAL-sum; the final order is (rounded score desc, id).
   */
  def rrfFusion(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Long = 60L): DataFrame = {
    require(rankings.size >= 2, "rrfFusion: need at least two rankings")
    require(k >= 1, s"rrfFusion: k must be >= 1, got $k")
    require(c >= 0, s"rrfFusion: c must be >= 0, got $c")
    val all = rankings
      .map(_.select(col(idCol).as("id"), col(rankCol).as("__r")))
      .reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col("id").asc)
    all
      .withColumn("__term",
        round(lit(1.0) / (lit(c) + col("__r")).cast("double"), 9)
          .cast("decimal(28,9)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"),
        round(sum(col("__term")).cast("double"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  /**
   * P146 — greedy k-center coreset (farthest-first traversal, Gonzalez
   * 1985): from a candidate pool, pick k points so each new pick is the
   * one FARTHEST (max-min cosine distance) from everything picked so
   * far — the 2-approximation to optimal k-center cover, and the
   * diversity-first data-selection rule (seed labeling batches, pick
   * eval exemplars, initialize k-means++-style). Emits (rank, vec_id,
   * d) with `d` the distance to the nearest earlier center at selection
   * time (the traversal's own cover radius sequence; null for the
   * seed). Seed = smallest id — deterministic, no RNG.
   *
   * Scale shape: the POOL is the scale valve — at 100 TB the pool comes
   * from a hash sample or per-partition pre-selection (both engine
   * operators here), and the greedy stage is a sanctioned pool-sized
   * driver walk like [[mmrRerank]]'s, but O(k·n·dims) time and O(n)
   * state via the classic min-distance array (each new center updates
   * every candidate's distance-to-nearest-center once) — NEVER an
   * n×n matrix, which at the cap would be gigabytes of driver heap.
   * Determinism: normalization and ascending-index dots match the
   * VecEval folds, each cosine rounds at 6 before the min/max logic,
   * distance ties break on the smaller id (ascending scan keeps the
   * first maximum).
   */
  def kCenterCoreset(pool: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"kCenterCoreset: k must be >= 1, got $k")
    val spark = pool.sparkSession
    val rows = pool
      .select(col(idCol).cast("long").as("id"), l2Normalize(col(vecCol)).as("v"))
      .collect()
    require(rows.nonEmpty, "kCenterCoreset: empty pool")
    require(rows.length <= 100000,
      s"kCenterCoreset: pool of ${rows.length} exceeds the driver-walk cap; " +
        "pre-sample the pool (hashSample / per-partition selection)")
    val cs = rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val dims = cs.map(_._2.length).distinct
    require(dims.length == 1,
      s"kCenterCoreset: pool vectors must share one dimensionality, saw ${dims.sorted.mkString(",")}")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 } // ascending — VecEval
      s
    }
    val n = cs.length
    // minDist(j) = 1 − max over selected centers of round6(cos(j, center));
    // NaN marks selected rows (never re-picked). Identical values to the
    // pairwise-matrix formulation, O(n) state instead of O(n²).
    val minDist = new Array[Double](n)
    def absorb(centerIdx: Int): Unit = {
      var j = 0
      while (j < n) {
        if (!minDist(j).isNaN && j != centerIdx) {
          val d = 1.0 - round6(dot(cs(j)._2, cs(centerIdx)._2))
          if (d < minDist(j)) minDist(j) = d
        }
        j += 1
      }
      minDist(centerIdx) = Double.NaN
    }
    java.util.Arrays.fill(minDist, Double.PositiveInfinity)
    val out = scala.collection.mutable.ArrayBuffer(
      (1, cs(0)._1, Option.empty[Double]))
    absorb(0) // smallest id seeds the traversal
    var picked = 1
    while (picked < k && picked < n) {
      var bestI = -1; var bestD = Double.NegativeInfinity
      var ci = 0
      while (ci < n) {
        if (!minDist(ci).isNaN && minDist(ci) > bestD) {
          bestD = minDist(ci); bestI = ci
        }
        ci += 1
      }
      picked += 1
      out += ((picked, cs(bestI)._1, Some(bestD)))
      absorb(bestI)
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "vec_id", "d")
  }

  /**
   * P230 — simplified silhouette per cluster: with a = cosine distance
   * to the OWN (nearest) centroid and b = distance to the best OTHER
   * centroid, s = (b−a)/max(a,b) ∈ [−1,1] — the cluster-quality
   * readout for an IVF/k-means index at corpus scale (full silhouette
   * is all-pairs; the centroid form is the standard O(n·k)
   * approximation, and it is exactly what tells you a centroid set is
   * too coarse before you bucket 100 TB by it). Emits per cluster
   * (centroid_id, n_points, mean_a, mean_b, mean_s); mean_s near 0 ⇒
   * boundary-heavy clusters, near 1 ⇒ tight and separated. Requires
   * ≥ 2 centroids (b does not exist otherwise).
   *
   * Shapes: [[ivfAssign]]'s compiled-kernel projection for the OWN
   * assignment, one broadcast k-row centroid cross-join for the
   * per-centroid cosines (the adjudicated class), one keyed agg.
   * Cross-engine: cosines round at 6 (the sim1 ulp-absorption rule);
   * a/b and their difference run in DECIMAL on the rounded cosines
   * (the o46 rule); s is one double division rounded at 6; means are
   * decimal sums over the 6-rounded terms.
   */
  def silhouetteSimplified(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cents = centroids
      .select(col(centroidIdCol).as("cid"), l2Normalize(col(vecCol)).as("cv"))
    // b does not exist with a single centroid — fail loudly instead of
    // silently emitting an empty frame (centroid frames are broadcast-
    // small by the ivfAssign contract, so the count is a driver no-op)
    require(cents.limit(2).count() == 2,
      "silhouetteSimplified: need >= 2 centroids")
    val one = lit(new java.math.BigDecimal("1.000000"))
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol, centroidIdCol)
    val sims = assigned.crossJoin(broadcast(cents)) // k-row centroid side
      .withColumn("__cos", round(dotProduct(col("v"), col("cv")), 6))
    val own = sims.where(col(centroidIdCol) === col("cid"))
      .select(col("id"), col(centroidIdCol), col("__cos").as("__cosown"))
    val other = sims.where(col(centroidIdCol) =!= col("cid"))
      .groupBy(col("id")).agg(max(col("__cos")).as("__cosoth"))
    val a = one - col("__cosown").cast("decimal(7,6)")
    val b = one - col("__cosoth").cast("decimal(7,6)")
    own.join(other.hint("shuffle_hash"), Seq("id"))
      .withColumn("__a", a).withColumn("__b", b)
      .withColumn("__s", when(greatest(col("__a"), col("__b")) > 0,
        round((col("__b") - col("__a")).cast("double") /
          greatest(col("__a"), col("__b")).cast("double"), 6)))
      .groupBy(col(centroidIdCol))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("__a").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_a"),
        round(sum(col("__b").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_b"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double") /
          count(col("__s")).cast("double"), 6).as("mean_s"))
  }

  /**
   * P377 — adjusted Rand index between two clusterings of the same
   * points: agreement on PAIR co-membership, chance-corrected —
   * ARI = (ΣC(n_xy,2) − a·b/C(n,2)) / ((a+b)/2 − a·b/C(n,2)) with
   * a = ΣC(row margins,2), b = ΣC(col margins,2). The clustering
   * STABILITY read: re-fit with a different seed/centroid sample and
   * ARI near 1 says the structure is real, near 0 says the "clusters"
   * are initialization noise — the audit [[silhouetteSimplified]]
   * (which scores ONE fit in isolation) cannot give. Emits ONE row:
   * (n_points, n_clusters_a, n_clusters_b, pair_index, expected_index,
   * max_index, ari); ari is null when max = expected (both sides one
   * cluster — agreement is vacuous there).
   *
   * Shape: one id equi-join, one contingency agg + two margin aggs
   * (each 1-row, broadcast) — no pair is materialized (the d26
   * size-arithmetic rule: ΣC(c,2) via LONG shiftright halving).
   * Cross-engine: every count exact; the closing chain is a fixed
   * double sequence on exact integers, rounded at 6.
   */
  def adjustedRandIndex(a: DataFrame, b: DataFrame, idCol: String,
      clusterCol: String): DataFrame = {
    val aa = a.where(col(idCol).isNotNull && col(clusterCol).isNotNull)
      .select(col(idCol).as("__id"), col(clusterCol).as("__ca"))
    val bb = b.where(col(idCol).isNotNull && col(clusterCol).isNotNull)
      .select(col(idCol).as("__id"), col(clusterCol).as("__cb"))
    val j = aa.join(bb.hint("shuffle_hash"), Seq("__id"))
    def c2(c: Column) = shiftright(c * (c - 1), 1)
    val ix = j.groupBy(col("__ca"), col("__cb"))
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(c2(col("__n"))), lit(0L)).as("__index"),
        coalesce(sum(col("__n")), lit(0L)).as("n_points"))
    // duplicate-assignment contract: a repeated id fans the equi-join
    // out and SILENTLY corrupts every C(n,2) term — raise instead (the
    // kMap discipline); the guard rides inside the n_points output so
    // Catalyst cannot prune it
    val dups = j.agg(countDistinct(col("__id")).as("__du"))
    val guardedN = when(col("n_points") =!= col("__du"),
      raise_error(concat(lit("adjustedRandIndex: duplicate ids — "),
        col("n_points").cast("string"), lit(" joined rows over "),
        col("__du").cast("string"), lit(" distinct ids"))).cast("long"))
      .otherwise(col("n_points"))
    val am = j.groupBy(col("__ca")).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(c2(col("__n"))), lit(0L)).as("__a"),
        count(lit(1)).as("n_clusters_a"))
    val bm = j.groupBy(col("__cb")).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(c2(col("__n"))), lit(0L)).as("__b"),
        count(lit(1)).as("n_clusters_b"))
    val t = c2(col("n_points")).cast("double")
    val expected = col("__a").cast("double") * col("__b").cast("double") / t
    val maxi = (col("__a") + col("__b")).cast("double") / lit(2.0)
    val den = maxi - expected
    ix.crossJoin(broadcast(am)).crossJoin(broadcast(bm))
      .crossJoin(broadcast(dups)) // 1-row sides
      .select(guardedN.as("n_points"), col("n_clusters_a"),
        col("n_clusters_b"),
        col("__index").as("pair_index"),
        when(col("n_points") > 1, round(expected, 6)).as("expected_index"),
        round(maxi, 6).as("max_index"),
        when(col("n_points") > 1 && den =!= 0.0,
          round((col("__index").cast("double") - expected) / den, 6))
          .as("ari"))
  }

  /**
   * P274 — embedding isotropy audit: the mean pairwise cosine of the
   * corpus via the sum-vector identity Σᵢ≠ⱼ uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖² —
   * NO pairwise pass at all, one linear sweep (the anisotropy read
   * behind "all my embeddings point the same way", which silently
   * breaks cosine thresholds like d7/d12's 0.8 and flattens ANN
   * contrast). Also emits the centroid norm ‖mean u‖ ∈ [0, 1] (≈ 0
   * isotropic, → 1 collapsed). Emits ONE row (n_vectors, dim,
   * mean_cosine, centroid_norm).
   *
   * Shape: normalize per row (the d7 codegen kernel — sequential fold,
   * zero vectors → zeros), posexplode, ONE (dim)-keyed agg, one k-row
   * closing agg — fully partition-parallel, scales to any corpus.
   * Cross-engine: normalized elements round at 6 then become exact
   * micro-unit BIGINTs; per-dim sums exact; the dim-sized squares go
   * through DECIMAL(19,0) products; two closing fixed double sequences
   * rounded at 6.
   */
  def isotropyAudit(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val e = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), Dedup.l2Normalize(col(vecCol)).as("__nv"))
    val nAgg = e.agg(count(lit(1)).as("__n"))
    val ex = e.select(posexplode(col("__nv")).as(Seq("__pos", "__u")))
      .select(col("__pos"),
        (round(col("__u"), 6).cast("decimal(9,6)") * lit(1000000L))
          .cast("long").as("__m"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    // element squares through DECIMAL(19,0) products: the Long sum of
    // m² (≤ 10¹² each) overflows past ~9M corpus rows per dimension
    val perDim = ex.groupBy(col("__pos"))
      .agg(sum(col("__m")).as("__s"),
        sum(d19(col("__m")) * d19(col("__m"))).as("__q"))
    val closing = perDim.agg(count(lit(1)).as("dim"),
        sum(d19(col("__s")) * d19(col("__s"))).as("__ss"),
        sum(col("__q")).as("__qq"))
      .crossJoin(broadcast(nAgg)) // 1-row scalar side
    val nd = col("__n").cast("double")
    closing.select(col("__n").as("n_vectors"), col("dim"),
      when(col("__n") > 1,
        round((col("__ss").cast("double") - col("__qq").cast("double")) /
          (nd * (nd - lit(1.0))) / lit(1.0e12), 6)).as("mean_cosine"),
      when(col("__n") > 0,
        round(sqrt(col("__ss").cast("double")) / nd / lit(1000000.0), 6))
        .as("centroid_norm"))
  }
}
