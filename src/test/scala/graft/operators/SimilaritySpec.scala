package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Similarity-search semantics: exact ranking, IVF bucketing and recall. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0, 0.0)),
    (2L, Array(0.9, 0.1)),
    (3L, Array(0.0, 1.0)),
    (4L, Array(0.1, 0.9)),
    (5L, Array(-1.0, 0.0))
  ).toDF("id", "v")

  test("brute-force top-k ranks by cosine, excludes self, caps at k") {
    val q = vecs.where(col("id") === 1)
    val out = Similarity.bruteForceTopK(vecs, q, "id", "v", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank"))).toSeq
    // nearest to (1,0): 2 (cos≈0.994), then 3/4... cos(1,3)=0, cos(1,4)≈0.110
    assert(out == Seq((2L, 1), (4L, 2)))
  }

  test("ivf assignment picks the nearest centroid") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
      .select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx(1L) == 100L && idx(2L) == 100L)
    assert(idx(3L) == 200L && idx(4L) == 200L)
  }

  test("ivf assignment preserves non-numeric centroid id values and type") {
    // string bucket names must survive verbatim — no numeric cast in the
    // assignment path (an ANSI cast would throw; a silent cast would flip
    // the output schema to bigint)
    val centroids = Seq(("east", Array(1.0, 0.0)), ("north", Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val out = Similarity.ivfAssign(vecs, centroids, "id", "v")
    assert(out.schema("centroid_id").dataType.typeName == "string")
    val idx = out.select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idx(1L) == "east" && idx(3L) == "north")
  }

  test("ivf with all probes matches brute force exactly") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val q = vecs.where(col("id") <= 2)
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
    val ivf = Similarity.ivfTopK(idx, centroids, q, "id", "v", k = 3, nProbe = 2)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(vecs, q, "id", "v", k = 3)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("ivf with one probe searches only the query's bucket") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val q = vecs.where(col("id") === 1)
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
    val out = Similarity.ivfTopK(idx, centroids, q, "id", "v", k = 5, nProbe = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    // bucket 100 holds {1, 2} (vec 5=(-1,0) has cos -1 vs 0 → bucket 200);
    // self excluded → {2}
    assert(out == Set(2L))
  }

  test("k-means refinement pulls seed centroids onto the true cluster directions") {
    // two tight clusters around (1,0) and (0,1); seeds deliberately bad —
    // both in the first quadrant but closest to different clusters
    val pts = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.99, 0.14)), (3L, Array(0.99, -0.14)),
      (4L, Array(0.0, 1.0)), (5L, Array(0.14, 0.99)), (6L, Array(-0.14, 0.99))
    ).toDF("id", "v")
    val seeds = Seq(("cx", Array(0.8, 0.6)), ("cy", Array(0.6, 0.8)))
      .toDF("centroid_id", "v")
    val refined = Similarity.kmeansRefine(pts, seeds, "id", "v", iters = 3)
    // shape is drop-in for ivfAssign: same columns, ids verbatim
    assert(refined.columns.toSeq == Seq("centroid_id", "v"))
    val assign = Similarity.ivfAssign(pts, refined, "id", "v")
      .select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(1L, 2L, 3L).map(assign) == Set("cx"))
    assert(Set(4L, 5L, 6L).map(assign) == Set("cy"))
    // refined centroid ≈ mean direction of its cluster (x-cluster mean tilts
    // to pure (1,0) after normalization-averaging; y likewise)
    val cx = refined.where(col("centroid_id") === "cx")
      .select("v").head().getSeq[Double](0)
    assert(cx(0) > 0.99 && math.abs(cx(1)) < 0.01)
  }

  test("ivf assignment and refinement honor a custom centroid id column name") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("bucket", "v")
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v", centroidIdCol = "bucket")
    assert(idx.columns.contains("bucket"))
    val refined = Similarity.kmeansRefine(vecs, centroids, "id", "v",
      iters = 1, centroidIdCol = "bucket")
    assert(refined.columns.toSeq == Seq("bucket", "v"))
    val q = vecs.where(col("id") === 1)
    val top = Similarity.ivfTopK(idx, centroids, q, "id", "v", k = 5, nProbe = 1,
      centroidIdCol = "bucket")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top == Set(2L))
  }

  test("k-means refinement keeps empty clusters and is a no-op at zero iters") {
    val pts = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.99, 0.14))).toDF("id", "v")
    val seeds = Seq((10L, Array(1.0, 0.0)), (20L, Array(-1.0, 0.0)))
      .toDF("centroid_id", "v")
    val refined = Similarity.kmeansRefine(pts, seeds, "id", "v", iters = 2)
    val byId = refined.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(byId.keySet == Set(10L, 20L), "empty cluster must not vanish")
    assert(byId(20L) == Seq(-1.0, 0.0), "empty cluster keeps its previous centroid")
    val zero = Similarity.kmeansRefine(pts, seeds, "id", "v", iters = 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(zero == Map(10L -> Seq(1.0, 0.0), 20L -> Seq(-1.0, 0.0)))
  }

  // 4-dim corpus, 2 subspaces of 2 dims; ids 1 and 2 are the codebook
  private lazy val pqCorpus = Seq(
    (1L, Array(0.0, 0.0, 10.0, 10.0)),
    (2L, Array(5.0, 5.0, 0.0, 0.0)),
    (3L, Array(0.1, 0.1, 0.2, 0.1)),   // sub0 near code0, sub1 near code1
    (4L, Array(4.9, 5.2, 9.0, 9.0))    // sub0 near code1, sub1 near code0
  ).toDF("id", "v")

  test("pqEncode picks the per-subspace argmin code, ties to the lowest code") {
    val (books, dsub) = Similarity.pqCodebooks(pqCorpus, "id", "v", m = 2, k = 2)
    assert(dsub == 2 && books.length == 2 && books(0).length == 2)
    val codes = Similarity.pqEncode(pqCorpus, books, dsub, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // codebook vectors encode to themselves (distance 0 in every subspace)
    assert(codes(1L) == Seq(0, 0) && codes(2L) == Seq(1, 1))
    assert(codes(3L) == Seq(0, 1) && codes(4L) == Seq(1, 0))
    // dimension count must split evenly into subspaces
    intercept[IllegalArgumentException](
      Similarity.pqCodebooks(pqCorpus, "id", "v", m = 3, k = 2))
  }

  test("randomProject applies the MD5-derived sign matrix with 1/sqrt(dOut) scale") {
    // basis vector e_2 isolates column i=2: out(j) = sign(j, 2) · 0.5
    val df = Seq((1L, Array(0.0, 0.0, 1.0)), (2L, Array(0.0, 0.0, 1.0)))
      .toDF("id", "v")
    val got = Similarity.randomProject(df, "id", "v", dOut = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until 4).map { j =>
      val b = md.digest(s"rp:$j:2".getBytes("UTF-8"))(0)
      (if ((b & 0x80) != 0) -1.0 else 1.0) * 0.5
    }
    assert(got(1L) == expected)
    // identical inputs project identically
    assert(got(1L) == got(2L))
    // the full 4×3 sign matrix must contain BOTH signs (a bug that reads
    // the wrong md5 bit and emits all +1 would otherwise pass)
    val allSigns = (for (j <- 0 until 4; i <- 0 until 3) yield {
      val b = md.digest(s"rp:$j:$i".getBytes("UTF-8"))(0)
      if ((b & 0x80) != 0) -1.0 else 1.0
    }).toSet
    assert(allSigns == Set(-1.0, 1.0))
    intercept[IllegalArgumentException](
      Similarity.randomProject(df, "id", "v", dOut = 0))
    // a null first row must not crash the dimension probe (the
    // embeddingNearDupsLsh rule); null vectors project to null
    val ragged = Seq((1L, null: Array[Double]), (2L, Array(0.0, 0.0, 1.0)))
      .toDF("id", "v")
    val r = Similarity.randomProject(ragged, "id", "v", dOut = 4)
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(1L).isEmpty && r(2L).nonEmpty)
  }

  test("sqQuantize codes per-dim extrema to the uint8 grid") {
    // dim 0 spans [0, 10]: 0→0, 5→128 (127.5+0.5 floors to 128), 10→255;
    // dim 1 is constant (zero range) → always 0
    val df = Seq(
      (1L, Array(0.0, 7.0)),
      (2L, Array(5.0, 7.0)),
      (3L, Array(10.0, 7.0))
    ).toDF("id", "v")
    val got = Similarity.sqQuantize(df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0))
    assert(got(2L) == Seq(128, 0))
    assert(got(3L) == Seq(255, 0))
    // partitioning-invariant: extrema are exact, not order-dependent
    val again = Similarity.sqQuantize(df.repartition(3), "id", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == again)
    // ragged corpora are rejected, not silently mis-coded — including the
    // zero-length vector a per-dim count check can't see (it contributes
    // no exploded rows)
    val ragged = Seq((1L, Array(1.0)), (2L, Array(1.0, 2.0))).toDF("id", "v")
    intercept[IllegalArgumentException](Similarity.sqQuantize(ragged, "id", "v"))
    val withEmpty = Seq((1L, Array.empty[Double]), (2L, Array(1.0, 2.0)))
      .toDF("id", "v")
    intercept[IllegalArgumentException](Similarity.sqQuantize(withEmpty, "id", "v"))
  }

  test("per-subspace k-means codebooks beat the sample seed on ADC recall") {
    // two tight clusters (A near 0, B near 10 on all dims) with BOTH seed
    // ids (the k lowest) in cluster A — the sample codebook is then blind
    // to the cluster structure, while Lloyd refinement recovers it
    val corpus = Seq(
      (1L, Array(0.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.1, 0.1, 0.1, 0.1)),
      (3L, Array(0.05, 0.0, 0.0, 0.05)),
      (4L, Array(0.0, 0.05, 0.05, 0.0)),
      (7L, Array(10.0, 10.0, 10.0, 10.0)),
      (8L, Array(10.1, 10.0, 10.0, 10.1)),
      (9L, Array(10.0, 10.1, 10.1, 10.0)),
      (10L, Array(9.9, 10.0, 10.0, 9.9))
    ).toDF("id", "v")
    val query = Seq((100L, Array(10.0, 10.05, 10.05, 10.0))).toDF("id", "v")
    // exact L2 top-3 is {7, 9, 8} — all cluster B
    def top3(books: Array[Array[Array[Double]]], dsub: Int): Seq[Long] = {
      val codes = Similarity.pqEncode(corpus, books, dsub, "id", "v")
      Similarity.pqAdcTopK(codes, query, books, dsub, "id", "v", k = 3)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
    }
    val truth = Set(7L, 8L, 9L)
    val (sampleBooks, dsub) = Similarity.pqCodebooks(corpus, "id", "v", m = 2, k = 2)
    val (refined, dsub2) = Similarity.pqCodebooks(corpus, "id", "v", m = 2, k = 2, iters = 3)
    assert(dsub == 2 && dsub2 == 2)
    // the seed sample codebook collapses cluster B onto seed id 2's code,
    // so the false neighbor 2 outranks a true one — recall 2/3
    val sampleTop = top3(sampleBooks, dsub)
    assert(sampleTop == Seq(2L, 7L, 8L))
    assert((sampleTop.toSet & truth).size == 2)
    // refined codebooks separate the clusters — recall 3/3, exact order
    assert(top3(refined, dsub2) == Seq(7L, 8L, 9L))
    // refinement must actually move the rows (guards a vacuous pass)
    assert(!refined(0).zip(sampleBooks(0)).forall { case (a, b) => a.sameElements(b) })
    // iters = 0 returns the seed sample verbatim (sim4/sim5 contract)
    val (zero, _) = Similarity.pqCodebooks(corpus, "id", "v", m = 2, k = 2, iters = 0)
    assert(zero.flatten.map(_.toSeq) sameElements sampleBooks.flatten.map(_.toSeq))
    // decimal-summed means: the refined books are partitioning-invariant
    val (again, _) = Similarity.pqCodebooks(corpus.repartition(5), "id", "v",
      m = 2, k = 2, iters = 3)
    assert(again.flatten.map(_.toSeq).toSeq == refined.flatten.map(_.toSeq).toSeq)
  }

  test("mmrRerank trades redundant relevance for diversity; lambda=1 is pure top-k") {
    // q = (1,1,0); id 1 nearly duplicates id 2 (both ~aligned with x̂),
    // id 3 is equally relevant as id 2 but orthogonal to 1 and 2 — pure
    // top-2 keeps the near-dup pair, MMR swaps in the diverse doc
    val corpus = Seq(
      (1L, Array(1.0, 0.05, 0.0)),
      (2L, Array(1.0, 0.0, 0.0)),
      (3L, Array(0.0, 1.0, 0.0)),
      (4L, Array(-1.0, 0.0, 0.0))
    ).toDF("vec_id", "v")
    val query = Seq((100L, Array(1.0, 1.0, 0.0))).toDF("vec_id", "v")
    val brute = Similarity.bruteForceTopK(corpus, query, "vec_id", "v", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(brute == Seq(1L, 2L)) // cos ties between 2 and 3 break to id 2
    val mmr = Similarity.mmrRerank(corpus, query, "vec_id", "v",
        nCandidates = 4, k = 2, lambda = 0.7)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(mmr.toSeq == Seq((100L, 1L, 1), (100L, 3L, 2)),
      s"MMR should swap the near-dup for the diverse doc, got ${mmr.toSeq}")
    // λ = 1 disables the redundancy penalty → pure relevance order
    val pure = Similarity.mmrRerank(corpus, query, "vec_id", "v",
        nCandidates = 4, k = 2, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(pure == brute)
    // deterministic under repartitioning
    val again = Similarity.mmrRerank(corpus.repartition(3), query, "vec_id", "v",
        nCandidates = 4, k = 2, lambda = 0.7)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(again.toSeq == mmr.toSeq)
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(corpus, query, "vec_id", "v", nCandidates = 2, k = 3))
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(corpus, query, "vec_id", "v", k = 1, lambda = 1.5))
    // ragged corpora are rejected (the sim7 rule) — a truncated vector
    // would otherwise give the greedy stage a third dot semantics
    val ragged = corpus.union(Seq((9L, Array(1.0, 0.0))).toDF("vec_id", "v"))
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(ragged, query, "vec_id", "v", nCandidates = 5, k = 2))
  }

  test("pqAdcTopK ranks by the summed per-subspace table distances") {
    val (books, dsub) = Similarity.pqCodebooks(pqCorpus, "id", "v", m = 2, k = 2)
    val codes = Similarity.pqEncode(pqCorpus, books, dsub, "id", "v")
    val queries = pqCorpus.where(col("id") === 3)
    val got = Similarity.pqAdcTopK(codes, queries, books, dsub, "id", "v", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getDouble(2)))
    // query 3's tables: sub0 → d(code0)=0.02, d(code1)=48.02;
    //                   sub1 → d(code0)=194.05, d(code1)=0.05.
    // doc2=(1,1): 48.02+0.05=48.07 | doc1=(0,0): 0.02+194.05=194.07 |
    // doc4=(1,0): 48.02+194.05=242.07; self (3) excluded → order 2, 1, 4
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L))
    assert(got.map(_._3).toSeq == Seq(48.07, 194.07, 242.07))
    // every rank row carries the query id
    val qids = Similarity.pqAdcTopK(codes, queries, books, dsub, "id", "v", k = 3)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSeq
    assert(qids == Seq(3L))
  }

  test("recallAtK: per-query overlap, zero-recall queries still appear") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L),
      (3L, 31L)).toDF("q", "i")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 98L),
      (3L, 99L)).toDF("q", "i")
    val got = Similarity.recallAtK(truth, approx, "q", "i", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == Map(1L -> ((2L, 1.0)), 2L -> ((1L, 0.5)), 3L -> ((0L, 0.0))))
    // extra approximate rows beyond truth's queries never create rows
    val extra = approx.union(Seq((9L, 1L)).toDF("q", "i"))
    assert(Similarity.recallAtK(truth, extra, "q", "i", 2).count() == 3)
    intercept[IllegalArgumentException](
      Similarity.recallAtK(truth, approx, "q", "i", 0))
  }

  test("kCenterCoreset walks farthest-first from the smallest id") {
    import spark.implicits._
    // three orthogonal axes + a near-duplicate of the seed:
    // seed = id 1 (x-axis); both axes y and z are at distance 1.0 from
    // it — tie → smaller id (2); then z (3) at distance 1.0 from the
    // set; the near-dup (4) comes last with a small distance
    val pool = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)),
      (4L, Seq(0.8, 0.6, 0.0))).toDF("id", "v")
    val got = Similarity.kCenterCoreset(pool, "id", "v", k = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got(1) == ((1L, None)))
    assert(got(2) == ((2L, Some(1.0))))
    assert(got(3) == ((3L, Some(1.0))))
    // nearest center to (0.8, 0.6, 0) is the seed: cos = 0.8 → d = 0.2
    assert(got(4)._1 == 4L)
    assert(math.abs(got(4)._2.get - 0.2) < 1e-9)
    // k larger than the pool stops at the pool size
    assert(Similarity.kCenterCoreset(pool, "id", "v", k = 9).count() == 4)
    intercept[IllegalArgumentException](
      Similarity.kCenterCoreset(pool, "id", "v", 0))
  }

  test("rrfFusion: agreement wins; singly-listed ids rank by 1/(c+r)") {
    import spark.implicits._
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")
    val got = Similarity.rrfFusion(Seq(r1, r2), "id", "rank", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    def t(r: Int) = BigDecimal(1.0 / (60.0 + r))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def s(rs: Int*) = BigDecimal(rs.map(t).sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20: ranks 2+1; 10: ranks 1+3; 40: rank 2; 30: rank 3
    assert(got(20L) == ((2L, s(2, 1), 1)))
    assert(got(10L) == ((2L, s(1, 3), 2)))
    assert(got(40L) == ((1L, s(2), 3)))
    assert(got(30L) == ((1L, s(3), 4)))
    intercept[IllegalArgumentException](
      Similarity.rrfFusion(Seq(r1), "id", "rank", 4))
  }

  test("silhouetteSimplified: tight separated clusters score near 1") {
    import spark.implicits._
    // two orthogonal bundles with tiny within-cluster jitter
    val pts = (1 to 10).map(i => (i.toLong, Array(1.0, 0.001 * i))) ++
      (1 to 10).map(i => (100L + i, Array(0.001 * i, 1.0)))
    val corpus = pts.toDF("vec_id", "v")
    val cents = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val rows = Similarity.silhouetteSimplified(corpus, cents, "vec_id", "v")
      .orderBy("centroid_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(1) == 10L))
    assert(rows.forall(_.getDouble(4) > 0.98))     // mean_s ≈ 1
    assert(rows.forall(r => r.getDouble(2) < 0.001 && r.getDouble(3) > 0.9))
    // a point equidistant from both centroids scores s = 0
    val mid = Seq((5L, Array(1.0, 1.0))).toDF("vec_id", "v")
    val m = Similarity.silhouetteSimplified(mid, cents, "vec_id", "v")
      .collect()
    assert(m.length == 1 && m.head.getDouble(4) == 0.0)
    intercept[IllegalArgumentException](Similarity.silhouetteSimplified(
      corpus, cents.where(col("centroid_id") === 1L), "vec_id", "v"))
  }

  test("isotropyAudit: collapsed corpus reads 1, orthogonal reads 0") {
    import spark.implicits._
    // three copies of one direction: every pairwise cosine is 1
    val collapsed = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(3.0f, 4.0f)),
      (3L, Seq(6.0f, 8.0f))).toDF("vec_id", "v")
    val c = Similarity.isotropyAudit(collapsed, "vec_id", "v").head
    assert(c.getLong(0) == 3L && c.getLong(1) == 2L)
    assert(c.getDouble(2) == 1.0 && c.getDouble(3) == 1.0)
    // an orthogonal pair: mean cosine 0, centroid norm 1/√2
    val ortho = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "v")
    val o = Similarity.isotropyAudit(ortho, "vec_id", "v").head
    assert(o.getDouble(2) == 0.0 && o.getDouble(3) == 0.707107)
    // an opposed pair: mean cosine −1, centroid collapses to 0
    val opp = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "v")
    val p = Similarity.isotropyAudit(opp, "vec_id", "v").head
    assert(p.getDouble(2) == -1.0 && p.getDouble(3) == 0.0)
  }

  test("sqReconError: endpoint dims decode exactly, a midpoint pays " +
      "half a step") {
    import spark.implicits._
    // dim 0 holds a midpoint 0.5 (code 128 → recon 128/255), dim 1 only
    // the extrema (codes 0/255 decode exactly)
    val corpus = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(1.0, 1.0)), (3L, Array(0.5, 0.0)))
      .toDF("id", "v")
    val got = Similarity.sqReconError(corpus, "id", "v").orderBy("d")
      .collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getInt(0) == 0 && d0.getDouble(1) == 0.0 &&
      d0.getDouble(2) == 1.0 && d0.getLong(3) == 3L)
    assert(d0.getDouble(4) == 1.282e-6)          // (0.5 − 128/255)²/3 at 9
    assert(d0.getDouble(5) == 0.001960784)       // |err| of the midpoint
    val d1 = got(1)
    assert(d1.getDouble(4) == 0.0 && d1.getDouble(5) == 0.0)
  }

  test("l2BruteTopK: squared-L2 order with id tie-break") {
    import spark.implicits._
    val corpus = Seq((1L, Array(0.0, 0.0)), (2L, Array(3.0, 4.0)),
      (3L, Array(1.0, 0.0)), (4L, Array(0.0, 1.0))).toDF("id", "v")
    val q = corpus.where(col("id") === 1L)
    val got = Similarity.l2BruteTopK(corpus, q, "id", "v", k = 3)
      .orderBy("rank").collect()
    // distances from origin: id3 → 1, id4 → 1 (tie → smaller id), id2 → 25
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 4L, 2L))
    assert(got.map(_.getDouble(2)).toSeq == Seq(1.0, 1.0, 25.0))
    intercept[IllegalArgumentException](
      Similarity.l2BruteTopK(corpus, q, "id", "v", 0))
  }

  test("quantizerRecallCompare: SQ on an endpoint grid is " +
      "retrieval-lossless; shapes and bounds hold") {
    import spark.implicits._
    // 16+ vectors (the codebook floor) on a 0/1 endpoint grid — SQ
    // decodes endpoints exactly, so its recall MUST be 1.0
    val corpus = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(d => if (((i >> d) & 1L) == 1L) 1.0 else 0.0))
    }.toDF("id", "v")
    val q = corpus.where(col("id") < 2L)
    val got = Similarity.quantizerRecallCompare(corpus, q, "id", "v",
      k = 3, m = 4, kCodes = 16).collect()
    assert(got.length == 4) // 2 methods × 2 queries
    val sq = got.filter(_.getString(0) == "sq_int8")
    assert(sq.forall(_.getDouble(3) == 1.0))
    val pq = got.filter(_.getString(0) == "pq_adc")
    assert(pq.length == 2 &&
      pq.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("adjustedRandIndex: identical clusterings score 1, " +
      "crossed ones go negative") {
    import spark.implicits._
    val a = Seq((1L, "p"), (2L, "p"), (3L, "p"), (4L, "q"), (5L, "q"),
      (6L, "q")).toDF("id", "c")
    val same = Similarity.adjustedRandIndex(a, a, "id", "c").head
    assert(same.getLong(0) == 6L && same.getLong(1) == 2L &&
      same.getLong(2) == 2L)
    assert(same.getLong(3) == 6L && same.getDouble(6) == 1.0)
    // B swaps 3 and 4 across the split: index 2, a = b = 6, t = 15,
    // expected 2.4, max 6 → ari = −0.4/3.6 = −0.111111
    val b = Seq((1L, "u"), (2L, "u"), (4L, "u"), (3L, "v"), (5L, "v"),
      (6L, "v")).toDF("id", "c")
    val crossed = Similarity.adjustedRandIndex(a, b, "id", "c").head
    assert(crossed.getLong(3) == 2L)
    assert(crossed.getDouble(4) == 2.4 && crossed.getDouble(5) == 6.0)
    assert(crossed.getDouble(6) == -0.111111)
    // both sides one cluster: max = expected — ari must be null, not 0/0
    val one = Seq((1L, "z"), (2L, "z")).toDF("id", "c")
    val deg = Similarity.adjustedRandIndex(one, one, "id", "c").head
    assert(deg.isNullAt(6))
    // a duplicated id fans the join out and must raise, not corrupt
    val dup = Seq((1L, "p"), (1L, "q"), (2L, "p")).toDF("id", "c")
    val ex = intercept[Exception](
      Similarity.adjustedRandIndex(dup, b, "id", "c").collect())
    assert(String.valueOf(ex.getMessage).contains("adjustedRandIndex") ||
      String.valueOf(ex.getCause).contains("adjustedRandIndex"))
  }
}
