package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup operator semantics: exact survivors, Jaccard math, MinHash/LSH
  * determinism and recall, SimHash locality, cosine pipelines. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "totally unrelated words forming another document")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the min id per text") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L))
    val pairs = Dedup.exactDupPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("token jaccard finds near and exact dups above threshold") {
    val pairs = Dedup.tokenJaccardPairs(corpus, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.head._3 == 1.0)
    // 1 vs 3: tokens {the,quick,brown,fox,jumps,over,lazy,dog} vs {...cat}:
    // inter 7, union 9
    assert(math.abs(pairs(1)._3 - 7.0 / 9) < 1e-12)
  }

  test("jaccard under maxDocFreq scores within the filtered token space") {
    // 'the' appears in 4 of 5 docs; cap 3 removes it from BOTH the
    // intersection and the set sizes — docs 1/2 are still identical in the
    // filtered space, so their jaccard stays 1.0
    val pairs = Dedup.tokenJaccardPairs(corpus, "doc_id", "text", 0.99,
        maxDocFreq = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.contains((1L, 2L, 1.0)))
  }

  test("ngram shingles slide correctly") {
    val df = Seq((1L, "abcde")).toDF("id", "text")
    val grams = Dedup.docShingles(df, "id", "text", 3)
      .select("token").collect().map(_.getString(0)).sorted
    assert(grams.toSeq == Seq("abc", "bcd", "cde"))
  }

  test("minhash signatures are deterministic and length-k") {
    val tokens = Dedup.docTokens(corpus, "doc_id", "text")
    val sig1 = Dedup.minhashSignatures(tokens, 16, seed = 7L)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val sig2 = Dedup.minhashSignatures(tokens, 16, seed = 7L)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(sig1.toSeq == sig2.toSeq)
    assert(sig1.forall(_.length == 16))
    // identical docs → identical signatures
    assert(sig1(0) == sig1(1))
  }

  test("minhash+LSH pipeline finds dups and respects the threshold") {
    val out = Dedup.minhashNearDups(corpus, "doc_id", "text",
        threshold = 0.7, numHashes = 32, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // exact dup always collides; near dup (jaccard 0.78) found with 8 bands
    assert(out.contains((1L, 2L)))
    assert(out.forall { case (i, j) => Set(1L, 2L, 3L).contains(i) && Set(1L, 2L, 3L).contains(j) })
  }

  test("simhash: identical docs share fingerprints, near dups are close") {
    val fps = Dedup.simhash(Dedup.docTokens(corpus, "doc_id", "text"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(1L) == fps(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(4L)))
  }

  test("simhash near-dup banding has full recall for distance ≤ bands-1") {
    val out = Dedup.simhashNearDups(corpus, "doc_id", "text", maxDistance = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.contains((1L, 2L))) // distance 0 must always surface
  }

  // ---- containment + recall pins (LSH vs exact, seeded corpus) ------------

  // 60 base docs of 30 vocabulary words; each has a perturbed twin with 2
  // words swapped out → twin-pair jaccard = 28/32 = 0.875, above the 0.8
  // threshold but below 1, so banding recall is genuinely exercised
  private lazy val nearDupCorpus = {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 200).map(i => s"w$i")
    (0 until 60).flatMap { i =>
      val base = rnd.shuffle(vocab).take(30)
      val twin = base.drop(2) ++ Seq(s"x${i}a", s"x${i}b")
      Seq((i * 2L, base.mkString(" ")), (i * 2L + 1, twin.mkString(" ")))
    }.toDF("doc_id", "text")
  }

  test("minhash LSH pairs ⊆ exact jaccard pairs, recall ≥ design bound") {
    val exact = Dedup.tokenJaccardPairs(nearDupCorpus, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(nearDupCorpus, "doc_id", "text",
        threshold = 0.8, numHashes = 32, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 60, s"corpus should yield ≥60 true pairs, got ${exact.size}")
    // candidate verification makes containment unconditional
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh -- exact}")
    // design bound: P(catch | j=0.875, 8 bands of 4) = 1-(1-j⁴)⁸ ≈ 0.9991;
    // 0.95 leaves margin while still catching a broken banding scheme
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall below design bound")
  }

  test("simhash banding output equals brute-force hamming pairs (lossless)") {
    val tokens = Dedup.docTokens(nearDupCorpus, "doc_id", "text")
    val fps = Dedup.simhash(tokens).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      (i, fi) <- fps; (j, fj) <- fps if i < j
      if java.lang.Long.bitCount(fi ^ fj) <= 3
    } yield (i, j)).toSet
    val banded = Dedup.simhashNearDups(nearDupCorpus, "doc_id", "text",
        maxDistance = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"pigeonhole banding must be lossless: missing=${brute -- banded} extra=${banded -- brute}")
  }

  test("portable token hash equals the first 56 bits of standard MD5") {
    val toks = Seq("hello", "world", "graft").toDF("token")
    val got = toks.select(Dedup.portableTokenHash.as("h"))
      .collect().map(_.getLong(0)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = Seq("hello", "world", "graft").map { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    assert(got == want)
  }

  test("cosine near-dup: brute and LSH agree on scaled copies") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(2.0, 0.0, 0.0, 0.0)),   // same direction as 1
      (3L, Array(0.0, 1.0, 0.0, 0.0)),   // orthogonal
      (4L, Array(0.9, 0.1, 0.0, 0.0))    // close to 1
    ).toDF("id", "v")
    val brute = Dedup.embeddingNearDupsBrute(vecs, "id", "v", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // cos(1,2)=1; cos(1,4)=cos(2,4)=0.9/√0.82≈0.9939; orthogonal pairs excluded
    assert(brute == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val lsh = Dedup.embeddingNearDupsLsh(vecs, "id", "v", 0.95, bits = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lsh.contains((1L, 2L))) // identical direction collides in every band
    assert(lsh.toSet.subsetOf(brute.toSet)) // LSH verified results ⊆ brute
  }

  test("prefixJaccardPairs equals the plain join at every threshold") {
    // duplicated + near-dup + disjoint docs; thresholds across the range,
    // including 1.0 (single-token prefixes must still catch exact dups)
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon"),
      (4L, "zeta eta theta iota"),
      (5L, "alpha zeta"),
      (6L, "kappa"))
      .toDF("id", "text")
    for (t <- Seq(0.3, 0.5, 0.75, 1.0)) {
      val plain = Dedup.tokenJaccardPairs(docs, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefixed = Dedup.prefixJaccardPairs(docs, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(prefixed == plain, s"identity broken at t=$t")
    }
    // the filter actually prunes: candidate tokens ≤ full tokens, strictly
    // fewer here (4-token docs at t=0.75 keep a 2-token prefix)
    val full = Dedup.docTokens(docs, "id", "text").count()
    val prefixCand = Dedup.prefixJaccardPairs(docs, "id", "text", 0.75)
    assert(prefixCand.collect().nonEmpty && full == 19L)
    intercept[IllegalArgumentException](
      Dedup.prefixJaccardPairs(docs, "id", "text", 0.0))
  }

  test("semanticDedup keeps the lowest id of each neighborhood, by dominance") {
    // 1∥2∥3 colinear (all pairwise cos 1) → only 1 survives; 7 orthogonal
    // to everything survives; 5 close to 1 (cos ≈0.994 ≥ 0.95) falls to 1
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(2.0, 0.0, 0.0, 0.0)),
      (3L, Array(5.0, 0.0, 0.0, 0.0)),
      (5L, Array(0.9, 0.1, 0.0, 0.0)),
      (7L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("id", "v")
    val kept = Dedup.semanticDedup(vecs, "id", "v", 0.95, bits = 8, bands = 4)
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 7L)))
    // dominance is stricter than greedy-keep-first: c falls to the
    // already-dropped b (a~b ≈0.9864, b~c ≈0.9878, a~c ≈0.9487 < τ —
    // greedy-vs-survivors would have kept c)
    val chain = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 1.0 / 6.0)), (3L, Array(1.0, 1.0 / 3.0))
    ).toDF("id", "v")
    val chainKept = Dedup.semanticDedup(chain, "id", "v", 0.98,
        // 1-bit bands: ANY shared sign bit makes a candidate, so the
        // near-but-not-colinear pairs can't be lost to a signature miss
        bits = 8, bands = 8)
      .collect().map(_.getLong(0)).sorted
    assert(chainKept.sameElements(Array(1L)))
    // survivors keep their original columns untouched
    val cols = Dedup.semanticDedup(vecs, "id", "v", 0.95, bits = 8, bands = 4).columns
    assert(cols.sameElements(Array("id", "v")))
  }

  test("near-dup pipelines hold no cache at all (repeated calls don't leak)") {
    spark.catalog.clearCache()
    (1 to 2).foreach { _ =>
      Dedup.minhashNearDups(corpus, "doc_id", "text", 0.5).count()
      Dedup.simhashNearDups(corpus, "doc_id", "text", maxDistance = 20).count()
      Dedup.embeddingNearDupsLsh(
        Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0))).toDF("id", "v"),
        "id", "v", 0.9, bits = 8, bands = 4).count()
    }
    // the pipelines are fully lazy and uncached by design — nothing may
    // accumulate in the cache manager (or executor storage) across calls
    assert(org.apache.spark.sql.GraftBridge.noCachedPlans(spark))
  }

  test("duplicateClusters: stars converge fast, chains move one hop per iteration") {
    def clusters(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      Dedup.duplicateClusters(pairs.toDF("i", "j"), iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two disjoint components: a star {1,2,3} and an edge {10,11}
    assert(clusters(Seq((1L, 2L), (1L, 3L), (10L, 11L)), 1) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a chain 1-2-3-4: after ONE iteration node 4 only sees neighbor 3's
    // initial label — the documented one-hop-per-iteration contract
    val oneHop = clusters(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1)
    assert(oneHop(4L) == 3L && oneHop(2L) == 1L)
    // diameter-many iterations reach the fixpoint
    assert(clusters(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 3).values.toSet == Set(1L))
  }

  test("duplicateClusters: partial labels at a binding bound are exactly " +
      "min-within-iters-hops, and partitioning-invariant") {
    // chain 1-2-…-8 (diameter 7) under the default 3 iters: the bound
    // BINDS, and the partial result is still a pure function of the graph
    // — label(k) = min id within 3 hops = max(1, k-3). At 100× scale a
    // long borderline-pair chain hits this same contract: labels are
    // wrong-but-deterministic, never run-dependent garbage.
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("i", "j")
    val expected = (1L to 8L).map(k => k -> math.max(1L, k - 3)).toMap
    val got = Dedup.duplicateClusters(chain, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // identical under a different physical partitioning (min is
    // order-independent; nothing in the propagation depends on layout)
    val again = Dedup.duplicateClusters(chain.repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == expected)
  }

  test("duplicateClustersConverged reaches fixpoint on chains the bounded form splits") {
    // chain 1-2-…-8, diameter 7: the bounded default (3 iters) returns
    // SPLIT labels — the silent failure mode the converged variant closes
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("i", "j")
    val bounded = Dedup.duplicateClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded.values.toSet.size > 1)
    val converged = Dedup.duplicateClustersConverged(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged == (1L to 8L).map(_ -> 1L).toMap)
    // refuses to return non-converged labels instead of silently splitting
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClustersConverged(chain, maxIters = 2)
    }
    assert(e.getMessage.contains("not converged"))
    // two disjoint components keep distinct minima
    val two = Dedup.duplicateClustersConverged(
      Seq((5L, 6L), (6L, 7L), (20L, 21L)).toDF("i", "j")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("keepBestPerCluster keeps the argmax per cluster, singletons pass through") {
    // component {1,2,3} (star), component {10,11}, singletons 20 and 21
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 0L),
      (20L, 7L), (21L, 0L)).toDF("doc", "q")
    val pairs = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("i", "j")
    val got = Dedup.keepBestPerCluster(docs, "doc", "q", pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // score tie 2-vs-3 breaks to the LOWER id; the star hub 1 loses on score
    assert(got == Map(
      1L -> ((1L, 5L, false)), 2L -> ((1L, 9L, true)), 3L -> ((1L, 9L, false)),
      10L -> ((10L, 1L, true)), 11L -> ((10L, 0L, false)),
      20L -> ((20L, 7L, true)), 21L -> ((21L, 0L, true))))
    // exactly one kept doc per cluster, and every input row comes back
    assert(got.size == 7)
    assert(got.values.count(_._3) == 4)
  }

  test("bloomAntiJoin equals the plain anti-join, even with a saturated bloom") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"text-${i % 150}")).toDF("id", "t")
    val ref = (0L until 150L).filter(_ % 4 == 0).map(k => s"text-$k").toDF("rt")
    val exact = docs.join(ref, docs("t") === ref("rt"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    val got = Dedup.bloomAntiJoin(docs, "t", ref, "rt",
      expectedItems = 1000L, fpp = 0.03)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exact)
    // deliberately undersized bloom (expectedItems 1, fpp near-max): false
    // positives flood the candidate branch and the exact join must still
    // remove every one of them — correctness cannot depend on fpp
    val saturated = Dedup.bloomAntiJoin(docs, "t", ref, "rt",
      expectedItems = 1L, fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(saturated == exact)
    // null keys never match a reference key → always kept (SQL anti-join
    // null semantics), whatever branch they ride
    val withNulls = docs.union(Seq((9001L, null.asInstanceOf[String]),
      (9002L, "text-0")).toDF("id", "t"))
    val gotNulls = Dedup.bloomAntiJoin(withNulls, "t", ref, "rt")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotNulls.contains(9001L) && !gotNulls.contains(9002L))
    intercept[IllegalArgumentException](
      Dedup.bloomAntiJoin(docs, "t", ref, "rt", fpp = 1.5))
  }

  test("decontaminate counts distinct shared n-grams and flags leaks") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
    // bench trigrams: {"alpha beta gamma", "beta gamma delta"}
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon"), // shares both bench trigrams
      (11L, "alpha beta gamma alpha beta gamma"), // distinct overlap = 1
      (12L, "zeta eta theta iota"), // clean
      (13L, "alpha beta")) // fewer tokens than n → no trigrams at all
      .toDF("id", "text")
    val expected = Set((10L, 2L, "Y"), (11L, 1L, "Y"), (12L, 0L, "N"), (13L, 0L, "N"))
    val got = Dedup.decontaminate(docs, "id", "text", bench, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected)
    // the non-broadcast path is the same relation
    val unbroadcast = Dedup.decontaminate(docs, "id", "text", bench, "text",
      n = 3, broadcastBench = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(unbroadcast == expected)
    // repeated bench occurrences of a trigram still count once per doc
    val fatBench = bench.union(bench)
    val again = Dedup.decontaminate(docs, "id", "text", fatBench, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(again == expected)
  }

  test("containmentPairs flags subset duplication that Jaccard misses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "a b c"),               // fully contained in 1: C = 1.0, J = 0.3
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.tokenContainmentPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)))
    // the same pair is invisible to Jaccard at any near-dup threshold
    assert(Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.8).count() == 0)
    // a stop-token cap that kills the shared tokens removes the pair
    val capped = Dedup.tokenContainmentPairs(docs, "doc_id", "text", 0.9,
      maxDocFreq = Some(1L))
    assert(capped.count() == 0)
    // threshold is inclusive on the boundary: 2 of 3 tokens shared → 2/3
    val partial = Seq((1L, "a b c d"), (2L, "a b z")).toDF("doc_id", "text")
    val twoThirds = Dedup.tokenContainmentPairs(partial, "doc_id", "text", 2.0 / 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(twoThirds == Seq((1L, 2L)))
  }

  test("softDedupWeights downweights by group size; singletons always kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"), (4L, "alpha"),
      (5L, "beta"), (6L, "beta"),
      (7L, "gamma")
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      assert(got(id)._1 == 4L); assert(got(id)._2 == 0.25)
    }
    for (id <- Seq(5L, 6L)) { assert(got(id)._1 == 2L); assert(got(id)._2 == 0.5) }
    // a singleton's keep draw is u <= 1 — always true, never dropped
    assert(got(7L) == ((1L, 1.0, true)))
    // the keep decision is the id's portable uniform against 1/n: replay it
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(14), 16) + 1).toDouble / math.pow(2.0, 56)
    }
    for (id <- 1L to 7L)
      assert(got(id)._3 == (u(id) <= got(id)._2), s"keep mismatch for id $id")
    // kept count per group has expectation 1 — sanity: not ALL kept in the
    // size-4 group (P[all 4 kept] = 4^-4; these fixed ids do not hit it)
    assert(Seq(1L, 2L, 3L, 4L).count(got(_)._3) < 4)
    // deterministic under repartitioning
    val again = Dedup.softDedupWeights(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(again == got)
  }

  test("crossCorpusNearDups matches new docs against the reference only") {
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "red green blue")).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // exact copy of ref 1 (id collides with ref 1!)
      (20L, "one two three four five six seven eight nine ten"), // superset: J = 5/10
      (30L, "totally novel words here")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusNearDups(fresh, ref, "doc_id", "text",
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // only the exact copy passes 0.9; the id collision is fine because
    // pairs are positional (new, ref), never i<j
    assert(got == Set((1L, 1L, 1.0)))
    // new docs are never matched against each other, ref never against ref
    val dupNew = Seq(
      (40L, "alpha beta gamma delta epsilon"),
      (41L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusNearDups(dupNew, ref, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((40L, 1L), (41L, 1L)))
  }

  test("winnowOverlapPairs: containment scoring, prefix inclusion, stop cap") {
    val textA = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, textA),
      (2L, textA),                       // exact copy: overlap 1
      (3L, textA.substring(0, 24)),      // prefix: fps(3) ⊆ fps(1) → overlap 1
      (4L, "zzzz qqqq wwww kkkk mmmm"))  // disjoint alphabet: no pairs
      .toDF("doc_id", "text")
    val got = Dedup.winnowOverlapPairs(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 2, maxFpFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val (s12, si12, sj12, o12) = got((1L, 2L))
    assert(o12 == 1.0 && s12 == si12 && si12 == sj12)
    assert(got((1L, 3L))._4 == 1.0)      // prefix containment scores 1
    assert(got((2L, 3L))._4 == 1.0)
    // cap 2: every fingerprint of the identical trio occurs 3 times →
    // dropped from matching → no pairs survive minShared
    val trio = Seq((1L, textA), (2L, textA), (3L, textA)).toDF("doc_id", "text")
    assert(Dedup.winnowOverlapPairs(trio, "doc_id", "text", 5, 4, 2L, 2L)
      .count() == 0)
    intercept[IllegalArgumentException](
      Dedup.winnowOverlapPairs(docs, "doc_id", "text", 5, 4, 0L))
    intercept[IllegalArgumentException](
      Dedup.winnowOverlapPairs(docs, "doc_id", "text", 5, 4, 2L, 0L))
  }

  test("minhashErrorAudit: identical docs estimate 1, disjoint 0, audit honest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),     // identical to 1 → J = 1, est = 1
      (3L, "zz yy xx ww"))                // disjoint from both → J = 0
      .toDF("doc_id", "text")
    val got = Dedup.minhashErrorAudit(docs, "doc_id", "text", numHashes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // identical token sets share every slot minimum exactly
    assert(got((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // disjoint pairs: exact 0; the estimate may be > 0 only by slot
    // collision, and the error column must report exactly that gap
    for (p <- Seq((1L, 3L), (2L, 3L))) {
      val (est, exact, err) = got(p)
      assert(exact == 0.0 && err == est)
    }
    intercept[IllegalArgumentException](
      Dedup.minhashErrorAudit(docs, "doc_id", "text", numHashes = 0))
  }

  test("bagDupGroups: word-order invariant, multiset-sensitive, min-id survivor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // permutation of 1 → same bag
      (3L, "alpha beta"),         // subset of 1 → DIFFERENT bag
      (4L, "alpha beta beta"),    // extra copy of a token → different MULTISET than 3
      (5L, "  Alpha   beta "))    // case/whitespace-normalized twin of 3
      .toDF("id", "t")
    val got = Dedup.bagDupGroups(docs, "id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((2L, true)) && got(2L) == ((2L, false)))
    assert(got(3L) == ((2L, true)) && got(5L) == ((2L, false)))
    assert(got(4L) == ((1L, true)))
  }

  test("editDistanceDupPairs: prefix blocks, exact distances, threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps rev0"),
      (2L, "the quick brown fox jumps rev1"),   // dist 1 to doc 1
      (3L, "the quick brown fox jumped rev0"),  // dist 2 to doc 1, 3 to 2
      (4L, "a completely different doc rev0"),  // other block
      (5L, "the quick brown fox leaps far away rev9"),
      (6L, "the quick brown fox jumps rev0"))   // EXACT dup of doc 1
      .toDF("id", "t")
    val q = Dedup.editDistanceDupPairs(docs, "id", "t",
      prefixLen = 12, maxDist = 2)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 2L) -> 1, (1L, 3L) -> 2,
      (1L, 6L) -> 0, (2L, 6L) -> 1, (3L, 6L) -> 2))
    // doc 5 shares the block but exceeds the distance bar; doc 4 never
    // even pairs (different prefix block)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // PLAN PIN (the r10 d19 450s lesson): the DP must be the
    // THRESHOLDED 3-arg levenshtein (early-exit banded form), and it
    // must run over the distinct-text collapse, never over raw row
    // pairs — a 2-arg levenshtein or a missing distinct here is the
    // quadratic cliff coming back.
    val plan = q.queryExecution.optimizedPlan.toString
    // the 3-arg form renders its threshold as Some(2)
    assert(plan.matches("(?s).*levenshtein\\([^()]*, Some\\(2\\)\\).*"),
      s"expected thresholded levenshtein(l, r, Some(2)) in plan:\n$plan")
    assert(!plan.matches("(?s).*levenshtein\\((?:[^(),]*,){1}[^(),]*\\).*"),
      s"unthresholded 2-arg levenshtein found in plan:\n$plan")
    intercept[IllegalArgumentException](
      Dedup.editDistanceDupPairs(docs, "id", "t", 2, 2))
    intercept[IllegalArgumentException](
      Dedup.editDistanceDupPairs(docs, "id", "t", 12, -1))
  }

  test("clusterPurity: merged bases read impure, single-base pure") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    // cluster 1 spans bases A and B; cluster 10 is all C
    val truth = Seq((1L, "A"), (2L, "A"), (3L, "B"), (10L, "C"), (11L, "C"))
      .toDF("doc", "base")
    val got = Dedup.clusterPurity(clusters, "id", "cluster_id",
      truth, "doc", "base").orderBy("cluster_id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L &&
      got(0).getLong(2) == 2L && !got(0).getBoolean(3))
    assert(got(1).getLong(0) == 10L && got(1).getLong(1) == 2L &&
      got(1).getLong(2) == 1L && got(1).getBoolean(3))
  }

  test("bandingSweep: looser bands cast a wider candidate net") {
    import spark.implicits._
    // two exact-dup pairs + unrelated docs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "totally unrelated content lives here now"))
      .toDF("id", "t")
    val rows = Dedup.bandingSweep(docs, "id", "t", numHashes = 16,
      rowsPerBandLadder = Seq(2, 8), thresholdPct = 90)
      .orderBy("rows_per_band").collect()
    assert(rows.length == 2)
    // identical docs share EVERY band at any r: recall 1 on exact dups
    rows.foreach { r =>
      assert(r.getLong(3) == 2L)            // two true pairs
      assert(r.getLong(4) == 2L)            // both found at any setting
      assert(r.getDouble(6) == 1.0)
    }
    // r=2 (8 bands) nets at least as many candidates as r=8 (2 bands)
    assert(rows(0).getLong(2) >= rows(1).getLong(2))
    assert(rows(0).getInt(1) == 8 && rows(1).getInt(1) == 2)
    intercept[IllegalArgumentException](
      Dedup.bandingSweep(docs, "id", "t", 16, Seq(3)))
    intercept[IllegalArgumentException](
      Dedup.bandingSweep(docs, "id", "t", 16, Seq(2, 2)))
  }

  test("dedupGrowthCurve: nested subsets, monotone counts, full-corpus " +
      "rate at 100%") {
    import spark.implicits._
    // 40 rows over 8 base texts (5 copies each)
    val docs = (0L until 40L).map(i => (i, s"text ${i % 8}"))
      .toDF("id", "t")
    val rows = Dedup.dedupGrowthCurve(docs, "id", "t", buckets = 4)
      .orderBy("subset_pct").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(25, 50, 75, 100))
    // nested subsets: doc and distinct counts never decrease
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sorted.toSeq)
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sorted.toSeq)
    val full = rows.last
    assert(full.getLong(1) == 40L && full.getLong(2) == 8L)
    assert(full.getDouble(3) == 0.8)
    intercept[IllegalArgumentException](
      Dedup.dedupGrowthCurve(docs, "id", "t", 1))
  }

  test("weightedJaccardPairs: repetition separates what set Jaccard " +
      "cannot, max-sum folds to sizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),   // counts a:3 b:1, N=4
      (2L, "a b b b"),   // counts a:1 b:3, N=4
      (3L, "a a a b"))   // identical to 1
      .toDF("id", "t")
    // SET Jaccard(1,2) = 1.0 (same vocabulary); weighted:
    // min = 1+1 = 2, max = N1+N2−min = 6 → 1/3 — filtered at 0.5, so
    // only the truly identical pair (1,3) survives
    val got = Dedup.weightedJaccardPairs(docs, "id", "t", 0.5)
      .orderBy("i", "j").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L &&
      got(0).getDouble(2) == 1.0)
    val all = Dedup.weightedJaccardPairs(docs, "id", "t", 0.01)
      .orderBy("i", "j").collect()
    assert(all.length == 3)
    assert(all.head.getDouble(2) == 1.0 / 3.0) // (1,2)
    intercept[IllegalArgumentException](
      Dedup.weightedJaccardPairs(docs, "id", "t", 0.0))
  }

  test("blockingAudit: size-derived pair counts, the three metrics, " +
      "per-scheme rows") {
    import spark.implicits._
    // truth groups: {1,2,3} (g=0), {4,5} (g=1); blocks under 'k':
    // {1,2} {3,4,5} → cand = 1+3 = 4; found = C(2,2 of g0 in b0)=1 +
    // (g0∩b1={3}: 0) + (g1∩b1={4,5}: 1) = 2; true = 3+1 = 4
    val docs = Seq((1L, 0L, "x"), (2L, 0L, "x"), (3L, 0L, "y"),
      (4L, 1L, "y"), (5L, 1L, "y")).toDF("id", "g", "k")
    val r = Dedup.blockingAudit(docs, "id", "g",
      Seq(("by_k", col("k")))).head
    assert(r.getString(0) == "by_k" && r.getLong(1) == 5L)
    assert(r.getLong(2) == 10L && r.getLong(3) == 4L) // all, true
    assert(r.getLong(4) == 4L && r.getLong(5) == 2L)  // cand, found
    assert(r.getDouble(6) == 0.6)   // reduction 1 − 4/10
    assert(r.getDouble(7) == 0.5)   // completeness 2/4
    assert(r.getDouble(8) == 0.5)   // quality 2/4
    // two schemes → two rows; names preserved in order-by
    val two = Dedup.blockingAudit(docs, "id", "g",
      Seq(("by_k", col("k")), ("by_id_parity", col("id") % 2)))
      .orderBy("scheme").collect()
    assert(two.map(_.getString(0)).toSeq == Seq("by_id_parity", "by_k"))
    intercept[IllegalArgumentException](
      Dedup.blockingAudit(docs, "id", "g", Nil))
    intercept[IllegalArgumentException](
      Dedup.blockingAudit(docs, "id", "g",
        Seq(("dup", col("k")), ("dup", col("id")))))
    // a NULL block key blocks with nothing: the two null-key rows of
    // one truth group contribute NO candidate pair
    val withNull = Seq((1L, 0L, Some("x")), (2L, 0L, None),
      (3L, 0L, None)).toDF("id", "g", "k")
    val rn = Dedup.blockingAudit(withNull, "id", "g",
      Seq(("by_k", col("k")))).head
    assert(rn.getLong(4) == 0L && rn.getLong(5) == 0L) // cand, found
    assert(rn.getLong(3) == 3L) // true pairs still count all three
  }
}
