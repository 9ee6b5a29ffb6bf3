package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{Dedup, TextAnalysis}

/**
 * Deduplication coverage over the `documents` / `embeddings` tables. The
 * corpus has no natural duplicates (500 distinct texts at sf0.01), so
 * queries construct them deterministically: doc_id keyed onto text of
 * doc_id % K makes every text appear ~N/K times.
 *
 * Exact dedup, token-Jaccard, n-gram-Jaccard, and brute cosine have full
 * DuckDB oracles. MinHash/SimHash/LSH signatures depend on xxhash64 (not
 * reproducible in DuckDB) → rows-only here, semantics pinned in DedupSpec.
 */
object DedupQueries {

  /** documents with synthetic duplicate texts: text taken from doc_id % 100. */
  private def dupedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val base = d.withColumn("key", col("doc_id") % 100)
    base.alias("a")
      .join(d.withColumn("key", col("doc_id")).select(col("key"), col("text").as("base_text")).alias("b"),
        Seq("key"))
      .select(col("a.doc_id").as("doc_id"), col("base_text").as("text"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P176 — split-leakage audit: exact-dup pairs vs an 80/10/10 hash
    // split; crossing cells are train/eval contamination (a hash split
    // WILL leak — the sa7 cluster split is the fix, this is the proof)
    "sa17_leakage" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
      val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
        .select(col("survivor_id").as("i"), col("duplicate_id").as("j"))
      val assign = graft.operators.Sampling.hashSplit(
        docs.select("doc_id"), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "split:")
      graft.operators.Sampling.splitLeakageAudit(pairs, assign,
          "i", "j", "doc_id", "split")
        .orderBy("split_a", "split_b")
    }),

    // exact dedup: survivor = min doc_id per text
    "d1_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(dupedDocs(s, dir), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // P338 — bag-of-words dedup over a corpus with planted word-order
    // twins: every doc_id%5 doc gets a copy (id + 1e6) whose text is its
    // own SORTED token list — a pure word-order permutation that exact
    // dedup cannot see and the multiset fingerprint must (non-vacuous by
    // construction: ≥20% of rows live in a group of ≥2)
    "d24_bag_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks =
        array_remove(split(lower(trim(col("text"))), "\\s+"), "")
      val shuffled = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat_ws(" ", sort_array(toks)).as("text"))
      Dedup.bagDupGroups(docs.unionByName(shuffled), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P247 — (b, r) banding sweep on a 50-doc hash sample of the
    // duplicated corpus: measured precision/recall per setting against
    // exact J ≥ 0.9 — the tuning table the d16 failure showed must be
    // MEASURED on this dense-similarity corpus, not read off textbook
    // curves
    "d21_band_sweep" -> ((s, dir) => {
      val sample = dupedDocs(s, dir).where(col("doc_id") % 10 === 0)
      Dedup.bandingSweep(sample, "doc_id", "text", numHashes = 16,
          rowsPerBandLadder = Seq(2, 4, 8), thresholdPct = 90)
        .orderBy("rows_per_band")
    }),

    // P236 — cluster-quality audit of the exact-dup clustering against
    // the planted doc_id%100 ground truth: impure clusters = distinct
    // bases whose generated texts collide (a real corpus fact here)
    "d20_cluster_eval" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
      val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
        .select(col("survivor_id").as("i"), col("duplicate_id").as("j"))
      val clusters = Dedup.duplicateClusters(pairs, "i", "j", iters = 3)
      val truth = docs.select(col("doc_id"),
        (col("doc_id") % 100).as("base"))
      Dedup.clusterPurity(clusters, "id", "cluster_id",
          truth, "doc_id", "base")
        .orderBy("cluster_id")
    }),

    // P228 — edit-distance near-dup pairs over version-suffixed
    // re-uploads (the duplicated corpus with a ` revN` tail): prefix
    // blocking, exact Levenshtein ≤ 2 verify — catches the char-level
    // variants token-set Jaccard misses
    "d19_edit_dedup" -> ((s, dir) => {
      val perturbed = dupedDocs(s, dir).withColumn("text",
        concat(col("text"), lit(" rev"), (col("doc_id") % 3).cast("string")))
      Dedup.editDistanceDupPairs(perturbed, "doc_id", "text",
          prefixLen = 24, maxDist = 2)
        .orderBy("i", "j")
    }),

    // P72 — soft dedup: duplicates downweighted (w = 1/n per exact-text
    // group) instead of dropped, with a deterministic keep draw at
    // probability 1/n from the portable-MD5 uniform — the oracle replays
    // group sizes, weights, and every keep decision bit-for-bit
    "d14_soft_dedup" -> ((s, dir) => {
      Dedup.softDedupWeights(dupedDocs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P37 — incremental dedup against a reference corpus: bloom-negative
    // rows skip the shuffle entirely, the fpp tail is verified by an exact
    // anti-join; the oracle is the PLAIN anti-join the operator must equal
    "d9_bloom_antijoin" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = docs.where(col("doc_id") % 3 === 0).select(col("text"))
      Dedup.bloomAntiJoin(docs, "text", ref, "text",
          expectedItems = 100000L, fpp = 0.03)
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // P39 — benchmark decontamination: the "benchmark" is every doc_id
    // divisible by 97; every other document reports how many distinct
    // token trigrams it shares with that eval set and a Y/N leak flag.
    // The oracle rebuilds both trigram sets in SQL and replays the
    // distinct-intersection count row-for-row
    "d10_decontaminate" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      Dedup.decontaminate(
          d.where(col("doc_id") % 97 =!= 0), "doc_id", "text",
          d.where(col("doc_id") % 97 === 0), "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // duplicate pair listing
    "d2_dup_pairs" -> ((s, dir) => {
      Dedup.exactDupPairs(dupedDocs(s, dir), "doc_id", "text")
        .orderBy("survivor_id", "duplicate_id")
    }),

    // P31 — duplicate clustering: components over the exact-dup pair list.
    // The oracle states the semantic ground truth instead of replaying the
    // propagation: exact-dup components ARE the same-text groups, so every
    // member of a >1-sized text group must get cluster_id = the group's
    // min doc_id (star components converge within the default iterations)
    "d8_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.exactDupPairs(dupedDocs(s, dir), "doc_id", "text")
      Dedup.duplicateClusters(pairs, "survivor_id", "duplicate_id")
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    }),

    // P281 — duplicate-cluster size distribution (the dedup blast
    // radius): sizes of the d8 clusters plus the singleton row computed
    // as total − clustered; oracle = same-text group sizes (the d8
    // ground-truth identity)
    "d23_cluster_sizes" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
      val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
      val clusters = Dedup.duplicateClusters(pairs, "survivor_id",
        "duplicate_id")
      val multi = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("__sz")).as("n_docs"))
      val totals = docs.agg(count(lit(1)).as("__total"))
      val clustered = clusters.agg(count(lit(1)).as("__inc"))
      val singles = totals.crossJoin(broadcast(clustered)) // 1-row sides
        .select(lit(1L).as("cluster_size"),
          (col("__total") - col("__inc")).as("n_clusters"),
          (col("__total") - col("__inc")).as("n_docs"))
        .where(col("n_clusters") > 0)
      multi.unionByName(singles).orderBy("cluster_size")
    }),

    // P282 — dedup token-savings readout per source: what exact dedup
    // actually buys each feed (docs/tokens before vs after min-id
    // survivorship) — the "value of dedup" line on a datacard
    "pipe13_dedup_impact" -> ((s, dir) => {
      val src = table(s, dir, "documents").select(col("doc_id"),
        col("source"))
      val t = dupedDocs(s, dir)
        .join(src.hint("shuffle_hash"), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("__tok"))
      val before = t.groupBy(col("source"))
        .agg(count(lit(1)).as("docs_before"),
          sum(col("__tok")).as("tokens_before"))
      val keptIds = Dedup.exactDedup(dupedDocs(s, dir), "doc_id", "text")
        .select(col("doc_id"))
      val after = t.join(keptIds.hint("shuffle_hash"), Seq("doc_id"),
          "left_semi")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_after"),
          sum(col("__tok")).as("tokens_after"))
      before.join(after.hint("shuffle_hash"), Seq("source"), "left")
        .select(col("source"), col("docs_before"), col("tokens_before"),
          coalesce(col("docs_after"), lit(0L)).as("docs_after"),
          coalesce(col("tokens_after"), lit(0L)).as("tokens_after"))
        .withColumn("token_savings",
          when(col("tokens_before") > 0,
            round(lit(1.0) - col("tokens_after").cast("double") /
              col("tokens_before").cast("double"), 6)))
        .orderBy("source")
    }),

    // P43 — duplicate-cluster retention: keep the best-scoring member of
    // every exact-dup cluster (synthetic integer quality (doc_id·37)%101,
    // ties to lowest id), singletons pass through. The oracle states the
    // ground truth directly: exact-dup components ARE the same-text
    // groups, so kept = argmax(score, −id) within each text group and
    // cluster_id = the group min id (own id when unique)
    "d11_retention" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
        .withColumn("score", (col("doc_id") * 37) % 101)
      val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
      Dedup.keepBestPerCluster(docs, "doc_id", "score",
          pairs, "survivor_id", "duplicate_id")
        .select(col("id").as("doc_id"), col("cluster_id"), col("score"),
          col("kept"))
        .orderBy("doc_id")
    }),

    // P66 — leakage-safe split: the split key is the duplicate-cluster
    // min-label, so every member of a dup cluster lands in one split.
    // Exact-dup clusters ARE the same-text groups, so the oracle keys the
    // md5 split on the group min id directly (the d8 ground-truth trick)
    "sa7_cluster_split" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
      val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
      graft.operators.Sampling.clusterSafeSplit(docs.select("doc_id"),
          "doc_id", pairs,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          "survivor_id", "duplicate_id")
        .select(col("doc_id"), col("split_key"), col("split"))
        .orderBy("doc_id")
    }),

    // token-set Jaccard ≥ 0.8 over a 50-doc subset
    "d3_token_jaccard" -> ((s, dir) => {
      val docs = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
      Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("i", "j")
    }),

    // P205 — minhash calibration over the %20 sample: 16 portable-hash
    // signature slots per doc, estimated vs exact Jaccard per pair with
    // the absolute error — the data-driven banding input
    "d18_minhash_err" -> ((s, dir) => {
      Dedup.minhashErrorAudit(
          table(s, dir, "documents").where(col("doc_id") % 20 === 0),
          "doc_id", "text", numHashes = 16)
        .orderBy("i", "j")
    }),

    // P74 — containment |A∩B|/min(|A|,|B|): the asymmetric-duplication
    // detector (short doc quoted inside a long one scores ~0 Jaccard but
    // containment 1); same candidate machinery as d3, different
    // denominator, direct SQL replay
    "d15_containment" -> ((s, dir) => {
      val docs = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
      Dedup.tokenContainmentPairs(docs, "doc_id", "text", 0.9)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("i", "j")
    }),

    // P62 — prefix-filtered Jaccard over the SAME subset and threshold as
    // d3: the oracle is the plain all-token computation, so green here
    // proves the ppjoin-style prefix pruning is an identity (the sk1
    // salted-distinct proof pattern)
    "d13_prefix_jaccard" -> ((s, dir) => {
      val docs = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
      Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("i", "j")
    }),

    // character 5-gram Jaccard ≥ 0.55 over a 25-doc subset
    // runs on the DUPLICATED corpus: raw documents share no char-5-gram
    // at ≥ 0.55 (every doc's shingle set is unique — verified r9s4, the
    // query was vacuously empty), while the planted duplicates give the
    // threshold real pairs to find
    "d4_ngram_jaccard" -> ((s, dir) => {
      val docs = dupedDocs(s, dir).where(col("doc_id") % 20 === 0)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.55)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("i", "j")
    }),

    // MinHash+LSH near-dups on duplicated corpus (xxhash64-based → rows-only)
    "d5_minhash_lsh" -> ((s, dir) => {
      val docs = dupedDocs(s, dir).where(col("doc_id") % 4 === 0)
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.9)
        .withColumn("jaccard", round(col("jaccard"), 6))
        // deterministic total order without orderBy's range-partitioner
        // sampling job, which re-executes the verification stage; the
        // result is test-scale small, so one sort task is cheap
        .repartition(1).sortWithinPartitions("i", "j")
    }),

    // P85 — cross-corpus dedup: a "recrawl batch" (exact copies of the
    // %7=0 docs plus 12-token truncations of the %7=3 docs, shifted ids)
    // LSH-matched against the full corpus. Copies share every band →
    // recall 1; truncations sit at J≈0.4 and must NOT match. The oracle
    // is exact all-pairs Jaccard between the same two corpora.
    "d16_cross_dedup" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val recrawls = d.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val truncated = d.where(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12)).as("text"))
      // 33 hashes / rowsPerBand 3 (b=11): the default r=4/b=8 banding
      // deterministically missed two correlated J=0.903 cross-pairs on
      // the sf0.001 corpus (docs 154/343 vs 99 — found r9 by the local
      // all-SF gate); design miss bound at J=0.9 is (1−0.9³)^11 ≈ 4e-7.
      // r=2/b=16 also fixed it but floods verification with random
      // J≈0.1 candidates (~15% band-collision rate → 21.7s at sf0.1);
      // r=3 cuts that rate ~13× (~1%) while keeping the recall.
      // Candidates are exact-verified, so more-sensitive banding only
      // moves LSH toward the oracle's exact pair set, never past it.
      Dedup.crossCorpusNearDups(recrawls.union(truncated), d,
          "doc_id", "text", threshold = 0.9, numHashes = 33, rowsPerBand = 3)
        .withColumn("jaccard", round(col("jaccard"), 6))
        // the d5 sort discipline: orderBy's range-partitioner sampling
        // would re-execute the verification stage
        .repartition(1).sortWithinPartitions("new_id", "ref_id")
    }),

    // P119 — MOSS-style winnow-overlap pairs: base corpus (%10 docs)
    // plus 150-char excerpts (shifted ids) — excerpts score overlap ≈ 1
    // against their sources (fps(prefix) ⊆ fps(full)); the stop-shingle
    // cap (40) drops corpus-boilerplate fingerprints from matching
    "d17_winnow_pairs" -> ((s, dir) => {
      val base = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      val excerpts = base.select((col("doc_id") + 5000).as("doc_id"),
        substring(col("text"), 1, 150).as("text"))
      Dedup.winnowOverlapPairs(base.union(excerpts), "doc_id", "text",
          k = 5, window = 4, minShared = 2, maxFpFreq = 40)
        .orderBy("i", "j")
    }),

    // SimHash near-dups with the engine-portable MD5-derived token hash:
    // banding with bands > maxDistance is pigeonhole-lossless, so the output
    // is EXACTLY the all-pairs hamming≤3 set — which the DuckDB oracle
    // recomputes bit-for-bit from the same md5-based fingerprints
    "d6_simhash" -> ((s, dir) => {
      val docs = dupedDocs(s, dir).where(col("doc_id") % 4 === 0)
      Dedup.simhashNearDups(docs, "doc_id", "text", maxDistance = 3,
          hash = Dedup.portableTokenHash, bits = 56)
        .orderBy("i", "j")
    }),

    // embedding cosine near-dups ≥ 0.8: corpus max pairwise cosine is ~0.51,
    // duplicates injected as 1.5-scaled copies (cosine exactly 1)
    "d7_emb_neardup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("vec_id") % 5 === 0)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val copies = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("v"), x => x * 1.5).as("v"))
      // scale path: random-hyperplane LSH. Exact-colinear dupes share every
      // band; corpus max non-dup cosine ≈0.51 < 0.8 threshold, so the pair
      // set is identical to brute force and the full oracle still holds.
      // DATA-DEPENDENT: regenerated testdata with non-colinear pairs near
      // the 0.8 threshold could introduce silent LSH false negatives — if
      // the oracle ever mismatches here, fix the data assumption or widen
      // the bands; NEVER downgrade this query to a rows-only check.
      Dedup.embeddingNearDupsLsh(e.unionByName(copies), "vec_id", "v", 0.8)
        .select(col("i"), col("j"))
        .orderBy("i", "j")
    }),

    // P56 — semantic dedup: colinear copies injected BELOW the base id for
    // vec_id % 10 = 0 (the copy survives, the base falls) and ABOVE
    // otherwise (the base survives) — an orientation bug in the dominance
    // rule flips whole blocks of the survivor set. Same far-from-threshold
    // data contract as d7 (max non-dup cosine ≈0.51 vs τ=0.8)
    "d12_semdedup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("vec_id") % 5 === 0)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val copies = e.select(
        when(col("vec_id") % 10 === 0, col("vec_id") - 100000)
          .otherwise(col("vec_id") + 100000).as("vec_id"),
        transform(col("v"), x => x * 1.5).as("v"))
      Dedup.semanticDedup(e.unionByName(copies), "vec_id", "v", 0.8)
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // P59 — the full curation pipeline as ONE lazy plan: quality floor
    // (≥30 tokens) → exact dedup (min-id survivor per text) → benchmark
    // decontamination (drop ≥0.8 trigram overlap vs the doc_id%97 probe
    // set) → 90/5/5 hash split. Every stage is an operator with its own
    // green oracle; this query proves they COMPOSE deterministically —
    // the oracle replays all four stages in sequence and must agree on
    // every surviving (doc_id, n_tokens, split) row
    // P106 — incremental-ingest curation: a synthetic incoming batch
    // (exact recrawls + truncated fetches + genuinely-new augmented
    // docs) deduped AGAINST the existing corpus (cross-corpus LSH, the
    // d16 machinery — the full union is never re-deduplicated), then
    // quality-gated, then capped per language in portable hash order.
    // Attrition by construction: recrawls die at dedup (jaccard 1),
    // truncations die at quality (12 tokens < 30), augmented docs
    // (8 unique suffix tokens push jaccard ≈ 0.76 < 0.9) reach the cap.
    // The oracle replays all four stages sequentially, with the dedup
    // stage as the exact all-pairs computation (the LSH identity proof).
    "pipe2_incremental" -> ((s, dir) => {
      val d = table(s, dir, "documents").select("doc_id", "text", "lang")
      val aug = (0 until 8).map(i =>
        concat(lit(s"zz$i"), col("doc_id").cast("string")))
      // ONE scan with a CASE projection, not a 3-way union: the optimizer
      // pushes the survivors LEFT ANTI below a Union
      // (PushLeftSemiLeftAntiThroughJoin's union sibling), which
      // TRIPLICATED the entire cross-corpus LSH subtree — 78 parquet
      // scans, 1852 plan lines, zero exchange reuse (measured r11-opt;
      // plans/r11/pipe2_incremental_before.txt). Same row multiset: the
      // three branches filtered disjoint doc_id%7 classes, so the CASE
      // over %7 ∈ {0,3,5} is the identical projection.
      val m = col("doc_id") % 7
      val batch = d.where(m.isin(0, 3, 5))
        .select(
          (col("doc_id") + when(m === 0, 1000000L)
            .when(m === 3, 2000000L).otherwise(3000000L)).as("doc_id"),
          when(m === 0, col("text"))
            .when(m === 3,
              concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12)))
            .otherwise(concat_ws(" ", col("text") +: aug: _*)).as("text"),
          col("lang"))
      // 33/3 banding — the d16 recall fix at the d16 candidate cost (see
      // d16's comment); the dedup stage's oracle is exact all-pairs, so
      // band sensitivity must cover the corpus's minimum above-threshold
      // jaccard at every SF
      val dups = Dedup.crossCorpusNearDups(batch, d, "doc_id", "text",
        threshold = 0.9, numHashes = 33, rowsPerBand = 3)
      val survivors = batch.join(
        dups.select(col("new_id").as("doc_id")).distinct()
          // post-agg side carries no stats — pin shuffle_hash so the anti
          // join can never fall back to sort-merge (the d11 rule)
          .hint("shuffle_hash"),
        Seq("doc_id"), "left_anti")
      val quality = survivors
        .where(graft.operators.TextAnalysis.tokenCount(col("text")) >= 30)
      graft.operators.Sampling.cappedPerKey(
          quality.select("doc_id", "lang"), "lang", "doc_id", maxPerKey = 20)
        .orderBy("doc_id")
    }),

    // P253 — duplication rate per source over the RAW corpus (it has
    // natural exact dups — the d1 attrition): the ops dashboard row
    // that names WHICH feed re-crawls
    "d22_dup_by_source" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select("doc_id", "source", "text")
      val dups = Dedup.exactDupPairs(docs, "doc_id", "text")
        .select(col("duplicate_id").as("doc_id"))
        .withColumn("__isdup", lit(1L))
      docs.join(dups.hint("shuffle_hash"), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("__isdup"), lit(0L))).as("n_dups"))
        .withColumn("dup_rate",
          round(col("n_dups").cast("double") / col("n_docs").cast("double"),
            6))
        .orderBy("source")
    }),

    // P251 — loader-input materialization: quality gate → exact dedup →
    // sequence packing as ONE lazy plan (the pipe1 curation head with
    // the P220 packing tail — what actually feeds a training loader)
    "pipe10_loader" -> ((s, dir) => {
      val corpus = dupedDocs(s, dir)
      val quality = corpus.where(
        graft.operators.TextAnalysis.tokenCount(col("text")) >= 30)
      val deduped = Dedup.exactDedup(quality, "doc_id", "text")
      val docs = deduped.select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      graft.operators.Sampling.sequencePack(docs, "doc_id", "n_tokens",
          shards = 4, capacity = 512L, salt = "loader:")
        .orderBy("shard", "bin")
    }),

    // P367 — dedup growth over nested quarters of the duplicated
    // corpus: the "dup rate rises with scale" capacity-planning curve
    // (a sampled savings estimate understates full-scale savings)
    "d25_dup_growth" -> ((s, dir) => {
      Dedup.dedupGrowthCurve(dupedDocs(s, dir), "doc_id", "text",
          buckets = 4)
        .orderBy("subset_pct")
    }),

    // P372 — weighted (multiset) Jaccard over the %10 sample: the
    // repetition-aware score beside d3's set Jaccard — same candidate
    // shape, token counts kept instead of distinct
    "d27_wjaccard" -> ((s, dir) => {
      val docs = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
      Dedup.weightedJaccardPairs(docs, "doc_id", "text", 0.5)
        .withColumn("w_jaccard", round(col("w_jaccard"), 6))
        .orderBy("i", "j")
    }),

    // P373 — blocking-quality audit over version-perturbed re-uploads
    // (ground truth = same-base groups): exact-text blocks are
    // precision-1 but only see same-corruption pairs; first-token
    // blocks lose the v2-prepends INTO one shared block; 16-char
    // length buckets straddle on the ±2-char perturbation
    "d26_blocking" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
        .withColumn("text",
          when(col("doc_id") % 3 === 0, concat(lit("v2 "), col("text")))
            .otherwise(concat(col("text"), lit(" rev"),
              (col("doc_id") % 3).cast("string"))))
        .withColumn("base_key", col("doc_id") % 100)
      Dedup.blockingAudit(docs, "doc_id", "base_key", Seq(
          ("exact_text", col("text")),
          ("first_token", substring_index(col("text"), " ", 1)),
          ("len_bucket16", floor(length(col("text")) / 16))))
        .orderBy("scheme")
    }),

    "pipe1_curation" -> ((s, dir) => {
      val corpus = dupedDocs(s, dir)
      val probes = table(s, dir, "documents").where(col("doc_id") % 97 === 0)
      val quality = corpus
        .where(graft.operators.TextAnalysis.tokenCount(col("text")) >= 30)
      val deduped = Dedup.exactDedup(quality, "doc_id", "text")
      val scored = Dedup.ngramContamination(deduped, "doc_id", "text",
        probes, "text", n = 3, flagThreshold = 0.8)
      val kept = deduped
        .join(scored.where(!col("flagged")).select("doc_id"), Seq("doc_id"))
      graft.operators.Sampling.hashSplit(
          kept.select(col("doc_id"),
            graft.operators.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("n_tokens")),
          "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .orderBy("doc_id")
    })
  )

  private val dupedDocsSql =
    """SELECT a.doc_id AS doc_id, b.text AS text
      |FROM documents a JOIN documents b ON a.doc_id % 100 = b.doc_id""".stripMargin

  private def jaccardSql(subset: String, tokenExpr: String, threshold: String,
      source: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH docs AS (SELECT doc_id, text FROM ($source) WHERE doc_id % $subset = 0),
       |tok AS (SELECT DISTINCT doc_id, token FROM (
       |  SELECT doc_id, unnest($tokenExpr) AS token FROM docs)
       |  WHERE token <> ''),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
       |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i, j, ROUND(CAST(inter AS DOUBLE) / (si.sz + sj.sz - inter), 6) AS jaccard
       |FROM pairs JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
       |WHERE CAST(inter AS DOUBLE) / (si.sz + sj.sz - inter) >= $threshold
       |ORDER BY i, j""".stripMargin

  val oracles: Map[String, String] = Map(
    // the hv fold is the shared sa8 idiom (first 14 hex chars of MD5 as a
    // long); 1.0e0 (not 1.0) keeps weight DOUBLE — a bare literal would
    // type the division DECIMAL and fail the dtype gate
    "d14_soft_dedup" ->
      s"""WITH d AS ($dupedDocsSql),
         |g AS (SELECT doc_id, CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS n_dups
         |      FROM d),
         |h AS (
         |  SELECT doc_id, n_dups,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS hv
         |  FROM g)
         |SELECT doc_id, n_dups, 1.0e0 / n_dups AS weight,
         |  (CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0) <= (1.0e0 / n_dups) AS kept
         |FROM h ORDER BY doc_id""".stripMargin,

    // one distinct-count agg per nested portable-hash subset (the sa1
    // hv fold mod 4) over the SAME duplicated frame, unioned
    "d25_dup_growth" -> {
      def sub(k: Int): String =
        s"""SELECT ${k * 25} AS subset_pct,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
           |  round(1.0e0 - CAST(COUNT(DISTINCT text) AS DOUBLE) /
           |    CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
           |FROM d WHERE b < $k""".stripMargin
      s"""WITH d0 AS ($dupedDocsSql),
         |d AS (
         |  SELECT doc_id, text,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |                 FOR c IN string_split(substr(md5(coalesce(
         |                   CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) % 4 AS b
         |  FROM d0)
         |${(1 to 4).map(sub).mkString("\nUNION ALL\n")}
         |ORDER BY subset_pct""".stripMargin
    },

    // the jaccardSql shape with COUNTS kept: Σmin over shared tokens,
    // Σmax folded to N_i + N_j − Σmin (max+min = a+b per token)
    "d27_wjaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |tok AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))
        |      AS token
        |    FROM docs)
        |  GROUP BY 1, 2),
        |sizes AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS sz FROM tok GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |    CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS minsum
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j, round(CAST(minsum AS DOUBLE) /
        |    CAST(si.sz + sj.sz - minsum AS DOUBLE), 6) AS w_jaccard
        |FROM pairs JOIN sizes si ON si.doc_id = i
        |  JOIN sizes sj ON sj.doc_id = j
        |WHERE CAST(minsum AS DOUBLE) / CAST(si.sz + sj.sz - minsum AS DOUBLE)
        |  >= 0.5e0
        |ORDER BY i, j""".stripMargin,

    // every metric from GROUP SIZES (ΣC(c,2) per block / truth /
    // (truth, block) cell) — no pair is materialized on either side;
    // // is DuckDB integer division (a / would detour through double)
    "d26_blocking" -> {
      def c2sum(by: String, as: String): String =
        s"""SELECT CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS $as
           |FROM (SELECT COUNT(*) AS c FROM k GROUP BY $by)""".stripMargin
      s"""WITH d AS ($dupedDocsSql),
         |src AS (
         |  SELECT doc_id, doc_id % 100 AS g,
         |    CASE WHEN doc_id % 3 = 0 THEN 'v2 ' || text
         |         ELSE text || ' rev' || CAST(doc_id % 3 AS VARCHAR) END
         |      AS text
         |  FROM d WHERE doc_id IS NOT NULL),
         |k AS (SELECT g, text AS k1, split_part(text, ' ', 1) AS k2,
         |        CAST(floor(len(text) / 16) AS BIGINT) AS k3 FROM src),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |        CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS ap
         |      FROM k),
         |tp AS (${c2sum("g", "tp")}),
         |s1c AS (${c2sum("k1", "cp")}), s1f AS (${c2sum("g, k1", "fp")}),
         |s2c AS (${c2sum("k2", "cp")}), s2f AS (${c2sum("g, k2", "fp")}),
         |s3c AS (${c2sum("k3", "cp")}), s3f AS (${c2sum("g, k3", "fp")}),
         |u AS (
         |  SELECT 'exact_text' AS scheme, cp, fp FROM s1c CROSS JOIN s1f
         |  UNION ALL
         |  SELECT 'first_token', cp, fp FROM s2c CROSS JOIN s2f
         |  UNION ALL
         |  SELECT 'len_bucket16', cp, fp FROM s3c CROSS JOIN s3f)
         |SELECT scheme, t.n AS n_docs, t.ap AS all_pairs,
         |  tp.tp AS true_pairs, cp AS cand_pairs, fp AS found_true_pairs,
         |  CASE WHEN t.ap > 0 THEN
         |    round(1.0e0 - CAST(cp AS DOUBLE) / CAST(t.ap AS DOUBLE), 6)
         |  END AS reduction_ratio,
         |  CASE WHEN tp.tp > 0 THEN
         |    round(CAST(fp AS DOUBLE) / CAST(tp.tp AS DOUBLE), 6)
         |  END AS completeness,
         |  CASE WHEN cp > 0 THEN
         |    round(CAST(fp AS DOUBLE) / CAST(cp AS DOUBLE), 6)
         |  END AS quality
         |FROM u CROSS JOIN t CROSS JOIN tp ORDER BY scheme""".stripMargin
    },

    "d1_exact_dedup" ->
      s"""SELECT doc_id FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |  FROM ($dupedDocsSql))
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // the fingerprint is replayed token-for-token (same split regex, same
    // empty-token filter, same lexicographic sort); group stats are plain
    // window counts over it
    "d24_bag_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(list_sort(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')),
        |      ' ') AS text
        |  FROM documents WHERE doc_id % 5 = 0
        |    AND doc_id IS NOT NULL AND text IS NOT NULL),
        |fp AS (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')),
        |      ' ') AS f
        |  FROM corpus)
        |SELECT doc_id,
        |  CAST(COUNT(*) OVER (PARTITION BY f) AS BIGINT) AS group_n,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY f) AS kept
        |FROM fp ORDER BY doc_id""".stripMargin,

    // rn > 1 within a text group ⟺ the operator's duplicate set
    "d22_dup_by_source" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  round(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    // quality filter + min-doc-per-text survivors + the pipe9 pack
    // replay at salt 'loader:' — three stages, one sequential oracle
    "pipe10_loader" ->
      s"""WITH duped AS ($dupedDocsSql),
         |q AS (
         |  SELECT doc_id, text FROM duped
         |  WHERE CAST(len(list_filter(string_split_regex(lower(trim(text)),
         |    '\\s+'), x -> x <> '')) AS BIGINT) >= 30),
         |surv AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM q) WHERE rn = 1),
         |t AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)),
         |      '\\s+'), x -> x <> '')) AS BIGINT) AS tok,
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('loader:' ||
         |          COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS h
         |  FROM surv WHERE doc_id IS NOT NULL),
         |c AS (
         |  SELECT doc_id, tok, h % 4 AS shard,
         |    COALESCE(CAST(SUM(tok) OVER (PARTITION BY h % 4
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS strt
         |  FROM t)
         |SELECT shard, strt // 512 AS bin, CAST(COUNT(*) AS BIGINT)
         |    AS n_docs,
         |  CAST(SUM(tok) AS BIGINT) AS tokens,
         |  CAST(SUM(CASE WHEN strt % 512 + tok > 512 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_straddle,
         |  round(CAST(SUM(tok) AS DOUBLE) / 512.0e0, 6) AS fill_rate
         |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,

    // the d18 portable signature slots, plain slot-concat band keys,
    // per-setting candidate CTEs and scalar count subqueries
    "d21_band_sweep" -> {
      val coeffs = graft.operators.Dedup.hashCoeffs(16, 42L)
      val sigCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
        s"MIN((h * $a + $b) % 2147483647) AS m$i"
      }.mkString(",\n         |    ").stripMargin
      def setting(r: Int) = {
        val bands = 16 / r
        val bandSelects = (0 until bands).map { b =>
          val key = (b * r until b * r + r).map(i => s"m$i").mkString(", ")
          s"SELECT id, $b AS band, concat_ws('_', $key) AS key FROM sigs"
        }.mkString("\n         |  UNION ALL\n         |  ").stripMargin
        s"""bk_$r AS (
           |  $bandSelects),
           |cand_$r AS (
           |  SELECT DISTINCT a.id AS i, b.id AS j
           |  FROM bk_$r a JOIN bk_$r b
           |    ON b.band = a.band AND b.key = a.key AND a.id < b.id),
           |row_$r AS (
           |  SELECT $r AS rows_per_band, $bands AS bands,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$r)
           |      AS n_candidates,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$r c
           |     JOIN truth t ON t.i = c.i AND t.j = c.j) AS n_hit)"""
          .stripMargin
      }
      s"""WITH duped AS ($dupedDocsSql),
         |docs AS (
         |  SELECT doc_id, text FROM duped
         |  WHERE doc_id % 10 = 0 AND doc_id IS NOT NULL
         |    AND text IS NOT NULL),
         |tok AS (
         |  SELECT DISTINCT doc_id AS id, token FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+'))
         |        AS token
         |    FROM docs) WHERE token <> ''),
         |hh AS (
         |  SELECT id,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |        FOR c IN string_split(substr(md5('mh:' || token), 1, 14),
         |          '')],
         |      (acc, x) -> acc * 16 + x) % 2147483647 AS h
         |  FROM tok),
         |sigs AS (
         |  SELECT id, $sigCols
         |  FROM hh GROUP BY 1),
         |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
         |          FROM tok GROUP BY 1),
         |inter AS (
         |  SELECT a.id AS i, b.id AS j, CAST(COUNT(*) AS BIGINT) AS x
         |  FROM tok a JOIN tok b ON a.token = b.token AND a.id < b.id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT it.i, it.j
         |  FROM inter it
         |  JOIN sizes si ON si.id = it.i
         |  JOIN sizes sj ON sj.id = it.j
         |  WHERE round(CAST(it.x AS DOUBLE) /
         |    CAST(si.sz + sj.sz - it.x AS DOUBLE), 6) >= 0.9e0),
         |${setting(2)},
         |${setting(4)},
         |${setting(8)},
         |u AS (SELECT * FROM row_2 UNION ALL SELECT * FROM row_4
         |      UNION ALL SELECT * FROM row_8)
         |SELECT rows_per_band, bands, n_candidates, n_true, n_hit,
         |  round(CAST(n_hit AS DOUBLE) /
         |    CAST(greatest(n_candidates, 1) AS DOUBLE), 6) AS precision,
         |  round(CAST(n_hit AS DOUBLE) /
         |    CAST(greatest(n_true, 1) AS DOUBLE), 6) AS recall
         |FROM u ORDER BY rows_per_band""".stripMargin
    },

    // identity proof: min-label over the survivor star equals the
    // min-doc-per-text label; purity reads the planted base key
    "d20_cluster_eval" ->
      s"""WITH duped AS ($dupedDocsSql),
         |g AS (
         |  SELECT doc_id, doc_id % 100 AS base,
         |    MIN(doc_id) OVER (PARTITION BY text) AS cid,
         |    COUNT(*) OVER (PARTITION BY text) AS gn
         |  FROM duped)
         |SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(COUNT(DISTINCT base) AS BIGINT) AS n_bases,
         |  (COUNT(DISTINCT base) = 1) AS pure
         |FROM g WHERE gn > 1 GROUP BY 1 ORDER BY cluster_id""".stripMargin,

    // the same duplicated corpus + ' revN' tails, identical prefix
    // blocks, DuckDB's classical levenshtein as the verify
    "d19_edit_dedup" ->
      s"""WITH duped AS ($dupedDocsSql),
         |e AS (
         |  SELECT doc_id,
         |    text || ' rev' || CAST(doc_id % 3 AS VARCHAR) AS text
         |  FROM duped WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |b AS (
         |  SELECT doc_id, text, substr(lower(text), 1, 24) AS blk FROM e),
         |p AS (
         |  SELECT x.doc_id AS i, y.doc_id AS j,
         |    levenshtein(x.text, y.text) AS dist
         |  FROM b x JOIN b y ON y.blk = x.blk AND x.doc_id < y.doc_id)
         |SELECT i, j, CAST(dist AS INTEGER) AS dist FROM p
         |WHERE dist <= 2 ORDER BY i, j""".stripMargin,

    // NOT EXISTS, not NOT IN: a NULL text in the reference subquery would
    // make NOT IN return zero rows, while the operator's left_anti join
    // (correctly) keeps null-keyed rows — NOT EXISTS replays anti-join
    // null semantics exactly
    "d9_bloom_antijoin" ->
      """SELECT d.doc_id FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents r
        |                  WHERE r.doc_id % 3 = 0 AND r.text = d.text)
        |ORDER BY d.doc_id""".stripMargin,

    // trigram construction identical to the t8 oracle's g3 CTE
    "d10_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS l
        |  FROM documents),
        |bg AS (
        |  SELECT DISTINCT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                          FOR i IN range(1, len(l) - 1)]) AS g
        |  FROM toks WHERE doc_id % 97 = 0),
        |dg AS (
        |  SELECT doc_id, unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                                       FOR i IN range(1, len(l) - 1)])) AS g
        |  FROM toks WHERE doc_id % 97 <> 0),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_matched FROM dg JOIN bg USING (g) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(h.n_matched, 0) AS n_matched,
        |  CASE WHEN coalesce(h.n_matched, 0) > 0 THEN 'Y' ELSE 'N' END AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""".stripMargin,

    // the d2 pair construction × the sa1 bucket replay ('split:' salt);
    // lexical least/greatest cells, exact counts
    "sa17_leakage" ->
      s"""WITH pairs AS (
         |  SELECT keep AS i, doc_id AS j FROM (
         |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep
         |    FROM ($dupedDocsSql))
         |  WHERE doc_id <> keep),
         |assign AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < 8000 THEN 'train'
         |         WHEN bucket < 9000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (
         |    SELECT doc_id,
         |      list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |          FOR c IN string_split(substr(md5('split:' ||
         |            coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |        (acc, x) -> acc * 16 + x) % 10000 AS bucket
         |    FROM ($dupedDocsSql))),
         |j AS (
         |  SELECT least(ai.split, aj.split) AS split_a,
         |    greatest(ai.split, aj.split) AS split_b
         |  FROM pairs
         |  JOIN assign ai ON ai.doc_id = pairs.i
         |  JOIN assign aj ON aj.doc_id = pairs.j)
         |SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  split_a <> split_b AS crossing
         |FROM j GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,

    "d2_dup_pairs" ->
      s"""SELECT keep AS survivor_id, doc_id AS duplicate_id FROM (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep
         |  FROM ($dupedDocsSql))
         |WHERE doc_id <> keep ORDER BY 1, 2""".stripMargin,

    "d8_dup_clusters" ->
      s"""SELECT doc_id, cluster_id FROM (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS cluster_id,
         |         COUNT(*) OVER (PARTITION BY text) AS n
         |  FROM ($dupedDocsSql))
         |WHERE n > 1 ORDER BY doc_id""".stripMargin,

    // same-text group sizes ARE the cluster sizes (the d8 identity);
    // size-1 groups are the singleton row
    "d23_cluster_sizes" ->
      s"""WITH g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM ($dupedDocsSql) GROUP BY text)
         |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM g GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    // min-id survivorship per text group; token counts from the
    // REPLACED text; savings one closing double
    "pipe13_dedup_impact" ->
      s"""WITH d AS ($dupedDocsSql),
         |t AS (
         |  SELECT d.doc_id, s.source,
         |    CAST(len(list_filter(string_split_regex(lower(trim(d.text)),
         |      '\\s+'), x -> x <> '')) AS BIGINT) AS tok,
         |    row_number() OVER (PARTITION BY d.text ORDER BY d.doc_id)
         |      AS rn
         |  FROM d JOIN documents s ON s.doc_id = d.doc_id)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS docs_before,
         |  CAST(SUM(tok) AS BIGINT) AS tokens_before,
         |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_after,
         |  CAST(SUM(CASE WHEN rn = 1 THEN tok ELSE 0 END) AS BIGINT)
         |    AS tokens_after,
         |  CASE WHEN SUM(tok) > 0 THEN
         |    round(1.0e0 - CAST(SUM(CASE WHEN rn = 1 THEN tok ELSE 0 END)
         |        AS DOUBLE) / CAST(SUM(tok) AS DOUBLE), 6)
         |  END AS token_savings
         |FROM t GROUP BY 1 ORDER BY source""".stripMargin,

    "d11_retention" ->
      s"""SELECT doc_id,
         |  CASE WHEN n > 1 THEN grp_min ELSE doc_id END AS cluster_id,
         |  score,
         |  row_number() OVER (PARTITION BY text ORDER BY score DESC, doc_id) = 1 AS kept
         |FROM (
         |  SELECT doc_id, text, (doc_id * 37) % 101 AS score,
         |         MIN(doc_id) OVER (PARTITION BY text) AS grp_min,
         |         COUNT(*) OVER (PARTITION BY text) AS n
         |  FROM ($dupedDocsSql))
         |ORDER BY doc_id""".stripMargin,

    "sa7_cluster_split" ->
      s"""WITH docs AS ($dupedDocsSql),
         |keyed AS (
         |  SELECT doc_id,
         |    CASE WHEN n > 1 THEN grp_min ELSE doc_id END AS split_key
         |  FROM (SELECT doc_id,
         |          MIN(doc_id) OVER (PARTITION BY text) AS grp_min,
         |          COUNT(*) OVER (PARTITION BY text) AS n
         |        FROM docs)),
         |b AS (
         |  SELECT doc_id, split_key,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |                 FOR c IN string_split(substr(md5(coalesce(CAST(split_key AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) % 10000 AS bucket
         |  FROM keyed)
         |SELECT doc_id, split_key,
         |  CASE WHEN bucket < 8000 THEN 'train'
         |       WHEN bucket < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "d3_token_jaccard" ->
      jaccardSql("10", "string_split_regex(lower(trim(text)), '\\s+')", "0.8"),

    // the identical coefficient ladder (shared hashCoeffs), md5-portable
    // slot minima, all-pairs exact side with empty-intersection pairs kept
    "d18_minhash_err" -> {
      val coeffs = graft.operators.Dedup.hashCoeffs(16, 42L)
      val sigCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
        s"MIN((h * $a + $b) % 2147483647) AS m$i"
      }.mkString(",\n        |    ").stripMargin
      val matchExpr = (0 until 16).map(i =>
        s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 20 = 0 AND doc_id IS NOT NULL
         |    AND text IS NOT NULL),
         |tok AS (
         |  SELECT DISTINCT doc_id AS id, token FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
         |    FROM docs) WHERE token <> ''),
         |hh AS (
         |  SELECT id,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |        FOR c IN string_split(substr(md5('mh:' || token), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) % 2147483647 AS h
         |  FROM tok),
         |sigs AS (
         |  SELECT id, $sigCols
         |  FROM hh GROUP BY 1),
         |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
         |          FROM tok GROUP BY 1),
         |est AS (
         |  SELECT sa.id AS i, sb.id AS j,
         |    round(CAST($matchExpr AS DOUBLE) / 16.0e0, 6) AS est_j
         |  FROM sigs sa JOIN sigs sb ON sa.id < sb.id),
         |inter AS (
         |  SELECT a.id AS i, b.id AS j, CAST(COUNT(*) AS BIGINT) AS x
         |  FROM tok a JOIN tok b ON a.token = b.token AND a.id < b.id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT e.i, e.j, e.est_j,
         |    round(CAST(coalesce(it.x, 0) AS DOUBLE) /
         |      CAST(si.sz + sj.sz - coalesce(it.x, 0) AS DOUBLE), 6)
         |      AS exact_j
         |  FROM est e
         |  LEFT JOIN inter it ON it.i = e.i AND it.j = e.j
         |  JOIN sizes si ON si.id = e.i
         |  JOIN sizes sj ON sj.id = e.j)
         |SELECT i, j, est_j, exact_j,
         |  round(abs(est_j - exact_j), 6) AS abs_err
         |FROM ex ORDER BY i, j""".stripMargin
    },

    "d15_containment" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |tok AS (SELECT DISTINCT doc_id, token FROM (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM docs)
        |  WHERE token <> ''),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j, ROUND(CAST(inter AS DOUBLE) / least(si.sz, sj.sz), 6) AS containment
        |FROM pairs JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
        |WHERE CAST(inter AS DOUBLE) / least(si.sz, sj.sz) >= 0.9
        |ORDER BY i, j""".stripMargin,

    "d13_prefix_jaccard" ->
      jaccardSql("10", "string_split_regex(lower(trim(text)), '\\s+')", "0.8"),

    "d4_ngram_jaccard" ->
      jaccardSql("20",
        """[substr(lower(trim(text)), i, 5)
          |  for i in range(1, greatest(length(lower(trim(text))) - 4, 1) + 1)
          |  if length(substr(lower(trim(text)), i, 5)) = 5]""".stripMargin,
        "0.55", source = dupedDocsSql),

    // d5's banded-LSH output is oracle-checked against the EXACT jaccard
    // pair set: candidate verification guarantees LSH ⊆ exact, and on this
    // corpus every qualifying pair collides in some band (verified: the two
    // sets are identical at sf0.01 and sf0.1 under the fixed seed), so the
    // full-equality oracle holds. Recall-vs-design-bound is additionally
    // pinned in DedupSpec; do not downgrade this entry to rows-only.
    "d5_minhash_lsh" ->
      jaccardSql("4", "string_split_regex(lower(trim(text)), '\\s+')", "0.9",
        source = dupedDocsSql),

    // exact all-pairs Jaccard between the constructed recrawl batch and
    // the corpus — the d5 identity argument, cross-corpus edition
    // four stages replayed sequentially; dedup = exact all-pairs jaccard
    // (the d16 identity proof), cap = the sa2 md5-rank idiom. NOTE this
    // string is s-INTERPOLATED: \\s+ here reaches DuckDB as \s+ (the
    // iv3 escape lesson)
    "pipe2_incremental" -> {
      val augSql = (0 until 8)
        .map(i => s"'zz$i' || CAST(doc_id AS VARCHAR)").mkString(", ")
      s"""WITH d AS (SELECT doc_id, text, lang FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text, lang FROM d
         |  WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |    array_to_string(list_slice(list_filter(
         |      string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''),
         |      1, 12), ' '),
         |    lang
         |  FROM d WHERE doc_id % 7 = 3
         |  UNION ALL
         |  SELECT doc_id + 3000000, concat_ws(' ', text, $augSql), lang
         |  FROM d WHERE doc_id % 7 = 5),
         |btok AS (SELECT DISTINCT doc_id AS new_id, t AS token FROM (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS t
         |  FROM batch)),
         |rtok AS (SELECT DISTINCT doc_id AS ref_id, token FROM (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS token
         |  FROM d)),
         |bsz AS (SELECT new_id, COUNT(*) AS sz FROM btok GROUP BY 1),
         |rsz AS (SELECT ref_id, COUNT(*) AS sz FROM rtok GROUP BY 1),
         |pairs AS (
         |  SELECT n.new_id, r.ref_id, COUNT(*) AS inter
         |  FROM btok n JOIN rtok r ON n.token = r.token
         |  GROUP BY 1, 2),
         |dups AS (
         |  SELECT DISTINCT p.new_id
         |  FROM pairs p JOIN bsz a ON a.new_id = p.new_id
         |               JOIN rsz b ON b.ref_id = p.ref_id
         |  WHERE CAST(inter AS DOUBLE) / (a.sz + b.sz - inter) >= 0.9e0),
         |surv AS (SELECT * FROM batch
         |         WHERE doc_id NOT IN (SELECT new_id FROM dups)),
         |qual AS (
         |  SELECT doc_id, lang FROM surv
         |  WHERE len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                        x -> x <> '')) >= 30),
         |h AS (
         |  SELECT doc_id, lang,
         |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
         |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS hv
         |  FROM qual),
         |ranked AS (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |                       ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM h)
         |SELECT doc_id, lang FROM ranked WHERE rn <= 20
         |ORDER BY doc_id""".stripMargin
    },

    "d16_cross_dedup" ->
      """WITH newb AS (
        |  SELECT doc_id + 1000000 AS new_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    list_slice(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                           x -> x <> ''), 1, 12)
        |  FROM documents WHERE doc_id % 7 = 3),
        |ntok AS (SELECT DISTINCT new_id, t AS token
        |         FROM newb, UNNEST(toks) u(t) WHERE t <> ''),
        |rtok AS (SELECT DISTINCT doc_id AS ref_id, token FROM (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS token
        |  FROM documents)),
        |nsz AS (SELECT new_id, COUNT(*) AS sz FROM ntok GROUP BY 1),
        |rsz AS (SELECT ref_id, COUNT(*) AS sz FROM rtok GROUP BY 1),
        |pairs AS (
        |  SELECT n.new_id, r.ref_id, COUNT(*) AS inter
        |  FROM ntok n JOIN rtok r ON n.token = r.token
        |  GROUP BY 1, 2)
        |SELECT p.new_id, p.ref_id,
        |  ROUND(CAST(inter AS DOUBLE) / (a.sz + b.sz - inter), 6) AS jaccard
        |FROM pairs p JOIN nsz a ON a.new_id = p.new_id
        |             JOIN rsz b ON b.ref_id = p.ref_id
        |WHERE CAST(inter AS DOUBLE) / (a.sz + b.sz - inter) >= 0.9e0
        |ORDER BY p.new_id, p.ref_id""".stripMargin,

    // the t7 winnow replay (same rolling-hash fold and window minima)
    // over the constructed corpus, then the cap / pair / size sequence
    "d17_winnow_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 5000, substr(text, 1, 150)
        |  FROM documents WHERE doc_id % 10 = 0),
        |docs AS (SELECT doc_id, lower(trim(text)) AS t FROM corpus),
        |hs AS (
        |  SELECT doc_id,
        |    [list_reduce([CAST(ascii(c2) AS BIGINT)
        |                  FOR c2 IN string_split(substr(t, CAST(i AS INT), 5), '')],
        |       (acc, x) -> (acc * 31 + x) % 2147483647)
        |     FOR i IN range(1, greatest(length(t) - 4, 1) + 1)] AS h
        |  FROM docs),
        |wins AS (
        |  SELECT doc_id,
        |    [list_min(h[CAST(i AS INT):CAST(i + 3 AS INT)])
        |     FOR i IN range(1, greatest(len(h) - 3, 1) + 1)] AS fps
        |  FROM hs),
        |fp AS (SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM wins),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM fp GROUP BY 1),
        |rare AS (SELECT fp FROM (SELECT fp, COUNT(*) AS n FROM fp GROUP BY 1)
        |         WHERE n <= 40),
        |kept AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare r ON r.fp = f.fp),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p.i, p.j, p.shared, si.sz AS si, sj.sz AS sj,
        |  round(CAST(p.shared AS DOUBLE) /
        |        CAST(least(si.sz, sj.sz) AS DOUBLE), 6) AS overlap
        |FROM pairs p JOIN sz si ON si.doc_id = p.i
        |             JOIN sz sj ON sj.doc_id = p.j
        |ORDER BY p.i, p.j""".stripMargin,

    // d6 recomputes the 56-bit MD5-derived simhash per document in SQL and
    // takes ALL pairs at hamming ≤ 3 — equality with the Spark side holds
    // because banding with bands > maxDistance is pigeonhole-lossless
    "d6_simhash" ->
      """WITH duped AS (SELECT a.doc_id AS doc_id, b.text AS text
        |               FROM documents a JOIN documents b ON a.doc_id % 100 = b.doc_id),
        |docs AS (SELECT doc_id, text FROM duped WHERE doc_id % 4 = 0),
        |tok AS (SELECT DISTINCT doc_id, token FROM (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM docs)
        |  WHERE token <> ''),
        |th AS (SELECT doc_id, list_reduce(
        |         [CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |          FOR c IN string_split(substr(md5(token), 1, 14), '')],
        |         (acc, x) -> acc * 16 + x) AS h
        |       FROM tok),
        |bits AS (SELECT doc_id, j, SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |         FROM th, range(56) t(j) GROUP BY 1, 2),
        |fp AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS fp
        |       FROM bits GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j,
        |                 bit_count(xor(a.fp, b.fp)) AS distance
        |          FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT i, j, distance FROM pairs WHERE distance <= 3 ORDER BY i, j""".stripMargin,

    "d7_emb_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000, [x * 1.5 FOR x IN v] FROM base)
        |SELECT a.vec_id AS i, b.vec_id AS j
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.8
        |ORDER BY 1, 2""".stripMargin,

    // survivors = rows with no smaller-id neighbor at cosine >= 0.8; the
    // brute-force NOT EXISTS replays the LSH pipeline exactly because
    // colinear pairs collide in every band (the d7 data contract)
    "d12_semdedup" ->
      """WITH base AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT CASE WHEN vec_id % 10 = 0 THEN vec_id - 100000
        |              ELSE vec_id + 100000 END,
        |         [x * 1.5 FOR x IN v]
        |  FROM base)
        |SELECT c.vec_id FROM corpus c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM corpus o
        |  WHERE o.vec_id < c.vec_id
        |    AND list_cosine_similarity(o.v, c.v) >= 0.8)
        |ORDER BY vec_id""".stripMargin,

    // four-stage sequential replay: the quality floor and dedup reuse the
    // d1 idioms, contamination the t13 trigram-hash fold ('dc:' salt,
    // strings deduped before hashing), the split the sa1 bucket CASE with
    // 0.9/0.95 bounds; survivors always have n_ngrams >= 1 (>= 30 tokens)
    "pipe1_curation" ->
      s"""WITH corpus AS ($dupedDocsSql),
         |probes AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
         |quality AS (
         |  SELECT doc_id, text,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM corpus
         |  WHERE len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |    x -> x <> '')) >= 30),
         |dedup AS (
         |  SELECT doc_id, text, n_tokens FROM (
         |    SELECT doc_id, text, n_tokens,
         |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |dg AS (
         |  SELECT DISTINCT doc_id, g FROM (
         |    SELECT d.doc_id,
         |      unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
         |              FOR i IN range(1, len(l) - 1)]) AS g
         |    FROM (SELECT doc_id,
         |            list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |              x -> x <> '') AS l
         |          FROM dedup) d)),
         |dh AS (
         |  SELECT doc_id,
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('dc:' || g), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS h
         |  FROM dg),
         |pg AS (
         |  SELECT DISTINCT
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5('dc:' || g), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) AS h
         |  FROM (
         |    SELECT DISTINCT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
         |                    FOR i IN range(1, len(l) - 1)]) AS g
         |    FROM (SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |            x -> x <> '') AS l
         |          FROM probes))),
         |scored AS (
         |  SELECT dh.doc_id, count(*) AS n_g, count(pg.h) AS n_hit
         |  FROM dh LEFT JOIN pg ON pg.h = dh.h
         |  GROUP BY 1),
         |kept AS (
         |  SELECT d.doc_id, d.n_tokens
         |  FROM dedup d JOIN scored s USING (doc_id)
         |  WHERE NOT (CAST(s.n_hit AS DOUBLE) / s.n_g >= 0.8))
         |SELECT doc_id, n_tokens,
         |  CASE WHEN bucket < 9000 THEN 'train'
         |       WHEN bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, n_tokens,
         |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
         |        FOR ch IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
         |      (acc, x) -> acc * 16 + x) % 10000 AS bucket
         |  FROM kept)
         |ORDER BY doc_id""".stripMargin
  )
}
