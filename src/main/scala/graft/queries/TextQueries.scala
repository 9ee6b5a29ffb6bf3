package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.TextAnalysis

/**
 * Text-analysis coverage over `documents`, all with full DuckDB oracles —
 * every operator is plain integer/double arithmetic over tokens and
 * characters, so the oracle states the identical computation in SQL.
 */
object TextQueries {

  /** The pipe12 target mixture (driver literals, shared by query and
    * oracle): upweight src0–src4 to 8% each, the remaining 15 sources
    * hold 4% each (Σ = 1). */
  val mixtureTargets: Seq[(String, Double)] =
    (0 to 19).map(i => (s"src$i", if (i < 5) 0.08 else 0.04))

  /** The pipe14 min-token ladder (shared by query and oracle); 0 is the
    * no-gate baseline row, so shares read directly as attrition. */
  val qualityThresholds: Seq[Int] = Seq(0, 10, 20, 30, 50, 80)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counts: whitespace + BPE-ish subword runs
    "t1_token_counts" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic scores
    "t2_langid" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_guess"))
        .groupBy("lang_guess")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_guess")
    }),

    // quality components + composite score
    "t3_quality" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextAnalysis.alphaRatio(col("text")), 6).as("alpha_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // P30 — deterministic 80/10/10 train/val/test split by MD5 bucket:
    // the oracle recomputes every row's bucket and split bit-for-bit,
    // proving assignments are engine-portable (re-runs, rewrites, and
    // other engines agree on every row, forever)
    "sa1_hash_split" -> ((s, dir) => {
      graft.operators.Sampling.hashSplit(
          table(s, dir, "documents").select("doc_id"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"),
          graft.operators.Sampling.hashBucket(col("doc_id"), 10000).as("bucket"),
          col("split"))
        .orderBy("doc_id")
    }),

    // P98 — deterministic negative sampling over the customer–part
    // interaction table (k = 3 draws per positive from the contiguous
    // part-id range); the oracle replays every md5 draw and the
    // NOT-EXISTS interaction filter
    "sa12_negatives" -> ((s, dir) => {
      val inter = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
          Seq("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("it"))
      val r = table(s, dir, "part")
        .agg(min(col("p_partkey")), max(col("p_partkey"))).head
      graft.operators.Sampling.negativeSample(inter, "cust", "it",
          k = 3, itemMin = r.getLong(0), itemMax = r.getLong(1))
        .select(col("user").as("u"), col("item").as("it"),
          col("j"), col("neg_item"))
        .orderBy("u", "it", "j")
    }),

    // P92 — 5-fold assignment stratified by language: every lang's docs
    // dealt round-robin in portable hash order, so fold sizes within a
    // stratum differ by at most one; the oracle replays the hash rank
    "sa11_kfold" -> ((s, dir) => {
      graft.operators.Sampling.kFold(
          table(s, dir, "documents").select("doc_id", "lang"),
          "lang", "doc_id", k = 5)
        .orderBy("doc_id")
    }),

    // P67 — weighted sample: 50 docs drawn by Efraimidis-Spirakis keys
    // −ln(u)/w with hash-derived uniforms and weight doc_id % 5 + 1; the
    // oracle replays every key and the selection boundary exactly
    "sa8_weighted" -> ((s, dir) => {
      graft.operators.Sampling.weightedSample(
          table(s, dir, "documents")
            .select(col("doc_id"), (col("doc_id") % 5 + 1).as("w")),
          "doc_id", "w", k = 50)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    }),

    // P34 — per-class cap: at most 10 docs per (doc_id % 7) class, chosen
    // by portable hash order; the oracle replays the same MD5 ordering so
    // the retained subset must agree row-for-row
    "sa2_capped_per_key" -> ((s, dir) => {
      val classed = table(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("klass"))
      graft.operators.Sampling.cappedPerKey(classed, "klass", "doc_id", 10)
        .orderBy("klass", "doc_id")
    }),

    // P36 — exact stratified proportional sample: 25% of every
    // (doc_id % 5) stratum, chosen by portable-MD5 hash order; the oracle
    // replays the allocation row-for-row (0.25 is binary-exact, so the
    // round(0.25·n) boundary is engine-portable)
    "sa3_stratified" -> ((s, dir) => {
      val classed = table(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 5).as("stratum"))
      graft.operators.Sampling.stratifiedSample(classed, "stratum", "doc_id", 0.25)
        .orderBy("stratum", "doc_id")
    }),

    // P53 — fractional epoch replication: per-source weight
    // 0.25 + (N%8)·0.5 (binary-exact, so frac·2^56 thresholds are too);
    // src0/src8/src16 keep a quarter of their docs, src7/src15 run 3 full
    // epochs plus a deterministic 75% fourth — the oracle recomputes
    // weight, threshold, and replica list per row and must agree on every
    // (doc_id, epoch)
    "sa5_epochs" -> ((s, dir) => {
      val w = (0 until 20).map(i => s"src$i" -> (0.25 + (i % 8) * 0.5)).toMap
      graft.operators.Sampling.epochReplicate(
          table(s, dir, "documents").select("doc_id", "source"),
          "doc_id", "source", w)
        .orderBy("doc_id", "epoch")
    }),

    // P60 — adjacent-pair PMI with min count 5; both engines compute the
    // identical double op sequence before ln, so round(·,6) is the usual
    // cross-libm insurance (the t6/t11 discipline)
    "t15_pmi" -> ((s, dir) => {
      TextAnalysis.pmiPairs(table(s, dir, "documents"), "text",
          minPairCount = 5)
        .select(col("a"), col("b"), col("c_ab"),
          round(col("pmi"), 6).as("pmi"))
        .orderBy("a", "b")
    }),

    // P64 — bigram-LM perplexity (CCNet-style quality signal): add-1
    // smoothed bigram model trained on the corpus itself; the oracle
    // rebuilds the counts and replays every rounded log-prob through the
    // same DECIMAL sum
    "t16_perplexity" -> ((s, dir) => {
      TextAnalysis.bigramPerplexity(table(s, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P65 — BM25 top-10 for a 3-term query (Lucene idf form); N/avgdl
    // travel as literals, per-term scores round at 9 then DECIMAL-sum,
    // ranks tie-break on id (the t6 discipline)
    "iv2_bm25" -> ((s, dir) => {
      TextAnalysis.bm25TopK(table(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "vector"), k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    }),

    // P348 — pseudo-relevance feedback over the iv2 ranking: the top-10
    // docs vote expansion terms by r·idf (query terms excluded) — the
    // recall lever when query and corpus vocabulary diverge
    "iv6_prf" -> ((s, dir) => {
      TextAnalysis.prfExpansionTerms(table(s, dir, "documents"), "doc_id",
          "text", Seq("hash", "join", "vector"), kDocs = 10, mTerms = 10)
        .orderBy("rank")
    }),

    // P99 — Dirichlet query-likelihood ranking over the same query terms
    // as iv2_bm25 (μ = 2000): absent terms contribute smoothed mass, so
    // the two rankings legitimately differ; the oracle replays every
    // (doc, term) ln through the 9-decimal firewall
    "iv4_qld" -> ((s, dir) => {
      TextAnalysis.qldTopK(table(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join", "vector"), k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    }),

    // P273 — nDCG@10 of the iv2 BM25 ranking against graded relevance
    // (query-term occurrences capped at 10 — a cap of 3 saturates on
    // this corpus and pins nDCG at exactly 1.0, measured): the
    // order-aware retrieval
    // score beside sim9's recall@k
    "iv5_ndcg" -> ((s, dir) => {
      val ranked = TextAnalysis.bm25TopK(table(s, dir, "documents"),
        "doc_id", "text", Seq("hash", "join", "vector"), k = 10)
      val rels = table(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
        .where(col("w").isin("hash", "join", "vector"))
        .groupBy("doc_id")
        .agg(least(lit(10L), count(lit(1))).as("rel"))
      TextAnalysis.ndcgAtK(ranked, "id", "rank", rels, "doc_id", "rel",
        k = 10)
    }),

    // P276 — training-mixture rebalance plan: token shares per source vs
    // a 2×-upweight target on src0–src4, the weights a P53-style
    // fractional-epoch loader executes
    "pipe12_mixture" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("source"),
          size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      graft.operators.Sampling.mixtureRebalance(toks, "source", "n_tokens",
        TextQueries.mixtureTargets)
    }),

    // P277 — top-20 BPE merge candidates (adjacent char pairs inside
    // words): the first byte-pair merge iteration as one distributed
    // count; no window, deterministic limit boundary
    "t32_bpe_step" -> ((s, dir) => {
      TextAnalysis.bpeMergeCandidates(table(s, dir, "documents"), "text",
        k = 20)
    }),

    // P315 — term burstiness: VMR of per-doc counts over ALL docs for
    // the top-20 terms — frequency-vs-clumping separates content words
    // from function words at equal counts
    "t35_burstiness" -> ((s, dir) => {
      TextAnalysis.termBurstiness(table(s, dir, "documents"), "text",
        "doc_id", topK = 20)
    }),

    // P316 — Gries DP dispersion across sources for the top-20 terms:
    // a frequent term living in one shard is boilerplate/contamination
    // that corpus-wide counts hide
    "t36_dispersion" -> ((s, dir) => {
      TextAnalysis.griesDispersion(table(s, dir, "documents"), "text",
        "source", topK = 20)
    }),

    // P317 — Dunning G² collocations (top 20, pairs ≥ 5): the
    // evidence-weighted collocation test beside t15's rare-pair-happy
    // PMI
    "t37_colloc" -> ((s, dir) => {
      TextAnalysis.dunningG2(table(s, dir, "documents"), "text",
        minPairCount = 5L, topK = 20)
    }),

    // P387 — proximity search: 'data' and 'query' within 5 tokens —
    // the middle ground between iv8's any-distance AND and iv3's
    // distance-1 phrase
    "iv9_proximity" -> ((s, dir) => {
      TextAnalysis.proximitySearch(table(s, dir, "documents"), "doc_id",
          "text", "data", "query", window = 5)
        .orderBy("doc_id")
    }),

    // P384 — Fleiss' κ over three quality "raters" (token-length bar,
    // char-length bar, type-token-ratio bar): do the panel's filters
    // measure one thing (κ → 1, redundant) or different things
    // (κ ≈ 0)? — the filter-panel agreement read
    "t44_filter_kappa" -> ((s, dir) => {
      val tk = TextAnalysis.tokens(col("text"))
      val d = table(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(
          (TextAnalysis.tokenCount(col("text")) >= 40).as("r_len"),
          (col("n_chars") >= 250).as("r_chars"),
          // zero-token guard: ANSI double 0/0 THROWS in Spark while
          // DuckDB's division returns NULL (row then dropped by the
          // rater null filter) — null here mirrors that exactly
          when(size(tk) > 0,
            size(array_distinct(tk)).cast("double") /
              size(tk).cast("double") >= 0.55).as("r_ttr"))
      graft.operators.Features.fleissKappaBinary(d,
        Seq("r_len", "r_chars", "r_ttr"))
    }),

    // P379 — boolean conjunctive retrieval: docs with BOTH 'data' and
    // 'query', excluding 'dup' — the exact-predicate filter class
    // beside the ranked iv2/iv4 retrievers (term shares measured:
    // data ~76%, query ~76%, dup ~5% of docs — all paths exercised)
    "iv8_boolean" -> ((s, dir) => {
      TextAnalysis.booleanRetrieve(table(s, dir, "documents"), "doc_id",
          "text", Seq("data", "query"), Seq("dup"))
        .orderBy("doc_id")
    }),

    // P370 — collocation t-score (top 20, pairs ≥ 5): the conservative
    // high-frequency-phrase member beside t37's G² and t15's PMI —
    // the SAME margin table, a different ranking
    "t42_tscore" -> ((s, dir) => {
      TextAnalysis.tScoreCollocations(table(s, dir, "documents"), "text",
        minPairCount = 5L, topK = 20)
    }),

    // P371 — mojibake audit over a corpus with planted mis-decodes:
    // doc_id%7==3 docs get their 'e's Latin-1-shredded, %7==5 a curly-
    // apostrophe digraph, %11==0 a replacement char — all three marker
    // classes hit at every SF
    "t43_mojibake" -> ((s, dir) => {
      // markers via unicode escapes: U+0080/U+0099 are invisible
      // control codepoints (the mis-decoded UTF-8 tail of U+2019)
      val eacute = "\u00C3\u00A9"
      val rsquo = "\u00E2\u0080\u0099"
      val repl = "\uFFFD"
      val corrupted = table(s, dir, "documents").select(
        when(col("doc_id") % 7 === 3,
          replace(col("text"), lit("e"), lit(eacute)))
          .when(col("doc_id") % 7 === 5,
            concat(col("text"), lit(" " + rsquo)))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(repl)))
          .otherwise(col("text")).as("text"))
      TextAnalysis.encodingAnomalies(corrupted, "text", Seq(
          ("latin1_eacute", eacute),
          ("win1252_rsquo", rsquo),
          ("replacement_char", repl)))
        .orderBy("marker")
    }),

    // P350 — blocklist content filter: per-doc hit counts against a
    // 2-term list and the keep verdict at maxHits = 2 (terms chosen so
    // both verdicts and 0/1/2 distinct-hit counts all occur: 'dup' sits
    // in ~5% of docs, 'vector' in ~76% with varying multiplicity)
    "t39_blocklist" -> ((s, dir) => {
      TextAnalysis.blocklistFilter(table(s, dir, "documents"), "doc_id",
          "text", Seq("dup", "vector"), maxHits = 2L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P365 — keyword-in-context for 'dup' (±3 tokens, ~26 occurrences
    // across ~25 docs): the audit view a blocklist decision reads
    // before dropping documents on a term
    "t41_kwic" -> ((s, dir) => {
      TextAnalysis.keywordInContext(table(s, dir, "documents"),
          "doc_id", "text", term = "dup", window = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "pos")
    }),

    // P354 — vocabulary-richness panel per doc: Yule's K, Sichel S,
    // hapax share, TTR from the exact per-doc frequency spectrum (the
    // ~31-word shared vocabulary makes K the discriminating signal —
    // TTR saturates on short docs)
    "t40_richness" -> ((s, dir) => {
      TextAnalysis.vocabularyRichness(table(s, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P355 — retrieval eval over 3 fixed term queries with measured
    // occurrence-count relevance bars (28-32 / 36-41 / 38-40 relevant
    // docs at the two SFs — neither empty nor saturated)
    "iv7_mrr" -> ((s, dir) => {
      TextAnalysis.retrievalEval(table(s, dir, "documents"), "doc_id",
          "text", Seq(
            ("q1", Seq("hash", "join", "vector"), 12L),
            ("q2", Seq("stream", "window"), 8L),
            ("q3", Seq("slow", "fast"), 8L)), k = 10)
        .orderBy("query")
    }),

    // P343 — code-vs-prose split over a corpus with planted pseudo-code:
    // every doc_id%10 text is rewritten as `if (<text_with_underscores>)
    // { return 0; }` — brace/semicolon/paren density the prose rows
    // lack, so both verdicts occur by construction
    "t38_code_detect" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("if ("), translate(col("text"), " ", "_"),
            lit(") { return 0; }")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.codeSignals(planted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P286 — tokenizer fertility per language: chars-per-token and
    // tokens-per-doc (the compression read that decides how much a
    // language REALLY costs per context window)
    "t34_fertility" -> ((s, dir) => {
      table(s, dir, "documents")
        .where(col("lang").isNotNull && col("text").isNotNull)
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("__tok"),
          length(col("text")).cast("long").as("__ch"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
          sum(col("__ch")).as("n_chars"))
        .withColumn("chars_per_token",
          when(col("n_tokens") > 0,
            round(col("n_chars").cast("double") /
              col("n_tokens").cast("double"), 6)))
        .withColumn("tokens_per_doc",
          round(col("n_tokens").cast("double") /
            col("n_docs").cast("double"), 6))
        .orderBy("lang")
    }),

    // P287 — quality-gate threshold sweep: surviving docs/tokens at a
    // min-token ladder in ONE corpus pass (conditional sums + stack) —
    // the attrition curve that decides where the t3/pipe1 bar sits
    "pipe14_quality_sweep" -> ((s, dir) => {
      val thr = TextQueries.qualityThresholds
      val docs = table(s, dir, "documents").where(col("text").isNotNull)
        .select(TextAnalysis.tokenCount(col("text")).cast("long").as("__t"))
      val exprs =
        Seq(count(lit(1)).as("__td"), sum(col("__t")).as("__tt")) ++
          thr.flatMap(t => Seq(
            sum(when(col("__t") >= t, 1L).otherwise(0L)).as(s"__d$t"),
            sum(when(col("__t") >= t, col("__t")).otherwise(0L))
              .as(s"__k$t")))
      val agg = docs.agg(exprs.head, exprs.tail: _*)
      agg.select(col("__td"), col("__tt"),
          expr(s"stack(${thr.size}, " +
            thr.map(t => s"$t, __d$t, __k$t").mkString(", ") +
            ") as (min_tokens, n_docs, n_tokens)"))
        .select(col("min_tokens"), col("n_docs"), col("n_tokens"),
          round(col("n_docs").cast("double") / col("__td").cast("double"),
            6).as("doc_share"),
          round(col("n_tokens").cast("double") / col("__tt").cast("double"),
            6).as("token_share"))
        .orderBy("min_tokens")
    }),

    // P283 — pairwise source overlap on word-BIGRAM vocabularies (the
    // unigram vocabulary is ~31 words EVERYWHERE so unigram Jaccard ≈ 1;
    // bigrams separate, 0.54–0.70 measured): which feeds duplicate
    // each other
    "t33_source_overlap" -> ((s, dir) => {
      TextAnalysis.groupBigramJaccard(table(s, dir, "documents"),
        "source", "doc_id", "text")
    }),

    // P57 — inverted index with 5-entry posting lists; postings joined to
    // '|' strings so the hash compare sees one scalar per token
    "iv1_inverted" -> ((s, dir) => {
      TextAnalysis.invertedIndex(table(s, dir, "documents"), "doc_id", "text",
          maxPostings = 5)
        .select(col("token"), col("df"), col("occurrences"),
          concat_ws("|", col("postings")).as("postings"))
        .orderBy("token")
    }),

    // P55 — OOV rate vs the corpus's own top-20 vocabulary (31 distinct
    // tokens at sf0.01, so the cut is real and the count-tie line is
    // settled by the token-asc tie-break on both sides); occurrences, not
    // types
    "t14_oov" -> ((s, dir) => {
      TextAnalysis.oovRate(table(s, dir, "documents"), "doc_id", "text", k = 20)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("oov_rate"), 6).as("oov_rate"))
        .orderBy("doc_id")
    }),

    // P54 — token-budget subsampling: per-source budgets of
    // 300 + (N%4)·100 tokens filled greedily in portable-hash order; the
    // oracle replays the hash order and the exact integer running sum, so
    // the boundary row of every domain must agree
    "sa6_token_budget" -> ((s, dir) => {
      val budgets = (0 until 20)
        .map(i => s"src$i" -> (300L + (i % 4) * 100L)).toMap
      val docs = table(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling.tokenBudget(
          docs, "source", "doc_id", "n_tokens", budgets)
        .orderBy("source", "cum_tokens", "doc_id")
    }),

    // P263 — corpus entropy rate: unigram vs bigram-conditional entropy
    // and the redundancy a curation pass should reduce
    "t31_entropy_rate" -> ((s, dir) => {
      graft.operators.TextAnalysis.entropyRate(
        table(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text")
    }),

    // P255 — trigram originality per doc: share of a doc's distinct
    // 3-grams first seen HERE (doc-id order) — the boilerplate /
    // assembled-from-parts detector
    "t30_originality" -> ((s, dir) => {
      graft.operators.TextAnalysis.ngramOriginality(
          table(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", n = 3)
        .orderBy("id")
    }),

    // P246 — vocab coverage at frequency rungs: the tokenizer budget
    // audit (share of token mass the ≥f vocab covers)
    "t29_vocab_coverage" -> ((s, dir) => {
      graft.operators.TextAnalysis.vocabCoverage(
          table(s, dir, "documents").select("text"), "text")
        .orderBy("min_freq")
    }),

    // P231 — Cohen's κ between the t2 langid heuristic and the labeled
    // lang column: chance-corrected agreement (accuracy alone flatters
    // the skewed label mix — t24 reports it, this corrects it)
    "o60_kappa" -> ((s, dir) => {
      val scored = table(s, dir, "documents")
        .where(col("lang").isNotNull)
        .select(col("lang").as("actual"),
          TextAnalysis.langId(col("text")).as("predicted"))
      graft.operators.Features.cohensKappa(scored, "actual", "predicted")
    }),

    // P220 — GPT-style sequence packing: 4 hash shards, 1024-token
    // bins over the concatenated (hash, id)-ordered token stream;
    // per-bin doc counts, fill and boundary-straddler counts
    "pipe9_seqpack" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling.sequencePack(docs, "doc_id", "n_tokens",
          shards = 4, capacity = 1024L, salt = "pack:")
        .orderBy("shard", "bin")
    }),

    // P29 — token-window chunking (32-token chunks, 8-token overlap)
    "t5_chunks" -> ((s, dir) => {
      TextAnalysis.chunkTokens(table(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")
    }),

    // P32 — top-3 TF-IDF terms per doc over a 10% subset; the RANKING
    // itself runs on the 6-decimal-rounded score (not just the output), so
    // cross-engine ln() ulp slack collapses into exact ties that the token
    // tie-break then settles identically (the CLAUDE.md rank discipline)
    "t6_tfidf" -> ((s, dir) => {
      val docs = table(s, dir, "documents").where(col("doc_id") % 10 === 0)
      val scored = TextAnalysis.tfidf(docs, "doc_id", "text")
        .withColumn("score", round(col("score"), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("score").desc, col("token").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("id").as("doc_id"), col("rank"), col("token"),
          col("tf"), col("df"), round(col("score"), 6).as("score"))
        .orderBy("doc_id", "rank")
    }),

    // P33 — winnowing selection over 5-gram hashes, window 4, exploded to
    // (doc_id, fp) rows; docs shorter than one shingle are excluded on
    // both sides so degenerate-substring semantics never differ
    "t7_winnow" -> ((s, dir) => {
      table(s, dir, "documents")
        .where(col("doc_id") % 20 === 0 && length(lower(trim(col("text")))) >= 5)
        .select(col("doc_id"),
          explode(TextAnalysis.winnowFingerprints(col("text"), 5, 4)).as("fp"))
        .orderBy("doc_id", "fp")
    }),

    // P128 — Zipf exponent of the corpus vocabulary (top 500 ranks):
    // both logs 9-rounded before the decimal-exact regression
    "t19_zipf" -> ((s, dir) => {
      TextAnalysis.zipfFit(table(s, dir, "documents"), "text", maxRank = 500)
    }),

    // P208 — language-mix audit: 32-token chunks langid'd against the
    // doc-level call; the code-switch / concatenation detector
    "t27_langmix" -> ((s, dir) => {
      TextAnalysis.languageMix(table(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P197 — Simpson diversity + effective vocabulary per language:
    // the head-concentration complement to t11's entropy
    "t26_simpson" -> ((s, dir) => {
      TextAnalysis.simpsonDiversity(
          table(s, dir, "documents").select("lang", "text"), "lang", "text")
        .orderBy("lang")
    }),

    // P135 — Flesch reading ease over regex-deterministic counts; the
    // curriculum-stratification / OCR-noise signal
    "t20_readability" -> ((s, dir) => {
      val r = TextAnalysis.readability(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), r.getField("n_words").as("n_words"),
          r.getField("n_sents").as("n_sents"),
          r.getField("n_syll").as("n_syll"),
          r.getField("flesch").as("flesch"))
        .orderBy("doc_id")
    }),

    // P139 — cross-document boilerplate: 4-grams in >= 3 distinct docs
    // are template text; per-doc fraction of the gram stream claimed
    "t21_boilerplate" -> ((s, dir) => {
      TextAnalysis.crossDocNgrams(table(s, dir, "documents"),
          "doc_id", "text", n = 4, minDocs = 3L)
        .orderBy("doc_id")
    }),

    // P182 — reweight the corpus to a target language mix; ESS says how
    // many effective examples the reweighted corpus is worth
    "sa18_reweight" -> ((s, dir) => {
      graft.operators.Sampling.importanceReweight(
          table(s, dir, "documents"), "lang",
          Seq(("de", 0.2), ("en", 0.3), ("es", 0.2), ("fr", 0.2),
            ("zh", 0.1)))
        .orderBy("lang")
    }),

    // P177 — reciprocal-rank fusion of the BM25 (iv2) and QLD (iv4)
    // top-10 rankings: the score-free retriever ensemble
    "pipe5_rrf" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bm = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("hash", "join", "vector"), k = 10)
      val ql = TextAnalysis.qldTopK(docs, "doc_id", "text",
        Seq("hash", "join", "vector"), k = 10)
      graft.operators.Similarity.rrfFusion(Seq(bm, ql), "id", "rank",
          k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    }),

    // P179 — Heaps'-law exponent over 50-doc corpus checkpoints: the
    // vocabulary-growth capacity curve beside t19's Zipf fit
    "t25_heaps" -> ((s, dir) => {
      TextAnalysis.heapsFit(table(s, dir, "documents"),
        "doc_id", "text", checkpointEvery = 50)
    }),

    // P170 — langId confusion matrix against the trusted lang label,
    // with overall accuracy riding on every cell
    "t24_langid_eval" -> ((s, dir) => {
      TextAnalysis.langIdEval(table(s, dir, "documents"), "lang", "text")
        .orderBy("actual", "predicted")
    }),

    // P153 — RAKE keyphrases: top-3 stopword-delimited phrase runs per
    // doc by summed word deg/freq scores
    "t23_rake" -> ((s, dir) => {
      TextAnalysis.rakePhrases(table(s, dir, "documents"),
          "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    }),

    // P147 — dataset-card summary per language + ALL rollup: counts,
    // exact-dup distincts, token totals/means, mean quality — one pass
    "pipe4_datacard" -> ((s, dir) => {
      TextAnalysis.corpusCard(table(s, dir, "documents"),
          "lang", "text", "n_chars")
        .orderBy("lang")
    }),

    // P142 — 64-dim hashing-trick features: signed per-bucket token
    // sums, no vocabulary pass; portable-MD5 route + sign hashes
    "t22_feature_hash" -> ((s, dir) => {
      TextAnalysis.featureHash(table(s, dir, "documents"),
          "doc_id", "text", dims = 64)
        .orderBy("doc_id", "bucket")
    }),

    // P145 — class-balanced downsample of documents by language: every
    // lang keeps exactly min-class-count rows in portable hash order
    "sa14_balanced" -> ((s, dir) => {
      graft.operators.Sampling.balancedDownsample(
          table(s, dir, "documents").select("doc_id", "lang"),
          "lang", "doc_id")
        .orderBy("lang", "sample_rank")
    }),

    // P129 — every-5th systematic sample of documents in portable hash
    // order: exactly ceil(n/5) rows, unlike a hash split's binomial keep
    "sa13_systematic" -> ((s, dir) => {
      graft.operators.Sampling.systematicSample(
          table(s, dir, "documents").select("doc_id", "lang"), "doc_id", k = 5)
        .orderBy("sample_rank")
    }),

    // P118 — Jensen-Shannon divergence between the even- and odd-id
    // halves of the corpus token distributions: 9-rounded decimal-summed
    // ln terms, one full-outer vocabulary join, one scalar totals row
    "t18_jsd" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      TextAnalysis.jsDivergence(
        d.where(col("doc_id") % 2 === 0),
        d.where(col("doc_id") % 2 === 1), "text")
    }),

    // P41 — corpus mixing: domains web/books/code (doc_id % 3) to a
    // 1/2 : 1/4 : 1/4 target mix; equal-sized domains make books/code the
    // binding constraint. Binary-exact weights keep every quota boundary
    // engine-portable; the oracle recomputes N and the quotas with integer
    // arithmetic and replays the portable-hash keep set row-for-row
    "sa4_mix" -> ((s, dir) => {
      val domains = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "web")
          .when(col("doc_id") % 3 === 1, "books")
          .otherwise("code").as("domain"))
      graft.operators.Sampling.mixCorpus(domains, "domain", "doc_id",
          Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
        .orderBy("domain", "doc_id")
    }),

    // P40 — concat-and-split sequence packing: 8 shards, 256-token
    // windows; the oracle replays the portable-MD5 shard assignment and
    // in-shard ordering, then derives the same prefix sums and window
    // coordinates with integer arithmetic — every document's placement
    // must agree bit-for-bit
    "t10_pack" -> ((s, dir) => {
      TextAnalysis.packSequences(table(s, dir, "documents"), "doc_id", "text",
          seqLen = 256, shards = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P35 — Gopher-style repetition/boilerplate signals: the top-unigram /
    // top-bigram fractions and duplicate bi-/tri-gram fractions, all
    // per-row array math (zero shuffles); the oracle rebuilds every
    // n-gram multiset in SQL and derives the same ratios
    "t8_repetition" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        round(TextAnalysis.topNgramFraction(col("text"), 1), 6).as("top1_frac"),
        round(TextAnalysis.topNgramFraction(col("text"), 2), 6).as("top2_frac"),
        round(TextAnalysis.dupNgramFraction(col("text"), 2), 6).as("dup2_frac"),
        round(TextAnalysis.dupNgramFraction(col("text"), 3), 6).as("dup3_frac"))
        .orderBy("doc_id")
    }),

    // P42 — lexical-diversity signals: token-unigram Shannon entropy and
    // type-token ratio from the one-pass native kernel; the oracle
    // rebuilds the unigram counts in SQL and states the identical
    // algebraic form (log2(n) − Σc·log2(c)/n), with both floats rounded
    // at 6 decimals (the t6 discipline for cross-libm ulp drift)
    "t11_lexical" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        round(TextAnalysis.wordEntropy(col("text")), 6).as("entropy"),
        round(TextAnalysis.typeTokenRatio(col("text")), 6).as("ttr"),
        TextAnalysis.lexicalStats(col("text")).getItem(2).cast("long").as("n_distinct"),
        TextAnalysis.lexicalStats(col("text")).getItem(3).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // P49 — count-min sketch frequency estimates: 2 hash rows × 16
    // buckets over every token occurrence (width << vocabulary, so
    // collisions are real and estimates genuinely exceed some exact
    // counts); portable-MD5 bucketing lets the oracle rebuild the sketch
    // cell-for-cell and replay every min-estimate
    "t12_cms" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val sketch = graft.operators.Sketches.countMinSketch(
        toks, "token", rows = 2, width = 16)
      val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
      graft.operators.Sketches.cmsEstimate(
          sketch, exact.select("token"), "token", rows = 2, width = 16)
        .withColumnRenamed("item", "token")
        .join(exact, Seq("token"))
        .orderBy("token")
    }),

    // P79 — exact heavy hitters over token occurrences: Misra–Gries
    // candidate pass + exact verify returns precisely the tokens with
    // count > n/20, so the oracle is the direct GROUP BY ... HAVING on
    // the same tokenization (the sk1/d13 identity-proof pattern)
    "sk5_heavyhitters" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      // k = 40: this corpus's ~29-word vocabulary tops out at ~3.5%
      // share, so the n/20 = 5% bar returned ZERO hitters at every SF
      // (vacuous green, caught r9s4); n/40 = 2.5% makes the exact
      // two-pass answer non-trivial on both sides
      graft.operators.Sketches.heavyHitters(toks, "token", k = 40)
        .withColumnRenamed("item", "token")
        .orderBy("token")
    }),

    // P52 — benchmark decontamination: every doc scored by the fraction
    // of its distinct trigrams found in a probe set (docs with
    // doc_id % 97 = 0 play the benchmark — they must self-score 1.0);
    // the join runs on 56-bit portable gram hashes, which the oracle
    // regenerates to replay hits, misses, and the 0.2 flag line exactly
    "t13_decontam" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      graft.operators.Dedup.ngramContamination(
          d, "doc_id", "text",
          d.where(col("doc_id") % 97 === 0), "text", n = 3,
          flagThreshold = 0.2)
        .select(col("doc_id"), col("n_ngrams"), col("n_contaminated"),
          round(col("contamination"), 6).as("contamination"), col("flagged"))
        .orderBy("doc_id")
    }),

    // P38 — PII redaction: the corpus text is deterministically enriched
    // with synthetic PII (emails/IPs varying by doc_id, constant phone/SSN)
    // on BOTH sides, then redacted; the oracle replays the same
    // regexp_replace chain in RE2 — byte-equal output proves the pattern
    // set is engine-portable
    "t9_redact" -> ((s, dir) => {
      val enriched = concat(col("text"),
        lit(" u"), col("doc_id").cast("string"),
        lit("@ex.com ip 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 call +1 555-123-4567 ssn 123-45-6789"))
      table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.redactPii(enriched).as("redacted"),
        TextAnalysis.piiCount(enriched, "email").as("n_email"),
        TextAnalysis.piiCount(enriched, "ipv4").as("n_ip"),
        TextAnalysis.piiCount(enriched, "phone").as("n_phone"),
        TextAnalysis.piiCount(enriched, "ssn").as("n_ssn"))
        .orderBy("doc_id")
    }),

    // polynomial rolling-hash fingerprint
    "t4_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.docFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // P69 — per-source weighted reservoir: 5 docs per source, odds
    // proportional to n_chars, via A-ES keys inside one window — the
    // oracle replays every hash, key, and rank
    "sa9_reservoir" -> ((s, dir) => {
      graft.operators.Sampling.weightedSamplePerKey(
          table(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
          "source", "doc_id", "n_chars", k = 5)
        .withColumnRenamed("key", "source")
        .withColumnRenamed("id", "doc_id")
        .orderBy("source", "rank")
    }),

    // P75 — temperature-flattened domain sampling at T = 2 over a
    // synthetic 60/30/10 skew: rates sqrt-flatten toward uniform (the
    // smallest domain keeps all rows); the oracle replays counts, pow,
    // the 9-decimal rate, and every keep draw
    "sa10_temperature" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 < 6, lit("big"))
          .when(col("doc_id") % 10 < 9, lit("mid"))
          .otherwise(lit("small")).as("domain"))
      graft.operators.Sampling.temperatureSample(d, "domain", "doc_id",
          temperature = 2.0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // P70 — Gopher rule filter with the published thresholds (50-word
    // minimum splits this corpus: token counts run 10..100); every signal
    // and the keep conjunction replayed by the oracle
    "t17_gopher" -> ((s, dir) => {
      val f = TextAnalysis.gopherFlags(col("text"))
      table(s, dir, "documents").select(col("doc_id"), f.as("f"))
        .select(col("doc_id"), col("f.n_words"), col("f.mean_word_len"),
          col("f.n_stop_hits"), col("f.alpha_word_frac"),
          col("f.symbol_word_ratio"), col("f.keep"))
        .orderBy("doc_id")
    }),

    // P71 — positional-index phrase count: occurrences of the two-token
    // phrase "table value" per document via posting-list joins; the
    // oracle counts consecutive positions directly per document (the
    // d13 identity-proof pattern)
    "iv3_phrase" -> ((s, dir) => {
      TextAnalysis.phraseCount(
          table(s, dir, "documents"), "doc_id", "text",
          Seq("table", "value"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    })
  )

  private val EnStops = TextAnalysis.LanguageProfiles("en")
    .map(s => s"'$s'").mkString("[", ", ", "]")

  private def profileSql(lang: String): String = {
    val stops = TextAnalysis.LanguageProfiles(lang).map(s => s"'$s'").mkString("[", ", ", "]")
    s"""STRUCT_PACK(sc := CAST(len(list_intersect(toks, $stops)) AS DOUBLE) /
       |  greatest(len(toks), 1), lg := '$lang')""".stripMargin.replace("\n", " ")
  }

  val oracles: Map[String, String] = Map(
    // patterns transcribed verbatim from TextAnalysis.PiiPatterns; DuckDB
    // needs the 'g' flag (regexp_replace is first-match by default) and
    // counts via len(regexp_extract_all) (no regexp_count in 1.0)
    "t9_redact" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    text || ' u' || CAST(doc_id AS VARCHAR) || '@ex.com ip 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555-123-4567 ssn 123-45-6789' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}', '[PHONE]', 'g') AS redacted,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  len(regexp_extract_all(t, '\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}')) AS n_phone,
        |  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn
        |FROM e ORDER BY doc_id""".stripMargin,

    "t8_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS l
        |  FROM documents),
        |g1 AS (SELECT doc_id, unnest(l) AS g FROM toks),
        |g2 AS (SELECT doc_id,
        |         unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS g FROM toks),
        |g3 AS (SELECT doc_id,
        |         unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                 FOR i IN range(1, len(l) - 1)]) AS g FROM toks),
        |c1 AS (SELECT doc_id, g, count(*) AS c FROM g1 GROUP BY 1, 2),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |m1 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top1 FROM c1 GROUP BY doc_id),
        |m2 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top2,
        |              CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup2 FROM c2 GROUP BY doc_id),
        |m3 AS (SELECT doc_id, CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup3 FROM c3 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  round(coalesce(m1.top1, 0), 6) AS top1_frac,
        |  round(coalesce(m2.top2, 0), 6) AS top2_frac,
        |  round(coalesce(m2.dup2, 0), 6) AS dup2_frac,
        |  round(coalesce(m3.dup3, 0), 6) AS dup3_frac
        |FROM documents d
        |LEFT JOIN m1 USING (doc_id) LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // same op sequence: (c_ab/N_pairs) / ((c_a/N_tok)·(c_b/N_tok)) then
    // ln; N_pairs is the PRE-prune total on both sides
    "t15_pmi" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS l
        |  FROM documents),
        |pairs AS (
        |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b,
        |    count(*) AS c_ab
        |  FROM (SELECT unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS g
        |        FROM toks)
        |  GROUP BY 1, 2),
        |uni AS (
        |  SELECT token, count(*) AS c
        |  FROM (SELECT unnest(l) AS token FROM toks) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM pairs),
        |tott AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni)
        |SELECT p.a, p.b, p.c_ab,
        |  round(ln((CAST(p.c_ab AS DOUBLE) / t.n_pairs) /
        |           ((CAST(ua.c AS DOUBLE) / tt.n_tok) *
        |            (CAST(ub.c AS DOUBLE) / tt.n_tok))), 6) AS pmi
        |FROM pairs p
        |JOIN uni ua ON ua.token = p.a
        |JOIN uni ub ON ub.token = p.b
        |CROSS JOIN tot t CROSS JOIN tott tt
        |WHERE p.c_ab >= 5
        |ORDER BY p.a, p.b""".stripMargin,

    // counts rebuilt from scratch; log-probs from exact integer counts,
    // rounded at 9, summed in DECIMAL (order-independent), one exp at the
    // end rounded at 6 — the operator's exact portability recipe
    "t16_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |vv AS (SELECT count(DISTINCT t) AS v
        |       FROM (SELECT unnest(l) AS t FROM toks)),
        |uni AS (SELECT t AS prev, count(*) AS cu
        |        FROM (SELECT unnest(l) AS t FROM toks) GROUP BY 1),
        |bg AS (
        |  SELECT doc_id, string_split(g, ' ')[1] AS prev,
        |         string_split(g, ' ')[2] AS w
        |  FROM (SELECT doc_id,
        |          unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS g
        |        FROM toks)),
        |big AS (SELECT prev, w, count(*) AS cb FROM bg GROUP BY 1, 2),
        |occ AS (
        |  SELECT bg.doc_id,
        |    round(ln((cb + 1.0e0) / (cu + CAST(vv.v AS DOUBLE))), 9) AS lp
        |  FROM bg JOIN big USING (prev, w) JOIN uni USING (prev)
        |  CROSS JOIN vv),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) AS slp
        |  FROM occ GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(p.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        |  round(exp(-(p.slp / p.n_bigrams)), 6) AS perplexity
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // every constant-involving double op spelled in the operator's
    // association order (avgdl = sdl/n, k1+1, b*dl/avgdl) so both engines
    // run the same IEEE sequence; per-term scores round at 9 and sum in
    // DECIMAL like the Spark side
    "iv2_bm25" ->
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
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        |FROM agg ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // shared tokenization, occurrence + distinct counts over the IN
    // filter, left join back (absent → 0 hits, kept)
    "t39_blocklist" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |t AS (SELECT doc_id, unnest(l) AS w FROM toks),
        |h AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |    CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_hits
        |  FROM t WHERE w IN ('dup', 'vector') GROUP BY 1)
        |SELECT toks.doc_id, CAST(len(toks.l) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(h.distinct_hits, 0) AS BIGINT) AS distinct_hits,
        |  coalesce(h.n_hits, 0) <= 2 AS kept
        |FROM toks LEFT JOIN h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // positions via a filtered 1-based comprehension, contexts as
    // inclusive list slices clamped at the edges; an out-of-range
    // DuckDB slice reads NULL where Spark's zero-length slice reads
    // [] — coalesce pins the '' empty-side contract
    "t41_kwic" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |p AS (
        |  SELECT doc_id, toks,
        |    unnest([i FOR i IN range(1, len(toks) + 1)
        |            IF toks[CAST(i AS INT)] = 'dup']) AS pos1
        |  FROM d)
        |SELECT doc_id, CAST(pos1 - 1 AS INT) AS pos, 'dup' AS term,
        |  coalesce(array_to_string(toks[GREATEST(CAST(pos1 - 3 AS INT), 1):
        |    CAST(pos1 - 1 AS INT)], ' '), '') AS left_ctx,
        |  coalesce(array_to_string(toks[CAST(pos1 + 1 AS INT):
        |    LEAST(CAST(pos1 + 3 AS INT), CAST(len(toks) AS INT))], ' '), '')
        |    AS right_ctx
        |FROM p ORDER BY doc_id, pos""".stripMargin,

    // exact (doc, word) counts → frequency spectrum → the four richness
    // folds, each ONE double expression on identical integer operands
    "t40_richness" ->
      """WITH wc AS (
        |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS i
        |  FROM (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS w
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |  GROUP BY 1, 2),
        |spec AS (SELECT doc_id, i, CAST(COUNT(*) AS BIGINT) AS vi
        |         FROM wc GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(i * vi) AS BIGINT) AS n_tokens,
        |    CAST(SUM(vi) AS BIGINT) AS vocab,
        |    CAST(SUM(CASE WHEN i = 1 THEN vi ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN i = 2 THEN vi ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(SUM(i * i * vi) AS BIGINT) AS s2
        |  FROM spec GROUP BY 1)
        |SELECT doc_id, n_tokens, vocab, v1, v2,
        |  round(10000.0e0 * CAST(s2 - n_tokens AS DOUBLE) /
        |    (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
        |    AS yule_k,
        |  round(CAST(v2 AS DOUBLE) / CAST(vocab AS DOUBLE), 6) AS sichel_s,
        |  round(CAST(v1 AS DOUBLE) / CAST(vocab AS DOUBLE), 6)
        |    AS hapax_share,
        |  round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr
        |FROM a ORDER BY doc_id""".stripMargin,

    // the iv5 BM25 chain replayed per query (shared toks/st/t CTEs),
    // occurrence-bar relevance, exact overlap counts, one division per
    // metric
    "iv7_mrr" -> {
      def qblock(i: Int, terms: Seq[String], minOcc: Long, k: Int): String = {
        val tl = terms.map(t => s"'$t'").mkString(", ")
        s"""tf_$i AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
           |  WHERE w IN ($tl) GROUP BY 1, 2, 3),
           |df_$i AS (SELECT w, CAST(count(*) AS BIGINT) AS df
           |          FROM tf_$i GROUP BY 1),
           |sc_$i AS (
           |  SELECT tf_$i.doc_id,
           |    round(ln(1.0e0 + (st.n - df_$i.df + 0.5e0) /
           |        (df_$i.df + 0.5e0)) *
           |      (tf_$i.tf * (1.2e0 + 1.0e0)) /
           |      (tf_$i.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * tf_$i.dl /
           |        (CAST(st.sdl AS DOUBLE) / st.n))), 9) AS s
           |  FROM tf_$i JOIN df_$i USING (w) CROSS JOIN st),
           |agg_$i AS (
           |  SELECT doc_id,
           |    round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE), 6)
           |      AS score
           |  FROM sc_$i GROUP BY 1),
           |ranked_$i AS (
           |  SELECT doc_id,
           |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
           |      AS rank
           |  FROM agg_$i ORDER BY score DESC, doc_id LIMIT $k),
           |rel_$i AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, CAST(count(*) AS BIGINT) AS occ FROM t
           |    WHERE w IN ($tl) GROUP BY 1)
           |  WHERE occ >= $minOcc),
           |nrel_$i AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant
           |            FROM rel_$i),
           |met_$i AS (
           |  SELECT CAST(SUM(CASE WHEN rel_$i.doc_id IS NOT NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS rel_in_topk,
           |    MIN(CASE WHEN rel_$i.doc_id IS NOT NULL
           |      THEN ranked_$i.rank END) AS first_rel_rank
           |  FROM ranked_$i LEFT JOIN rel_$i
           |    ON rel_$i.doc_id = ranked_$i.doc_id)""".stripMargin
      }
      def qsel(i: Int, qname: String, k: Int): String =
        s"""SELECT '$qname' AS query, $k AS k, nrel_$i.n_relevant,
           |  met_$i.rel_in_topk, met_$i.first_rel_rank,
           |  round(coalesce(1.0e0 / CAST(met_$i.first_rel_rank AS DOUBLE),
           |    0.0e0), 6) AS mrr,
           |  round(CAST(met_$i.rel_in_topk AS DOUBLE) / $k.0e0, 6) AS p_at_k,
           |  CASE WHEN nrel_$i.n_relevant > 0 THEN
           |    round(CAST(met_$i.rel_in_topk AS DOUBLE) /
           |      CAST(nrel_$i.n_relevant AS DOUBLE), 6) END AS recall_at_k
           |FROM met_$i CROSS JOIN nrel_$i""".stripMargin
      val qs = Seq(("q1", Seq("hash", "join", "vector"), 12L),
        ("q2", Seq("stream", "window"), 8L),
        ("q3", Seq("slow", "fast"), 8L))
      val blocks = qs.zipWithIndex
        .map { case ((_, t, m), i) => qblock(i, t, m, 10) }.mkString(",\n")
      val sels = qs.zipWithIndex
        .map { case ((n, _, _), i) => qsel(i, n, 10) }
        .mkString("\nUNION ALL\n")
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> x <> '') AS l
         |  FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(len(l)) AS BIGINT) AS sdl FROM toks),
         |t AS (SELECT doc_id, len(l) AS dl, unnest(l) AS w FROM toks),
         |$blocks
         |$sels
         |ORDER BY query""".stripMargin
    },

    // the planted rewrite replayed (replace = Spark's translate for a
    // single char), then the character-class length differences — DuckDB
    // regexp_replace needs the 'g' flag or it strips ONE match
    "t38_code_detect" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |         THEN 'if (' || replace(text, ' ', '_') || ') { return 0; }'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
        |      AS BIGINT) AS sym_n,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[{}()\[\];=<>]', '', 'g'))
        |      AS BIGINT) AS code_n
        |  FROM planted),
        |r AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN n_chars > 0 THEN
        |      round(CAST(sym_n AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    END AS symbol_ratio,
        |    CASE WHEN n_chars > 0 THEN
        |      round(CAST(code_n AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    END AS code_ratio
        |  FROM m)
        |SELECT doc_id, n_chars, symbol_ratio, code_ratio,
        |  coalesce(code_ratio >= 0.02e0, false) AS is_code
        |FROM r ORDER BY doc_id""".stripMargin,

    // the iv2 ranking replayed verbatim, then the feedback vote: r over
    // the top-10 semi-join, df over candidate terms only, weight = the
    // EXACT decimal r × idf₉ (re-rounding the product in doubles is the
    // o46 boundary trap)
    "iv6_prf" ->
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
        |top AS (SELECT doc_id FROM agg ORDER BY score DESC, doc_id LIMIT 10),
        |tw AS (SELECT DISTINCT doc_id, w FROM t),
        |r AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS r
        |  FROM tw JOIN top USING (doc_id)
        |  WHERE w NOT IN ('hash', 'join', 'vector') GROUP BY 1),
        |dfc AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tw
        |  WHERE w IN (SELECT w FROM r) GROUP BY 1),
        |sc2 AS (
        |  SELECT r.w AS term, r.r, dfc.df,
        |    CAST(CAST(r.r AS DECIMAL(18,0)) *
        |      CAST(round(ln(1.0e0 + (st.n - dfc.df + 0.5e0) /
        |        (dfc.df + 0.5e0)), 9) AS DECIMAL(18,9)) AS DOUBLE)
        |      AS weight
        |  FROM r JOIN dfc ON dfc.w = r.w CROSS JOIN st)
        |SELECT term, r, df, weight,
        |  CAST(row_number() OVER (ORDER BY weight DESC, term) AS INT)
        |    AS rank
        |FROM sc2 ORDER BY weight DESC, term LIMIT 10""".stripMargin,

    // the iv2 ranking replayed verbatim; the discount ladder is the
    // operator's own driver literals; 9-rounded terms DECIMAL-summed
    "iv5_ndcg" -> {
      val disc = graft.operators.TextAnalysis.ndcgDiscountLiterals(10)
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
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
         |ranked AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         |      AS rank
         |  FROM agg ORDER BY score DESC, doc_id LIMIT 10),
         |rels AS (
         |  SELECT doc_id, least(10, CAST(COUNT(*) AS BIGINT)) AS rel
         |  FROM t WHERE w IN ('hash', 'join', 'vector') GROUP BY 1),
         |dcg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranked,
         |    SUM(CAST(round(CAST(coalesce(rels.rel, 0) AS DOUBLE) *
         |      ([$disc])[ranked.rank], 9) AS DECIMAL(28,9))) AS d
         |  FROM ranked LEFT JOIN rels ON rels.doc_id = ranked.doc_id),
         |ideal AS (
         |  SELECT SUM(CAST(round(CAST(rel AS DOUBLE) * ([$disc])[rn], 9)
         |    AS DECIMAL(28,9))) AS i
         |  FROM (
         |    SELECT rel,
         |      CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS INT)
         |        AS rn
         |    FROM (SELECT * FROM rels ORDER BY rel DESC, doc_id LIMIT 10))),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_graded FROM rels)
         |SELECT 10 AS k, n_ranked, n_graded,
         |  round(coalesce(CAST(d AS DOUBLE), 0.0e0), 6) AS dcg,
         |  round(coalesce(CAST(i AS DOUBLE), 0.0e0), 6) AS idcg,
         |  CASE WHEN i IS NOT NULL AND i > 0 THEN
         |    round(coalesce(CAST(d AS DOUBLE), 0.0e0) / CAST(i AS DOUBLE), 6)
         |  END AS ndcg
         |FROM dcg CROSS JOIN ideal CROSS JOIN g""".stripMargin
    },

    // one lang-keyed agg; len() counts characters in both engines
    // per-(term, doc) exact counts; VMR fixed double sequences on exact
    // sums; rank over the capped top-20 frame
    "t35_burstiness" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |d AS (SELECT CAST(COUNT(*) AS BIGINT) AS dd FROM base),
        |pd AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(l) AS term FROM base)
        |  GROUP BY 1, 2),
        |pt AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq,
        |    CAST(SUM(c) AS BIGINT) AS total,
        |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
        |      AS DOUBLE) AS s2
        |  FROM pd GROUP BY 1),
        |top AS (SELECT * FROM pt ORDER BY total DESC, term LIMIT 20),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY total DESC, term)
        |    AS INTEGER) AS rank
        |  FROM top)
        |SELECT rank, term, total, doc_freq,
        |  round(CAST(total AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS mean,
        |  CASE WHEN dd > 1 AND total > 0 THEN
        |    round((CAST(dd AS DOUBLE) * s2 -
        |      CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) /
        |      (CAST(dd AS DOUBLE) * (CAST(dd AS DOUBLE) - 1.0e0)) /
        |      (CAST(total AS DOUBLE) / CAST(dd AS DOUBLE)), 6)
        |  END AS vmr
        |FROM rk CROSS JOIN d ORDER BY rank""".stripMargin,

    // K×P densified grid (absent cells contribute exp_p); per-part
    // terms 9-rounded through DECIMAL(28,9)
    "t36_dispersion" ->
      """WITH base AS (
        |  SELECT source AS p,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |parts AS (SELECT p, CAST(SUM(len(l)) AS BIGINT) AS ptok
        |  FROM base GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ptok) AS BIGINT) AS t FROM parts),
        |tp AS (
        |  SELECT term, p, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT p, unnest(l) AS term FROM base) GROUP BY 1, 2),
        |tt AS (SELECT term, CAST(SUM(c) AS BIGINT) AS total FROM tp
        |  GROUP BY 1),
        |top AS (SELECT * FROM tt ORDER BY total DESC, term LIMIT 20),
        |grid AS (
        |  SELECT top.term, top.total, parts.p, parts.ptok, tp.c
        |  FROM top CROSS JOIN parts
        |  LEFT JOIN tp ON tp.term = top.term AND tp.p = parts.p),
        |dpt AS (
        |  SELECT term, total, CAST(SUM(CAST(round(abs(
        |    CAST(coalesce(c, 0) AS DOUBLE) / CAST(total AS DOUBLE) -
        |    CAST(ptok AS DOUBLE) / CAST(t AS DOUBLE)), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) AS dpv
        |  FROM grid CROSS JOIN tot GROUP BY 1, 2)
        |SELECT CAST(row_number() OVER (ORDER BY total DESC, term)
        |    AS INTEGER) AS rank,
        |  term, total, round(0.5e0 * dpv, 6) AS dp
        |FROM dpt ORDER BY rank""".stripMargin,

    // bigram-corpus margins (first/second position), row-local 2×2
    // cells with 6-rounded lns, top-20 by G²
    "t37_colloc" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |pairs AS (
        |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM (SELECT unnest([l[i] || ' ' || l[i+1]
        |          FOR i IN range(1, len(l))]) AS g
        |        FROM toks)
        |  GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM pairs
        |  GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM pairs
        |  GROUP BY 1),
        |nn AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM pairs),
        |j AS (
        |  SELECT p.a, p.b, p.c_ab, ca.c_a, cb.c_b, nn.n
        |  FROM pairs p JOIN ca ON ca.a = p.a JOIN cb ON cb.b = p.b
        |  CROSS JOIN nn
        |  WHERE p.c_ab >= 5),
        |sc AS (
        |  SELECT a, b, c_ab, c_a, c_b,
        |    round(2.0e0 * (
        |      CASE WHEN c_ab > 0 THEN CAST(c_ab AS DOUBLE) *
        |        round(ln(CAST(c_ab AS DOUBLE) /
        |          (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE) /
        |           CAST(n AS DOUBLE))), 6)
        |      ELSE CAST(0 AS DOUBLE) END +
        |      CASE WHEN c_a - c_ab > 0 THEN CAST(c_a - c_ab AS DOUBLE) *
        |        round(ln(CAST(c_a - c_ab AS DOUBLE) /
        |          (CAST(c_a AS DOUBLE) *
        |           (CAST(n AS DOUBLE) - CAST(c_b AS DOUBLE)) /
        |           CAST(n AS DOUBLE))), 6)
        |      ELSE CAST(0 AS DOUBLE) END +
        |      CASE WHEN c_b - c_ab > 0 THEN CAST(c_b - c_ab AS DOUBLE) *
        |        round(ln(CAST(c_b - c_ab AS DOUBLE) /
        |          ((CAST(n AS DOUBLE) - CAST(c_a AS DOUBLE)) *
        |           CAST(c_b AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |      ELSE CAST(0 AS DOUBLE) END +
        |      CASE WHEN n - c_a - c_b + c_ab > 0 THEN
        |        CAST(n - c_a - c_b + c_ab AS DOUBLE) *
        |        round(ln(CAST(n - c_a - c_b + c_ab AS DOUBLE) /
        |          ((CAST(n AS DOUBLE) - CAST(c_a AS DOUBLE)) *
        |           (CAST(n AS DOUBLE) - CAST(c_b AS DOUBLE)) /
        |           CAST(n AS DOUBLE))), 6)
        |      ELSE CAST(0 AS DOUBLE) END), 6) AS g2
        |  FROM j),
        |top AS (SELECT * FROM sc ORDER BY g2 DESC, a, b LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY g2 DESC, a, b)
        |    AS INTEGER) AS rank,
        |  a, b, c_ab, c_a, c_b, g2
        |FROM top ORDER BY rank""".stripMargin,

    // positions via 1-based list comprehensions (the iv3 idiom), pair
    // distances by doc-keyed join — 0- vs 1-based origins cancel in
    // the differences
    "iv9_proximity" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT doc_id, unnest([i FOR i IN range(1, len(toks) + 1)
        |    IF toks[CAST(i AS INT)] = 'data']) AS pa
        |  FROM d),
        |q AS (
        |  SELECT doc_id, unnest([i FOR i IN range(1, len(toks) + 1)
        |    IF toks[CAST(i AS INT)] = 'query']) AS pb
        |  FROM d),
        |j AS (
        |  SELECT p.doc_id, abs(p.pa - q.pb) AS dist
        |  FROM p JOIN q ON p.doc_id = q.doc_id
        |  WHERE abs(p.pa - q.pb) <= 5)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(MIN(dist) AS BIGINT) AS min_distance
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // two integer sums close the whole statistic:
    // Σ(a²+(m−a)²) = 2Σa² − 2mΣa + Nm²; κ from the UNROUNDED pair
    "t44_filter_kappa" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS l, n_chars
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (
        |  SELECT (CAST(len(l) AS BIGINT) >= 40) AS r_len,
        |    (n_chars >= 250) AS r_chars,
        |    (CAST(len(list_distinct(l)) AS DOUBLE) /
        |      CAST(len(l) AS DOUBLE) >= 0.55e0) AS r_ttr
        |  FROM toks),
        |b AS (
        |  SELECT CASE WHEN r_len THEN 1 ELSE 0 END +
        |    CASE WHEN r_chars THEN 1 ELSE 0 END +
        |    CASE WHEN r_ttr THEN 1 ELSE 0 END AS a
        |  FROM d
        |  WHERE r_len IS NOT NULL AND r_chars IS NOT NULL
        |    AND r_ttr IS NOT NULL),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(coalesce(SUM(a), 0) AS BIGINT) AS sa,
        |    CAST(coalesce(SUM(a * a), 0) AS BIGINT) AS sa2
        |  FROM b),
        |x AS (
        |  SELECT n_items, sa, sa2,
        |    CAST(sa AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0e0) AS p,
        |    (2.0e0 * CAST(sa2 AS DOUBLE) -
        |      2.0e0 * 3.0e0 * CAST(sa AS DOUBLE) +
        |      CAST(n_items AS DOUBLE) * 3.0e0 * 3.0e0 -
        |      CAST(n_items AS DOUBLE) * 3.0e0) /
        |      (CAST(n_items AS DOUBLE) * 3.0e0 * (3.0e0 - 1.0e0)) AS pbar
        |  FROM s),
        |y AS (
        |  SELECT n_items, p, pbar,
        |    p * p + (1.0e0 - p) * (1.0e0 - p) AS pe
        |  FROM x)
        |SELECT n_items, 3 AS m_raters,
        |  CASE WHEN n_items > 0 THEN round(p, 6) END AS p_pass,
        |  CASE WHEN n_items > 0 THEN round(pbar, 6) END AS p_bar,
        |  CASE WHEN n_items > 0 THEN round(pe, 6) END AS p_e,
        |  CASE WHEN n_items > 0 AND pe < 1.0e0 THEN
        |    round((pbar - pe) / (1.0e0 - pe), 6) END AS kappa
        |FROM y""".stripMargin,

    // AND = distinct-hit count equals |must|, NOT = anti-semi on the
    // excluded doc set; all counts exact
    "iv8_boolean" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))
        |    AS token
        |  FROM documents WHERE doc_id IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    CAST(COUNT(DISTINCT token) AS BIGINT) AS hits,
        |    CAST(COUNT(*) AS BIGINT) AS n_must_occurrences
        |  FROM toks WHERE token IN ('data', 'query')
        |  GROUP BY 1),
        |x AS (SELECT DISTINCT doc_id FROM toks WHERE token = 'dup')
        |SELECT m.doc_id, m.n_must_occurrences
        |FROM m LEFT JOIN x ON x.doc_id = m.doc_id
        |WHERE m.hits = 2 AND x.doc_id IS NULL
        |ORDER BY m.doc_id""".stripMargin,

    // the t37 margin CTEs verbatim; the score is one exact BIGINT
    // product difference over N·sqrt(c_ab)
    "t42_tscore" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |pairs AS (
        |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM (SELECT unnest([l[i] || ' ' || l[i+1]
        |          FOR i IN range(1, len(l))]) AS g
        |        FROM toks)
        |  GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM pairs
        |  GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM pairs
        |  GROUP BY 1),
        |nn AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM pairs),
        |j AS (
        |  SELECT p.a, p.b, p.c_ab, ca.c_a, cb.c_b, nn.n
        |  FROM pairs p JOIN ca ON ca.a = p.a JOIN cb ON cb.b = p.b
        |  CROSS JOIN nn
        |  WHERE p.c_ab >= 5),
        |sc AS (
        |  SELECT a, b, c_ab, c_a, c_b,
        |    round(CAST(c_ab * n - c_a * c_b AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * sqrt(CAST(c_ab AS DOUBLE))), 6)
        |      AS t_score
        |  FROM j),
        |top AS (SELECT * FROM sc ORDER BY t_score DESC, a, b LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY t_score DESC, a, b)
        |    AS INTEGER) AS rank,
        |  a, b, c_ab, c_a, c_b, t_score
        |FROM top ORDER BY rank""".stripMargin,

    // markers rebuilt from chr() codepoints (no raw control bytes in
    // the SQL); occurrence counts are length-difference arithmetic
    "t43_mojibake" ->
      """WITH src AS (
        |  SELECT CASE
        |    WHEN doc_id % 7 = 3 THEN
        |      replace(text, 'e', chr(195) || chr(169))
        |    WHEN doc_id % 7 = 5 THEN
        |      text || ' ' || chr(226) || chr(128) || chr(153)
        |    WHEN doc_id % 11 = 0 THEN text || chr(65533)
        |    ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |m(name, marker) AS (
        |  VALUES ('latin1_eacute', chr(195) || chr(169)),
        |         ('win1252_rsquo', chr(226) || chr(128) || chr(153)),
        |         ('replacement_char', chr(65533))),
        |x AS (
        |  SELECT name, CAST((len(text) - len(replace(text, marker, ''))) /
        |    len(marker) AS BIGINT) AS occ
        |  FROM src CROSS JOIN m),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM src)
        |SELECT name AS marker,
        |  CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs,
        |  CAST(SUM(occ) AS BIGINT) AS n_occurrences,
        |  total AS n_total_docs,
        |  CASE WHEN total > 0 THEN
        |    round(CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS DOUBLE) /
        |      CAST(total AS DOUBLE), 6) END AS doc_share
        |FROM x CROSS JOIN t GROUP BY name, total
        |ORDER BY marker""".stripMargin,

    "t34_fertility" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)),
        |      '\s+'), x -> x <> '')) AS BIGINT) AS tok,
        |    CAST(len(text) AS BIGINT) AS ch
        |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(ch) AS BIGINT) AS n_chars,
        |  CASE WHEN SUM(tok) > 0 THEN
        |    round(CAST(SUM(ch) AS DOUBLE) / CAST(SUM(tok) AS DOUBLE), 6)
        |  END AS chars_per_token,
        |  round(CAST(SUM(tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS tokens_per_doc
        |FROM t GROUP BY 1 ORDER BY lang""".stripMargin,

    // one conditional-sum pass per rung, unioned; shares against the
    // rung-0 baseline
    "pipe14_quality_sweep" -> {
      def branch(t: Int): String =
        s"""SELECT $t AS min_tokens,
           |    CAST(SUM(CASE WHEN tok >= $t THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_docs,
           |    CAST(SUM(CASE WHEN tok >= $t THEN tok ELSE 0 END) AS BIGINT)
           |      AS n_tokens
           |  FROM t""".stripMargin
      s"""WITH t AS (
         |  SELECT CAST(len(list_filter(string_split_regex(lower(trim(text)),
         |    '\\s+'), x -> x <> '')) AS BIGINT) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS td,
         |        CAST(SUM(tok) AS BIGINT) AS tt FROM t),
         |u AS (
         |  ${TextQueries.qualityThresholds.map(branch).mkString("\n  UNION ALL\n  ")})
         |SELECT min_tokens, n_docs, n_tokens,
         |  round(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 6)
         |    AS doc_share,
         |  round(CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE), 6)
         |    AS token_share
         |FROM u CROSS JOIN tot ORDER BY min_tokens""".stripMargin
    },

    // distinct (source, bigram) sets via the positional spine, pair
    // overlap per SHARED bigram, exact set sizes, one closing division
    "t33_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents
        |  WHERE source IS NOT NULL AND doc_id IS NOT NULL
        |    AND text IS NOT NULL),
        |bg AS (
        |  SELECT DISTINCT source, l[g.i] || ' ' || l[g.i + 1] AS b
        |  FROM toks CROSS JOIN (
        |    SELECT unnest(generate_series(1,
        |      (SELECT MAX(len(l)) FROM toks) - 1)) AS i) g
        |  WHERE g.i <= len(l) - 1),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM bg GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS group_a, b.source AS group_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM bg a JOIN bg b ON a.b = b.b AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT group_a, group_b, x.n AS n_a, y.n AS n_b, n_common,
        |  round(CAST(n_common AS DOUBLE) /
        |    CAST(x.n + y.n - n_common AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sz x ON x.source = group_a
        |JOIN sz y ON y.source = group_b
        |ORDER BY group_a, group_b""".stripMargin,

    // word-internal 2-grams via a max-length index spine; exact counts,
    // the same (n DESC, pair) deterministic limit boundary
    "t32_bpe_step" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
        |    '\s+'), x -> x <> '')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |w2 AS (SELECT w FROM t WHERE len(w) >= 2),
        |p AS (
        |  SELECT substr(w, g.i, 2) AS pair
        |  FROM w2 CROSS JOIN (
        |    SELECT unnest(generate_series(1,
        |      (SELECT MAX(len(w)) FROM w2) - 1)) AS i) g
        |  WHERE g.i <= len(w) - 1),
        |c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1)
        |SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // one source-keyed agg + literal target CASE; floor() before the
    // BIGINT cast (CAST alone rounds in DuckDB)
    "pipe12_mixture" -> {
      val targetCase = TextQueries.mixtureTargets
        .map { case (s, t) => s"WHEN source = '$s' THEN ${t}e0" }
        .mkString(" ")
      s"""WITH per AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_units,
         |    CAST(SUM(CAST(len(list_filter(
         |      string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE source IS NOT NULL AND text IS NOT NULL
         |  GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per),
         |sel AS (
         |  SELECT source, n_units, n_tokens,
         |    CASE WHEN tot > 0 THEN
         |      round(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         |    END AS share,
         |    CASE $targetCase END AS target_share, tot
         |  FROM per CROSS JOIN t)
         |SELECT source, n_units, n_tokens, share, target_share,
         |  CASE WHEN target_share IS NOT NULL AND share > 0 THEN
         |    round(target_share / share, 6) END AS weight,
         |  CASE WHEN target_share IS NOT NULL AND tot > 0 THEN
         |    CAST(floor(target_share * CAST(tot AS DOUBLE)) AS BIGINT)
         |  END AS projected_tokens
         |FROM sel ORDER BY source""".stripMargin
    },

    // p(t|C) parenthesized exactly as the operator (mu * (cf / ct) —
    // (mu*cf)/ct would round differently); missing tf coalesces to 0
    "iv4_qld" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM toks),
        |ct AS (SELECT CAST(sum(len(l)) AS BIGINT) AS ct FROM toks),
        |t AS (SELECT doc_id, unnest(l) AS w FROM toks),
        |occ AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM t
        |        WHERE w IN ('hash', 'join', 'vector') GROUP BY 1),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t
        |       WHERE w IN ('hash', 'join', 'vector') GROUP BY 1, 2),
        |sc AS (
        |  SELECT dl.doc_id,
        |    round(ln((CAST(coalesce(tf.tf, 0) AS DOUBLE) +
        |              2000.0e0 * (CAST(occ.cf AS DOUBLE) / CAST(ct.ct AS DOUBLE))) /
        |             (CAST(dl.dl AS DOUBLE) + 2000.0e0)), 9) AS s
        |  FROM dl CROSS JOIN occ CROSS JOIN ct
        |  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.w = occ.w),
        |agg AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        |FROM agg ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // df/occ from the full counts; postings = the 5 lowest doc ids per
    // token, joined with '|' exactly like the Spark side
    "iv1_inverted" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS token
        |  FROM documents),
        |per AS (SELECT token, doc_id, count(*) AS occ FROM toks GROUP BY 1, 2),
        |stats AS (SELECT token, count(*) AS df,
        |            CAST(sum(occ) AS BIGINT) AS occurrences
        |          FROM per GROUP BY 1),
        |capped AS (
        |  SELECT token, array_to_string(list(doc_id ORDER BY doc_id), '|') AS postings
        |  FROM (
        |    SELECT token, doc_id,
        |      row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |    FROM per)
        |  WHERE rn <= 5 GROUP BY 1)
        |SELECT s.token, s.df, s.occurrences, c.postings
        |FROM stats s JOIN capped c USING (token)
        |ORDER BY s.token""".stripMargin,

    // vocab = ORDER BY count DESC, token LIMIT 20 (the same deterministic
    // tie-break), then per-doc occurrence counting over a left join
    "t14_oov" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS c FROM toks GROUP BY 1
        |    ORDER BY c DESC, token LIMIT 20)),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    count(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON v.token = t.token
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(p.n_tokens, 0) AS n_tokens,
        |  coalesce(p.n_oov, 0) AS n_oov,
        |  round(CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0e0
        |        ELSE CAST(p.n_oov AS DOUBLE) / p.n_tokens END, 6) AS oov_rate
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // hash order and inclusive running sum replayed with the portable-MD5
    // fold; the budget is rebuilt from the source index — the cum is
    // monotone, so cum <= budget is the same strict prefix on both sides
    // exact integer ratios through the o52 p·ln p firewall; bigrams by
    // position slices, predecessor totals from the bigram frame
    "t31_entropy_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |uni AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(l) AS w FROM toks) GROUP BY 1),
        |ut AS (SELECT CAST(SUM(c) AS BIGINT) AS n1,
        |              CAST(COUNT(*) AS BIGINT) AS vocab FROM uni),
        |bi AS (
        |  SELECT l[i] AS w1, l[i + 1] AS w2,
        |    CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM toks WHERE len(l) >= 2)
        |  GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bi
        |       GROUP BY 1),
        |bt AS (SELECT CAST(SUM(c2) AS BIGINT) AS n2 FROM bi),
        |h1 AS (
        |  SELECT SUM(CAST(round((CAST(c AS DOUBLE) / CAST(ut.n1 AS DOUBLE))
        |      * round(ln(CAST(c AS DOUBLE) / CAST(ut.n1 AS DOUBLE)), 9),
        |      9) AS DECIMAL(28,9))) AS s1
        |  FROM uni CROSS JOIN ut),
        |h2 AS (
        |  SELECT SUM(CAST(round(
        |      (CAST(bi.c2 AS DOUBLE) / CAST(bt.n2 AS DOUBLE)) *
        |      round(ln(CAST(bi.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)), 9),
        |      9) AS DECIMAL(28,9))) AS s2
        |  FROM bi JOIN c1 ON c1.w1 = bi.w1 CROSS JOIN bt)
        |SELECT ut.n1 AS n_tokens, bt.n2 AS n_bigrams, ut.vocab,
        |  round(-CAST(h1.s1 AS DOUBLE), 6) AS h_unigram,
        |  round(-CAST(h2.s2 AS DOUBLE), 6) AS h_bigram_cond,
        |  CASE WHEN round(-CAST(h1.s1 AS DOUBLE), 6) > 0 THEN
        |    round(1.0e0 - round(-CAST(h2.s2 AS DOUBLE), 6) /
        |      round(-CAST(h1.s1 AS DOUBLE), 6), 6) END AS redundancy
        |FROM ut CROSS JOIN bt CROSS JOIN h1 CROSS JOIN h2""".stripMargin,

    // position-sliced trigrams, distinct per doc, min-doc first-seen
    "t30_originality" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |g AS (
        |  SELECT DISTINCT doc_id AS id, gram FROM (
        |    SELECT doc_id,
        |      l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS gram
        |    FROM (SELECT doc_id, l,
        |            unnest(generate_series(1, len(l) - 2)) AS i
        |          FROM toks WHERE len(l) >= 3))),
        |f AS (SELECT gram, MIN(id) AS fst FROM g GROUP BY 1)
        |SELECT g.id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN f.fst = g.id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_first,
        |  round(CAST(SUM(CASE WHEN f.fst = g.id THEN 1 ELSE 0 END)
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS originality
        |FROM g JOIN f ON f.gram = g.gram
        |GROUP BY 1 ORDER BY id""".stripMargin,

    // frequency agg + rung ladder; thresholds, never top-k ranks
    "t29_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
        |    '\s+'), x -> x <> '')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS tot FROM f),
        |l AS (SELECT unnest([2, 5, 10, 50]) AS min_freq)
        |SELECT l.min_freq, CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(f.f) AS BIGINT) AS token_mass,
        |  round(CAST(SUM(f.f) AS DOUBLE) / CAST(MAX(tot.tot) AS DOUBLE), 6)
        |    AS share
        |FROM f CROSS JOIN l CROSS JOIN tot
        |WHERE f.f >= l.min_freq GROUP BY 1 ORDER BY 1""".stripMargin,

    // the t24 scored CTE + exact-integer marginal products; κ is one
    // BIGINT-ratio double division
    "o60_kappa" ->
      s"""WITH scored AS (
         |  SELECT lang AS actual,
         |    (SELECT CASE WHEN max(s.sc) > 0
         |            THEN first(s.lg ORDER BY s.sc DESC, s.lg ASC)
         |            ELSE 'und' END
         |     FROM (SELECT unnest([${Seq("de", "en", "es", "fr").map(profileSql).mkString(", ")}],
         |                  recursive := true)) s(sc, lg)) AS predicted
         |  FROM (SELECT lang,
         |          list_distinct(list_filter(
         |            string_split_regex(lower(trim(text)), '\\s+'),
         |            t -> t <> '')) AS toks
         |        FROM documents WHERE lang IS NOT NULL)),
         |cells AS (
         |  SELECT actual AS a, predicted AS b, CAST(COUNT(*) AS BIGINT)
         |    AS n
         |  FROM scored GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
         |      AS diag
         |  FROM cells),
         |marg AS (
         |  SELECT CAST(COALESCE(SUM(ra.r * cb.c), 0) AS BIGINT) AS src
         |  FROM (SELECT a, CAST(SUM(n) AS BIGINT) AS r FROM cells
         |        GROUP BY 1) ra
         |  JOIN (SELECT b, CAST(SUM(n) AS BIGINT) AS c FROM cells
         |        GROUP BY 1) cb ON cb.b = ra.a)
         |SELECT tot.n,
         |  round(CAST(diag AS DOUBLE) / CAST(tot.n AS DOUBLE), 6) AS po,
         |  round(CAST(src AS DOUBLE) / CAST(tot.n * tot.n AS DOUBLE), 6)
         |    AS pe,
         |  CASE WHEN tot.n * tot.n - src > 0 THEN
         |    round(CAST(tot.n * diag - src AS DOUBLE) /
         |      CAST(tot.n * tot.n - src AS DOUBLE), 6) END AS kappa
         |FROM tot CROSS JOIN marg""".stripMargin,

    // the sa6 hash-order replay partitioned by the hash shard; bin and
    // straddle read the exclusive prefix with integer div/mod
    "pipe9_seqpack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)),
        |      '\s+'), x -> x <> '')) AS BIGINT) AS tok,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('pack:' ||
        |          COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS h
        |  FROM documents WHERE doc_id IS NOT NULL),
        |c AS (
        |  SELECT doc_id, tok, h % 4 AS shard,
        |    COALESCE(CAST(SUM(tok) OVER (PARTITION BY h % 4
        |      ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS strt
        |  FROM t)
        |SELECT shard, strt // 1024 AS bin, CAST(COUNT(*) AS BIGINT)
        |    AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS tokens,
        |  CAST(SUM(CASE WHEN strt % 1024 + tok > 1024 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_straddle,
        |  round(CAST(SUM(tok) AS DOUBLE) / 1024.0e0, 6) AS fill_rate
        |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,

    "sa6_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tokens,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c
        |WHERE cum_tokens <= 300 + (CAST(substr(source, 4) AS INT) % 4) * 100
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,

    // weight rebuilt from the source index; the extra-epoch line is
    // h < floor(frac(w)·2^56) with the truncating floor spelled out
    // (DuckDB CAST double→BIGINT rounds-to-nearest, Scala toLong
    // truncates — floor() makes them agree); range(0, n) is empty at
    // n = 0, dropping w<1 misses exactly like the operator's explode
    "sa5_epochs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    0.25e0 + (CAST(substr(source, 4) AS INT) % 8) * 0.5e0 AS w,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('mix:' || coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS h
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source,
        |    CAST(floor(w) AS BIGINT) +
        |    CASE WHEN h < CAST(floor((w - floor(w)) * 72057594037927936.0e0) AS BIGINT)
        |         THEN 1 ELSE 0 END AS n
        |  FROM d)
        |SELECT doc_id, source, unnest(range(0, n)) AS epoch
        |FROM n ORDER BY doc_id, epoch""".stripMargin,

    // trigrams deduped as STRINGS first, hashed second (exactly the
    // operator's array_distinct-then-hash order, so even a hash collision
    // inside one doc replays identically); probe set = distinct hashes of
    // the doc_id % 97 = 0 docs; flag compares the UNROUNDED fraction
    "t13_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS l
        |  FROM documents),
        |dg AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                           FOR i IN range(1, len(l) - 1)]) AS g
        |    FROM toks)),
        |gh AS (
        |  SELECT doc_id,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('dc:' || g), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS h
        |  FROM dg),
        |p AS (SELECT DISTINCT h FROM gh WHERE doc_id % 97 = 0),
        |c AS (
        |  SELECT gh.doc_id, count(*) AS n_ngrams, count(p.h) AS n_contaminated
        |  FROM gh LEFT JOIN p ON p.h = gh.h
        |  GROUP BY 1),
        |s AS (
        |  SELECT d.doc_id,
        |    coalesce(c.n_ngrams, 0) AS n_ngrams,
        |    coalesce(c.n_contaminated, 0) AS n_contaminated,
        |    CASE WHEN coalesce(c.n_ngrams, 0) = 0 THEN 0.0e0
        |         ELSE CAST(c.n_contaminated AS DOUBLE) / c.n_ngrams END AS frac
        |  FROM documents d LEFT JOIN c USING (doc_id))
        |SELECT doc_id, n_ngrams, n_contaminated,
        |  round(frac, 6) AS contamination, frac >= 0.2e0 AS flagged
        |FROM s ORDER BY doc_id""".stripMargin,

    // sketch cells rebuilt via the portable-MD5 fold (the sa1/sa2 idiom):
    // bucket(r, tok) = first-14-hex-digit fold of md5('cms' || r || ':'
    // || tok) mod 16; estimates are min over rows with empty cells as 0
    "t12_cms" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS token
        |  FROM documents),
        |exact AS (SELECT token, count(*) AS exact_n FROM toks GROUP BY 1),
        |cells AS (
        |  SELECT r.r,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |                 FOR ch IN string_split(substr(md5('cms' || r.r || ':' || t.token), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 16 AS bucket,
        |    count(*) AS n
        |  FROM toks t CROSS JOIN range(2) r(r)
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT e.token, min(coalesce(c.n, 0)) AS cms_est
        |  FROM exact e CROSS JOIN range(2) r(r)
        |  LEFT JOIN cells c ON c.r = r.r AND c.bucket =
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |                 FOR ch IN string_split(substr(md5('cms' || r.r || ':' || e.token), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 16
        |  GROUP BY 1)
        |SELECT e.token, s.cms_est, e.exact_n
        |FROM exact e JOIN est s USING (token) ORDER BY token""".stripMargin,

    // the operator's two-pass MG+verify output is EXACTLY the tokens with
    // cnt·20 > n, so the oracle computes that set directly (identity proof)
    "sk5_heavyhitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS token
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt, n.n_total
        |FROM toks, n GROUP BY token, n.n_total
        |HAVING count(*) * 40 > n.n_total
        |ORDER BY token""".stripMargin,

    // same algebraic entropy form as the kernel: log2(n) − (Σ c·log2 c)/n,
    // log2 spelled ln·(1/ln 2) so both engines run the same IEEE ops;
    // c = 1 terms contribute exactly 0 and are skipped on both sides
    "t11_lexical" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS token
        |  FROM documents),
        |cnt AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |               CAST(count(*) AS BIGINT) AS nd,
        |               sum(CASE WHEN c > 1 THEN c * (ln(c) * (1.0 / ln(2))) ELSE 0 END) AS sc
        |        FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id,
        |  round(CASE WHEN coalesce(a.n, 0) > 0
        |        THEN ln(a.n) * (1.0 / ln(2)) - a.sc / a.n ELSE 0 END, 6) AS entropy,
        |  round(CASE WHEN coalesce(a.n, 0) > 0
        |        THEN CAST(a.nd AS DOUBLE) / a.n ELSE 0 END, 6) AS ttr,
        |  coalesce(a.nd, 0) AS n_distinct,
        |  coalesce(a.n, 0) AS n_tokens
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // N = min over domains of n_d·(1/w_d) — weights 1/2,1/4,1/4 make 1/w
    // the integers 2,4,4, so the whole computation is integer arithmetic
    // on both engines; quotas are N//2, N//4
    "sa4_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'web'
        |         WHEN doc_id % 3 = 1 THEN 'books'
        |         ELSE 'code' END AS domain
        |  FROM documents),
        |c AS (SELECT domain, count(*) AS n FROM d GROUP BY 1),
        |nn AS (SELECT min(CASE domain WHEN 'web' THEN n * 2 ELSE n * 4 END) AS n FROM c),
        |h AS (
        |  SELECT doc_id, domain,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |                 FOR ch IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM d),
        |ranked AS (
        |  SELECT doc_id, domain,
        |         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hv ASC, doc_id ASC) AS rn
        |  FROM h)
        |SELECT doc_id, domain FROM ranked, nn
        |WHERE rn <= (CASE domain WHEN 'web' THEN nn.n // 2 ELSE nn.n // 4 END)
        |ORDER BY domain, doc_id""".stripMargin,

    // same 56-bit-MD5 fold as sa1; sums cast back to BIGINT (DuckDB sums
    // to HUGEINT), // is integer division
    "t10_pack" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS n_tokens,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, hv % 8 AS shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY hv % 8
        |      ORDER BY hv ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM h)
        |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens, tok_offset,
        |  tok_offset // 256 AS bin_id, tok_offset % 256 AS bin_offset
        |FROM o ORDER BY doc_id""".stripMargin,

    "sa3_stratified" ->
      """WITH h AS (
        |  SELECT doc_id, doc_id % 5 AS stratum,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, stratum,
        |         ROW_NUMBER() OVER (PARTITION BY stratum
        |                            ORDER BY hv ASC, doc_id ASC) AS rn,
        |         COUNT(*) OVER (PARTITION BY stratum) AS n
        |  FROM h)
        |SELECT doc_id, stratum FROM ranked WHERE rn <= round(0.25 * n)
        |ORDER BY stratum, doc_id""".stripMargin,

    "sa2_capped_per_key" ->
      """WITH h AS (
        |  SELECT doc_id, doc_id % 7 AS klass,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, klass,
        |         ROW_NUMBER() OVER (PARTITION BY klass
        |                            ORDER BY hv ASC, doc_id ASC) AS rn
        |  FROM h)
        |SELECT doc_id, klass FROM ranked WHERE rn <= 10
        |ORDER BY klass, doc_id""".stripMargin,

    // same 56-bit-MD5 fold as the d6 simhash oracle; bucket bounds 8000 /
    // 9000 are the rounded cumulative weights
    // md5 draw = the pv2 salt||concat_ws idiom; range arithmetic all
    // BIGINT; candidate collisions with ANY of the user's positives
    // are anti-joined away on both sides
    "sa12_negatives" ->
      """WITH pos AS (
        |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS it
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |rng AS (SELECT CAST(MIN(p_partkey) AS BIGINT) AS lo,
        |               CAST(MAX(p_partkey) AS BIGINT) AS hi FROM part),
        |c AS (SELECT u, it, unnest(range(0, 3)) AS j FROM pos),
        |h AS (
        |  SELECT u, it, j,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('neg' ||
        |          concat_ws('|', CAST(u AS VARCHAR), CAST(it AS VARCHAR),
        |                    CAST(j AS VARCHAR))), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM c),
        |n AS (
        |  SELECT h.u, h.it, h.j, hv % (rng.hi - rng.lo + 1) + rng.lo AS neg_item
        |  FROM h CROSS JOIN rng)
        |SELECT u, it, j, neg_item
        |FROM n
        |WHERE NOT EXISTS (SELECT 1 FROM pos p
        |                  WHERE p.u = n.u AND p.it = n.neg_item)
        |ORDER BY u, it, j""".stripMargin,

    "sa11_kfold" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST((row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) - 1) % 5
        |       AS INT) AS fold
        |FROM h ORDER BY doc_id""".stripMargin,

    "sa1_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 10000 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // u = (h+1)/2^56 — both engines round the long->double conversion
    // identically; keys rounded at 9 with the id tie-break
    "sa8_weighted" ->
      """WITH h AS (
        |  SELECT doc_id, doc_id % 5 + 1 AS weight,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, weight,
        |    round(-ln(CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0) / weight, 9) AS skey
        |  FROM h)
        |SELECT doc_id, weight, skey,
        |  CAST(row_number() OVER (ORDER BY skey, doc_id) AS INT) AS rank
        |FROM s ORDER BY skey, doc_id LIMIT 50""".stripMargin,

    // the list_reduce seed quirk is benign: DuckDB starts the fold at the
    // first element where Spark starts at 0 — (0·31 + x₀) mod p = x₀ since
    // every ascii value sits below the modulus
    "t7_winnow" ->
      """WITH docs AS (
        |  SELECT doc_id, lower(trim(text)) AS t FROM documents
        |  WHERE doc_id % 20 = 0 AND length(lower(trim(text))) >= 5),
        |hs AS (
        |  SELECT doc_id,
        |    [list_reduce([CAST(ascii(c2) AS BIGINT) FOR c2 IN string_split(substr(t, CAST(i AS INT), 5), '')],
        |       (acc, x) -> (acc * 31 + x) % 2147483647)
        |     FOR i IN range(1, greatest(length(t) - 4, 1) + 1)] AS h
        |  FROM docs),
        |wins AS (
        |  SELECT doc_id,
        |    [list_min(h[CAST(i AS INT):CAST(i + 3 AS INT)])
        |     FOR i IN range(1, greatest(len(h) - 3, 1) + 1)] AS fps
        |  FROM hs)
        |SELECT doc_id, UNNEST(list_sort(list_distinct(fps))) AS fp
        |FROM wins ORDER BY doc_id, fp""".stripMargin,

    // rank and frequency logs round at 9 into DECIMAL(18,9) points; the
    // o11 closing sequence; the 500-rank cut is deterministic under the
    // (count desc, token asc) order
    // the t2 scored-subquery replay at BOTH levels (doc + 32-token
    // chunk slices, the t5 slice arithmetic); flags read the rounded ratio
    "t27_langmix" -> {
      val langSel =
        s"""(SELECT CASE WHEN max(s.sc) > 0
           |       THEN first(s.lg ORDER BY s.sc DESC, s.lg ASC)
           |       ELSE 'und' END
           |     FROM (SELECT unnest([${Seq("de", "en", "es", "fr")
                .map(profileSql).mkString(", ")}],
           |                  recursive := true)) s(sc, lg))""".stripMargin
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      t -> t <> '') AS t
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |doc AS (
         |  SELECT doc_id, $langSel AS doc_lang
         |  FROM (SELECT doc_id, list_distinct(t) AS toks FROM tk)),
         |idx AS (
         |  SELECT doc_id, t,
         |    UNNEST(range(0, CASE WHEN len(t) <= 0 THEN 0
         |                         ELSE (len(t) - 1) // 32 + 1 END)) AS i
         |  FROM tk),
         |cl AS (
         |  SELECT doc_id, $langSel AS cl
         |  FROM (SELECT doc_id,
         |          list_distinct(t[(i*32 + 1):least((i+1)*32, len(t))])
         |            AS toks
         |        FROM idx)),
         |g AS (
         |  SELECT c.doc_id, d.doc_lang,
         |    CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |    CAST(SUM(CASE WHEN c.cl = d.doc_lang THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_match
         |  FROM cl c JOIN doc d ON d.doc_id = c.doc_id GROUP BY 1, 2)
         |SELECT doc_id, doc_lang, n_chunks, n_match,
         |  round(1.0e0 - CAST(n_match AS DOUBLE) / CAST(n_chunks AS DOUBLE),
         |    6) AS mix_ratio,
         |  (round(1.0e0 - CAST(n_match AS DOUBLE) / CAST(n_chunks AS DOUBLE),
         |    6) > 0.25e0) AS is_mixed
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // exact BIGINT frequency moments; D and 1/D read the rounded D
    "t26_simpson" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
        |freq AS (
        |  SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |g AS (
        |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS num
        |  FROM freq GROUP BY 1),
        |s2 AS (
        |  SELECT lang, n_tokens, vocab,
        |    CASE WHEN n_tokens > 1 THEN
        |      round(CAST(num AS DOUBLE) /
        |        CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 6) END AS simpson
        |  FROM g)
        |SELECT lang, n_tokens, vocab, simpson,
        |  CASE WHEN simpson > 0 THEN round(1.0e0 / simpson, 6) END
        |    AS eff_vocab
        |FROM s2 ORDER BY lang""".stripMargin,

    "t19_zipf" ->
      """WITH vocab AS (
        |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        |    FROM documents) GROUP BY 1
        |  ORDER BY c DESC, token ASC LIMIT 500),
        |pts AS (
        |  SELECT
        |    CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, token ASC)
        |      AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
        |    CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
        |  FROM vocab),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,9)) * CAST(y AS DECIMAL(19,9)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,9)) * CAST(x AS DECIMAL(19,9)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,9)) * CAST(y AS DECIMAL(19,9)))
        |      AS DOUBLE) AS syy
        |  FROM pts),
        |f AS (
        |  SELECT n_ranks,
        |    CAST(n_ranks AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n_ranks AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n_ranks AS DOUBLE) * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM s)
        |SELECT n_ranks,
        |  CASE WHEN den > 0 THEN round(num / den, 6) END AS slope,
        |  CASE WHEN den > 0
        |       THEN round((sy - (num / den) * sx) / CAST(n_ranks AS DOUBLE), 6)
        |  END AS intercept,
        |  CASE WHEN den > 0 AND deny > 0
        |       THEN round(num * num / (den * deny), 6) END AS r2
        |FROM f""".stripMargin,

    // the t13 gram construction at n=4, DISTINCT (doc, gram) spread
    // counts, LEFT-join membership; one double division rounded at 6
    "t21_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
        |            FOR i IN range(1, len(l) - 2)]) AS gram
        |  FROM toks),
        |sd AS (SELECT DISTINCT doc_id, gram FROM g),
        |common AS (SELECT gram FROM sd GROUP BY 1 HAVING COUNT(*) >= 3),
        |j AS (
        |  SELECT g.doc_id, (c.gram IS NOT NULL) AS bp
        |  FROM g LEFT JOIN common c ON g.gram = c.gram)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |  round(CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS template_frac
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // identical regex run counts (RE2 ⊇ these patterns) and the identical
    // double sequence; counts stay exact BIGINTs, flesch rounds at 4
    "t20_readability" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
        |    AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |    AS n_sents,
        |  CAST(len(regexp_extract_all(text, '[AEIOUYaeiouy]+')) AS BIGINT)
        |    AS n_syll,
        |  CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) > 0 THEN
        |    round(206.835e0
        |      - 1.015e0 *
        |        (CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)
        |         / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |             AS DOUBLE))
        |      - 84.6e0 *
        |        (CAST(len(regexp_extract_all(text, '[AEIOUYaeiouy]+'))
        |            AS DOUBLE)
        |         / CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |             AS DOUBLE)), 4)
        |  END AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,

    // exact class counts × the e0 target literals; weight reads the
    // ROUNDED current share; ESS terms decimal-summed over windows
    "sa18_reweight" ->
      """WITH counts AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1),
        |t(lang, target_share) AS (VALUES
        |  ('de', 0.2e0), ('en', 0.3e0), ('es', 0.2e0), ('fr', 0.2e0),
        |  ('zh', 0.1e0)),
        |j AS (
        |  SELECT c.lang, c.n, t.target_share,
        |    CAST(SUM(c.n) OVER () AS BIGINT) AS ntot
        |  FROM counts c LEFT JOIN t USING (lang)),
        |w AS (
        |  SELECT lang, n, target_share,
        |    round(CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE), 9)
        |      AS current_share,
        |    round(target_share /
        |      round(CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE), 9), 9)
        |      AS weight
        |  FROM j),
        |e AS (
        |  SELECT *,
        |    CAST(SUM(CAST(CAST(n AS DOUBLE) * weight AS DECIMAL(28,9)))
        |      OVER () AS DOUBLE) AS sw,
        |    CAST(SUM(CAST(CAST(n AS DOUBLE) * weight * weight
        |      AS DECIMAL(28,9))) OVER () AS DOUBLE) AS sw2
        |  FROM w)
        |SELECT lang, n, target_share, current_share, weight,
        |  round(sw * sw / sw2, 2) AS ess
        |FROM e ORDER BY lang""".stripMargin,

    // both retriever oracles verbatim (iv2's BM25 chain, iv4's QLD
    // chain) over ONE shared toks CTE, then the 9-rounded 1/(60+rank)
    // terms DECIMAL-summed and re-ranked
    "pipe5_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(len(l)) AS BIGINT) AS sdl FROM toks),
        |t AS (SELECT doc_id, len(l) AS dl, unnest(l) AS w FROM toks),
        |tf1 AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |        WHERE w IN ('hash', 'join', 'vector') GROUP BY 1, 2, 3),
        |df1 AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY 1),
        |sc1 AS (
        |  SELECT tf1.doc_id,
        |    round(ln(1.0e0 + (st.n - df1.df + 0.5e0) / (df1.df + 0.5e0)) *
        |      (tf1.tf * (1.2e0 + 1.0e0)) /
        |      (tf1.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * tf1.dl /
        |        (CAST(st.sdl AS DOUBLE) / st.n))), 9) AS s
        |  FROM tf1 JOIN df1 USING (w) CROSS JOIN st),
        |agg1 AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
        |  FROM sc1 GROUP BY 1),
        |r1 AS (SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
        |           AS rank
        |       FROM agg1 ORDER BY score DESC, doc_id LIMIT 10),
        |dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM toks),
        |ct AS (SELECT CAST(sum(len(l)) AS BIGINT) AS ct FROM toks),
        |occ AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM t
        |        WHERE w IN ('hash', 'join', 'vector') GROUP BY 1),
        |tf2 AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t
        |        WHERE w IN ('hash', 'join', 'vector') GROUP BY 1, 2),
        |sc2 AS (
        |  SELECT dl.doc_id,
        |    round(ln((CAST(coalesce(tf2.tf, 0) AS DOUBLE) +
        |              2000.0e0 * (CAST(occ.cf AS DOUBLE) /
        |                CAST(ct.ct AS DOUBLE))) /
        |             (CAST(dl.dl AS DOUBLE) + 2000.0e0)), 9) AS s
        |  FROM dl CROSS JOIN occ CROSS JOIN ct
        |  LEFT JOIN tf2 ON tf2.doc_id = dl.doc_id AND tf2.w = occ.w),
        |agg2 AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE), 6) AS score
        |  FROM sc2 GROUP BY 1),
        |r2 AS (SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
        |           AS rank
        |       FROM agg2 ORDER BY score DESC, doc_id LIMIT 10),
        |u AS (SELECT doc_id, rank FROM r1
        |      UNION ALL SELECT doc_id, rank FROM r2),
        |f AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
        |    round(CAST(SUM(CAST(round(1.0e0 / CAST(60 + rank AS DOUBLE), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE), 6) AS rrf
        |  FROM u GROUP BY 1),
        |top AS (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 10)
        |SELECT doc_id, n_lists, rrf,
        |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    // row-numbered checkpoints, first-occurrence vocabulary counts,
    // 6-pre-rounded log-log points into the o11 moment chain
    "t25_heaps" ->
      """WITH perdoc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS nt
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn,
        |    CAST(SUM(nt) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumtok
        |  FROM perdoc),
        |cps AS (SELECT doc_id AS cpid, cumtok FROM cum
        |        WHERE rn % 50 = 0 AND cumtok > 0),
        |fo AS (
        |  SELECT tok, CAST(min(doc_id) AS BIGINT) AS fd FROM (
        |    SELECT doc_id, unnest(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS tok
        |    FROM documents) GROUP BY 1),
        |pts AS (
        |  SELECT cps.cpid, cps.cumtok,
        |    CAST(SUM(CASE WHEN fo.fd <= cps.cpid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS vocab
        |  FROM fo CROSS JOIN cps GROUP BY 1, 2),
        |xy AS (
        |  SELECT 'corpus' AS corpus,
        |    CAST(round(ln(CAST(cumtok AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(vocab AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM pts WHERE vocab > 0),
        |s AS (
        |  SELECT corpus, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
        |      AS DOUBLE) AS syy
        |  FROM xy GROUP BY 1),
        |f AS (
        |  SELECT corpus, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS den,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM s)
        |SELECT corpus, n,
        |  CASE WHEN den > 0 THEN round(num / den, 6) END AS slope,
        |  CASE WHEN den > 0
        |       THEN round((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6)
        |  END AS intercept,
        |  CASE WHEN den > 0 AND deny > 0
        |       THEN round(num * num / (den * deny), 6) END AS r2
        |FROM f""".stripMargin,

    // the t2 scored construction with the actual label carried through;
    // exact cell counts, one closing division
    "t24_langid_eval" ->
      s"""WITH scored AS (
         |  SELECT lang AS actual,
         |    (SELECT CASE WHEN max(s.sc) > 0
         |            THEN first(s.lg ORDER BY s.sc DESC, s.lg ASC)
         |            ELSE 'und' END
         |     FROM (SELECT unnest([${Seq("de", "en", "es", "fr").map(profileSql).mkString(", ")}],
         |                  recursive := true)) s(sc, lg)) AS predicted
         |  FROM (SELECT lang,
         |          list_distinct(list_filter(
         |            string_split_regex(lower(trim(text)), '\\s+'),
         |            t -> t <> '')) AS toks
         |        FROM documents WHERE lang IS NOT NULL)),
         |cells AS (
         |  SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM scored GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
         |      AS BIGINT) AS hits
         |  FROM cells)
         |SELECT actual, predicted, n, n_total,
         |  round(CAST(hits AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         |    AS accuracy
         |FROM cells, tot ORDER BY actual, predicted""".stripMargin,

    // gaps-and-islands phrase runs (pos − nonstop-rank), string_agg in
    // pos order, 6-rounded word scores DECIMAL-summed per island; rank
    // ties break on the phrase string
    "t23_rake" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> x <> '') AS l
         |  FROM documents),
         |pos0 AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d),
         |toks AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i] AS tok
         |         FROM pos0),
         |ns AS (SELECT doc_id, pos, tok FROM toks
         |       WHERE NOT list_contains($EnStops, tok)),
         |isl AS (
         |  SELECT doc_id, pos, tok,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM ns),
         |ph AS (
         |  SELECT doc_id, grp,
         |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
         |    CAST(COUNT(*) AS BIGINT) AS plen
         |  FROM isl GROUP BY 1, 2),
         |mem AS (
         |  SELECT isl.doc_id, isl.grp, isl.tok, ph.phrase, ph.plen
         |  FROM isl JOIN ph
         |    ON ph.doc_id = isl.doc_id AND ph.grp = isl.grp),
         |ws AS (
         |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS freq,
         |    CAST(SUM(plen) AS BIGINT) AS deg
         |  FROM mem GROUP BY 1, 2),
         |ws2 AS (
         |  SELECT doc_id, tok,
         |    CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 6)
         |      AS DECIMAL(28,6)) AS wscore
         |  FROM ws),
         |sc AS (
         |  SELECT m.doc_id, m.grp, m.phrase, m.plen,
         |    CAST(SUM(w.wscore) AS DOUBLE) AS score
         |  FROM mem m JOIN ws2 w
         |    ON w.doc_id = m.doc_id AND w.tok = m.tok
         |  GROUP BY 1, 2, 3, 4),
         |dp AS (SELECT doc_id, phrase, CAST(max(plen) AS BIGINT) AS plen,
         |         max(score) AS score
         |       FROM sc GROUP BY 1, 2),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, phrase ASC) AS INT) AS rank
         |      FROM dp)
         |SELECT doc_id, phrase, plen, score, rank FROM r
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // the t3 quality gates verbatim (exact quarters → exact DECIMAL
    // sums), md5 distincts, ROLLUP(lang) with the 'ALL' label
    "pipe4_datacard" ->
      s"""WITH base AS (
         |  SELECT lang, n_chars, md5(text) AS h,
         |    CAST(len(toks) AS BIGINT) AS nt,
         |    CAST((
         |      (CASE WHEN len(toks) >= 5 AND length(trim(text)) >= 30
         |            THEN 1.0 ELSE 0.0 END)
         |      + (CASE WHEN CAST(len(list_filter(toks,
         |              t2 -> list_contains($EnStops, t2))) AS DOUBLE)
         |            / greatest(len(toks), 1) >= 0.05 THEN 1.0 ELSE 0.0 END)
         |      + (CASE WHEN CAST(length(t) -
         |              length(regexp_replace(t, '[^a-z0-9\\s]', '', 'g'))
         |              AS DOUBLE)
         |            / greatest(length(t), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
         |      + (CASE WHEN CAST(length(t) -
         |              length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE)
         |            / greatest(length(t), 1) >= 0.7 THEN 1.0 ELSE 0.0 END)
         |    ) / 4.0 AS DECIMAL(18,6)) AS q
         |  FROM (SELECT lang, n_chars, text, lower(trim(text)) AS t,
         |          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |            x -> x <> '') AS toks
         |        FROM documents))
         |SELECT coalesce(lang, 'ALL') AS lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
         |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
         |  round(CAST(SUM(nt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS mean_tokens,
         |  round(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS mean_chars,
         |  round(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS mean_quality
         |FROM base GROUP BY ROLLUP(lang) ORDER BY lang""".stripMargin,

    // both MD5 folds replayed per token ('fh:' route, 'fhs:' sign);
    // sums stay exact BIGINTs
    "t22_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('fh:' || tok), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 64 AS bucket,
        |    1 - 2 * (list_reduce(
        |      [CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('fhs:' || tok), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) % 2) AS sgn
        |  FROM toks)
        |SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS weight,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens
        |FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,

    // the sa1 hash replay with the 'bal:' salt; per-class hash-order
    // ranks against the scalar min class count
    "sa14_balanced" ->
      """WITH d AS (
        |  SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL),
        |h AS (
        |  SELECT doc_id, lang,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(
        |          substr(md5('bal:' || CAST(doc_id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM d),
        |r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
        |      AS BIGINT) AS sample_rank
        |  FROM h),
        |m AS (SELECT CAST(min(cnt) AS BIGINT) AS minn FROM (
        |  SELECT COUNT(*) AS cnt FROM d GROUP BY lang))
        |SELECT doc_id, lang, sample_rank FROM r, m
        |WHERE sample_rank <= minn ORDER BY lang, sample_rank""".stripMargin,

    // the sa1 hash replay with the 'sys:' salt; `//` ≡ Spark's div on
    // the positive ranks
    "sa13_systematic" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(
        |                   substr(md5('sys:' || CAST(doc_id AS VARCHAR)),
        |                          1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (ORDER BY hv, doc_id) AS BIGINT) AS rn
        |  FROM h)
        |SELECT doc_id, lang, CAST((rn - 1) // 5 + 1 AS BIGINT) AS sample_rank
        |FROM r WHERE rn % 5 = 1 ORDER BY sample_rank""".stripMargin,

    // identical p/q/m parenthesization and the 9-round + DECIMAL-sum
    // firewall on each ln term; n_a/n_b ride every term row, MIN'd at
    // the end (they are constant)
    "t18_jsd" ->
      """WITH ta AS (
        |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS rca FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        |    FROM documents WHERE doc_id % 2 = 0) GROUP BY 1),
        |tb AS (
        |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS rcb FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        |    FROM documents WHERE doc_id % 2 = 1) GROUP BY 1),
        |j AS (
        |  SELECT CAST(coalesce(rca, 0) AS BIGINT) AS ca,
        |         CAST(coalesce(rcb, 0) AS BIGINT) AS cb
        |  FROM ta FULL OUTER JOIN tb ON tb.token = ta.token),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
        |  FROM j),
        |terms AS (
        |  SELECT n_a, n_b,
        |    CASE WHEN ca > 0 THEN CAST(round(
        |      (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) *
        |      ln((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) /
        |         (0.5e0 * (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |                   CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)))), 9)
        |      AS DECIMAL(28,9))
        |    ELSE CAST(0 AS DECIMAL(28,9)) END AS tp,
        |    CASE WHEN cb > 0 THEN CAST(round(
        |      (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) *
        |      ln((CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |         (0.5e0 * (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |                   CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)))), 9)
        |      AS DECIMAL(28,9))
        |    ELSE CAST(0 AS DECIMAL(28,9)) END AS tq
        |  FROM j CROSS JOIN tot)
        |SELECT CAST(MIN(n_a) AS BIGINT) AS n_a, CAST(MIN(n_b) AS BIGINT) AS n_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_vocab,
        |  round(0.5e0 * CAST(SUM(tp) AS DOUBLE) +
        |        0.5e0 * CAST(SUM(tq) AS DOUBLE), 6) AS jsd
        |FROM terms""".stripMargin,

    "t6_tfidf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id,
        |      UNNEST(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS token
        |    FROM docs) GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM docs),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |         tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |ranked AS (
        |  -- rank on the ROUNDED score (matching the Spark side) so ln()
        |  -- ulp differences become exact ties broken by token
        |  SELECT doc_id, token, tf, df, ROUND(score, 6) AS score,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |                            ORDER BY ROUND(score, 6) DESC, token ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, token, tf, df, score
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // stride 24 = chunkSize 32 − overlap 8; DuckDB's 1-based inclusive
    // list slice t[a:b] equals Spark's slice(t, a, len) with b capped at n
    "t5_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, t,
        |    UNNEST(range(0, CASE WHEN len(t) <= 0 THEN 0
        |                         ELSE (len(t) - 1) // 24 + 1 END)) AS i
        |  FROM toks)
        |SELECT doc_id, i AS chunk_idx,
        |  len(t[(i*24 + 1):least(i*24 + 32, len(t))]) AS n_chunk_tokens,
        |  array_to_string(t[(i*24 + 1):least(i*24 + 32, len(t))], ' ') AS chunk_text
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,

    "t1_token_counts" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS n_tokens,
        |  len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t2_langid" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    (SELECT CASE WHEN max(s.sc) > 0 THEN first(s.lg ORDER BY s.sc DESC, s.lg ASC)
         |            ELSE 'und' END
         |     FROM (SELECT unnest([${Seq("de", "en", "es", "fr").map(profileSql).mkString(", ")}],
         |                  recursive := true)) s(sc, lg)) AS lang_guess
         |  FROM (SELECT doc_id,
         |          list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |            t -> t <> '')) AS toks
         |        FROM documents))
         |SELECT lang_guess, COUNT(*) AS n_docs FROM scored
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "t3_quality" ->
      s"""SELECT doc_id,
         |  ROUND(CAST(len(list_filter(toks, t -> list_contains($EnStops, t))) AS DOUBLE)
         |    / greatest(len(toks), 1), 6) AS stop_ratio,
         |  ROUND(CAST(length(t) - length(regexp_replace(t, '[^a-z0-9\\s]', '', 'g')) AS DOUBLE)
         |    / greatest(length(t), 1), 6) AS punct_ratio,
         |  ROUND(CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE)
         |    / greatest(length(t), 1), 6) AS alpha_ratio,
         |  ((CASE WHEN len(toks) >= 5 AND length(trim(text)) >= 30 THEN 1.0 ELSE 0.0 END)
         |   + (CASE WHEN CAST(len(list_filter(toks, t -> list_contains($EnStops, t))) AS DOUBLE)
         |          / greatest(len(toks), 1) >= 0.05 THEN 1.0 ELSE 0.0 END)
         |   + (CASE WHEN CAST(length(t) - length(regexp_replace(t, '[^a-z0-9\\s]', '', 'g')) AS DOUBLE)
         |          / greatest(length(t), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
         |   + (CASE WHEN CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE)
         |          / greatest(length(t), 1) >= 0.7 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
         |FROM (SELECT doc_id, text, lower(trim(text)) AS t,
         |        list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    // sa8's hv fold partitioned by source; weight = n_chars stays BIGINT
    // on both sides (no aggregate, so no HUGEINT risk)
    "sa9_reservoir" ->
      """WITH h AS (
        |  SELECT source, doc_id, n_chars AS weight,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents),
        |s AS (
        |  SELECT source, doc_id, weight,
        |    round(-ln(CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0) / weight, 9) AS skey
        |  FROM h),
        |r AS (
        |  SELECT source, doc_id, weight, skey,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) AS INT) AS rank
        |  FROM s)
        |SELECT source, doc_id, weight, skey, rank FROM r
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    // exponent written 1.0e0/2.0e0 - 1.0e0 (= -0.5 exactly, matching the
    // Scala 1.0/T - 1.0); the rate rounds at 9 decimals AFTER the
    // max-normalization, the sa8 libm firewall
    "sa10_temperature" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid'
        |         ELSE 'small' END AS domain
        |  FROM documents),
        |g AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_domain FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_domain) AS DOUBLE) AS n FROM g),
        |t AS (SELECT domain, n_domain,
        |        pow(n_domain / tot.n, 1.0e0 / 2.0e0 - 1.0e0) AS term FROM g, tot),
        |m AS (SELECT max(term) AS mx FROM t),
        |r AS (SELECT domain, n_domain, round(term / m.mx, 9) AS rate FROM t, m),
        |h AS (SELECT doc_id, domain,
        |    list_reduce([CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)
        |                 FOR c IN string_split(substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM d)
        |SELECT h.doc_id, h.domain, r.n_domain, r.rate,
        |  (CAST(hv + 1 AS DOUBLE) / 72057594037927936.0e0) <= r.rate AS kept
        |FROM h JOIN r USING (domain) ORDER BY doc_id""".stripMargin,

    // keep gates evaluate the UNROUNDED signals (raw CTE), exactly like
    // the operator; only the output columns round at 6 decimals
    "t17_gopher" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |raw AS (
         |  SELECT doc_id,
         |    len(toks) AS n_words,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        [CAST(length(t2) AS BIGINT) FOR t2 IN toks]), (a, x) -> a + x) AS DOUBLE)
         |      / greatest(len(toks), 1) AS mean_raw,
         |    len(list_intersect(list_distinct(toks), $EnStops)) AS n_stop_hits,
         |    CAST(len(list_filter(toks, t2 -> regexp_matches(t2, '[a-z]'))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS alpha_raw,
         |    CAST(len(list_filter(toks, t2 -> contains(t2, '#')))
         |       + len(list_filter(toks, t2 -> contains(t2, '...'))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS symbol_raw
         |  FROM d)
         |SELECT doc_id, n_words,
         |  ROUND(mean_raw, 6) AS mean_word_len,
         |  n_stop_hits,
         |  ROUND(alpha_raw, 6) AS alpha_word_frac,
         |  ROUND(symbol_raw, 6) AS symbol_word_ratio,
         |  (n_words >= 50 AND n_words <= 100000
         |   AND mean_raw >= 3.0e0 AND mean_raw <= 10.0e0
         |   AND n_stop_hits >= 2
         |   AND alpha_raw >= 0.8e0
         |   AND symbol_raw <= 0.1e0) AS keep
         |FROM raw ORDER BY doc_id""".stripMargin,

    // direct per-document consecutive-pair count — the distributed
    // postings-join must equal the plain definition (identity proof)
    // plain (non-interpolated) triple quote: \s+ must be written with ONE
    // backslash here — only the s-interpolator collapses \\ to \
    "iv3_phrase" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len([i FOR i IN range(1, len(toks))
        |              IF toks[CAST(i AS INT)] = 'table'
        |             AND toks[CAST(i AS INT) + 1] = 'value']) AS BIGINT) AS n_matches
        |  FROM d)
        |SELECT doc_id, n_matches FROM c
        |WHERE n_matches > 0 ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) FOR x IN string_split(trim(text), '')]),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
