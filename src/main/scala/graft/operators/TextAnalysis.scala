package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * language identification, quality scoring, document fingerprinting.
 *
 * Everything here is a pure `Column` expression — no UDFs — so every
 * operator stays inside whole-stage codegen and runs at scan speed on any
 * corpus size. Language profiles are literal arrays folded into the plan.
 */
object TextAnalysis {

  /** Lowercased whitespace tokens (may contain duplicates). */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Whitespace token count; blank input → 0. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword token count: letter runs, digit runs, punctuation runs
    * (the pre-tokenizer split a byte-pair encoder sees). */
  def bpeTokenCount(c: Column): Column =
    regexp_count(lower(trim(c)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"))

  // ---- language identification ---------------------------------------------

  /** Tiny stopword profiles (top function words per language). Extend freely;
    * detection quality scales with profile size, the plan shape does not. */
  val LanguageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"))

  /**
   * Language-ID heuristic: fraction of the document's DISTINCT tokens that
   * hit each profile's stopword set; argmax wins, ties break on language
   * code, no hit at all → "und".
   */
  def langId(c: Column, profiles: Map[String, Seq[String]] = LanguageProfiles): Column = {
    val toks = array_distinct(tokens(c))
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(
        (size(array_intersect(toks, array(stops.map(lit): _*))).cast("double") /
          greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    // sort by score desc, lang asc; element_at after sort with comparator
    val best = array_sort(array(scored: _*),
      (l, r) => when(l("score") > r("score"), -1)
        .when(l("score") < r("score"), 1)
        .when(l("lang") < r("lang"), -1)
        .when(l("lang") > r("lang"), 1)
        .otherwise(0))(0)
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  // ---- quality scoring ------------------------------------------------------

  /** English stopword ratio over all tokens (non-distinct). */
  def stopwordRatio(c: Column, stops: Seq[String] = LanguageProfiles("en")): Column = {
    val toks = tokens(c)
    val stopArr = array(stops.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Punctuation-character ratio of the trimmed text. */
  def punctRatio(c: Column): Column = {
    val t = lower(trim(c))
    (length(t) - length(regexp_replace(t, "[^a-z0-9\\s]", ""))).cast("double") /
      greatest(length(t), lit(1))
  }

  /** Alphabetic-character ratio of the trimmed text. */
  def alphaRatio(c: Column): Column = {
    val t = lower(trim(c))
    (length(t) - length(regexp_replace(t, "[a-z]", ""))).cast("double") /
      greatest(length(t), lit(1))
  }

  /**
   * Composite quality score in [0,1]: four equally-weighted gates —
   * length (≥5 words, ≥30 chars), stopword presence (≥5%), punctuation
   * sanity (≤20%), alphabetic density (≥70%). The gates-and-average shape
   * mirrors common pretraining-corpus filters (C4-style heuristics).
   */
  def qualityScore(c: Column): Column = {
    val lengthOk = when(tokenCount(c) >= 5 && length(trim(c)) >= 30, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c) >= 0.05, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(c) <= 0.2, 1.0).otherwise(0.0)
    val alphaOk = when(alphaRatio(c) >= 0.7, 1.0).otherwise(0.0)
    (lengthOk + stopOk + punctOk + alphaOk) / 4.0
  }

  /**
   * P135 — Flesch reading-ease readability: 206.835 − 1.015·(W/S) −
   * 84.6·(Y/W) over fully regex-deterministic counts — W = alphabetic
   * runs `[A-Za-z]+`, S = sentence-terminator runs `[.!?]+` (min 1),
   * Y = vowel-group runs `[AEIOUYaeiouy]+` (the standard syllable
   * heuristic; silent-e refinements are dictionary-bound and
   * deliberately omitted so any engine with RE2 replays the counts
   * bit-for-bit). Wordless text scores null. The pretraining use:
   * readability bands stratify a corpus for curriculum mixing, and
   * extreme scores flag OCR noise / boilerplate.
   *
   * Returns struct(n_words, n_sents, n_syll, flesch) — a pure per-row
   * projection, no shuffle; flesch is a fixed double sequence on exact
   * integer counts, rounded at 4.
   */
  def readability(c: Column): Column = {
    val w = regexp_count(c, lit("[A-Za-z]+")).cast("long")
    val sTerm = greatest(regexp_count(c, lit("[.!?]+")).cast("long"), lit(1L))
    val y = regexp_count(c, lit("[AEIOUYaeiouy]+")).cast("long")
    val flesch = when(w > 0,
      round(lit(206.835) - lit(1.015) * (w.cast("double") / sTerm.cast("double"))
        - lit(84.6) * (y.cast("double") / w.cast("double")), 4))
    struct(w.as("n_words"), sTerm.as("n_sents"), y.as("n_syll"),
      flesch.as("flesch"))
  }

  /**
   * P70 — Gopher-style rule filter (Rae et al. 2021, Table A1 subset):
   * the composite document gate most pretraining pipelines run before any
   * model-based scoring. Emits the individual signals plus the `keep`
   * conjunction so downstream can audit WHICH rule dropped a document:
   *
   *   - `n_words` in [minWords, maxWords]            (default 50..100,000)
   *   - `mean_word_len` in [3, 10] characters
   *   - `n_stop_hits` ≥ 2 distinct English stopwords
   *   - `alpha_word_frac` ≥ 0.8 of words contain an alphabetic character
   *   - `symbol_word_ratio` ≤ 0.1 ('#' or '...' per word)
   *
   * Line-based rules (bullet/ellipsis line starts) are omitted: this
   * corpus carries no line structure. Tokenization = [[tokens]], shared
   * with every other text operator. Pure per-row projection — no shuffle,
   * no UDFs; ratios round at 6 decimals (the t3 discipline).
   */
  def gopherFlags(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val toks = tokens(c)
    val nWords = size(toks)
    val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / greatest(nWords, lit(1))
    val stopArr = array(LanguageProfiles("en").map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(toks), stopArr))
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(nWords, lit(1))
    val symbolRatio =
      (size(filter(toks, t => t.contains("#"))) +
        size(filter(toks, t => t.contains("...")))).cast("double") /
        greatest(nWords, lit(1))
    val wordsOk = nWords >= minWords && nWords <= maxWords
    val lenOk = meanLen >= 3.0 && meanLen <= 10.0
    val stopOk = stopHits >= 2
    val alphaOk = alphaFrac >= 0.8
    val symbolOk = symbolRatio <= 0.1
    struct(
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      stopHits.as("n_stop_hits"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      round(symbolRatio, 6).as("symbol_word_ratio"),
      (wordsOk && lenOk && stopOk && alphaOk && symbolOk).as("keep"))
  }

  /**
   * P71 — exact phrase occurrence count via positional postings: how many
   * times the n-token `phrase` appears (consecutively, in order) in each
   * document. The distributed shape is an inverted POSITIONAL index —
   * (term, id, pos) postings for the phrase's terms only (the broadcast
   * isin filter collapses the explode before any shuffle), chained by
   * n−1 equi-joins on (id, pos + i); occurrences then count per document.
   * At corpus scale this is the standard phrase-query plan over a
   * positional index: work scales with the phrase terms' posting lists,
   * never with corpus length. Tokenization = [[tokens]]. Returns
   * (id, n_matches > 0).
   */
  def phraseCount(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseCount: phrase must have at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phraseCount: phrase tokens must be non-empty and whitespace-free, got $phrase")
    val terms = phrase.map(_.toLowerCase)
    val postings = df
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .where(col("term").isin(terms: _*))
    val first = postings.where(col("term") === terms.head)
      .select(col("id"), col("pos"))
    val chained = terms.zipWithIndex.tail.foldLeft(first) { case (acc, (t, i)) =>
      val next = postings.where(col("term") === t)
        .select(col("id").as("__nid"), (col("pos") - i).as("__npos"))
      acc.join(next, col("id") === col("__nid") && col("pos") === col("__npos"))
        .select(col("id"), col("pos"))
    }
    chained.groupBy(col("id")).agg(count(lit(1)).as("n_matches"))
  }

  // ---- lexical diversity -----------------------------------------------------

  /** P42 — one-pass lexical-diversity statistics `[entropy bits, type-token
    * ratio, distinct tokens, total tokens]` via the native codegen kernel
    * ([[graft.expressions.LexicalStatsExpr]]). Same tokenization as
    * [[tokens]]; identical calls collapse via subexpression elimination, so
    * projecting all four components tokenizes each document exactly once. */
  def lexicalStats(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.expressions.LexicalStatsExpr(colExpr(c)))
  }

  /** P42 — Shannon entropy of the document's token unigram distribution in
    * bits (0 for blank input; log2(n) for an all-distinct document). Low
    * entropy flags template/keyword-stuffed text that per-n-gram fractions
    * ([[topNgramFraction]]) can miss when the repetition is spread over
    * many distinct n-grams. */
  def wordEntropy(c: Column): Column = lexicalStats(c).getItem(0)

  /** P42 — type-token ratio (distinct tokens / total tokens; 0 for blank
    * input), the classic lexical-diversity score. */
  def typeTokenRatio(c: Column): Column = lexicalStats(c).getItem(1)

  // ---- tf-idf ----------------------------------------------------------------

  /** Raw term frequencies per document: (id, token, tf) — duplicates kept,
    * unlike the dedup family's distinct token sets. One explode + one
    * (id, token)-keyed count, map-side combinable. */
  def termFrequencies(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))

  /**
   * P32 — smoothed TF-IDF: score = tf · (ln((N+1)/(df+1)) + 1), the
   * sklearn-style smoothing that keeps corpus-wide terms positive. N is
   * the corpus document count — ONE driver-collected scalar (the o3
   * scalar-subquery shape), folded into the plan as a literal; df comes
   * from a (token)-keyed distinct-doc count joined back to the term
   * frequencies. Two shuffles total (term counts, doc frequencies), both
   * keyed and partial-aggregated — the shape that survives any corpus
   * size. `minDf` prunes hapax noise before the join.
   */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L): org.apache.spark.sql.DataFrame = {
    // null ids are excluded up front: they are not documents, and counting
    // one would shift every idf against a COUNT(DISTINCT)-style oracle
    val docs = df.where(col(idCol).isNotNull)
    val n = docs.select(col(idCol)).distinct().count()
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    tf.join(dfreq, Seq("token"))
      .select(col("id"), col("token"), col("tf"), col("df"),
        (col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)).as("score"))
  }

  // ---- chunking --------------------------------------------------------------

  /**
   * P29 — token-window chunking with overlap: split each document into
   * chunks of `chunkSize` whitespace tokens, consecutive chunks sharing
   * `overlap` tokens (stride = chunkSize − overlap), the standard prep for
   * fixed-context-window training. Output: (id, chunk_idx, n_chunk_tokens,
   * chunk_text); blank documents yield zero chunks. One projection + one
   * explode — chunks materialize rows, never a shuffle, so the operator
   * runs at scan speed on any corpus.
   */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkSize: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize >= 1, s"chunkTokens: chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunkTokens: overlap ($overlap) must be in [0, chunkSize), " +
        "or consecutive chunks would never advance")
    val stride = chunkSize - overlap
    // last chunk start = floor((n-1)/stride)·stride — every token is
    // covered and no chunk starts at/past the end (double division is
    // exact here: token counts sit far below 2^52)
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col("id"), col("__toks"),
        explode(when(col("__n") <= 0, array().cast("array<bigint>"))
          .otherwise(sequence(lit(0L),
            floor((col("__n") - lit(1)) / lit(stride.toDouble)).cast("long"))))
          .as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("__c"))
      .select(col("id"), col("chunk_idx"),
        size(col("__c")).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /**
   * P40 — concat-and-split sequence packing: lay every document's tokens
   * end-to-end and cut the stream into fixed `seqLen` training windows
   * (the GPT-style packing that turns a ragged corpus into dense
   * fixed-context batches). Emits per document its shard, token count,
   * cumulative token offset within the shard, and the window it starts in
   * (`bin_id` = offset DIV seqLen, `bin_offset` = offset MOD seqLen) —
   * documents crossing a window boundary are inherent to concat-and-split.
   *
   * A GLOBAL prefix sum does not distribute, so packing is per-shard —
   * exactly how production pipelines shard their output files: documents
   * land in `shards` buckets by portable hash ([[Sampling.hashBucket]]),
   * and within a shard are ordered by portable hash then id, making the
   * layout a function of the DATA alone (re-runs, engines, partitionings
   * all agree). One window shuffle keyed by shard; pick `shards` ≈ the
   * output file count so each shard's running sum stays a single
   * partition's linear scan. Offsets are exact integer arithmetic —
   * no double division anywhere.
   */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seqLen: Int, shards: Int,
      salt: String = ""): org.apache.spark.sql.DataFrame = {
    require(seqLen >= 1, s"packSequences: seqLen must be >= 1, got $seqLen")
    require(shards >= 1, s"packSequences: shards must be >= 1, got $shards")
    for (c <- Seq("shard", "n_tokens", "tok_offset", "bin_id", "bin_offset", "__hv")
         if df.columns.contains(c))
      throw new IllegalArgumentException(
        s"packSequences: input already has a $c column — rename it first")
    val base = df.select(col(idCol).as("id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      Sampling.hashBucket(col(idCol), shards, salt).as("shard"),
      Sampling.hashValue(col(idCol), salt).as("__hv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(col("__hv").asc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id"), col("shard"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset DIV $seqLen").as("bin_id"),
        pmod(col("tok_offset"), lit(seqLen.toLong)).as("bin_offset"))
  }

  // ---- PII redaction ---------------------------------------------------------

  /** P38 — redaction rules as (name, pattern, replacement token), applied
    * in list order (earlier classes win overlaps). Patterns restrict
    * themselves to the regex subset java.util.regex and RE2 evaluate
    * identically — no lookaround, no backreferences, ASCII classes — so
    * any RE2-based engine (and the DuckDB oracle) reproduces the redaction
    * byte-for-byte. Extend freely under the same constraint. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}", "[PHONE]"))

  /** P38 — replace every match of every PII class with its token,
    * sequentially in pattern order. A chain of codegen'd regexp_replace
    * projections — scan-speed, no shuffle, no UDF. */
  def redactPii(c: Column,
      patterns: Seq[(String, String, String)] = PiiPatterns): Column =
    patterns.foldLeft(c) { case (acc, (_, pattern, token)) =>
      regexp_replace(acc, pattern, token)
    }

  /** Match count of one PII class on the ORIGINAL text (counts are
    * per-class independent; the sequential redaction above decides
    * overlaps, the counts don't). */
  def piiCount(c: Column, name: String,
      patterns: Seq[(String, String, String)] = PiiPatterns): Column = {
    val p = patterns.find(_._1 == name).getOrElse(
      throw new IllegalArgumentException(
        s"piiCount: unknown PII class '$name' (have: ${patterns.map(_._1).mkString(", ")})"))
    regexp_count(c, lit(p._2))
  }

  // ---- repetition signals ----------------------------------------------------

  /** Token n-grams (n ≤ 4) as space-joined strings, built by zipping n
    * shifted slices of the token array — a CONSTANT number of linear array
    * ops per document, never a per-window `slice` inside a lambda (that
    * shape re-slices per element and goes quadratic — the t7 lesson).
    * Fewer than n tokens → empty array. */
  private[operators] def ngramArray(toks: Column, n: Int): Column = {
    require(n >= 1 && n <= 4, s"ngramArray: n must be in [1,4], got $n")
    if (n == 1) toks
    else {
      val cnt = size(toks) - (n - 1)
      val joined = (2 to n).foldLeft(slice(toks, lit(1), cnt)) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k), cnt), (a, b) => concat(a, lit(" "), b))
      }
      when(cnt > 0, joined).otherwise(array().cast("array<string>"))
    }
  }

  /** One-pass n-gram multiset statistics `[top, distinct, total]` via the
    * native codegen kernel ([[graft.expressions.NgramStatsExpr]]) — the
    * shared primitive under both repetition fractions. Identical
    * tokenization and n-gram joining as [[ngramArray]]. */
  def ngramStats(c: Column, n: Int): Column = {
    require(n >= 1, s"ngramStats: n must be >= 1, got $n")
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.expressions.NgramStatsExpr(colExpr(c), n))
  }

  /**
   * P35 — fraction of a document's token n-grams claimed by its single
   * most frequent n-gram (Gopher-style "top n-gram fraction"; high values
   * flag template/boilerplate text). Zero shuffles, and the per-row work
   * is the native [[ngramStats]] kernel — the first formulation
   * (array_sort + interpreted `aggregate` fold over the longest equal
   * run) was t8's 10s-per-round bench hot spot, the same
   * CodegenFallback-lambda trap t7 hit. No n-grams at all → 0.0.
   */
  def topNgramFraction(c: Column, n: Int): Column = {
    val s = ngramStats(c, n)
    when(s.getItem(2) > 0,
      s.getItem(0).cast("double") / s.getItem(2)).otherwise(lit(0.0))
  }

  /** P35 — fraction of a document's token n-grams that are repeats of an
    * n-gram already seen in the same document (1 − distinct/total; the
    * Gopher "duplicate n-gram fraction" family). Same kernel as
    * [[topNgramFraction]] — identical calls collapse via subexpression
    * elimination. No n-grams → 0.0. */
  def dupNgramFraction(c: Column, n: Int): Column = {
    val s = ngramStats(c, n)
    when(s.getItem(2) > 0,
      (s.getItem(2) - s.getItem(1)).cast("double") / s.getItem(2))
      .otherwise(lit(0.0))
  }

  /**
   * P139 — cross-document boilerplate detection: an n-gram occurring in
   * ≥ `minDocs` DISTINCT documents is template text (headers, footers,
   * license blocks — the repetition Gopher's WITHIN-document fractions
   * cannot see), and each document reports the fraction of its n-gram
   * stream claimed by such grams. High `template_frac` docs are
   * scraped-template noise a pretraining mix wants down-weighted.
   * Documents with fewer than n tokens have no n-gram stream and drop.
   *
   * Shapes: explode n-grams once, ONE distinct on (doc, gram) feeding a
   * keyed spread count, then a shuffle_hash join of the common-gram set
   * back onto the gram stream (post-agg no-stats rule; broadcast would
   * be wrong — the common set scales with the corpus) and one per-doc
   * agg. Same tokenization + gram joining as every text operator
   * ([[tokens]]/[[ngramArray]]), so the oracle replays it verbatim.
   */
  def crossDocNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long): DataFrame = {
    require(minDocs >= 2L, s"crossDocNgrams: minDocs must be >= 2, got $minDocs")
    val grams = df
      .select(col(idCol), explode(ngramArray(tokens(col(textCol)), n)).as("gram"))
    val spread = grams.distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select(col("gram"), lit(1L).as("__bp"))
    grams.join(spread.hint("shuffle_hash"), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__bp").isNotNull, 1L).otherwise(0L)).as("n_common"))
      .withColumn("template_frac",
        round(col("n_common").cast("double") / col("n_grams").cast("double"), 6))
  }

  /**
   * P142 — feature hashing (the Weinberger hashing trick): every token
   * maps to bucket = portable-hash mod `dims` with a ±1 sign from an
   * independent hash, and a document's sparse feature vector is the
   * per-(doc, bucket) sign sum — fixed dimensionality with NO vocabulary
   * pass, the property that makes it THE text featurizer for streaming
   * and 100 TB corpora (a vocabulary-indexed TF matrix needs a global
   * dictionary build + broadcast; this needs nothing). Signed sums make
   * collisions cancel in expectation instead of inflating counts.
   * Emits only occupied buckets: (id, bucket, weight, n_tokens).
   *
   * Shapes: one explode + one keyed agg, map-side combinable, all exact
   * BIGINT. Both hashes replay from the portable MD5 with distinct
   * salts ("fh:" route, "fhs:" sign) — the sketch hash-as-contract rule.
   */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 2, s"featureHash: dims must be >= 2, got $dims")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .withColumn("bucket", Sampling.hashBucket(col("__tok"), dims, "fh:"))
      .withColumn("__sign", lit(1L) - lit(2L) *
        pmod(Sampling.hashValue(col("__tok"), "fhs:"), lit(2L)))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).as("weight"), count(lit(1)).as("n_tokens"))
  }

  /**
   * P147 — dataset-card summary (the "datasheet for datasets" table):
   * per group (+ an ALL rollup row), doc counts, exact-dup distinct
   * counts (MD5 of the text), token totals and means, and mean
   * [[qualityScore]] — the one-pass corpus report a training run's data
   * card quotes, as an engine operator instead of five notebook cells.
   *
   * Shapes: ONE rollup aggregate over a single projection pass — every
   * metric map-side combines (countDistinct shuffles its hash, the
   * standard two-phase distinct). Quality scores are exact quarters, so
   * the DECIMAL sum is exact; means are one double division rounded at
   * 6. Null group values would collide with the rollup row's label —
   * callers with nullable groups must pre-coalesce (documented, not
   * hidden: the grouping()-based label needs grouping_id inside agg).
   */
  def corpusCard(df: DataFrame, groupCol: String, textCol: String,
      charsCol: String): DataFrame = {
    df.select(col(groupCol), col(charsCol),
        md5(col(textCol)).as("__h"),
        tokenCount(col(textCol)).cast("long").as("__nt"),
        qualityScore(col(textCol)).cast("decimal(18,6)").as("__q"))
      .rollup(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__h")).as("n_unique"),
        sum(col("__nt")).as("total_tokens"),
        round(sum(col("__nt")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_tokens"),
        round(sum(col(charsCol)).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_chars"),
        round(sum(col("__q")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_quality"))
      .withColumn(groupCol, coalesce(col(groupCol), lit("ALL")))
  }

  /**
   * P153 — RAKE keyphrase extraction (Rose et al. 2010): candidate
   * phrases are maximal stopword-free token runs; each word scores
   * deg/freq (deg = Σ phrase-length over its occurrences — co-occurrence
   * degree including itself, freq = occurrence count, both per doc);
   * a phrase scores the sum of its members' scores, and the top-`k`
   * distinct phrases per doc come back ranked — the zero-model keyword
   * tagger for corpus browsing/faceting, and a cheap retrieval field.
   *
   * Shapes: one posexplode, the gaps-and-islands window (island id =
   * pos − rank-among-nonstop, partitioned per doc — scales with docs),
   * one phrase agg (sort_array over the in-phrase struct keeps member
   * order deterministic), one per-(doc, word) stat agg joined back
   * (shuffle_hash), top-k per doc via window. Cross-engine: word scores
   * are ONE exact-integer division rounded at 6 and DECIMAL-summED into
   * the phrase score (addition order cannot matter); rank ties break on
   * the phrase string.
   */
  def rakePhrases(df: DataFrame, idCol: String, textCol: String,
      k: Int, stops: Seq[String] = LanguageProfiles("en")): DataFrame = {
    require(k >= 1, s"rakePhrases: k must be >= 1, got $k")
    val stopArr = array(stops.map(lit): _*)
    val toks = df
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val nonstop = toks.where(!array_contains(stopArr, col("tok")))
    val wIsl = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos").asc)
    val islands = nonstop
      .withColumn("__grp", col("pos") - row_number().over(wIsl))
    val phrases = islands
      .groupBy(col(idCol), col("__grp"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    // per-(doc, word) RAKE stats over phrase-member occurrences
    val members = islands.join(phrases.hint("shuffle_hash"),
      Seq(idCol.toString, "__grp"))
    val wordStats = members
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("__freq"), sum(col("plen")).as("__deg"))
      .withColumn("__wscore",
        round(col("__deg").cast("double") / col("__freq").cast("double"), 6)
          .cast("decimal(28,6)"))
    // score each ISLAND (so a phrase repeated in a doc is not
    // double-summed), then collapse identical phrases below
    val scored = members
      .join(wordStats.hint("shuffle_hash"), Seq(idCol.toString, "tok"))
      .groupBy(col(idCol), col("__grp"), col("phrase"), col("plen"))
      .agg(sum(col("__wscore")).cast("double").as("score"))
    // identical phrases in one doc collapse to one candidate
    val distinctPhrases = scored
      .groupBy(col(idCol), col("phrase"))
      .agg(max(col("plen")).as("plen"), max(col("score")).as("score"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("phrase").asc)
    distinctPhrases
      .withColumn("rank", row_number().over(wTop).cast("int"))
      .where(col("rank") <= k)
  }

  /**
   * P170 — language-ID evaluation: confusion matrix of [[langId]]
   * against a trusted label plus overall accuracy (repeated per cell) —
   * the quality gate on the classifier that ROUTES documents in a
   * multilingual pipeline; a silent langid regression poisons every
   * per-language corpus downstream, so the matrix belongs in the
   * pipeline, not a notebook. One keyed cell agg + two windows over the
   * ≤|langs|² frame; exact counts, one closing division.
   */
  def langIdEval(df: DataFrame, actualCol: String,
      textCol: String): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.where(col(actualCol).isNotNull)
      .select(col(actualCol).as("actual"), langId(col(textCol)).as("predicted"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum(col("n")).over(all))
      .withColumn("accuracy", round(
        sum(when(col("actual") === col("predicted"), col("n"))
          .otherwise(0L)).over(all).cast("double") /
          col("n_total").cast("double"), 6))
  }

  /**
   * P179 — Heaps'-law fit: vocabulary growth V(n) ≈ K·n^β from log-log
   * OLS over corpus checkpoints (every `checkpointEvery` docs in id
   * order: cumulative tokens vs cumulative distinct vocabulary) — the
   * sibling of P128's Zipf fit, and the capacity planner's curve ("how
   * big does the embedding vocab get at 10× the corpus?"); β far from
   * the 0.4–0.6 band flags synthetic/templated text. Returns the P90
   * OLS frame keyed by the literal "corpus".
   *
   * Shapes: cumulative tokens from ONE ordered window (o5 caveat —
   * checkpoint per partition at scale); vocabulary-at-checkpoint from
   * each token's FIRST document (one keyed min) crossed with the tiny
   * checkpoint frame — never a per-checkpoint distinct scan. Logs
   * pre-round at 6 so olsFit's decimal casts are exact (the o33 rule).
   */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
      checkpointEvery: Int): DataFrame = {
    require(checkpointEvery >= 1,
      s"heapsFit: checkpointEvery must be >= 1, got $checkpointEvery")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol).asc)
    val cum = df
      .select(col(idCol), tokenCount(col(textCol)).cast("long").as("__nt"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cumtok", sum(col("__nt")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val cps = cum
      .where(pmod(col("__rn"), lit(checkpointEvery.toLong)) === 0L &&
        col("__cumtok") > 0)
      .select(col(idCol).as("__cpid"), col("__cumtok"))
    val firstOcc = df
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(min(col(idCol)).as("__fd"))
    val pts = firstOcc.crossJoin(broadcast(cps))
      .groupBy(col("__cpid"), col("__cumtok"))
      .agg(sum(when(col("__fd") <= col("__cpid"), 1L).otherwise(0L))
        .as("__vocab"))
      .where(col("__vocab") > 0)
      .select(lit("corpus").as("corpus"),
        round(log(col("__cumtok").cast("double")), 6).as("x"),
        round(log(col("__vocab").cast("double")), 6).as("y"))
    Features.olsFit(pts, "corpus", "x", "y")
  }

  // ---- fingerprinting --------------------------------------------------------

  // shared with the native winnowing kernel (expressions/TextEval) — one
  // definition so the fingerprint families can never silently diverge
  private[graft] val FpPrime = 2147483647L // 2^31 - 1
  private[graft] val FpBase = 31L

  /** Polynomial rolling hash of the trimmed text: h = Σ 31^i·byte mod
    * (2^31-1). Engine-portable (plain integer arithmetic, no xxhash), stays
    * within 2^36 so ANSI overflow checks never trip. */
  def docFingerprint(c: Column): Column =
    aggregate(
      transform(split(trim(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * FpBase + x, lit(FpPrime)))

  /** Distinct k-gram rolling-hash fingerprints per document (the winnowing
    * building block): array of hashes of each k-char shingle. */
  def shingleFingerprints(c: Column, k: Int): Column = {
    val t = lower(trim(c))
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => aggregate(
        transform(split(t.substr(i, lit(k)), ""), ch => ascii(ch).cast("long")),
        lit(0L),
        (acc, x) => pmod(acc * FpBase + x, lit(FpPrime)))))
  }

  /**
   * P33 — winnowing (the MOSS fingerprint-selection algorithm): slide a
   * `window`-wide frame over the positional k-gram rolling hashes and keep
   * each frame's minimum, deduplicated and sorted. Guarantees a
   * fingerprint in every window (detection can't miss a match longer than
   * window+k−1 chars) while storing only ~2/(window+1) of the hashes — the
   * document-level sketch that makes corpus-scale overlap detection
   * affordable. Texts shorter than a window keep their global minimum.
   *
   * Implemented as a native codegen'd kernel
   * ([[graft.expressions.WinnowFingerprintsExpr]]): the Column-HOF
   * formulation re-evaluated the whole shingle-hash subtree inside the
   * window lambda — quadratic AND interpreted.
   */
  def winnowFingerprints(c: Column, k: Int, window: Int): Column = {
    require(k >= 1, s"winnowFingerprints: k must be >= 1, got $k")
    require(window >= 1, s"winnowFingerprints: window must be >= 1, got $window")
    import org.apache.spark.sql.GraftBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.expressions.WinnowFingerprintsExpr(colExpr(c), k, window))
  }

  /** Corpus top-k vocabulary by occurrence count, ties broken by token
    * text ascending (the deterministic-rank discipline: counts are exact
    * integers, so the cut line is engine-portable). Distributed top-k —
    * `orderBy.limit` plans as TakeOrderedAndProject, never a
    * single-partition sort of the full vocabulary. */
  def topKVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"topKVocab: k must be >= 1, got $k")
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(k)
      .select("token")
  }

  /**
   * P55 — out-of-vocabulary rate per document against the corpus's own
   * [[topKVocab]]: the tokenizer-coverage signal (how much of each doc a
   * k-entry vocabulary fails to cover). Counts OCCURRENCES, not types —
   * a doc repeating one rare token is as uncovered as one spraying many.
   * Token-less docs survive with rate 0.
   *
   * Scale shape: the vocab pass is one map-side-combinable count + a
   * distributed top-k (bytes, not data, to the driver); the scoring pass
   * broadcasts the k-row vocab into a left join — k is a design constant
   * (32k–256k entries for real tokenizers), always broadcast-sized.
   */
  def oovRate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val vocab = broadcast(topKVocab(docs, textCol, k).withColumn("iv", lit(1)))
    docs.select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("token"))
      .join(vocab, Seq("token"), "left")
      .groupBy("id")
      .agg(
        count(col("token")).as("n_tokens"),
        count(when(col("token").isNotNull && col("iv").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_oov").cast("double") / col("n_tokens")))
  }

  /**
   * P57 — inverted-index construction: per token, document frequency,
   * occurrence count, and the posting list of the first `maxPostings`
   * doc ids ascending — the retrieval-side artifact a curation pipeline
   * builds for corpus search and doc-frequency filters.
   *
   * Scale discipline: postings are CAPPED BEFORE the collect — a
   * row_number window keyed by token keeps ids ≤ maxPostings, so a
   * stopword's posting list can never materialize unbounded in an agg
   * buffer (the uncapped collect_list is the memory mine every naive
   * index build steps on). df/occ stay exact full counts from a
   * map-side-combinable agg on the same shuffle key; two token-keyed
   * shuffles total. Null-id docs are dropped up front — an index keyed
   * by id cannot point at them, and a null would otherwise consume a
   * posting slot that collect_list then silently drops.
   */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxPostings: Int): org.apache.spark.sql.DataFrame = {
    require(maxPostings >= 1,
      s"invertedIndex: maxPostings must be >= 1, got $maxPostings")
    val perDoc = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token", "id").agg(count(lit(1)).as("occ"))
    val stats = perDoc.groupBy("token").agg(
      count(lit(1)).as("df"), sum(col("occ")).as("occurrences"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("id").asc)
    val capped = perDoc
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPostings)
      .groupBy("token")
      .agg(sort_array(collect_list(col("id"))).as("postings"))
    stats.join(capped, Seq("token"))
  }

  /**
   * P387 — positional proximity search: documents where `termA` and
   * `termB` occur within `window` tokens of each other, with the span
   * count and the closest distance — the middle ground between iv8's
   * bag-of-words AND (any distance) and iv3's exact phrase (distance
   * exactly 1): "data ... quality" within 5 tokens is topical,
   * page-apart is coincidence. Emits (doc_id, n_spans, min_distance)
   * for matching docs.
   *
   * Shape: the two position lists are term-filtered BEFORE the
   * doc-keyed equi-join (isin-style pushdown — per-doc term positions
   * are single digits, so the join fan-out is tiny); one keyed agg.
   * Counts and distances exact integers.
   */
  def proximitySearch(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, termA: String, termB: String,
      window: Int): org.apache.spark.sql.DataFrame = {
    val a = termA.toLowerCase.trim
    val b = termB.toLowerCase.trim
    require(a.nonEmpty && b.nonEmpty, "proximitySearch: blank term")
    require(a != b, "proximitySearch: terms must differ")
    require(window >= 1 && window <= 1000,
      s"proximitySearch: window must sit in 1..1000, got $window")
    val pos = docs.where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    val pa = pos.where(col("token") === a)
      .select(col("doc_id"), col("pos").as("__pa"))
    val pb = pos.where(col("token") === b)
      .select(col("doc_id"), col("pos").as("__pb"))
    pa.join(pb.hint("shuffle_hash"), Seq("doc_id"))
      .where(abs(col("__pa") - col("__pb")) <= window)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        min(abs(col("__pa") - col("__pb"))).cast("long")
          .as("min_distance"))
  }

  /**
   * P379 — boolean conjunctive retrieval with exclusion: documents
   * containing ALL `mustTerms` and NONE of `mustNotTerms` — the
   * filter-style query class beside the RANKED retrievers (iv2 BM25 /
   * iv4 QLD score everything; a curation pass usually wants the exact
   * predicate "has X and Y, not Z" — license screens, topic gates,
   * blocklist-scoped corpus cuts). Emits (doc_id, n_must_occurrences)
   * for matches only.
   *
   * Scale shape: the term lists ride as `isin` literals pushed into the
   * token scan (no postings materialized); AND = one doc-keyed agg
   * demanding distinct-hits = |must|; NOT = one left-anti on the
   * excluded doc set. Counts exact; no floats anywhere.
   */
  def booleanRetrieve(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, mustTerms: Seq[String],
      mustNotTerms: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val must = mustTerms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val mustNot = mustNotTerms.map(_.toLowerCase.trim).filter(_.nonEmpty)
      .distinct
    require(must.nonEmpty, "booleanRetrieve: no must terms")
    require(must.intersect(mustNot).isEmpty,
      s"booleanRetrieve: contradictory terms ${must.intersect(mustNot)}")
    val toks = docs.where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol)))
        .as("token"))
    val matched = toks.where(col("token").isin(must: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("token")).as("__hits"),
        count(lit(1)).as("n_must_occurrences"))
      .where(col("__hits") === must.size)
    val out =
      if (mustNot.isEmpty) matched
      else matched.join(
        toks.where(col("token").isin(mustNot: _*)).select("doc_id")
          .distinct(),
        Seq("doc_id"), "left_anti")
    out.select(col("doc_id"), col("n_must_occurrences"))
  }

  /**
   * P64 — bigram-LM perplexity scoring (the CCNet-style quality filter: a
   * document's perplexity under a language model trained on the corpus —
   * or any reference corpus — separates fluent text from boilerplate and
   * garbage). Model: add-α smoothed bigram probabilities
   * p(w|prev) = (c(prev,w) + α) / (c(prev) + α·V); score:
   * perplexity = exp(−mean log p) over the document's adjacent bigrams.
   * Returns (id, n_bigrams, perplexity) — null perplexity for docs with
   * fewer than 2 tokens.
   *
   * Scale shape: the unigram/bigram count tables are map-side-combinable
   * aggregations; scoring joins each bigram occurrence to the two count
   * tables by token key (vocab-sized — AQE broadcasts them when small);
   * only the scalar vocabulary size V reaches the driver. Portability:
   * each log-prob is computed from exact integer counts, rounded at 9
   * decimals, and per-doc sums run in DECIMAL (exact, order-independent
   * — a double sum would drift with partition merge order); the final
   * exp is one call on an identical double, rounded at 6 (the t6/t11
   * cross-libm discipline).
   */
  def bigramPerplexity(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, alpha: Double = 1.0): org.apache.spark.sql.DataFrame = {
    require(alpha > 0, s"bigramPerplexity: alpha must be > 0, got $alpha")
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    val vRow = toks.select(explode(col("l")).as("t"))
      .agg(count_distinct(col("t")).as("v")).head()
    val v = if (vRow.isNullAt(0)) 0L else vRow.getLong(0)
    require(v > 0, "bigramPerplexity: corpus has no tokens")
    val uni = toks.select(explode(col("l")).as("prev"))
      .groupBy("prev").agg(count(lit(1)).as("cu"))
    val bigOcc = toks
      .select(col("id"), explode(ngramArray(col("l"), 2)).as("g"))
      .select(col("id"), split(col("g"), " ", 2).getItem(0).as("prev"),
        split(col("g"), " ", 2).getItem(1).as("w"))
    val big = bigOcc.groupBy("prev", "w").agg(count(lit(1)).as("cb"))
    val lp = round(log((col("cb") + lit(alpha)) / (col("cu") + lit(alpha * v))), 9)
    val perDoc = bigOcc
      .join(big, Seq("prev", "w"))
      .join(uni, Seq("prev"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lp.cast("decimal(38,18)")).cast("double").as("__slp"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(exp(-(col("__slp") / col("n_bigrams"))), 6).as("perplexity"))
  }

  /**
   * P65 — BM25 ranked retrieval: top-k documents for a bag of query terms
   * under Okapi BM25 (the Lucene idf form, which keeps idf positive when
   * a term hits most docs):
   * score = Σ_t ln(1 + (N−df+0.5)/(df+0.5)) · tf·(k1+1) /
   *         (tf + k1·(1−b+b·dl/avgdl)).
   * Returns (id, score, rank), rank 1..k by (score desc, id asc).
   *
   * Scale shape: tokens are filtered to the query's terms BEFORE any
   * aggregation (the corpus-sized explode collapses immediately); df is
   * a ≤|terms|-row table (broadcast); N and avgdl travel as scalar
   * literals (one corpus-length aggregation, the pmi totals pattern);
   * the final top-k is TakeOrderedAndProject, never a full sort.
   * Portability: per-(doc, term) scores round at 9 decimals and sum in
   * DECIMAL; the doc score rounds at 6 with an id tie-break (the t6
   * rank discipline).
   */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: query terms must be non-empty")
    require(k >= 1, s"bm25TopK: k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    val totals = toks.agg(count(lit(1)).as("n"),
      sum(size(col("l")).cast("long")).as("sdl")).head()
    val n = totals.getLong(0)
    require(n > 0, "bm25TopK: corpus is empty")
    val avgdl = (if (totals.isNullAt(1)) 0L else totals.getLong(1)).toDouble / n
    require(avgdl > 0, "bm25TopK: corpus has no tokens")
    val tf = toks
      .select(col("id"), size(col("l")).as("dl"), explode(col("l")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy("id", "dl", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = round(idf * (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") / lit(avgdl))), 9)
    val scored = tf.join(broadcast(df), Seq("w"))
      .groupBy("id")
      .agg(round(sum(termScore.cast("decimal(38,18)")).cast("double"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
  }

  /**
   * P348 — pseudo-relevance-feedback query expansion: run [[bm25TopK]],
   * treat its top `kDocs` documents as relevant, and rank the terms
   * those documents contain (minus the query's own) by r · idf — r =
   * how many feedback docs carry the term, idf the same Lucene-positive
   * form the retrieval used (the Rocchio/RSJ offer-weight shape, the
   * classic recall lever when the query vocabulary and the corpus
   * vocabulary diverge). Emits the top `mTerms` (term, r, df, weight,
   * rank); weight is the EXACT decimal product r × idf₉ (an integer ×
   * a 9-rounded term re-rounded in doubles is the o46 boundary trap).
   *
   * Shape: the bm25 ranking (token explode collapses on the query
   * filter), then a kDocs-row semi-join to the feedback vocabulary, a
   * vocab-sized df agg semi-joined to candidates, and a vocab-sized
   * rank window (the t19 capped-top-K idiom). Corpus-linear once; no
   * all-pairs anywhere.
   */
  def prfExpansionTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], kDocs: Int, mTerms: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(kDocs >= 1, s"prfExpansionTerms: kDocs must be >= 1, got $kDocs")
    require(mTerms >= 1,
      s"prfExpansionTerms: mTerms must be >= 1, got $mTerms")
    val terms = queryTerms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val top = bm25TopK(docs, idCol, textCol, queryTerms, kDocs, k1, b)
      .select(col("id"))
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    val n = toks.agg(count(lit(1)).as("n")).head().getLong(0)
    require(n > 0, "prfExpansionTerms: corpus is empty")
    val t = toks.select(col("id"), explode(col("l")).as("w")).distinct()
    val r = t.join(top.hint("shuffle_hash"), Seq("id"), "left_semi")
      .where(!col("w").isin(terms: _*))
      .groupBy("w").agg(count(lit(1)).as("r"))
    val df = t.join(r.select("w").hint("shuffle_hash"), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("df"))
    val idf9 = round(log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 9)
    val scored = r.join(df.hint("shuffle_hash"), Seq("w"))
      .select(col("w").as("term"), col("r"), col("df"),
        (col("r").cast("decimal(18,0)") * idf9.cast("decimal(18,9)"))
          .cast("double").as("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(mTerms)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(win))
  }

  /**
   * P99 — query-likelihood retrieval with Dirichlet smoothing (Zhai &
   * Lafferty): score(q, d) = Σ_t ln((tf + μ·p(t|C)) / (|d| + μ)) with
   * p(t|C) = cf/|C| — the language-modeling ranking that complements
   * [[bm25TopK]] (absent terms still contribute smoothed mass, so short
   * docs aren't auto-ranked by tf alone). Query terms absent from the
   * ENTIRE corpus are dropped (their ln 0 is undefined, and they shift
   * every document equally). Returns the top-`k` (id, score, rank).
   *
   * Shape: token explode → per-(doc, term) tf and per-term collection
   * frequency, the tiny term frame broadcast-cross-joined onto the
   * doc-length frame (docs × |q| rows), one shuffle_hash left join for
   * the tf, a keyed agg, TakeOrderedAndProject top-k. Portability: the
   * one ln per (doc, term) rounds at 9 and sums in DECIMAL; scores
   * round at 6 with the id tie-break (the t6 rank discipline).
   */
  def qldTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      mu: Double = 2000.0): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "qldTopK: query terms must be non-empty")
    require(k >= 1, s"qldTopK: k must be >= 1, got $k")
    require(mu > 0, s"qldTopK: mu must be > 0, got $mu")
    val terms = queryTerms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    val dl = toks.select(col("id"), size(col("l")).cast("long").as("dl"))
    val ctRow = toks.agg(sum(size(col("l")).cast("long"))).head()
    val ct = if (ctRow.isNullAt(0)) 0L else ctRow.getLong(0)
    require(ct > 0, "qldTopK: corpus has no tokens")
    val hits = toks.select(col("id"), explode(col("l")).as("w"))
      .where(col("w").isin(terms: _*))
    val occ = hits.groupBy("w").agg(count(lit(1)).as("cf"))
    val tf = hits.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val pc = col("cf").cast("double") / lit(ct.toDouble)
    val termScore = round(log(
      (coalesce(col("tf"), lit(0L)).cast("double") + lit(mu) * pc) /
        (col("dl").cast("double") + lit(mu))), 9)
    val scored = dl.crossJoin(broadcast(occ))
      .join(tf.hint("shuffle_hash"), Seq("id", "w"), "left")
      .groupBy("id")
      .agg(round(sum(termScore.cast("decimal(38,18)")).cast("double"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
  }

  /**
   * P60 — pointwise mutual information over ADJACENT token pairs:
   * PMI(a,b) = ln( (c_ab/N_pairs) / ((c_a/N_tok)·(c_b/N_tok)) ), the
   * collocation signal (word2vec-era preprocessing, multiword-expression
   * mining). `minPairCount` prunes the heavy tail BEFORE the unigram
   * joins — rare pairs dominate the pair space and carry no signal.
   *
   * Scale shape: one map-side-combinable pair count (adjacent pairs
   * only — corpus-linear, never a per-window cross product), one unigram
   * count, two joins of the pruned pair table against the vocab-sized
   * unigram table (AQE broadcasts the small side). The two normalizing
   * totals travel as scalar literals (the o3 pattern — bytes, not data)
   * and come from ONE token-length aggregation — N_tok = Σ len(l),
   * N_pairs = Σ max(len(l)−1, 0) — not from re-aggregating the exploded
   * pair/unigram tables (that formulation tokenized the corpus twice
   * more at build time). N_pairs is the PRE-prune total, so pruning
   * changes coverage, never the score of a surviving pair.
   */
  def pmiPairs(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minPairCount: Long): org.apache.spark.sql.DataFrame = {
    require(minPairCount >= 1,
      s"pmiPairs: minPairCount must be >= 1, got $minPairCount")
    val toks = docs.select(tokens(col(textCol)).as("l"))
    val totals = toks.agg(
      sum(size(col("l")).cast("long")).as("nt"),
      sum(greatest(size(col("l")) - 1, lit(0)).cast("long")).as("np")).head()
    val nTok = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val nPairs = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    require(nPairs > 0 && nTok > 0, "pmiPairs: corpus has no token pairs")
    val pairs = toks
      .select(explode(ngramArray(col("l"), 2)).as("g"))
      .select(split(col("g"), " ", 2).getItem(0).as("a"),
        split(col("g"), " ", 2).getItem(1).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val uni = toks.select(explode(col("l")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    pairs
      .where(col("c_ab") >= minPairCount)
      .join(uni.withColumnRenamed("token", "a").withColumnRenamed("c", "c_a"), Seq("a"))
      .join(uni.withColumnRenamed("token", "b").withColumnRenamed("c", "c_b"), Seq("b"))
      .select(col("a"), col("b"), col("c_ab"),
        log((col("c_ab").cast("double") / nPairs) /
          ((col("c_a").cast("double") / nTok) * (col("c_b").cast("double") / nTok)))
          .as("pmi"))
  }

  /**
   * P128 — Zipf-law fit of the corpus token-frequency distribution:
   * OLS of ln(freq) on ln(rank) over the top `maxRank` vocabulary
   * entries — slope ≈ −1 for natural language, and deviations flag
   * synthetic/templated corpora (too flat) or boilerplate floods (too
   * steep): a one-row corpus-health summary. Returns (n_ranks, slope,
   * intercept, r2) rounded at 6.
   *
   * Shape: one token agg, a TakeOrderedAndProject top-maxRank (never a
   * full vocabulary sort), a rank window over the CAPPED frame, one
   * closing moment agg. Portability: both ln's round at 9 BEFORE the
   * regression (the libm firewall), so the moment sums run on identical
   * decimal-exact operands; the closed form is the o11 sequence.
   */
  def zipfFit(docs: DataFrame, textCol: String, maxRank: Int): DataFrame = {
    require(maxRank >= 3, s"zipfFit: maxRank must be >= 3, got $maxRank")
    val counts = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(maxRank)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("token").asc)
    val pts = counts
      .withColumn("__r", row_number().over(w).cast("long"))
      .select(round(log(col("__r").cast("double")), 9)
          .cast("decimal(18,9)").as("__x"),
        round(log(col("c").cast("double")), 9)
          .cast("decimal(18,9)").as("__y"))
    val sums = pts.agg(count(lit(1)).as("n_ranks"),
      sum(col("__x")).cast("double").as("__sx"),
      sum(col("__y")).cast("double").as("__sy"),
      sum((col("__x").cast("decimal(19,9)") * col("__y").cast("decimal(19,9)")))
        .cast("double").as("__sxy"),
      sum((col("__x").cast("decimal(19,9)") * col("__x").cast("decimal(19,9)")))
        .cast("double").as("__sxx"),
      sum((col("__y").cast("decimal(19,9)") * col("__y").cast("decimal(19,9)")))
        .cast("double").as("__syy"))
    val nd = col("n_ranks").cast("double")
    val num = nd * col("__sxy") - col("__sx") * col("__sy")
    val den = nd * col("__sxx") - col("__sx") * col("__sx")
    val deny = nd * col("__syy") - col("__sy") * col("__sy")
    val slope = num / den
    sums
      .withColumn("slope", when(den > 0, round(slope, 6)))
      .withColumn("intercept",
        when(den > 0, round((col("__sy") - slope * col("__sx")) / nd, 6)))
      .withColumn("r2",
        when(den > 0 && deny > 0, round(num * num / (den * deny), 6)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /**
   * P118 — Jensen–Shannon divergence between two corpora's token
   * OCCURRENCE distributions: jsd = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m) with
   * m = ½(p+q) — the symmetric, bounded ([0, ln 2]) distribution-shift
   * measure a pipeline runs between train and validation splits (or two
   * crawl snapshots) to catch vocabulary drift BEFORE a model does.
   * Returns ONE row: (n_a, n_b, n_vocab, jsd).
   *
   * Shape: two map-side-combinable token aggs, one full-outer token join
   * (shuffle_hash — two post-agg no-stats sides, the dq3 rule), one
   * scalar totals broadcast, one closing agg. Portability: probabilities
   * are double divisions of exact counts on identical operands; each
   * ln term rounds at 9 and DECIMAL-sums (the libm firewall); the two
   * halves combine as one fixed double sequence rounded at 6.
   */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(out))
    val joined = counts(a, "__ca")
      .join(counts(b, "__cb").hint("shuffle_hash"), Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("__ca"), lit(0L)).as("ca"),
        coalesce(col("__cb"), lit(0L)).as("cb"))
    val totals = joined.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val p = col("ca").cast("double") / col("n_a").cast("double")
    val q = col("cb").cast("double") / col("n_b").cast("double")
    val m = lit(0.5) * (p + q)
    joined.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        when(col("ca") > 0, round(p * log(p / m), 9)).otherwise(lit(0.0))
          .cast("decimal(28,9)").as("__tp"),
        when(col("cb") > 0, round(q * log(q / m), 9)).otherwise(lit(0.0))
          .cast("decimal(28,9)").as("__tq"))
      .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
        count(lit(1)).as("n_vocab"),
        round(lit(0.5) * sum(col("__tp")).cast("double") +
          lit(0.5) * sum(col("__tq")).cast("double"), 6).as("jsd"))
  }

  /**
   * P208 — language-mix audit: chunk each document ([[chunkTokens]],
   * no overlap), run [[langId]] per chunk, and score the share of
   * chunks DISAGREEING with the document-level call — the
   * code-switching / concatenation detector (a doc that is "en" overall
   * but 40% "fr" chunks is two documents glued together, which poisons
   * both language filtering and dedup). Emits (id, doc_lang, n_chunks,
   * n_match, mix_ratio, is_mixed); token-less docs have no chunks and
   * drop.
   *
   * Shapes: the chunker's bounded explode, one langId projection per
   * level, one shuffle_hash join + keyed count agg. mix_ratio is one
   * double division of exact counts rounded at 6; is_mixed reads the
   * ROUNDED ratio against `mixBar`.
   */
  def languageMix(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 32, mixBar: Double = 0.25): DataFrame = {
    require(chunkSize >= 1, s"languageMix: chunkSize must be >= 1")
    require(mixBar > 0 && mixBar < 1,
      s"languageMix: mixBar must sit in (0,1), got $mixBar")
    val base = df.where(col(idCol).isNotNull && col(textCol).isNotNull)
    val doc = base.select(col(idCol).as("id"),
      langId(col(textCol)).as("doc_lang"))
    val chunks = chunkTokens(base, idCol, textCol, chunkSize, overlap = 0)
      .select(col("id"), langId(col("chunk_text")).as("__cl"))
    chunks
      .join(doc.hint("shuffle_hash"), Seq("id"))
      .groupBy(col("id"), col("doc_lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__cl") === col("doc_lang"), 1L).otherwise(0L))
          .as("n_match"))
      .withColumn("mix_ratio",
        round(lit(1.0) - col("n_match").cast("double") /
          col("n_chunks").cast("double"), 6))
      .withColumn("is_mixed", col("mix_ratio") > mixBar)
  }

  /**
   * P197 — Simpson diversity per corpus slice: D = Σ nᵢ(nᵢ−1)/(N(N−1))
   * over token frequencies — the probability two tokens drawn without
   * replacement coincide — plus effective vocabulary 1/D ("this slice
   * behaves like a uniform corpus over 1/D tokens"). The concentration
   * complement to P116's entropy: entropy weights the tail, Simpson the
   * head, so a boilerplate-flooded slice shows a LOW 1/D long before
   * entropy moves. Emits (key, n_tokens, vocab, simpson, eff_vocab);
   * single-token slices → null D.
   *
   * Shapes: one (key, token) count agg + one keyed agg — map-side
   * combinable end to end, no windows. All moments exact BIGINTs
   * (nᵢ(nᵢ−1) ≤ N² ≪ 2⁶² for any slice a diversity read makes sense
   * on); D and 1/D are double divisions rounded at 6, 1/D reading the
   * ROUNDED D.
   */
  def simpsonDiversity(docs: DataFrame, keyCol: String,
      textCol: String): DataFrame = {
    val freq = docs
      .where(col(keyCol).isNotNull && col(textCol).isNotNull)
      .select(col(keyCol).as("__k"), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__k"), col("__t")).agg(count(lit(1)).as("__c"))
    freq.groupBy(col("__k"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("__c") * (col("__c") - 1)).as("__num"))
      .withColumn("simpson",
        when(col("n_tokens") > 1,
          round(col("__num").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)).cast("double"), 6)))
      .withColumn("eff_vocab",
        when(col("simpson") > 0, round(lit(1.0) / col("simpson"), 6)))
      .drop("__num")
      .withColumnRenamed("__k", keyCol)
  }

  /**
   * P263 — corpus entropy rate: unigram entropy H(w), bigram
   * conditional entropy H(w₂|w₁) and the redundancy 1 − H₂/H₁ — the
   * information-theory read on a corpus ("how predictable is the next
   * token"): templated/boilerplate corpora show LOW conditional entropy
   * and high redundancy, and a dedup/curation pass should RAISE the
   * rate; the corpus-level complement to P44's per-doc entropy. Emits
   * ONE row (n_tokens, n_bigrams, vocab, h_unigram, h_bigram_cond,
   * redundancy).
   *
   * Shapes: one unigram agg, one bigram agg (the P64 ngramArray — no
   * windows), predecessor totals from the bigram frame (the P64
   * convention), scalar totals broadcast. Cross-engine: every
   * probability is an exact integer ratio; ln rounds at 9 and the
   * p·ln p products round at 9 and DECIMAL-sum (the o52 firewall);
   * entropies round at 6.
   */
  def entropyRate(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    val uni = toks.select(explode(col("l")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val uniTot = uni.agg(sum(col("__c")).as("__n1"),
      count(lit(1)).as("vocab"))
    val bi = toks.select(explode(ngramArray(col("l"), 2)).as("g"))
      .select(split(col("g"), " ", 2).getItem(0).as("w1"),
        split(col("g"), " ", 2).getItem(1).as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    val biTot = c2.agg(sum(col("__c2")).as("__n2"))
    val h1 = uni.crossJoin(broadcast(uniTot))
      .withColumn("__p", col("__c").cast("double") /
        col("__n1").cast("double"))
      .agg(sum(round(col("__p") * round(log(col("__p")), 9), 9)
        .cast("decimal(28,9)")).as("__s1"))
    val h2 = c2.join(c1.hint("shuffle_hash"), Seq("w1"))
      .crossJoin(broadcast(biTot))
      .withColumn("__term",
        round((col("__c2").cast("double") / col("__n2").cast("double")) *
          round(log(col("__c2").cast("double") /
            col("__c1").cast("double")), 9), 9).cast("decimal(28,9)"))
      .agg(sum(col("__term")).as("__s2"))
    uniTot.join(broadcast(biTot)).join(broadcast(h1)).join(broadcast(h2))
      .select(col("__n1").as("n_tokens"), col("__n2").as("n_bigrams"),
        col("vocab"),
        round(-col("__s1").cast("double"), 6).as("h_unigram"),
        round(-col("__s2").cast("double"), 6).as("h_bigram_cond"))
      .withColumn("redundancy",
        when(col("h_unigram") > 0,
          round(lit(1.0) - col("h_bigram_cond") / col("h_unigram"), 6)))
  }

  /**
   * P255 — n-gram originality per document: the share of a document's
   * DISTINCT word n-grams whose corpus-wide FIRST occurrence (minimum
   * doc id) is this document — the diversity/memorization read at the
   * doc level ("originality 0.05 = this doc is assembled almost
   * entirely from n-grams that already exist upstream": boilerplate,
   * templates, near-copies), the per-doc complement to P52's
   * cross-corpus decontamination. Emits (id, n_grams, n_first,
   * originality); docs with no n-gram (< n tokens) drop.
   *
   * Shape: one distinct (doc, gram) explode, one gram-keyed min agg
   * (map-side combinable), one shuffle-hash join back, one doc agg —
   * no windows. Exact integers and one rounded ratio. First-occurrence
   * attribution follows doc-id order, the same convention P174's
   * Heaps checkpoints pin.
   */
  def ngramOriginality(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val grams = df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(array_distinct(ngramArray(tokens(col(textCol)), n)))
          .as("gram"))
    val firstSeen = grams.groupBy(col("gram"))
      .agg(min(col("id")).as("__first"))
    grams.join(firstSeen.hint("shuffle_hash"), Seq("gram"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L))
          .as("n_first"))
      .withColumn("originality",
        round(col("n_first").cast("double") / col("n_grams").cast("double"),
          6))
  }

  /**
   * P246 — vocabulary coverage at frequency thresholds: for each
   * min-frequency rung, how many token TYPES survive and what share of
   * the corpus token MASS they cover — the tokenizer/vocab budget
   * audit ("a 5+-frequency vocab covers 97% of tokens; everything
   * rarer is the OOV tail a byte-fallback eats") read before fixing a
   * vocab size. Emits per rung (min_freq, n_types, token_mass, share).
   *
   * Shapes: one token-frequency agg (map-side combinable), the rung
   * ladder broadcast k-row over the VOCAB-sized frequency frame, one
   * conditional agg per rung fused into a single grouped pass, a
   * 1-row total broadcast. Exact BIGINTs and rounded shares — no
   * ranking, no window (frequency thresholds, not top-k, exactly so).
   */
  def vocabCoverage(df: DataFrame, textCol: String,
      minFreqs: Seq[Long] = Seq(2L, 5L, 10L, 50L)): DataFrame = {
    require(minFreqs.nonEmpty && minFreqs.forall(_ >= 1),
      s"vocabCoverage: thresholds must be >= 1, got $minFreqs")
    require(minFreqs.distinct.size == minFreqs.size,
      s"vocabCoverage: duplicate thresholds in $minFreqs")
    val spark = df.sparkSession
    import spark.implicits._
    val ladder = minFreqs.sorted.toDF("min_freq")
    val freqs = df.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__f"))
    val total = freqs.agg(sum(col("__f")).as("__tot"))
    freqs.crossJoin(broadcast(ladder)) // k-row rung ladder
      .where(col("__f") >= col("min_freq"))
      .groupBy(col("min_freq"))
      .agg(count(lit(1)).as("n_types"), sum(col("__f")).as("token_mass"))
      .join(broadcast(total)) // 1-row scalar side
      .withColumn("share",
        round(col("token_mass").cast("double") /
          col("__tot").cast("double"), 6))
      .drop("__tot")
  }

  /** The nDCG discount ladder 1/log₂(i+1), i = 1..k — computed ONCE on
    * the driver so the operator and any oracle generator embed the
    * IDENTICAL double literals (the EWMA weight-ladder rule; no runtime
    * libm on either engine). */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** [[ndcgDiscounts]] as SQL double literals (shortest round-trip repr,
    * e0-suffixed when bare). */
  def ndcgDiscountLiterals(k: Int): Seq[String] = ndcgDiscounts(k).map { d =>
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /**
   * P273 — nDCG@k retrieval evaluation: DCG = Σ rel_i / log₂(i+1) over
   * the ranked list, normalized by the ideal DCG of the top-k relevance
   * grades — the graded-relevance score beside P106's recall@k (recall
   * can't see ORDER; nDCG is what actually grades a ranker). Takes a
   * ranked frame (id, rank 1..k) and a relevance frame (id, integer
   * grade ≥ 1 — ungraded ids count 0 when ranked, and only graded ids
   * form the ideal list, on BOTH sides of the contract). Emits ONE row
   * (k, n_ranked, n_graded, dcg, idcg, ndcg).
   *
   * Shape: a keyed join of two k/graded-sized frames, an orderBy+limit
   * (TakeOrdered — no corpus window) for the ideal list, and a
   * row_number over that ≤ k-row frame (the adjudicated k-row window
   * class). Cross-engine: grades exact BIGINTs; the discount ladder is
   * [[ndcgDiscounts]] literals embedded identically on both sides;
   * per-position terms round at 9 into DECIMAL(28,9) sums; closing
   * ratio rounds at 6.
   */
  def ndcgAtK(ranked: org.apache.spark.sql.DataFrame, idCol: String,
      rankCol: String, rels: org.apache.spark.sql.DataFrame,
      relIdCol: String, relCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && k <= 100, s"ndcgAtK: k must be in 1..100, got $k")
    val discArr = array(ndcgDiscounts(k).map(lit): _*)
    val r = ranked.where(col(rankCol) <= k)
      .select(col(idCol).as("__id"), col(rankCol).cast("int").as("__r"))
    val rl = rels.where(col(relCol).isNotNull && col(relIdCol).isNotNull)
      .select(col(relIdCol).as("__id"), col(relCol).cast("long").as("__rel"))
    val dcgAgg = r.join(rl.hint("shuffle_hash"), Seq("__id"), "left")
      .select(round(coalesce(col("__rel"), lit(0L)).cast("double") *
        element_at(discArr, col("__r")), 9).cast("decimal(28,9)").as("__t"))
      .agg(count(lit(1)).as("n_ranked"), sum(col("__t")).as("__dcg"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rel").desc, col("__id").asc)
    val idealAgg = rl.orderBy(col("__rel").desc, col("__id").asc).limit(k)
      .withColumn("__r", row_number().over(wIdeal))
      .select(round(col("__rel").cast("double") *
        element_at(discArr, col("__r")), 9).cast("decimal(28,9)").as("__t"))
      .agg(sum(col("__t")).as("__idcg"))
    val graded = rl.agg(count(lit(1)).as("n_graded"))
    dcgAgg.crossJoin(broadcast(idealAgg)) // 1-row scalar sides
      .crossJoin(broadcast(graded))
      .select(lit(k).as("k"), col("n_ranked"), col("n_graded"),
        round(coalesce(col("__dcg").cast("double"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("__idcg").cast("double"), lit(0.0)), 6)
          .as("idcg"),
        when(col("__idcg").isNotNull && col("__idcg") > 0,
          round(coalesce(col("__dcg").cast("double"), lit(0.0)) /
            col("__idcg").cast("double"), 6)).as("ndcg"))
  }

  /**
   * P277 — BPE merge-step candidates: the top-k adjacent character
   * pairs inside whitespace words across the corpus — exactly the
   * statistic the first byte-pair-encoding merge iteration maximizes
   * (and re-running it on each round's merged symbols IS the BPE
   * trainer; one distributed step is the building block). The
   * tokenizer-drift read: compare a corpus's top pairs against the
   * pairs a deployed vocabulary merged first. Emits the top-k
   * (pair, n), count-desc with pair tie-break — no window at all, the
   * limit boundary is deterministic.
   *
   * Shape: words explode to (position, 2-gram) pairs via a codegen
   * `sequence` index (no interpreted HOF lambda over the corpus — the
   * t7 lesson), one pair-keyed count agg (map-side combinable), one
   * TakeOrdered top-k. Scales to any corpus: the agg domain is the
   * alphabet², not the corpus.
   */
  def bpeMergeCandidates(df: org.apache.spark.sql.DataFrame,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && k <= 1000,
      s"bpeMergeCandidates: k must be in 1..1000, got $k")
    df.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("__w"))
      .where(length(col("__w")) >= 2)
      .select(col("__w"),
        explode(sequence(lit(1), length(col("__w")) - 1)).as("__i"))
      .select(expr("substr(__w, __i, 2)").as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /**
   * P283 — pairwise group overlap on word-BIGRAM vocabularies: for
   * every group pair, Jaccard |A∩B|/|A∪B| of their distinct bigram
   * sets — "which sources are feeding me the same text" at a
   * granularity where a shared unigram vocabulary (this corpus: ~31
   * words EVERYWHERE, unigram Jaccard ≈ 1 — measured) still
   * separates. The corpus-curation read behind source pruning and
   * mixture design. Emits per (group_a < group_b):
   * (group_a, group_b, n_a, n_b, n_common, jaccard), ordered.
   *
   * Shape: bigrams via a positional self-join on (id, pos+1) with
   * explicitly RENAMED projections (the d17 alias-resolution trap),
   * distinct per group, then an equi-join on the bigram key — pairs
   * materialize per SHARED bigram, never all-pairs of rows; the
   * closing frame is groups². Cross-engine: set sizes exact BIGINTs,
   * one closing double division at 6.
   */
  def groupBigramJaccard(df: org.apache.spark.sql.DataFrame,
      groupCol: String, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val ex = df.where(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(textCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__w")))
    val left = ex.select(col("__g"), col("__id"), col("__pos"), col("__w"))
    val right = ex.select(col("__id").as("__id2"),
      (col("__pos") - 1).as("__pos2"), col("__w").as("__w2"))
    val bigrams = left.join(right.hint("shuffle_hash"),
        col("__id") === col("__id2") && col("__pos") === col("__pos2"))
      .select(col("__g"), concat_ws(" ", col("__w"), col("__w2")).as("__b"))
      .distinct()
    val sizes = bigrams.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val a = bigrams.select(col("__g").as("group_a"), col("__b"))
    val b = bigrams.select(col("__g").as("group_b"), col("__b").as("__b2"))
    val inter = a.join(b.hint("shuffle_hash"),
        col("__b") === col("__b2") && col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("__g").as("group_a"),
        col("__n").as("n_a"))), Seq("group_a"))
      .join(broadcast(sizes.select(col("__g").as("group_b"),
        col("__n").as("n_b"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /**
   * P315 — term burstiness for the top-`topK` corpus terms: the
   * variance-to-mean ratio of per-document counts over ALL documents
   * (absent docs count 0) — Poisson scatter reads VMR ≈ 1 (function
   * words), content/topic words clump (VMR ≫ 1), and templated
   * boilerplate reads VMR ≪ its frequency peers. The
   * frequency-vs-burstiness split is the classic content-word detector
   * that raw counts can't give. Emits per term: rank, term, total,
   * doc_freq, mean, vmr.
   *
   * Shape: one (term, doc) agg, one term agg, a TakeOrderedAndProject
   * top-K (never a full vocabulary sort), then a rank window over the
   * CAPPED K-row frame (the zipfFit idiom — allowlisted). Cross-engine:
   * counts exact (squares DECIMAL(19,0)-widened); mean/VMR are fixed
   * double sequences on exact operands, rounded at 6; zero-docs enter
   * through the corpus doc count, never a densified grid.
   */
  def termBurstiness(docs: DataFrame, textCol: String, idCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"termBurstiness: topK must be >= 1, got $topK")
    val base = docs.where(col(textCol).isNotNull && col(idCol).isNotNull)
    val dAgg = base.agg(count(lit(1)).as("__d"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val perTerm = base
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("__id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("__c")).as("total"),
        sum(d19(col("__c")) * d19(col("__c"))).cast("double").as("__s2"))
    val top = perTerm.orderBy(col("total").desc, col("term").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total").desc, col("term").asc)
    val dd = col("__d").cast("double")
    val s1 = col("total").cast("double")
    val mean = s1 / dd
    val varS = (dd * col("__s2") - s1 * s1) / (dd * (dd - lit(1.0)))
    top.crossJoin(broadcast(dAgg)) // 1-row scalar side
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("term"), col("total"), col("doc_freq"),
        round(mean, 6).as("mean"),
        when(col("__d") > 1 && col("total") > 0, round(varS / mean, 6))
          .as("vmr"))
      .orderBy(col("rank"))
  }

  /**
   * P316 — Gries' deviation of proportions (DP) for the top-`topK`
   * terms across corpus parts: DP = ½·Σ_parts |obs_p − exp_p| with
   * obs_p the term's count share in part p and exp_p the part's token
   * share — 0 = perfectly dispersed (the term follows the corpus),
   * 1 = concentrated in one part. THE source-skew read per term: a
   * "frequent" term living in one shard is a contamination/boilerplate
   * signal that corpus-wide counts hide. Absent (term, part) cells
   * contribute their full exp_p — the grid is DENSIFIED (the dq11
   * spine rule). Emits per term: rank, term, total, dp.
   *
   * Shape: one part agg, one (term, part) agg, a top-K cap, a K×P
   * broadcast generator grid left-joined to the counts, one keyed term
   * agg, a rank window over the K-row closing frame (allowlisted).
   * Cross-engine: all counts exact; per-part terms are fixed double
   * sequences rounded at 9 through DECIMAL(28,9); DP rounds at 6.
   */
  def griesDispersion(docs: DataFrame, textCol: String, partCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"griesDispersion: topK must be >= 1, got $topK")
    val base = docs.where(col(textCol).isNotNull && col(partCol).isNotNull)
      .select(col(partCol).as("__p"), tokens(col(textCol)).as("__l"))
    val parts = base.groupBy(col("__p"))
      .agg(sum(size(col("__l")).cast("long")).as("__ptok"))
    val tot = parts.agg(sum(col("__ptok")).as("__t"))
    val tp = base.select(col("__p"), explode(col("__l")).as("term"))
      .groupBy(col("term"), col("__p")).agg(count(lit(1)).as("__c"))
    val top = tp.groupBy(col("term")).agg(sum(col("__c")).as("total"))
      .orderBy(col("total").desc, col("term").asc).limit(topK)
    val grid = top.crossJoin(broadcast(parts)) // K×P generator grid
      .join(tp.hint("shuffle_hash"), Seq("term", "__p"), "left")
      .crossJoin(broadcast(tot)) // 1-row scalar side
    val obs = coalesce(col("__c"), lit(0L)).cast("double") /
      col("total").cast("double")
    val expd = col("__ptok").cast("double") / col("__t").cast("double")
    val dp = grid
      .select(col("term"), col("total"),
        round(abs(obs - expd), 9).cast("decimal(28,9)").as("__dpt"))
      .groupBy(col("term"), col("total"))
      .agg(sum(col("__dpt")).cast("double").as("__dp"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total").desc, col("term").asc)
    dp.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("term"), col("total"),
        round(lit(0.5) * col("__dp"), 6).as("dp"))
      .orderBy(col("rank"))
  }

  /**
   * P317 — Dunning log-likelihood (G²) collocations: for each bigram
   * (a, b) above `minPairCount`, the 2×2 table over the bigram corpus
   * (first-position margin c_a, second-position margin c_b, total N)
   * scored by G² = 2·ΣO·ln(O/E) — the collocation test that, unlike
   * P60's PMI, does NOT explode on rare pairs (PMI ranks two
   * singletons co-occurring once above "of the"; G² weights by
   * evidence). Emits the top-`topK` by G²: rank, a, b, c_ab, c_a,
   * c_b, g2.
   *
   * Shape: one bigram agg, two margin aggs joined back (shuffle_hash),
   * a broadcast 1-row total, a TakeOrderedAndProject top-K + rank
   * window over the capped frame (allowlisted). Cross-engine: all
   * counts exact BIGINTs; each cell term is row-local — O·ln(O/E)
   * with the ln on identical doubles rounded at 6 (the firewall), the
   * four-term sum a fixed expression order; G² rounds at 6. Zero
   * cells contribute 0 (and a zero expectation forces a zero cell, so
   * no ln(0) path exists).
   */
  def dunningG2(docs: DataFrame, textCol: String, minPairCount: Long,
      topK: Int): DataFrame = {
    require(minPairCount >= 1,
      s"dunningG2: minPairCount must be >= 1, got $minPairCount")
    require(topK >= 1, s"dunningG2: topK must be >= 1, got $topK")
    val j = bigramMarginTable(docs, textCol, minPairCount)
    val nd = col("__n").cast("double")
    val cad = col("c_a").cast("double")
    val cbd = col("c_b").cast("double")
    def cell(o: Column, e: Column) =
      when(o > 0, o.cast("double") * round(log(o.cast("double") / e), 6))
        .otherwise(lit(0.0))
    val g2 = round(lit(2.0) * (
      cell(col("c_ab"), cad * cbd / nd) +
      cell(col("c_a") - col("c_ab"), cad * (nd - cbd) / nd) +
      cell(col("c_b") - col("c_ab"), (nd - cad) * cbd / nd) +
      cell(col("__n") - col("c_a") - col("c_b") + col("c_ab"),
        (nd - cad) * (nd - cbd) / nd)), 6)
    val scored = j.select(col("a"), col("b"), col("c_ab"), col("c_a"),
      col("c_b"), g2.as("g2"))
    val top = scored.orderBy(col("g2").desc, col("a").asc, col("b").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("g2").desc, col("a").asc, col("b").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("a"), col("b"), col("c_ab"), col("c_a"),
        col("c_b"), col("g2"))
      .orderBy(col("rank"))
  }

  /** Shared bigram 2×2 margin table — (a, b, c_ab, c_a, c_b, __n) for
    * bigrams with c_ab ≥ minPairCount over the bigram corpus. P317's G²
    * and P370's t-score read the SAME table, so its construction (and
    * the margin definition: position-wise counts over bigrams, not raw
    * token counts) exists exactly once. */
  private def bigramMarginTable(docs: DataFrame, textCol: String,
      minPairCount: Long): DataFrame = {
    val toks = docs.where(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("l"))
    val pairs = toks
      .select(explode(ngramArray(col("l"), 2)).as("g"))
      .select(split(col("g"), " ", 2).getItem(0).as("a"),
        split(col("g"), " ", 2).getItem(1).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ca = pairs.groupBy("a").agg(sum(col("c_ab")).as("c_a"))
    val cb = pairs.groupBy("b").agg(sum(col("c_ab")).as("c_b"))
    val nAgg = pairs.agg(sum(col("c_ab")).as("__n"))
    pairs.where(col("c_ab") >= minPairCount)
      .join(ca.hint("shuffle_hash"), Seq("a"))
      .join(cb.hint("shuffle_hash"), Seq("b"))
      .crossJoin(broadcast(nAgg)) // 1-row scalar side
  }

  /**
   * P370 — collocation t-score (Church & Hanks): for each bigram above
   * `minPairCount`, t ≈ (O − E)/√O with O = c_ab and E = c_a·c_b/N over
   * the shared 2×2 margin table — the CONSERVATIVE member of the
   * collocation family: PMI (P60) over-ranks rare pairs, G² (P317) is
   * the likelihood test, t-score demands the observed excess be large
   * relative to its own sampling noise, which surfaces high-frequency
   * fixed phrases. Emits the top-`topK`: rank, a, b, c_ab, c_a, c_b,
   * t_score.
   *
   * Cross-engine: the numerator c_ab·N − c_a·c_b is ONE exact BIGINT
   * product difference (bigram totals keep it far under 2⁶²); the
   * score is a single division by N·√c_ab (√ of an integer-valued
   * double — bit-identical on both engines), rounded at 6. Shape: the
   * shared margin joins + TakeOrderedAndProject + the rank window over
   * the ≤topK-row capped frame (the t37-adjudicated class).
   */
  def tScoreCollocations(docs: DataFrame, textCol: String,
      minPairCount: Long, topK: Int): DataFrame = {
    require(minPairCount >= 1,
      s"tScoreCollocations: minPairCount must be >= 1, got $minPairCount")
    require(topK >= 1, s"tScoreCollocations: topK must be >= 1, got $topK")
    val j = bigramMarginTable(docs, textCol, minPairCount)
    val num = col("c_ab") * col("__n") - col("c_a") * col("c_b")
    val t = round(num.cast("double") /
      (col("__n").cast("double") * sqrt(col("c_ab").cast("double"))), 6)
    val scored = j.select(col("a"), col("b"), col("c_ab"), col("c_a"),
      col("c_b"), t.as("t_score"))
    val top = scored
      .orderBy(col("t_score").desc, col("a").asc, col("b").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t_score").desc, col("a").asc, col("b").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("a"), col("b"), col("c_ab"), col("c_a"),
        col("c_b"), col("t_score"))
      .orderBy(col("rank"))
  }

  /**
   * P371 — encoding-anomaly (mojibake) audit: occurrences of classic
   * mis-decode signatures per marker class across the corpus — the
   * UTF-8-read-as-Latin-1 digraphs ('Ã©' for é, 'â€™' for a curly
   * apostrophe) and the U+FFFD replacement character a lossy transcode
   * leaves behind. A corpus-level data-quality gate in front of any
   * text pipeline: tokenizers shred mojibake into junk subwords and
   * quality scores silently degrade. Emits one row per marker:
   * n_docs hit, total occurrences, corpus doc count, doc share.
   *
   * Shape: ONE corpus scan — per-marker occurrence counts are
   * length-difference arithmetic (no regex) folded in a single agg,
   * then a `stack` melt of the 1-row result (3 selects over the agg
   * would re-execute the scan per marker). Counts are exact BIGINTs;
   * the share is one division rounded at 6.
   */
  def encodingAnomalies(docs: DataFrame, textCol: String,
      markers: Seq[(String, String)]): DataFrame = {
    require(markers.nonEmpty, "encodingAnomalies: no markers")
    require(markers.map(_._1).distinct.size == markers.size,
      s"encodingAnomalies: duplicate marker names")
    require(markers.forall(_._2.nonEmpty),
      "encodingAnomalies: blank marker string")
    require(markers.forall(m =>
        !m._1.contains("'") && !m._1.contains("\\")),
      "encodingAnomalies: marker names must not contain quotes or " +
        "backslashes (they ride into a stack() SQL literal)")
    // divide by CODEPOINT count, not String.length — Spark's length()
    // counts codepoints, so a non-BMP marker (one codepoint, two UTF-16
    // units) would otherwise halve (truncate to 0) its occurrences
    val occ = markers.zipWithIndex.map { case ((_, m), i) =>
      ((length(col("__t")) -
        length(replace(col("__t"), lit(m), lit("")))) /
        lit(m.codePointCount(0, m.length)))
        .cast("long").as(s"__o$i")
    }
    val aggs = markers.zipWithIndex.flatMap { case (_, i) =>
      Seq(sum(when(col(s"__o$i") > 0, 1L).otherwise(0L)).as(s"__d$i"),
        sum(col(s"__o$i")).as(s"__n$i"))
    }
    val one = docs.where(col(textCol).isNotNull)
      .select(col(textCol).as("__t"))
      .select(occ: _*)
      .agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = markers.zipWithIndex
      .map { case ((name, _), i) => s"'$name', __d$i, __n$i" }
      .mkString(", ")
    one
      .select(
        expr(s"stack(${markers.size}, $stackArgs) " +
          "as (marker, n_docs, n_occurrences)"),
        col("__total").cast("long").as("n_total_docs"))
      .select(col("marker"), col("n_docs").cast("long").as("n_docs"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        col("n_total_docs"),
        when(col("n_total_docs") > 0,
          round(col("n_docs").cast("double") /
            col("n_total_docs").cast("double"), 6)).as("doc_share"))
  }

  /**
   * P365 — keyword-in-context (concordance) extraction: every
   * occurrence of `term` with its ±`window` token neighborhoods — the
   * audit view behind every content filter (WHAT does 'dup' actually
   * look like in this corpus before I blocklist it; what surrounds the
   * PII the redactor hit). Emits (id, pos, term, left_ctx, right_ctx);
   * contexts clamp at document edges (empty string, not NULL — an
   * edge hit HAS an empty side).
   *
   * Shapes: one token explode collapsed by the term filter, contexts
   * via compiled array slices of the carried token list — corpus-linear,
   * no joins, no windows.
   */
  def keywordInContext(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, term: String,
      window: Int = 3): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && window <= 32,
      s"keywordInContext: window must sit in 1..32, got $window")
    val t = term.toLowerCase.trim
    require(t.nonEmpty, "keywordInContext: blank term")
    val leftStart0 = greatest(col("pos") - window, lit(0))
    docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__l"))
      .select(col("id"), col("__l"),
        posexplode(col("__l")).as(Seq("pos", "__w")))
      .where(col("__w") === t)
      .select(col("id"), col("pos"), lit(t).as("term"),
        array_join(slice(col("__l"), leftStart0 + 1,
          col("pos") - leftStart0), " ").as("left_ctx"),
        array_join(slice(col("__l"), col("pos") + 2,
          least(lit(window), size(col("__l")) - col("pos") - 1)), " ")
          .as("right_ctx"))
  }

  /**
   * P354 — vocabulary-richness panel per document: the frequency
   * spectrum V_i (how many words occur exactly i times) folded into the
   * classic size-robust richness measures — Yule's K = 10⁴(Σi²V_i − N)/N²
   * (repeat-rate; LOW = rich vocabulary), Sichel's S = V₂/V, the hapax
   * share V₁/V, and plain TTR = V/N (which K and S exist to replace —
   * TTR collapses as N grows, K is length-stable). The per-document
   * "is this text formulaic" read the P64 perplexity and P334 burstiness
   * signals complement.
   *
   * Cross-engine: the spectrum is exact BIGINTs; K/S/hapax/TTR each
   * close with one double expression on identical integer operands.
   * The i²·V_i products ride in BIGINT — safe while no single word
   * exceeds ~2^31 occurrences in one document (the o36 bound class;
   * raise-guarded). Shapes: two map-side-combinable aggs ((doc, word)
   * then (doc, i)) + one doc-keyed fold — no windows, no joins.
   */
  def vocabularyRichness(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val wc = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("__w"))
      .groupBy("id", "__w").agg(count(lit(1)).as("__i"))
      .withColumn("__i",
        when(col("__i") >= lit(1L << 31),
          raise_error(lit("vocabularyRichness: word count exceeds 2^31")))
          .otherwise(col("__i")))
    val spec = wc.groupBy(col("id"), col("__i"))
      .agg(count(lit(1)).as("__vi"))
    val agg = spec.groupBy("id").agg(
      sum(col("__i") * col("__vi")).as("n_tokens"),
      sum(col("__vi")).as("vocab"),
      sum(when(col("__i") === 1, col("__vi")).otherwise(0L)).as("v1"),
      sum(when(col("__i") === 2, col("__vi")).otherwise(0L)).as("v2"),
      sum(col("__i") * col("__i") * col("__vi")).as("__s2"))
    val n = col("n_tokens").cast("double")
    agg.select(col("id"), col("n_tokens"), col("vocab"), col("v1"),
      col("v2"),
      round(lit(10000.0) * (col("__s2") - col("n_tokens")).cast("double") /
        (n * n), 6).as("yule_k"),
      round(col("v2").cast("double") / col("vocab").cast("double"), 6)
        .as("sichel_s"),
      round(col("v1").cast("double") / col("vocab").cast("double"), 6)
        .as("hapax_share"),
      round(col("vocab").cast("double") / n, 6).as("ttr"))
  }

  /**
   * P355 — batch retrieval evaluation: for each (query, terms,
   * relevance bar) triple, run the P65 BM25 ranking and score it
   * against occurrence-count relevance (a doc is relevant when it
   * carries ≥ minOcc query-term occurrences) — reciprocal rank of the
   * first relevant hit (0 when none lands in the top k), precision@k,
   * and recall@k. The rank-position readout beside iv5's graded nDCG:
   * MRR sees WHERE the first good hit sits, P/R@k see the set overlap.
   *
   * Cross-engine: the ranking is [[bm25TopK]] verbatim (the iv5-proven
   * chain); relevance and overlap are exact BIGINT counts; each metric
   * closes with one double division on identical operands. Shapes: per
   * query one k-row ranked frame left-joined to the relevant-id set
   * (shuffle_hash — the post-agg-side no-stats rule) and two scalar
   * aggs equi-joined on the query tag (no broadcast cross-join — the
   * BNL allowlist stays closed).
   */
  def retrievalEval(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, evalQueries: Seq[(String, Seq[String], Long)],
      k: Int): org.apache.spark.sql.DataFrame = {
    require(evalQueries.nonEmpty, "retrievalEval: need at least one query")
    require(k >= 1, s"retrievalEval: k must be >= 1, got $k")
    require(evalQueries.map(_._1).distinct.size == evalQueries.size,
      "retrievalEval: duplicate query names")
    evalQueries.map { case (qname, terms, minOcc) =>
      require(minOcc >= 1L,
        s"retrievalEval: minOcc must be >= 1 for $qname, got $minOcc")
      val tset = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
      require(tset.nonEmpty, s"retrievalEval: $qname has no usable terms")
      val ranked = bm25TopK(docs, idCol, textCol, tset, k)
      val rel = docs
        .select(col(idCol).as("__rid"),
          explode(tokens(col(textCol))).as("__w"))
        .where(col("__w").isin(tset: _*))
        .groupBy("__rid").agg(count(lit(1)).as("__occ"))
        .where(col("__occ") >= minOcc)
        .select(col("__rid"), lit(1L).as("__f"))
      val totals = rel.agg(count(lit(1)).as("n_relevant"))
        .withColumn("query", lit(qname))
      val topk = ranked
        .join(rel.hint("shuffle_hash"), col("id") === col("__rid"), "left")
        .agg(sum(coalesce(col("__f"), lit(0L))).as("rel_in_topk"),
          min(when(col("__f").isNotNull, col("rank"))).as("first_rel_rank"))
        .withColumn("query", lit(qname))
      topk.join(totals.hint("shuffle_hash"), Seq("query"))
        .select(col("query"), lit(k).as("k"), col("n_relevant"),
          col("rel_in_topk"), col("first_rel_rank"),
          round(coalesce(lit(1.0) / col("first_rel_rank").cast("double"),
            lit(0.0)), 6).as("mrr"),
          round(col("rel_in_topk").cast("double") / lit(k.toDouble), 6)
            .as("p_at_k"),
          when(col("n_relevant") > 0,
            round(col("rel_in_topk").cast("double") /
              col("n_relevant").cast("double"), 6)).as("recall_at_k"))
    }.reduce(_ unionByName _)
  }

  /**
   * P350 — blocklist content filter: per document, how many token
   * occurrences hit a term blocklist, how many DISTINCT blocked terms,
   * and the keep verdict at `maxHits` — the unglamorous filter every
   * pretraining pipeline runs before anything clever (profanity/brand/
   * policy lists), kept separate from [[redactPii]] (which scrubs
   * values INSIDE kept docs; this DROPS docs). Blocklist matching is on
   * the shared lowercase-whitespace tokenization, so multi-word phrases
   * are out of scope here ([[graft.operators.Dedup.docShingles]] or the
   * iv3 positional postings are the phrase path). Emits (id, n_tokens,
   * n_hits, distinct_hits, kept).
   *
   * Shapes: one token explode collapsed immediately by the blocklist
   * filter (corpus-linear, map-side-combinable count), one left
   * equi-join back onto the doc frame. The blocklist is a literal
   * `isin` — bytes in the plan, never a table.
   */
  def blocklistFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blocklist: Seq[String],
      maxHits: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(blocklist.nonEmpty, "blocklistFilter: empty blocklist")
    require(maxHits >= 0, s"blocklistFilter: maxHits must be >= 0, got $maxHits")
    val terms = blocklist.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "blocklistFilter: blocklist is all blank")
    val base = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__l"))
    val hits = base
      .select(col("id"), explode(col("__l")).as("__w"))
      .where(col("__w").isin(terms: _*))
      .groupBy("id")
      .agg(count(lit(1)).as("__nh"), countDistinct(col("__w")).as("__dh"))
    base.select(col("id"), size(col("__l")).cast("long").as("n_tokens"))
      .join(hits.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("__nh"), lit(0L)).as("n_hits"),
        coalesce(col("__dh"), lit(0L)).as("distinct_hits"))
      .withColumn("kept", col("n_hits") <= maxHits)
  }

  /**
   * P343 — code-vs-prose detection signals: per document, the character
   * class densities that separate source code from natural language —
   * `symbol_ratio` (any non-alphanumeric-non-space character) and
   * `code_ratio` (the code-punctuation class {}()[];=<>), plus the
   * `is_code` verdict at `codeThreshold` on the latter. The pretraining
   * corpus split every mixed crawl needs (code is either gold or poison
   * depending on the training target, and either way it must not ride
   * incognito through prose quality gates — Gopher/C4 rules misread
   * it). Empty documents emit null ratios and a false verdict rather
   * than dividing by zero.
   *
   * Shape: pure per-row projection (two regexp_replace length
   * differences — no tokenization, no shuffle, whole-stage codegen).
   * Cross-engine: integer character counts, one double division each,
   * rounded at 6.
   */
  def codeSignals(docs: DataFrame, idCol: String, textCol: String,
      codeThreshold: Double = 0.02): DataFrame = {
    require(codeThreshold > 0 && codeThreshold < 1,
      s"codeSignals: codeThreshold must be in (0,1), got $codeThreshold")
    val t = col(textCol).cast("string")
    val n = length(t)
    val symbolN = n - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    val codeN = n - length(regexp_replace(t, "[{}()\\[\\];=<>]", ""))
    docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), n.as("n_chars"),
        when(n > 0, round(symbolN.cast("double") / n.cast("double"), 6))
          .as("symbol_ratio"),
        when(n > 0, round(codeN.cast("double") / n.cast("double"), 6))
          .as("code_ratio"))
      .withColumn("is_code",
        coalesce(col("code_ratio") >= codeThreshold, lit(false)))
  }
}
