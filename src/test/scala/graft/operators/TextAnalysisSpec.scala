package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-analysis operator semantics. */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.head().get(0).asInstanceOf[T]

  test("token counts: whitespace and BPE-ish runs") {
    val df = Seq("Hello, world 42!").toDF("t")
    assert(one[Int](df.select(TextAnalysis.tokenCount(col("t")))) == 3)
    // hello | , | world | 42 | ! → 5 runs
    assert(one[Int](df.select(TextAnalysis.bpeTokenCount(col("t")))) == 5)
    assert(one[Int](Seq("").toDF("t").select(TextAnalysis.tokenCount(col("t")))) == 0)
  }

  test("langId picks the profile with highest stopword overlap") {
    val en = Seq("the cat sat on the mat and it is happy").toDF("t")
    val es = Seq("el gato y la casa en que vivo").toDF("t")
    val de = Seq("der hund und die katze ist von hier").toDF("t")
    val none = Seq("zzz qqq xxx").toDF("t")
    assert(one[String](en.select(TextAnalysis.langId(col("t")))) == "en")
    assert(one[String](es.select(TextAnalysis.langId(col("t")))) == "es")
    assert(one[String](de.select(TextAnalysis.langId(col("t")))) == "de")
    assert(one[String](none.select(TextAnalysis.langId(col("t")))) == "und")
  }

  test("quality gates: clean prose scores 1, junk scores low") {
    val good = Seq("the quick brown fox jumps over the lazy dog and it is very happy today")
      .toDF("t")
    val junk = Seq("!!!??? ###$$$ %%%^^^ &&&***").toDF("t")
    assert(one[Double](good.select(TextAnalysis.qualityScore(col("t")))) == 1.0)
    assert(one[Double](junk.select(TextAnalysis.qualityScore(col("t")))) <= 0.25)
  }

  test("ratios are bounded and sane") {
    val df = Seq("abc, def!").toDF("t")
    // 2 punct chars of 9
    assert(math.abs(one[Double](df.select(TextAnalysis.punctRatio(col("t")))) - 2.0 / 9) < 1e-12)
    // 6 alpha chars of 9
    assert(math.abs(one[Double](df.select(TextAnalysis.alphaRatio(col("t")))) - 6.0 / 9) < 1e-12)
  }

  test("docFingerprint matches the polynomial definition") {
    val df = Seq("abc").toDF("t")
    // ((0*31+97)*31+98)*31+99 = 96354
    assert(one[Long](df.select(TextAnalysis.docFingerprint(col("t")))) == 96354L)
    // identical text → identical fingerprint; different text → different
    val two = Seq("same text", "same text", "other").toDF("t")
    val fps = two.select(TextAnalysis.docFingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("shingleFingerprints yields one hash per distinct k-gram") {
    val df = Seq("abab").toDF("t")
    val fps = df.select(TextAnalysis.shingleFingerprints(col("t"), 2))
      .head().getSeq[Long](0)
    assert(fps.length == 2) // "ab", "ba" (second "ab" deduped)
  }

  test("tfidf: smoothed scores, df counts documents not occurrences, minDf prunes") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // apple: df=2 (two DOCS, though three occurrences); idf = ln(4/3)+1
    val idf2 = math.log(4.0 / 3.0) + 1.0
    val idf1 = math.log(4.0 / 2.0) + 1.0
    assert(out == Set(
      (1L, "apple", 2L, 2L, 2 * idf2),
      (1L, "banana", 1L, 1L, idf1),
      (2L, "apple", 1L, 2L, idf2),
      (2L, "cherry", 1L, 1L, idf1),
      (3L, "durian", 1L, 1L, idf1)))
    // minDf=2 keeps only terms seen in >= 2 documents
    val pruned = TextAnalysis.tfidf(df, "doc_id", "text", minDf = 2L)
      .select("token").distinct().collect().map(_.getString(0)).toSet
    assert(pruned == Set("apple"))
  }

  test("winnowFingerprints: window minima, deduped/sorted, full coverage guarantee") {
    def hash(s: String): Long =
      s.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % 2147483647L)
    val text = "the quick brown fox jumps over the lazy dog"
    val t = text.toLowerCase.trim
    val hs = (0 to t.length - 5).map(i => hash(t.substring(i, i + 5)))
    val expected = (0 to hs.length - 4).map(i => hs.slice(i, i + 4).min).distinct.sorted
    val got = Seq(text).toDF("t")
      .select(TextAnalysis.winnowFingerprints(col("t"), 5, 4))
      .head().getSeq[Long](0)
    assert(got == expected)
    // the winnowing guarantee: every window of 4 consecutive shingle
    // hashes contributed a selected fingerprint, so no match of length
    // >= window + k - 1 chars can be missed
    assert((0 to hs.length - 4).forall(i => hs.slice(i, i + 4).exists(got.contains)))
    // text with fewer shingles than one window → exactly the global min
    val short = Seq("abcdef").toDF("t")
      .select(TextAnalysis.winnowFingerprints(col("t"), 5, 4))
      .head().getSeq[Long](0)
    assert(short == Seq(Seq(hash("abcde"), hash("bcdef")).min))
  }

  test("chunkTokens windows with overlap, covers every token, blank docs vanish") {
    // 10 tokens, chunk 4, overlap 1 → stride 3 → starts 0,3,6,9
    val df = Seq((1L, (1 to 10).map("w" + _).mkString(" ")), (2L, "   "), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 4, "w1 w2 w3 w4"),
      (1L, 1L, 4, "w4 w5 w6 w7"),
      (1L, 2L, 4, "w7 w8 w9 w10"),
      (1L, 3L, 1, "w10"), // tail chunk shorter than chunkSize, never empty
      (3L, 0L, 1, "solo"))) // blank doc 2 contributes no rows
    intercept[IllegalArgumentException](
      TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 4, overlap = 4))
  }

  test("repetition signals: top/dup n-gram fractions with hand-checked values") {
    // tokens: a b a b a → unigrams {a:3, b:2} top1 = 3/5
    // bigrams: "a b","b a","a b","b a" → top2 = 2/4, dup2 = (4-2)/4
    // trigrams: "a b a","b a b","a b a" → dup3 = (3-2)/3
    val df = Seq("a b a b a").toDF("t")
    def v(c: org.apache.spark.sql.Column): Double =
      df.select(c).head().getDouble(0)
    assert(v(TextAnalysis.topNgramFraction(col("t"), 1)) == 3.0 / 5)
    assert(v(TextAnalysis.topNgramFraction(col("t"), 2)) == 2.0 / 4)
    assert(v(TextAnalysis.dupNgramFraction(col("t"), 2)) == 2.0 / 4)
    assert(v(TextAnalysis.dupNgramFraction(col("t"), 3)) == 1.0 / 3)
    // all-identical tokens: maximal repetition on every signal
    val same = Seq("x x x x").toDF("t")
    assert(same.select(TextAnalysis.topNgramFraction(col("t"), 2)).head().getDouble(0) == 1.0)
    assert(same.select(TextAnalysis.dupNgramFraction(col("t"), 2)).head().getDouble(0) == 2.0 / 3)
    // degenerate inputs: blank text and fewer tokens than n → 0.0, no error
    for (t <- Seq("", "   ", "solo")) {
      val d = Seq(t).toDF("t")
      assert(d.select(TextAnalysis.topNgramFraction(col("t"), 2)).head().getDouble(0) == 0.0)
      assert(d.select(TextAnalysis.dupNgramFraction(col("t"), 3)).head().getDouble(0) == 0.0)
    }
    intercept[IllegalArgumentException](TextAnalysis.ngramArray(col("t"), 5))
  }

  test("lexical stats: entropy / type-token ratio with hand-checked values") {
    def stats(t: String): (Double, Double, Double, Double) = {
      val a = Seq(t).toDF("t").select(TextAnalysis.lexicalStats(col("t")))
        .head().getSeq[Double](0)
      (a(0), a(1), a(2), a(3))
    }
    // {a:2, b:1, c:1} over n=4: H = log2(4) − (2·log2 2)/4 = 2 − 0.5 = 1.5
    val (h, ttr, nd, n) = stats("a b A c")
    assert(math.abs(h - 1.5) < 1e-12)
    assert(ttr == 0.75 && nd == 3.0 && n == 4.0)
    // all-identical tokens: zero entropy; all-distinct: log2(n) entropy
    assert(stats("x x x x")._1 == 0.0)
    assert(math.abs(stats("p q r s")._1 - 2.0) < 1e-12)
    // blank input → all zeros, no error
    for (t <- Seq("", "   ")) assert(stats(t) == (0.0, 0.0, 0.0, 0.0))
    // accessor columns agree with the array slots
    val df = Seq("the cat sat on the mat").toDF("t")
    assert(df.select(TextAnalysis.wordEntropy(col("t"))).head().getDouble(0) ==
      df.select(TextAnalysis.lexicalStats(col("t")).getItem(0)).head().getDouble(0))
    assert(df.select(TextAnalysis.typeTokenRatio(col("t"))).head().getDouble(0) == 5.0 / 6)
  }

  test("packSequences lays tokens end-to-end per shard, exactly and order-independently") {
    val docs = (1L to 60L)
      .map(i => (i, Seq.fill((i % 5).toInt + 1)("w").mkString(" ")))
      .toDF("id", "text")
    val got = TextAnalysis.packSequences(docs, "id", "text", seqLen = 7, shards = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // independent model: same 56-bit MD5 fold, per-shard prefix sums
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(i: Long): Long = java.lang.Long.parseLong(
      md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(14), 16)
    val expected = (1L to 60L).map(i => (i, hv(i), (i % 5) + 1))
      .groupBy { case (_, h, _) => h % 3 }
      .flatMap { case (shard, rows) =>
        rows.sortBy { case (i, h, _) => (h, i) }
          .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, acc), (i, _, n)) =>
            (i, n, acc, acc + n)
          }.tail.map { case (i, n, off, _) =>
            i -> (shard, n, off, off / 7, off % 7)
          }
      }
    assert(got == expected)
    // layout is a function of the data alone — input order must not matter
    val shuffled = TextAnalysis.packSequences(
        docs.orderBy(col("text"), col("id").desc).repartition(7),
        "id", "text", seqLen = 7, shards = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(shuffled == got)
    intercept[IllegalArgumentException](
      TextAnalysis.packSequences(docs, "id", "text", seqLen = 0, shards = 3))
    intercept[IllegalArgumentException](
      TextAnalysis.packSequences(docs.withColumn("shard", lit(1)),
        "id", "text", seqLen = 7, shards = 3))
  }

  test("redactPii masks every class, counts match, clean text passes through") {
    val df = Seq(
      "mail a.b+c@test.org and root@10.0.0.1 host 192.168.1.254 " +
        "call +44 201-555-0199 ssn 123-45-6789 twice 987-65-4321").toDF("t")
    val red = df.select(TextAnalysis.redactPii(col("t"))).head().getString(0)
    // root@10.0.0.1 is NOT an email (the TLD must be letters) — its host
    // part redacts as an IP instead
    assert(red == "mail [EMAIL] and root@[IP] host [IP] " +
      "call [PHONE] ssn [SSN] twice [SSN]")
    def n(name: String): Int =
      df.select(TextAnalysis.piiCount(col("t"), name)).head().getInt(0)
    assert(n("email") == 1 && n("ipv4") == 2 && n("phone") == 1 && n("ssn") == 2)
    val clean = Seq("no pii here, just words and 3 numbers").toDF("t")
    assert(clean.select(TextAnalysis.redactPii(col("t"))).head().getString(0) ==
      "no pii here, just words and 3 numbers")
    intercept[IllegalArgumentException](TextAnalysis.piiCount(col("t"), "nope"))
  }

  test("oovRate scores occurrence coverage against the top-k vocab") {
    // counts: common×6 (3 docs × 2), mid×2, rare×1, solo×1 → k=2 vocab is
    // {common, mid}; 'mid rare' ties at c=2? no: mid=2, rare=1
    val docs = Seq(
      (1L, "common common mid"),
      (2L, "common common rare"),
      (3L, "common common mid solo"),
      (4L, ""))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.topKVocab(docs, "text", 2)
      .collect().map(_.getString(0)).toSet
    assert(vocab == Set("common", "mid"))
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((4L, 1L, 0.25)))
    assert(out(4L) == ((0L, 0L, 0.0)), "token-less doc survives at rate 0")
    // count ties fall to token-asc: 'aa' beats 'bb' at equal counts
    val tied = Seq((1L, "aa bb")).toDF("doc_id", "text")
    assert(TextAnalysis.topKVocab(tied, "text", 1)
      .collect().map(_.getString(0)).toSeq == Seq("aa"))
    intercept[IllegalArgumentException](TextAnalysis.topKVocab(docs, "text", 0))
  }

  test("invertedIndex: exact df/occ, postings capped to the lowest ids") {
    val docs = Seq(
      (3L, "x x y"),
      (1L, "x z"),
      (2L, "x y"),
      (4L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    // x: df 4, 5 occurrences (doc 3 has two), postings capped to [1, 2]
    assert(out("x") == ((4L, 5L, Seq(1L, 2L))))
    assert(out("y") == ((2L, 2L, Seq(2L, 3L))))
    assert(out("z") == ((1L, 1L, Seq(1L))))
    // cap 1 keeps only the lowest id; full stats unchanged
    val one = TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3)))).toMap
    assert(one("x") == ((4L, Seq(1L))))
    // null-id docs are dropped entirely — they must not consume a posting
    // slot that collect_list then silently drops, nor inflate df
    val dirty = docs.union(Seq((null.asInstanceOf[java.lang.Long], "x y"))
      .toDF("doc_id", "text"))
    val cleaned = TextAnalysis.invertedIndex(dirty, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3)))).toMap
    assert(cleaned("x") == ((4L, Seq(1L, 2L))) && cleaned("y") == ((2L, Seq(2L, 3L))))
    intercept[IllegalArgumentException](
      TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = 0))
  }

  test("pmiPairs scores adjacent collocations against independence") {
    // corpus: 'a b' always adjacent (perfect collocation), 'c' independent
    // docs: 'a b c', 'a b', 'c a b' → pairs: (a,b)×3, (b,c)×1, (c,a)×1
    // N_pairs = 5, N_tok = 8; c_a = c_b = 3, c_c = 2
    val docs = Seq("a b c", "a b", "c a b").toDF("text")
    val out = TextAnalysis.pmiPairs(docs, "text", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def pmi(cab: Long, ca: Long, cb: Long) =
      math.log((cab.toDouble / 5) / ((ca.toDouble / 8) * (cb.toDouble / 8)))
    assert(out(("a", "b")) == ((3L, pmi(3, 3, 3))))
    assert(out(("b", "c")) == ((1L, pmi(1, 3, 2))))
    assert(out(("c", "a")) == ((1L, pmi(1, 2, 3))))
    assert(out(("a", "b"))._2 > 0, "perfect collocation must score positive")
    // pruning drops rare pairs but keeps surviving scores IDENTICAL
    // (N_pairs is the pre-prune total)
    val pruned = TextAnalysis.pmiPairs(docs, "text", minPairCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(pruned.keySet == Set(("a", "b")))
    assert(pruned(("a", "b")) == out(("a", "b"))._2)
    intercept[IllegalArgumentException](TextAnalysis.pmiPairs(docs, "text", 0))
  }

  test("bigramPerplexity replays the add-1 model exactly; short docs score null") {
    // corpus: "a b a b" + "a b" + "a" → bigrams (a,b):3, (b,a):1;
    // unigrams a:4, b:3; V = 2
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    def lp(cb: Long, cu: Long) = BigDecimal(math.log((cb + 1.0) / (cu + 2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def ppl(lps: Seq[BigDecimal]) = BigDecimal(
      math.exp(-(lps.sum.toDouble / lps.size)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = lp(3, 4) // p(b|a) = 4/6
    val pBA = lp(1, 3) // p(a|b) = 2/5
    val got = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) == ((3L, Some(ppl(Seq(pAB, pBA, pAB))))))
    assert(got(2L) == ((1L, Some(ppl(Seq(pAB))))))
    // fewer than 2 tokens → no bigrams → null perplexity, not 0
    assert(got(3L) == ((0L, None)) && got(4L) == ((0L, None)))
    // partitioning-invariant (decimal sums)
    val again = TextAnalysis.bigramPerplexity(docs.repartition(4), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(again(1L) == got(1L)._2.map(identity))
    intercept[IllegalArgumentException](
      TextAnalysis.bigramPerplexity(docs, "doc_id", "text", alpha = 0.0))
  }

  test("bm25TopK ranks by the Okapi score with the Lucene idf") {
    // N = 3, dl = (3, 2, 4), avgdl = 3; tf: d1 x:2 y:1, d2 x:1, d3 y:4;
    // df(x) = df(y) = 2
    val docs = Seq((1L, "x y x"), (2L, "x z"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    def s(tf: Long, df: Long, dl: Long) = BigDecimal(
      math.log(1.0 + (3L - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 3.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def score(parts: Seq[BigDecimal]) =
      BigDecimal(parts.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x", "y"), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val d1 = score(Seq(s(2, 2, 3), s(1, 2, 3)))
    val d3 = score(Seq(s(4, 2, 4)))
    assert(got.toSeq == Seq((1L, d1, 1), (3L, d3, 2)))
    assert(d1 > d3, "two matched terms must outrank one")
    // terms are case/space-normalized and deduplicated
    val norm = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq(" X ", "x", "Y"), k = 2).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(norm.toSeq == got.toSeq)
    intercept[IllegalArgumentException](
      TextAnalysis.bm25TopK(docs, "doc_id", "text", Nil, k = 2))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 0))
  }

  test("gopherFlags computes every signal and the keep conjunction") {
    // 6 words: "the of data model is good" — 2+ stop hits, all alphabetic,
    // mean length (3+2+4+5+2+4)/6 = 10/3
    val docs = Seq(
      (1L, "the of data model is good"),
      (2L, "zz11 ## ##"),               // no stops, symbolic, short
      (3L, "a b " + Seq.fill(60)("the data").mkString(" ")) // 122 words
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.gopherFlags(col("text"), minWords = 5, maxWords = 100).as("f"))
      .select(col("doc_id"), col("f.n_words"), col("f.mean_word_len"),
        col("f.n_stop_hits"), col("f.alpha_word_frac"),
        col("f.symbol_word_ratio"), col("f.keep"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getInt(1) == 6)
    assert(math.abs(d1.getDouble(2) - 10.0 / 3) < 1e-6)
    assert(d1.getInt(3) == 3) // the, of, is
    assert(d1.getDouble(4) == 1.0)
    assert(d1.getDouble(5) == 0.0)
    assert(d1.getBoolean(6)) // every gate passes at minWords = 5
    val d2 = got(2L)
    assert(d2.getInt(3) == 0)
    assert(math.abs(d2.getDouble(5) - 2.0 / 3) < 1e-6) // two '##' words
    assert(!d2.getBoolean(6)) // fails words/stop/alpha/symbol gates
    val d3 = got(3L)
    assert(d3.getInt(1) == 122)
    assert(!d3.getBoolean(6)) // over maxWords = 100 despite good signals
    // the published default keeps the 122-word doc (50..100k window)
    val defGot = docs.where(col("doc_id") === 3L)
      .select(TextAnalysis.gopherFlags(col("text")).getField("keep"))
      .head().getBoolean(0)
    assert(defGot)
  }

  test("phraseCount counts consecutive occurrences via posting joins") {
    val docs = Seq(
      (1L, "big data makes big data pipelines"), // "big data" ×2
      (2L, "Big Data is upper cased"),           // case-folded match
      (3L, "data big"),                          // reversed — no match
      (4L, "big league data"),                   // not consecutive
      (5L, "a a a a")                            // overlapping self-phrase
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseCount(docs, "doc_id", "text", Seq("big", "data"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L)) // 3, 4 absent: zero matches drop
    // overlapping occurrences all count ("a a" in "a a a a" → 3)
    val self = TextAnalysis.phraseCount(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(self == Map(5L -> 3L))
    // single-token phrase = plain term frequency
    val one = TextAnalysis.phraseCount(docs, "doc_id", "text", Seq("big"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseCount(docs, "doc_id", "text", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseCount(docs, "doc_id", "text", Seq("two words")))
  }

  test("qldTopK scores by smoothed log-likelihood; corpus-absent terms drop") {
    import spark.implicits._
    // ct = 5, cf(a) = 2 -> p(a|C) = 0.4; mu = 1:
    //   d1 (tf 2, dl 3): ln(2.4/4)   = ln 0.6      -> -0.510826
    //   d2 (tf 0, dl 2): ln(0.4/3)                  -> -2.014903
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.qldTopK(docs, "doc_id", "text", Seq("a"), k = 10,
        mu = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, -0.510826, 1), (2L, -2.014903, 2)))
    // a term absent from the whole corpus changes nothing (it is dropped,
    // not scored as ln 0)
    val withGhost = TextAnalysis.qldTopK(docs, "doc_id", "text",
        Seq("a", "zzz"), k = 10, mu = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(withGhost.toSeq == got.toSeq)
    // absent-term smoothing still ranks docs with NO query term at all
    val got2 = TextAnalysis.qldTopK(docs, "doc_id", "text", Seq("c"), k = 10,
        mu = 1.0)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got2 == Map(2L -> 1, 1L -> 2))
    intercept[IllegalArgumentException](
      TextAnalysis.qldTopK(docs, "doc_id", "text", Nil, 5))
    intercept[IllegalArgumentException](
      TextAnalysis.qldTopK(docs, "doc_id", "text", Seq("a"), 5, mu = 0.0))
  }

  test("zipfFit recovers an exact power law and caps the rank window") {
    // freq = 12/rank exactly: slope −1, r2 = 1, intercept = ln 12
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", 500).head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(2) == 2.484907) // ln 12
    // maxRank caps the fitted window
    val capped = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", 3).head
    assert(capped.getLong(0) == 3L)
    intercept[IllegalArgumentException](
      TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", 2))
  }

  test("jsDivergence: zero on identical, ln 2 on disjoint, textbook value") {
    val a = Seq("x y z", "x x").toDF("text")
    val same = TextAnalysis.jsDivergence(a, a, "text").head
    // columns: n_a, n_b, n_vocab, jsd
    assert(same.getLong(0) == 5L && same.getLong(1) == 5L)
    assert(same.getLong(2) == 3L && same.getDouble(3) == 0.0)
    // disjoint vocabularies: jsd = ln 2 exactly (every term is p·ln 2)
    val b = Seq("q r", "q").toDF("text")
    val far = TextAnalysis.jsDivergence(a, b, "text").head
    assert(far.getLong(2) == 5L && far.getDouble(3) == 0.693147)
    // hand case: P = (2/3, 1/3), Q = (1/3, 2/3) over {x, y} →
    // jsd = (2/3)ln(4/3) + (1/3)ln(2/3) with 9-rounded terms = 0.056633
    val pa = Seq("x x y").toDF("text")
    val pb = Seq("x y y").toDF("text")
    assert(TextAnalysis.jsDivergence(pa, pb, "text").head.getDouble(3)
      == 0.056633)
  }

  test("readability: regex counts and the Flesch formula; wordless → null") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "The cat sat."),        // 3 words, 1 sent, 3 vowel groups
      (2L, "Hi! Go now."),         // 3 words, 2 sents, 3 vowel groups
      (3L, "12345 !!!")            // no words → null score
    ).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.readability(col("text")).as("r"))
      .select("id", "r.n_words", "r.n_sents", "r.n_syll", "r.flesch")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 3 && got(1L).getLong(2) == 1 &&
      got(1L).getLong(3) == 3)
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(got(1L).getDouble(4) == 119.19)
    // sentence runs: "!" and "." are two terminator runs
    assert(got(2L).getLong(2) == 2)
    // 206.835 − 1.015·1.5 − 84.6·1 = 120.7125 → rounds at 4
    assert(got(2L).getDouble(4) == 120.7125)
    assert(got(3L).getLong(1) == 0 && got(3L).isNullAt(4))
    assert(got(3L).getLong(2) == 1) // sentence floor keeps the ratio total
  }

  test("crossDocNgrams flags grams spread across >= minDocs documents") {
    val df = Seq(
      (1L, "a b c d x"),   // grams: "a b c d" (common), "b c d x"
      (2L, "a b c d y"),   // "a b c d", "b c d y"
      (3L, "a b c d z"),   // "a b c d", "b c d z"
      (4L, "p q r s t"),   // nothing shared
      (5L, "p q")          // < 4 tokens → no grams, row drops
    ).toDF("doc_id", "text")
    val got = TextAnalysis.crossDocNgrams(df, "doc_id", "text", 4, 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 1L, 0.5)), 4L -> ((2L, 0L, 0.0))))
    // repeating the common gram inside ONE doc does not add spread
    val rep = Seq((1L, "a b c d a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val r2 = TextAnalysis.crossDocNgrams(rep, "doc_id", "text", 4, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r2 == Map(1L -> 0L, 2L -> 0L))
    intercept[IllegalArgumentException](
      TextAnalysis.crossDocNgrams(df, "doc_id", "text", 4, 1L))
  }

  test("featureHash: signed bucket sums replay the MD5 route and sign") {
    val df = Seq((1L, "cat dog cat"), (2L, "")).toDF("doc_id", "text")
    def hv(salt: String, tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + tok).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16)
    }
    def bucket(t: String) = hv("fh:", t) % 64
    def sign(t: String) = 1L - 2L * (hv("fhs:", t) % 2L)
    val got = TextAnalysis.featureHash(df, "doc_id", "text", dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val expected =
      if (bucket("cat") == bucket("dog"))
        Map((1L, bucket("cat")) -> ((2L * sign("cat") + sign("dog"), 3L)))
      else Map(
        (1L, bucket("cat")) -> ((2L * sign("cat"), 2L)),
        (1L, bucket("dog")) -> ((sign("dog"), 1L)))
    assert(got == expected) // doc 2 has no tokens → no rows
    intercept[IllegalArgumentException](
      TextAnalysis.featureHash(df, "doc_id", "text", 1))
  }

  test("corpusCard rolls up per group + ALL; dup texts collapse n_unique") {
    val df = Seq(
      (1L, "en", "one two three", 13L),
      (2L, "en", "one two three", 13L),   // exact dup of doc 1
      (3L, "de", "vier", 4L)).toDF("doc_id", "lang", "text", "n_chars")
    val got = TextAnalysis.corpusCard(df, "lang", "text", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == Set("en", "de", "ALL"))
    assert(got("en") == ((2L, 1L, 6L, 3.0, 13.0)))
    assert(got("de") == ((1L, 1L, 1L, 1.0, 4.0)))
    assert(got("ALL")._1 == 3L && got("ALL")._2 == 2L && got("ALL")._3 == 7L)
    // quality means are exact quarters averaged: every text here fails
    // the length gates identically → group means equal the ALL mean
    val q = TextAnalysis.corpusCard(df, "lang", "text", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(q.values.toSet.size <= 2)
  }

  test("rakePhrases: stopword-split islands, deg/freq scores, ranked top-k") {
    // islands: "deep learning" (2), "deep learning rate" (3),
    // "learning" (1). Word deg/freq: deep (2+3)/2 = 2.5,
    // learning (2+3+1)/3 = 2.0, rate 3/1 = 3.0 → phrase scores
    // 4.5 / 7.5 / 2.0
    val df = Seq(
      (1L, "the deep learning of a deep learning rate for learning"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakePhrases(df, "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(1),
        (r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got.keySet ==
      Set("deep learning", "deep learning rate", "learning"))
    assert(got("deep learning rate") == ((3L, 7.5, 1)))
    assert(got("deep learning") == ((2L, 4.5, 2)))
    assert(got("learning") == ((1L, 2.0, 3)))
    intercept[IllegalArgumentException](
      TextAnalysis.rakePhrases(df, "doc_id", "text", 0))
  }

  test("langIdEval: confusion cells + overall accuracy on every row") {
    val df = Seq(
      ("en", "the cat is in the hat"),     // en stopwords → predicted en
      ("en", "der hund ist von den zu"),   // de stopwords → MISpredicted de
      ("de", "die das und der ist"),       // → de
      ("de", "xyzzy qwerty")               // no hits → und
    ).toDF("lang", "text")
    val got = TextAnalysis.langIdEval(df, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(("en", "en"), ("en", "de"), ("de", "de"),
      ("de", "und")))
    // 2 of 4 on the diagonal
    assert(got.values.forall(v => v._2 == 4L && v._3 == 0.5))
    assert(got(("en", "en"))._1 == 1L && got(("de", "de"))._1 == 1L)
  }

  test("heapsFit recovers beta on an exact power-law corpus") {
    // build docs so that at checkpoint rows the cumulative
    // (tokens, vocab) lie EXACTLY on vocab = tokens^0.5: each doc has
    // 4 tokens; at doc 2k, tokens = 8k... instead verify the mechanics:
    // doubling vocab with quadrupling tokens → slope 0.5
    // docs 1..8, each 25 tokens; vocab introduced so v(cp) = sqrt(t(cp)):
    // cp at rows 4 and 8: t = 100, 200 — craft vocab 10 and 14?
    // 14 ≈ sqrt(200) is inexact → use two checkpoints with exact ratio:
    // slope = ln(v2/v1)/ln(t2/t1); choose v 10→20 and t 100→400 → 0.5
    val mk = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    // rows 1..4: 25 tokens each (t=100), vocab = w1..w10 (10 distinct)
    val first = (1L to 4L).map(i => mk(i,
      (1 to 25).map(j => s"w${(j % 10) + 1}")))
    // rows 5..8: 75 tokens each (t=400 total), 10 NEW words → vocab 20
    val second = (5L to 8L).map(i => mk(i,
      (1 to 75).map(j => s"x${(j % 10) + 1}")))
    val df = (first ++ second).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(df, "doc_id", "text",
      checkpointEvery = 4).head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5) // ln(20/10)/ln(400/100) = ln2/ln4
    intercept[IllegalArgumentException](
      TextAnalysis.heapsFit(df, "doc_id", "text", 0))
  }

  test("languageMix: glued bilingual doc flags, monolingual doesn't") {
    import spark.implicits._
    val en = Seq("the", "a", "of", "to", "in", "is", "that", "it")
    val de = Seq("der", "die", "das", "ist", "von", "mit", "den", "ein")
    // 32 en tokens then 32 de tokens: doc-level scores tie 0.5/0.5 and
    // the tie breaks to 'de' (lexicographic); chunk 1 is pure en →
    // mismatch, chunk 2 pure de → match ⇒ mix_ratio 0.5, flagged
    val glued = (Seq.fill(4)(en).flatten ++ Seq.fill(4)(de).flatten)
      .mkString(" ")
    val mono = en.mkString(" ")
    val docs = Seq((1L, glued), (2L, mono)).toDF("doc_id", "text")
    val got = TextAnalysis.languageMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(got(1L) == (("de", 2L, 1L, 0.5, true)))
    assert(got(2L) == (("en", 1L, 1L, 0.0, false)))
    intercept[IllegalArgumentException](
      TextAnalysis.languageMix(docs, "doc_id", "text", chunkSize = 0))
  }

  test("simpsonDiversity: uniform vs concentrated slices, degenerate null") {
    import spark.implicits._
    val docs = Seq(
      ("u", "a b c d"),          // 4 distinct: D = 0, eff_vocab null? no — D=0
      ("c", "a a a b"),          // 3·2/(4·3) = 0.5 → eff 2
      ("one", "solo"))           // single token → null D
      .toDF("lang", "text")
    val got = TextAnalysis.simpsonDiversity(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    // all-distinct: no pair coincides → D = 0, and 1/D is undefined
    assert(got("u") == ((4L, 4L, Some(0.0), None)))
    assert(got("c") == ((4L, 2L, Some(0.5), Some(2.0))))
    assert(got("one") == ((1L, 1L, None, None)))
  }

  test("vocabCoverage: rungs count surviving types and their mass") {
    import spark.implicits._
    // "a" ×6, "b" ×3, "c" ×1 → total mass 10
    val docs = Seq("a a a b", "a a a b b c").map(Tuple1(_)).toDF("t")
    val got = TextAnalysis.vocabCoverage(docs, "t", Seq(2L, 4L, 7L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(2L) == ((2L, 9L, 0.9)))     // a+b survive, 9/10 mass
    assert(got(4L) == ((1L, 6L, 0.6)))     // only a
    assert(!got.contains(7L) || got(7L)._1 == 0L)
    intercept[IllegalArgumentException](
      TextAnalysis.vocabCoverage(docs, "t", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.vocabCoverage(docs, "t", Seq(2L, 2L)))
  }

  test("ngramOriginality: copies score zero, originals score one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // full copy of doc 1
      (3L, "one two three four five six"),
      (4L, "alpha beta gamma zulu yankee xray"))
      .toDF("id", "t")
    val got = TextAnalysis.ngramOriginality(docs, "id", "t", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)))        // first occurrence of all
    assert(got(2L) == ((3L, 0L, 0.0)))        // pure copy
    assert(got(3L) == ((4L, 4L, 1.0)))
    // doc 4 shares only "alpha beta gamma" with doc 1
    assert(got(4L) == ((4L, 3L, 0.75)))
  }

  test("entropyRate: deterministic sequences have zero conditional entropy") {
    import spark.implicits._
    // "a b a b ..." — every successor is fully determined
    val det = Seq((1L, "a b a b a b a b"), (2L, "a b a b")).toDF("id", "t")
    val r = TextAnalysis.entropyRate(det, "id", "t").head
    assert(r.getLong(2) == 2L)                // vocab {a, b}
    assert(r.getDouble(4) == 0.0)             // H(w2|w1) = 0
    assert(r.getDouble(3) > 0.6)              // H1 ≈ ln 2
    assert(r.getDouble(5) == 1.0)             // fully redundant
    // uniform unpredictable bigrams: conditional entropy ≈ unigram
    val mixed = Seq((1L, "a a a b b b a b b a")).toDF("id", "t")
    val m = TextAnalysis.entropyRate(mixed, "id", "t").head
    assert(m.getDouble(4) > 0.0 && m.getDouble(5) < 1.0)
  }

  test("ndcgAtK: perfect ranking scores 1, inverted ranking less") {
    import spark.implicits._
    val rels = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("id", "rel")
    val perfect = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val p = TextAnalysis.ndcgAtK(perfect, "id", "rank", rels, "id", "rel",
      k = 3).head
    // DCG = 3·1 + 2·0.630929754 + 1·0.5 = 4.761860 = IDCG
    assert(p.getInt(0) == 3 && p.getLong(1) == 3L && p.getLong(2) == 3L)
    assert(p.getDouble(3) == 4.76186 && p.getDouble(5) == 1.0)
    val inverted = Seq((3L, 1), (2L, 2), (1L, 3)).toDF("id", "rank")
    val i = TextAnalysis.ndcgAtK(inverted, "id", "rank", rels, "id", "rel",
      k = 3).head
    assert(i.getDouble(5) > 0.7 && i.getDouble(5) < 1.0)
    // an ungraded ranked doc contributes zero gain, idcg unchanged
    val withJunk = Seq((9L, 1), (1L, 2), (2L, 3)).toDF("id", "rank")
    val j = TextAnalysis.ndcgAtK(withJunk, "id", "rank", rels, "id", "rel",
      k = 3).head
    assert(j.getDouble(4) == p.getDouble(4) &&
      j.getDouble(5) < i.getDouble(5))
    intercept[IllegalArgumentException](
      TextAnalysis.ndcgAtK(perfect, "id", "rank", rels, "id", "rel", 0))
  }

  test("bpeMergeCandidates: word-internal pair counts, deterministic top") {
    import spark.implicits._
    // 'aaab' has pairs aa, aa, ab; single-char words contribute nothing
    val df = Seq((1L, "aaab aaab x"), (2L, "ab")).toDF("id", "t")
    val got = TextAnalysis.bpeMergeCandidates(df, "t", k = 2).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("aa", 4L), ("ab", 3L)))
    // ties at the k boundary break on pair ascending
    val tied = Seq((1L, "ab cd")).toDF("id", "t")
    val t = TextAnalysis.bpeMergeCandidates(tied, "t", k = 1).collect()
    assert(t.map(_.getString(0)).toSeq == Seq("ab"))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMergeCandidates(df, "t", 0))
  }

  test("groupBigramJaccard: bigram-set overlap, disjoint pairs absent") {
    import spark.implicits._
    val df = Seq(("A", 1L, "a b c"), ("A", 2L, "a b"),
      ("B", 3L, "a b d"), ("C", 4L, "x y")).toDF("src", "id", "t")
    val rows = TextAnalysis.groupBigramJaccard(df, "src", "id", "t")
      .collect()
    // A = {a b, b c} (the duplicate 'a b' dedups), B = {a b, b d}:
    // ∩ = 1, ∪ = 3; C shares nothing → its pairs don't materialize
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 1L)
    assert(r.getDouble(5) == 0.333333)
  }

  test("termBurstiness: a clumped term out-bursts an evenly spread one " +
      "at equal frequency") {
    import spark.implicits._
    // 4 docs; 'even' once per doc (VMR → 0 variance), 'bursty' 4× in
    // one doc: same total 4, wildly different scatter
    val df = Seq((1L, "even bursty bursty bursty bursty"),
      (2L, "even x"), (3L, "even y"), (4L, "even z")).toDF("id", "t")
    val got = TextAnalysis.termBurstiness(df, "t", "id", 10)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // even: counts (1,1,1,1) → mean 1, var 0 → VMR 0
    assert(got("even") == ((4L, 4L, 1.0, 0.0)))
    // bursty: counts (4,0,0,0) → mean 1, var (4·16−16)/12 = 4 → VMR 4
    assert(got("bursty") == ((4L, 1L, 1.0, 4.0)))
    // rank 1 goes to the lexicographically smaller of the tied totals
    val first = TextAnalysis.termBurstiness(df, "t", "id", 1).head
    assert(first.getInt(0) == 1 && first.getString(1) == "bursty")
  }

  test("griesDispersion: even spread scores 0, single-part " +
      "concentration scores 1 − part share") {
    import spark.implicits._
    // two equal-size parts; 'even' follows the corpus exactly → DP 0;
    // 'only' lives entirely in part A → DP = ½(|1−.5| + |0−.5|) = .5
    val df = Seq(("A", "even only even only"), ("B", "even z even w"))
      .toDF("src", "t")
    val got = TextAnalysis.griesDispersion(df, "t", "src", 10)
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(got("even") == 0.0)
    assert(got("only") == 0.5)
  }

  test("dunningG2: a deterministic collocation dominates an " +
      "independent pair") {
    import spark.implicits._
    // 'a b' always together; 'x' pairs with everything
    val docs = (Seq.fill(10)("a b") ++
      Seq("x u", "x v", "x w", "u x", "v x")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = TextAnalysis.dunningG2(docs, "t", 1L, 50).collect()
    val top = got.head
    assert(top.getString(1) == "a" && top.getString(2) == "b")
    val ab = got.find(r => r.getString(1) == "a" && r.getString(2) == "b").get
    val xu = got.find(r => r.getString(1) == "x" && r.getString(2) == "u").get
    assert(ab.getDouble(6) > xu.getDouble(6))
    // margins are BIGRAM-position counts: c_a(a)=10, c_b(b)=10, N=15
    assert(ab.getLong(3) == 10L && ab.getLong(4) == 10L &&
      ab.getLong(5) == 10L)
    intercept[IllegalArgumentException](
      TextAnalysis.dunningG2(docs, "t", 0L, 5))
  }

  test("keywordInContext: edge clamping, multiple hits, case folding") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HIT alpha beta gamma delta hit epsilon"),
      (2L, "one two three hit")).toDF("id", "t")
    val got = TextAnalysis.keywordInContext(docs, "id", "t", "hit",
        window = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(3), r.getString(4)))).toMap
    assert(got((1L, 0)) == (("", "alpha beta")))       // doc start
    assert(got((1L, 5)) == (("gamma delta", "epsilon")))
    assert(got((2L, 3)) == (("two three", "")))        // doc end
    assert(got.size == 3)
    intercept[IllegalArgumentException](
      TextAnalysis.keywordInContext(docs, "id", "t", "  "))
    intercept[IllegalArgumentException](
      TextAnalysis.keywordInContext(docs, "id", "t", "hit", 0))
  }

  test("vocabularyRichness: hand spectrum — K, S, hapax, TTR") {
    import spark.implicits._
    // doc 1: a a a b b c → V1=1(c) V2=1(b) V3(a); N=6, V=3
    // K = 1e4·(1+4+9−6)/36 = 2222.222222; S = 1/3; hapax 1/3; TTR .5
    // doc 2: all distinct → K = 0, hapax 1
    val docs = Seq((1L, "a a a b b c"), (2L, "x y z")).toDF("id", "t")
    val got = TextAnalysis.vocabularyRichness(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getLong(1) == 6L && d1.getLong(2) == 3L)
    assert(d1.getLong(3) == 1L && d1.getLong(4) == 1L)
    assert(d1.getDouble(5) == 2222.222222)
    assert(d1.getDouble(6) == 0.333333 && d1.getDouble(7) == 0.333333)
    assert(d1.getDouble(8) == 0.5)
    val d2 = got(2L)
    assert(d2.getDouble(5) == 0.0 && d2.getDouble(7) == 1.0)
  }

  test("retrievalEval: rank-1 hit, miss, and empty-topk MRR") {
    import spark.implicits._
    // 'hit hit hit' is both top-ranked and relevant at bar 2;
    // 'hit miss' has 1 occurrence → irrelevant at bar 2 but ranked
    val docs = Seq((1L, "hit hit hit"), (2L, "hit miss pad pad"),
      (3L, "none here at all")).toDF("id", "t")
    val got = TextAnalysis.retrievalEval(docs, "id", "t",
      Seq(("qa", Seq("hit"), 2L), ("qb", Seq("none"), 9L)), k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("qa")
    assert(a.getLong(2) == 1L)    // n_relevant (doc 1 only)
    assert(a.getLong(3) == 1L)    // rel_in_topk
    assert(a.getInt(4) == 1 && a.getDouble(5) == 1.0)  // first rank, mrr
    assert(a.getDouble(6) == 0.5 && a.getDouble(7) == 1.0)
    val b = got("qb")  // bar 9 unreachable → no relevant docs at all
    assert(b.getLong(2) == 0L && b.getLong(3) == 0L)
    assert(b.isNullAt(4) && b.getDouble(5) == 0.0)
    assert(b.isNullAt(7))  // recall undefined at n_relevant = 0
    intercept[IllegalArgumentException](
      TextAnalysis.retrievalEval(docs, "id", "t", Nil, 2))
    intercept[IllegalArgumentException](TextAnalysis.retrievalEval(
      docs, "id", "t", Seq(("q", Seq("hit"), 0L)), 2))
    intercept[IllegalArgumentException](TextAnalysis.retrievalEval(
      docs, "id", "t", Seq(("q", Seq("a"), 1L), ("q", Seq("b"), 1L)), 2))
  }

  test("blocklistFilter: occurrence vs distinct hits, threshold verdict") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text entirely"),
      (2L, "bad bad text"),          // 2 hits, 1 distinct → kept at max 2
      (3L, "bad worse bad worse"),   // 4 hits, 2 distinct → dropped
      (4L, "BAD upper case"))        // case-folded match
      .toDF("id", "t")
    val got = TextAnalysis.blocklistFilter(docs, "id", "t",
      Seq("bad", "worse"), maxHits = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 0L, 0L, true)))
    assert(got(2L) == ((3L, 2L, 1L, true)))
    assert(got(3L) == ((4L, 4L, 2L, false)))
    assert(got(4L) == ((3L, 1L, 1L, true)))
    intercept[IllegalArgumentException](
      TextAnalysis.blocklistFilter(docs, "id", "t", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.blocklistFilter(docs, "id", "t", Seq("  ")))
    intercept[IllegalArgumentException](
      TextAnalysis.blocklistFilter(docs, "id", "t", Seq("bad"), -1L))
  }

  test("prfExpansionTerms: feedback docs vote terms by r·idf, query " +
      "terms excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join vector apple"),
      (2L, "hash apple banana"),
      (3L, "cherry date")) // never retrieved → its terms never vote
      .toDF("id", "t")
    val got = TextAnalysis.prfExpansionTerms(docs, "id", "t",
      Seq("hash"), kDocs = 2, mTerms = 3).orderBy("rank").collect()
    // df=1 terms share idf ln(8/3) and outrank apple (r=2, idf ln 1.6:
    // 2·0.470 < 0.981) — tie broken lexicographically
    assert(got.map(_.getString(0)).toSeq == Seq("banana", "join", "vector"))
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L))
    val idf1 = math.log(1.0 + (3L - 1L + 0.5) / (1L + 0.5))
    assert(got.forall(r => math.abs(r.getDouble(3) - idf1) < 1e-8))
    intercept[IllegalArgumentException](
      TextAnalysis.prfExpansionTerms(docs, "id", "t", Seq("hash"), 0, 3))
    intercept[IllegalArgumentException](
      TextAnalysis.prfExpansionTerms(docs, "id", "t", Seq("hash"), 2, 0))
  }

  test("codeSignals: character-class densities and the code verdict") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x = 1;"),        // '=' ';' → 2/6 in both classes
      (2L, "hello world"),   // pure prose → zeros
      (3L, ""))              // empty → null ratios, false verdict
      .toDF("id", "t")
    val got = TextAnalysis.codeSignals(docs, "id", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(2) == 0.333333 &&
      got(1L).getDouble(3) == 0.333333 && got(1L).getBoolean(4))
    assert(got(2L).getDouble(2) == 0.0 && got(2L).getDouble(3) == 0.0 &&
      !got(2L).getBoolean(4))
    assert(got(3L).getInt(1) == 0 && got(3L).isNullAt(2) &&
      got(3L).isNullAt(3) && !got(3L).getBoolean(4))
    intercept[IllegalArgumentException](
      TextAnalysis.codeSignals(docs, "id", "t", codeThreshold = 0.0))
  }

  test("tScoreCollocations: (O-E)/sqrt(O) over bigram margins, " +
      "capped rank, ties on (a, b)") {
    val docs = Seq("a b a b a b", "a b c d").toDF("t")
    // bigrams — doc1: ab, ba, ab, ba, ab; doc2: ab, bc, cd →
    // c_ab(a,b)=4, (b,a)=2, (b,c)=1, (c,d)=1; N=8; margins positional:
    // c_a(a)=4, c_a(b)=3, c_b(b)=4, c_b(a)=2 → t(a,b)=1.0,
    // t(b,a)=0.883883, t(c,d)=0.875, t(b,c)=0.625
    val got = TextAnalysis.tScoreCollocations(docs, "t",
      minPairCount = 1L, topK = 3).collect()
    assert(got.length == 3)
    val top = got.head
    // (a,b): O=4, c_a=4, c_b=4, N=8 → t=(32−16)/(8·2)=1.0
    assert(top.getString(1) == "a" && top.getString(2) == "b")
    assert(top.getLong(3) == 4L && top.getDouble(6) == 1.0)
    // ranks are 1..3 and scores non-increasing
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val scores = got.map(_.getDouble(6)).toSeq
    assert(scores == scores.sorted.reverse)
    intercept[IllegalArgumentException](
      TextAnalysis.tScoreCollocations(docs, "t", 0L, 3))
    intercept[IllegalArgumentException](
      TextAnalysis.tScoreCollocations(docs, "t", 1L, 0))
  }

  test("encodingAnomalies: length-difference counts, one scan, " +
      "doc shares over the full corpus") {
    val ea = "Ã©"
    val docs = Seq(
      s"caf$ea$ea x",   // 2 occurrences
      "clean text",
      s"one $ea here",  // 1 occurrence
      "also clean").toDF("t")
    val got = TextAnalysis.encodingAnomalies(docs, "t",
        Seq(("latin1_eacute", ea), ("replacement_char", "�")))
      .orderBy("marker").collect()
    val eac = got(0)
    assert(eac.getString(0) == "latin1_eacute" && eac.getLong(1) == 2L &&
      eac.getLong(2) == 3L && eac.getLong(3) == 4L &&
      eac.getDouble(4) == 0.5)
    val rc = got(1)
    assert(rc.getLong(1) == 0L && rc.getLong(2) == 0L &&
      rc.getDouble(4) == 0.0)
    intercept[IllegalArgumentException](
      TextAnalysis.encodingAnomalies(docs, "t", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.encodingAnomalies(docs, "t",
        Seq(("x", ea), ("x", "�"))))
    intercept[IllegalArgumentException](
      TextAnalysis.encodingAnomalies(docs, "t", Seq(("bad\\name", ea))))
    // non-BMP marker (one codepoint, TWO UTF-16 units): occurrences
    // divide by the CODEPOINT count, not String.length
    val smile = new String(Character.toChars(0x1F642))
    val nb = TextAnalysis.encodingAnomalies(
      Seq(s"a $smile b $smile").toDF("t"), "t",
      Seq(("emoji", smile))).head
    assert(nb.getLong(2) == 2L && nb.getLong(1) == 1L)
  }

  test("proximitySearch: window-bounded spans, closest distance, " +
      "distance-1 is adjacency") {
    val docs = Seq(
      (1L, "data near query"),            // distance 2
      (2L, "data a b c d e f query"),     // distance 7 — out at 5
      (3L, "query data and data query"))  // pairs at 1,3,1,2... count
      .toDF("id", "t")
    val got = TextAnalysis.proximitySearch(docs, "id", "t",
        "data", "query", window = 5)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 2L)
    // doc 3 positions: data {1,3}, query {0,4} → |Δ| = 1,3,3,1 → 4 spans
    assert(got(1).getLong(1) == 4L && got(1).getLong(2) == 1L)
    intercept[IllegalArgumentException](
      TextAnalysis.proximitySearch(docs, "id", "t", "x", "x", 5))
    intercept[IllegalArgumentException](
      TextAnalysis.proximitySearch(docs, "id", "t", "a", "b", 0))
  }

  test("booleanRetrieve: AND over distinct hits, NOT excludes, " +
      "occurrences counted") {
    val docs = Seq(
      (1L, "data query data"),     // both terms, 3 occurrences
      (2L, "data only here"),      // missing 'query'
      (3L, "data query dup"),      // excluded by 'dup'
      (4L, "query data"))          // both, 2 occurrences
      .toDF("id", "t")
    val got = TextAnalysis.booleanRetrieve(docs, "id", "t",
        Seq("data", "query"), Seq("dup"))
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    // no exclusion list admits doc 3
    assert(TextAnalysis.booleanRetrieve(docs, "id", "t",
      Seq("data", "query")).count() == 3L)
    intercept[IllegalArgumentException](
      TextAnalysis.booleanRetrieve(docs, "id", "t", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.booleanRetrieve(docs, "id", "t", Seq("a"), Seq("a")))
  }
}
