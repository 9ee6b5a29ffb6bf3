package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{MediaRecord, Multimodal}

/**
 * Multimodal plumbing coverage. mm1: the binary packing + metadata layer
 * (byte counts, MD5 of the packed bytes). mm2: the batched mapPartitions
 * decode path — the CODEC stays a documented deterministic fake, but its
 * deterministic geometry (decode dims from byte length) and the integer
 * byte-sum of the 16×16 resized plane are exactly replayable in SQL from
 * the raw text bytes (hex-pair extraction), so the gate now verifies that
 * every record rides through the batch pipeline exactly once with the
 * right bytes, dims, resize arithmetic, and an in-contract batch size.
 * Float embeddings remain spec-pinned Scala-side (MultimodalSpec) — float
 * sums can't be hash-compared across engines.
 */
object MultimodalQueries {

  /** mm6's bucket ladder — exact-decimal ratios (both engines parse them
    * to identical doubles); ONE definition feeds the query and oracle. */
  private val AspectRatios =
    Seq(0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0)

  /** The ONE mm3 pair derivation (duplicated corpus → stub pHash →
    * hamming ≤ 3 pairs) shared by mm3 and mm10 — forked copies of the
    * corpus construction could silently diverge. */
  private def phashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val duped = d.withColumn("key", col("doc_id") % 100).alias("a")
      .join(d.withColumn("key", col("doc_id"))
        .select(col("key"), col("text").as("base_text")).alias("b"), Seq("key"))
      .select(col("a.doc_id").as("doc_id"), col("base_text").as("text"))
    val hashes = Multimodal.perceptualHash(
      // fanOut = false: the 64-sample aHash is light per stream — the
      // packed-corpus exchange doubled mm3 (0.94 → 1.98 s, r11-opt)
      Multimodal.packText(duped, "doc_id", "text", fanOut = false)
        .as[MediaRecord])
    Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + typed metadata, checksummed
    "mm1_pack" -> ((s, dir) => {
      // fanOut = false: one md5 per stream is light map work (see packText)
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text", fanOut = false)
      packed.select(col("media_id"), col("kind"), col("mime_type"),
          col("n_bytes"), md5(col("bytes")).as("bytes_md5"))
        .orderBy("media_id")
    }),

    // P76 — perceptual near-dup over a planted-duplicate corpus: aHash
    // chunks band the 64-bit fingerprint, chunk equality generates
    // candidates, exact hamming verifies; the oracle recomputes every
    // hash from raw bytes and compares ALL pairs, so green proves the
    // banding is an identity (the d5 pattern)
    "mm3_phash_neardup" -> ((s, dir) => {
      phashPairs(s, dir).orderBy("i", "j")
    }),

    // P214 — near-dup image clusters: bounded min-label components over
    // the mm3 hamming pairs (one canonical representative per visual
    // duplicate family); the oracle replays the same 3 label rounds
    "mm10_phash_clusters" -> ((s, dir) => {
      graft.operators.Dedup.duplicateClusters(
          phashPairs(s, dir), "i", "j", iters = 3)
        .withColumnRenamed("id", "media_id")
        .orderBy("media_id")
    }),

    // P326 — byte-value entropy per stream: the compressibility probe
    // (near-8-bit = compressed/noise, low = flat fill or text — both
    // route differently in a media curation pass)
    "mm13_byteentropy" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.byteEntropy(packed, "media_id", "bytes")
        .orderBy("media_id")
    }),

    // P327 — zero-crossing rate per stream: the pitch/noisiness front-
    // end feature (voiced low, fricative/hiss high); centred at 96 —
    // ASCII never reaches the PCM 128 centre (ZCR read 0 everywhere,
    // measured), letter/space flips carry the text-plane signal
    "mm14_zcr" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.zeroCrossingRate(packed, "media_id", "bytes",
          centre = 96)
        .orderBy("media_id")
    }),

    // P237 — 256-byte frame energy over the raw streams: the VAD shape
    // of an audio pass (mean amplitude + RMS + silence flag per frame)
    "mm12_energy" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.frameEnergy(packed, "media_id", "bytes", frameSize = 256)
        .orderBy("media_id", "frame")
    }),

    // P344 — silence share + longest silent run per media over 64-byte
    // frames: the bar sits at 99 because THIS plane's frame RMS spans
    // 95–113 with median ≈ 99 (measured — the PCM-32 default flags
    // nothing on ASCII text, the mm13 centre lesson), so runs of both
    // kinds occur
    "mm15_silence" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.silenceRuns(packed, "media_id", "bytes",
          frameSize = 64, silenceRms = 99)
        .orderBy("media_id")
    }),

    // P375 — consecutive-frame dup runs over 32-byte frames: id%5==0
    // media are frozen to ONE repeated 32-char chunk (8 copies) so
    // long static runs exist beside the naturally distinct text frames
    "mm19_frame_dups" -> ((s, dir) => {
      val planted = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          repeat(substring(col("text"), 1, 32), 8))
          .otherwise(col("text")).as("text"))
      val packed = Multimodal.packText(planted, "doc_id", "text")
      Multimodal.frameDupRuns(packed, "media_id", "bytes", frameSize = 32)
        .orderBy("media_id")
    }),

    // P366 — magic-byte format sniffing over a corpus with PLANTED
    // signatures (PNG on id%7=0, JPEG on 1, GIF on 2, raw text
    // otherwise): first-bytes dispatch, not mime trust
    "mm18_magic" -> ((s, dir) => {
      // fanOut = false: prefix sniffing is light map work (see packText)
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text", fanOut = false)
      def sig(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
      val planted = packed.withColumn("bytes",
        when(col("media_id") % 7 === 0,
          concat(sig(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
            col("bytes")))
          .when(col("media_id") % 7 === 1,
            concat(sig(0xff, 0xd8, 0xff, 0xe0), col("bytes")))
          .when(col("media_id") % 7 === 2,
            concat(sig(0x47, 0x49, 0x46, 0x38, 0x39, 0x61), col("bytes")))
          .otherwise(col("bytes")))
      Multimodal.sniffFormat(planted, "media_id", "bytes")
        .orderBy("media_id")
    }),

    // P362 — content-defined chunking dedup audit (mod-13 rolling-hash
    // cuts ≈ 13-byte blocks): measured 7,422 of 13,246 blocks /
    // 45,528 of 149,174 bytes duplicated at the gate SF — the
    // templated corpus's storage-dedup headroom
    "mm17_cdc_blocks" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.cdcBlocks(packed, "media_id", "bytes", modulus = 13)
        .orderBy("media_id")
    }),

    // P357 — pairwise byte-plane JSD between the language groups
    // (densified 256-byte grid per group; measured 1.8e-4..3.4e-4 on
    // this shared-vocabulary corpus — the honest "same byte plane,
    // different word mix" read, every pair distinct)
    "mm16_byte_jsd" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Multimodal.byteDistributionJsd(
          Multimodal.packText(docs, "doc_id", "text"), "media_id",
          "bytes", docs, "doc_id", "lang")
        .withColumnRenamed("group_a", "lang_a")
        .withColumnRenamed("group_b", "lang_b")
        .orderBy("lang_a", "lang_b")
    }),

    // P229 — intensity histogram over the raw byte planes: 16 bands
    // per media, the black-frame / solid-fill junk screen; every byte
    // replayed from hex pairs by the oracle
    "mm11_channelhist" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.channelHistogram(packed, "media_id", "bytes", buckets = 16)
        .orderBy("media_id", "bucket")
    }),

    // P94 — ViT patch grid over the stub codec's pixel planes: dims
    // replay decodeImageStub's byte-count geometry (sqrt is IEEE
    // correctly-rounded, so ceil(sqrt(n)) is portable), then one
    // generator row per 16x16 tile with clamped edge extents
    "mm4_patches" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          octet_length(col("text")).cast("long").as("n"))
        .withColumn("w",
          least(greatest(ceil(sqrt(col("n").cast("double"))), lit(1L)), lit(64L)))
        .withColumn("h", greatest(expr("(n + w - 1) div w"), lit(1L)))
      Multimodal.patchGrid(d, "media_id", "w", "h", patch = 16)
        .select("media_id", "w", "h", "patch_row", "patch_col",
          "x0", "y0", "pw", "ph")
        .orderBy("media_id", "patch_row", "patch_col")
    }),

    // P122 — fixed-hop frame enumeration over a fake audio corpus
    // (n_samples = 100x byte count, rate cycles 8/12/16 kHz): clamped
    // tails, exact integer millisecond timeline
    "mm5_frames" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("media_id"),
          (octet_length(col("text")).cast("long") * 100).as("n_samples"),
          (lit(8000L) + pmod(col("doc_id"), lit(3)) * 4000L).as("rate"))
      Multimodal.frameSample(d, "media_id", "n_samples", "rate",
          frameLen = 2048, hop = 1024)
        .select("media_id", "n_samples", "rate", "frame_idx",
          "start_sample", "flen", "t0_ms")
        .orderBy("media_id", "frame_idx")
    }),

    // P136 — SDXL-style aspect-ratio bucketing over a synthetic dims
    // grid (64..1600 × 64..896): nearest ladder rung in 9-rounded log
    // space, ties to the smaller bucket; rung constants are driver
    // literals shared with the oracle
    "mm6_aspect" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (lit(64L) + pmod(col("doc_id"), lit(97L)) * 16L).as("w"),
          (lit(64L) + pmod(col("doc_id"), lit(53L)) * 16L).as("h"))
      Multimodal.aspectBuckets(d, "media_id", "w", "h",
          Multimodal.aspectLadder(AspectRatios))
        .select("media_id", "w", "h", "bucket", "ratio", "tw", "th", "dist")
        .orderBy("media_id")
    }),

    // P158 — letterbox geometry downstream of the mm6 bucket assignment:
    // aspect-preserving scale, half-up resized extents, centering pads
    "mm7_letterbox" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (lit(64L) + pmod(col("doc_id"), lit(97L)) * 16L).as("w"),
          (lit(64L) + pmod(col("doc_id"), lit(53L)) * 16L).as("h"))
      val bucketed = Multimodal.aspectBuckets(d, "media_id", "w", "h",
        Multimodal.aspectLadder(AspectRatios))
      Multimodal.letterbox(bucketed, "w", "h", "tw", "th")
        .select("media_id", "w", "h", "bucket", "tw", "th", "scale",
          "rw", "rh", "pad_x", "pad_y")
        .orderBy("media_id")
    }),

    // P175 — 4KB tar-shard manifests over the packed text corpus: z4's
    // next-fit bins + an id-ordered md5 manifest per shard
    "mm8_shards" -> ((s, dir) => {
      val m = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          octet_length(col("text")).cast("long").as("n_bytes"))
      Multimodal.shardManifest(m, "media_id", "n_bytes",
          targetBytes = 4096L)
        .orderBy("shard_id")
    }),

    // P184 — per-epoch deterministic shard visit order over the mm8
    // shard plan: hash-ranked per epoch, resumable without RNG state
    "mm9_epochs" -> ((s, dir) => {
      val m = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          octet_length(col("text")).cast("long").as("n_bytes"))
      val shards = Multimodal.shardManifest(m, "media_id", "n_bytes",
        targetBytes = 4096L).select("shard_id")
      Multimodal.epochShardOrder(shards, "shard_id", epochs = 3)
        .orderBy("epoch", "position")
    }),

    // batched stub decode + feature extraction (deterministic fake codec);
    // batch_ok is layout-independent (every batch is 1..batchSize rows)
    // where the raw batch_size is not (the tail batch of each partition
    // is short, and partitioning is the planner's business)
    "mm2_features" -> ((s, dir) => {
      import s.implicits._
      val packed = Multimodal.packText(table(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.extractFeatures(packed.as[MediaRecord], batchSize = 32)
      feats.select(col("media_id"), col("n_bytes"),
          col("decode_width"), col("decode_height"), col("plane_checksum"),
          col("batch_size").between(1, 32).as("batch_ok"))
        .orderBy("media_id")
    })
  )

  /** mm3's pair derivation as shared oracle CTEs ending in `pairs`. */
  private val PhashPairCtes: String =
    """WITH d AS (
      |  SELECT a.doc_id AS doc_id, b.text AS text
      |  FROM documents a JOIN documents b ON a.doc_id % 100 = b.doc_id),
      |m AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |         octet_length(encode(text)) AS blen,
      |         GREATEST(octet_length(encode(text)), 1) AS n
      |  FROM d),
      |g AS (
      |  SELECT doc_id, hx, blen, n,
      |         GREATEST(1, LEAST(64, CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT))) AS w
      |  FROM m),
      |gg AS (
      |  SELECT *, GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) / w) AS BIGINT)) AS h
      |  FROM g),
      |v AS (
      |  SELECT doc_id,
      |    [CASE WHEN (LEAST(h-1, ((i//8)*h)//8) * w + LEAST(w-1, ((i%8)*w)//8)) < blen
      |          THEN ('0x' || substring(hx, 2*(LEAST(h-1, ((i//8)*h)//8) * w + LEAST(w-1, ((i%8)*w)//8)) + 1, 2))::INT
      |          ELSE 0 END
      |     FOR i IN range(64)] AS vals
      |  FROM gg),
      |s AS (SELECT doc_id, vals, list_sum(vals) AS tot FROM v),
      |hh AS (
      |  SELECT doc_id,
      |    CAST(list_sum([CASE WHEN 64 * vals[i+1] > tot THEN (1 << i) ELSE 0 END FOR i IN range(16)]) AS INT) AS c0,
      |    CAST(list_sum([CASE WHEN 64 * vals[i+1] > tot THEN (1 << (i-16)) ELSE 0 END FOR i IN range(16, 32)]) AS INT) AS c1,
      |    CAST(list_sum([CASE WHEN 64 * vals[i+1] > tot THEN (1 << (i-32)) ELSE 0 END FOR i IN range(32, 48)]) AS INT) AS c2,
      |    CAST(list_sum([CASE WHEN 64 * vals[i+1] > tot THEN (1 << (i-48)) ELSE 0 END FOR i IN range(48, 64)]) AS INT) AS c3
      |  FROM s),
      |pairs AS (
      |  SELECT a.doc_id AS i, b2.doc_id AS j,
      |    CAST(bit_count(xor(a.c0, b2.c0)) + bit_count(xor(a.c1, b2.c1))
      |       + bit_count(xor(a.c2, b2.c2)) + bit_count(xor(a.c3, b2.c3)) AS INT) AS hamming
      |  FROM hh a JOIN hh b2 ON a.doc_id < b2.doc_id
      |  WHERE bit_count(xor(a.c0, b2.c0)) + bit_count(xor(a.c1, b2.c1))
      |      + bit_count(xor(a.c2, b2.c2)) + bit_count(xor(a.c3, b2.c3)) <= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm1_pack" ->
      """SELECT doc_id AS media_id, 'text' AS kind, 'text/plain' AS mime_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS bytes_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the identical rung-constant table (driver literals — engine libm is
    // never consulted for a constant), 9-rounded ln on the data, and the
    // identical (dist, bucket) tie order
    "mm6_aspect" -> {
      val rungs = graft.operators.Multimodal.aspectLadder(AspectRatios)
      val vals = rungs.map(r =>
        s"(${r.bucket}, ${r.ratio}e0, ${r.lnLit}, ${r.tw}, ${r.th})")
        .mkString(", ")
      s"""WITH l(bucket, ratio, lnr, tw, th) AS (VALUES $vals),
         |d AS (
         |  SELECT doc_id AS media_id,
         |    CAST(64 + (doc_id % 97) * 16 AS BIGINT) AS w,
         |    CAST(64 + (doc_id % 53) * 16 AS BIGINT) AS h
         |  FROM documents),
         |sc AS (
         |  SELECT media_id, w, h, bucket, ratio,
         |    CAST(tw AS BIGINT) AS tw, CAST(th AS BIGINT) AS th,
         |    round(abs(round(ln(CAST(w AS DOUBLE) / CAST(h AS DOUBLE)), 9)
         |      - lnr), 9) AS dist
         |  FROM d, l),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY media_id
         |    ORDER BY dist ASC, bucket ASC) AS rn
         |  FROM sc)
         |SELECT media_id, w, h, bucket, ratio, tw, th, dist
         |FROM r WHERE rn = 1 ORDER BY media_id""".stripMargin
    },

    // the mm6 assignment extended by the identical scale/fit/pad double
    // sequence; rw/rh read the UNrounded scale, `scale` rounds at 9
    "mm7_letterbox" -> {
      val rungs = graft.operators.Multimodal.aspectLadder(AspectRatios)
      val vals = rungs.map(r =>
        s"(${r.bucket}, ${r.ratio}e0, ${r.lnLit}, ${r.tw}, ${r.th})")
        .mkString(", ")
      s"""WITH l(bucket, ratio, lnr, tw, th) AS (VALUES $vals),
         |d AS (
         |  SELECT doc_id AS media_id,
         |    CAST(64 + (doc_id % 97) * 16 AS BIGINT) AS w,
         |    CAST(64 + (doc_id % 53) * 16 AS BIGINT) AS h
         |  FROM documents),
         |sc AS (
         |  SELECT media_id, w, h, bucket,
         |    CAST(tw AS BIGINT) AS tw, CAST(th AS BIGINT) AS th,
         |    round(abs(round(ln(CAST(w AS DOUBLE) / CAST(h AS DOUBLE)), 9)
         |      - lnr), 9) AS dist
         |  FROM d, l),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY media_id
         |    ORDER BY dist ASC, bucket ASC) AS rn
         |  FROM sc),
         |pick AS (SELECT media_id, w, h, bucket, tw, th FROM r WHERE rn = 1),
         |g AS (
         |  SELECT *,
         |    least(CAST(tw AS DOUBLE) / CAST(w AS DOUBLE),
         |          CAST(th AS DOUBLE) / CAST(h AS DOUBLE)) AS sraw
         |  FROM pick),
         |fit AS (
         |  SELECT media_id, w, h, bucket, tw, th,
         |    round(sraw, 9) AS scale,
         |    least(tw, CAST(floor(CAST(w AS DOUBLE) * sraw + 0.5e0)
         |      AS BIGINT)) AS rw,
         |    least(th, CAST(floor(CAST(h AS DOUBLE) * sraw + 0.5e0)
         |      AS BIGINT)) AS rh
         |  FROM g)
         |SELECT media_id, w, h, bucket, tw, th, scale, rw, rh,
         |  CAST((tw - rw) // 2 AS BIGINT) AS pad_x,
         |  CAST((th - rh) // 2 AS BIGINT) AS pad_y
         |FROM fit ORDER BY media_id""".stripMargin
    },

    // the mm8 bin cut's distinct shard ids × an epoch range, ranked by
    // the 'epo:' MD5 fold with shard tie-break
    "mm9_epochs" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT media_id, n,
        |    CAST(SUM(n) OVER (ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM f),
        |sh AS (SELECT DISTINCT CAST((cum - n) // 4096 AS BIGINT)
        |         AS shard_id FROM c),
        |e AS (SELECT unnest(range(0, 3)) AS epoch),
        |h AS (
        |  SELECT CAST(e.epoch AS INT) AS epoch, sh.shard_id,
        |    list_reduce([CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)
        |        FOR ch IN string_split(substr(md5('epo:' ||
        |          CAST(e.epoch AS VARCHAR) || ':' ||
        |          CAST(sh.shard_id AS VARCHAR)), 1, 14), '')],
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM sh, e)
        |SELECT epoch, shard_id,
        |  CAST(row_number() OVER (PARTITION BY epoch
        |    ORDER BY hv, shard_id) AS BIGINT) AS position
        |FROM h ORDER BY epoch, position""".stripMargin,

    // the z4 cumulative bin cut + string_agg manifest in id order
    "mm8_shards" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT media_id, n,
        |    CAST(SUM(n) OVER (ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM f),
        |b AS (SELECT media_id, n, CAST((cum - n) // 4096 AS BIGINT)
        |        AS shard_id FROM c)
        |SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(n) AS BIGINT) AS shard_bytes,
        |  md5(string_agg(CAST(media_id AS VARCHAR), ',' ORDER BY media_id))
        |    AS manifest_md5
        |FROM b GROUP BY 1 ORDER BY shard_id""".stripMargin,

    // same stub geometry, grid arithmetic all-BIGINT; unnest(range(...))
    // expands the per-item tile ids
    // the mm4 geometry-replay pattern in 1-D: same octet_length(encode)
    // byte count, integer division framing, `//` ≡ Spark's div
    "mm5_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) * 100 AS n_samples,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS rate
        |  FROM documents WHERE doc_id % 5 = 0),
        |f AS (
        |  SELECT media_id, n_samples, rate,
        |    unnest(range(0, (n_samples + 1023) // 1024)) AS frame_idx
        |  FROM m WHERE n_samples > 0 AND rate > 0)
        |SELECT media_id, n_samples, rate, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_idx * 1024 AS BIGINT) AS start_sample,
        |  CAST(least(2048, n_samples - frame_idx * 1024) AS BIGINT) AS flen,
        |  CAST((frame_idx * 1024 * 1000) // rate AS BIGINT) AS t0_ms
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,

    "mm4_patches" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |dims AS (
        |  SELECT media_id, n,
        |    least(greatest(CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT), 1), 64) AS w
        |  FROM d),
        |dims2 AS (
        |  SELECT media_id, w, greatest((n + w - 1) // w, 1) AS h FROM dims),
        |g AS (
        |  SELECT media_id, w, h,
        |    (w + 15) // 16 AS nx, (h + 15) // 16 AS ny
        |  FROM dims2),
        |e AS (
        |  SELECT media_id, w, h, nx, unnest(range(0, nx * ny)) AS pid FROM g)
        |SELECT media_id, w, h,
        |  pid // nx AS patch_row, pid % nx AS patch_col,
        |  (pid % nx) * 16 AS x0, (pid // nx) * 16 AS y0,
        |  least(16, w - (pid % nx) * 16) AS pw,
        |  least(16, h - (pid // nx) * 16) AS ph
        |FROM e ORDER BY media_id, patch_row, patch_col""".stripMargin,

    // full aHash replay from raw bytes (the mm2 hex-pair idiom at 8x8)
    // plus an ALL-PAIRS hamming comparison — the banded Spark plan must
    // equal the brute-force definition exactly
    "mm3_phash_neardup" ->
      s"""$PhashPairCtes
         |SELECT i, j, hamming FROM pairs
         |ORDER BY i, j""".stripMargin,

    // the same pair CTEs + 3 unrolled min-label rounds (lab' =
    // least(own, min neighbor lab) — the d8 bounded semantics)
    "mm10_phash_clusters" ->
      s"""$PhashPairCtes,
         |sym AS (
         |  SELECT i AS id, j AS nb FROM pairs
         |  UNION ALL SELECT j AS id, i AS nb FROM pairs),
         |l0 AS (SELECT DISTINCT id, id AS lab FROM sym),
         |n1 AS (SELECT s2.id, MIN(l.lab) AS m FROM sym s2
         |       JOIN l0 l ON l.id = s2.nb GROUP BY 1),
         |l1 AS (SELECT l.id, LEAST(l.lab, coalesce(n1.m, l.lab)) AS lab
         |       FROM l0 l LEFT JOIN n1 ON n1.id = l.id),
         |n2 AS (SELECT s2.id, MIN(l.lab) AS m FROM sym s2
         |       JOIN l1 l ON l.id = s2.nb GROUP BY 1),
         |l2 AS (SELECT l.id, LEAST(l.lab, coalesce(n2.m, l.lab)) AS lab
         |       FROM l1 l LEFT JOIN n2 ON n2.id = l.id),
         |n3 AS (SELECT s2.id, MIN(l.lab) AS m FROM sym s2
         |       JOIN l2 l ON l.id = s2.nb GROUP BY 1),
         |l3 AS (SELECT l.id, LEAST(l.lab, coalesce(n3.m, l.lab)) AS lab
         |       FROM l2 l LEFT JOIN n3 ON n3.id = l.id)
         |SELECT id AS media_id, lab AS cluster_id
         |FROM l3 ORDER BY media_id""".stripMargin,

    // the same hex-pair byte replay framed by integer division; exact
    // BIGINT moments, one IEEE sqrt
    // per-(media, byte) exact counts; each p·ln p term 6-round-ln'd
    // then 9-rounded; log₂ rescale by the shared ln 2 driver literal
    // the planting replayed as hex-literal prefixes, detection as hex
    // prefix compares, n_bytes = hex length / 2
    "mm18_magic" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN '89504e470d0a1a0a' || lower(hex(encode(text)))
        |         WHEN doc_id % 7 = 1
        |           THEN 'ffd8ffe0' || lower(hex(encode(text)))
        |         WHEN doc_id % 7 = 2
        |           THEN '474946383961' || lower(hex(encode(text)))
        |         ELSE lower(hex(encode(text))) END AS hx
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT media_id, CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
        |  CASE WHEN substr(hx, 1, 16) = '89504e470d0a1a0a' THEN 'png'
        |       WHEN substr(hx, 1, 6) = 'ffd8ff' THEN 'jpeg'
        |       WHEN substr(hx, 1, 8) = '47494638' THEN 'gif'
        |       WHEN substr(hx, 1, 8) = '25504446' THEN 'pdf'
        |       WHEN substr(hx, 1, 8) = '504b0304' THEN 'zip'
        |       ELSE 'unknown' END AS format
        |FROM m ORDER BY media_id""".stripMargin,

    // the hex byte replay + lag-3 rolling hash, exclusive-prefix block
    // ids, md5 of each block's hex substring (LOWERCASE hex on both
    // sides — fingerprints compare as strings), fingerprint rank
    "mm17_cdc_blocks" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, n, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT media_id, n, i,
        |    ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT AS byte
        |  FROM b),
        |l AS (
        |  SELECT media_id, n, i, byte,
        |    lag(byte, 1) OVER w AS b1, lag(byte, 2) OVER w AS b2,
        |    lag(byte, 3) OVER w AS b3
        |  FROM v WINDOW w AS (PARTITION BY media_id ORDER BY i)),
        |c AS (
        |  SELECT media_id, n, i,
        |    CASE WHEN i >= 3 AND (b3 * 16777216 + b2 * 65536 +
        |      b1 * 256 + byte) % 13 = 0 THEN 1 ELSE 0 END AS cut
        |  FROM l),
        |k AS (
        |  SELECT media_id, n, i,
        |    CAST(coalesce(SUM(cut) OVER (PARTITION BY media_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS blk
        |  FROM c),
        |blocks AS (
        |  SELECT media_id, blk, CAST(MIN(i) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS len, CAST(MIN(n) AS BIGINT) AS nn
        |  FROM k GROUP BY 1, 2),
        |fp AS (
        |  SELECT blocks.media_id, blocks.nn, blocks.len, blocks.s,
        |    md5(substr(m.hx, CAST(2 * blocks.s + 1 AS INT),
        |      CAST(2 * blocks.len AS INT))) AS f
        |  FROM blocks JOIN m ON m.media_id = blocks.media_id),
        |rk AS (
        |  SELECT media_id, nn, len,
        |    row_number() OVER (PARTITION BY f ORDER BY media_id, s) AS r
        |  FROM fp)
        |SELECT media_id, CAST(MIN(nn) AS BIGINT) AS n_bytes,
        |  CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(SUM(CASE WHEN r > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_blocks,
        |  CAST(SUM(CASE WHEN r > 1 THEN len ELSE 0 END) AS BIGINT)
        |    AS dup_bytes
        |FROM rk GROUP BY 1 ORDER BY media_id""".stripMargin,

    // the hex byte replay per lang, densified over generate_series(0,255),
    // byte-keyed pair join (lang_a < lang_b), t18's 9-rounded
    // DECIMAL(28,9) JSD terms
    "mm16_byte_jsd" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, lang, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND lang IS NOT NULL),
        |b AS (
        |  SELECT lang, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT lang,
        |    ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT AS byte
        |  FROM b),
        |gc AS (SELECT lang, byte, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM v GROUP BY 1, 2),
        |grid AS (SELECT lang, unnest(generate_series(0, 255)) AS byte
        |         FROM (SELECT DISTINCT lang FROM gc)),
        |dense AS (
        |  SELECT grid.lang, grid.byte,
        |    CAST(coalesce(gc.c, 0) AS BIGINT) AS c
        |  FROM grid LEFT JOIN gc
        |    ON gc.lang = grid.lang AND gc.byte = grid.byte),
        |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n
        |        FROM dense GROUP BY 1),
        |dt AS (SELECT dense.lang, dense.byte, dense.c, tot.n
        |       FROM dense JOIN tot USING (lang)),
        |pr AS (
        |  SELECT a.lang AS ga, b2.lang AS gb, a.c AS ca, b2.c AS cb,
        |    a.n AS na, b2.n AS nb,
        |    CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE) AS p,
        |    CAST(b2.c AS DOUBLE) / CAST(b2.n AS DOUBLE) AS q
        |  FROM dt a JOIN dt b2 ON a.byte = b2.byte AND a.lang < b2.lang),
        |terms AS (
        |  SELECT ga, gb, na, nb,
        |    CASE WHEN ca > 0 THEN CAST(round(p * ln(p / (0.5e0 * (p + q))),
        |      9) AS DECIMAL(28,9)) ELSE CAST(0.0e0 AS DECIMAL(28,9)) END
        |      AS tp,
        |    CASE WHEN cb > 0 THEN CAST(round(q * ln(q / (0.5e0 * (p + q))),
        |      9) AS DECIMAL(28,9)) ELSE CAST(0.0e0 AS DECIMAL(28,9)) END
        |      AS tq
        |  FROM pr)
        |SELECT ga AS lang_a, gb AS lang_b,
        |  CAST(MIN(na) AS BIGINT) AS n_a, CAST(MIN(nb) AS BIGINT) AS n_b,
        |  round(0.5e0 * CAST(SUM(tp) AS DOUBLE) +
        |    0.5e0 * CAST(SUM(tq) AS DOUBLE), 6) AS jsd
        |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "mm13_byteentropy" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, n, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT media_id, n,
        |    ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT
        |      AS byte
        |  FROM b),
        |c AS (
        |  SELECT media_id, n, byte, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM v GROUP BY 1, 2, 3),
        |t AS (
        |  SELECT media_id, n, CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM(CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) *
        |      round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS s
        |  FROM c GROUP BY 1, 2)
        |SELECT media_id, n AS n_bytes, n_distinct,
        |  round(-s / 0.6931471805599453e0, 6) AS entropy_bits
        |FROM t ORDER BY media_id""".stripMargin,

    // 96-centred sign flips (the ASCII stub-plane centre — see the
    // query comment) via one media-partitioned lag window
    "mm14_zcr" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, n, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT media_id, n, i,
        |    (('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT
        |      >= 96) AS pos
        |  FROM b),
        |l AS (
        |  SELECT media_id, n, pos,
        |    lag(pos) OVER (PARTITION BY media_id ORDER BY i) AS prev
        |  FROM v),
        |a AS (
        |  SELECT media_id, n,
        |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> pos THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_crossings
        |  FROM l GROUP BY 1, 2)
        |SELECT media_id, n AS n_bytes, n_crossings,
        |  CASE WHEN n > 1 THEN round(CAST(n_crossings AS DOUBLE) /
        |    CAST(n - 1 AS DOUBLE), 6) END AS zcr
        |FROM a ORDER BY media_id""".stripMargin,

    "mm12_energy" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT media_id, i // 256 AS frame,
        |    ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT
        |      AS byte
        |  FROM b)
        |SELECT media_id, frame, CAST(COUNT(*) AS BIGINT) AS n_bytes_frame,
        |  round(CAST(SUM(byte) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_byte,
        |  round(sqrt(CAST(SUM(byte * byte) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE)), 6) AS rms,
        |  (round(sqrt(CAST(SUM(byte * byte) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE)), 6) < 32) AS silent
        |FROM v GROUP BY 1, 2 ORDER BY media_id, frame""".stripMargin,

    // frames as hex SUBSTRING fingerprints (no per-byte explode),
    // lag/running-sum islands per media; the planted id%5 freeze replays
    // at text level before the encode
    "mm19_frame_dups" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 5 = 0 THEN repeat(substr(text, 1, 32), 8)
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |h AS (
        |  SELECT media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM m),
        |f AS (
        |  SELECT media_id, unnest(generate_series(0, (n - 1) // 32))
        |    AS frame, hx
        |  FROM h WHERE n > 0),
        |fp AS (
        |  SELECT media_id, frame,
        |    substr(hx, CAST(2 * frame * 32 + 1 AS INT), 64) AS fpv
        |  FROM f),
        |l AS (
        |  SELECT media_id, frame, fpv,
        |    lag(fpv) OVER (PARTITION BY media_id ORDER BY frame) AS prev
        |  FROM fp),
        |c AS (
        |  SELECT media_id, frame, fpv,
        |    CASE WHEN prev IS NULL OR prev <> fpv THEN 1 ELSE 0 END AS chg
        |  FROM l),
        |i AS (
        |  SELECT media_id, fpv, chg,
        |    CAST(SUM(chg) OVER (PARTITION BY media_id ORDER BY frame
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM c),
        |runs AS (
        |  SELECT media_id, island, CAST(COUNT(*) AS BIGINT) AS run
        |  FROM i GROUP BY 1, 2),
        |mx AS (
        |  SELECT media_id, CAST(MAX(run) AS BIGINT) AS max_static_run
        |  FROM runs GROUP BY 1),
        |pm AS (
        |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(COUNT(DISTINCT fpv) AS BIGINT) AS n_distinct_frames,
        |    CAST(SUM(1 - chg) AS BIGINT) AS dup_consec_pairs
        |  FROM i GROUP BY 1)
        |SELECT pm.media_id, n_frames, n_distinct_frames, dup_consec_pairs,
        |  max_static_run,
        |  CASE WHEN n_frames > 1 THEN
        |    round(CAST(dup_consec_pairs AS DOUBLE) /
        |      CAST(n_frames - 1 AS DOUBLE), 6)
        |  END AS static_ratio
        |FROM pm JOIN mx USING (media_id) ORDER BY media_id""".stripMargin,

    // the mm12 frame replay at 64 bytes and bar 99, then textbook
    // gaps-and-islands (frame − row_number over silent frames) for the
    // longest run
    "mm15_silence" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, hx, unnest(generate_series(0, n - 1)) AS i
        |  FROM m WHERE n > 0),
        |v AS (
        |  SELECT media_id, i // 64 AS frame,
        |    ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT
        |      AS byte
        |  FROM b),
        |f AS (
        |  SELECT media_id, frame,
        |    (round(sqrt(CAST(SUM(byte * byte) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE)), 6) < 99) AS is_sil
        |  FROM v GROUP BY 1, 2),
        |tot AS (
        |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(coalesce(SUM(CASE WHEN is_sil THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_silent
        |  FROM f GROUP BY 1),
        |isl AS (
        |  SELECT media_id, frame,
        |    frame - row_number() OVER (PARTITION BY media_id
        |                               ORDER BY frame) AS island
        |  FROM f WHERE is_sil),
        |runs AS (
        |  SELECT media_id, island, CAST(COUNT(*) AS BIGINT) AS run
        |  FROM isl GROUP BY 1, 2),
        |mx AS (
        |  SELECT media_id, CAST(MAX(run) AS BIGINT) AS max_run
        |  FROM runs GROUP BY 1)
        |SELECT t.media_id, t.n_frames, t.n_silent,
        |  round(CAST(t.n_silent AS DOUBLE) / CAST(t.n_frames AS DOUBLE), 6)
        |    AS silence_ratio,
        |  CAST(coalesce(mx.max_run, 0) AS BIGINT) AS max_run
        |FROM tot t LEFT JOIN mx USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // every byte re-read as a hex pair, bucketed by integer division;
    // shares are exact BIGINT ratios
    "mm11_channelhist" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |b AS (
        |  SELECT media_id, n_bytes,
        |    unnest([(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::INT)
        |      // 16 FOR i IN range(n_bytes)]) AS bucket
        |  FROM m WHERE n_bytes > 0)
        |SELECT media_id, bucket, n_bytes, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  round(CAST(COUNT(*) AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6)
        |    AS share
        |FROM b GROUP BY 1, 2, 3
        |ORDER BY media_id, bucket""".stripMargin,

    // replay the stub decode+resize from raw bytes: dims from byte length,
    // nearest-neighbor 16x16 sample indices, byte values via hex pairs
    "mm2_features" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS blen,
        |         GREATEST(octet_length(encode(text)), 1) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, hx, blen, n,
        |         GREATEST(1, LEAST(64, CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT))) AS w
        |  FROM m),
        |gg AS (
        |  SELECT *, GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) / w) AS BIGINT)) AS h
        |  FROM g)
        |SELECT doc_id AS media_id, CAST(blen AS BIGINT) AS n_bytes,
        |  CAST(w AS INT) AS decode_width, CAST(h AS INT) AS decode_height,
        |  CAST(list_sum([
        |    CASE WHEN (LEAST(h-1, ((i//16)*h)//16) * w + LEAST(w-1, ((i%16)*w)//16)) < blen
        |         THEN ('0x' || substring(hx, 2*(LEAST(h-1, ((i//16)*h)//16) * w + LEAST(w-1, ((i%16)*w)//16)) + 1, 2))::INT
        |         ELSE 0 END
        |    for i in range(256)]) AS BIGINT) AS plane_checksum,
        |  TRUE AS batch_ok
        |FROM gg ORDER BY media_id""".stripMargin
  )
}
