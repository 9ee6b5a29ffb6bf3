package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary schema, partition sizing, batch assembly,
  * deterministic stub codec. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media = Multimodal.packText(
    Seq((1L, "hello world"), (2L, "a" * 100), (3L, "short"))
      .toDF("id", "text"), "id", "text")

  test("packText produces binary bytes with typed metadata") {
    val rows = media.orderBy("media_id").collect()
    assert(media.schema("bytes").dataType.typeName == "binary")
    assert(rows.map(_.getAs[Long]("n_bytes")).toSeq == Seq(11L, 100L, 5L))
    assert(rows.forall(_.getAs[String]("mime_type") == "text/plain"))
    assert(new String(rows(0).getAs[Array[Byte]]("bytes"), "UTF-8") == "hello world")
  }

  test("repartitionForDecode sizes partitions by byte volume") {
    val parts = Multimodal.repartitionForDecode(media, targetBytesPerPartition = 60)
    assert(parts.rdd.getNumPartitions == 2) // 116 bytes / 60 → 2 partitions
  }

  test("repartitionForDecode with a byte hint runs no job") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val parts = Multimodal.repartitionForDecode(media, targetBytesPerPartition = 60,
        totalBytesHint = Some(116L))
      // plan construction must stay lazy — the pre-counted corpus skips
      // the sum(n_bytes) aggregate entirely. Drain the async listener bus
      // instead of sleeping so the negative assertion is deterministic: a
      // job the hint failed to avoid has certainly posted its start event
      // once the bus is empty.
      org.apache.spark.sql.GraftBridge.waitForListenerBus(spark)
      assert(jobs.get() == 0)
      assert(parts.rdd.getNumPartitions == 2)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("stub decode is deterministic and dimension-sane") {
    val a = Multimodal.decodeImageStub("hello world".getBytes)
    val b = Multimodal.decodeImageStub("hello world".getBytes)
    assert(a.width == b.width && a.height == b.height)
    assert(a.pixels.toSeq == b.pixels.toSeq)
    assert(a.width * a.height >= 11)
    assert(a.pixels.forall(p => p >= 0.0f && p <= 1.0f))
  }

  test("resize preserves bounds; frame sampling picks every Nth chunk") {
    val img = Multimodal.decodeImageStub((0 until 100).map(_.toByte).toArray)
    val r = Multimodal.resizeStub(img, 16, 16)
    assert(r.width == 16 && r.height == 16 && r.pixels.length == 256)
    val frames = Multimodal.frameSampleStub((0 until 100).map(_.toByte).toArray, 10, 3)
    assert(frames.length == 4) // chunks 0,3,6,9 of the ten 10-byte chunks
    assert(frames.head.length == 10)
  }

  test("extractFeatures batches inside partitions and embeds each record") {
    val ds = media.as[MediaRecord].repartition(1)
    val feats = Multimodal.extractFeatures(ds, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.embedding.length == 8))
    // one partition, batch size 2 → batches of 2 and 1
    assert(feats.map(_.batch_size).sorted.toSeq == Seq(1, 2, 2))
    // embedding is deterministic
    val again = Multimodal.extractFeatures(ds, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
    // n_bytes provenance rides through the batch path untouched
    assert(feats.map(_.n_bytes).toSeq == Seq(11L, 100L, 5L))
    // plane_checksum is the exact integer byte-sum of the resized plane —
    // the float byte/255 representation must round-trip losslessly
    feats.foreach { f =>
      val rec = media.as[MediaRecord].collect().find(_.media_id == f.media_id).get
      val resized = Multimodal.resizeStub(Multimodal.decodeImageStub(rec.bytes), 16, 16)
      val expected = resized.pixels.map(p => math.round(p * 255.0f).toLong).sum
      assert(f.plane_checksum == expected, s"media ${f.media_id}")
      assert(f.plane_checksum > 0)
    }
  }

  test("stub decode survives empty byte arrays (dimension floor, zero plane)") {
    val img = Multimodal.decodeImageStub(Array.emptyByteArray)
    assert(img.width == 1 && img.height == 1)
    assert(img.pixels.toSeq == Seq(0.0f))
  }

  private def fixturePng: Array[Byte] = {
    val in = getClass.getResourceAsStream("/multimodal/gradient_6x4.png")
    try in.readAllBytes() finally in.close()
  }

  test("real codec decodes the committed PNG fixture with exact dims and luma") {
    // fixture: 6x4, pixel (x,y) = RGB(v, 255-v, v) with v = (y*6+x)*10
    val img = Multimodal.decodeImage(fixturePng).get
    assert(img.width == 6 && img.height == 4)
    assert(img.pixels.length == 24)
    for (y <- 0 until 4; x <- 0 until 6) {
      val v = (y * 6 + x) * 10
      val expected = (0.299f * v + 0.587f * (255 - v) + 0.114f * v) / 255.0f
      val got = img.pixels(y * 6 + x)
      assert(math.abs(got - expected) < 1e-6f, s"pixel ($x,$y): $got vs $expected")
    }
    // non-image bytes are a None, not an exception
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // truncated PNG (header only) must not throw either
    assert(Multimodal.decodeImage(fixturePng.take(20)).isEmpty)
  }

  test("extractFeatures with the real codec decodes PNG bytes inside mapPartitions") {
    val png = fixturePng
    val frame = Seq(
      (10L, "image", png, "image/png", png.length.toLong),
      (11L, "text", "plain text rider".getBytes("UTF-8"), "text/plain", 16L))
      .toDF("media_id", "kind", "bytes", "mime_type", "n_bytes")
    val feats = Multimodal.extractFeatures(frame.as[MediaRecord].repartition(1),
        batchSize = 2, codec = Multimodal.imageOrStubCodec)
      .collect().sortBy(_.media_id)
    assert(feats.length == 2)
    // the PNG record reports REAL decoded dims (6x4), not the stub's
    // sqrt-of-byte-length geometry
    assert(feats(0).decode_width == 6 && feats(0).decode_height == 4)
    // both rode the same batch through the partition
    assert(feats.map(_.batch_size).toSeq == Seq(2, 2))
    // checksum = byte-sum of the 16x16 NN resize of the real luma plane
    val resized = Multimodal.resizeStub(Multimodal.decodeImage(png).get, 16, 16)
    val expected = resized.pixels.map(p => math.round(p * 255.0f).toLong).sum
    assert(feats(0).plane_checksum == expected)
    // the non-image record fell back to the stub codec deterministically
    val stubDims = Multimodal.decodeImageStub("plain text rider".getBytes("UTF-8"))
    assert(feats(1).decode_width == stubDims.width &&
      feats(1).decode_height == stubDims.height)
  }

  test("perceptualHash chunks + banded near-dup pairs equal brute-force hamming") {
    def rec(id: Long, text: String): MediaRecord = {
      val b = text.getBytes("UTF-8")
      MediaRecord(id, "text", b, "text/plain", b.length.toLong)
    }
    // 1 and 2 identical (hamming 0); 3 a small perturbation of 1;
    // 4 and 5 unrelated content
    val recs = Seq(
      rec(1L, "the quick brown fox jumps over the lazy dog again and again"),
      rec(2L, "the quick brown fox jumps over the lazy dog again and again"),
      rec(3L, "the quick brown fox jumps over the lazy dog again and agaiN"),
      rec(4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzz AAAA zzzz AAAA zzzzzzzzzzzz"),
      rec(5L, "totally different content with its own byte distribution!!")
    )
    val hashes = Multimodal.perceptualHash(spark.createDataset(recs)).cache()
    val hs = hashes.collect().map(r => r.getLong(0) ->
      Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    // chunk values are 16-bit
    assert(hs.values.flatten.forall(c => c >= 0 && c <= 0xFFFF))
    assert(hs(1L).toSeq == hs(2L).toSeq) // identical bytes → identical hash
    // the banded join must equal the brute-force definition at every
    // allowed threshold (pigeonhole completeness)
    def brute(maxHam: Int) = (for {
      i <- recs.map(_.media_id); j <- recs.map(_.media_id) if i < j
      ham = (0 until 4).map(c => Integer.bitCount(hs(i)(c) ^ hs(j)(c))).sum
      if ham <= maxHam
    } yield (i, j, ham)).toSet
    for (maxHam <- 0 to 3) {
      val got = Multimodal.phashNearDupPairs(hashes, maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(maxHam), s"maxHamming=$maxHam: $got vs ${brute(maxHam)}")
    }
    assert(Multimodal.phashNearDupPairs(hashes, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    intercept[IllegalArgumentException](Multimodal.phashNearDupPairs(hashes, 4))
    hashes.unpersist()
  }

  test("patchGrid tiles the plane and clamps edge patches") {
    import spark.implicits._
    val dims = Seq(
      (1L, 32L, 32L),   // exact 2x2 grid of full tiles
      (2L, 20L, 10L),   // ragged: 2x1 grid, clamped edges
      (3L, 0L, 16L),    // degenerate -> dropped
      (4L, 16L, 16L)    // single tile
    ).toDF("id", "w", "h")
    val got = Multimodal.patchGrid(dims, "id", "w", "h", patch = 16)
      .select("id", "patch_row", "patch_col", "x0", "y0", "pw", "ph")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keys.count(_._1 == 1L) == 4)
    assert(got((1L, 1L, 1L)) == ((16L, 16L, 16L, 16L)))
    assert(got.keys.count(_._1 == 2L) == 2)
    assert(got((2L, 0L, 0L)) == ((0L, 0L, 16L, 10L)))
    assert(got((2L, 0L, 1L)) == ((16L, 0L, 4L, 10L)))
    assert(!got.keys.exists(_._1 == 3L))
    assert(got((4L, 0L, 0L)) == ((0L, 0L, 16L, 16L)))
    intercept[IllegalArgumentException](
      Multimodal.patchGrid(dims, "id", "w", "h", patch = 0))
  }

  test("frameSample: hop grid, clamped tail, integer ms, junk dropped") {
    import spark.implicits._
    val media = Seq(
      (1L, Some(3000L), Some(1000L)),   // 3 frames, tail clamps to 952
      (2L, Some(100L), Some(8000L)),    // single short frame
      (3L, Some(0L), Some(8000L)),      // zero samples: dropped
      (4L, Option.empty[Long], Some(8000L)),
      (5L, Some(4096L), Option.empty[Long]))
      .toDF("id", "n", "rate")
    val got = Multimodal.frameSample(media, "id", "n", "rate",
        frameLen = 2048, hop = 1024)
      .select("id", "frame_idx", "start_sample", "flen", "t0_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    assert(got((1L, 0L)) == ((0L, 2048L, 0L)))
    assert(got((1L, 1L)) == ((1024L, 1976L, 1024L)))   // clamp: 3000−1024
    assert(got((1L, 2L)) == ((2048L, 952L, 2048L)))
    assert(got((2L, 0L)) == ((0L, 100L, 0L)))
    intercept[IllegalArgumentException](
      Multimodal.frameSample(media, "id", "n", "rate", 0, 1))
    intercept[IllegalArgumentException](
      Multimodal.frameSample(media, "id", "n", "rate", 2048, 0))
  }

  test("aspectBuckets picks the nearest log-space rung; ties break low") {
    import spark.implicits._
    val ladder = Multimodal.aspectLadder(Seq(0.5, 1.0, 2.0))
    // snapped targets for area 2^20: 1.0 → 1024×1024; 2.0 → 1472×704
    assert(ladder.map(r => (r.ratio, r.tw, r.th)) ==
      Seq((0.5, 704L, 1472L), (1.0, 1024L, 1024L), (2.0, 1472L, 704L)))
    val imgs = Seq((1L, 100L, 100L),  // square → bucket 1 exactly
      (2L, 400L, 100L),               // 4:1 → nearest is 2.0
      (3L, 100L, 399L),               // ~1:4 → nearest is 0.5
      (4L, 0L, 50L)                   // dropped: non-positive dim
    ).toDF("id", "w", "h")
    val got = Multimodal.aspectBuckets(imgs, "id", "w", "h", ladder)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(3), r.getDouble(4), r.getDouble(7)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 1 && got(1L)._3 == 0.0)
    assert(got(2L)._1 == 2 && got(3L)._1 == 0)
    // duplicate rungs tie on distance exactly → smaller bucket id wins
    val dup = Multimodal.aspectLadder(Seq(1.0, 1.0))
    val sq = Seq((9L, 100L, 100L)).toDF("id", "w", "h")
    assert(Multimodal.aspectBuckets(sq, "id", "w", "h", dup)
      .head.getInt(3) == 0)
    intercept[IllegalArgumentException](
      Multimodal.aspectBuckets(imgs, "id", "w", "h", Seq.empty))
    intercept[IllegalArgumentException](Multimodal.aspectLadder(Seq(-1.0)))
  }

  test("letterbox: aspect-preserving fit, half-up extents, centered pads") {
    import spark.implicits._
    val rows = Seq(
      (1L, 200L, 100L, 100L, 100L),  // wide into square: fit on width
      (2L, 100L, 300L, 100L, 100L),  // tall: 33.33 → rounds to 33
      (3L, 50L, 50L, 100L, 100L),    // upscale 2×, no pads
      (4L, 0L, 10L, 100L, 100L))     // dropped: degenerate dim
      .toDF("id", "w", "h", "tw", "th")
    val got = Multimodal.letterbox(rows, "w", "h", "tw", "th")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((100L, 50L, 0L, 25L)))   // 200×100 → 100×50, pad_y 25
    assert(got(2L) == ((33L, 100L, 33L, 0L)))   // 100×300 → 33×100 (pads 33,34)
    assert(got(3L) == ((100L, 100L, 0L, 0L)))
    // scale column is the rounded min-ratio
    val s1 = Multimodal.letterbox(rows, "w", "h", "tw", "th")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(s1(1L) == 0.5 && s1(3L) == 2.0)
  }

  test("shardManifest: next-fit bins with id-ordered md5 manifests") {
    import spark.implicits._
    // sizes 6,6,6 with target 10: shard 0 = {1,2} (cum 6 then 12 —
    // next-fit lets the second overflow), shard 1 = {3}
    val media = Seq((1L, 6L), (2L, 6L), (3L, 6L)).toDF("id", "bytes")
    val got = Multimodal.shardManifest(media, "id", "bytes", 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def man(ids: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(ids.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0L) == ((2L, 12L, man("1,2"))))
    assert(got(1L) == ((1L, 6L, man("3"))))
  }

  test("epochShardOrder: per-epoch hash permutations, replayable") {
    import spark.implicits._
    val shards = Seq(0L, 1L, 2L, 3L).toDF("shard_id")
    val got = Multimodal.epochShardOrder(shards, "shard_id", epochs = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every epoch is a complete 1..4 permutation
    assert(got.size == 12)
    (0 until 3).foreach { e =>
      assert((0L to 3L).map(s => got((e, s))).sorted == Seq(1L, 2L, 3L, 4L))
    }
    // epochs genuinely differ (3 identical permutations of 4 have odds
    // (1/24)^2 under the hash — a collision here means the salt broke)
    val perms = (0 until 3).map(e => (0L to 3L).map(s => got((e, s))))
    assert(perms.distinct.size > 1)
    // deterministic: the same call replays the identical order
    val again = Multimodal.epochShardOrder(shards, "shard_id", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == got)
    intercept[IllegalArgumentException](
      Multimodal.epochShardOrder(shards, "shard_id", 0))
  }

  test("channelHistogram: byte-exact buckets over a known payload") {
    import spark.implicits._
    // "AAAA!" = 0x41 ×4 (bucket 4) + 0x21 (bucket 2)
    val df = Seq((1L, "AAAA!"), (2L, ""), (3L, " ÿ"))
      .toDF("id", "t")
      .select(col("id"), encode(col("t"), "UTF-8").as("bytes"))
    val got = Multimodal.channelHistogram(df, "id", "bytes").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got((1L, 4L)) == ((4L, 0.8)) && got((1L, 2L)) == ((1L, 0.2)))
    // empty payload dropped entirely
    assert(!got.keySet.exists(_._1 == 2L))
    // space 0x20 → bucket 2; ÿ is 2 UTF-8 bytes 0xc3 0xbf → buckets 12, 11
    assert(got((3L, 2L))._1 == 1L && got((3L, 12L))._1 == 1L &&
      got((3L, 11L))._1 == 1L)
    intercept[IllegalArgumentException](
      Multimodal.channelHistogram(df, "id", "bytes", buckets = 3))
  }

  test("frameEnergy: frames partition the stream, silence flag fires on zeros") {
    import spark.implicits._
    // 4 zero bytes then 4 × 0x64 (=100): frameSize 4 → frame 0 silent
    // (rms 0), frame 1 rms 100
    val payload = Array.fill(4)(0.toByte) ++ Array.fill(4)(100.toByte)
    val df = Seq((7L, payload)).toDF("id", "bytes")
    val rows = Multimodal.frameEnergy(df, "id", "bytes", frameSize = 4)
      .orderBy("frame").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 4L)
    assert(rows(0).getDouble(3) == 0.0 && rows(0).getDouble(4) == 0.0 &&
      rows(0).getBoolean(5))
    assert(rows(1).getDouble(3) == 100.0 && rows(1).getDouble(4) == 100.0 &&
      !rows(1).getBoolean(5))
    // a partial tail frame keeps its true length
    val odd = Seq((8L, Array.fill(5)(10.toByte))).toDF("id", "bytes")
    val tail = Multimodal.frameEnergy(odd, "id", "bytes", frameSize = 4)
      .orderBy("frame").collect()
    assert(tail.map(_.getLong(2)).toSeq == Seq(4L, 1L))
    intercept[IllegalArgumentException](
      Multimodal.frameEnergy(df, "id", "bytes", 0))
  }

  test("silenceRuns: ratio + longest consecutive run, zero on all-loud") {
    import spark.implicits._
    // frames of 2 bytes: silent, loud, silent, silent → ratio 0.75 and
    // the RUN is 2 (the trailing pair), not the total 3
    val p1 = Array[Byte](0, 0, 100, 100, 0, 0, 0, 0)
    val p2 = Array.fill(4)(100.toByte) // no silent frame at all
    val df = Seq((1L, p1), (2L, p2)).toDF("id", "bytes")
    val got = Multimodal.silenceRuns(df, "id", "bytes",
        frameSize = 2, silenceRms = 32).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got(1L) == ((4L, 3L, 0.75, 2L)))
    assert(got(2L) == ((2L, 0L, 0.0, 0L)))
  }

  test("byteEntropy: constant plane reads 0 bits, a two-value coin " +
      "reads 1 bit") {
    import spark.implicits._
    val df = Seq((1L, "aaaa"), (2L, "abab")).toDF("doc_id", "text")
    val packed = Multimodal.packText(df, "doc_id", "text")
    val got = Multimodal.byteEntropy(packed, "media_id", "bytes")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._2 == 1L && got(1L)._3 == 0.0)
    assert(got(2L)._2 == 2L && math.abs(got(2L)._3 - 1.0) < 1e-5)
  }

  test("zeroCrossingRate: alternating halves read 1, constant reads 0; " +
      "the centre decides the halves") {
    import spark.implicits._
    // 'a' = 97 ≥ 96, 'A' = 65 < 96 → every step flips at centre 96
    val df = Seq((1L, "aAaA"), (2L, "aaaa")).toDF("doc_id", "text")
    val packed = Multimodal.packText(df, "doc_id", "text")
    val got = Multimodal.zeroCrossingRate(packed, "media_id", "bytes",
        centre = 96)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 1.0)))
    assert(got(2L) == ((0L, 0.0)))
    // at the PCM default both strings sit entirely below 128 → 0
    val pcm = Multimodal.zeroCrossingRate(packed, "media_id", "bytes")
      .collect().map(_.getLong(2)).sum
    assert(pcm == 0L)
    intercept[IllegalArgumentException](
      Multimodal.zeroCrossingRate(packed, "media_id", "bytes", 0))
  }

  test("sniffFormat: magic bytes win over content, text reads unknown") {
    val base = Multimodal.packText(
      Seq((1L, "plain text"), (2L, "x"), (3L, "y"), (4L, "z"), (5L, "w"))
        .toDF("id", "t"), "id", "t")
    def sig(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
    val planted = base.withColumn("bytes",
      when(col("media_id") === 2,
        concat(sig(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
          col("bytes")))
        .when(col("media_id") === 3,
          concat(sig(0xff, 0xd8, 0xff, 0xdb), col("bytes")))
        .when(col("media_id") === 4, sig(0x25, 0x50, 0x44, 0x46, 0x2d))
        .when(col("media_id") === 5, sig(0x50, 0x4b, 0x03, 0x04))
        .otherwise(col("bytes")))
    val got = Multimodal.sniffFormat(planted, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((10L, "unknown")))
    assert(got(2L)._2 == "png" && got(2L)._1 == 9L)
    assert(got(3L)._2 == "jpeg") // any FFD8FF variant
    assert(got(4L) == ((5L, "pdf")))
    assert(got(5L) == ((4L, "zip")))
  }

  test("cdcBlocks: identical payloads dedup block-for-block, disjoint " +
      "payloads don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "ZZZZ QQQQ XXXX VVVV KKKK")).toDF("id", "t")
    val packed = Multimodal.packText(docs, "id", "t")
    val got = Multimodal.cdcBlocks(packed, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val (m1, m2, m3) = (got(1L), got(2L), got(3L))
    // same content → same boundaries → same block count
    assert(m1.getLong(2) == m2.getLong(2))
    // media 1 owns every fingerprint (smaller id), media 2 is all dup
    assert(m1.getLong(3) == 0L && m1.getLong(4) == 0L)
    assert(m2.getLong(3) == m2.getLong(2))
    assert(m2.getLong(4) == m2.getLong(1)) // every byte deduplicable
    // disjoint character set shares nothing
    assert(m3.getLong(3) == 0L && m3.getLong(4) == 0L)
    // block lengths partition the payload
    assert(m1.getLong(1) == 59L)
    intercept[IllegalArgumentException](
      Multimodal.cdcBlocks(packed, "media_id", "bytes", modulus = 1))
  }

  test("byteDistributionJsd: hand distributions, zero-count guard, " +
      "identical groups read 0") {
    val docs = Seq((1L, "aa", "ga"), (2L, "ab", "gb"), (3L, "aa", "gc"))
      .toDF("id", "t", "g")
    val packed = Multimodal.packText(docs, "id", "t")
    val got = Multimodal.byteDistributionJsd(packed, "media_id", "bytes",
        docs, "id", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    // ga = {97: 1.0}; gb = {97: .5, 98: .5}
    val tp97 = r9(1.0 * math.log(1.0 / (0.5 * 1.5)))
    val tq97 = r9(0.5 * math.log(0.5 / (0.5 * 1.5)))
    val tq98 = r9(0.5 * math.log(0.5 / (0.5 * 0.5)))
    val expected = r6(BigDecimal(0.5) * tp97 +
      BigDecimal(0.5) * (tq97 + tq98))
    val ab = got(("ga", "gb"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 2L)
    assert(ab.getDouble(4) == expected)
    // identical byte distributions → exactly 0
    assert(got(("ga", "gc")).getDouble(4) == 0.0)
    assert(got.size == 3) // all unordered pairs present
  }

  test("frameDupRuns: adjacent-equality runs, partial tail frame, " +
      "single-frame media") {
    import spark.implicits._
    val docs = Seq(
      (1L, "AAAABBBB".getBytes("UTF-8")),     // 2 distinct frames
      (2L, "XXXXXXXXXXXX".getBytes("UTF-8")), // 3 identical frames
      (3L, "ABCDABCDEF".getBytes("UTF-8")),   // ABCD, ABCD, EF (partial)
      (4L, "QQ".getBytes("UTF-8")))           // single (short) frame
      .toDF("id", "bytes")
    val got = Multimodal.frameDupRuns(docs, "id", "bytes", frameSize = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getLong(1) == 2L && r1.getLong(2) == 2L &&
      r1.getLong(3) == 0L && r1.getLong(4) == 1L &&
      r1.getDouble(5) == 0.0)
    val r2 = got(2L)
    assert(r2.getLong(1) == 3L && r2.getLong(2) == 1L &&
      r2.getLong(3) == 2L && r2.getLong(4) == 3L &&
      r2.getDouble(5) == 1.0)
    // the partial EF tail is its own (shorter) fingerprint
    val r3 = got(3L)
    assert(r3.getLong(1) == 3L && r3.getLong(2) == 2L &&
      r3.getLong(3) == 1L && r3.getLong(4) == 2L &&
      r3.getDouble(5) == 0.5)
    val r4 = got(4L)
    assert(r4.getLong(1) == 1L && r4.getLong(4) == 1L && r4.isNullAt(5))
    intercept[IllegalArgumentException](
      Multimodal.frameDupRuns(docs, "id", "bytes", 0))
  }
}
