package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media record: opaque bytes + typed metadata travelling together. */
case class MediaRecord(
    media_id: Long,
    kind: String,          // image | audio | video | text
    bytes: Array[Byte],
    mime_type: String,
    n_bytes: Long)

/** Decoded representation produced by the (stubbed) codec layer. */
case class DecodedImage(width: Int, height: Int, pixels: Array[Float])

/** Extracted feature row: fixed-width embedding + provenance. The integer
  * `plane_checksum` (byte-value sum of the resized plane) exists so the
  * deterministic part of the stub pipeline is exactly replayable by an
  * external engine — float embeddings can't be hash-compared across
  * engines, an integer checksum can. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    embedding: Array[Float],
    decode_width: Int,
    decode_height: Int,
    plane_checksum: Long,
    batch_size: Int)

/**
 * Multimodal pipeline plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed by batched `mapPartitions` — the
 * Spark-side shape (schema, partitioning, batch assembly) is real and
 * tested; only the codec itself is a STUB (this container has no imaging
 * libraries), clearly marked below and swappable for a JNI/ONNX decoder
 * without touching the plan.
 *
 * Scale design: bytes never hit the driver; partitions are sized by byte
 * volume (not row count) so one task holds a bounded decode working set;
 * records batch inside each partition exactly like GPU inference wants.
 */
object Multimodal {

  /** Pack a string column as a media-bytes frame (the text modality; also
    * the test harness for the binary plumbing — byte counts and hashes are
    * verifiable against any engine).
    *
    * `fanOut = false` skips the [[graft.Graft.parallelizeMap]] input
    * fanout: consumers whose per-byte work is LIGHT (one md5 / a prefix
    * sniff per stream) pay the fanout exchange without repaying it —
    * measured r11-opt: mm1 0.23 → 0.56 s, mm18 0.24 → 0.68 s, mm3
    * 0.94 → 1.98 s — while the per-byte hex-replay family (mm11–mm17,
    * mm19) repays it 2–4×. The caller owns the call: it knows its
    * downstream work. */
  def packText(df: DataFrame, idCol: String, textCol: String,
      fanOut: Boolean = true): DataFrame =
    // everything downstream of a packed corpus is per-byte/per-pixel
    // compute (hex replays, hashes, decodes) — fan a below-parallelism
    // input out first (no-op at scale; see Graft.parallelizeMap)
    (if (fanOut) graft.Graft.parallelizeMap(df) else df).select(
      col(idCol).cast("long").as("media_id"),
      lit("text").as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit("text/plain").as("mime_type"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** Size the partition COUNT by total byte volume so the average decode
    * task holds ~`targetBytesPerPartition`. Distribution is hash-by-id, so
    * a single record far above the target still lands whole in one task —
    * cap oversized media upstream (or split containers into chunks) if the
    * corpus has them.
    *
    * `totalBytesHint`: pass the corpus byte volume when the caller already
    * knows it (catalog stats, an ingest-time counter, a prior aggregate) —
    * otherwise this runs ONE extra `sum(n_bytes)` job over the frame before
    * the decode pass. */
  def repartitionForDecode(df: DataFrame, targetBytesPerPartition: Long,
      totalBytesHint: Option[Long] = None): DataFrame = {
    require(totalBytesHint.forall(_ > 0),
      s"repartitionForDecode: totalBytesHint must be positive, got " +
        s"${totalBytesHint.get} — pass None to have the corpus measured")
    val totalBytes = totalBytesHint.getOrElse {
      val row = df.agg(sum(col("n_bytes"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
    df.repartition(parts, col("media_id"))
  }

  // ---- Real codec (in-JDK) --------------------------------------------------

  /** REAL image decode for PNG/JPEG/GIF/BMP via `javax.imageio.ImageIO` —
    * ships in the JDK, so no native/library dependency. Produces the same
    * [[DecodedImage]] contract as the stub: a single luminance plane
    * (ITU-R BT.601 weights) normalized to [0,1]. Returns None when the
    * bytes aren't a decodable image (no registered reader, truncated
    * stream), letting callers fall back rather than poisoning the batch. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val pixels = new Array[Float](w * h)
        var i = 0
        while (i < pixels.length) {
          val v = rgb(i)
          val r = (v >> 16) & 0xFF
          val g = (v >> 8) & 0xFF
          val b = v & 0xFF
          pixels(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
          i += 1
        }
        Some(DecodedImage(w, h, pixels))
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Production codec for [[extractFeatures]]: real ImageIO decode when the
    * bytes are a recognizable image, deterministic stub otherwise (text and
    * other non-image modalities keep their fake-decode semantics). */
  val imageOrStubCodec: Array[Byte] => DecodedImage =
    bytes => decodeImage(bytes).getOrElse(decodeImageStub(bytes))

  // ---- STUB codec layer -----------------------------------------------------
  // Real decoders (JPEG/PNG/WAV/MP4) need native libraries not present in
  // this container. The stubs below are DETERMINISTIC FAKES that preserve
  // the data-flow contract: bytes in → dimensioned float planes out. Swap
  // `decodeImageStub` for an actual codec to productionize; nothing else
  // changes.

  /** STUB: "decode" bytes into a WxH float plane. Deterministic: dims from
    * byte length, pixels from a rolling transform of the bytes. */
  def decodeImageStub(bytes: Array[Byte]): DecodedImage = {
    val n = math.max(bytes.length, 1)
    val width = math.max(1, math.min(64, math.ceil(math.sqrt(n.toDouble)).toInt))
    val height = math.max(1, math.ceil(n.toDouble / width).toInt)
    val pixels = new Array[Float](width * height)
    var i = 0
    while (i < pixels.length) {
      // bound by the REAL byte count, not n: n is clamped to >= 1 for the
      // dimension math, and indexing bytes(0) of an empty record would throw
      pixels(i) = if (i < bytes.length) ((bytes(i) & 0xFF) / 255.0f) else 0.0f
      i += 1
    }
    DecodedImage(width, height, pixels)
  }

  /** STUB: nearest-neighbor resize of a decoded plane — the arithmetic is
    * real; only the source plane is fake. */
  def resizeStub(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        out(y * w + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, out)
  }

  /** STUB: sample every `everyN`-th fixed-size frame from a byte stream
    * (the video path: container demux is faked as fixed-size chunks). */
  def frameSampleStub(bytes: Array[Byte], frameSize: Int, everyN: Int): Seq[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (frame, i) if i % everyN == 0 => frame }
      .toSeq

  /** Mean/std/quartile summary of a plane → fixed 8-dim embedding. Real
    * math over the (stub-)decoded plane. */
  def planeEmbedding(img: DecodedImage): Array[Float] = {
    val p = img.pixels
    if (p.isEmpty)
      return Array(0f, 0f, 0f, 0f, 0f, img.width.toFloat, img.height.toFloat, 0f)
    val n = math.max(p.length, 1)
    val mean = p.sum / n
    val variance = p.map(v => (v - mean) * (v - mean)).sum / n
    val sorted = p.sorted
    def q(f: Double): Float = sorted(math.min(n - 1, (f * n).toInt))
    Array(mean, math.sqrt(variance).toFloat, q(0.25), q(0.5), q(0.75),
      img.width.toFloat, img.height.toFloat, n.toFloat)
  }

  /**
   * Batched decode + feature extraction: `mapPartitions` assembles
   * `batchSize` records, decodes each via `codec`, resizes to 16×16, and
   * emits one embedding per record tagged with the batch size it rode in
   * (the shape a GPU inference step needs — contiguous batches, bounded
   * memory). The default codec is the deterministic stub (externally
   * replayable — see the mm2 oracle); pass [[imageOrStubCodec]] for real
   * ImageIO decoding of PNG/JPEG/GIF/BMP bytes.
   */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 32,
      codec: Array[Byte] => DecodedImage = decodeImageStub): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-level work happens here (a real pipeline hands the whole
        // batch to the codec/model at once)
        batch.map { rec =>
          val decoded = codec(rec.bytes)
          val resized = resizeStub(decoded, 16, 16)
          // integer byte-sum of the resized plane: pixel = byte/255 round
          // trips exactly through float, so this is bit-stable and an
          // external engine can replay it from the raw bytes
          var checksum = 0L
          var i = 0
          while (i < resized.pixels.length) {
            checksum += math.round(resized.pixels(i) * 255.0f).toLong
            i += 1
          }
          MediaFeatures(rec.media_id, rec.kind, rec.n_bytes,
            planeEmbedding(resized), decoded.width, decoded.height,
            checksum, batch.size)
        }
      }
    }
  }

  /**
   * P76 — 64-bit average-hash (aHash) perceptual fingerprint: decode,
   * 8×8 nearest-neighbor resize, bit i set iff pixel i is above the plane
   * mean. The mean comparison is INTEGER (64·v_i > Σv over the
   * round(pixel·255) values — the mm2 checksum idiom), so the hash is
   * bit-stable across engines and, under the stub codec, exactly
   * replayable from the raw bytes in SQL. Emitted as four 16-bit chunk
   * columns (media_id, c0..c3) — the simhash banding layout: any pair
   * within hamming distance 3 shares at least one equal chunk
   * (pigeonhole over 4 chunks), so the chunks double as complete LSH
   * candidate keys for [[phashNearDupPairs]].
   */
  def perceptualHash(media: Dataset[MediaRecord],
      codec: Array[Byte] => DecodedImage = decodeImageStub): DataFrame = {
    import media.sparkSession.implicits._
    media.map { rec =>
      val resized = resizeStub(codec(rec.bytes), 8, 8)
      val v = resized.pixels.map(p => math.round(p * 255.0f).toLong)
      val s = v.sum
      val chunks = Array.fill(4)(0)
      var i = 0
      while (i < 64) {
        if (64L * v(i) > s) chunks(i / 16) |= (1 << (i % 16))
        i += 1
      }
      (rec.media_id, chunks(0), chunks(1), chunks(2), chunks(3))
    }.toDF("media_id", "c0", "c1", "c2", "c3")
  }

  /**
   * P76 — perceptual near-dup pairs within `maxHamming` (must be < 4):
   * chunk-equality equi-join generates candidates — complete by
   * pigeonhole, so this is never an all-pairs scan — and the exact
   * 64-bit hamming distance verifies them. Returns (i, j, hamming),
   * i < j, each pair once.
   */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"phashNearDupPairs: maxHamming must be in [0, 3] — 4 chunks only " +
        s"guarantee candidate completeness below 4 bit flips; got $maxHamming")
    val bands = hashes.select(col("media_id"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("band", "value")))
    val cand = bands.select(col("media_id").as("i"), col("band"), col("value"))
      .join(bands.select(col("media_id").as("j"), col("band"), col("value")),
        Seq("band", "value"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
    val ha = hashes.select(col("media_id").as("i"), col("c0").as("ac0"),
      col("c1").as("ac1"), col("c2").as("ac2"), col("c3").as("ac3"))
    val hb = hashes.select(col("media_id").as("j"), col("c0").as("bc0"),
      col("c1").as("bc1"), col("c2").as("bc2"), col("c3").as("bc3"))
    cand.join(ha, Seq("i")).join(hb, Seq("j"))
      .withColumn("hamming", expr(
        "bit_count(ac0 ^ bc0) + bit_count(ac1 ^ bc1) + " +
          "bit_count(ac2 ^ bc2) + bit_count(ac3 ^ bc3)"))
      .where(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }

  /**
   * P94 — ViT-style patch-grid enumeration: one row per `patch`×`patch`
   * tile of each media item's pixel plane, with edge tiles clamped to
   * the remaining extent — the tiling plumbing a vision-training
   * pipeline runs between decode and per-patch embedding. Returns the
   * id + (patch_row, patch_col, x0, y0, pw, ph); rows with null or
   * non-positive dimensions are dropped (undecodable media has no
   * plane).
   *
   * Pure integer projection + one generator (explode of a
   * ceil(w/p)·ceil(h/p)-element sequence, single digits for real patch
   * sizes) — narrow, codegen'd, no shuffle; the downstream per-patch
   * decode is where repartitionForDecode takes over.
   */
  def patchGrid(df: DataFrame, idCol: String, widthCol: String,
      heightCol: String, patch: Int): DataFrame = {
    require(patch >= 1, s"patchGrid: patch must be >= 1, got $patch")
    val p = lit(patch.toLong)
    val d = df
      .where(col(widthCol).isNotNull && col(heightCol).isNotNull &&
        col(widthCol) > 0 && col(heightCol) > 0)
      .withColumn("__nx", expr(s"(`$widthCol` + ${patch - 1}) div $patch"))
      .withColumn("__ny", expr(s"(`$heightCol` + ${patch - 1}) div $patch"))
    d.select(col("*"),
        explode(sequence(lit(0L), col("__nx") * col("__ny") - 1)).as("__pid"))
      .withColumn("patch_row", expr("__pid div __nx"))
      .withColumn("patch_col", pmod(col("__pid"), col("__nx")))
      .withColumn("x0", col("patch_col") * p)
      .withColumn("y0", col("patch_row") * p)
      .withColumn("pw", least(p, col(widthCol) - col("x0")))
      .withColumn("ph", least(p, col(heightCol) - col("y0")))
      .drop("__nx", "__ny", "__pid")
  }

  /**
   * P122 — fixed-hop analysis-frame enumeration for audio/video: one
   * row per `hop`-strided window of each media item's sample axis —
   * the 1-D cousin of [[patchGrid]], and the framing plumbing an
   * audio-training pipeline runs between demux and per-frame feature
   * extraction (the decode itself stays behind the stub codec, like
   * every multimodal op here). Frames start at f·hop for every start
   * inside the item; tail frames clamp to the remaining samples
   * (`flen` < `frameLen`). `t0_ms` = start·1000 div rate — exact
   * integer milliseconds, no float time axis.
   *
   * Pure integer projection + one bounded generator explode — narrow,
   * codegen'd, no shuffle. Items with null/non-positive length or rate
   * are dropped (no sample axis to frame).
   */
  def frameSample(df: DataFrame, idCol: String, nSamplesCol: String,
      rateCol: String, frameLen: Int, hop: Int): DataFrame = {
    require(frameLen >= 1, s"frameSample: frameLen must be >= 1, got $frameLen")
    require(hop >= 1, s"frameSample: hop must be >= 1, got $hop")
    val d = df.where(col(nSamplesCol).isNotNull && col(rateCol).isNotNull &&
      col(nSamplesCol) > 0 && col(rateCol) > 0)
    d.select(col("*"),
        explode(sequence(lit(0L),
          expr(s"(`$nSamplesCol` + ${hop - 1}) div $hop") - 1)).as("frame_idx"))
      .withColumn("start_sample", col("frame_idx") * hop)
      .withColumn("flen",
        least(lit(frameLen.toLong), col(nSamplesCol) - col("start_sample")))
      .withColumn("t0_ms",
        expr(s"(start_sample * 1000) div `$rateCol`"))
  }

  /**
   * P175 — WebDataset-style shard manifest: pack media files into
   * ~`targetBytes` tar shards in id order (next-fit — the
   * [[Bucketing.compactionPlan]] discipline applied to media) and emit
   * per shard (n_files, shard_bytes, manifest_md5 of the comma-joined
   * id list in id order) — the manifest IS the reproducibility
   * contract: a training job can verify every shard it streams against
   * the table that planned it. Id order preserves pack locality.
   *
   * Shapes: one cumulative window in id order (z4's), one per-shard
   * agg whose member list is sort_array'd before joining — collect
   * order is plan-dependent, the sorted join is not.
   */
  def shardManifest(media: DataFrame, idCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    val planned = Bucketing.compactionPlan(media.select(col(idCol),
      col(bytesCol)), idCol, bytesCol, targetBytes)
    planned
      .groupBy(col("bin").as("shard_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol).cast("long")).as("shard_bytes"),
        md5(array_join(transform(sort_array(collect_list(col(idCol))),
          _.cast("string")), ",")).as("manifest_md5"))
  }

  /**
   * P184 — reproducible epoch shard ordering: for every training epoch,
   * the shard visit order = rank of the portable hash of "epoch:shard"
   * — a different but fully DETERMINISTIC shuffle per epoch, so a
   * crashed run resumes mid-epoch on the exact order the original saw
   * (RNG-shuffled loaders can't replay without checkpointing their
   * state; a hash order IS its own checkpoint). Emits (epoch, shard_id,
   * position). Pairs with [[shardManifest]]: manifest says what's in a
   * shard, this says when each epoch reads it.
   *
   * Shapes: tiny cross join (epochs × shards — metadata-sized) + one
   * per-epoch rank window. Pure MD5 arithmetic, id tie-break.
   */
  def epochShardOrder(shards: DataFrame, shardCol: String,
      epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochShardOrder: epochs must be >= 1, got $epochs")
    val spark = shards.sparkSession
    val e = spark.createDataFrame((0 until epochs).map(Tuple1(_)))
      .toDF("epoch")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"))
      .orderBy(Sampling.hashValue(
        concat(col("epoch").cast("string"), lit(":"),
          col(shardCol).cast("string")), "epo:").asc,
        col(shardCol).asc)
    shards.select(col(shardCol)).distinct()
      .crossJoin(broadcast(e))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("epoch"), col(shardCol), col("position"))
  }

  /** One rung of the [[aspectBuckets]] ladder: the driver-computed,
    * engine-portable constants for a target aspect ratio — `lnLit` is
    * the 9-rounded natural log as a shortest-round-trip literal string
    * (embedded on BOTH the Spark and oracle sides, the o12 ladder
    * idiom), (`tw`, `th`) the snapped target resolution. */
  final case class AspectRung(bucket: Int, ratio: Double, lnLit: String,
      tw: Long, th: Long)

  /** Build the bucket ladder for [[aspectBuckets]]: for each ratio r,
    * target dims solve w·h ≈ `area` with w/h = r, each snapped to the
    * nearest positive multiple of `snap` (the SDXL 64-px convention).
    * All libm calls (ln, sqrt) happen HERE, once, on the driver — the
    * sa8 libm firewall: neither engine's runtime math library is ever
    * trusted to agree on a constant. */
  def aspectLadder(ratios: Seq[Double], area: Long = 1048576L,
      snap: Long = 64L): Seq[AspectRung] = {
    require(ratios.nonEmpty, "aspectLadder: ratios must be non-empty")
    require(ratios.forall(_ > 0), "aspectLadder: ratios must be positive")
    ratios.sorted.zipWithIndex.map { case (r, i) =>
      val h = math.sqrt(area.toDouble / r)
      def snapTo(x: Double): Long = math.max(snap, math.round(x / snap) * snap)
      val lnR = BigDecimal(math.log(r))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      AspectRung(i, r, lnR.underlying.toPlainString + "e0",
        snapTo(r * h), snapTo(h))
    }
  }

  /**
   * P158 — letterbox resize geometry: for each image and its target
   * frame (tw, th), the aspect-preserving scale = min(tw/w, th/h),
   * the resized extent (rw, rh) = floor(dim·scale + 0.5) clamped into
   * the frame, and the centering pads — the exact numbers a resize
   * kernel needs, computed table-side so the GPU batch job is a pure
   * map (and auditable: Σ pad area IS the wasted compute). Composes
   * downstream of [[aspectBuckets]]. Pure projection, no shuffle.
   * Cross-engine: scale and the half-up rounding are a fixed double
   * sequence on exact integer operands; pads are integer div.
   */
  def letterbox(df: DataFrame, widthCol: String, heightCol: String,
      targetWCol: String, targetHCol: String): DataFrame = {
    val scale = least(
      col(targetWCol).cast("double") / col(widthCol).cast("double"),
      col(targetHCol).cast("double") / col(heightCol).cast("double"))
    def fit(dim: String, target: String) = least(col(target),
      floor(col(dim).cast("double") * scale + lit(0.5)).cast("long"))
    df.where(col(widthCol).isNotNull && col(heightCol).isNotNull &&
        col(widthCol) > 0 && col(heightCol) > 0)
      .withColumn("scale", round(scale, 9))
      .withColumn("rw", fit(widthCol, targetWCol))
      .withColumn("rh", fit(heightCol, targetHCol))
      .withColumn("pad_x", expr(s"(`$targetWCol` - rw) div 2"))
      .withColumn("pad_y", expr(s"(`$targetHCol` - rh) div 2"))
  }

  /**
   * P136 — aspect-ratio bucketing (the SDXL batching prerequisite):
   * assign each image to the ladder rung minimizing |ln(w/h) − ln(r)|
   * so a training batch can share one padded resolution without extreme
   * crops. Emits bucket id, bucket ratio, target (tw, th) and the log
   * distance; ties on the 9-rounded distance break to the smaller
   * bucket id (deterministic).
   *
   * Shape: the k-rung ladder is a broadcast cross join (the adjudicated
   * 1-row/k-row BNL class) into a pure projection + one per-id
   * row_number window — at 100 TB the window partitions by image id, so
   * no global order is ever needed. Cross-engine: ln runs on the data
   * once per row and rounds at 9 (the P124 discipline); the rung
   * constants are driver literals, never engine libm.
   */
  def aspectBuckets(df: DataFrame, idCol: String, widthCol: String,
      heightCol: String, ladder: Seq[AspectRung]): DataFrame = {
    require(ladder.nonEmpty, "aspectBuckets: ladder must be non-empty")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    // Parse each rung's literal exactly as the oracle's SQL parser will —
    // shortest-round-trip decimal strings parse to the identical double.
    val lf = spark.createDataFrame(ladder.map(r =>
        (r.bucket, r.ratio, java.lang.Double.parseDouble(r.lnLit), r.tw, r.th)))
      .toDF("bucket", "ratio", "__lnr", "tw", "th")
    val lnA = round(log(col(widthCol).cast("double") /
      col(heightCol).cast("double")), 9)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("dist").asc, col("bucket").asc)
    df.where(col(widthCol).isNotNull && col(heightCol).isNotNull &&
        col(widthCol) > 0 && col(heightCol) > 0)
      .crossJoin(broadcast(lf))
      .withColumn("dist", round(abs(lnA - col("__lnr")), 9))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__lnr")
  }

  /** The ONE hex byte-replay grid (P229/P237/P326/P327): every byte of
    * every payload as (media_id, n_bytes, __i, __byte) — lower-hex +
    * position explode + hex-pair parse, exactly what each oracle replays
    * with substr(hex(encode(..)))::BIGINT. Four operators consume it; a
    * fix to the replay arithmetic must land HERE once (the dailyMeans
    * dedup rule). Empty payloads drop.
    *
    * `withPrev` adds `__prev` = the byte at __i − 1 (null at __i = 0),
    * parsed from the SAME hex string two characters back — consumers
    * that only need each byte's predecessor (P327's sign flips) read it
    * here for free instead of paying a media-partitioned lag window
    * (shuffle + sort of the full byte grid; guide §2.4, remove shuffles
    * outright). The two parses share this one definition. */
  private def byteGrid(df: DataFrame, idCol: String,
      bytesCol: String, withPrev: Boolean = false): DataFrame = {
    val g = df.where(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .select(col(idCol).as("media_id"), lower(hex(col(bytesCol)))
        .as("__hx"), octet_length(col(bytesCol)).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
      .select(col("media_id"), col("n_bytes"), col("__hx"),
        explode(sequence(lit(0L), col("n_bytes") - 1)).as("__i"))
      .withColumn("__byte",
        conv(expr("substr(__hx, CAST(2 * __i + 1 AS INT), 2)"), 16, 10)
          .cast("int"))
    val g2 =
      if (!withPrev) g
      else g.withColumn("__prev",
        when(col("__i") > 0,
          conv(expr("substr(__hx, CAST(2 * __i - 1 AS INT), 2)"), 16, 10)
            .cast("int")))
    g2.drop("__hx")
  }

  /**
   * P229 — per-media channel/intensity histogram over the raw byte
   * plane: bucket every byte into 256/`buckets` intensity bands and
   * emit per (media, bucket) counts and shares — the exposure/clipping
   * screen of an image-curation pass (a plane that is 90% bucket 0 is a
   * black frame; all-one-bucket is a solid fill — both are the junk a
   * pretraining filter drops) run here over the stub codec's identity
   * plane so the whole path is engine-replayable from raw bytes (the
   * mm2/mm3 hex-pair idiom). Emits (media_id, bucket, n_bytes, cnt,
   * share); empty payloads drop.
   *
   * Shapes: hex + per-byte position explode (a per-pixel pass IS the
   * semantics — the honest shape at any scale; `sequence` keeps it one
   * generator per row, no join), then one map-side-combinable count
   * agg. Cross-engine: byte extraction replays as hex-pair parsing;
   * bucket is exact integer division; share one double division of
   * exact BIGINTs rounded at 6.
   */
  def channelHistogram(df: DataFrame, idCol: String, bytesCol: String,
      buckets: Int = 16): DataFrame = {
    require(buckets >= 2 && buckets <= 256 && 256 % buckets == 0,
      s"channelHistogram: buckets must divide 256, got $buckets")
    val width = 256 / buckets
    byteGrid(df, idCol, bytesCol)
      .withColumn("bucket", expr(s"__byte div $width"))
      .groupBy(col("media_id"), col("n_bytes"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt").cast("double") / col("n_bytes").cast("double"), 6))
      .select(col("media_id"), col("bucket"), col("n_bytes"), col("cnt"),
        col("share"))
  }

  /**
   * P237 — fixed-hop frame energy over the raw byte stream: cut each
   * media's bytes into `frameSize`-byte frames and emit per frame the
   * mean amplitude and RMS energy plus a silence flag — the
   * voice-activity-detection shape of an audio curation pass (silent
   * frames are the segments a speech pipeline drops before transcribe/
   * embed), run over the stub plane so every byte replays from hex
   * pairs (the P229 idiom; swap the byte source for PCM samples and
   * nothing else changes). Emits (media_id, frame, n_bytes_frame,
   * mean_byte, rms, silent); the final partial frame keeps its true
   * (shorter) length.
   *
   * Shapes: position explode + one (media, frame) agg — map-side
   * combinable, the per-sample pass IS the semantics. Cross-engine:
   * Σb and Σb² are exact BIGINTs; mean/RMS are double divisions of
   * exact integers with one IEEE sqrt, rounded at 6; `silent` reads
   * the rounded RMS against an integer bar.
   */
  def frameEnergy(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int, silenceRms: Int = 32): DataFrame = {
    require(frameSize >= 1,
      s"frameEnergy: frameSize must be >= 1, got $frameSize")
    require(silenceRms >= 0,
      s"frameEnergy: silenceRms must be >= 0, got $silenceRms")
    byteGrid(df, idCol, bytesCol)
      .withColumn("frame", expr(s"__i div ${frameSize}L"))
      .groupBy(col("media_id"), col("frame"))
      .agg(count(lit(1)).as("n_bytes_frame"),
        round(sum(col("__byte")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_byte"),
        round(sqrt(sum(col("__byte") * col("__byte")).cast("double") /
          count(lit(1)).cast("double")), 6).as("rms"))
      .withColumn("silent", col("rms") < silenceRms)
  }

  /**
   * P344 — silence ratio + longest silent run per media: fold
   * [[frameEnergy]]'s per-frame silence flags into the per-media audio
   * curation verdict — frame totals, the silent share, and the LONGEST
   * CONSECUTIVE silent run in frames. The run length is the
   * gaps-and-islands read VAD trimming actually needs: scattered quiet
   * frames are noise-floor texture, one long run is dead air to cut,
   * and the silence RATIO alone cannot tell them apart. Run over the
   * stub byte plane (the mm12 idiom — swap PCM samples in for the
   * byte source and nothing else changes; the `silenceRms` bar is a
   * parameter because the meaningful threshold is a property of the
   * PLANE, the P327 centre lesson). Emits (media_id, n_frames,
   * n_silent, silence_ratio, max_run); media with no silent frame
   * read max_run 0, not null.
   *
   * Shapes: [[frameEnergy]]'s map-side-combinable grid agg, then
   * media-PARTITIONED windows for the island key (frame − row_number
   * over the silent frames) and keyed aggs — everything keyed by
   * media, no global window, no driver state.
   */
  def silenceRuns(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int, silenceRms: Int): DataFrame = {
    val frames = frameEnergy(df, idCol, bytesCol, frameSize, silenceRms)
    val tot = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        coalesce(sum(when(col("silent"), 1L).otherwise(0L)), lit(0L))
          .as("n_silent"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame"))
    val runs = frames.where(col("silent"))
      .withColumn("__island", col("frame") - row_number().over(w))
      .groupBy(col("media_id"), col("__island"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("media_id")).agg(max(col("__run")).as("__max_run"))
    tot.join(runs.hint("shuffle_hash"), Seq("media_id"), "left")
      .select(col("media_id"), col("n_frames"), col("n_silent"),
        round(col("n_silent").cast("double") /
          col("n_frames").cast("double"), 6).as("silence_ratio"),
        coalesce(col("__max_run"), lit(0L)).as("max_run"))
  }

  /**
   * P375 — consecutive-frame duplication runs per media: fingerprint
   * each `frameSize`-byte frame and read how often ADJACENT frames are
   * byte-identical — the static-content detector of a video curation
   * pass (a freeze-frame or slideshow "video" is mostly one repeated
   * frame; per-frame decode/embed budgets should not be spent on it),
   * which [[silenceRuns]]'s ENERGY read cannot see: a loud frozen frame
   * is static but never silent. Emits (media_id, n_frames,
   * n_distinct_frames, dup_consec_pairs, max_static_run, static_ratio);
   * a single-frame media reads ratio null, run 1.
   *
   * Shapes: frames come straight off the hex string as substring
   * fingerprints (NO per-byte explode — equality needs the bytes, not
   * their values; the final partial frame keeps its shorter
   * fingerprint), then media-PARTITIONED lag/run windows and keyed
   * aggs — the mm15 gaps-and-islands class, zero global state.
   * Cross-engine: fingerprints are hex substrings compared only
   * WITHIN each engine, every count an exact BIGINT, the ratio one
   * division rounded at 6.
   */
  def frameDupRuns(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int): DataFrame = {
    require(frameSize >= 1,
      s"frameDupRuns: frameSize must be >= 1, got $frameSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame"))
    val frames = df
      .where(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .select(col(idCol).as("media_id"),
        lower(hex(col(bytesCol))).as("__hx"),
        octet_length(col(bytesCol)).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
      .select(col("media_id"),
        explode(expr(s"sequence(0L, (n_bytes - 1) div ${frameSize}L)"))
          .as("frame"),
        col("__hx"))
      .select(col("media_id"), col("frame"),
        expr(s"substr(__hx, CAST(2 * frame * $frameSize + 1 AS INT), " +
          s"${2 * frameSize})").as("__fp"))
    val flagged = frames
      .withColumn("__prev", lag(col("__fp"), 1).over(w))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col("__fp"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val runs = flagged.groupBy(col("media_id"), col("__island"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("media_id")).agg(max(col("__run")).as("max_static_run"))
    val perMedia = flagged.groupBy(col("media_id")).agg(
      count(lit(1)).as("n_frames"),
      countDistinct(col("__fp")).as("n_distinct_frames"),
      sum(lit(1L) - col("__chg")).as("dup_consec_pairs"))
    perMedia.join(runs.hint("shuffle_hash"), Seq("media_id"))
      .select(col("media_id"), col("n_frames"), col("n_distinct_frames"),
        col("dup_consec_pairs"), col("max_static_run"),
        when(col("n_frames") > 1,
          round(col("dup_consec_pairs").cast("double") /
            (col("n_frames") - 1).cast("double"), 6)).as("static_ratio"))
  }

  /** ln 2 as a shared driver literal — [[byteEntropy]] and its oracle
    * generator embed the identical double (the o12 ladder rule). */
  val Ln2: Double = math.log(2.0)

  /**
   * P326 — byte-value entropy per media: H = −Σ p_b·log₂ p_b over the
   * 256 byte values — the compressibility probe of a raw stream (a
   * near-8-bit plane is already-compressed or noise; a low-entropy
   * plane is a flat fill or text — both route differently in a media
   * curation pass), run over the stub plane so every byte replays from
   * hex pairs (the mm2/mm3 idiom). Emits (media_id, n_bytes,
   * n_distinct, entropy_bits); empty payloads drop.
   *
   * Shapes: position explode + one (media, byte) agg + one media agg.
   * Cross-engine: counts exact; each p·ln p term runs its ln on an
   * exact-integer-ratio double, rounds at 6, multiplies, rounds at 9
   * into DECIMAL(28,9); the log₂ rescale divides by the [[Ln2]]
   * driver literal; entropy rounds at 6.
   */
  def byteEntropy(df: DataFrame, idCol: String,
      bytesCol: String): DataFrame = {
    val counts = byteGrid(df, idCol, bytesCol)
      .groupBy(col("media_id"), col("n_bytes"), col("__byte"))
      .agg(count(lit(1)).as("__c"))
    val p = col("__c").cast("double") / col("n_bytes").cast("double")
    counts
      .withColumn("__term",
        round(p * round(log(p), 6), 9).cast("decimal(28,9)"))
      .groupBy(col("media_id"), col("n_bytes"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("__term")).cast("double").as("__s"))
      .select(col("media_id"), col("n_bytes"), col("n_distinct"),
        round(-col("__s") / lit(Ln2), 6).as("entropy_bits"))
  }

  /**
   * P327 — zero-crossing rate per media: centre each byte at `centre`
   * and count sign flips between consecutive positions, ZCR =
   * crossings/(n−1) — the classic pitch/noisiness feature of an audio
   * front end (voiced speech reads low, fricatives and hiss read
   * high), run over the stub plane so every byte replays from hex
   * pairs. PCM callers keep the 128 default; the ASCII text stub plane
   * never reaches 128 (ZCR identically 0 — measured), so its queries
   * centre at 96 where letter/space flips carry the signal. Emits
   * (media_id, n_bytes, n_crossings, zcr); single-byte payloads null
   * the rate.
   *
   * Shapes: position explode with the predecessor byte parsed off the
   * same hex string (byteGrid withPrev) + one keyed agg — no window at
   * all (the r10 form paid a media-partitioned lag window: a shuffle +
   * sort of the full byte grid to look one position back in a string
   * the row already holds). Cross-engine: the sign is the exact integer
   * test byte ≥ 128; counts exact; one double division rounded at 6.
   */
  def zeroCrossingRate(df: DataFrame, idCol: String,
      bytesCol: String, centre: Int = 128): DataFrame = {
    require(centre >= 1 && centre <= 255,
      s"zeroCrossingRate: centre must be in [1, 255], got $centre")
    byteGrid(df, idCol, bytesCol, withPrev = true)
      .groupBy(col("media_id"), col("n_bytes"))
      .agg(sum(when(col("__prev").isNotNull &&
        (col("__prev") >= centre) =!= (col("__byte") >= centre), 1L)
        .otherwise(0L))
        .as("n_crossings"))
      .select(col("media_id"), col("n_bytes"), col("n_crossings"),
        when(col("n_bytes") > 1,
          round(col("n_crossings").cast("double") /
            (col("n_bytes") - 1L).cast("double"), 6)).as("zcr"))
  }

  /**
   * P366 — magic-byte format sniffing: classify each payload by its
   * leading signature (PNG/JPEG/GIF/PDF/ZIP, else 'unknown') — the
   * dispatch step in front of any decode path (the mm2 codec trusts a
   * mime column; real crawled payloads lie, the first bytes don't).
   * Detection compares hex prefixes, so any engine replays it from the
   * raw bytes. Emits (media_id, n_bytes, format) — a pure projection:
   * no shuffle, no joins, corpus-linear.
   */
  def sniffFormat(df: DataFrame, idCol: String,
      bytesCol: String): DataFrame = {
    val hx = lower(hex(col(bytesCol)))
    val fmt = when(substring(hx, 1, 16) === "89504e470d0a1a0a", "png")
      .when(substring(hx, 1, 6) === "ffd8ff", "jpeg")
      .when(substring(hx, 1, 8) === "47494638", "gif")
      .when(substring(hx, 1, 8) === "25504446", "pdf")
      .when(substring(hx, 1, 8) === "504b0304", "zip")
      .otherwise("unknown")
    df.where(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .select(col(idCol).as("media_id"),
        octet_length(col(bytesCol)).cast("long").as("n_bytes"),
        fmt.as("format"))
  }

  /**
   * P362 — content-defined chunking dedup audit: split every payload at
   * rolling-hash boundaries (cut after byte i when the base-256 value
   * of the last 4 bytes ≡ 0 mod `modulus` — expected block ≈ modulus
   * bytes), fingerprint each block, and report per media how many of
   * its blocks (and bytes) already exist elsewhere — the
   * storage-dedup / delta-sync read (rsync/LBFS/backup chunking). CDC's
   * point vs fixed-size blocks: a one-byte insert only reflows ONE
   * block, because boundaries depend on content, not offsets — so
   * shared substrings between media realign and dedup. Canonical owner
   * of a fingerprint = smallest (media_id, start); everything after it
   * counts as duplicate. Emits (media_id, n_bytes, n_blocks,
   * dup_blocks, dup_bytes).
   *
   * Shapes: the hex byte replay (the adjudicated per-pixel class),
   * media-partitioned lag + exclusive-prefix windows for block ids, a
   * block-sized media join back to the hex string for fingerprints
   * (md5 of the block's hex substring — replayable in any engine), one
   * fingerprint-partitioned rank. All counts exact BIGINTs.
   */
  def cdcBlocks(df: DataFrame, idCol: String, bytesCol: String,
      modulus: Int = 13): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(modulus >= 2 && modulus <= (1 << 20),
      s"cdcBlocks: modulus must sit in 2..2^20, got $modulus")
    val m = df
      .where(col(idCol).isNotNull && col(bytesCol).isNotNull)
      .select(col(idCol).as("media_id"),
        lower(hex(col(bytesCol))).as("__hx"),
        octet_length(col(bytesCol)).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
    val w = Window.partitionBy(col("media_id")).orderBy(col("__i").asc)
    val h = col("__b3") * lit(16777216L) + col("__b2") * lit(65536L) +
      col("__b1") * lit(256L) + col("__b")
    val flagged = m
      .select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_bytes") - 1)).as("__i"),
        col("__hx"))
      .withColumn("__b",
        conv(expr("substr(__hx, CAST(2 * __i + 1 AS INT), 2)"), 16, 10)
          .cast("long"))
      .drop("__hx")
      .withColumn("__b1", lag(col("__b"), 1).over(w))
      .withColumn("__b2", lag(col("__b"), 2).over(w))
      .withColumn("__b3", lag(col("__b"), 3).over(w))
      .withColumn("__cut",
        when(col("__i") >= 3 && h % modulus === 0, 1L).otherwise(0L))
      .withColumn("__blk", coalesce(sum(col("__cut"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val blocks = flagged.groupBy(col("media_id"), col("__blk"))
      .agg(min(col("__i")).as("__start"), count(lit(1)).as("__len"),
        min(col("n_bytes")).as("n_bytes"))
    val fp = blocks
      .join(m.select(col("media_id"), col("__hx")).hint("shuffle_hash"),
        Seq("media_id"))
      .withColumn("__fp", md5(expr(
        "substr(__hx, CAST(2 * __start + 1 AS INT), CAST(2 * __len AS INT))")))
      .drop("__hx")
    fp.withColumn("__rk", row_number().over(
        Window.partitionBy(col("__fp"))
          .orderBy(col("media_id").asc, col("__start").asc)))
      .groupBy(col("media_id"))
      .agg(min(col("n_bytes")).as("n_bytes"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("__rk") > 1, 1L).otherwise(0L)).as("dup_blocks"),
        sum(when(col("__rk") > 1, col("__len")).otherwise(0L))
          .as("dup_bytes"))
  }

  /**
   * P357 — pairwise byte-distribution divergence between media GROUPS:
   * Jensen–Shannon divergence between each pair of groups' byte-value
   * distributions — the corpus-level "are these sources the same kind
   * of bytes" read (codec/encoding mix shifts show up here while the
   * per-media P326 entropy stays flat). Emits one row per unordered
   * group pair (group_a < group_b) with both totals and the JSD in
   * nats.
   *
   * Shapes: the shared [[byteGrid]] replay collapsed per media, one
   * group join + group agg, a DENSIFIED group×256 grid (explode of a
   * byte sequence per group — a byte absent from one group must read
   * count 0, not vanish from the pair join; the dq11 spine rule), then
   * a byte-keyed equi self-join of explicitly renamed projections (the
   * d17 rule) restricted to group_a < group_b — the grid is
   * 256·|groups| rows, metadata-sized at any corpus scale.
   * Cross-engine: exact BIGINT counts; JSD terms follow the t18
   * discipline (9-rounded p·ln(p/m) summed in DECIMAL(28,9), closed at
   * 6); zero-count sides contribute exactly 0 via the guard.
   */
  def byteDistributionJsd(df: DataFrame, idCol: String, bytesCol: String,
      groups: DataFrame, gIdCol: String, gCol: String): DataFrame = {
    val perMedia = byteGrid(df, idCol, bytesCol)
      .groupBy(col("media_id"), col("__byte").as("byte"))
      .agg(count(lit(1)).as("__c"))
    val g = groups
      .where(col(gIdCol).isNotNull && col(gCol).isNotNull)
      .select(col(gIdCol).as("media_id"), col(gCol).as("__g"))
    val gc = perMedia.join(g.hint("shuffle_hash"), Seq("media_id"))
      .groupBy(col("__g"), col("byte")).agg(sum(col("__c")).as("__c"))
    val grid = gc.select(col("__g")).distinct()
      .select(col("__g"), explode(sequence(lit(0), lit(255))).as("byte"))
    val dense = grid.join(gc.hint("shuffle_hash"), Seq("__g", "byte"), "left")
      .select(col("__g"), col("byte"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = dense.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val dt = dense.join(tot.hint("shuffle_hash"), Seq("__g"))
    val a = dt.select(col("__g").as("ga"), col("byte"),
      col("__c").as("ca"), col("__n").as("na"))
    val b = dt.select(col("__g").as("gb"), col("byte").as("__byte2"),
      col("__c").as("cb"), col("__n").as("nb"))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val m = lit(0.5) * (p + q)
    a.join(b.hint("shuffle_hash"),
        col("byte") === col("__byte2") && col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("na"), col("nb"),
        when(col("ca") > 0, round(p * log(p / m), 9)).otherwise(lit(0.0))
          .cast("decimal(28,9)").as("__tp"),
        when(col("cb") > 0, round(q * log(q / m), 9)).otherwise(lit(0.0))
          .cast("decimal(28,9)").as("__tq"))
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        round(lit(0.5) * sum(col("__tp")).cast("double") +
          lit(0.5) * sum(col("__tq")).cast("double"), 6).as("jsd"))
  }
}
