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
}
