package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.operators.{MediaRecord, Multimodal}

/**
 * Multimodal plumbing coverage: the binary packing + metadata layer has a
 * full DuckDB oracle (byte counts, MD5 of the packed bytes); the stub-codec
 * feature extraction is Scala-side (rows-only, pinned in MultimodalSpec).
 */
object MultimodalQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + typed metadata, checksummed
    "mm1_pack" -> ((s, dir) => {
      val packed = Multimodal.packText(table(s, dir, "documents"), "doc_id", "text")
      packed.select(col("media_id"), col("kind"), col("mime_type"),
          col("n_bytes"), md5(col("bytes")).as("bytes_md5"))
        .orderBy("media_id")
    }),

    // batched stub decode + feature extraction (deterministic fake codec)
    "mm2_features" -> ((s, dir) => {
      import s.implicits._
      val packed = Multimodal.packText(table(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.extractFeatures(packed.as[MediaRecord], batchSize = 32)
      feats.select(col("media_id"), col("decode_width"), col("decode_height"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("mean_px"))
        .orderBy("media_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm1_pack" ->
      """SELECT doc_id AS media_id, 'text' AS kind, 'text/plain' AS mime_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS bytes_md5
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
