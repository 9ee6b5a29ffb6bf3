package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-by-stage timing of the d5 pipeline pieces at sf0.1.
  *
  * CONCLUSION (2026-08-12): every piece is sub-second warm (input recompute
  * 0.3s, cands-distinct 1.2s over 570,625 pairs); the cost lives in
  * verifying 570k candidates (~3.5s) — see D5Verify for the strategy
  * comparison. Carrying token arrays through the exploded token relation
  * (one abandoned variant) was quadratic per doc and measured 79s: never
  * attach a per-doc array to its own exploded elements. */
object D5Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("d5-profile")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val duped = docs.withColumn("key", col("doc_id") % 100).alias("a")
      .join(docs.withColumn("key", col("doc_id"))
        .select(col("key"), col("text").as("base_text")).alias("b"), Seq("key"))
      .select(col("a.doc_id").as("doc_id"), col("base_text").as("text"))
      .where(col("doc_id") % 4 === 0)

    def timeIt(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PIECE $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
      spark.catalog.clearCache()
    }

    timeIt("duped-count")(duped.count())
    val tokens = Dedup.docTokens(duped, "doc_id", "text")
    timeIt("tokens-count")(tokens.count())
    val sigs = Dedup.minhashSignatures(tokens, 32, 42L)
    timeIt("sigs-count")(sigs.count())
    val buckets = Dedup.lshBuckets(sigs, 4, 32)
    timeIt("buckets-count")(buckets.count())
    val cands = Dedup.lshCandidates(buckets)
    timeIt("cands-distinct-count")(cands.count())
    timeIt("full-current")(Dedup.minhashNearDups(duped, "doc_id", "text", 0.9).count())
    spark.stop()
  }
}
