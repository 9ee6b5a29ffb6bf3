package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Compare d5 verification strategies on the 570k candidate set.
  *
  * CONCLUSION (sf0.1, local[32], 2026-08-12): explode-join 4.8-5.6s warm ≤
  * array-join 6.2s ≈ array-join+broadcast 5.9-6.1s. array_intersect on
  * string arrays allocates a per-pair hash set (non-primitive path), so the
  * thin streaming explode-join wins even before its better spill story.
  * Kept the explode-join. Separately: the query-level `.orderBy` was adding
  * ~4.5s — the range partitioner's sampling job re-executes the whole
  * verification stage — fixed in DedupQueries with a single-partition sort. */
object D5Verify {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("d5-verify")
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
        println(f"VERIFY $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }

    def cands() = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashSignatures(Dedup.docTokens(duped, "doc_id", "text"), 32, 42L), 4, 32))

    // A: array join-back, plain
    def arrayJoin(bcast: Boolean): Long = {
      val arr0 = Dedup.docTokenArrays(duped, "doc_id", "text")
      val arr = if (bcast) broadcast(arr0) else arr0
      cands()
        .join(arr.select(col("id").as("i"), col("toks").as("ti")), Seq("i"))
        .join(arr.select(col("id").as("j"), col("toks").as("tj")), Seq("j"))
        .select(col("i"), col("j"),
          size(array_intersect(col("ti"), col("tj"))).as("inter"),
          size(col("ti")).as("si"), size(col("tj")).as("sj"))
        .where(col("inter").cast("double") / (col("si") + col("sj") - col("inter")) >= 0.9)
        .count()
    }
    timeIt("array-join")(arrayJoin(bcast = false))
    timeIt("array-join-bcast")(arrayJoin(bcast = true))

    // B: explode-join (r3 shape)
    def explodeJoin(): Long = {
      val tokens = Dedup.docTokens(duped, "doc_id", "text")
      val sizes = tokens.groupBy("id").agg(count(lit(1)).as("size"))
      cands()
        .join(tokens.select(col("id").as("i"), col("token")), Seq("i"))
        .join(tokens.select(col("id").as("j"), col("token")), Seq("j", "token"))
        .groupBy("i", "j").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("i"), col("size").as("si")), Seq("i"))
        .join(sizes.select(col("id").as("j"), col("size").as("sj")), Seq("j"))
        .where(col("inter").cast("double") / (col("si") + col("sj") - col("inter")) >= 0.9)
        .count()
    }
    timeIt("explode-join")(explodeJoin())

    println("=== array-join-bcast plan ===")
    val arr = broadcast(Dedup.docTokenArrays(duped, "doc_id", "text"))
    cands()
      .join(arr.select(col("id").as("i"), col("toks").as("ti")), Seq("i"))
      .join(arr.select(col("id").as("j"), col("toks").as("tj")), Seq("j"))
      .select(col("i"), col("j"),
        size(array_intersect(col("ti"), col("tj"))).as("inter"))
      .explain("formatted")
    spark.stop()
  }
}
