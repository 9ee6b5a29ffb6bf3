package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Timing experiment: current explode-join d5 verification vs an
  * array_intersect variant over collected token sets.
  *
  * CONCLUSION (sf0.1, local[32], 2026-08-12): identical output (125,625
  * pairs), no win — explode-join 5.6s vs array_intersect 6.1s steady-state.
  * The thin-row explode shuffle and the array shuffle move similar bytes;
  * keeping the explode-join (also the shape that spills better at scale —
  * rows stream through the hash join while arrays must materialize per
  * pair). */
object D5Experiment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val duped = docs.as("a").join(docs.as("b"),
        col("a.doc_id") % 100 === col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.text").as("text"))
      .where(col("doc_id") % 4 === 0)

    def timeIt(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      spark.catalog.clearCache()
    }

    // warmup + current path
    timeIt("current-warmup") {
      Dedup.minhashNearDups(duped, "doc_id", "text", 0.9).count()
    }
    timeIt("current") {
      Dedup.minhashNearDups(duped, "doc_id", "text", 0.9).count()
    }
    // array_intersect variant
    def variant(): Long = {
      val tokens = Dedup.docTokens(duped, "doc_id", "text").cache()
      val cands = Dedup.lshCandidates(
        Dedup.lshBuckets(Dedup.minhashSignatures(tokens, 32, 42L), 4, 32))
      val sets = tokens.groupBy("id")
        .agg(collect_list(col("token")).as("toks"), count(lit(1)).as("sz"))
      cands
        .join(sets.select(col("id").as("i"), col("toks").as("ti"), col("sz").as("si")), Seq("i"))
        .join(sets.select(col("id").as("j"), col("toks").as("tj"), col("sz").as("sj")), Seq("j"))
        .withColumn("inter", size(array_intersect(col("ti"), col("tj"))).cast("long"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("si") + col("sj") - col("inter")))
        .where(col("jaccard") >= 0.9)
        .count()
    }
    timeIt("variant-warmup")(variant())
    timeIt("variant")(variant())
    spark.stop()
  }
}
