package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Similarity-search semantics: exact ranking, IVF bucketing and recall. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0, 0.0)),
    (2L, Array(0.9, 0.1)),
    (3L, Array(0.0, 1.0)),
    (4L, Array(0.1, 0.9)),
    (5L, Array(-1.0, 0.0))
  ).toDF("id", "v")

  test("brute-force top-k ranks by cosine, excludes self, caps at k") {
    val q = vecs.where(col("id") === 1)
    val out = Similarity.bruteForceTopK(vecs, q, "id", "v", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank"))).toSeq
    // nearest to (1,0): 2 (cos≈0.994), then 3/4... cos(1,3)=0, cos(1,4)≈0.110
    assert(out == Seq((2L, 1), (4L, 2)))
  }

  test("ivf assignment picks the nearest centroid") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
      .select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx(1L) == 100L && idx(2L) == 100L)
    assert(idx(3L) == 200L && idx(4L) == 200L)
  }

  test("ivf assignment preserves non-numeric centroid id values and type") {
    // string bucket names must survive verbatim — no numeric cast in the
    // assignment path (an ANSI cast would throw; a silent cast would flip
    // the output schema to bigint)
    val centroids = Seq(("east", Array(1.0, 0.0)), ("north", Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val out = Similarity.ivfAssign(vecs, centroids, "id", "v")
    assert(out.schema("centroid_id").dataType.typeName == "string")
    val idx = out.select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idx(1L) == "east" && idx(3L) == "north")
  }

  test("ivf with all probes matches brute force exactly") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val q = vecs.where(col("id") <= 2)
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
    val ivf = Similarity.ivfTopK(idx, centroids, q, "id", "v", k = 3, nProbe = 2)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(vecs, q, "id", "v", k = 3)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("ivf with one probe searches only the query's bucket") {
    val centroids = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "v")
    val q = vecs.where(col("id") === 1)
    val idx = Similarity.ivfAssign(vecs, centroids, "id", "v")
    val out = Similarity.ivfTopK(idx, centroids, q, "id", "v", k = 5, nProbe = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    // bucket 100 holds {1, 2} (vec 5=(-1,0) has cos -1 vs 0 → bucket 200);
    // self excluded → {2}
    assert(out == Set(2L))
  }
}
