package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins elide shuffles. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    // stale warehouse dirs survive across JVMs while the in-memory catalog
    // does not — drop both the catalog entry and the location
    Seq("b_facts", "b_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("matching buckets join with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0 until 50).map(i => (i, s"dim$i")).toDF("k", "label")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)

    val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", "k")
    assert(joined.count() == 1000)
    assert(Bucketing.shuffleExchanges(joined) == 0,
      joined.queryExecution.executedPlan.toString.take(2000))

    // the same join on unbucketed frames shuffles (broadcast disabled to
    // expose the exchange)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = facts.join(dims, "k")
      assert(Bucketing.shuffleExchanges(plain) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed groupBy on the bucket key avoids the aggregation shuffle") {
    val agg = spark.table("b_facts").groupBy("k").count()
    assert(agg.count() == 50)
    assert(Bucketing.shuffleExchanges(agg) == 0)
  }
}
