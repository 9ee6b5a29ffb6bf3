package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P77 k-anonymity semantics: QID multiplicities, the k gate, null
  * grouping, and input validation. */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  test("kAnonymityFilter counts QID groups and gates on k") {
    val rows = Seq(
      (1L, "us", "A"), (2L, "us", "A"), (3L, "us", "A"),
      (4L, "us", "B"),
      (5L, "de", "A"), (6L, "de", "A")
    ).toDF("id", "country", "segment")
    val got = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, true)) && got(2L) == ((3L, true)) && got(3L) == ((3L, true)))
    assert(got(4L) == ((1L, false))) // unique combination → suppressed
    assert(got(5L) == ((2L, true)) && got(6L) == ((2L, true)))
    // k = 1 releases everything
    val all = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 1)
    assert(all.where(!col("kept")).count() == 0)
    // higher k suppresses the pair too
    val strict = Privacy.kAnonymityFilter(rows, Seq("country", "segment"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(strict(5L) == false && strict(1L) == true)
  }

  test("nulls form their own QID group; validation rejects bad input") {
    val rows = Seq(
      (1L, Some("us")), (2L, None), (3L, None)
    ).toDF("id", "country")
    val got = Privacy.kAnonymityFilter(rows, Seq("country"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 2L)
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Seq("country"), k = 0))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Nil, k = 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows, Seq("nope"), k = 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityFilter(rows.withColumn("kept", lit(true)), Seq("country"), k = 2))
  }
}
