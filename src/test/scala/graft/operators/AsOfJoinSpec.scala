package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** As-of join semantics: latest-at-or-before match, tolerance, misses. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val trades = Seq(
    (1L, "A", ts(0)), (2L, "A", ts(10)), (3L, "A", ts(30)),
    (4L, "B", ts(5)), (5L, "C", ts(5)))
    .toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", ts(0), 100.0), ("A", ts(9), 101.0), ("A", ts(25), 102.0),
    ("B", ts(7), 50.0)) // B's quote is AFTER the trade; C has none
    .toDF("sym", "qt", "px")

  test("matches the latest quote at or before each trade") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt")
      .orderBy("trade_id").collect()
      .map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[java.lang.Double]("px"))))
    assert(out.toSeq == Seq(
      (1L, Some(100.0)), // equal timestamps match (inclusive)
      (2L, Some(101.0)), // 10:09 quote, not 10:00
      (3L, Some(102.0)),
      (4L, None),        // only future quotes
      (5L, None)))       // no quotes at all
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt",
        toleranceSeconds = Some(120))
      .orderBy("trade_id").collect()
      .map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[java.lang.Double]("px"))))
    // trade 2 at 10:10 vs quote 10:09 (60s ok); trade 3 at 10:30 vs 10:25
    // (300s > 120s → null)
    assert(out.toSeq == Seq(
      (1L, Some(100.0)), (2L, Some(101.0)), (3L, None), (4L, None), (5L, None)))
  }

  test("genuine nulls in payload columns never stitch fields across rows") {
    // quote at 10:09 has px=null, size=7 — a trade after it must see
    // (null, 7) from THAT row, not px=100.0 carried from the earlier row
    val q = Seq(
      ("A", ts(0), Option(100.0), Option(5L)),
      ("A", ts(9), Option.empty[Double], Option(7L)))
      .toDF("sym", "qt", "px", "size")
    val out = AsOfJoin.asOf(trades.where($"trade_id" === 2L), q, "sym", "t", "qt")
      .collect().head
    assert(out.getAs[Timestamp]("matched_qt") == ts(9))
    assert(out.isNullAt(out.fieldIndex("px")))
    assert(out.getAs[Long]("size") == 7L)
  }

  test("left columns and row count are preserved") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt")
    assert(out.count() == trades.count())
    assert(out.columns.toSeq ==
      Seq("sym", "trade_id", "t", "matched_qt", "px"))
  }
}
