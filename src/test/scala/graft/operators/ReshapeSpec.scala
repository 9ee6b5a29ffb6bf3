package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SUPP / reciprocal / decode semantics (export.rs:468+, study.rs:181-309,
  * application.rs:38-151 pins). */
class ReshapeSpec extends SparkSpec {

  import spark.implicits._

  test("G1 SUPP uses the SEQ var as IDVAR when present") {
    val df = Seq(
      ("S1", "1", "high", "extra1"),
      ("S2", "1", "", "extra2"),
      ("", "2", "low", "extra3"))
      .toDF("USUBJID", "AESEQ", "PRIO", "NOTE")
    val supp = Reshape.buildSupp("AE", "ST", df, Seq(
      "PRIO" -> SuppColumnConfig("QPRIO", "Priority", "CRF"),
      "NOTE" -> SuppColumnConfig("QNOTE", "Note", "CRF", "EVALUATOR"))).get
    val rows = supp.orderBy("QNAM", "USUBJID")
      .collect().map(r => (r.getAs[String]("USUBJID"), r.getAs[String]("IDVAR"),
        r.getAs[String]("IDVARVAL"), r.getAs[String]("QNAM"), r.getAs[String]("QVAL")))
    // empty USUBJID row dropped entirely; empty QVAL (S2 PRIO) dropped
    assert(rows.toSeq == Seq(
      ("S1", "AESEQ", "1", "QNOTE", "extra1"),
      ("S2", "AESEQ", "1", "QNOTE", "extra2"),
      ("S1", "AESEQ", "1", "QPRIO", "high")))
  }

  test("G1 SUPP numeric QVAL renders without trailing zeros") {
    val df = Seq(("S1", 40.0), ("S2", 2.5)).toDF("USUBJID", "WTKG")
    val supp = Reshape.buildSupp("DM", "ST", df,
      Seq("WTKG" -> SuppColumnConfig("QWT", "Weight", "CRF"))).get
    val vals = supp.orderBy("USUBJID").collect().map(_.getAs[String]("QVAL"))
    assert(vals.toSeq == Seq("40", "2.5"))
  }

  test("G1 returns None when no configured column exists") {
    val df = Seq(("S1", "x")).toDF("USUBJID", "A")
    assert(Reshape.buildSupp("DM", "ST", df,
      Seq("MISSING" -> SuppColumnConfig("Q", "L", "CRF"))).isEmpty)
  }

  test("G3 adds reciprocal rows only when reverse is absent and SREL known") {
    val df = Seq(
      ("ST", "RELSUB", "A", "B", "MOTHER, BIOLOGICAL", 1L), // reverse absent → add
      ("ST", "RELSUB", "C", "D", "SPOUSE", 2L),             // reverse absent → add
      ("ST", "RELSUB", "D", "C", "SPOUSE", 3L),             // reverse of row 2 — already there
      ("ST", "RELSUB", "E", "F", "GUARDIAN", 4L))           // unknown SREL → skip
      .toDF("STUDYID", "DOMAIN", "USUBJID", "RSUBJID", "SREL", "_row_id")
    val out = Reshape.ensureRelsubBidirectional(df)
    val added = out.collect().map(r => (r.getString(2), r.getString(3), r.getString(4))).toSet --
      df.collect().map(r => (r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(added == Set(("B", "A", "CHILD, BIOLOGICAL")))
    assert(out.count() == 5)
  }

  test("G3 preserves extra source columns; generated rows order last") {
    val df = Seq(
      ("ST", "RELSUB", "A", "B", "SPOUSE", "POOL1", 1L),
      ("ST", "RELSUB", "E", "F", "GUARDIAN", "POOL2", 2L))
      .toDF("STUDYID", "DOMAIN", "USUBJID", "RSUBJID", "SREL", "POOLID", "_row_id")
    val out = Reshape.ensureRelsubBidirectional(df).orderBy("_row_id").collect()
    // POOLID survives on source rows, is null on the generated reciprocal
    assert(out.map(_.getAs[String]("POOLID")).toSeq == Seq("POOL1", "POOL2", null))
    // the generated row's _row_id continues past the source maximum
    val gen = out.last
    assert(gen.getAs[String]("USUBJID") == "B" && gen.getAs[String]("RSUBJID") == "A")
    assert(gen.getAs[Long]("_row_id") > 2L)
  }

  test("G3 leaves frames without the key columns untouched") {
    val df = Seq(("A", "B")).toDF("X", "Y")
    assert(Reshape.ensureRelsubBidirectional(df).collect().toSeq ==
      df.collect().toSeq)
  }

  test("M1 decode: CD column targets base name, miss yields null") {
    val df = Seq(("1", "M"), ("2", "F"), ("3", "X")).toDF("id", "SEXCD")
    val out = Reshape.applyStudyCodelists(df,
      Map("SEXCD" -> Map("M" -> "Male", "F" -> "Female")))
    val sex = out.orderBy("id").collect().map(r => Option(r.getAs[String]("SEX")))
    assert(sex.toSeq == Seq(Some("Male"), Some("Female"), None))
  }

  test("M2 fill-if-empty keeps existing non-empty values") {
    val df = Seq(("1", "M", "PreExisting"), ("2", "F", " "), ("3", "X", ""))
      .toDF("id", "SEXCD", "SEX")
    val out = Reshape.applyStudyCodelists(df,
      Map("SEXCD" -> Map("M" -> "Male", "F" -> "Female")))
    val sex = out.orderBy("id").collect().map(r => Option(r.getAs[String]("SEX")))
    assert(sex.toSeq == Seq(Some("PreExisting"), Some("Female"), None))
  }
}
