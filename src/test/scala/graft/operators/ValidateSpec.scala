package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Validation check semantics (validate/checks and cross_domain.rs pins). */
class ValidateSpec extends SparkSpec {

  import spark.implicits._

  test("V1 blank counts treat null, empty, and whitespace alike") {
    val df = Seq("x", "", "  ", null, "y").toDF("v")
    val r = df.agg(Validate.blankCount(col("v")).as("b"),
      Validate.nonBlankCount(col("v")).as("nb")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
  }

  test("V3 non-numeric count ignores blanks") {
    val df = Seq("1", "2.5", "abc", "", "1e3").toDF("v")
    val r = df.agg(Validate.nonNumericCount(col("v"))).head()
    assert(r.getLong(0) == 1)
  }

  test("V4 ISO regex validates ranges but allows partials") {
    val ok = Seq("2024", "2024-01", "2024-01-31", "2024-01-31T23:59",
      "2024-01-31T23:59:59.123")
    val bad = Seq("2024-13", "2024-00", "2024-01-32", "2024-01-31T24:00",
      "2024/01/31", "202401")
    val df = (ok ++ bad).toDF("v")
    val r = df.agg(Validate.nonIsoDateCount(col("v"))).head()
    assert(r.getLong(0) == bad.size)
  }

  test("V5 duplicate seq: surplus rows per duplicated key") {
    val df = Seq(("A", 1), ("A", 1), ("A", 1), ("B", 1), ("B", 2))
      .toDF("subj", "seq")
    val r = Validate.duplicateSeqCount(df, "subj", "seq").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1)
  }

  test("V8 invalid CT values: distinct, case-folded, blank-excluded") {
    val df = Seq("male", "MALE", "other", "", null).toDF("sex")
    val allowed = Seq("MALE", "FEMALE").toDF("allowed")
    val out = Validate.invalidCtValues(df, col("sex"), allowed)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("OTHER"))
  }

  test("SEND-only codelist (DM.SPECIES C77808) validates through the SEND registry") {
    import graft.standards.Standards
    val dm = Seq(("STUDY1", "S1", "RAT"), ("STUDY1", "S2", "SPARKLEDOG"))
      .toDF("STUDYID", "USUBJID", "SPECIES")
    val domain = Standards.domain("send", "DM").get
    val issues = DomainValidation.validateDomain(dm, domain, ct = Standards.ct("send"))
    val ctIssue = issues.find(i => i.variable == "SPECIES" && i.kind == "InvalidCtValue")
    // C77808 is extensible → Info, one bad distinct value, sampled
    assert(ctIssue.exists(i => i.count == 1 && i.severity == "Info"), issues.toString)
    assert(ctIssue.exists(_.samples.contains("SPARKLEDOG")))
  }

  test("X1 orphan subjects via broadcast anti-join") {
    val dom = Seq(("S1", 1), ("S2", 2), ("S3", 3)).toDF("usubjid", "n")
    val dm = Seq("S1", "S3").toDF("usubjid")
    val out = Validate.orphanSubjects(dom, dm, "usubjid")
      .select("usubjid").collect().map(_.getString(0)).toSeq
    assert(out == Seq("S2"))
  }

  test("X1/X5 broadcast hint is withheld under threshold 0, results identical") {
    val dom = Seq(("S1", 1), ("S2", 2), ("S3", 3)).toDF("usubjid", "n")
    val dm = Seq("S1", "S3").toDF("usubjid")
    val refs = Seq(("AE", "AESEQ", "1"), ("AE", "AESEQ", "9")).toDF("rdomain", "idvar", "idvarval")
    val keys = Seq(("AE", "AESEQ", "1")).toDF("rdomain", "idvar", "idvarval")
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    // default threshold: tiny dimensions get the hint
    assert(hinted(Validate.orphanSubjects(dom, dm, "usubjid")))
    assert(hinted(Validate.danglingRecordRefs(refs, keys)))
    spark.conf.set(Validate.BroadcastThresholdKey, "0")
    try {
      // threshold 0: no hint anywhere — AQE owns the join strategy — and
      // the shuffled plan returns the same rows
      val x1 = Validate.orphanSubjects(dom, dm, "usubjid")
      val x5 = Validate.danglingRecordRefs(refs, keys)
      assert(!hinted(x1) && !hinted(x5))
      assert(x1.select("usubjid").collect().map(_.getString(0)).toSeq == Seq("S2"))
      assert(x5.select("idvarval").collect().map(_.getString(0)).toSeq == Seq("9"))
    } finally spark.conf.unset(Validate.BroadcastThresholdKey)
  }

  test("broadcast threshold accepts size spellings and names the key on bad input") {
    val dm = Seq("S1").toDF("usubjid")
    spark.conf.set(Validate.BroadcastThresholdKey, "64m")
    try assert(Validate.maybeBroadcast(dm) ne dm) // hinted: 1 row << 64m
    finally spark.conf.unset(Validate.BroadcastThresholdKey)
    spark.conf.set(Validate.BroadcastThresholdKey, "sixty-four")
    try {
      val e = intercept[IllegalArgumentException](Validate.maybeBroadcast(dm))
      assert(e.getMessage.contains(Validate.BroadcastThresholdKey))
    } finally spark.conf.unset(Validate.BroadcastThresholdKey)
  }

  test("X3 reciprocal pairs") {
    val pairs = Seq(("A", "B"), ("B", "A"), ("A", "C")).toDF("u", "r")
    val out = Validate.missingReciprocal(pairs, "u", "r")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("A", "C")))
  }

  test("X4 parent chain scoped to subject") {
    val df = Seq(
      ("S1", "R1", ""), ("S1", "R2", "R1"),
      ("S2", "R1", "R9"))
      .toDF("usubjid", "refid", "parent")
    val out = Validate.brokenParentChain(df, "usubjid", "parent", "refid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("S2", "R9")))
  }

  test("X5 empty key table: no listed column exists → all references dangle") {
    val ae = Seq("1").toDF("AESEQ")
    val keys = Validate.relrecKeyTable(Map("AE" -> (ae, Seq("NOPE"))))
    assert(keys.isEmpty)
    val refs = Seq(("AE", "AESEQ", "1")).toDF("rdomain", "idvar", "idvarval")
    assert(Validate.danglingRecordRefs(refs, keys).count() == 1)
  }

  test("X5 record refs against union key table") {
    val ae = Seq(("1"), ("2")).toDF("AESEQ")
    val keys = Validate.relrecKeyTable(Map("AE" -> (ae, Seq("AESEQ"))))
    val refs = Seq(("AE", "AESEQ", "2"), ("AE", "AESEQ", "9"))
      .toDF("rdomain", "idvar", "idvarval")
    val out = Validate.danglingRecordRefs(refs, keys)
      .select("idvarval").collect().map(_.getString(0)).toSeq
    assert(out == Seq("9"))
  }

  test("cross-domain: blank USUBJID rows are not X1 orphans") {
    val dm = Seq("GRAFT-1").toDF("USUBJID")
    val ae = Seq("GRAFT-1", "", "  ", "GRAFT-9").toDF("USUBJID")
    val issues = DomainValidation.validateCrossDomain(Map("DM" -> dm, "AE" -> ae))
    val orphan = issues.find(_.kind == "SubjectNotInDm")
    assert(orphan.isDefined)
    assert(orphan.get.count == 1 && orphan.get.samples == Seq("GRAFT-9"))
  }

  test("cross-domain: blank RSUBJID is never an orphan; no DM skips everything") {
    val dm = Seq("GRAFT-1", "GRAFT-2").toDF("USUBJID")
    // blank RSUBJID = pool relationship, explicitly skipped by the reference
    val rs = Seq(("GRAFT-1", ""), ("GRAFT-2", "  "), ("GRAFT-1", "GRAFT-9"))
      .toDF("USUBJID", "RSUBJID")
    val issues = DomainValidation.validateCrossDomain(Map("DM" -> dm, "RELSUB" -> rs))
    val orphan = issues.find(_.kind == "RsubjidNotInDm")
    assert(orphan.isDefined, issues.toString)
    assert(orphan.get.count == 1 && orphan.get.samples == Seq("GRAFT-9"))
    // without DM there is no subject reference — the reference returns
    // nothing at all (validate/mod.rs:102-112)
    assert(DomainValidation.validateCrossDomain(Map("RELSUB" -> rs)).isEmpty)
  }
}
