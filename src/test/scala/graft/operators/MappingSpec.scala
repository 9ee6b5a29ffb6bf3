package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.JaroWinkler

/** Scorer/assignment semantics ported from `map/score.rs:295-391` and
  * state-machine invariants from `map/state.rs`. */
class MappingSpec extends AnyFunSuite {

  test("jaro-winkler basics") {
    assert(JaroWinkler.similarity("usubjid", "usubjid") == 1.0)
    assert(JaroWinkler.similarity("", "x") == 0.0)
    assert(JaroWinkler.similarity("martha", "marhta") > 0.95)
    assert(JaroWinkler.similarity("abc", "xyz") < 0.1)
  }

  test("name normalization squeezes separators") {
    assert(Mapping.normalizeName("  AE_Start-Date.Time ") == "ae start date time")
  }

  test("exact name match scores 1.0") {
    val s = Mapping.computeScore("AETERM", VarMeta("AETERM"), None)
    assert(s.score == 1.0)
  }

  test("SEQ suffix adjustments") {
    val both = Mapping.computeScore("AESEQ", VarMeta("AESEQ"), None)
    assert(both.score > 1.0) // 1.0 * 1.05
    val colOnly = Mapping.computeScore("AESEQ", VarMeta("AETERM"), None)
    val base = JaroWinkler.similarity("aeseq", "aeterm")
    assert(math.abs(colOnly.score - base * 0.6) < 1e-9)
  }

  test("CD suffix adjustments") {
    val colOnly = Mapping.computeScore("SEXCD", VarMeta("SEX"), None)
    val base = JaroWinkler.similarity("sexcd", "sex")
    assert(math.abs(colOnly.score - base * 0.7) < 1e-9)
  }

  test("numeric type mismatch penalizes 15%") {
    val hintNum = ColumnHint(isNumeric = true, 0.5, 0.0)
    // AGEN ends with N → expects numeric; matching numeric column: no penalty
    val ok = Mapping.computeScore("AGEN", VarMeta("AGEN"), Some(hintNum))
    assert(ok.score == 1.0)
    val bad = Mapping.computeScore("AGEN", VarMeta("AGEN"),
      Some(ColumnHint(isNumeric = false, 0.5, 0.0)))
    assert(math.abs(bad.score - 0.85) < 1e-9)
  }

  test("label similarity boosts 10%") {
    val hint = ColumnHint(isNumeric = false, 0.5, 0.0, label = Some("Adverse Event Term"))
    val boosted = Mapping.computeScore("AETERM",
      VarMeta("AETERM", Some("Reported Term for the Adverse Event Term")), Some(hint))
    // label JW may or may not cross 0.85; just pin monotonicity vs no label
    val plain = Mapping.computeScore("AETERM", VarMeta("AETERM"), None)
    assert(boosted.score >= plain.score)
  }

  test("greedy assignment is one-to-one, best-first") {
    val vars = Seq(VarMeta("AETERM"), VarMeta("AESEQ"), VarMeta("AESTDTC"))
    val out = Mapping.suggestAll(
      Seq("AETERM", "AESEQ", "AESTDTC", "EXTRA"), vars, Map.empty, 0.5)
    assert(out.map(s => s.sourceColumn -> s.targetVariable).toMap ==
      Map("AETERM" -> "AETERM", "AESEQ" -> "AESEQ", "AESTDTC" -> "AESTDTC"))
    // each column/variable used at most once
    assert(out.map(_.sourceColumn).distinct.size == out.size)
    assert(out.map(_.targetVariable).distinct.size == out.size)
  }

  test("threshold filters weak candidates") {
    val out = Mapping.suggestAll(Seq("ZZZZZ"), Seq(VarMeta("AETERM")), Map.empty, 0.5)
    assert(out.isEmpty)
  }

  test("mapping state: accept releases column from other variables") {
    val st = new MappingState("AE", Seq(VarMeta("AETERM"), VarMeta("AEDECOD")))
    assert(st.acceptManual("AETERM", "TERM").isRight)
    assert(st.acceptManual("AEDECOD", "TERM").isRight)
    assert(st.columnFor("AETERM").isEmpty)
    assert(st.columnFor("AEDECOD").contains("TERM"))
    assert(st.statusOf("AETERM") == MappingStatus.Unmapped)
  }

  test("mapping state: required cannot be not-collected") {
    val st = new MappingState("DM", Seq(VarMeta("USUBJID", required = true), VarMeta("AGE")))
    assert(st.markNotCollected("USUBJID").isLeft)
    assert(st.markNotCollected("AGE").isRight)
  }

  test("mapping state: accepting a suggestion releases the column elsewhere") {
    val st = new MappingState("AE", Seq(VarMeta("AETERM"), VarMeta("AEDECOD")))
    assert(st.acceptManual("AETERM", "col_x").isRight)
    st.applySuggestions(Seq(Suggestion("col_x", "AEDECOD", 0.9, Nil)))
    assert(st.acceptSuggestion("AEDECOD").isRight)
    // one column → one variable, even across the suggestion path
    assert(st.columnFor("AETERM").isEmpty)
    assert(st.toConfig == Map("AEDECOD" -> "col_x"))
  }

  test("mapping state: only accepted mappings export") {
    val st = new MappingState("AE", Seq(VarMeta("AETERM"), VarMeta("AEDECOD")))
    st.applySuggestions(Seq(Suggestion("TERM", "AETERM", 0.9, Nil),
      Suggestion("DECOD", "AEDECOD", 0.8, Nil)))
    assert(st.toConfig.isEmpty) // suggestions are not yet confirmed
    assert(st.acceptSuggestion("AETERM").isRight)
    assert(st.toConfig == Map("AETERM" -> "TERM"))
  }
}

/** Hint building over a real DataFrame (hints.rs:14-103). */
class MappingHintsSpec extends SparkSpec {

  test("columnHints: numeric / unique / null ratios with blank-as-null") {
    import spark.implicits._
    val df = Seq(
      ("1", "a", " "),
      ("2", "b", null),
      ("2.5", "a", "x"),
      ("x", "", "x")
    ).toDF("num", "cat", "sparse")
    val hints = Mapping.columnHints(df)
    // num: 4 non-null, 3 numeric → 0.75 not > 0.9
    assert(!hints("num").isNumeric)
    assert(hints("num").uniqueRatio == 1.0)
    assert(hints("num").nullRatio == 0.0)
    // cat: one blank → 3 non-null, 2 distinct
    assert(math.abs(hints("cat").uniqueRatio - 2.0 / 3) < 1e-9)
    assert(hints("cat").nullRatio == 0.25)
    // sparse: 2 blank-ish (" " and null) of 4
    assert(hints("sparse").nullRatio == 0.5)
    assert(hints("sparse").uniqueRatio == 0.5)
  }

  test("all-numeric column crosses the 0.9 threshold") {
    import spark.implicits._
    val df = Seq("1", "2", "3.5", "-4e2", "", "7", "8", "9", "10", "11", "12")
      .toDF("v")
    assert(Mapping.columnHints(df)("v").isNumeric)
  }
}
