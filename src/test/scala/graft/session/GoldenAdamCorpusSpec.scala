package graft.session

import java.nio.file.{Files, Paths}

import graft.sinks.XptReader

/**
 * ADaM-standard golden corpus: a subject-level analysis dataset (ADSL)
 * under `StudySession(standard = "adam") → exportAll`, hash-pinned via
 * [[GoldenHarness]]. Completes the standard-selector matrix at the byte
 * level: ADaM-IG structure metadata (ADSL resolves through the
 * DataStructures mapping, `adam_ig.rs:96-110`), ADaM CT resolution order,
 * and the per-standard IG version (1.3) in the MDV OIDs.
 *
 * Regenerate after an intentional export change with:
 *   GOLDEN_UPDATE=1 sbt "testOnly graft.session.GoldenAdamCorpusSpec"
 */
class GoldenAdamCorpusSpec extends GoldenHarness {

  val anchorFixture = "GOLD3_ADSL.csv"
  val goldensFile = "goldens_adam.txt"
  val expectedDefineFile = "expected_define_adam.xml"

  private def buildSession(): StudySession = {
    val s = new StudySession(spark, "GOLD3", standard = "adam", ctVersion = "2025-03-28")
    s.addDomain("ADSL", resourceDir.resolve("GOLD3_ADSL.csv").toString)
    s
  }

  private lazy val firstExport: Map[String, String] =
    exportHashes(buildSession(), "target/tmp/golden_adam1")

  test("ADaM session: ADSL metadata resolves and the mappings auto-suggest") {
    val s = buildSession()
    assert(s.igVersion == "1.3")
    val adsl = s.domainState("ADSL").get
    assert(adsl.mapping.columnFor("SUBJID").contains("SUBJID"))
    assert(adsl.mapping.columnFor("SEX").contains("SEX"))
    assert(adsl.mapping.columnFor("SAFFL").contains("SAFFL"))
  }

  test("ADaM validation: coded values pass through the adam CT resolution order") {
    val s = buildSession()
    // SEX=M/F, RACE=OMB terms, AGEU=YEARS, SAFFL=Y/N are all valid CT
    val ctIssues = s.validate("ADSL").filter(_.kind == "CtViolation")
    assert(ctIssues.isEmpty, s"unexpected CT violations: $ctIssues")
  }

  test("ADaM export: file set and subject-level shape") {
    val names = firstExport.keySet
    assert(names == Set("adsl.xpt", "adsl.xml", "define.xml"),
      s"unexpected export set: $names")
    val adsl = XptReader.read("target/tmp/golden_adam1/adsl.xpt")
    assert(adsl.name == "ADSL" && adsl.rows.size == 4)
    val usubjIdx = adsl.columns.indexWhere(_.name == "USUBJID")
    assert(usubjIdx >= 0)
    assert(adsl.rows.map(_(usubjIdx)).head == "GOLD3-2001")
    // the declared-type fix: numeric column AGE maps to AGE (exact match),
    // not to the similarly-named AGEGRyN, and survives as doubles
    val ageIdx = adsl.columns.indexWhere(_.name == "AGE")
    assert(adsl.rows.map(_(ageIdx)) == Seq(34.0, 45.0, 29.0, 61.0))
  }

  test("ADaM define.xml: IG version 1.3 rides the MDV OID") {
    firstExport // force the export
    val define = new String(
      Files.readAllBytes(Paths.get("target/tmp/golden_adam1/define.xml")), "UTF-8")
    assert(define.contains("SDTMIG.1.3"),
      "MDV OID must carry the ADaM-IG version (the OID body stays SDTMIG, " +
        "matching the reference — define_xml.rs:90)")
  }

  test("ADaM export: hashes match the committed goldens") {
    checkOrUpdateGoldens(firstExport, "target/tmp/golden_adam1")
  }

  test("ADaM export: byte-stable across two consecutive runs") {
    val second = exportHashes(buildSession(), "target/tmp/golden_adam2")
    assert(second == firstExport)
  }
}
