package graft.session

import java.nio.file.{Files, Paths}

import graft.sinks.XptReader

/**
 * SEND-standard golden corpus: a small nonclinical study (rat DM + BW
 * body-weight findings) driven through `StudySession(standard = "send")
 * → exportAll`, hash-pinned via [[GoldenHarness]]. This is the byte-level
 * net over the SEND-specific surfaces the SDTM corpus can't reach: the
 * standard selector threading into IG metadata (BW is SEND-IG-only),
 * SEND CT codelist resolution (SPECIES C77808, BWTESTCD C89962 resolve
 * from the SEND 2025-03-28 publication), the def:Standards section
 * naming that publication, and the per-standard IG version in the MDV
 * OIDs (SEND-IG v3.1.1, not SDTM's 3.4).
 *
 * Regenerate after an intentional export change with:
 *   GOLDEN_UPDATE=1 sbt "testOnly graft.session.GoldenSendCorpusSpec"
 */
class GoldenSendCorpusSpec extends GoldenHarness {

  val anchorFixture = "GOLD2_DM.csv"
  val goldensFile = "goldens_send.txt"
  val expectedDefineFile = "expected_define_send.xml"

  private def buildSession(): StudySession = {
    val s = new StudySession(spark, "GOLD2", standard = "send", ctVersion = "2025-03-28")
    Seq("DM", "BW").foreach { code =>
      s.addDomain(code, resourceDir.resolve(s"GOLD2_$code.csv").toString)
    }
    s
  }

  private lazy val firstExport: Map[String, String] =
    exportHashes(buildSession(), "target/tmp/golden_send1")

  test("SEND session: IG metadata resolves BW and the mappings auto-suggest") {
    val s = buildSession()
    assert(s.igVersion == "3.1.1")
    val bw = s.domainState("BW").get
    assert(bw.mapping.columnFor("BWTESTCD").contains("BWTESTCD"))
    assert(bw.mapping.columnFor("BWORRES").contains("BWORRES"))
    assert(s.domainState("DM").get.mapping.columnFor("SPECIES").contains("SPECIES"))
  }

  test("SEND validation: SEND CT accepts the fixture's coded values") {
    val s = buildSession()
    // SPECIES=RAT (C77808), SEX=M/F, AGEU=WEEKS, BWTESTCD=BW/TERMBW
    // (C89962) are all valid SEND CT — a CT violation here would mean the
    // standard selector resolved codelists through the wrong catalog
    val ctIssues = (s.validate("DM") ++ s.validate("BW"))
      .filter(_.kind == "CtViolation")
    assert(ctIssues.isEmpty, s"unexpected CT violations: $ctIssues")
  }

  test("SEND export: file set, member naming, and study-day derivation") {
    val names = firstExport.keySet
    assert(names == Set("dm.xpt", "dm.xml", "bw.xpt", "bw.xml", "define.xml"),
      s"unexpected export set: $names")
    val bw = XptReader.read("target/tmp/golden_send1/bw.xpt")
    assert(bw.name == "BW" && bw.rows.size == 8)
    // N3 assigned BWSEQ within subject; N7 derived BWDY from DM's RFSTDTC
    val seqIdx = bw.columns.indexWhere(_.name == "BWSEQ")
    val dyIdx = bw.columns.indexWhere(_.name == "BWDY")
    assert(seqIdx >= 0 && dyIdx >= 0)
    assert(bw.rows.head(seqIdx) == 1.0)
    assert(bw.rows.head(dyIdx) == 1.0) // 2023-01-10 vs reference start 2023-01-10
  }

  test("SEND define.xml: SEND IG version and SEND CT publication are named") {
    firstExport // force the export
    val define = new String(
      Files.readAllBytes(Paths.get("target/tmp/golden_send1/define.xml")), "UTF-8")
    assert(define.contains("SDTMIG.3.1.1"),
      "MDV OID must carry the SEND-IG version (reference keeps the SDTMIG " +
        "OID body regardless of standard — define_xml.rs:90)")
    assert(define.contains("""PublishingSet="SEND""""),
      "def:Standards must name the SEND CT publication the codelists resolved from")
    assert(define.contains("""CodeList OID="CL.C77808""""),
      "SPECIES codelist must resolve through SEND CT")
  }

  test("SEND export: hashes match the committed goldens") {
    checkOrUpdateGoldens(firstExport, "target/tmp/golden_send1")
  }

  test("SEND export: byte-stable across two consecutive runs") {
    val second = exportHashes(buildSession(), "target/tmp/golden_send2")
    assert(second == firstExport)
  }
}
