package graft.session

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.sinks.XptReader

/**
 * ADaM-standard golden corpus: a subject-level analysis dataset (ADSL)
 * under `StudySession(standard = "adam") → exportAll`, hash-pinned like
 * the SDTM and SEND corpora (goldens in
 * `src/test/resources/golden/goldens_adam.txt`). Completes the
 * standard-selector matrix at the byte level: ADaM-IG structure metadata
 * (ADSL resolves through the DataStructures mapping, `adam_ig.rs:96-110`),
 * ADaM CT resolution order, and the per-standard IG version (1.3) in the
 * MDV OIDs.
 *
 * Regenerate after an intentional export change with:
 *   GOLDEN_UPDATE=1 sbt "testOnly graft.session.GoldenAdamCorpusSpec"
 */
class GoldenAdamCorpusSpec extends SparkSpec {

  private def resourceDir: Path = {
    val url = getClass.getResource("/golden/GOLD3_ADSL.csv")
    assert(url != null, "golden ADaM fixture resources missing from test classpath")
    assert(url.getProtocol == "file",
      s"golden fixtures must be plain files on disk, got: $url")
    Paths.get(url.toURI).getParent
  }

  private val sourceGoldenDir = Paths.get("src", "test", "resources", "golden")

  private def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  private def buildSession(): StudySession = {
    val s = new StudySession(spark, "GOLD3", standard = "adam")
    s.addDomain("ADSL", resourceDir.resolve("GOLD3_ADSL.csv").toString)
    s
  }

  private def export(outDir: String): Map[String, String] = {
    val session = buildSession()
    val written = session.exportAll(outDir)
    written.map(p => Paths.get(p).getFileName.toString -> sha256(Paths.get(p))).toMap
  }

  private lazy val firstExport: Map[String, String] = export("target/tmp/golden_adam1")

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
    firstExport // force the export
    val goldensPath = sourceGoldenDir.resolve("goldens_adam.txt")
    val definePath = sourceGoldenDir.resolve("expected_define_adam.xml")
    if (sys.env.get("GOLDEN_UPDATE").contains("1")) {
      val lines = firstExport.toSeq.sortBy(_._1).map { case (n, h) => s"$n $h" }
      Files.write(goldensPath, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.copy(Paths.get("target/tmp/golden_adam1/define.xml"), definePath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      info(s"goldens regenerated at $goldensPath — review and commit the diff")
    } else {
      assert(Files.exists(goldensPath),
        "no committed ADaM goldens — run once with GOLDEN_UPDATE=1")
      val expected = Files.readAllLines(goldensPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, h) = l.split(" ", 2); n -> h
        }.toMap
      val expectedDefine = new String(Files.readAllBytes(definePath), "UTF-8")
      val actualDefine = new String(
        Files.readAllBytes(Paths.get("target/tmp/golden_adam1/define.xml")), "UTF-8")
      assert(actualDefine == expectedDefine,
        "define.xml drifted from expected_define_adam.xml — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1 and review the diff")
      assert(firstExport.keySet == expected.keySet,
        s"export set drifted: ${firstExport.keySet} vs goldens ${expected.keySet}")
      val mismatched = firstExport.filter { case (n, h) => expected(n) != h }.keys.toSeq.sorted
      assert(mismatched.isEmpty,
        s"artifacts drifted from goldens: $mismatched — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1")
    }
  }

  test("ADaM export: byte-stable across two consecutive runs") {
    val second = export("target/tmp/golden_adam2")
    assert(second == firstExport)
  }
}
