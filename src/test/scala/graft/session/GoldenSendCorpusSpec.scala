package graft.session

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.sinks.XptReader

/**
 * SEND-standard golden corpus: a small nonclinical study (rat DM + BW
 * body-weight findings) driven through `StudySession(standard = "send")
 * → exportAll`, hash-pinned like [[GoldenCorpusSpec]] (goldens in
 * `src/test/resources/golden/goldens_send.txt`). This is the byte-level
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
class GoldenSendCorpusSpec extends SparkSpec {

  private def resourceDir: Path = {
    val url = getClass.getResource("/golden/GOLD2_DM.csv")
    assert(url != null, "golden SEND fixture resources missing from test classpath")
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
    val dir = resourceDir
    val s = new StudySession(spark, "GOLD2", standard = "send")
    Seq("DM", "BW").foreach { code =>
      s.addDomain(code, dir.resolve(s"GOLD2_$code.csv").toString)
    }
    s
  }

  private def export(outDir: String): Map[String, String] = {
    val session = buildSession()
    val written = session.exportAll(outDir)
    written.map(p => Paths.get(p).getFileName.toString -> sha256(Paths.get(p))).toMap
  }

  private lazy val firstExport: Map[String, String] = export("target/tmp/golden_send1")

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
    firstExport // force the export
    val goldensPath = sourceGoldenDir.resolve("goldens_send.txt")
    val definePath = sourceGoldenDir.resolve("expected_define_send.xml")
    if (sys.env.get("GOLDEN_UPDATE").contains("1")) {
      val lines = firstExport.toSeq.sortBy(_._1).map { case (n, h) => s"$n $h" }
      Files.write(goldensPath, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.copy(Paths.get("target/tmp/golden_send1/define.xml"), definePath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      info(s"goldens regenerated at $goldensPath — review and commit the diff")
    } else {
      assert(Files.exists(goldensPath),
        "no committed SEND goldens — run once with GOLDEN_UPDATE=1")
      val expected = Files.readAllLines(goldensPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, h) = l.split(" ", 2); n -> h
        }.toMap
      val expectedDefine = new String(Files.readAllBytes(definePath), "UTF-8")
      val actualDefine = new String(
        Files.readAllBytes(Paths.get("target/tmp/golden_send1/define.xml")), "UTF-8")
      assert(actualDefine == expectedDefine,
        "define.xml drifted from expected_define_send.xml — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1 and review the diff")
      assert(firstExport.keySet == expected.keySet,
        s"export set drifted: ${firstExport.keySet} vs goldens ${expected.keySet}")
      val mismatched = firstExport.filter { case (n, h) => expected(n) != h }.keys.toSeq.sorted
      assert(mismatched.isEmpty,
        s"artifacts drifted from goldens: $mismatched — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1")
    }
  }

  test("SEND export: byte-stable across two consecutive runs") {
    val second = export("target/tmp/golden_send2")
    assert(second == firstExport)
  }
}
