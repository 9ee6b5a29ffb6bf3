package graft.session

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.sinks.XptReader

/**
 * End-to-end golden corpus: a mockdata-shaped fixture study (double-header
 * CSVs + Items.csv/CodeLists.csv companions, an LBCH split dataset, a
 * RELSUB/RELREC pair, a SUPP column) driven through the full
 * `StudySession.create → exportAll` pipeline, with every exported artifact
 * — XPT bytes, Dataset-XML, Define-XML — hash-pinned against committed
 * goldens (`src/test/resources/golden/goldens.txt`).
 *
 * This is the byte-level regression net over the spots CLAUDE.md lists as
 * regression-prone (TS-140 member headers, IBM floats, observed lengths,
 * OID parity, SUPPQUAL templates, split-domain naming, def:Standards).
 * An intentional change to any export surface must regenerate the goldens:
 *
 *   GOLDEN_UPDATE=1 sbt "testOnly graft.session.GoldenCorpusSpec"
 *
 * then review the diff of goldens.txt / expected_define.xml like any other
 * code change. Fixture study authored for this repo (shape mirrors the
 * reference's public mockdata EDC export layout: label row + name row,
 * quoted Items/CodeLists companions — `mockdata/DEMO_GDISC_20240903_072908`).
 */
class GoldenCorpusSpec extends SparkSpec {

  private def resourceDir: Path = {
    val url = getClass.getResource("/golden/GOLD1_DM.csv")
    assert(url != null, "golden fixture resources missing from test classpath")
    // requires an exploded-directory test classpath (sbt's default): the
    // fixture paths are handed to CsvIngest/Spark, which need real files,
    // so a jarred resource classpath can never serve this suite
    assert(url.getProtocol == "file",
      s"golden fixtures must be plain files on disk, got: $url")
    Paths.get(url.toURI).getParent
  }

  // the checked-in source of truth lives in src/test/resources/golden; the
  // classpath copy under target/ is what the running spec reads
  private val sourceGoldenDir = Paths.get("src", "test", "resources", "golden")

  private def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  private def buildSession(): StudySession = {
    val dir = resourceDir
    val s = new StudySession(spark, "GOLD1")
    s.loadItemsMetadata(dir.resolve("GOLD1_Items.csv").toString,
      codeListsCsvPath = Some(dir.resolve("GOLD1_CodeLists.csv").toString),
      itemsHeaderRows = 2)
    Seq("DM", "AE", "LBCH", "RELREC", "RELSUB").foreach { code =>
      s.addDomain(code, dir.resolve(s"GOLD1_$code.csv").toString, headerRows = 2)
    }
    s.configureSupp("DM", Seq(
      "INVCMT" -> graft.operators.SuppColumnConfig("DMCMT", "Investigator Comment", "CRF")))
    s
  }

  private def export(outDir: String): Map[String, String] = {
    val session = buildSession()
    val written = session.exportAll(outDir)
    written.map(p => Paths.get(p).getFileName.toString -> sha256(Paths.get(p))).toMap
  }

  private lazy val firstExport: Map[String, String] = export("target/tmp/golden_out1")

  test("fixture metadata: Items.csv statistical detection wires labels and formats") {
    val s = buildSession()
    val dm = s.domainState("DM").get
    // the CSV's own label row outranks the Items.csv label (header labels
    // are the closer source of truth for a double-header EDC export)
    assert(dm.hints("AGE").label.contains("Age in years"))
    // CodeLists.csv SEXFMT decode created SEX from SEXCD (M1)
    assert(dm.source.columns.contains("SEX"))
    // suggestions picked the obvious mappings across all five datasets
    assert(dm.mapping.columnFor("SUBJID").contains("SUBJID"))
    assert(dm.mapping.columnFor("SEX").contains("SEX"))
    assert(s.domainState("LBCH").get.mapping.columnFor("LBTESTCD").contains("LBTESTCD"))
    assert(s.domainState("RELSUB").get.mapping.columnFor("RSUBJID").contains("RSUBJID"))
    assert(s.domainState("RELREC").get.mapping.columnFor("IDVAR").contains("IDVAR"))
  }

  test("golden export: file set is complete") {
    val names = firstExport.keySet
    val expected = Set(
      "ae.xpt", "ae.xml", "dm.xpt", "dm.xml", "lbch.xpt", "lbch.xml",
      "relrec.xpt", "relrec.xml", "relsub.xpt", "relsub.xml",
      "suppdm.xpt", "define.xml")
    assert(names == expected, s"unexpected export set: $names")
  }

  test("golden export: semantic spot checks (split DOMAIN, SUPP, RELSUB augmentation)") {
    firstExport // force the export — this test must not depend on suite order
    val out = "target/tmp/golden_out1"
    val dm = XptReader.read(s"$out/dm.xpt")
    assert(dm.rows.size == 4)
    val sexIdx = dm.columns.indexWhere(_.name == "SEX")
    assert(dm.rows.map(_(sexIdx)) == Seq("M", "F", "M", "F"))
    val lb = XptReader.read(s"$out/lbch.xpt")
    assert(lb.name == "LBCH")
    val domIdx = lb.columns.indexWhere(_.name == "DOMAIN")
    assert(lb.rows.map(_(domIdx)).toSet == Set("LB"))
    // G3: the missing MOTHER→CHILD reciprocal row was generated
    val rs = XptReader.read(s"$out/relsub.xpt")
    assert(rs.rows.size == 4)
    val srelIdx = rs.columns.indexWhere(_.name == "SREL")
    assert(rs.rows.map(_(srelIdx)).count(_ == "CHILD, BIOLOGICAL") == 1)
    val supp = XptReader.read(s"$out/suppdm.xpt")
    assert(supp.rows.size == 3) // subject 102's comment is blank
    val qnamIdx = supp.columns.indexWhere(_.name == "QNAM")
    assert(supp.rows.map(_(qnamIdx)).toSet == Set("DMCMT"))
  }

  test("golden export: hashes match the committed goldens") {
    firstExport // force the export — this test must not depend on suite order
    val goldensPath = sourceGoldenDir.resolve("goldens.txt")
    val definePath = sourceGoldenDir.resolve("expected_define.xml")
    if (sys.env.get("GOLDEN_UPDATE").contains("1")) {
      val lines = firstExport.toSeq.sortBy(_._1).map { case (n, h) => s"$n $h" }
      Files.write(goldensPath, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.copy(Paths.get("target/tmp/golden_out1/define.xml"), definePath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      info(s"goldens regenerated at $goldensPath — review and commit the diff")
    } else {
      assert(Files.exists(goldensPath),
        "no committed goldens — run once with GOLDEN_UPDATE=1")
      val expected = Files.readAllLines(goldensPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, h) = l.split(" ", 2); n -> h
        }.toMap
      // define.xml compared as text first for a readable failure diff
      val expectedDefine = new String(Files.readAllBytes(definePath), "UTF-8")
      val actualDefine = new String(
        Files.readAllBytes(Paths.get("target/tmp/golden_out1/define.xml")), "UTF-8")
      assert(actualDefine == expectedDefine,
        "define.xml drifted from expected_define.xml — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1 and review the diff")
      assert(firstExport.keySet == expected.keySet,
        s"export set drifted: ${firstExport.keySet} vs goldens ${expected.keySet}")
      val mismatched = firstExport.filter { case (n, h) => expected(n) != h }.keys.toSeq.sorted
      assert(mismatched.isEmpty,
        s"artifacts drifted from goldens: $mismatched — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1")
    }
  }

  test("golden export: byte-stable across two consecutive runs") {
    val second = export("target/tmp/golden_out2")
    assert(second == firstExport)
  }
}
