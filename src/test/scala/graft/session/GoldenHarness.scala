package graft.session

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/**
 * Shared machinery for the three golden-corpus suites (SDTM / SEND /
 * ADaM): fixture resolution off the test classpath, artifact hashing, and
 * the GOLDEN_UPDATE regenerate-or-compare protocol. One definition, so a
 * fix to the compare logic cannot drift between standards.
 */
trait GoldenHarness extends SparkSpec {

  /** A fixture file present in `src/test/resources/golden`, used to locate
    * the directory on the exploded test classpath. */
  def anchorFixture: String

  /** `goldens_*.txt` file name holding `<artifact> <sha256>` lines. */
  def goldensFile: String

  /** Committed copy of the expected define.xml (text-diffed first for a
    * readable failure). */
  def expectedDefineFile: String

  protected def resourceDir: Path = {
    val url = getClass.getResource(s"/golden/$anchorFixture")
    assert(url != null, s"golden fixture $anchorFixture missing from test classpath")
    // requires an exploded-directory test classpath (sbt's default): the
    // fixture paths are handed to CsvIngest/Spark, which need real files
    assert(url.getProtocol == "file",
      s"golden fixtures must be plain files on disk, got: $url")
    Paths.get(url.toURI).getParent
  }

  // the checked-in source of truth lives in src/test/resources/golden; the
  // classpath copy under target/ is what the running spec reads
  private val sourceGoldenDir = Paths.get("src", "test", "resources", "golden")

  protected def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  /** Export via `exportAll` and hash every artifact by file name. */
  protected def exportHashes(session: StudySession, outDir: String): Map[String, String] =
    session.exportAll(outDir).map(p =>
      Paths.get(p).getFileName.toString -> sha256(Paths.get(p))).toMap

  /** GOLDEN_UPDATE=1 → rewrite the committed goldens from this export;
    * otherwise assert the export matches them (define.xml first, as text,
    * for a readable drift diff). */
  protected def checkOrUpdateGoldens(export: Map[String, String], outDir: String): Unit = {
    val goldensPath = sourceGoldenDir.resolve(goldensFile)
    val definePath = sourceGoldenDir.resolve(expectedDefineFile)
    if (sys.env.get("GOLDEN_UPDATE").contains("1")) {
      val lines = export.toSeq.sortBy(_._1).map { case (n, h) => s"$n $h" }
      Files.write(goldensPath, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.copy(Paths.get(s"$outDir/define.xml"), definePath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      info(s"goldens regenerated at $goldensPath — review and commit the diff")
    } else {
      assert(Files.exists(goldensPath),
        s"no committed goldens at $goldensPath — run once with GOLDEN_UPDATE=1")
      val expected = Files.readAllLines(goldensPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, h) = l.split(" ", 2); n -> h
        }.toMap
      val expectedDefine = new String(Files.readAllBytes(definePath), "UTF-8")
      val actualDefine = new String(
        Files.readAllBytes(Paths.get(s"$outDir/define.xml")), "UTF-8")
      assert(actualDefine == expectedDefine,
        s"define.xml drifted from $expectedDefineFile — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1 and review the diff")
      assert(export.keySet == expected.keySet,
        s"export set drifted: ${export.keySet} vs goldens ${expected.keySet}")
      val mismatched = export.filter { case (n, h) => expected(n) != h }.keys.toSeq.sorted
      assert(mismatched.isEmpty,
        s"artifacts drifted from goldens: $mismatched — if intentional, " +
          "regenerate with GOLDEN_UPDATE=1")
    }
  }
}
