package graft.session

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Snapshot of a study's configuration (K4 — `.tss` project files,
  * `crates/tss-persistence/src/lib.rs:14-28`; rkyv binary there, JSON
  * here — the content is what matters: assignments, current mappings,
  * omitted variables, source hashes for change detection). `mappings`
  * stores the CURRENT variable→column assignment, whether scorer-suggested
  * or user-accepted — reopening a project restores the working state the
  * user last saw, acceptance status and all pending suggestions included
  * in one assignment map. */
case class ProjectSnapshot(
    formatVersion: Int,
    studyId: String,
    assignments: Map[String, String],
    mappings: Map[String, Map[String, String]], // domain → (variable → column)
    omitted: Map[String, Seq[String]],
    sourceHashes: Map[String, String],
    standard: String = "sdtm") // implementation guide the study is authored against

/**
 * K4 — project persistence: JSON snapshot + SHA-256 source-change
 * detection (`io/hash.rs:15-42`).
 */
object Persistence {

  // v2 adds the `standard` field (v1 files load as SDTM)
  val FormatVersion = 2

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  /** Streaming SHA-256 of a file (`compute_file_hash`). */
  def sha256(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(Paths.get(path))
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  def save(snapshot: ProjectSnapshot, path: String): Unit =
    Files.write(Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(snapshot))

  def load(path: String): ProjectSnapshot = {
    val snap = mapper.readValue(Files.readAllBytes(Paths.get(path)), classOf[ProjectSnapshot])
    // version-1 files predate the standard selector: Jackson leaves the
    // absent field null, which means SDTM
    if (snap.standard == null) snap.copy(standard = "sdtm") else snap
  }

  /** Domains whose source file content changed since the snapshot. A file
    * that went missing/unreadable since the snapshot counts as changed
    * rather than aborting the whole scan. */
  def changedSources(snapshot: ProjectSnapshot, folder: String): Seq[String] =
    snapshot.assignments.toSeq.sortBy(_._1).collect {
      case (domain, file)
          if snapshot.sourceHashes.get(domain).exists { old =>
            scala.util.Try(sha256(Paths.get(folder, file).toString))
              .map(_ != old).getOrElse(true)
          } =>
        domain
    }.map(_.toString)

  /** Build a snapshot from a live session. Mappings iterate the session's
    * own mapping state (not a fresh Standards lookup), so SEND/ADaM studies
    * and split-domain datasets (LBCH, …) persist their mappings too. */
  def snapshotOf(session: StudySession, folder: String,
      assignments: Map[String, String]): ProjectSnapshot =
    ProjectSnapshot(
      formatVersion = FormatVersion,
      studyId = session.studyId,
      assignments = assignments,
      mappings = session.domainCodes.map { c =>
        val ds = session.domainState(c).get
        c -> ds.mapping.variableNames.flatMap(v =>
          ds.mapping.columnFor(v).map(v -> _)).toMap
      }.toMap,
      omitted = session.domainCodes.map(c =>
        c -> session.domainState(c).get.mapping.omitted.toSeq.sorted).toMap,
      sourceHashes = assignments.map { case (d, f) =>
        d -> sha256(Paths.get(folder, f).toString)
      },
      standard = session.standard)
}
