package graft.standards

import scala.io.Source

import graft.sources.CsvIngest.parseCsvLine

/** SDTM variable metadata (SdtmVariable —
  * `crates/tss-standards/src/sdtm_ig.rs:111-149`; CSV column layout
  * documented in SURVEY §1.3). */
case class SdtmVariable(
    name: String,
    label: Option[String],
    dataType: VariableType.Value,
    codelistCodes: Seq[String],
    describedValueDomain: Option[String],
    role: Option[String],
    core: Option[String], // Req | Exp | Perm
    order: Option[Int],
    datasetName: String) {
  def isRequired: Boolean = core.contains("Req")
  def isExpected: Boolean = core.contains("Exp")
  def isIdentifier: Boolean = role.contains("Identifier")
  def firstCodelistCode: Option[String] =
    codelistCodes.headOption.map(_.trim).filter(_.nonEmpty)
}

object VariableType extends Enumeration {
  val Char, Num = Value
  def parse(s: String): VariableType.Value =
    if (s.trim.equalsIgnoreCase("Num")) Num else Char
}

/** SDTM domain with ordered variables (SdtmDomain — `sdtm_ig.rs`). */
case class SdtmDomain(
    name: String,
    label: Option[String],
    className: Option[String],
    structure: Option[String],
    variables: Seq[SdtmVariable]) {

  def variable(name: String): Option[SdtmVariable] =
    variables.find(_.name.equalsIgnoreCase(name))

  /** Variables sorted by order, nulls last, name tiebreak
    * (`sdtm_ig.rs:214-221`). */
  def orderedVariables: Seq[SdtmVariable] =
    variables.sortBy(v => (v.order.getOrElse(Int.MaxValue), v.name))

  /** Role-priority ordering for Define-XML (`sdtm/domain.rs:190`). */
  def variablesByRole: Seq[SdtmVariable] = {
    val roleRank = Map("Identifier" -> 0, "Topic" -> 1, "Synonym Qualifier" -> 2,
      "Grouping Qualifier" -> 3, "Result Qualifier" -> 4, "Variable Qualifier" -> 5,
      "Record Qualifier" -> 6, "Timing" -> 7)
    orderedVariables.sortBy(v => roleRank.getOrElse(v.role.getOrElse(""), 8))
  }

  /** SUPP-- template clone (`sdtm/domain.rs:220`). */
  def asSuppDomain(parentCode: String, parentLabel: Option[String]): SdtmDomain =
    copy(
      name = s"SUPP${parentCode.toUpperCase}",
      label = Some(s"Supplemental Qualifiers for ${parentLabel.getOrElse(parentCode)}"))
}

/** One CT term (`ct/types.rs`). */
case class CtTerm(code: String, submissionValue: String, synonyms: Seq[String])

/** One codelist with a case-insensitive synonym index
  * (`ct/types.rs:144-205`). */
case class Codelist(
    code: String,
    name: String,
    extensible: Boolean,
    terms: Seq[CtTerm]) {

  /** upper(spelling) → canonical submission value. Submission values of
    * ALL terms index before any synonym, so one term's synonym can never
    * shadow another term's canonical spelling (find_submission_value —
    * ct/types.rs:187-205 checks submission values first). */
  lazy val index: Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    terms.foreach(t => m.getOrElseUpdate(t.submissionValue.toUpperCase, t.submissionValue))
    terms.foreach(t =>
      t.synonyms.foreach(s => m.getOrElseUpdate(s.trim.toUpperCase, t.submissionValue)))
    m.toMap
  }

  /** Case-insensitive resolve of a raw value (`find_submission_value` —
    * `ct/types.rs:187-205`). */
  def resolve(value: String): Option[String] = index.get(value.trim.toUpperCase)
}

/** Loaded CT catalog (`TerminologyRegistry` — `ct/loader.rs:85-103`). */
case class TerminologyRegistry(codelists: Map[String, Codelist]) {
  def get(code: String): Option[Codelist] = codelists.get(code.trim)
  /** Broadcastable lookup map for one codelist. */
  def lookupMap(code: String): Map[String, String] =
    get(code).map(_.index).getOrElse(Map.empty)
}

/**
 * S8/S9 — embedded standards loaders (SURVEY §2.1). Pure driver-side
 * metadata: classpath CSVs in the reference's documented layouts
 * (`sdtm_ig.rs:163-189` build; CT two-pass parse `ct/loader.rs:112-190`).
 * Content here is a public-knowledge SDTM-IG v3.4 / CT subset; drop a
 * fuller CSV in `resources/standards/` to widen coverage — the loader is
 * format-complete.
 */
object Standards {

  private def readResource(path: String): Seq[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing classpath resource $path")
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def parseCsv(lines: Seq[String]): Seq[Map[String, String]] = {
    if (lines.isEmpty) return Nil
    val header = parseCsvLine(lines.head.stripPrefix("﻿"))
    lines.tail.filter(_.nonEmpty).map { line =>
      header.zip(parseCsvLine(line)).toMap.withDefaultValue("")
    }
  }

  /** S8 — SDTM-IG domains + variables from Datasets.csv / Variables.csv. */
  lazy val sdtmIg: Seq[SdtmDomain] = {
    val datasets = parseCsv(readResource("/standards/Datasets.csv"))
    val variables = parseCsv(readResource("/standards/Variables.csv"))
    val varsByDataset = variables.groupBy(_("Dataset Name"))
    datasets.map { d =>
      val ds = d("Dataset Name")
      val vars = varsByDataset.getOrElse(ds, Nil).map { v =>
        SdtmVariable(
          name = v("Variable Name"),
          label = Option(v("Variable Label")).filter(_.nonEmpty),
          dataType = VariableType.parse(v("Type")),
          codelistCodes = v("CDISC CT Codelist Code(s)").split("[;,]")
            .map(_.trim).filter(_.nonEmpty).toSeq,
          describedValueDomain = Option(v("Described Value Domain(s)")).filter(_.nonEmpty),
          role = Option(v("Role")).filter(_.nonEmpty),
          core = Option(v("Core")).filter(_.nonEmpty),
          order = v("Variable Order").toIntOption,
          datasetName = ds)
      }
      SdtmDomain(
        name = ds,
        label = Option(d("Dataset Label")).filter(_.nonEmpty),
        className = Option(d("Class")).filter(_.nonEmpty),
        structure = Option(d("Structure")).filter(_.nonEmpty),
        variables = vars)
    }
  }

  def domain(code: String): Option[SdtmDomain] =
    sdtmIg.find(_.name.equalsIgnoreCase(code))

  /** S9 — CT catalog: two-pass parse (codelist rows have blank
    * `Codelist Code`; term rows carry the parent's code; synonyms split on
    * `;`). */
  lazy val ctRegistry: TerminologyRegistry = {
    val rows = parseCsv(readResource("/standards/SDTM_CT.csv"))
    val (clRows, termRows) = rows.partition(_("Codelist Code").trim.isEmpty)
    val termsByParent = termRows.groupBy(_("Codelist Code").trim)
    val codelists = clRows.map { cl =>
      val code = cl("Code").trim
      val terms = termsByParent.getOrElse(code, Nil).map { t =>
        CtTerm(
          code = t("Code").trim,
          submissionValue = t("CDISC Submission Value").trim,
          synonyms = t("CDISC Synonym(s)").split(";").map(_.trim).filter(_.nonEmpty).toSeq)
      }
      code -> Codelist(
        code = code,
        name = cl("Codelist Name").trim,
        extensible = cl("Codelist Extensible (Yes/No)").trim.equalsIgnoreCase("Yes"),
        terms = terms)
    }.toMap
    TerminologyRegistry(codelists)
  }
}
