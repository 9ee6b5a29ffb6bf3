package graft.sinks

import java.io.StringWriter

import graft.SparkSpec

/** Dataset-XML / Define-XML structure pins (dataset_xml.rs:67-165,
  * define_xml.rs:73-470). */
class XmlSinksSpec extends SparkSpec {

  import spark.implicits._

  test("varStats: one pass for max trimmed length + has-data") {
    val df = Seq(("abc  ", ""), ("x", " "), ("", "")).toDF("A", "B")
    val stats = XmlSinks.varStats(df, Seq("A", "B", "MISSING"))
    assert(stats("A") == VarStats(3, hasData = true))
    assert(stats("B") == VarStats(0, hasData = false))
    assert(!stats.contains("MISSING"))
  }

  test("Dataset-XML: seq numbering, empty cells omitted, numerics formatted") {
    val df = Seq(
      (2L, "S2", 40.0, ""),
      (1L, "S1", 2.5, "note"))
      .toDF("_row_id", "USUBJID", "WEIGHT", "COMMENT")
    val w = new StringWriter
    val n = XmlSinks.writeDatasetXml(df, w, "DM", "STUDY1", "3.4",
      Seq("USUBJID", "WEIGHT", "COMMENT"), orderCol = Some("_row_id"))
    val xml = w.toString
    assert(n == 2)
    // row order follows _row_id: S1 first
    val s1 = xml.indexOf("""Value="S1"""")
    val s2 = xml.indexOf("""Value="S2"""")
    assert(s1 >= 0 && s2 >= 0 && s1 < s2)
    assert(xml.contains("""<ItemGroupData ItemGroupOID="IG.DM" data:ItemGroupDataSeq="1">"""))
    assert(xml.contains("""<ItemData ItemOID="IT.DM.WEIGHT" Value="40"/>""")) // 40.0 → 40
    assert(xml.contains("""<ItemData ItemOID="IT.DM.WEIGHT" Value="2.5"/>"""))
    assert(xml.contains("""Value="note""""))
    // empty COMMENT cell for S2 omitted: only one COMMENT ItemData
    assert(xml.sliding("IT.DM.COMMENT".length).count(_ == "IT.DM.COMMENT") == 1)
    assert(xml.contains("""<ClinicalData StudyOID="STDY.STUDY1""""))
  }

  test("Dataset-XML escapes attribute values") {
    val df = Seq(Tuple1("""a<b>&"c""")).toDF("V")
    val w = new StringWriter
    XmlSinks.writeDatasetXml(df, w, "DM", "S", "3.4", Seq("V"))
    assert(w.toString.contains("Value=\"a&lt;b&gt;&amp;&quot;c\""))
  }

  test("Define-XML: item groups, origin types, codelists") {
    val df = Seq(("S1", "M", ""), ("S2", "F", "")).toDF("USUBJID", "SEX", "DCSREAS")
    val vars = Seq(
      XmlVariable("USUBJID", "Unique Subject Identifier", required = true, identifier = true),
      XmlVariable("SEX", "Sex", codelistOid = Some("CL.C66731")),
      XmlVariable("DCSREAS", "Reason for Discontinuation", expected = true))
    val ds = XmlSinks.DefineDataset("DM", "DM", "Demographics",
      "One record per subject", "SPECIAL PURPOSE", vars,
      XmlSinks.varStats(df, vars.map(_.name)))
    val w = new StringWriter
    XmlSinks.writeDefineXml(w, "STUDY1", "3.4", Seq(ds),
      Seq(XmlCodelist("CL.C66731", "Sex", extensible = false, Seq("F", "M", "U"))))
    val xml = w.toString
    assert(xml.contains("""<ItemGroupDef OID="IG.DM" Name="DM" Repeating="Yes" Domain="DM""""))
    assert(xml.contains("""<ItemRef ItemOID="IT.DM.USUBJID" OrderNumber="1" Mandatory="Yes" KeySequence="1"/>"""))
    assert(xml.contains("""<ItemDef OID="IT.DM.SEX" Name="SEX" DataType="text" Length="1">"""))
    assert(xml.contains("""<CodeListRef CodeListOID="CL.C66731"/>"""))
    // USUBJID/SEX collected; DCSREAS expected + empty → Not Available
    assert(xml.contains("""<def:Origin Type="Collected"/>"""))
    assert(xml.contains("""<def:Origin Type="Not Available"/>"""))
    assert(xml.contains("""<CodeListItem CodedValue="M">"""))
    assert(xml.contains("def:DefineVersion=\"2.1.0\""))
  }
}
