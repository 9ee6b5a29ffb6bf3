package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed entries for user-generated relationship domains (G4 — snapshot
  * types at `crates/tss-persistence/src/types/generated_domains.rs:15-160`). */
case class CoEntry(studyId: String, rdomain: String, usubjid: String,
    coseq: Long, coval: String, codtc: String = "")
case class RelrecEntry(studyId: String, rdomain: String, usubjid: String,
    idvar: String, idvarval: String, reltype: String, relid: String)
case class RelsubEntry(studyId: String, usubjid: String, rsubjid: String, srel: String)
case class RelspecEntry(studyId: String, usubjid: String, refid: String,
    spec: String, parent: String = "", level: Long = 1)

/**
 * G4 — render editor-entered relationship rows into DataFrames at export
 * (the reference keeps them in the project file and materializes on
 * demand). Tiny driver-side collections → `createDataFrame`; they flow
 * through the same validation (X2-X5) and sinks as scanned domains.
 */
object GeneratedDomains {

  def co(spark: SparkSession, entries: Seq[CoEntry]): DataFrame = {
    import spark.implicits._
    entries.toDF("STUDYID", "RDOMAIN", "USUBJID", "COSEQ", "COVAL", "CODTC")
      .withColumn("DOMAIN", org.apache.spark.sql.functions.lit("CO"))
      .select("STUDYID", "DOMAIN", "RDOMAIN", "USUBJID", "COSEQ", "COVAL", "CODTC")
  }

  def relrec(spark: SparkSession, entries: Seq[RelrecEntry]): DataFrame = {
    import spark.implicits._
    entries.toDF("STUDYID", "RDOMAIN", "USUBJID", "IDVAR", "IDVARVAL", "RELTYPE", "RELID")
  }

  def relsub(spark: SparkSession, entries: Seq[RelsubEntry],
      ensureBidirectional: Boolean = true): DataFrame = {
    import spark.implicits._
    val df = entries.toDF("STUDYID", "USUBJID", "RSUBJID", "SREL")
      .withColumn("DOMAIN", org.apache.spark.sql.functions.lit("RELSUB"))
      .select("STUDYID", "DOMAIN", "USUBJID", "RSUBJID", "SREL")
    if (ensureBidirectional) Reshape.ensureRelsubBidirectional(df) else df
  }

  def relspec(spark: SparkSession, entries: Seq[RelspecEntry]): DataFrame = {
    import spark.implicits._
    entries.toDF("STUDYID", "USUBJID", "REFID", "SPEC", "PARENT", "LEVEL")
  }
}
