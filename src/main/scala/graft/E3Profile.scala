package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.session.StudySession
import graft.sinks.{XmlSinks, XptWriter}
import graft.sources.CsvIngest
import graft.standards.{Standards, VariableType}

/**
 * Phase-level wall-clock breakdown of the e3_export_study path (fixture →
 * create → per-domain preview/stats/XPT/XML → define → readback), so export
 * optimization targets measured cost, not guesses. Mirrors
 * `StudySession.exportAll` step for step; the final line runs the REAL
 * `exportAll` for comparison so replication drift is visible.
 *
 * Usage: sbt "runMain graft.E3Profile /root/testdata/sf0.1"
 */
object E3Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e3] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val folder = t("fixture csvs (first run only)") {
      // the fixture builder is private to SessionQueries; running the query
      // once builds (and memoizes) the study folder it uses
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val d = java.nio.file.Paths.get("target", "tmp", s"e3_study_$tag")
      if (!java.nio.file.Files.exists(d.resolve("lb.csv"))) {
        graft.SparkEntry.queries("e3_export_study")(spark, dir).collect()
      }
      d.toString
    }

    // create sub-phases, LB alone (the long pole): CSV scan+cache vs the
    // fused hints aggregate — so create optimization targets measured cost
    locally {
      val (raw, _) = t("LB readCsvTable + cache+count") {
        val r = CsvIngest.readCsvTable(spark,
          java.nio.file.Paths.get(folder, "lb.csv").toString, 1)
        r._1.cache().count()
        r
      }
      t("LB columnHints (cached input)") {
        graft.operators.Mapping.columnHints(
          raw.select(raw.columns.filterNot(_ == CsvIngest.RowIdCol)
            .map(col): _*))
      }
      raw.unpersist()
    }

    val session = t("create (ingest+hints+score)") {
      StudySession.create(spark, "GRAFT", folder,
        Map("DM" -> "dm.csv", "AE" -> "ae.csv", "LB" -> "lb.csv"))
    }
    val out = java.nio.file.Files.createTempDirectory("e3prof").toString

    Seq("DM", "AE", "LB").foreach { code =>
      val domain = Standards.domain(session.standard, code).get
      val frame = t(s"$code preview+cache") {
        val f = session.preview(code).get.cache()
        f.count() // materialize the cache so later phases time their own work
        f
      }
      val presentVars = domain.orderedVariables.filter(v => frame.columns.contains(v.name))
      val stats = t(s"$code varStats") { XmlSinks.varStats(frame, presentVars.map(_.name)) }
      val charLengths = presentVars.filter(_.dataType != VariableType.Num).flatMap { v =>
        stats.get(v.name).map(s => v.name -> math.max(s.maxLength, 1))
      }.toMap
      val typed = frame.orderBy(col(CsvIngest.RowIdCol)).select(presentVars.map { v =>
        if (v.dataType == VariableType.Num) col(v.name).try_cast("double").as(v.name)
        else col(v.name)
      }: _*)
      t(s"$code xpt write") {
        XptWriter.writeDataFrame(typed, s"$out/${code.toLowerCase}.xpt", code, code,
          labels = presentVars.map(v => v.name -> v.label.getOrElse(v.name)).toMap,
          declaredLengths = charLengths)
      }
      t(s"$code xml write") {
        XmlSinks.writeDatasetXmlFile(frame, s"$out/${code.toLowerCase}.xml", code,
          "GRAFT", session.igVersion, presentVars.map(_.name),
          orderCol = Some(CsvIngest.RowIdCol))
      }
      frame.unpersist()
    }

    Seq("dm", "ae", "lb").foreach { ds =>
      t(s"$ds xpt countRows") { graft.sinks.XptReader.countRows(s"$out/$ds.xpt") }
    }

    val out2 = java.nio.file.Files.createTempDirectory("e3prof2").toString
    t("REAL exportAll (fresh session)") {
      val s2 = StudySession.create(spark, "GRAFT", folder,
        Map("DM" -> "dm.csv", "AE" -> "ae.csv", "LB" -> "lb.csv"))
      s2.exportAll(out2)
    }
    t("REAL full query (memoized fixture)") {
      graft.SparkEntry.queries("e3_export_study")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
