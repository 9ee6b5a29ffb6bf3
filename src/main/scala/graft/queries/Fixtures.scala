package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Shared query-fixture plumbing. */
object Fixtures {

  /** Materialize a DataFrame as ONE headered CSV file at `dir/fileName`
    * (coalesce to a single part, then copy it out of the staging dir).
    * Always regenerated — existence-keyed caching would serve stale
    * fixtures if the source parquet changed between runs. */
  def writeSingleCsv(df: DataFrame, dir: Path, fileName: String): String = {
    Files.createDirectories(dir)
    val out = dir.resolve(fileName)
    val stage = dir.resolve("stage").toString
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(stage)
    val listing = Files.list(Paths.get(stage))
    try {
      val part = listing.filter(_.toString.endsWith(".csv")).findFirst().get()
      Files.copy(part, out, StandardCopyOption.REPLACE_EXISTING)
    } finally listing.close()
    out.toString
  }
}
