package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc row-counter for one SparkEntry query: `Test/runMain
  * graft.tools.CountQuery <query> <sfDir>`. */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.queries(args(0))(spark, args(1)).count()
    println(s"COUNT ${args(0)} ${args(1)} = $n")
    spark.stop()
  }
}
