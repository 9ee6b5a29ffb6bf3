package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query dump: `Test/runMain graft.tools.DumpQuery <query>
  * <sfDir> <outDir>` — writes the query result as parquet for oracle
  * experiments. */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(args(0))(spark, args(1))
      .write.mode("overwrite").parquet(args(2))
    println(s"DUMPED ${args(0)} -> ${args(2)}")
    spark.stop()
  }
}
