package graft.tools

/** Ad-hoc standalone timer for a subset of SparkEntry queries:
  * `Test/runMain graft.tools.TimeQueries <sfDir> <query> [query...]` —
  * warmup run + 3 timed noop-sink runs per query, prints median and min.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("time-queries")
    val sfDir = args(0)
    args.drop(1).foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9 // cleanup NOT billed
        spark.catalog.clearCache(); System.gc()
        elapsed
      }
      run() // warmup
      val ts = Vector.fill(3)(run()).sorted
      println(f"TIME $name med=${ts(1)}%.2f min=${ts.head}%.2f")
    }
    spark.stop()
  }
}
