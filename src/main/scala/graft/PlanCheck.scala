package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints pushdown / join-strategy / codegen
  * facts for each query so plan regressions are visible at a glance.
  * Usage: runMain graft.PlanCheck [sfDir] [query ...] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session("plancheck")
    names.foreach { q =>
      try {
        val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
        // plan toString truncates long filter lists — count non-empty
        // brackets by their opening character
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val wscg = "WholeStageCodegen".r.findAllIn(plan).size
        val exch = "Exchange".r.findAllIn(plan).size
        println(f"$q%-22s pushedFilters=$pushed bhj=$bhj smj=$smj bnl=$bnl wscg=$wscg exchange=$exch")
      } catch {
        case e: Throwable => println(f"$q%-22s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
