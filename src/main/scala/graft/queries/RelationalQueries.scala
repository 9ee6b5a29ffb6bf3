package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Graft.table

/**
 * Core relational coverage: scan + aggregate, broadcast join, filter
 * pushdown, anti-join, window — the Spark shapes every SURVEY §2 operator
 * composes from. Money sums go through DECIMAL(18,2) so the DuckDB oracle
 * hash-matches exactly (double sums are order-dependent), then back to
 * DOUBLE for a canonical representation.
 */
object RelationalQueries {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum((dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
            .cast(DecimalType(28, 4))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_join_agg" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      // customer is the small side at every SF ratio -> broadcast
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(dec("o_totalprice")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q3_filter_agg" -> ((s, dir) => {
      // Predicate + projection reach the parquet scan (PushedFilters).
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
               col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
               col("l_discount") > lit(0.02))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("ship_month")
    }),

    "q4_anti_join" -> ((s, dir) => {
      // Customers with no order before the cutoff, per nation
      // (left_anti == NOT EXISTS); filter reaches the orders scan.
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
        .where(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
        .select(col("o_custkey"))
      val n = table(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lost"))
        .orderBy("n_name")
    }),

    "q5_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("top_orderkey"),
          col("o_totalprice").as("top_totalprice"))
        .orderBy("o_custkey")
    }),

    "q6_multi_join" -> ((s, dir) => {
      // lineitem |><| supplier |><| nation |><| region, dims broadcast.
      val li = table(s, dir, "lineitem")
      val sup = table(s, dir, "supplier")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum(dec("l_extendedprice")).cast("double").as("volume"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("r_name")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q3_filter_agg" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount > 0.02
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q4_anti_join" ->
      """SELECT n_name, COUNT(*) AS n_lost
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q5_window_topn" ->
      """SELECT o_custkey, top_orderkey, top_totalprice FROM (
        |  SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q6_multi_join" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
