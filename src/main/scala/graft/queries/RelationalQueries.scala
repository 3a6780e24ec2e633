package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H-flavored multi-join analytics (SURVEY.md §2 Part B "Joins" /
  * "Aggregations" depth): the classic shipping-priority (Q3) and
  * local-supplier-volume (Q5) shapes over the driver's TPC-H-ish tables.
  * These exercise what the single-dim joins (q09/q10) don't: a
  * fact-to-fact shuffle join under selective dim filters, join-order
  * and broadcast decisions across 3-6 relations, and the decimal-exact
  * money discipline on a computed measure.
  *
  * Scale notes: customer/supplier/nation/region broadcast (a 100 TB
  * run's dims still fit executors); orders⋈lineitem shuffles on the
  * order key — the one unavoidable fact-fact exchange; AQE is free to
  * re-plan the post-filter sides. Revenue is computed as
  * DECIMAL(18,4) ext × (1 − DECIMAL(18,4) disc): the doubles carry
  * exact 2-dp business values, so the 4-dp decimal cast is unambiguous
  * in both engines and the sum is partition-order-independent. */
object RelationalQueries {

  private val TS_S = "yyyy-MM-dd HH:mm:ss"

  private def revenue: Column =
    sum(col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))

  private val revenueSql =
    "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))"

  // ------------------------------------------------------------------ q56
  /** Q3-flavored shipping priority: top-10 unshipped orders by revenue
    * for one market segment at a date cut. */
  private def q56(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01"
    val c = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).where(col("o_orderdate") < lit(cut))
    val l = Tables.lineitem(spark, dir).where(col("l_shipdate") > lit(cut))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(revenue.cast("double"), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), TS_S).as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }
  private val q56Sql =
    s"""SELECT l_orderkey,
       |       round(CAST($revenueSql AS DOUBLE), 2) AS revenue,
       |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       |       o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------ q57
  /** Q5-flavored local-supplier volume: revenue per nation for one
    * region-year where the supplier is in the customer's nation —
    * a 6-relation join with three broadcast dims. */
  private def q57(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val joined = Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "EUROPE")
    joined.groupBy(col("n_name"))
      .agg(round(revenue.cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
  private val q57Sql =
    s"""SELECT n_name,
       |       round(CAST($revenueSql AS DOUBLE), 2) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  val all: Seq[Decl] = Seq(
    Decl("q56_shipping_priority", q56, Some(q56Sql)),
    Decl("q57_local_supplier_volume", q57, Some(q57Sql)))
}
