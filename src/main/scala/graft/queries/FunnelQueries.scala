package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Analytic-window completions (SURVEY §2 Part B "Window functions":
  * ranking ✓ q05/q12 — these add the analytic lag/lead and explicit
  * frame rows) plus the attribution funnel built on the as-of machinery.
  */
object FunnelQueries {

  // ------------------------------------------------------------------ q45
  /** Attribution funnel: per day, purchases and purchases with a click by
    * the same user within the preceding hour — the q33 as-of join
    * (union + running max, one shuffle) aggregated into conversion
    * counts. */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("is_click"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("is_click"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts",
        max(when(col("is_click") === 1, col("ts"))).over(w))
      .where(col("is_click") === 0)
      .withColumn("attributed",
        when(col("last_click_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_click_ts")) <= 3600000000L,
          1L).otherwise(0L))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("purchases"),
        sum(col("attributed")).as("attributed_purchases"))
      .orderBy(col("day"))
  }
  private val q45Sql =
    """WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |attr AS (
      |  SELECT p.event_id, p.ts,
      |         CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
      |              THEN 1 ELSE 0 END AS attributed
      |  FROM purch p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts)
      |SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS purchases,
      |       CAST(sum(attributed) AS BIGINT) AS attributed_purchases
      |FROM attr GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q46
  /** Analytic window functions lag/lead: per-user inter-event gaps and
    * next-event transitions, aggregated per type (exact microsecond
    * sums — no float rounding involved). */
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("prev_ts").isNull, 0L)
          .otherwise(unix_micros(col("ts")) - unix_micros(col("prev_ts"))))
          .as("total_gap_us"),
        sum(when(col("next_type") === "purchase", 1L).otherwise(0L))
          .as("next_is_purchase"))
      .orderBy(col("event_type"))
  }
  private val q46Sql =
    """WITH g AS (
      |  SELECT user_id, event_type, ts,
      |         lag(ts) OVER w AS prev_ts, lead(event_type) OVER w AS next_type
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(CASE WHEN prev_ts IS NULL THEN 0
      |                ELSE CAST(epoch_us(ts - prev_ts) AS BIGINT) END) AS BIGINT) AS total_gap_us,
      |       CAST(sum(CASE WHEN next_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS next_is_purchase
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q47
  /** Explicit window frames: per-segment running revenue over order days
    * (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), decimal-exact. */
  private def q47(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.partitionBy(col("seg")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("seg"), col("day"),
      round(sum(col("rev")).over(w), 2).cast("double").as("running_rev"))
      .orderBy(col("seg"), col("day"))
  }
  private val q47Sql =
    """WITH daily AS (
      |  SELECT c_mktsegment AS seg, strftime(o_orderdate, '%Y-%m-%d') AS day,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT seg, day,
      |       CAST(round(sum(rev) OVER (PARTITION BY seg ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_rev
      |FROM daily ORDER BY seg, day""".stripMargin

  val all: Seq[Decl] = Seq(
    Decl("q45_attribution_funnel", q45, Some(q45Sql)),
    Decl("q46_lag_lead", q46, Some(q46Sql)),
    Decl("q47_running_frames", q47, Some(q47Sql)))
}
