package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Event-time windowing + temporal-join operators (SURVEY.md §2 Part B:
  * "Streaming: windows" beyond the tumbling q17, and the as-of join
  * stretch). All three run identically in batch and Structured Streaming
  * (session_window/window are streaming-native aggregations).
  */
object WindowQueries {

  private val TS_S = "yyyy-MM-dd HH:mm:ss"
  private val TS_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  // ------------------------------------------------------------------ q31
  /** Session windows (30 min inactivity gap) per user — Spark's native
    * `session_window` aggregation; the oracle is the classic
    * gaps-and-islands SQL. An event exactly at the previous window's end
    * starts a NEW session in both (Spark's end is exclusive ≙ the
    * oracle's `>= INTERVAL` new-session predicate). */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), TS_S).as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }
  private val q31Sql =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g)
      |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------------------------------ q32
  /** Sliding windows (10 min length, 5 min slide): every event lands in
    * exactly two windows; Spark's `window()` explodes them natively, the
    * oracle materializes both bucket starts per event. Both grids align
    * to the epoch (multiple of the slide), so starts agree. */
  private def q32(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), TS_S).as("window_start"), col("n"))
      .orderBy(col("window_start"))
  }
  private val q32Sql =
    """WITH w2 AS (
      |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE FROM events)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n
      |FROM w2 GROUP BY ws ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q33
  /** As-of join: for every purchase, the user's most recent click at or
    * before it (attribution). Implemented the scalable way — a UNION of
    * both event kinds + one running `max` window over (user, time): one
    * shuffle, one sort, no range-join row explosion. The oracle is
    * DuckDB's native ASOF LEFT JOIN — two independent as-of
    * implementations hash-compared. */
  private def q33(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("is_click"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("is_click"), col("event_id"))
    // clicks sort before purchases at equal ts (is_click desc) => `<=` as-of
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts",
        max(when(col("is_click") === 1, col("ts"))).over(w))
      .where(col("is_click") === 0)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), TS_US).as("purchase_ts"),
        date_format(col("last_click_ts"), TS_US).as("last_click_ts"))
      .orderBy(col("event_id"))
  }
  private val q33Sql =
    """WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  val all: Seq[Decl] = Seq(
    Decl("q31_session_window", q31, Some(q31Sql)),
    Decl("q32_sliding_window", q32, Some(q32Sql)),
    Decl("q33_asof_join", q33, Some(q33Sql)))
}
