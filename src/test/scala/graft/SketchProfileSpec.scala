package graft

import org.apache.spark.sql.functions._
import graft.queries.AggQueries
import graft.sources.Tables

/** Pins the sketch-only production variant of q34 (AggQueries
  * .sketchProfile): the declared q34 keeps an exact arm so the oracle can
  * bound the sketches; the production spelling drops it, so its contract
  * lives here — error bounds against exact counts, and the plan shape
  * that makes it the 100 TB spelling (single aggregate, map-side
  * partials, no countDistinct Expand).
  */
class SketchProfileSpec extends SparkSpecBase {

  private val rsd = 0.02

  test("sketch estimates land within the declared error bounds of exact") {
    val prof = AggQueries.sketchProfile(spark, sf0001, rsd)
    val exact = Tables.events(spark, sf0001).groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      countDistinct(col("event_id")).as("exact_events"),
      expr("percentile(value, 0.25)").as("p25"),
      expr("percentile(value, 0.75)").as("p75"))
    val rows = prof.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, aU, aE) = (r.getAs[Long]("n"),
        r.getAs[Long]("approx_users"), r.getAs[Long]("approx_events"))
      val (xU, xE) = (r.getAs[Long]("exact_users"), r.getAs[Long]("exact_events"))
      def ok(a: Long, x: Long) = math.abs(a - x) <= math.max(3 * rsd * x, 2.0)
      assert(ok(aU, xU), s"${r.getString(0)}: approx_users $aU vs exact $xU")
      assert(ok(aE, xE), s"${r.getString(0)}: approx_events $aE vs exact $xE")
      val p50 = r.getAs[Double]("approx_p50")
      assert(n < 10 ||
        (p50 >= r.getAs[Double]("p25") && p50 <= r.getAs[Double]("p75")),
        s"${r.getString(0)}: approx_p50 $p50 outside [p25, p75]")
    }
  }

  test("plan: one partial+final aggregate pair, no countDistinct Expand, " +
    "no join") {
    val exec = AggQueries.sketchProfile(spark, sf0001, rsd)
      .queryExecution.executedPlan
    exec.executeCollect()
    val plan = exec.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Expand"),
      s"sketch-only profile must not pay the distinct Expand rewrite:\n$plan")
    assert(!plan.contains("Join"), s"single-pass — no join arm:\n$plan")
    assert("partial_".r.findAllIn(plan).nonEmpty,
      s"no map-side partial aggregation in:\n$plan")
  }
}
