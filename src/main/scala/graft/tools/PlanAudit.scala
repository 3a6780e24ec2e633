package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit across every declared query: operator counts that
  * matter at 100 TB (scans, shuffles, broadcasts, sorts, codegen spans).
  * Output is one line per query — eyeball for: more scans than tables,
  * shuffles without a keyed op to justify them, missing broadcasts on
  * small dims, interpreted (non-codegen) hot paths.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-28s scan cache xchg bcast sort wscg")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      // execute THIS QueryExecution's plan (df.write/.count would spawn a
      // fresh one, leaving this AdaptiveSparkPlan un-finalized — no
      // codegen markers, no reused-exchange info in toString)
      val exec = df.queryExecution.executedPlan
      exec.executeCollect()
      // toString prints "Final Plan" then "Initial Plan" — keep final only
      val plan = exec.toString.split("== Initial Plan ==")(0)
      def n(p: String) = p.r.findAllIn(plan).length
      // InMemoryRelation nodes print their child plan, so parquet scans
      // inside a cache node would double-count: count top-level only
      val scans = n("Scan parquet") + n("Scan ExistingRDD")
      val cached = n("TableCacheQueryStage")
      val xchg = n("Exchange") - n("BroadcastExchange") - n("ReusedExchange")
      val bcast = n("BroadcastExchange")
      val sorts = n("\\bSort\\b")
      val wscg = n("\\*\\(")
      println(f"$name%-28s $scans%4d $cached%4d $xchg%4d $bcast%5d $sorts%4d $wscg%4d")
    }
    spark.stop()
  }
}
