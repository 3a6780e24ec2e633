package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.{Bucketing, Tables}
/** Drives the bucketed co-located join at the library surface. */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    Bucketing.writeBucketed(Tables.orders(spark, dir), "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    println(s"[bucket] rows=${joined.count()} exchanges=${plan.split("Exchange").length - 1}")
    spark.stop()
  }
}
