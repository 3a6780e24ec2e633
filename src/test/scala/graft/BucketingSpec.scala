package graft

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpecBase {

  test("joining two bucketed tables plans no Exchange (co-located join)") {
    // warehouse.dir is a static conf -> uses the default ./spark-warehouse
    // (gitignored); tables are dropped at the end
    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001), "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, sf0001)
        .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    // disable auto-broadcast so the join strategy is genuinely sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
