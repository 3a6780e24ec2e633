package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps
import graft.sources.Tables

class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted two-phase aggregate equals the direct aggregate on a " +
    "skewed key distribution") {
    // 90% of rows land on one hot key
    val skewed = spark.range(20000).select(
      when(pmod($"id", lit(10)) < 9, "HOT").otherwise(concat(lit("k"), $"id"))
        .as("key"),
      $"id", ($"id" % 97).cast("double").as("v"))
    val direct = skewed.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = SkewOps.saltedSumCount(skewed, Seq("key"), $"id", $"v", 16)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // and the phase-1 hot key really is split across salt buckets
    val buckets = skewed.where($"key" === "HOT")
      .select(SkewOps.salt($"id", 16).as("b")).distinct().count()
    assert(buckets > 8, s"hot key should spread over many salt buckets, got $buckets")
  }

  test("AQE splits a skewed sort-merge-join partition (the runtime half " +
    "of the skew story; salting is the planned half)") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~3 MB of rows on one key vs ~20 KB on each of 50 others
      val fact = spark.range(200000).select(
        when($"id" < 150000, lit("HOT"))
          .otherwise(concat(lit("k"), pmod($"id", lit(50)))).as("k"),
        md5(concat(lit("pad"), $"id")).as("payload"))
      val dim = (Seq("HOT") ++ (0 until 50).map("k" + _)).toDF("k")
        .withColumn("w", lit(1L))
      // NOTE: no keyed aggregation above the join — a downstream
      // requirement on the join key's hash partitioning would forbid
      // splitting skewed partitions (OptimizeSkewedJoin bails out), which
      // is itself part of the lesson: at scale, land skewed joins
      // stage-final (write/collect boundary), or salt (see above).
      val joined = fact.join(dim, "k").select($"k", $"payload", $"w")
      // execute THIS QueryExecution (a .count() would spawn a fresh one
      // and leave this AdaptiveSparkPlan un-finalized)
      val exec = joined.queryExecution.executedPlan
      assert(exec.executeCollect().length === 200000)
      val plan = exec.toString
      assert(plan.contains("skew=true") && plan.contains("skewed"),
        s"expected SortMergeJoin(skew=true) with a skewed AQEShuffleRead in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rocksdb state store provider runs the watermarked streaming dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val events = mem.toDF().toDF("event_uuid", "ts")
      val deduped = graft.streaming.StreamingPipeline.dedup(
        events, watermark = Some("10 minutes"))
      val q = deduped.writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        val t = new java.sql.Timestamp(1710000000000L)
        mem.addData(("a", t), ("b", t), ("a", t)) // in-batch dup
        q.processAllAvailable()
        mem.addData(("b", t), ("c", t)) // cross-batch dup hits RocksDB state
        q.processAllAvailable()
        assert(spark.table("rocks_out").count() === 3)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
