package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.{BatchPipeline, EventGen, Metrics}
import graft.streaming.StreamingPipeline

/** Executable end-to-end demo of the reference pipeline parity
  * (EP1, run_toy_example.py:21-49): generate enveloped events with
  * duplicate injection → streaming decode+dedup → staging → hourly batch
  * compaction → language-partitioned parquet + metrics report.
  *
  * Usage: runMain graft.PipelineDemo [nEvents] [workDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val metrics = new Metrics

    // 1. producer with duplicate injection (reference: producer.py:142-167)
    val enveloped = EventGen.enveloped(
      EventGen.withDuplicates(EventGen.events(spark, n), dupRate = 0.02))
    val records = enveloped.as[String].collect().toSeq
    println(s"[demo] produced ${records.length} enveloped records " +
      s"(${records.length - n} injected duplicates)")

    // 2. streaming ingest: decode -> watermarked dedup -> staging NDJSON,
    //    with per-micro-batch observed metrics fed to the CloudWatch-parity
    //    listener (reference: run_toy_example.py:33-36's counter updates)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.streams.addListener(metrics.streamingListener())
    val mem = MemoryStream[String]
    val staged = metrics.observed(StreamingPipeline.pipeline(
      mem.toDF().select($"value".as("record")), watermark = Some("10 minutes")))
    val q = graft.ops.EventOps.withTimePartitions(staged, $"ts")
      .writeStream.format("json")
      .option("path", s"$work/staging")
      .option("checkpointLocation", s"$work/ckpt")
      .partitionBy("year", "month", "day", "hour", "minute")
      .start()
    mem.addData(records)
    q.processAllAvailable()
    q.stop()
    val stagedN = spark.read.schema(
      graft.model.EventModel.stagedEventSchema).json(s"$work/staging").count()
    println(s"[demo] staged $stagedN events after streaming dedup")

    // 3. hourly batch compaction (reference: toy_glue.py:19-75)
    val (dups, written) = BatchPipeline.compactHour(
      spark, s"$work/staging", s"$work/processed",
      "2024", "03", "09", "16", metrics)
    println(s"[demo] compacted hour 16: $written rows " +
      s"($dups residual duplicate keys found in staging)")

    // 4. metrics report (reference: mock_cloudwatch.py:38-54).
    // ingested_events arrives via the streaming listener; compaction adds
    // the processed rows on top, mirroring the reference's double-count
    // of lambda-ingest + glue-read (intentional parity).
    metrics.duplicatesPrevented.set(records.length - stagedN)
    println(metrics.report("Demo pipeline metrics"))

    val langs = spark.read
      .parquet(s"$work/processed/year=2024/month=03/day=09/hour=16")
      .groupBy("language_id").count().orderBy($"language_id")
    langs.show(30, false)
    println(s"[demo] output at $work/processed")
    spark.stop()
  }
}
