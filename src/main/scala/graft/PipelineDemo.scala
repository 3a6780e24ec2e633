package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.{EventGen, Metrics}
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

    // 2+3. EP1 orchestration: streaming decode -> watermarked dedup ->
    //      minute-partitioned staging; every micro-batch re-compacts the
    //      hours it touched into language-partitioned parquet
    //      (StreamingPipeline.startIngestWithCompaction)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.streams.addListener(metrics.streamingListener())
    val mem = MemoryStream[String]
    val q = StreamingPipeline.startIngestWithCompaction(
      mem.toDF().select($"value".as("record")),
      s"$work/staging", s"$work/processed", s"$work/ckpt", metrics)
    mem.addData(records)
    q.processAllAvailable()
    q.stop()
    val stagedN = spark.read.schema(
      graft.model.EventModel.stagedEventSchema).json(s"$work/staging").count()
    println(s"[demo] staged $stagedN events after streaming dedup")
    val compacted = spark.read.parquet(s"$work/processed/year=2024/month=03/day=09/hour=16")
    println(s"[demo] compacted hour 16: ${compacted.count()} rows " +
      s"(batch_duplicates=${metrics.batchDuplicates.get})")

    // 4. metrics report (reference: mock_cloudwatch.py:38-54).
    // ingested_events arrives via the streaming listener; compaction adds
    // the processed rows on top, mirroring the reference's double-count
    // of lambda-ingest + glue-read (intentional parity).
    metrics.duplicatesPrevented.set(records.length - stagedN)
    println(metrics.report("Demo pipeline metrics"))

    val langs = compacted
      .groupBy("language_id").count().orderBy($"language_id")
    langs.show(30, false)
    println(s"[demo] output at $work/processed")
    spark.stop()
  }
}
