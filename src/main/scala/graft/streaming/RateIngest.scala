package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.EventOps
import graft.pipeline.EventGen

/** Rate-source ingest at the reference's design point — 278 events/s
  * (README.md:38, run_toy_example.py:23) — through the full streaming
  * pipeline: synthesize event → Kinesis envelope → decode → watermarked
  * dedup → enrich → event-time-partitioned sink. The envelope
  * encode→decode inside one stream mirrors the reference's
  * producer→Lambda process boundary.
  */
object RateIngest {

  /** Build the enveloped record stream from the rate source. */
  def recordStream(spark: SparkSession, rowsPerSecond: Int = 278): DataFrame = {
    val ids = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("value").as("id"))
    EventGen.enveloped(EventGen.eventsFromIds(ids))
  }

  /** Start the full pipeline into a partitioned parquet sink. The
    * reference compacts every 60 s (run_toy_example.py:25); pass a faster
    * trigger for demos/tests. */
  def start(spark: SparkSession, outDir: String, checkpointDir: String,
      rowsPerSecond: Int = 278,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val staged = StreamingPipeline.pipeline(
      recordStream(spark, rowsPerSecond), watermark = Some("10 minutes"))
    StreamingPipeline.sink(staged, outDir, checkpointDir, trigger).start()
  }
}

/** Runnable: ~15 s of live 278 ev/s ingest, then report.
  * Usage: runMain graft.streaming.RateDemo [seconds] [rowsPerSecond] */
object RateDemo {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val rate = args.lift(1).map(_.toInt).getOrElse(278)
    val work = graft.ops.Scratch.tempDir("rate_demo")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = RateIngest.start(spark, s"$work/out", s"$work/ckpt", rate,
      Trigger.ProcessingTime("5 seconds"))
    // NOTE: never processAllAvailable() on a rate source — it produces new
    // rows every second, so "all available" never settles. Sleep + stop.
    // stop() interrupts a mid-flight micro-batch when the offered rate
    // exceeds capacity — that interruption is expected, not a failure.
    Thread.sleep(seconds * 1000L)
    try q.stop() catch { case _: InterruptedException => }
    // zero committed micro-batches (very short run / slow machine) leaves
    // only _spark_metadata behind -> read would fail schema inference
    val out =
      try spark.read.parquet(s"$work/out")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.emptyDataFrame }
    val n = if (out.columns.isEmpty) 0L else out.count()
    println(s"[rate] ingested $n events in ~${seconds}s " +
      s"(~${n / math.max(seconds, 1)}/s vs design ${rate}/s)")
    if (n > 0) {
      out.groupBy("event_type").count().orderBy(desc("count")).show(5, false)
      println(s"[rate] partitions: " + out.select("year", "month", "day", "hour")
        .distinct().count())
    }
    spark.stop()
  }
}
