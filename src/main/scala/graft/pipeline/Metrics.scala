package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Pipeline metrics with MockCloudWatch parity (reference:
  * toy_example/mock_cloudwatch.py:8-54): the same 10-field record, fed by
  * `Dataset.observe` named metrics instead of per-record Python `+=`.
  *
  * Two reference bugs intentionally NOT reproduced (SURVEY.md §6):
  *  - storage gauges are SET to the current tree size, not `+=`-accumulated
  *    each call (mock overcounts monotonically);
  *  - ratios zero-guard instead of raising ZeroDivisionError when nothing
  *    was ingested (mock_cloudwatch.py:21-24).
  */
class Metrics {
  val lambdaInvocations = new AtomicLong(0)
  val ingestedEvents = new AtomicLong(0)
  val duplicatesPrevented = new AtomicLong(0)
  val batchDuplicates = new AtomicLong(0)
  val ingestionErrors = new AtomicLong(0)
  val stagingStorageMb = new AtomicReference[Double](0.0)
  val processedStorageMb = new AtomicReference[Double](0.0)
  val storageLimitMb: Double = 2048.0 // mock_cloudwatch.py:17

  def duplicateRatio: Double = {
    val n = ingestedEvents.get
    if (n == 0) 0.0 else duplicatesPrevented.get.toDouble / n
  }
  def errorRatio: Double = {
    val n = ingestedEvents.get
    if (n == 0) 0.0 else ingestionErrors.get.toDouble / n
  }
  def storagePct: Double =
    (stagingStorageMb.get + processedStorageMb.get) / storageLimitMb * 100.0

  /** Attach observation to a batch/streaming DataFrame; call
    * [[absorb]] with the observed Row afterwards (batch: via
    * `Observation`; streaming: from `StreamingQueryProgress.observedMetrics`). */
  def observed(df: DataFrame, name: String = "cw"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col("event_uuid").isNull, 1L).otherwise(0L)).as("null_keys"))

  def absorb(row: Row): Unit = {
    ingestedEvents.addAndGet(row.getAs[Long]("n_rows"))
    ingestionErrors.addAndGet(row.getAs[Long]("null_keys"))
  }

  /** Streaming-side feed: absorbs the named observation from every
    * micro-batch progress event (reference parity: the per-invocation
    * counter `+=` in run_toy_example.py:33-36, but listener-driven).
    * Attach with `spark.streams.addListener(metrics.streamingListener())`
    * on a stream built over [[observed]]. */
  def streamingListener(name: String = "cw"): org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        lambdaInvocations.incrementAndGet()
        val om = e.progress.observedMetrics
        if (om.containsKey(name)) absorb(om.get(name))
      }
    }

  /** Storage gauge scan (reference: toy_lambda_function.py:71-81 — a
    * glob+getsize walk; here the Hadoop FS equivalent, gauge SET not
    * accumulated). */
  def updateStorageGauge(spark: SparkSession, dir: String, staging: Boolean): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mb =
      if (!fs.exists(path)) 0.0
      else {
        val it = fs.listFiles(path, true)
        var bytes = 0L
        while (it.hasNext) bytes += it.next().getLen
        math.round(bytes / 1048576.0 * 100.0) / 100.0
      }
    if (staging) stagingStorageMb.set(mb) else processedStorageMb.set(mb)
  }

  /** Markdown report (reference: mock_cloudwatch.py:38-54). */
  def report(title: String = "Pipeline metrics"): String = {
    def pct(x: Double) = f"${x * 100}%.2f%%"
    s"""## $title
       ||metric|value|
       ||---|---|
       ||lambda_invocations|${lambdaInvocations.get}|
       ||ingested_events|${ingestedEvents.get}|
       ||duplicates_prevented|${duplicatesPrevented.get}|
       ||batch_duplicates|${batchDuplicates.get}|
       ||ingestion_errors|${ingestionErrors.get}|
       ||duplicate_ratio|${pct(duplicateRatio)}|
       ||error_ratio|${pct(errorRatio)}|
       ||staging_storage_mb|${stagingStorageMb.get}|
       ||processed_storage_mb|${processedStorageMb.get}|
       ||storage_used_pct|${f"$storagePct%.2f%%"}|
       |""".stripMargin
  }
}
