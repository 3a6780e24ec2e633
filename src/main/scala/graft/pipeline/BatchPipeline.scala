package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EventModel
import graft.ops.EventOps

/** Batch side of the reference pipeline (the Glue job,
  * toy_example/toy_glue.py:19-75), recomposed from graft.ops operators with
  * the reference's bugs fixed and its manual physical choices delegated to
  * Catalyst (SURVEY.md §4):
  *
  *  - hour selection is a `.where` on Hive-style partition columns →
  *    `PruneFileSourcePartitions` (replaces the zero-padding-buggy glob,
  *    toy_glue.py:31);
  *  - dedup is always on and deterministic (replaces the crashing guarded
  *    `dropDuplicates("event_uuid")`-with-a-bare-string, toy_glue.py:52-53);
  *  - the nested language_id copy is REALLY dropped (toy_glue.py:45's
  *    `.drop` is a silent no-op);
  *  - partitioned overwrite uses dynamic partitionOverwriteMode so
  *    re-compacting one hour never truncates sibling partitions.
  */
object BatchPipeline {

  /** Lambda-side staging write (toy_lambda_function.py:22-29,57-67):
    * enrich, derive zero-padded time partitions, append NDJSON. Event-time
    * partitioning by default (the reference uses processing-time `now()`,
    * toy_lambda_function.py:9-19 — pass `current_timestamp()` for strict
    * parity). */
  def stageEvents(events: DataFrame, stagingDir: String,
      ts: org.apache.spark.sql.Column): Unit = {
    val enriched = EventOps.withEventTypeSubtype(events)
      .withColumn("created_datetime", EventOps.createdDatetime(col("created_at")))
    EventOps.withTimePartitions(enriched, ts)
      .write.mode("append")
      .partitionBy("year", "month", "day", "hour", "minute")
      .json(stagingDir)
  }

  /** Glue-side hourly compaction (toy_glue.py:19-75): schema-bound read of
    * one hour's staging minutes → dedup (first-wins by created_at) →
    * language_id lift → language-partitioned parquet overwrite.
    * Returns (batchDuplicates, rowsWritten). */
  def compactHour(spark: SparkSession, stagingDir: String, processedDir: String,
      year: String, month: String, day: String, hour: String,
      metrics: Metrics = new Metrics, numPartitions: Int = 2): (Long, Long) = {
    // dynamic overwrite only for THIS write; restore the caller's setting
    // (leaving it flipped would silently change every later partitioned
    // overwrite in the session)
    val prevOverwriteMode =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try compactHourInner(spark, stagingDir, processedDir,
      year, month, day, hour, metrics, numPartitions)
    finally prevOverwriteMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def compactHourInner(spark: SparkSession, stagingDir: String,
      processedDir: String, year: String, month: String, day: String,
      hour: String, metrics: Metrics, numPartitions: Int): (Long, Long) = {

    // Schema-bound read (the reference binds a schema inferred from a raw
    // 500-event sample, toy_glue.py:34-38, which silently drops the Lambda
    // enrichment columns — SURVEY.md §1.3. We bind the STAGED schema and
    // keep them; set parity=true semantics by selecting eventSchema fields.)
    val staged = spark.read
      .schema(EventModel.stagedEventSchema)
      .json(stagingDir)
      .where(col("year") === year && col("month") === month &&
        col("day") === day && col("hour") === hour) // partition pruning

    val dupKeys = EventOps.duplicateKeys(staged, "event_uuid").count()
    metrics.batchDuplicates.addAndGet(dupKeys)

    val deduped = EventOps.dedupFirstWins(
      staged, Seq("event_uuid"), Seq(col("created_at")))
    val lifted = EventOps.liftLanguageId(deduped)

    val hourPath = s"$processedDir/year=$year/month=$month/day=$day/hour=$hour"
    val out = lifted
      .drop("year", "month", "day", "hour", "minute")
      .repartition(numPartitions, col("language_id"))
    out.write
      .partitionBy("language_id")
      .mode("overwrite")
      .parquet(hourPath)

    val written = spark.read.parquet(hourPath).count()
    metrics.ingestedEvents.addAndGet(written)
    metrics.updateStorageGauge(spark, stagingDir, staging = true)
    metrics.updateStorageGauge(spark, processedDir, staging = false)
    (dupKeys, written)
  }
}
