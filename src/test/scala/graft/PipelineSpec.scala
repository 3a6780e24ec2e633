package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps
import graft.pipeline.{BatchPipeline, EventGen, Metrics}
import graft.streaming.StreamingPipeline

/** End-to-end batch parity: producer → envelope → decode → staging →
  * hourly compaction → language-partitioned parquet (reference EP1,
  * run_toy_example.py:21-49, minus its bugs). */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("batch pipeline end-to-end: dups removed, partitions laid out, " +
    "enrichment present, nested language_id gone") {
    val staging = tmpDir("staging")
    val processed = tmpDir("processed")
    val metrics = new Metrics

    // produce 3000 events across ~11 s with ~2% duplicate injection
    val enveloped = EventGen.enveloped(
      EventGen.withDuplicates(EventGen.events(spark, 3000), 0.02))

    // lambda-side: decode + enrich + stage as minute-partitioned NDJSON
    val staged = StreamingPipeline.decodeRecords(enveloped)
    BatchPipeline.stageEvents(
      staged.drop("event_type", "event_subtype", "created_datetime"),
      staging, ts = $"ts")

    // glue-side: compact the hour
    val (dupKeys, written) = BatchPipeline.compactHour(
      spark, staging, processed,
      "2024", "03", "09", "16", metrics)
    assert(dupKeys > 0, "injected duplicates must be visible pre-dedup")
    assert(written === 3000L, "dedup must remove exactly the injected dups")

    // layout: language partitions under the hour path
    val hourPath = new java.io.File(
      s"$processed/year=2024/month=03/day=09/hour=16")
    assert(hourPath.isDirectory)
    val langDirs = hourPath.listFiles().filter(_.isDirectory).map(_.getName)
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("language_id=")))

    // read back through partition discovery; nested copy must be gone
    val back = spark.read.parquet(hourPath.toString)
    assert(back.count() === 3000L)
    assert(back.columns.contains("language_id"))
    val nested = back.schema("event_specifics").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(!nested.contains("language_id"))

    // enrichment survives our schema-bound read (unlike the reference,
    // which binds a raw-sample schema and silently drops it - SURVEY §1.3)
    assert(back.columns.contains("event_subtype"))
    assert(metrics.batchDuplicates.get() === dupKeys)
    assert(metrics.processedStorageMb.get() > 0.0)
  }

  test("compaction is idempotent under dynamic partition overwrite") {
    val staging = tmpDir("staging2")
    val processed = tmpDir("processed2")
    val enveloped = EventGen.enveloped(EventGen.events(spark, 500))
    val staged = StreamingPipeline.decodeRecords(enveloped)
    BatchPipeline.stageEvents(
      staged.drop("event_type", "event_subtype", "created_datetime"),
      staging, ts = $"ts")
    val (_, w1) = BatchPipeline.compactHour(
      spark, staging, processed, "2024", "03", "09", "16")
    val (_, w2) = BatchPipeline.compactHour(
      spark, staging, processed, "2024", "03", "09", "16")
    assert(w1 === w2, "re-compacting the same hour must not duplicate data")
  }

  test("metrics report: zero-guarded ratios, markdown shape") {
    val m = new Metrics
    assert(m.duplicateRatio === 0.0) // reference raises ZeroDivisionError here
    m.ingestedEvents.set(200); m.duplicatesPrevented.set(10)
    assert(m.duplicateRatio === 0.05)
    val md = m.report()
    assert(md.contains("|ingested_events|200|"))
    assert(md.contains("|duplicate_ratio|5.00%|"))
  }
}
