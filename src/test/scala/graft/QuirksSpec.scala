package graft

import org.apache.spark.sql.functions._
import graft.model.EventModel
import graft.pipeline.Metrics

/** Reference-schema quirks the engine must survive (SURVEY.md §1.1). */
class QuirksSpec extends SparkSpecBase {
  import spark.implicits._

  test("`e-mail` and `email` coexist; dash column is backtick-addressable") {
    // reference: event_config.yml:17 vs :24 — both payload keys exist
    assert(EventModel.eventSpecificsSchema.fieldNames.contains("e-mail"))
    assert(EventModel.eventSpecificsSchema.fieldNames.contains("email"))

    val df = Seq(("a@b.c", "x@y.z")).toDF("e-mail", "email")
    df.createOrReplaceTempView("quirk")
    // Spark SQL needs backticks for the dash column
    val got = spark.sql("SELECT `e-mail`, email FROM quirk")
      .as[(String, String)].head()
    assert(got === ("a@b.c", "x@y.z"))
    // and the Column API path
    assert(df.select(col("`e-mail`")).as[String].head() === "a@b.c")
  }

  test("event schema: 30 payload fields, 8 longs, alphabetical (JSON " +
    "inference order)") {
    val s = EventModel.eventSpecificsSchema
    assert(s.fields.length === 30)
    assert(s.fields.count(_.dataType ==
      org.apache.spark.sql.types.LongType) === 8)
    assert(s.fieldNames.toSeq === s.fieldNames.toSeq.sorted)
  }

  test("infer-from-sample round trip: a raw sample infers exactly " +
    "EventModel.eventSchema, and binding it to ENRICHED staging silently " +
    "drops the enrichment columns (toy_glue.py:34-38)") {
    // 1. Write a raw producer sample (reference: inference_events.json) —
    //    large enough that every sparse union key occurs at least once.
    val sampleDir = tmpDir("infer_sample")
    graft.pipeline.EventGen.events(spark, 1500)
      .write.mode("overwrite").json(sampleDir)

    // 2. Infer. Spark sorts JSON keys, ints → Long: the inferred schema
    //    must equal the hand-written model EXACTLY (this is what makes
    //    hand-binding it at 100 TB safe — one sample inference, then
    //    schema-bound reads everywhere; SURVEY §1.3).
    val inferred = spark.read.json(sampleDir).schema
    assert(inferred === EventModel.eventSchema,
      s"inferred:\n${inferred.treeString}\nmodel:\n${EventModel.eventSchema.treeString}")

    // 3. Stage ENRICHED events (the Lambda adds event_type/event_subtype/
    //    created_datetime before staging), then read the staging NDJSON
    //    with the inferred RAW schema, as the reference's Glue job does.
    val stagingDir = tmpDir("infer_staging")
    graft.streaming.StreamingPipeline.decodeRecords(
        graft.pipeline.EventGen.enveloped(graft.pipeline.EventGen.events(spark, 300)))
      .drop("ts") // engine-side event-time column, not part of the wire row
      .write.mode("overwrite").json(stagingDir)
    val bound = spark.read.schema(inferred).json(stagingDir)

    // Round trip: all rows survive, but the enrichment columns are GONE —
    // the reference's documented silent data loss, pinned by CI.
    assert(bound.count() === 300)
    assert(!bound.columns.contains("event_type") &&
      !bound.columns.contains("event_subtype") &&
      !bound.columns.contains("created_datetime"))
    // while the engine's schema-bound staging read keeps them
    assert(spark.read.schema(EventModel.stagedEventSchema).json(stagingDir)
      .columns.contains("event_subtype"))
  }

  test("streaming listener feeds observed metrics per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val metrics = new Metrics
    val listener = metrics.streamingListener()
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[String]
      val observed = metrics.observed(
        mem.toDF().select($"value".as("event_uuid")))
      val q = observed.writeStream.format("noop").start()
      mem.addData(Seq("u1", "u2", "u3"))
      q.processAllAvailable()
      q.stop()
      // listener delivery is async relative to processAllAvailable
      val deadline = System.currentTimeMillis + 10000
      while (metrics.ingestedEvents.get < 3 &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(metrics.ingestedEvents.get === 3)
      assert(metrics.ingestionErrors.get === 0)
    } finally spark.streams.removeListener(listener)
  }
}
