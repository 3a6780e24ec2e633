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
