package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps
import graft.pipeline.EventGen

/** Per-operator semantics, including the reference's quirk behaviors
  * (SURVEY.md §2 rows 5-9, §7 "genuinely tricky parts"). */
class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("event_name split: 3-part name keeps middle part, discards tail") {
    // reference: toy_lambda_function.py:58-59 — index split, not limit-2
    val df = Seq("payment:order:completed", "account:login", "session:started")
      .toDF("event_name")
    val got = EventOps.withEventTypeSubtype(df)
      .select("event_name", "event_type", "event_subtype")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("payment:order:completed", "payment", "order"), // tail DISCARDED
      ("account:login", "account", "login"),
      ("session:started", "session", "started")))
  }

  test("createdDatetime: epoch double -> fixed-width ISO-8601 UTC") {
    val df = Seq(1712844605.9512355).toDF("created_at")
    val got = df.select(EventOps.createdDatetime($"created_at")).as[String].head()
    assert(got === "2024-04-11T14:10:05.951235") // truncated micros, UTC
  }

  test("time partitions are zero-padded (the reference's glob bug trap)") {
    // reference bug: toy_glue.py:31 globs hour=5 vs staged hour=05
    val df = Seq("2024-03-07 05:09:01").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val r = EventOps.withTimePartitions(df, $"ts")
      .select("year", "month", "day", "hour", "minute").head()
    assert(r.toSeq === Seq("2024", "03", "07", "05", "09"))
  }

  test("dedupFirstWins keeps the earliest row per key, deterministically") {
    val df = Seq(
      ("a", 3.0, "third"), ("a", 1.0, "first"), ("a", 2.0, "second"),
      ("b", 5.0, "only")).toDF("k", "t", "tag")
    val got = EventOps.dedupFirstWins(df, Seq("k"), Seq($"t"))
      .select("k", "tag").as[(String, String)].collect().toSet
    assert(got === Set(("a", "first"), ("b", "only")))
  }

  test("dedup is idempotent and removes injected duplicates exactly") {
    // mirrors the reference's duplicate model (producer.py:162-166)
    val ev = EventGen.events(spark, 2000)
    val withDups = EventGen.withDuplicates(ev, dupRate = 0.05)
    val n = ev.count()
    assert(withDups.count() > n) // injection actually injected
    val d1 = EventOps.dedupFirstWins(withDups, Seq("event_uuid"), Seq($"created_at"))
    assert(d1.count() === n)
    val d2 = EventOps.dedupFirstWins(d1, Seq("event_uuid"), Seq($"created_at"))
    assert(d2.count() === n) // dedup ∘ dedup = dedup
  }

  test("envelope encode ∘ decode is the identity on the event struct") {
    val ev = EventGen.events(spark, 500)
    val decoded = EventGen.enveloped(ev)
      .select(EventOps.decodeEnvelope($"record").as("event"))
      .select($"event.event_uuid", $"event.created_at", $"event.event_name",
        $"event.event_specifics.language_id")
    val orig = ev.select($"event_uuid", $"created_at", $"event_name",
      $"event_specifics.language_id")
    assert(decoded.exceptAll(orig).isEmpty && orig.exceptAll(decoded).isEmpty)
  }

  test("corrupt records degrade to NULL rows, never exceptions (the " +
    "reference's lambda dies on the first bad record; a 100 TB ingest " +
    "must quarantine instead)") {
    val good = EventGen.enveloped(EventGen.events(spark, 1))
      .as[String].head()
    val hostile = Seq(
      good,                                  // 1 valid record
      "not json at all",                     // unparseable envelope
      """{"kinesis": {"no_data": true}}""",  // missing $.kinesis.data
      """{"kinesis": {"data": "!!!not-base64!!!"}}""", // bad base64
      // valid base64 of invalid inner JSON
      """{"kinesis": {"data": "bm90IGpzb24="}}""")
    val decoded = hostile.toDF("record")
      .select(EventOps.decodeEnvelope($"record").as("e"))
    // no exception on full materialization, exactly one decodable event
    val rows = decoded.collect()
    assert(rows.length === 5)
    assert(decoded.where($"e.event_uuid".isNotNull).count() === 1)
    // the quarantine split is a plain filter either way
    assert(decoded.where($"e".isNull || $"e.event_uuid".isNull).count() === 4)
  }

  test("explodeRecordsBatch unwraps the producer's Records batch dict; " +
    "a malformed batch contributes zero rows, not a crash") {
    val batches = EventGen.kinesisBatches(spark, 200, batchSize = 50)
    assert(batches.count() === 4)
    val n = EventOps.explodeRecordsBatch(batches).count()
    assert(n >= 200, s"expected all wrapped records (+ any batch dups), got $n")
    val bad = Seq("""{"Records": "not-an-array"}""", "garbage").toDF("batch")
    assert(EventOps.explodeRecordsBatch(bad).count() === 0)
  }

  test("duplicateKeys counts keys with >1 occurrence") {
    val df = Seq("x", "x", "x", "y", "z", "z").toDF("event_uuid")
    val dups = EventOps.duplicateKeys(df, "event_uuid")
      .as[(String, Long)].collect().toMap
    assert(dups === Map("x" -> 3L, "z" -> 2L))
  }

  test("liftLanguageId lifts to top level AND drops the nested copy") {
    // the reference's .drop("event_specifics.language_id") is a no-op
    // (toy_glue.py:45); ours must actually remove the nested field
    val df = Seq(("u1", "lang_de", "iOS")).toDF("event_uuid", "language_id", "device")
      .select($"event_uuid", struct($"language_id", $"device").as("event_specifics"))
    val out = EventOps.liftLanguageId(df)
    assert(out.columns.contains("language_id"))
    val nested = out.schema("event_specifics").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(nested === Seq("device"))
    assert(out.select("language_id").as[String].head() === "lang_de")
  }
}
