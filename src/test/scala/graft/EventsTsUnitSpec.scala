package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Both branches of the footer-probed `ts` decode (sources/Tables.events)
  * under test, plus the loud-failure contract. The driver's testdata has
  * shipped `ts` as TIMESTAMP(NANOS) in one generation and
  * TIMESTAMP(MICROS) in the next (the round-9 silent-1970 incident), and
  * whichever unit the CURRENT generation uses leaves the other branch
  * dead in every data-driven test — so the fixtures here are authored
  * directly with parquet-mr, pinning each branch regardless of what the
  * driver regenerates next.
  */
class EventsTsUnitSpec extends SparkSpecBase {

  /** 2024-03-01 12:34:56 UTC, in seconds. */
  private val EpochS = 1709296496L

  private def schemaWith(ts: org.apache.parquet.schema.Type): MessageType =
    Types.buildMessage()
      .addField(Types.optional(INT64).named("event_id"))
      .addField(ts)
      .addField(Types.optional(INT64).named("user_id"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.optional(DOUBLE).named("value"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")

  /** Write `<dir>/events.parquet` with `ts` carrying `tsValue(i)` under the
    * given parquet type, via parquet-mr (Spark cannot author NANOS). */
  private def writeEvents(dir: String, tsType: org.apache.parquet.schema.Type,
      tsValue: Long => Long, n: Int = 10): Unit = {
    val schema = schemaWith(tsType)
    val conf = spark.sessionState.newHadoopConf()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try (0 until n).foreach { i =>
      val g = f.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", tsValue(i.toLong))
      g.add("user_id", i.toLong % 3)
      g.add("event_type", "click")
      g.add("value", i * 1.5)
      g.add("props", "{}")
      w.write(g)
    } finally w.close()
  }

  private def tsCol(unit: TimeUnit) =
    Types.optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, unit)).named("ts")

  test("NANOS generation: long-bind + div decode lands in the written year") {
    val dir = tmpDir("ev_nanos")
    writeEvents(dir, tsCol(TimeUnit.NANOS), i => (EpochS + i * 60) * 1000000000L)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val r = ev.agg(min(year(col("ts"))), max(year(col("ts"))), count(lit(1))).head()
    assert(r.getInt(0) === 2024 && r.getInt(1) === 2024 && r.getLong(2) === 10)
    // exact instant, not merely the year: row 0 decodes to the written second
    val t0 = ev.where(col("event_id") === 0)
      .select(unix_timestamp(col("ts"))).head().getLong(0)
    assert(t0 === EpochS)
  }

  test("MICROS generation: TIMESTAMP_NTZ bind + cast is value-exact") {
    val dir = tmpDir("ev_micros")
    writeEvents(dir, tsCol(TimeUnit.MICROS), i => (EpochS + i * 60) * 1000000L)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val t0 = ev.where(col("event_id") === 0)
      .select(unix_timestamp(col("ts"))).head().getLong(0)
    assert(t0 === EpochS)
    // both generations decode to the SAME instants: the unit is a storage
    // detail, not a semantic difference
    val nanosDir = tmpDir("ev_nanos2")
    writeEvents(nanosDir, tsCol(TimeUnit.NANOS), i => (EpochS + i * 60) * 1000000000L)
    val a = Tables.events(spark, dir).select("event_id", "ts").collect().toSet
    val b = Tables.events(spark, nanosDir).select("event_id", "ts").collect().toSet
    assert(a === b)
  }

  test("MICROS isAdjustedToUTC=true generation: direct TimestampType bind is value-exact") {
    // pyarrow's default for tz-aware timestamps; NTZ-binding this would
    // throw in Spark's reader (validateTimestampNTZType), so the footer
    // probe must branch on the adjusted flag too, not just the unit.
    val dir = tmpDir("ev_micros_adj")
    writeEvents(dir,
      Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS)).named("ts"),
      i => (EpochS + i * 60) * 1000000L)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val t0 = ev.where(col("event_id") === 0)
      .select(unix_timestamp(col("ts"))).head().getLong(0)
    assert(t0 === EpochS)
    // all three generations agree on the decoded instants
    val ntzDir = tmpDir("ev_micros_ntz")
    writeEvents(ntzDir, tsCol(TimeUnit.MICROS), i => (EpochS + i * 60) * 1000000L)
    val a = Tables.events(spark, dir).select("event_id", "ts").collect().toSet
    val b = Tables.events(spark, ntzDir).select("event_id", "ts").collect().toSet
    assert(a === b)
  }

  test("unknown units fail loudly instead of decoding garbage") {
    val millisDir = tmpDir("ev_millis")
    writeEvents(millisDir, tsCol(TimeUnit.MILLIS), i => (EpochS + i * 60) * 1000L)
    val e1 = intercept[IllegalStateException](Tables.events(spark, millisDir))
    assert(e1.getMessage.contains("MILLIS"), e1.getMessage)

    val plainDir = tmpDir("ev_plain")
    writeEvents(plainDir, Types.optional(INT64).named("ts"), i => EpochS + i)
    val e2 = intercept[IllegalStateException](Tables.events(spark, plainDir))
    assert(e2.getMessage.contains("not a parquet TIMESTAMP"), e2.getMessage)
  }
}
