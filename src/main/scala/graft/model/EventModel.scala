package graft.model

import org.apache.spark.sql.types._

/** Data model of the reference event stream
  * (spechticus/event_streaming_toy_example).
  *
  * The wire event is a 4-field envelope plus a sparse per-subtype payload
  * (reference: data_creation/producer.py:90-101). The *effective* payload —
  * the union of keys the generator actually emits — has exactly 30 fields
  * (reference: data_creation/producer.py:39-85; verified against all 500
  * events of toy_example/inference_events.json). Eight of them carry JSON
  * ints (inferred BIGINT by Spark/Glue — reference: toy_example/
  * toy_glue.py:34-38), the rest strings.
  *
  * Quirks preserved on purpose:
  *  - both `e-mail` and `email` exist (event_config.yml:17,24) — the dash
  *    forces backtick quoting in Spark SQL;
  *  - `event_name` can be 3-part (`payment:order:completed`,
  *    event_config.yml:253,263);
  *  - `created_at` is epoch seconds as a DOUBLE with fractional seconds
  *    (producer.py:95-97).
  */
object EventModel {

  /** Payload keys that carry integer values (→ LongType, matching Spark
    * JSON inference used by the reference's Glue job, toy_glue.py:34-38). */
  val intFields: Seq[String] = Seq(
    "amount", "attempts", "days_active", "days_into_trial", "duration",
    "failcount", "rating", "score")

  /** Payload keys that carry string values. */
  val stringFields: Seq[String] = Seq(
    "account_id", "campaign_id", "currency", "device", "difficulty",
    "e-mail", "email", "end_time", "exercise_id", "feedback", "language_id",
    "last_login_time", "lesson_id", "referree_id", "registration_method",
    "resume_time", "selected_language_id", "session_id", "start_time",
    "un_selected_language_id", "user_id", "user_location")

  /** The 30-field sparse payload struct, fields in alphabetical order
    * (matching Spark's JSON schema inference, which sorts keys). */
  val eventSpecificsSchema: StructType = StructType(
    (intFields.map(f => StructField(f, LongType, nullable = true)) ++
      stringFields.map(f => StructField(f, StringType, nullable = true)))
      .sortBy(_.name))

  /** The processed-tier event schema as the reference's Glue job binds it:
    * inferred from the raw-producer sample, hence NO enrichment columns
    * (toy_glue.py:34-38; see SURVEY.md §1.3). Field order is alphabetical
    * (JSON inference order). */
  val eventSchema: StructType = StructType(Seq(
    StructField("created_at", DoubleType, nullable = true),
    StructField("event_name", StringType, nullable = true),
    StructField("event_specifics", eventSpecificsSchema, nullable = true),
    StructField("event_uuid", StringType, nullable = true)))

  /** Staging-tier schema = envelope + Lambda enrichment columns
    * (toy_lambda_function.py:57-62). */
  val stagedEventSchema: StructType = StructType(
    eventSchema.fields ++ Seq(
      StructField("event_type", StringType, nullable = true),
      StructField("event_subtype", StringType, nullable = true),
      StructField("created_datetime", StringType, nullable = true)))

  /** Schema of one Kinesis-mock record string's decoded JSON — the official
    * AWS template the producer splices into (producer.py:114-131). Only the
    * fields the pipeline reads are modeled strictly; the rest are strings. */
  val kinesisRecordSchema: StructType = StructType(Seq(
    StructField("kinesis", StructType(Seq(
      StructField("kinesisSchemaVersion", StringType),
      StructField("partitionKey", StringType),
      StructField("sequenceNumber", StringType),
      StructField("data", StringType), // base64 of the event JSON
      StructField("approximateArrivalTimestamp", DoubleType)))),
    StructField("eventSource", StringType),
    StructField("eventVersion", StringType),
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("invokeIdentityArn", StringType),
    StructField("awsRegion", StringType),
    StructField("eventSourceARN", StringType)))
}

/** Schemas for the driver-supplied /root/testdata tables (TESTDATA.md).
  * Binding these at read time (instead of relying on parquet footer
  * inference per file) is the 100 TB posture: one footer read vs a
  * schema-merge pass over the whole tree. */
object TestData {
  /** On-disk schema for the NANOS generation of events.parquet: parquet
    * TIMESTAMP(NANOS) is illegal for Spark's micros-based timestamp types,
    * so `ts` is bound as LongType (epoch nanos, via
    * `spark.sql.legacy.parquet.nanosAsLong`) and converted to a proper
    * TimestampType column in [[graft.sources.Tables.events]], which picks
    * this schema or [[eventRawMicros]] by reading the footer's declared
    * unit. */
  val eventRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** On-disk schema for the MICROS generation of events.parquet:
    * TIMESTAMP(isAdjustedToUTC=false, MICROS) binds losslessly as
    * TIMESTAMP_NTZ; [[graft.sources.Tables.events]] casts it to
    * TimestampType (exact under the engine-wide UTC session timezone). */
  val eventRawMicros: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** On-disk schema for a MICROS generation written with
    * isAdjustedToUTC=true (pyarrow's default for tz-aware timestamps):
    * instant semantics bind directly as TimestampType — Spark's reader
    * REFUSES to bind an adjusted column as TIMESTAMP_NTZ. Derived from
    * [[eventRawMicros]] by retyping `ts` only, so a column added there
    * can never be silently missing here. */
  val eventRawMicrosAdjusted: StructType = StructType(
    eventRawMicros.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  val document: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embedding: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}
