package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Deterministic, distributed generator of reference-shaped events
  * (SURVEY.md §2 row 1; reference: data_creation/producer.py:23-110).
  *
  * The reference draws uniformly from an 11×36 config taxonomy with Faker
  * payloads; we reproduce the *shape* deterministically from `spark.range`
  * + hash-derived choices (seeded, reproducible, no driver-side loops — a
  * billion events is one narrow map stage). Payload fields follow the
  * reference's effective 30-key union; only a representative subset is
  * populated per subtype, mirroring the sparse-payload property.
  */
object EventGen {

  /** The full taxonomy (event_config.yml:1-355), including the 3-part
    * payment names (event_config.yml:253,263). */
  val eventNames: Seq[String] = Seq(
    "account:created", "account:updated", "account:deleted",
    "account:password_changed", "account:email_changed", "account:login",
    "account:logout", "account:deletion_request",
    "session:started", "session:ended", "session:timed_out",
    "language:selected", "language:changed",
    "lesson:started", "lesson:completed", "lesson:failed", "lesson:resumed",
    "lesson:quit",
    "exercise:started", "exercise:completed", "exercise:failed",
    "exercise:resumed", "exercise:quit",
    "subscription:started", "subscription:renewed", "subscription:cancelled",
    "payment:order:completed", "payment:order:failed",
    "feedback:submitted", "rating:submitted",
    "game:started", "game:resumed", "game:quit",
    "referral:sent", "referral:accepted", "referral:revoked")

  /** `n` deterministic events starting at epoch-seconds `t0`, ~`rate`
    * events/second (the reference's design point is 278/s,
    * run_toy_example.py:23). */
  def events(spark: SparkSession, n: Long, t0: Double = 1.71e9,
      rate: Double = 278.0): DataFrame =
    eventsFromIds(spark.range(n).toDF(), t0, rate)

  /** Event projection over ANY `id`-column relation — the same expression
    * set serves `spark.range` (batch tests) and the streaming `rate`
    * source (`value` renamed to `id`): one narrow map stage either way. */
  def eventsFromIds(ids: DataFrame, t0: Double = 1.71e9,
      rate: Double = 278.0): DataFrame = {
    val id = col("id")
    val pick = pmod(xxhash64(id, lit(42)), lit(eventNames.size)).cast("int")
    val nameArr = array(eventNames.map(lit): _*)
    ids.select(
      md5(concat(lit("uuid-"), id)).as("event_uuid"),
      (lit(t0) + id.cast("double") / rate).as("created_at"),
      element_at(nameArr, pick + 1).as("event_name"),
      struct(
        concat(lit("lang_"), pmod(xxhash64(id, lit(7)), lit(20))).as("language_id"),
        concat(lit("user-"), pmod(xxhash64(id, lit(11)), lit(1000))).as("user_id"),
        element_at(array(lit("Android"), lit("iOS"), lit("web")),
          pmod(xxhash64(id, lit(13)), lit(3)).cast("int") + 1).as("device"),
        pmod(xxhash64(id, lit(17)), lit(100)).as("score"),
        pmod(xxhash64(id, lit(19)), lit(3600)).as("duration"),
        md5(concat(lit("sess-"), pmod(xxhash64(id, lit(23)), lit(5000)))).as("session_id"))
        .as("event_specifics"))
  }

  /** Duplicate injection (reference: producer.py:162-166 — with p=0.05 a
    * batch re-appends 1-10 existing records). Deterministic variant:
    * re-append every record whose uuid hash falls in a `dupRate` slice.
    * UNION ALL, exactly like the reference's list-append. */
  def withDuplicates(events: DataFrame, dupRate: Double = 0.02): DataFrame = {
    val bound = (dupRate * 10000).toInt
    events.unionAll(
      events.where(pmod(xxhash64(col("event_uuid"), lit(99)), lit(10000)) < bound))
  }

  /** Kinesis-enveloped record stream: one JSON record string per event
    * (reference: producer.py:142-167). */
  def enveloped(events: DataFrame): DataFrame =
    events.select(EventOps.encodeEnvelope(
      struct(col("event_uuid"), col("created_at"), col("event_name"),
        col("event_specifics")),
      col("event_uuid")).as("record"))
}
