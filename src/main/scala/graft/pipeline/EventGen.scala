package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Deterministic, distributed generator of reference-shaped events
  * (SURVEY.md §2 row 1; reference: data_creation/producer.py:23-110 +
  * data_creation/event_config.yml:1-355).
  *
  * The reference draws a type uniformly from 11 categories, then a subtype
  * uniformly within the category (producer.py:104-110), and fills a
  * per-subtype field set with Faker payloads. We reproduce the full
  * taxonomy — all 36 subtypes with their exact per-subtype field sets —
  * deterministically from `spark.range` + hash-derived choices (seeded,
  * reproducible, no driver-side loops: a billion events is one narrow map
  * stage).
  *
  * Reference quirks preserved on purpose:
  *  - eight config field TYPES (`account_field`, `subscription_id`,
  *    `subscription_type`, `purchase_source`, `reason_cancelled`,
  *    `order_id`, `payment_method`, `game_id`) have NO generator branch in
  *    producer.py:39-85, so their fields are silently absent from every
  *    generated payload — the configured 38-key union collapses to the
  *    30 keys EventModel models;
  *  - both `e-mail` (account:email_confirmed, event_config.yml:17) and
  *    `email` (account:confirmation_bounced, event_config.yml:24) appear
  *    in DATA, not just in the schema;
  *  - `language_id` is the literal string "not_applicable" for the
  *    account/language/subscription/payment/referral categories;
  *  - the two 3-part payment names (`payment:order:completed/failed`).
  *
  * Sparse payloads: absent fields are NULL in the struct, and `to_json`
  * (ignoreNullFields default) omits them from the wire JSON — the same
  * sparse dict the reference emits.
  */
object EventGen {

  /** Field types producer.py generates values for; the other eight config
    * types fall through generate_fields' if/elif silently (the skip
    * quirk). */
  private val skippedTypes = Set("account_field", "subscription_id",
    "subscription_type", "purchase_source", "reason_cancelled", "order_id",
    "payment_method", "game_id")

  /** The full 11-category × 36-subtype taxonomy with per-subtype
    * (field → field_type) sets, transcribed from event_config.yml. */
  val taxonomy: Seq[(String, Seq[(String, String)])] = {
    val na = "language_id" -> "not_applicable"
    val lang = "language_id" -> "language_id"
    val dev = "device" -> "device"
    val loc = "user_location" -> "location"
    val sess = "session_id" -> "session_id"
    val acct = "account_id" -> "account_id"
    val user = "user_id" -> "user_id"
    def lesson(extra: (String, String)*) =
      Seq(lang, dev, "lesson_id" -> "lesson_id", user,
        "duration" -> "duration", sess, loc) ++ extra
    def exercise(withScore: Boolean, withSession: Boolean) =
      Seq(lang, dev, "exercise_id" -> "exercise_id", user,
        "duration" -> "duration") ++
        (if (withScore) Seq("score" -> "score") else Nil) ++
        (if (withSession) Seq(sess) else Nil) :+ loc
    def subscription(extra: (String, String)*) =
      Seq(na, dev, loc, "subscription_id" -> "subscription_id",
        "subscription_type" -> "subscription_type", user, sess) ++ extra
    def referral = Seq(na, dev, loc, "referree_id" -> "user_id",
      "campaign_id" -> "campaign_id", sess)
    Seq(
      "account:created" -> Seq(na, dev, acct, sess,
        "registration_method" -> "registration_method", loc),
      "account:email_confirmed" -> Seq(na, dev, acct, sess, loc,
        "e-mail" -> "email"),
      "account:confirmation_bounced" -> Seq(na, dev, acct, sess,
        "email" -> "email", loc),
      "account:updated" -> Seq(na, dev, acct, sess,
        "updated_fields" -> "account_field", loc),
      "account:deleted" -> Seq(na, dev, acct, sess,
        "days_active" -> "number", loc),
      "account:login" -> Seq(na, dev, acct, sess,
        "last_login_time" -> "timestamp", loc),
      "account:logout" -> Seq(na, dev, acct, sess, loc),
      "account:password-reset" -> Seq(na, dev, acct, sess, loc),
      "session:created" -> Seq(lang, dev, sess, user,
        "start_time" -> "timestamp", loc),
      "session:resumed" -> Seq(lang, dev, sess, user,
        "resume_time" -> "timestamp", loc),
      "session:ended" -> Seq(lang, dev, sess, user,
        "end_time" -> "timestamp", loc),
      "language:selected" -> Seq(na, dev,
        "selected_language_id" -> "language_id", sess, loc),
      "language:changed" -> Seq(na, dev,
        "selected_language_id" -> "language_id", sess,
        "un_selected_language_id" -> "language_id", loc),
      "lesson:started" -> lesson(),
      "lesson:completed" -> lesson(),
      "lesson:paused" -> lesson(),
      "lesson:resumed" -> lesson(),
      "lesson:skipped" -> lesson(),
      "exercise:attempted" -> exercise(withScore = true, withSession = true),
      "exercise:completed" -> exercise(withScore = true, withSession = true),
      "exercise:failed" -> exercise(withScore = true, withSession = true),
      "exercise:hint-requested" -> exercise(withScore = false, withSession = false),
      "exercise:skipped" -> exercise(withScore = true, withSession = true),
      "subscription:purchased" -> subscription(
        "purchase_source" -> "purchase_source", "days_into_trial" -> "number"),
      "subscription:cancelled" -> subscription(
        "reason_cancelled" -> "reason_cancelled", "days_active" -> "number"),
      "subscription:renewed" -> subscription("days_active" -> "number"),
      "payment:order:completed" -> Seq(na, dev, loc, "order_id" -> "order_id",
        "amount" -> "amount", "currency" -> "currency",
        "payment_method" -> "payment_method", sess),
      "payment:order:failed" -> Seq(na, dev, loc, "amount" -> "amount",
        "order_id" -> "order_id", "currency" -> "currency",
        "failcount" -> "number_1to10", "payment_method" -> "payment_method",
        sess),
      "feedback:provided" -> Seq(lang, dev, loc,
        "exercise_id" -> "exercise_id", "feedback" -> "sentence", user, sess),
      "rating:provided" -> Seq(lang, dev, loc, "exercise_id" -> "exercise_id",
        "rating" -> "rating", user, sess),
      "game:started" -> Seq(dev, loc, "game_id" -> "game_id", lang,
        "difficulty" -> "difficulty", "score" -> "score", sess),
      "game:completed" -> Seq(dev, loc, "game_id" -> "game_id",
        "duration" -> "duration", "attempts" -> "number", lang,
        "difficulty" -> "difficulty", "score" -> "score", sess),
      "game:resumed" -> Seq(dev, loc, "game_id" -> "game_id",
        "attempts" -> "number", lang, "difficulty" -> "difficulty",
        "score" -> "score", sess),
      "referral:sent" -> referral,
      "referral:clicked" -> referral,
      "referral:accepted" -> referral)
  }

  /** All 36 event names (2 of them 3-part, the payment pair). */
  val eventNames: Seq[String] = taxonomy.map(_._1)

  private val categories: Seq[String] = eventNames.map(_.split(":")(0)).distinct

  // ------------------------------------------------------- value generators

  private def choice(id: Column, salt: String, opts: Seq[String]): Column =
    element_at(array(opts.map(lit): _*),
      pmod(xxhash64(id, lit(salt)), lit(opts.size)).cast("int") + 1)

  private def intIn(id: Column, salt: String, lo: Int, hi: Int): Column =
    (lit(lo) + pmod(xxhash64(id, lit(salt)), lit(hi - lo + 1))).cast("long")

  /** uuid4-shaped deterministic id. `card` bounds cardinality (sessions /
    * users recur — the property sessionization and join tests lean on). */
  private def uuidish(id: Column, salt: String, card: Int): Column = {
    val m = md5(concat(lit(salt), pmod(xxhash64(id, lit(salt)), lit(card))))
    concat_ws("-", substring(m, 1, 8), substring(m, 9, 4), substring(m, 13, 4),
      substring(m, 17, 4), substring(m, 21, 12))
  }

  private def isoTimestamp(id: Column, salt: String): Column =
    date_format(timestamp_seconds(lit(1700000000L) +
      pmod(xxhash64(id, lit(salt)), lit(10000000L))), "yyyy-MM-dd'T'HH:mm:ss")

  private val langCodes = Seq("de", "it", "es", "fr", "en", "pl", "pt", "ru", "tr", "zh")
  private val cities = Seq("Berlin", "Paris", "London", "Warsaw", "Lisbon",
    "Zurich", "Vienna", "Rome", "Madrid", "Hamburg", "Lyon", "Porto")
  private val countries = Seq("Germany", "France", "United Kingdom", "Poland",
    "Portugal", "Switzerland", "Austria", "Italy", "Spain")

  /** producer.py:39-85's field_type → value branches, deterministically.
    * Returns None for the eight branch-less types (the skip quirk). */
  private def genValue(fieldType: String, fieldName: String, id: Column): Option[Column] = {
    val s = fieldName // salt: decorrelates same-typed fields
    fieldType match {
      case "not_applicable" => Some(lit("not_applicable"))
      case "account_id" => Some(uuidish(id, s, 2000))
      case "session_id" => Some(uuidish(id, s, 5000))
      case "user_id" => Some(uuidish(id, s, 1000))
      case "exercise_id" => Some(uuidish(id, s, 300))
      case "lesson_id" => Some(uuidish(id, s, 200))
      case "currency" => Some(choice(id, s, Seq("EUR", "USD", "GBP", "CHF", "PLN")))
      case "registration_method" =>
        Some(choice(id, s, Seq("Google", "Microsoft", "Facebook", "Apple")))
      case "number" => Some(intIn(id, s, 1, 100))
      case "number_1to10" => Some(intIn(id, s, 1, 10))
      case "timestamp" => Some(isoTimestamp(id, s))
      case "device" => Some(choice(id, s, Seq("Android", "iOS", "web")))
      case "language_id" => Some(concat(lit("lang_"), choice(id, s, langCodes)))
      case "duration" => Some(intIn(id, s, 1, 120))
      case "email" => Some(concat(lit("user"), pmod(xxhash64(id, lit(s)), lit(100000)),
        lit("@example."), choice(id, s + ".tld", Seq("com", "de", "fr", "org"))))
      case "sentence" => Some(concat_ws(" ", choice(id, s + ".1", Seq("Great", "Confusing", "Short", "Helpful")),
        choice(id, s + ".2", Seq("lesson", "exercise", "session", "hint")),
        choice(id, s + ".3", Seq("overall.", "today.", "again.", "indeed."))))
      case "rating" => Some(intIn(id, s, 1, 5))
      case "score" => Some(intIn(id, s, 0, 100))
      case "difficulty" => Some(choice(id, s, Seq("Easy", "Medium", "Hard")))
      case "amount" => Some(intIn(id, s, 0, 99)) // fake.random_number(digits=2)
      case "location" => Some(concat_ws(", ", choice(id, s + ".city", cities),
        choice(id, s + ".country", countries)))
      case "campaign_id" => Some(concat(lit("camp_"), intIn(id, s, 1000, 9999)))
      case t if skippedTypes(t) => None // producer.py has no branch → absent
      case t => throw new IllegalArgumentException(s"unknown field type $t")
    }
  }

  // ---------------------------------------------------------------- events

  /** `n` deterministic events starting at epoch-seconds `t0`, ~`rate`
    * events/second (the reference's design point is 278/s,
    * run_toy_example.py:23). */
  def events(spark: SparkSession, n: Long, t0: Double = 1.71e9,
      rate: Double = 278.0): DataFrame =
    eventsFromIds(spark.range(n).toDF(), t0, rate)

  /** Event projection over ANY `id`-column relation — the same expression
    * set serves `spark.range` (batch tests) and the streaming `rate`
    * source (`value` renamed to `id`): one narrow map stage either way.
    * `keepId` appends the source `id` (for batch assignment downstream)
    * without changing the default schema. */
  def eventsFromIds(ids: DataFrame, t0: Double = 1.71e9,
      rate: Double = 278.0, keepId: Boolean = false): DataFrame = {
    val id = col("id")
    // Two-level uniform pick, matching producer.py:104-110: category
    // uniform over 11, then subtype uniform within the category — NOT
    // uniform over the 36 leaves.
    val catSizes = categories.map(c => eventNames.count(_.startsWith(c + ":")))
    val catOffsets = catSizes.scanLeft(0)(_ + _).init
    val catPick = pmod(xxhash64(id, lit(42)), lit(categories.size)).cast("int")
    val subPick = pmod(xxhash64(id, lit(43)),
      element_at(array(catSizes.map(lit): _*), catPick + 1)).cast("int")
    val pick = element_at(array(catOffsets.map(lit): _*), catPick + 1) + subPick

    val nameArr = array(eventNames.map(lit): _*)
    // One column per union key: a when-chain over the subtypes that carry
    // the key (grouped by field type), NULL elsewhere → to_json omits it.
    val unionKeys = graft.model.EventModel.eventSpecificsSchema.fields.toSeq
    val specifics = struct(unionKeys.map { sf =>
      val byType: Seq[(String, Seq[Int])] = taxonomy.zipWithIndex
        .flatMap { case ((_, fields), i) =>
          fields.collect { case (n2, t) if n2 == sf.name => (t, i) } }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
      val gens = byType.flatMap { case (t, idxs) =>
        genValue(t, sf.name, id).map(v => (idxs, v)) }
      gens.foldRight(lit(null).cast(sf.dataType): Column) { case ((idxs, v), acc) =>
        when(pick.isin(idxs: _*), v).otherwise(acc)
      }.as(sf.name)
    }: _*)

    val base = Seq(
      md5(concat(lit("uuid-"), id)).as("event_uuid"),
      (lit(t0) + id.cast("double") / rate).as("created_at"),
      element_at(nameArr, pick + 1).as("event_name"),
      specifics.as("event_specifics"))
    ids.select((if (keepId) base :+ id.as("id") else base): _*)
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

  /** The producer's actual wire unit: `{"Records": [...]}` batches of
    * `batchSize` consecutive enveloped records, where — deterministically
    * standing in for producer.py:162-166's `random() < 0.05` — 5% of
    * batches append 1-10 duplicate records copied from the batch's head
    * (the reference copies random members; a fixed slice keeps the batch
    * content reproducible). One JSON object per row in `batch`. */
  def kinesisBatches(spark: SparkSession, n: Long, batchSize: Int = 100,
      t0: Double = 1.71e9, rate: Double = 278.0): DataFrame = {
    val ev = eventsFromIds(spark.range(n).toDF(), t0, rate, keepId = true)
    val rec = ev.select(
      (col("id") / batchSize).cast("long").as("batch_id"), col("id"),
      EventOps.encodeEnvelope(
        struct(col("event_uuid"), col("created_at"), col("event_name"),
          col("event_specifics")), col("event_uuid")).as("record"))
    // collect_list order is nondeterministic → sort (id, record) structs
    // by id to pin batch content.
    val batches = rec.groupBy(col("batch_id"))
      .agg(sort_array(collect_list(struct(col("id"), col("record")))).as("rs"))
      .select(col("batch_id"),
        transform(col("rs"), r => r.getField("record")).as("records"))
    val isDup = pmod(xxhash64(col("batch_id"), lit(101)), lit(100)) < 5
    val nDups = (pmod(xxhash64(col("batch_id"), lit(103)), lit(10)) + 1).cast("int")
    batches
      .withColumn("records", when(isDup,
        concat(col("records"), slice(col("records"), lit(1), nDups)))
        .otherwise(col("records")))
      .select(col("batch_id"),
        to_json(struct(col("records").as("Records"))).as("batch"))
  }
}
