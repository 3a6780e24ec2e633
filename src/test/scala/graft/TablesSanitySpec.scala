package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Tripwire suite for the driver-supplied testdata: one assertion per
  * table pinning the decoded schema and a plausible value range, so a
  * silently regenerated /root/testdata (new types, new units, new column
  * set) fails here in seconds instead of surfacing as wrong-but-plausible
  * oracle mismatches. Motivated by the round-9 incident where
  * events.parquet switched TIMESTAMP(NANOS)→TIMESTAMP(MICROS) and the
  * stale nanos decode silently collapsed 30 days of 2024 timestamps into
  * an 80-minute band of January 1970 (VERDICT r9 item 1).
  */
class TablesSanitySpec extends SparkSpecBase {

  test("events: ts decodes to TimestampType with years in [2020, 2030]") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(
      min(year(col("ts"))).as("y_min"), max(year(col("ts"))).as("y_max"),
      countDistinct(date_trunc("hour", col("ts"))).as("hours")).head()
    assert(r.getInt(0) >= 2020 && r.getInt(1) <= 2030,
      s"decoded ts years [${r.getInt(0)}, ${r.getInt(1)}] outside [2020, 2030] - " +
        "timestamp unit decode is likely wrong for the current testdata generation")
    // The corpus spans ~30 days; a unit mix-up collapses it to ~2 hours.
    assert(r.getLong(2) > 24, s"only ${r.getLong(2)} distinct hours - corpus span collapsed")
  }

  test("events: non-ts columns bind with expected types and sane ranges") {
    val ev = Tables.events(spark, sf0001)
    val types = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("event_id") === LongType)
    assert(types("user_id") === LongType)
    assert(types("event_type") === StringType)
    assert(types("value") === DoubleType)
    assert(types("props") === StringType)
    val r = ev.agg(
      min(col("event_id")), countDistinct(col("event_type")),
      sum(col("event_id").isNull.cast("int"))).head()
    assert(r.getLong(0) >= 0)
    assert(r.getLong(1) >= 2, "expected a multi-valued event_type dimension")
    assert(r.getLong(2) === 0, "event_id must be non-null")
  }

  test("documents: schema and text lengths are sane") {
    val d = Tables.documents(spark, sf0001)
    assert(d.schema("doc_id").dataType === LongType)
    assert(d.schema("text").dataType === StringType)
    assert(d.schema("lang").dataType === StringType)
    assert(d.schema("source").dataType === StringType)
    assert(d.schema("n_chars").dataType === LongType)
    val r = d.agg(
      sum((length(col("text")) =!= col("n_chars")).cast("int")),
      countDistinct(col("lang")), count(lit(1))).head()
    assert(r.getLong(0) === 0, "n_chars must equal length(text)")
    assert(r.getLong(1) >= 2 && r.getLong(2) > 0)
  }

  test("embeddings: fixed-dim float vectors with finite values") {
    val e = Tables.embeddings(spark, sf0001)
    assert(e.schema("vec_id").dataType === LongType)
    assert(e.schema("embedding").dataType === ArrayType(FloatType))
    assert(e.schema("label").dataType === IntegerType)
    val dims = e.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length === 1 && dims.head > 0, s"expected one fixed dim, got ${dims.toSeq}")
    val bad = e.filter(exists(col("embedding"), v => isnan(v) || v.isNull)).count()
    assert(bad === 0, s"$bad vectors contain NaN/null components")
  }

  test("tpch dims: key columns present, non-null, joinable") {
    val checks = Seq(
      ("lineitem", "l_orderkey"), ("orders", "o_orderkey"),
      ("customer", "c_custkey"), ("supplier", "s_suppkey"),
      ("part", "p_partkey"), ("nation", "n_nationkey"), ("region", "r_regionkey"))
    checks.foreach { case (t, key) =>
      val df = Tables.table(spark, sf0001, t)
      assert(df.columns.contains(key), s"$t missing $key")
      val r = df.agg(count(lit(1)), sum(col(key).isNull.cast("int"))).head()
      assert(r.getLong(0) > 0, s"$t is empty")
      assert(r.getLong(1) === 0, s"$t has null $key")
    }
    // Referential spot-check: every order's customer exists.
    val orphans = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans === 0, s"$orphans orders reference missing customers")
  }
}
