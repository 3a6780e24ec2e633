package graft

import graft.sources.Tables

/** Source/sink format breadth: the same schema-bound events relation
  * roundtrips through CSV and ORC (parquet + NDJSON are exercised
  * everywhere else). */
class SourceFormatsSpec extends SparkSpecBase {

  test("events roundtrip through CSV (schema-bound read back)") {
    val dir = tmpDir("csv_rt")
    val ev = Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "event_type", "value",
        "CAST(ts AS STRING) AS ts_s")
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(ev.schema).option("header", "true").csv(dir)
    assert(back.count() === ev.count())
    assert(back.exceptAll(ev).isEmpty)
  }

  test("events roundtrip through ORC") {
    val dir = tmpDir("orc_rt")
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(ev.schema).orc(dir)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }
}
