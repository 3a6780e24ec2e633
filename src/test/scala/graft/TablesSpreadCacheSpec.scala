package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pins the footer-probe caching contract of Tables.spread: the
  * row-group verdict for a file is read ONCE per JVM, so the second
  * build of the same query pays zero footer reads (the probe gate runs
  * at every query build — at a 109-query registry an uncached probe is
  * a per-build FS tax). Runs in the sequential forked test JVM, so the
  * global counter is race-free.
  */
class TablesSpreadCacheSpec extends SparkSpecBase {

  test("second spread of the same file-backed frame is footer-read-free") {
    // a private single-row-group parquet no other spec touches, so the
    // first probe is provably UNcached
    import spark.implicits._
    val path = tmpDir("spread_cache") + "/t"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(path)
    val frame = () => spark.read.parquet(path).select(col("id") * 2)

    val before = Tables.footerReads.get()
    Tables.spread(frame())
    val afterFirst = Tables.footerReads.get()
    assert(afterFirst > before,
      "first probe of a fresh single-file table must read its footer")
    Tables.spread(frame())
    Tables.spread(frame())
    assert(Tables.footerReads.get() === afterFirst,
      "re-building the same query re-read parquet footers")
  }

  test("spread still repartitions an under-parallel scan after the " +
    "verdict is cached") {
    import spark.implicits._
    val path = tmpDir("spread_cache2") + "/t"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(path)
    val target = spark.sparkContext.defaultParallelism
    def parts(): Int =
      Tables.spread(spark.read.parquet(path).select(col("id") * 2))
        .rdd.getNumPartitions
    assert(parts() === target, "uncached verdict must widen the scan")
    assert(parts() === target, "cached verdict must widen the scan too")
  }

  test("events ts-unit footer probe is cached per path") {
    Tables.events(spark, sf0001).count()
    val after = Tables.footerReads.get()
    Tables.events(spark, sf0001).count()
    assert(Tables.footerReads.get() === after,
      "second events build re-probed the ts footer")
  }
}
