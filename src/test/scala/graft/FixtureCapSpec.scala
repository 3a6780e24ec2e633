package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the streaming-fixture collect bound: every MemoryStream harness
  * feed (q92/q100/q105/q106/q112/q132) routes through
  * `ExtQueryHelpers.fixtureSlice`, which must return the FULL slice
  * below `StreamFixtureCap` (oracle parity depends on it) and throw
  * loudly — never silently truncate — above it. The limit inside the
  * helper also bounds what the collect can ever pull driver-side, so an
  * over-cap declared SF fails with this message instead of an OOM. */
class FixtureCapSpec extends SparkSpecBase with ExtQueryHelpers {

  test("fixtureSlice returns the full slice when under the cap") {
    import spark.implicits._
    val got = fixtureSlice(spark.range(0, 1000).as[Long]).sorted
    assert(got.toSeq == (0L until 1000L))
  }

  test("fixtureSlice throws loudly (no silent truncation) over the cap") {
    import spark.implicits._
    val over = spark.range(0, StreamFixtureCap + 10L).as[Long]
    val e = intercept[IllegalArgumentException](fixtureSlice(over))
    assert(e.getMessage.contains("StreamFixtureCap"))
  }

  test("declared streaming fixture slices sit far under the cap") {
    // The harness slices are the doc_id%4==0 / vec_id%4==0 quarters of
    // their tables — a declared SF would have to grow the corpus 400x
    // past the largest swept decade before the cap binds.
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val slice = docs.where(pmod(col("doc_id"), lit(4)) === 0).count()
    assert(slice > 0 && slice < StreamFixtureCap)
  }
}
