package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench sweep-order contract: the scratch-staging lifecycle queries run
  * LAST (Bench sorts on membership in ExtQueries.lifecycleNames), so on
  * a disk-backed fallback scratch root their async writeback can never
  * tax a non-lifecycle query's timing. A name drifting out of the
  * registry would silently un-tag the query — this spec makes the set a
  * checked subset.
  */
class BenchOrderSpec extends AnyFunSuite {

  test("every lifecycleNames entry is a declared query") {
    val declared = SparkEntry.queries.keySet
    val stray = graft.queries.ExtQueries.lifecycleNames -- declared
    assert(stray.isEmpty, s"lifecycleNames not in the registry: $stray")
  }

  test("every scratch-staging query family is tagged") {
    // the index/stream-lifecycle prefixes that stage under Scratch.tempDir
    val staging = Set("q61_", "q62_", "q63_", "q65_", "q92_", "q97_",
      "q100_", "q101_", "q105_", "q106_", "q109_", "q112_", "q116_", "q132_",
      "q135_", "q138_", "q150_", "q165_", "q166_", "q167_", "q172_",
      "q173_", "q174_", "q175_", "q176_", "q177_", "q181_", "q185_",
      "q187_", "q188_", "q189_", "q191_")
    val declared = SparkEntry.queries.keySet
    val expected = declared.filter(n => staging.exists(n.startsWith))
    assert(expected === graft.queries.ExtQueries.lifecycleNames,
      "lifecycleNames out of sync with the scratch-staging queries")
  }

  test("lifecycle queries sort after every non-lifecycle query under the " +
    "bench ordering") {
    val lifecycle = graft.queries.ExtQueries.lifecycleNames
    val ordered = SparkEntry.queries.toSeq
      .sortBy { case (n, _) => (lifecycle.contains(n), n) }.map(_._1)
    val firstLifecycle = ordered.indexWhere(lifecycle.contains)
    assert(firstLifecycle >= 0)
    assert(ordered.drop(firstLifecycle).forall(lifecycle.contains),
      "a non-lifecycle query sorts after a lifecycle query")
  }
}
