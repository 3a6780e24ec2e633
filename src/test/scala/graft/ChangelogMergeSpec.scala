package graft

import graft.ops.ChangelogMerge
import org.apache.spark.sql.functions._

class ChangelogMergeSpec extends SparkSpecBase {
  import ChangelogMerge.{OpCol, SeqCol}

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "v", "n")
  }

  private def log(rows: (Long, String, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "v", "n", SeqCol, OpCol)
  }

  test("untouched keys keep their base row, updates win by seq") {
    val out = ChangelogMerge.merge(base,
      log((1L, "a1", 11L, 1L, "u"), (1L, "a2", 12L, 2L, "u"),
        (2L, "b1", 21L, 1L, "u")),
      Seq("k")).orderBy("k")
      .select("k", "v", "n", SeqCol).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, "a2", 12L, 2L), (2L, "b1", 21L, 1L),
        (3L, "c", 30L, 0L), (4L, "d", 40L, 0L)))
  }

  test("a winning tombstone drops the key; a later upsert revives it") {
    val out = ChangelogMerge.merge(base,
      log((2L, "b", 20L, 1L, "d"), // deleted, stays dead
        (3L, "c", 30L, 1L, "d"), (3L, "c3", 33L, 2L, "u")), // revived
      Seq("k")).orderBy("k").select("k", "v").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (3L, "c3"), (4L, "d")))
  }

  test("inserts of brand-new keys survive; merge is self-compacting") {
    val m1 = ChangelogMerge.merge(base,
      log((9L, "i", 90L, 1L, "u"), (1L, "a1", 11L, 1L, "u")), Seq("k"))
    // re-merge the merged snapshot with the NEXT window: same operator.
    // A merged snapshot carries winner seqs > 0, so rebase them to 0
    // (storage drops the audit column; rebasing is what a writer does).
    val m2 = ChangelogMerge.merge(
      m1.drop(SeqCol),
      log((9L, "i2", 91L, 2L, "u"), (4L, "d", 40L, 2L, "d")), Seq("k"))
      .orderBy("k").select("k", "v", "n").collect()
    assert(m2.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a1", 11L), (2L, "b", 20L), (3L, "c", 30L), (9L, "i2", 91L)))
  }

  test("same-seq upsert+delete pair deterministically resolves to the upsert") {
    val out = ChangelogMerge.merge(base,
      log((1L, "a1", 11L, 1L, "u"), (1L, "a", 10L, 1L, "d")), Seq("k"))
      .where(col("k") === 1L).select("v").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a1"))
  }

  test("the merge plan is one shuffle: a single Exchange over the union") {
    val plan = ChangelogMerge.merge(base,
      log((1L, "a1", 11L, 1L, "u")), Seq("k"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
