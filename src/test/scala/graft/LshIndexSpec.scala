package graft

import org.apache.spark.sql.functions._
import graft.ops.LshIndex

class LshIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val base = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat", // near-dup of 1
    3L -> "completely different text about spark engines here",
    4L -> "a b", // single shingle
    5L -> "x")   // shingle-less (1 word < n=2): must never pair

  test("probeAndAppend finds new-vs-old and new-vs-new pairs, not old-vs-old") {
    val idx = tmpDir("lsh_idx")
    LshIndex.build(base, idx)
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog today", // ~ 1 and 2
      11L -> "totally unrelated fresh content never seen before",
      12L -> "totally unrelated fresh content never seen before!") // ~ 11
    val pairs = LshIndex.probeAndAppend(spark, idx, batch)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // every pair has a batch member; the (1,2) old-vs-old pair is absent
    assert(pairs.forall { case (a, b) => a >= 10L || b >= 10L })
    assert(pairs.contains((11L, 12L)), s"new-vs-new missing from $pairs")
    assert(pairs.exists { case (a, b) => a < 10L && b >= 10L },
      s"new-vs-old missing from $pairs")
    assert(!pairs.contains((1L, 2L)))
  }

  test("after append the index equals a fresh full build (bands and sigs)") {
    val idx = tmpDir("lsh_idx_inc")
    val full = tmpDir("lsh_idx_full")
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog today",
      11L -> "totally unrelated fresh content never seen before")
    LshIndex.build(base, idx)
    LshIndex.probeAndAppend(spark, idx, batch).collect()
    LshIndex.build(base.unionByName(batch), full)
    def bands(p: String) = spark.read.parquet(s"$p/bands")
      .as[(Int, String, Long)].collect().toSet
    def sigs(p: String) = spark.read.parquet(s"$p/sigs")
      .select($"doc_id", array_sort($"sh"))
      .as[(Long, Seq[String])].collect().toSet
    assert(bands(idx) == bands(full))
    assert(sigs(idx) == sigs(full))
  }

  test("successive batches see earlier appends: a dup of batch-1 lands as " +
    "a pair in batch-2") {
    val idx = tmpDir("lsh_idx_chain")
    LshIndex.build(base, idx)
    val b1 = docs(20L -> "incremental corpora accumulate documents batch by batch")
    assert(LshIndex.probeAndAppend(spark, idx, b1).count() == 0)
    val b2 = docs(21L -> "incremental corpora accumulate documents batch by batch!")
    val pairs = LshIndex.probeAndAppend(spark, idx, b2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((20L, 21L)), s"got $pairs")
  }
}
