package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
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
    // pk is the derived hash-bucket partition column — same function on
    // both sides, so comparing it too pins append-lands-in-right-bucket
    def bands(p: String) = spark.read.parquet(s"$p/bands")
      .select($"band", $"key", $"doc_id", $"pk")
      .as[(Int, String, Long, Int)].collect().toSet
    def sigs(p: String) = spark.read.parquet(s"$p/sigs")
      .select($"doc_id", array_sort($"sh"), $"pk")
      .as[(Long, Seq[String], Int)].collect().toSet
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

  // ---- file-level pruning pins -------------------------------------

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && f.length > 0) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec        => fileScans(q.plan)
    case s: FileSourceScanExec    => Seq(s)
    case other => other.children.flatMap(fileScans)
  }

  /** Execute `df` (one of the probe's pruned index-scan frames) and
    * return (files actually read, partition filters present). */
  private def scanned(df: DataFrame): (Long, Boolean) = {
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
    (scans.map(_.metrics("numFiles").value).sum,
      scans.forall(_.partitionFilters.nonEmpty))
  }

  test("probe reads only the touched partition directories of both index " +
    "tables — scanned file count strictly below the on-disk file count") {
    val idx = tmpDir("lsh_idx_prune")
    // 200 docs so every hash-bucket directory of the index is populated
    val corpus = (1L to 200L).map(i =>
      (i, s"document $i about topic ${i % 7} alpha beta gamma delta ${i * 31}"))
      .toDF("doc_id", "text")
    LshIndex.build(corpus, idx)
    val allBands = parquetFiles(s"$idx/bands").size.toLong
    val allSigs = parquetFiles(s"$idx/sigs").size.toLong
    assert(allBands >= 16, s"index too few band files ($allBands) to prove pruning")
    assert(allSigs >= 16, s"index too few sig files ($allSigs) to prove pruning")
    // batch doc = exact text of corpus doc 3 → identical signature, all
    // band keys collide → candidates guaranteed, sigs scan non-trivial
    val batch = docs(
      1000L -> "document 3 about topic 3 alpha beta gamma delta 93")
    val probe = LshIndex.probePlan(spark, idx, batch)
    val (bandFilesRead, bandPruned) = scanned(probe.bandScan)
    val (sigFilesRead, sigPruned) = scanned(probe.sigScan)
    assert(bandPruned, "bands scan has no partition filters")
    assert(sigPruned, "sigs scan has no partition filters")
    assert(bandFilesRead < allBands,
      s"bands probe read $bandFilesRead of $allBands files — no file pruning")
    assert(sigFilesRead > 0 && sigFilesRead < allSigs,
      s"sigs probe read $sigFilesRead of $allSigs files — no file pruning")
    // and the probe still finds the planted exact duplicate
    val pairs = probe.pairs.select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1000L)), s"planted dup missing from $pairs")
    probe.release()
  }

  test("probe adopts the persisted layout: probing a 16-partition index " +
    "under the default Config still prunes under the build modulus and " +
    "appends into the right directories") {
    val idx = tmpDir("lsh_idx_meta")
    val layout = LshIndex.Config(indexPartitions = 16, bandFiles = 4, sigFiles = 4)
    LshIndex.build(base, idx, layout)
    val batch = docs(10L -> "the quick brown fox jumps over the lazy dog today")
    // default Config carries indexPartitions=32 — the probe must ignore it
    val pairs = LshIndex.probeAndAppend(spark, idx, batch)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.exists(_._2 == 10L), s"planted near-dup missing from $pairs")
    // the append landed under the BUILD modulus: index ≡ a fresh
    // 16-partition rebuild including the derived pk column
    val full = tmpDir("lsh_idx_meta_full")
    LshIndex.build(base.unionByName(batch), full, layout)
    def bands(p: String) = spark.read.parquet(s"$p/bands")
      .select($"band", $"key", $"doc_id", $"pk")
      .as[(Int, String, Long, Int)].collect().toSet
    def sigs(p: String) = spark.read.parquet(s"$p/sigs")
      .select($"doc_id", array_sort($"sh"), $"pk")
      .as[(Long, Seq[String], Int)].collect().toSet
    assert(bands(idx) == bands(full))
    assert(sigs(idx) == sigs(full))
  }

  test("sizedConfig scales the layout to the corpus between its floor " +
    "and its cap") {
    assert(LshIndex.sizedConfig(0).indexPartitions == 4)
    assert(LshIndex.sizedConfig(5000).indexPartitions == 4)      // toy floor
    assert(LshIndex.sizedConfig(2000L * 256).indexPartitions == 256)
    assert(LshIndex.sizedConfig(Long.MaxValue).indexPartitions == 4096) // cap
    val c = LshIndex.sizedConfig(2000L * 256)
    assert(c.bandFiles == 64 && c.sigFiles == 64)
    // signature knobs pass through untouched
    val b = LshIndex.Config(shingleN = 3, k = 12)
    assert(LshIndex.sizedConfig(10, b).shingleN == 3)
    assert(LshIndex.sizedConfig(10, b).k == 12)
  }

  test("buildSized indexes a toy corpus at the 4-directory floor and " +
    "probes find pairs with no caller-side layout knowledge") {
    val idx = tmpDir("lsh_idx_sized")
    val chosen = LshIndex.buildSized(base, idx)
    assert(chosen.indexPartitions == 4)
    val pkDirs = Option(new java.io.File(s"$idx/bands").listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("pk="))
    assert(pkDirs.nonEmpty && pkDirs.length <= 4, s"got ${pkDirs.length} pk dirs")
    val batch = docs(10L -> "the quick brown fox jumps over the lazy dog today")
    val pairs = LshIndex.probeAndAppend(spark, idx, batch)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.exists(_._2 == 10L), s"planted near-dup missing from $pairs")
  }

  test("probe fails loudly when the index metadata file is absent") {
    val idx = tmpDir("lsh_idx_nometa")
    LshIndex.build(base, idx)
    assert(new java.io.File(s"$idx/_index_meta").delete())
    val batch = docs(10L -> "anything at all")
    intercept[IllegalStateException] {
      LshIndex.probeAndAppend(spark, idx, batch)
    }
  }
}
