package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot generator of the cross-generation index-compatibility
  * fixture: builds each persisted index family from
  * [[IndexFixtureData]]'s inputs, probes it ONCE with the fixed batch,
  * and commits BOTH the index directories and the probe outputs under
  * `src/test/resources/index_fixture/`. Run once per layout era (round
  * 13 wrote the current one); later rounds must NOT re-run it casually
  * — [[IndexCompatSpec]] reading an index written by an EARLIER round's
  * code is the whole point. Re-generate only on a deliberate,
  * documented layout migration.
  *
  *   sbt "Test/runMain graft.IndexFixtureGen"
  */
object IndexFixtureGen {
  def main(args: Array[String]): Unit = {
    val out = new java.io.File(
      if (args.nonEmpty) args(0) else "src/test/resources/index_fixture")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def save(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")

    val docs = IndexFixtureData.baseDocs(spark)
    val vecs = IndexFixtureData.baseVecs(spark)
    val b16 = IndexFixtureData.base16

    graft.ops.LshIndex.buildSized(docs, s"$out/lsh")
    save(graft.ops.LshIndex.probeAndAppend(spark, s"$out/lsh",
      IndexFixtureData.batchDocs(spark), batchId = Some(0L)), "expected_lsh")

    graft.ops.SimHashIndex.build(docs, s"$out/simhash")
    save(graft.ops.SimHashIndex.probeAndAppend(spark, s"$out/simhash",
      IndexFixtureData.batchDocs(spark), batchId = Some(0L)), "expected_simhash")

    graft.ops.IvfIndex.buildCorpus(vecs, s"$out/ivf", b16, files = 2)
    save(graft.ops.IvfIndex.probeAndAppend(spark, s"$out/ivf",
      IndexFixtureData.batchVecs(spark), b16, batchId = Some(0L)), "expected_ivf")

    graft.ops.PqIndex.buildCodes(vecs, s"$out/pq", b16, files = 2)
    save(graft.ops.PqIndex.probeAndAppend(spark, s"$out/pq",
      IndexFixtureData.batchVecs(spark), b16, batchId = Some(0L)), "expected_pq")

    println(s"[fixture] written to $out")
    spark.stop()
  }
}
