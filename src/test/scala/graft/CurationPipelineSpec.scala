package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CurationPipeline
import graft.sources.Tables

class CurationPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("full curation funnel: exact dups, low-quality, and near-dups " +
    "drop in their own stages; tokens accounted") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    // inject: an exact dup (different id), a trivial low-quality doc, and
    // a near-dup (one word changed in a long doc)
    val base = docs.where($"doc_id" === 1).select($"text").as[String].head()
    val nearDup = base.split(" ").toSeq.updated(0, "zzz").mkString(" ")
    val injected = docs.unionByName(Seq(
      (900001L, base),          // exact dup of doc 1
      (900002L, "tiny doc"),    // fails minWords
      (900003L, nearDup)        // near-dup of doc 1
    ).toDF("doc_id", "text"))

    val (curated, report) = CurationPipeline.curate(injected)
    val r = report.head()
    val input = r.getAs[Long]("input_docs")
    assert(input === docs.count() + 3)
    assert(r.getAs[Long]("after_exact_dedup") === input - 1) // exact dup gone
    assert(r.getAs[Long]("after_quality") <= input - 2)      // tiny doc gone
    val survivors = curated.select("doc_id").as[Long].collect().toSet
    assert(!survivors.contains(900001L), "exact dup must drop")
    assert(!survivors.contains(900002L), "low-quality must drop")
    assert(!survivors.contains(900003L), "near-dup must drop (higher id)")
    assert(survivors.contains(1L), "original survives every stage")
    assert(r.getAs[Long]("total_ws_tokens") > 0)
  }

  test("maxBucket knob: the default cap keeps a mass-templated near-dup " +
    "cluster (documented trade); maxBucket=None dedups it") {
    // 80 near-identical long docs (> DefaultMaxBucket=64 per LSH bucket)
    // plus distinct filler: with the cap their bucket is dropped from
    // candidate generation, so ALL survive; uncapped, they dedup to one.
    val words = (0 until 40).map(i => s"word$i").mkString(" ")
    val cluster = (0 until 80).map(i => (1000L + i, s"$words tail$i"))
    val filler = (0 until 20).map(i =>
      (2000L + i, (0 until 40).map(j => s"doc$i-w$j").mkString(" ")))
    val docs = (cluster ++ filler).toDF("doc_id", "text")
    val cfg = CurationPipeline.Config(jaccardThreshold = 0.5)

    val capped = CurationPipeline.nearDedup(docs, cfg)
    assert(capped.count() === 100,
      "capped: the hot cluster's bucket is pruned, every doc survives")

    val uncapped = CurationPipeline.nearDedup(docs, cfg.copy(maxBucket = None))
    val survivors = uncapped.select("doc_id").as[Long].collect().toSet
    assert(survivors.count(_ >= 2000L) === 20, "filler untouched")
    assert(survivors.count(_ < 2000L) === 1,
      s"uncapped: cluster must collapse to its first doc, got ${survivors.count(_ < 2000L)}")
  }

  test("curation is idempotent: curating curated output drops nothing") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val (curated, _) = CurationPipeline.curate(docs)
    val n1 = curated.count()
    val (again, _) = CurationPipeline.curate(curated.select($"doc_id", $"text"))
    assert(again.count() === n1)
  }
}
