package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("batched stub decode: every record decoded once, metadata " +
    "matches the deterministic formulas") {
    val docs = Tables.documents(spark, sf0001)
    val media = Multimodal.asMedia(docs)
    val meta = Multimodal.decodeBatched(spark, media, batchSize = 64)
    assert(meta.count() === docs.count())
    val one = meta.where($"doc_id" === 0).head()
    val nChars = docs.where($"doc_id" === 0).select("n_chars").as[Long].head()
    assert(one.n_bytes === nChars) // ascii corpus: bytes == chars
    assert(one.width === 64 + one.n_bytes % 576)
    assert(one.n_frames === 1 + one.n_bytes % 29)
  }

  test("frame sampling explodes every Nth frame index") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001).limit(10))
    val meta = Multimodal.decodeBatched(spark, media)
    val frames = Multimodal.sampleFrames(meta, everyN = 5)
    val expected = meta.collect()
      .map(m => (m.n_frames + 4) / 5).sum // ceil(n/5) sampled frames each
    assert(frames.count() === expected)
  }

  test("metadata projection prunes the blob column at the parquet scan") {
    val dir = tmpDir("media")
    Multimodal.asMedia(Tables.documents(spark, sf0001)).write
      .mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("doc_id", "mime")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,mime:string>"),
      s"blob column must not be read for metadata-only queries:\n$plan")
  }

  test("batched resize and feature extraction keep shape and compose " +
    "with ANN ops") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001).limit(50))
    val resized = Multimodal.resizeBatched(spark, media, 224, 224)
    assert(resized.count() === 50)
    assert(resized.head().width === 224)
    val feats = Multimodal.extractFeaturesBatched(spark, media, dim = 64)
    assert(feats.count() === 50)
    val v = feats.head().features
    assert(v.length === 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5) // normalized
    // composes with the cosine expression downstream
    val df = feats.toDF()
    val sim = df.as("a").crossJoin(df.as("b"))
      .select(graft.functions.CosineSimilarity.cosineSim(spark,
        $"a.features", $"b.features").as("c"))
    assert(sim.agg(max($"c")).head().getDouble(0) <= 1.0 + 1e-9)
  }
}
