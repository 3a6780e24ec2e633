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

  test("REAL png decode: ImageIO path reads actual pixel dimensions; " +
    "stub mimes in the same batch keep the fake formulas") {
    // Render genuine PNGs in-test (javax.imageio is the codec under test,
    // but WRITING a fixture with it and reading back known w×h is still a
    // real round-trip through the compressed format).
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7 + seed) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, png(17, 9, 0), "image/png"),
      Multimodal.MediaRecord(2L, png(320, 240, 1), "image/png"),
      Multimodal.MediaRecord(3L, "not an image".getBytes, Multimodal.StubCodec.FakeMime)
    ).toDF()
    val meta = Multimodal.decodeBatched(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert((meta(1L).width, meta(1L).height) === (17, 9))
    assert((meta(2L).width, meta(2L).height) === (320, 240))
    assert(meta(1L).n_bytes > 0 && meta(1L).n_frames === 1)
    // the stub record in the same batch still follows the fake formulas
    val n = "not an image".getBytes.length
    assert(meta(3L).width === 64 + n % 576)
    // real RESIZE: bilinear kernel to 8×6, output re-decodes at 8×6
    val resized = Multimodal.resizeBatched(spark,
      media.where($"mime" === "image/png"), 8, 6).collect()
    assert(resized.length === 2)
    resized.foreach { r =>
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      assert((back.getWidth, back.getHeight) === (8, 6))
    }
    // corrupt bytes under an image mime fail LOUDLY, not silently
    val bad = Seq(Multimodal.MediaRecord(9L, Array[Byte](1, 2, 3), "image/png")).toDF()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeBatched(spark, bad).collect()
    }
    assert(ex.getMessage != null)
  }

  test("REAL wav decode: sample rate, channels, frame count and duration " +
    "read from genuine WAVE headers; corrupt bytes fail loudly") {
    import javax.sound.sampled._
    def wav(rateHz: Float, channels: Int, nSamples: Int): Array[Byte] = {
      val fmt = new AudioFormat(rateHz, 16, channels, true, false)
      val pcm = new Array[Byte](nSamples * 2 * channels) // silence
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, wav(8000f, 1, 4000), "audio/wav"),
      Multimodal.MediaRecord(2L, wav(44100f, 2, 22050), "audio/wav")
    ).toDF()
    val meta = Multimodal.decodeAudioBatched(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert((meta(1L).sample_rate, meta(1L).channels, meta(1L).n_samples) ===
      (8000, 1, 4000L))
    assert(meta(1L).duration_ms === 500L) // 4000 samples at 8 kHz
    assert((meta(2L).sample_rate, meta(2L).channels, meta(2L).n_samples) ===
      (44100, 2, 22050L))
    assert(meta(2L).duration_ms === 500L)
    val bad = Seq(Multimodal.MediaRecord(9L, "not audio".getBytes, "audio/wav")).toDF()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioBatched(spark, bad).collect()
    }
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
