package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Caches, EventOps, GraphOps, IvfIndex, Layout, LogReg, LshIndex, TextOps}
import graft.sources.Tables
import graft.pipeline.CurationPipeline
import graft.functions.{BloomMightContain, CosineSimilarity, MinHashSignature, VectorOps}

/** Storage/wire/multimodal family: clustered and z-order layout
  * scans, wire-format round-trip, image/audio decode. */
private[queries] trait ExtInfraQueries extends ExtQueryHelpers {
  // ------------------------------------------------------------------ q61
  /** The clustered data layout under the oracle, end-to-end: write the
    * events table range-clustered on user_id (`ops.Layout.clusteredWrite`
    * — range shuffle + in-file sort), scan it back through a pushed range
    * predicate (the layout every file/row-group min-max stat now serves,
    * LayoutSpec proves the disjointness), and the roundtrip — including
    * micros timestamps through the parquet writer — must match the plain
    * filtered table. The (small) filtered result is localized so the
    * scratch dir can be deleted before returning. */
  private[queries] def q61(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.ops.Scratch.tempDir("graft_q61_")
    // Deleting eagerly is only safe when localize SUCCEEDED (result is a
    // plan-free local relation). The persist() fallback's lineage still
    // reads the scratch parquet — a cache-block eviction would recompute
    // against deleted files — so that path defers deletion to JVM exit.
    var deferCleanup = false
    try {
      Layout.clusteredWrite(
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts")),
        tmp, files = 8, col("user_id"))
      val filtered = spark.read.parquet(tmp)
        .where(col("user_id").between(2L, 9L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value_r"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy(col("event_id"))
      Caches.localize(filtered, maxRows = 1 << 22).getOrElse {
        deferCleanup = true
        val p = filtered.persist(); p.count(); p
      }
    } finally {
      // deleteOnExit runs LIFO, so registering each directory before its
      // children deletes children first, directories last.
      def rmNow(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmNow)
        f.delete(); ()
      }
      def rmAtExit(f: java.io.File): Unit = {
        f.deleteOnExit()
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAtExit)
      }
      val root = new java.io.File(tmp)
      if (deferCleanup) rmAtExit(root) else rmNow(root)
    }
  }
  private[queries] val q61Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events WHERE user_id BETWEEN 2 AND 9
      |ORDER BY event_id""".stripMargin


  // ------------------------------------------------------------------ q63
  /** Multi-column Z-ORDER layout under the oracle: write events z-ordered
    * on (user_id, event_id) — rank-bucketed bit interleaving,
    * Layout.zorderWrite — and scan back through a conjunction of range
    * predicates on BOTH columns, the multi-predicate shape single-column
    * clustering cannot serve (LayoutSpec proves either-column row-group
    * pruning from the written footers; this query proves the roundtrip
    * bit-exact). */
  private[queries] def q63(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.ops.Scratch.tempDir("graft_q63_")
    var deferCleanup = false
    try {
      Layout.zorderWrite(
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts")),
        tmp, files = 8, Seq("user_id", "event_id"))
      val filtered = spark.read.parquet(tmp)
        .where(col("user_id").between(2L, 60L) &&
          col("event_id").between(500L, 5000L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value_r"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy(col("event_id"))
      Caches.localize(filtered, maxRows = 1 << 22).getOrElse {
        deferCleanup = true
        val p = filtered.persist(); p.count(); p
      }
    } finally {
      def rmNow(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmNow)
        f.delete(); ()
      }
      def rmAtExit(f: java.io.File): Unit = {
        f.deleteOnExit()
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAtExit)
      }
      val root = new java.io.File(tmp)
      if (deferCleanup) rmAtExit(root) else rmNow(root)
    }
  }
  private[queries] val q63Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events
      |WHERE user_id BETWEEN 2 AND 60 AND event_id BETWEEN 500 AND 5000
      |ORDER BY event_id""".stripMargin


  // ------------------------------------------------------------------ q29
  /** Multimodal column plumbing: text bytes stand in for image/audio
    * payloads as an opaque BINARY column; "decode" is the clearly-marked
    * deterministic stub (graft.multimodal.Multimodal has the
    * mapPartitions-batched variant). Schema/partitioning/lineage are real. */
  private[queries] def q29(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal.StubCodec._
    val blob = col("text").cast("binary")
    val nBytes = length(blob)
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), lit(FakeMime).as("mime"),
        nBytes.as("n_bytes"),
        (lit(BaseDim) + pmod(nBytes, lit(WidthMod))).as("width"),
        (lit(BaseDim) + pmod(col("doc_id") * HeightMul, lit(HeightMod))).as("height"),
        (lit(1) + pmod(nBytes, lit(FrameMod))).as("n_frames"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q29Sql =
    """SELECT doc_id, 'image/fake' AS mime,
      |       octet_length(encode(text)) AS n_bytes,
      |       64 + octet_length(encode(text)) % 576 AS width,
      |       64 + (doc_id * 37) % 416 AS height,
      |       1 + octet_length(encode(text)) % 29 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q91
  /** REAL image decode round-trip: render each document a genuine PNG
    * (javax.imageio encode) whose pixel dimensions derive from table
    * columns, ship the compressed bytes as the opaque BINARY media
    * column, and run the production decode path
    * ([[graft.multimodal.Multimodal.decodeBatched]] → ImageIoCodec) to
    * read the dimensions back off the bytes. The oracle recomputes the
    * dimension formulas relationally — the hash can only match if the
    * engine actually parsed the PNG format (q29's stub spelling could
    * not know the width without decoding). Scale shape: encode and
    * decode are two narrow mapPartitions stages — blobs never cross a
    * shuffle; only the (doc_id, dims) result is sorted for the oracle. */
  private[queries] def q91(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val w = 8 + (docId % 24).toInt
        val h = 4 + (nChars % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0 // deterministic one-row fill; pixel content is not the contract
        while (x < w) { img.setRGB(x, 0, (x * 2654435761L & 0xffffff).toInt); x += 1 }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Multimodal.MediaRecord(docId, out.toByteArray, "image/png")
      })
    Multimodal.decodeBatched(spark, media.toDF()).toDF()
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q91Sql =
    """SELECT doc_id, 'image/png' AS mime,
      |       8 + doc_id % 24 AS width,
      |       4 + n_chars % 16 AS height,
      |       1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q95
  /** REAL audio decode round-trip — q91's contract for the audio
    * modality: render each document a genuine WAVE file
    * (javax.sound.sampled encode) whose sample rate / channel count /
    * duration derive from table columns, ship the bytes as the opaque
    * BINARY media column, and run the production decode path
    * ([[graft.multimodal.Multimodal.decodeAudioBatched]] → SoundCodec)
    * to read them back off the RIFF headers. The oracle recomputes the
    * parameter formulas relationally — the hash only matches if the
    * engine actually parsed the format. Durations are chosen to divide
    * the sample rate exactly, so frames·1000/rate is integer-exact on
    * both sides. Same scale shape as q91: two narrow mapPartitions
    * stages, blobs never cross a shuffle. */
  private[queries] def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val rate = if (docId % 2 == 0) 8000 else 16000
        val channels = 1 + (docId % 2).toInt
        val dMs = 100 + (nChars % 400).toInt
        val ns = rate / 1000 * dMs
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val pcm = new Array[Byte](ns * 2 * channels) // silence; content is
        val out = new java.io.ByteArrayOutputStream() // not the contract
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Multimodal.MediaRecord(docId, out.toByteArray, "audio/wav")
      })
    Multimodal.decodeAudioBatched(spark, media.toDF()).toDF()
      .select(col("doc_id"), col("mime"), col("sample_rate"), col("channels"),
        col("n_samples"), col("duration_ms"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q95Sql =
    """SELECT doc_id, 'audio/wav' AS mime,
      |  CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END) * (100 + n_chars % 400)
      |    AS n_samples,
      |  100 + n_chars % 400 AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q99
  /** The full multimodal story under one oracle: REAL decode → REAL
    * pixel-derived embedding → cosine ANN. Each document is rendered a
    * genuine 16×16 PNG of 4×4 constant-gray cells whose values derive
    * from table columns; the production feature path
    * ([[graft.multimodal.Multimodal.extractFeaturesBatched]] →
    * ImageIoCodec.lumaGrid) decodes the compressed bytes and pools the
    * actual pixels into a 4×4 mean-luma grid; brute-force cosine top-3
    * runs over the resulting vectors (q23's shape: broadcast probes, one
    * map-side pass, per-probe top-k window). The oracle recomputes the
    * cell formulas relationally and mirrors the cosine arithmetic term
    * for term (`dot / (sqrt(na)·sqrt(nb))`) — every intermediate sum is
    * an exact integer in double, so the hash can only match if the
    * engine's luma grid read the true pixel values back out of the PNG.
    * Scale shape: encode, decode and featurize are narrow mapPartitions
    * stages — blobs never cross a shuffle; only 16-float vectors do. */
  private[queries] def q99(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    def mediaOf(docs: DataFrame) = docs
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val k = (y / 4) * 4 + (x / 4) // flat cell index, row-major
            val v = (1L + ((docId + 1L) * (k + 1L)) % 251L).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Multimodal.MediaRecord(docId, out.toByteArray, "image/png")
      }).toDF()
    val corpus = Multimodal.extractFeaturesBatched(spark,
      mediaOf(Tables.spread(Tables.documents(spark, dir))), dim = 16).toDF()
    // probes filter BEFORE the encode stage: 5 PNGs rendered, not the corpus twice
    val probes = Multimodal.extractFeaturesBatched(spark,
      mediaOf(Tables.documents(spark, dir).where(col("doc_id") < 5)), dim = 16)
      .toDF()
      .select(col("doc_id").as("probe_id"), col("features").as("probe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("doc_id"))
    corpus.crossJoin(broadcast(probes))
      .where(col("doc_id") =!= col("probe_id"))
      .withColumn("cos", CosineSimilarity.cosineSim(spark, col("features"), col("probe")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("probe_id"), col("rn"), col("doc_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("probe_id"), col("rn"))
  }
  private[queries] val q99Sql =
    """WITH v AS (
      |  SELECT doc_id,
      |         list_transform(range(16),
      |           k -> CAST(1 + ((doc_id + 1) * (k + 1)) % 251 AS DOUBLE)) AS e
      |  FROM documents),
      |probes AS (SELECT doc_id AS probe_id, e AS probe FROM v WHERE doc_id < 5),
      |sims AS (
      |  SELECT probe_id, doc_id AS neighbor_id,
      |         list_sum(list_transform(range(16), k -> e[k + 1] * probe[k + 1]))
      |           / (sqrt(list_sum(list_transform(e, x -> x * x)))
      |              * sqrt(list_sum(list_transform(probe, x -> x * x)))) AS cos
      |  FROM v CROSS JOIN probes
      |  WHERE doc_id <> probe_id)
      |SELECT probe_id,
      |       row_number() OVER (PARTITION BY probe_id
      |         ORDER BY cos DESC, neighbor_id) AS rn,
      |       neighbor_id, round(cos, 4) AS cos_sim
      |FROM sims
      |QUALIFY rn <= 3
      |ORDER BY probe_id, rn""".stripMargin


  // ------------------------------------------------------------------ q102
  /** REAL frame-sample decode of an ANIMATED container — the "video"
    * round-trip for the one animated format `javax.imageio` decodes:
    * each document is rendered a genuine multi-frame GIF (2–5 frames of
    * constant gray, values derived from table columns; constant-gray
    * GIF round-trips bit-exact through the 256-entry palette), and the
    * production frame sampler
    * ([[graft.multimodal.Multimodal.decodeFramesBatched]]) walks every
    * 2nd frame, decoding ONLY the sampled frames and emitting each one's
    * real dimensions and mean pixel luma. The oracle recomputes the
    * frame-count and per-frame-gray formulas relationally — the hash
    * only matches if the engine seeked to the right frames inside the
    * container and read their actual pixels. Scale shape: one narrow
    * mapPartitions encode and one decode; blobs never cross a shuffle;
    * output is (doc, frame) scalar rows. */
  private[queries] def q102(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val nf = 2 + (docId % 4).toInt
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val out = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val v = (1L + (docId * 7L + f * 13L) % 251L).toInt
          val img = new java.awt.image.BufferedImage(
            8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < 8) {
            var y = 0
            while (y < 4) { img.setRGB(x, y, (v << 16) | (v << 8) | v); y += 1 }
            x += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close(); writer.dispose()
        Multimodal.MediaRecord(docId, out.toByteArray, "image/gif")
      }).toDF()
    Multimodal.decodeFramesBatched(spark, media, everyN = 2).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("luma"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private[queries] val q102Sql =
    """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       8 AS width, 4 AS height,
      |       CAST(1 + (doc_id * 7 + frame_idx * 13) % 251 AS DOUBLE) AS luma
      |FROM (SELECT doc_id, unnest(range(0, 2 + doc_id % 4, 2)) AS frame_idx
      |      FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin


  // ----------------------------------------------------------------- q103
  /** REAL PCM feature extraction under the oracle — the audio analog of
    * q99's pixel story: each document is rendered a genuine mono 8 kHz
    * WAVE whose SAMPLE VALUES (not just headers) derive from table
    * columns — four envelope cells of constant amplitude
    * `1 + ((doc_id+1)·(k+3)) % 1000`, sign alternating every
    * `p = 1 + doc_id % 3` samples — and the production PCM path
    * ([[graft.multimodal.Multimodal.extractAudioFeaturesBatched]] →
    * PcmCodec) decodes the samples and derives zero-crossing count and
    * the 4-cell mean-|amplitude| envelope. The oracle recomputes the
    * formulas relationally: per-cell constant amplitude makes each
    * envelope mean exactly `a_k` (integer → float exact), and the sign
    * period makes crossings exactly `⌊(ns−1)/p⌋` — the hash only matches
    * if the engine decoded the true sample values back out of the RIFF
    * container. Scale shape: encode and featurize are two narrow
    * mapPartitions stages; blobs never cross a shuffle. */
  private[queries] def q103(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val ns = 64 + (nChars % 64).toInt
        val p = 1 + (docId % 3).toInt
        val pcm = new Array[Byte](ns * 2)
        var k = 0
        while (k < 4) {
          // SAME cell bounds the envelope pool uses: [⌊k·ns/4⌋, ⌊(k+1)·ns/4⌋)
          val i0 = k * ns / 4; val i1 = (k + 1) * ns / 4
          val a = (1L + ((docId + 1L) * (k + 3L)) % 1000L).toInt
          var i = i0
          while (i < i1) {
            val v = if ((i / p) % 2 == 0) a else -a
            pcm(i * 2) = (v & 0xff).toByte
            pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Multimodal.MediaRecord(docId, out.toByteArray, "audio/wav")
      }).toDF()
    Multimodal.extractAudioFeaturesBatched(spark, media, cells = 4).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("zero_crossings"),
        element_at(col("envelope"), 1).cast("double").as("env_0"),
        element_at(col("envelope"), 2).cast("double").as("env_1"),
        element_at(col("envelope"), 3).cast("double").as("env_2"),
        element_at(col("envelope"), 4).cast("double").as("env_3"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q103Sql =
    """SELECT doc_id, 8000 AS sample_rate,
      |       CAST(64 + n_chars % 64 AS INT) AS n_samples,
      |       (64 + n_chars % 64 - 1) // (1 + doc_id % 3) AS zero_crossings,
      |       CAST(1 + ((doc_id + 1) * 3) % 1000 AS DOUBLE) AS env_0,
      |       CAST(1 + ((doc_id + 1) * 4) % 1000 AS DOUBLE) AS env_1,
      |       CAST(1 + ((doc_id + 1) * 5) % 1000 AS DOUBLE) AS env_2,
      |       CAST(1 + ((doc_id + 1) * 6) % 1000 AS DOUBLE) AS env_3
      |FROM documents ORDER BY doc_id""".stripMargin


  // ----------------------------------------------------------------- q104
  /** REAL audio resample round-trip under the oracle, at a FRACTIONAL
    * ratio: each document is rendered a genuine mono 12 kHz WAVE of a
    * known integer ramp `s_i = ((doc_id+1)·(i+7)) % 1999 − 999`, the
    * production resampler
    * ([[graft.multimodal.Multimodal.resampleAudioBatched]] →
    * PcmCodec.resampleOne) converts it to 8 kHz — ratio 3/2, so odd
    * output positions interpolate two adjacent samples for real
    * (`⌊(s_{i0}+s_{i0+1})/2⌋`, floor division) while even positions
    * decimate exactly — and the production decoder reads the resampled
    * bytes back for a per-doc checksum. The oracle replays the exact
    * rational arithmetic per output position — the hash only matches if
    * encode → linear-interp resample → WAV re-encode → decode is
    * bit-exact end to end. Scale shape: three narrow mapPartitions
    * stages; blobs never cross a shuffle; only 6 scalars per doc do. */
  private[queries] def q104(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val ns = 48 + (nChars % 48).toInt
        val pcm = new Array[Byte](ns * 2)
        var i = 0
        while (i < ns) {
          val v = (((docId + 1L) * (i + 7L)) % 1999L - 999L).toInt
          pcm(i * 2) = (v & 0xff).toByte
          pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 1, true, false)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Multimodal.MediaRecord(docId, out.toByteArray, "audio/wav")
      }).toDF()
    Multimodal.resampleAudioBatched(spark, media, targetRate = 8000)
      .mapPartitions(_.map { r =>
        val (rate, s) = Multimodal.PcmCodec.samples(r)
        (r.doc_id, rate, s.length, s.map(_.toLong).sum, s.head, s.last)
      }).toDF("doc_id", "rate_out", "n_out", "checksum", "v_first", "v_last")
      .orderBy(col("doc_id"))
  }
  private[queries] val q104Sql =
    """WITH d AS (SELECT doc_id, 48 + n_chars % 48 AS ns FROM documents),
      |r AS (SELECT doc_id, ns, ((ns - 1) * 2) // 3 + 1 AS n_out FROM d),
      |vals AS (SELECT doc_id, n_out,
      |  list_transform(range(n_out), j -> CASE WHEN j % 2 = 0
      |    THEN ((doc_id + 1) * ((3 * j) // 2 + 7)) % 1999 - 999
      |    ELSE CAST(floor(((((doc_id + 1) * ((3 * j) // 2 + 7)) % 1999 - 999)
      |         + (((doc_id + 1) * ((3 * j) // 2 + 8)) % 1999 - 999)) / 2.0)
      |         AS BIGINT) END) AS v
      |  FROM r)
      |SELECT doc_id, 8000 AS rate_out, CAST(n_out AS INT) AS n_out,
      |       CAST(list_sum(v) AS BIGINT) AS checksum,
      |       CAST(v[1] AS INT) AS v_first, CAST(v[n_out] AS INT) AS v_last
      |FROM vals ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q55
  /** Full EP1 wire-format roundtrip under the oracle: events → Kinesis
    * envelope encode → the producer's `{"Records": [...]}` batch wrapper
    * WITH its 5%-of-batches / 1-10-duplicates model (producer.py:142-167)
    * → batch explode → base64/JSON decode → first-wins dedup. The output
    * must equal the original table exactly — one query exercising the
    * whole wire chain (json+base64 both ways, the batch dict, the
    * batch-shaped duplicate distribution, schema-bound decode) against a
    * trivial oracle. All narrow maps except the one batch groupBy and the
    * dedup shuffle. */
  private[queries] def q55(spark: SparkSession, dir: String): DataFrame = {
    val BATCH = 100
    val wireSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    val packed = Tables.events(spark, dir).select(
      (col("event_id") / BATCH).cast("long").as("batch_id"), col("event_id"),
      EventOps.encodeEnvelope(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us")), col("event_id").cast("string")).as("record"))
    val batches = packed.groupBy(col("batch_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("record")))).as("rs"))
      .select(col("batch_id"), transform(col("rs"), r => r.getField("record")).as("records"))
    val withDups = batches.withColumn("records",
        when(pmod(xxhash64(col("batch_id"), lit(101)), lit(100)) < 5,
          concat(col("records"), slice(col("records"), lit(1),
            (pmod(xxhash64(col("batch_id"), lit(103)), lit(10)) + 1).cast("int"))))
          .otherwise(col("records")))
      .select(to_json(struct(col("records").as("Records"))).as("batch"))
    val decoded = EventOps.explodeRecordsBatch(withDups)
      .select(EventOps.decodeEnvelope(col("record"), wireSchema).as("e"))
      .select(col("e.*"))
    EventOps.dedupFirstWins(decoded, Seq("event_id"), Seq(col("ts_us")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value_r"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
      .orderBy(col("event_id"))
  }
  private[queries] val q55Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events ORDER BY event_id""".stripMargin


  // ----------------------------------------------------------------- q110
  /** REAL video-container decode round-trip — q95's contract for the
    * video modality, closing the multimodal metadata matrix: each
    * document is rendered a genuine two-stream uncompressed AVI
    * (self-written RIFF writer, [[graft.multimodal.AviCodec.encode]])
    * whose vids dimensions / frame count / fps and auds sample rate /
    * length derive from table columns, shipped as the opaque BINARY
    * media column, and decoded back PER STREAM by the production path
    * ([[graft.multimodal.Multimodal.decodeVideoStreamsBatched]] →
    * AviCodec.parse walking the RIFF chunk tree). The oracle recomputes
    * the parameter formulas relationally — the hash only matches if the
    * engine actually parsed avih/strh/strf headers out of the container
    * (frame payload bytes are never read: metadata scans stay
    * header-bounded). Scale shape: two narrow mapPartitions stages,
    * blobs never cross a shuffle, only per-stream scalar rows do. */
  private[queries] def q110(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val w = 8 + (docId % 24).toInt
        val h = 4 + (nChars % 16).toInt
        val nf = 1 + (docId % 5).toInt
        val fps = 10 + (docId % 20).toInt
        val sr = 8000 * (1 + (docId % 2).toInt)
        val ns = 32 + (nChars % 64).toInt
        // frame content is not this query's contract (black frames);
        // q111 pins the pixel path
        val frames = Seq.fill(nf)(new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB))
        val bytes = AviCodec.encode(frames, rate = fps, scale = 1,
          audio = Some((sr, new Array[Byte](ns * 2))))
        Multimodal.MediaRecord(docId, bytes, "video/avi")
      }).toDF()
    Multimodal.decodeVideoStreamsBatched(spark, media).toDF()
      .select(col("doc_id"), col("stream_idx"), col("stream_type"),
        col("width"), col("height"), col("length"), col("rate"),
        col("scale"), col("channels"), col("bits"))
      .orderBy(col("doc_id"), col("stream_idx"))
  }
  private[queries] val q110Sql =
    """SELECT doc_id, CAST(0 AS INT) AS stream_idx, 'vids' AS stream_type,
      |       CAST(8 + doc_id % 24 AS INT) AS width,
      |       CAST(4 + n_chars % 16 AS INT) AS height,
      |       CAST(1 + doc_id % 5 AS BIGINT) AS length,
      |       CAST(10 + doc_id % 20 AS INT) AS rate,
      |       CAST(1 AS INT) AS scale,
      |       CAST(0 AS INT) AS channels, CAST(24 AS INT) AS bits
      |FROM documents
      |UNION ALL
      |SELECT doc_id, CAST(1 AS INT), 'auds', CAST(0 AS INT), CAST(0 AS INT),
      |       CAST(32 + n_chars % 64 AS BIGINT),
      |       CAST(8000 * (1 + doc_id % 2) AS INT),
      |       CAST(1 AS INT), CAST(1 AS INT), CAST(16 AS INT)
      |FROM documents
      |ORDER BY doc_id, stream_idx""".stripMargin


  // ----------------------------------------------------------------- q111
  /** The full VIDEO story under one oracle — q99's pixel→embedding→ANN
    * chain over the real AVI frame path: each document is rendered a
    * genuine uncompressed AVI of 2–4 8×8 frames, each frame four 4×4
    * constant-gray quadrants whose values derive from table columns;
    * the production sampler
    * ([[graft.multimodal.Multimodal.videoFrameGridsBatched]]) walks
    * every 2nd frame chunk (skipped frames cost a header read, not a
    * decode), decodes the BGR24 pixels, pools each sampled frame into a
    * 2×2 mean-luma grid, and a per-doc aggregate averages the sampled
    * grids into one embedding; brute-force cosine top-3 runs over the
    * result (q23's shape: broadcast probes, per-probe top-k window).
    * Frame-sample counts are kept DYADIC (1 or 2) so the float means
    * are exact and the double cosine matches the oracle bit-for-bit —
    * the hash only matches if the engine seeked the right frame chunks
    * and read their true pixels. Scale shape: encode/decode/pool are
    * narrow mapPartitions stages; blobs never cross a shuffle — only
    * (doc, frame, 4-float) rows reach the one aggregate. */
  private[queries] def q111(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    def mediaOf(docs: DataFrame) = docs
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val nf = 2 + (docId % 3).toInt // sampled count 1 (nf=2) or 2 (nf=3,4)
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val k = (y / 4) * 2 + (x / 4) // row-major 2×2 quadrant index
              val v = (1L + ((docId + 1L) * (f + 2L) * (k + 1L)) % 251L).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          img
        }
        Multimodal.MediaRecord(docId, AviCodec.encode(frames, rate = 10),
          "video/avi")
      }).toDF()
    def featsOf(docs: DataFrame) =
      Multimodal.videoFrameGridsBatched(spark, mediaOf(docs), everyN = 2, g = 2)
        .toDF()
        .groupBy(col("doc_id"))
        // dyadic sample counts make the float cast exact (scaladoc above)
        .agg(array((1 to 4).map(i =>
          avg(element_at(col("grid"), i)).cast("float")): _*).as("features"))
    val corpus = featsOf(Tables.spread(Tables.documents(spark, dir)))
    // probes filter BEFORE the encode stage: 5 AVIs rendered, not the corpus twice
    val probes = featsOf(Tables.documents(spark, dir).where(col("doc_id") < 5))
      .select(col("doc_id").as("probe_id"), col("features").as("probe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("doc_id"))
    corpus.crossJoin(broadcast(probes))
      .where(col("doc_id") =!= col("probe_id"))
      .withColumn("cos", CosineSimilarity.cosineSim(spark, col("features"), col("probe")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("probe_id"), col("rn"), col("doc_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("probe_id"), col("rn"))
  }
  private[queries] val q111Sql =
    """WITH v AS (
      |  SELECT doc_id,
      |    list_transform(range(4), k -> CASE WHEN doc_id % 3 = 0
      |      THEN CAST(1 + ((doc_id + 1) * 2 * (k + 1)) % 251 AS DOUBLE)
      |      ELSE (CAST(1 + ((doc_id + 1) * 2 * (k + 1)) % 251 AS DOUBLE)
      |            + (1 + ((doc_id + 1) * 4 * (k + 1)) % 251)) / 2.0 END) AS e
      |  FROM documents),
      |probes AS (SELECT doc_id AS probe_id, e AS probe FROM v WHERE doc_id < 5),
      |sims AS (
      |  SELECT probe_id, doc_id AS neighbor_id,
      |         list_sum(list_transform(range(4), k -> e[k + 1] * probe[k + 1]))
      |           / (sqrt(list_sum(list_transform(e, x -> x * x)))
      |              * sqrt(list_sum(list_transform(probe, x -> x * x)))) AS cos
      |  FROM v CROSS JOIN probes
      |  WHERE doc_id <> probe_id)
      |SELECT probe_id,
      |       row_number() OVER (PARTITION BY probe_id
      |         ORDER BY cos DESC, neighbor_id) AS rn,
      |       neighbor_id, round(cos, 4) AS cos_sim
      |FROM sims
      |QUALIFY rn <= 3
      |ORDER BY probe_id, rn""".stripMargin


  // ----------------------------------------------------------------- q113
  /** COMPRESSED-video decode under the oracle — Motion-JPEG through the
    * real JDK JPEG decoder: each document is rendered a genuine MJPEG
    * AVI ([[graft.multimodal.AviCodec.encodeMjpg]] — every frame chunk
    * a standalone JPEG) of 16×16 frames whose four 8×8 constant-gray
    * quadrants derive from table columns; the production sampler
    * ([[graft.multimodal.Multimodal.videoFrameGridsBatched]]) walks
    * every frame chunk, dispatches on `biCompression = 'MJPG'` into
    * `javax.imageio`'s JPEG decode, and pools each frame into a 2×2
    * mean-luma grid. Quadrants are 8×8-BLOCK-ALIGNED, so each JPEG
    * block is DC-only and the DCT round-trip is bit-exact (pinned by
    * AviCodecSpec across all 256 gray levels) — the oracle recomputes
    * the quadrant formula relationally, and the hash only matches if
    * the engine actually inverse-DCT'd the compressed frames back to
    * the source pixels. Scale shape: two narrow mapPartitions stages,
    * blobs never shuffle, only (doc, frame, 4-int) rows do. */
  private[queries] def q113(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val nf = 1 + (docId % 3).toInt
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val k = (y / 8) * 2 + (x / 8) // row-major 2×2 quadrant index
              val v = (1L + ((docId + 2L) * (f + 1L) * (k + 3L)) % 250L).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          img
        }
        Multimodal.MediaRecord(docId,
          AviCodec.encodeMjpg(frames, rate = 10), "video/avi")
      }).toDF()
    Multimodal.videoFrameGridsBatched(spark, media, everyN = 1, g = 2).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        element_at(col("grid"), 1).cast("int").as("q1"),
        element_at(col("grid"), 2).cast("int").as("q2"),
        element_at(col("grid"), 3).cast("int").as("q3"),
        element_at(col("grid"), 4).cast("int").as("q4"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private[queries] val q113Sql =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(1 + doc_id % 3)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
      |       CAST(1 + ((doc_id + 2) * (frame_idx + 1) * 3) % 250 AS INT) AS q1,
      |       CAST(1 + ((doc_id + 2) * (frame_idx + 1) * 4) % 250 AS INT) AS q2,
      |       CAST(1 + ((doc_id + 2) * (frame_idx + 1) * 5) % 250 AS INT) AS q3,
      |       CAST(1 + ((doc_id + 2) * (frame_idx + 1) * 6) % 250 AS INT) AS q4
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin


  // ----------------------------------------------------------------- q114
  /** Video frame-rate resample under the oracle — the temporal member
    * of the resample family (q104 is the audio one): each document is
    * rendered an uncompressed AVI of solid-gray frames at a per-doc
    * source fps, pushed through the production
    * [[graft.multimodal.Multimodal.resampleVideoBatched]] kernel
    * (duration-preserving `⌊nIn·dst/src⌋` output count,
    * nearest-lower-frame selection `⌊j·src/dst⌋` — drops on
    * downsample, duplicates on upsample; both directions exercised by
    * the fps spread), and the resampled container is re-decoded by
    * [[graft.multimodal.Multimodal.decodeFramesBatched]]. The oracle
    * replays the integer frame-mapping arithmetic relationally: the
    * hash only matches if output frame `j` carries the true pixels of
    * source frame `⌊j·src/dst⌋` through the rewrite. Scale shape:
    * three narrow mapPartitions stages, blobs never shuffle. */
  private[queries] def q114(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{AviCodec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val nf = 4 + (docId % 4).toInt
        val src = 10 + (docId % 5).toInt // 10..14 fps: both directions vs 12
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val v = (1L + ((docId + 1L) * (f + 3L)) % 251L).toInt
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
            y += 1
          }
          img
        }
        Multimodal.MediaRecord(docId,
          AviCodec.encode(frames, rate = src), "video/avi")
      }).toDF()
    val resampled = Multimodal.resampleVideoBatched(spark, media, targetFps = 12)
    Multimodal.decodeFramesBatched(spark, resampled.toDF(), everyN = 1).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("luma").cast("int").as("luma"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private[queries] val q114Sql =
    """WITH p AS (
      |  SELECT doc_id, 4 + doc_id % 4 AS nf, 10 + doc_id % 5 AS src
      |  FROM documents),
      |f AS (SELECT doc_id, src, unnest(range((nf * 12) // src)) AS j FROM p)
      |SELECT doc_id, CAST(j AS INT) AS frame_idx,
      |       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
      |       CAST(1 + ((doc_id + 1) * (((j * src) // 12) + 3)) % 251 AS INT) AS luma
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin


  // ----------------------------------------------------------------- q115
  /** REAL MP4/ISO-BMFF metadata decode under the oracle — q110's
    * contract for the DOMINANT real-world container: each document is
    * rendered a genuine two-track MP4 ([[graft.multimodal.Mp4Codec
    * .encode]] — ftyp + moov box tree with per-track tkhd/mdhd/hdlr/
    * stsd/stts) whose avc1 video dims / frame count / timescale and
    * mp4a channels / sample rate / sample count derive from table
    * columns, shipped as the opaque BINARY column, and parsed back PER
    * TRACK by the production box-walker
    * ([[graft.multimodal.Multimodal.decodeMp4TracksBatched]]). The
    * oracle recomputes the parameter formulas relationally — the hash
    * only matches if the engine actually walked the big-endian box
    * tree (mdat sample bytes are never read: metadata scans stay
    * header-bounded; SAMPLE decode for H.264/AAC is the documented
    * codec-library seam). Scale shape: two narrow mapPartitions
    * stages, blobs never cross a shuffle, only per-track scalar rows
    * do. */
  private[queries] def q115(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{Mp4Codec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val w = 16 + (docId % 120).toInt
        val h = 16 + (nChars % 90).toInt
        val nf = 24 + (docId % 48)
        val ch = 1 + (docId % 2).toInt
        val sr = 8000 * (1 + (docId % 3).toInt)
        val ns = 1000 + (nChars % 500)
        val bytes = Mp4Codec.encode(movieTimescale = 1000,
          movieDuration = nf * 40,
          tracks = Seq(
            Mp4Codec.TrackSpec(trackId = 1, video = true, width = w,
              height = h, timescale = 600, duration = nf * 25, nSamples = nf),
            Mp4Codec.TrackSpec(trackId = 2, video = false, channels = ch,
              sampleRate = sr, timescale = sr, duration = ns, nSamples = ns)))
        Multimodal.MediaRecord(docId, bytes, "video/mp4")
      }).toDF()
    Multimodal.decodeMp4TracksBatched(spark, media).toDF()
      .select(col("doc_id"), col("track_id"), col("handler"), col("codec"),
        col("width"), col("height"), col("timescale"), col("duration"),
        col("n_samples"), col("channels"), col("sample_rate"))
      .orderBy(col("doc_id"), col("track_id"))
  }
  private[queries] val q115Sql =
    """SELECT doc_id, CAST(1 AS BIGINT) AS track_id, 'vide' AS handler,
      |       'avc1' AS codec,
      |       CAST(16 + doc_id % 120 AS INT) AS width,
      |       CAST(16 + n_chars % 90 AS INT) AS height,
      |       CAST(600 AS BIGINT) AS timescale,
      |       CAST((24 + doc_id % 48) * 25 AS BIGINT) AS duration,
      |       CAST(24 + doc_id % 48 AS BIGINT) AS n_samples,
      |       CAST(0 AS INT) AS channels, CAST(0 AS INT) AS sample_rate
      |FROM documents
      |UNION ALL
      |SELECT doc_id, CAST(2 AS BIGINT), 'soun', 'mp4a',
      |       CAST(0 AS INT), CAST(0 AS INT),
      |       CAST(8000 * (1 + doc_id % 3) AS BIGINT),
      |       CAST(1000 + n_chars % 500 AS BIGINT),
      |       CAST(1000 + n_chars % 500 AS BIGINT),
      |       CAST(1 + doc_id % 2 AS INT),
      |       CAST(8000 * (1 + doc_id % 3) AS INT)
      |FROM documents
      |ORDER BY doc_id, track_id""".stripMargin


  // ----------------------------------------------------------------- q117
  /** REAL MP4 SAMPLE decode under the oracle — the step past q115's
    * metadata walk: each document is rendered a genuine Motion-JPEG MP4
    * ([[graft.multimodal.Mp4Codec.encodeMjpg]] — every `mdat` sample a
    * standalone JPEG, located by a real stts/stsc/stsz/stco sample
    * table with 2 samples per chunk so the stsc run expansion is
    * exercised), and the production extractor
    * ([[graft.multimodal.Multimodal.videoFrameGridsBatched]]'s MP4
    * branch) expands the table to per-sample byte ranges, decodes each
    * through the JDK JPEG decoder, and pools a 2×2 mean-luma grid.
    * Frames are 16×16 with 8×8-BLOCK-ALIGNED constant-gray quadrants
    * from table columns (q113's bit-exact-DCT trick), so the oracle can
    * recompute the quadrant formula relationally — the hash only
    * matches if the engine really expanded the sample table to the
    * right byte ranges AND inverse-DCT'd the samples back to the source
    * pixels. Scale shape: two narrow mapPartitions stages, blobs never
    * cross a shuffle, only (doc, frame, 4-int) rows do. */
  private[queries] def q117(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{Mp4Codec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val nf = 2 + (docId % 4).toInt // 2..5 frames: 1..3 chunks at spc=2
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val k = (y / 8) * 2 + (x / 8) // row-major 2×2 quadrant index
              val v = (1L + ((docId + 3L) * (f + 2L) * (k + 5L)) % 250L).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          img
        }
        Multimodal.MediaRecord(docId,
          Mp4Codec.encodeMjpg(frames, samplesPerChunk = 2), "video/mp4")
      }).toDF()
    Multimodal.videoFrameGridsBatched(spark, media, everyN = 1, g = 2).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        element_at(col("grid"), 1).cast("int").as("q1"),
        element_at(col("grid"), 2).cast("int").as("q2"),
        element_at(col("grid"), 3).cast("int").as("q3"),
        element_at(col("grid"), 4).cast("int").as("q4"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private[queries] val q117Sql =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(2 + doc_id % 4)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
      |       CAST(1 + ((doc_id + 3) * (frame_idx + 2) * 5) % 250 AS INT) AS q1,
      |       CAST(1 + ((doc_id + 3) * (frame_idx + 2) * 6) % 250 AS INT) AS q2,
      |       CAST(1 + ((doc_id + 3) * (frame_idx + 2) * 7) % 250 AS INT) AS q3,
      |       CAST(1 + ((doc_id + 3) * (frame_idx + 2) * 8) % 250 AS INT) AS q4
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin


  // ----------------------------------------------------------------- q121
  /** REAL MP4 PCM sample decode under the oracle — q117's audio twin
    * and q103's container variant: each document is rendered a genuine
    * mono 8 kHz `twos` (big-endian 16-bit PCM) MP4
    * ([[graft.multimodal.Mp4Codec.encodePcm16]] — UNIFORM stsz, the
    * layout real PCM tracks use), sample values from the q103 cell
    * formula, and the production audio path
    * ([[graft.multimodal.Multimodal.extractAudioFeaturesBatched]] →
    * PcmCodec's MP4 branch) expands the sample table, decodes each
    * big-endian frame out of `mdat`, and derives zero-crossings + the
    * 4-cell envelope. The oracle recomputes the formulas relationally —
    * the hash only matches if the engine really read the PCM through
    * the stsc×stsz×stco ranges. Scale shape: two narrow mapPartitions
    * stages; blobs never cross a shuffle. */
  private[queries] def q121(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.{Mp4Codec, Multimodal}
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val ns = 64 + (nChars % 64).toInt
        val p = 2 + (docId % 3).toInt
        val s = new Array[Int](ns)
        var k = 0
        while (k < 4) {
          // SAME cell bounds the envelope pool uses
          val i0 = k * ns / 4; val i1 = (k + 1) * ns / 4
          val a = (1L + ((docId + 2L) * (k + 4L)) % 1000L).toInt
          var i = i0
          while (i < i1) {
            s(i) = if ((i / p) % 2 == 0) a else -a
            i += 1
          }
          k += 1
        }
        Multimodal.MediaRecord(docId,
          Mp4Codec.encodePcm16(s, sampleRate = 8000, samplesPerChunk = 25),
          "audio/mp4")
      }).toDF()
    Multimodal.extractAudioFeaturesBatched(spark, media, cells = 4).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("zero_crossings"),
        element_at(col("envelope"), 1).cast("double").as("env_0"),
        element_at(col("envelope"), 2).cast("double").as("env_1"),
        element_at(col("envelope"), 3).cast("double").as("env_2"),
        element_at(col("envelope"), 4).cast("double").as("env_3"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q121Sql =
    """SELECT doc_id, 8000 AS sample_rate,
      |       CAST(64 + n_chars % 64 AS INT) AS n_samples,
      |       (64 + n_chars % 64 - 1) // (2 + doc_id % 3) AS zero_crossings,
      |       CAST(1 + ((doc_id + 2) * 4) % 1000 AS DOUBLE) AS env_0,
      |       CAST(1 + ((doc_id + 2) * 5) % 1000 AS DOUBLE) AS env_1,
      |       CAST(1 + ((doc_id + 2) * 6) % 1000 AS DOUBLE) AS env_2,
      |       CAST(1 + ((doc_id + 2) * 7) % 1000 AS DOUBLE) AS env_3
      |FROM documents ORDER BY doc_id""".stripMargin


}
