package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp4Codec

/** Pins the self-written ISO-BMFF box walker: encode → parse
  * roundtrips per-track metadata, unknown boxes are skipped, v1
  * (64-bit) headers parse, and malformed payloads fail loudly with the
  * doc id (the codec-family contract: never fake plausible metadata). */
class Mp4CodecSpec extends AnyFunSuite {

  private val twoTrack = Mp4Codec.encode(movieTimescale = 1000,
    movieDuration = 4000, tracks = Seq(
      Mp4Codec.TrackSpec(trackId = 1, video = true, width = 320,
        height = 176, timescale = 600, duration = 2500, nSamples = 100),
      Mp4Codec.TrackSpec(trackId = 2, video = false, channels = 2,
        sampleRate = 44100, timescale = 44100, duration = 176400,
        nSamples = 176400)))

  test("encode → parse roundtrips movie and per-track metadata") {
    val c = Mp4Codec.parse(1L, twoTrack)
    assert(c.majorBrand === "isom")
    assert((c.movieTimescale, c.movieDuration) === ((1000L, 4000L)))
    assert(c.tracks.size === 2)
    val v = c.tracks(0); val a = c.tracks(1)
    assert((v.trackId, v.handler, v.codec) === ((1L, "vide", "avc1")))
    assert((v.width, v.height) === ((320, 176)))
    assert((v.timescale, v.duration, v.nSamples) === ((600L, 2500L, 100L)))
    assert((v.channels, v.sampleRate) === ((0, 0)))
    assert((a.trackId, a.handler, a.codec) === ((2L, "soun", "mp4a")))
    assert((a.channels, a.sampleRate) === ((2, 44100)))
    assert((a.timescale, a.duration, a.nSamples) === ((44100L, 176400L, 176400L)))
    assert((a.width, a.height) === ((0, 0)))
  }

  test("unknown sibling boxes are skipped, not fatal") {
    // splice a 'free' box between ftyp and moov
    val (ftypEnd, rest) = {
      // first box: u32 size BE at 0
      val sz = ((twoTrack(0) & 0xff) << 24) | ((twoTrack(1) & 0xff) << 16) |
        ((twoTrack(2) & 0xff) << 8) | (twoTrack(3) & 0xff)
      (sz, twoTrack.drop(sz))
    }
    val free = Array[Byte](0, 0, 0, 16, 'f', 'r', 'e', 'e',
      1, 2, 3, 4, 5, 6, 7, 8)
    val spliced = twoTrack.take(ftypEnd) ++ free ++ rest
    val c = Mp4Codec.parse(2L, spliced)
    assert(c.tracks.size === 2)
    assert(c.tracks.head.width === 320)
  }

  test("malformed payloads fail loudly with the doc id") {
    val e1 = intercept[IllegalArgumentException] {
      Mp4Codec.parse(42L, "definitely not an mp4 container..".getBytes)
    }
    assert(e1.getMessage.contains("42"))
    // a RIFF/AVI container must not parse as ISO-BMFF
    val avi = graft.multimodal.AviCodec.encode(Seq(
      new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)), rate = 10)
    intercept[IllegalArgumentException] { Mp4Codec.parse(43L, avi) }
    // truncated mid-box: the size walk must notice the overrun
    intercept[IllegalArgumentException] {
      Mp4Codec.parse(44L, twoTrack.take(twoTrack.length / 2))
    }
    // ftyp alone (no moov): loud, not an empty track list
    val sz = ((twoTrack(0) & 0xff) << 24) | ((twoTrack(1) & 0xff) << 16) |
      ((twoTrack(2) & 0xff) << 8) | (twoTrack(3) & 0xff)
    intercept[IllegalArgumentException] { Mp4Codec.parse(45L, twoTrack.take(sz)) }
  }

  test("version-1 (64-bit) mvhd/tkhd/mdhd headers parse") {
    // hand-assemble a v1 moov around the v0 encoder's stbl grammar:
    // mvhd v1: creation/modification u64, timescale u32, duration u64
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]*) = {
      val body = p.foldLeft(Array.empty[Byte])(_ ++ _)
      be32(8L + body.length) ++ cc(t) ++ body
    }
    def full(t: String, v: Int, p: Array[Byte]*) =
      bx(t, (Array(v.toByte, 0.toByte, 0.toByte, 0.toByte) +: p): _*)
    val ftyp = bx("ftyp", cc("isom"), be32(512), cc("isom"))
    val mvhd = full("mvhd", 1, be64(0), be64(0), be32(90000), be64(123456789L),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), be32(3))
    val tkhd = full("tkhd", 1, be64(0), be64(0), be32(7), be32(0), be64(5000),
      be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(640L << 16), be32(480L << 16))
    val mdhd = full("mdhd", 1, be64(0), be64(0), be32(600), be64(9999L),
      be16(0x55c4), be16(0))
    val hdlr = full("hdlr", 0, be32(0), cc("vide"), be32(0), be32(0), be32(0),
      Array(0.toByte))
    val stsd = full("stsd", 0, be32(1), bx("avc1", new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(640), be16(480), be32(0x00480000L),
      be32(0x00480000L), be32(0), be16(1), new Array[Byte](32),
      be16(0x0018), be16(0xffff)))
    val stts = full("stts", 0, be32(2), be32(60), be32(1), be32(40), be32(2))
    val trak = bx("trak", tkhd, bx("mdia", mdhd, hdlr,
      bx("minf", bx("stbl", stsd, stts))))
    val c = Mp4Codec.parse(6L, ftyp ++ bx("moov", mvhd, trak))
    assert((c.movieTimescale, c.movieDuration) === ((90000L, 123456789L)))
    val t = c.tracks.head
    assert((t.trackId, t.handler, t.codec) === ((7L, "vide", "avc1")))
    assert((t.width, t.height) === ((640, 480)))
    assert((t.timescale, t.duration) === ((600L, 9999L)))
    assert(t.nSamples === 100L) // 60 + 40 across two stts entries
  }

  test("metadata-only containers parse with an empty sample table") {
    assert(Mp4Codec.parse(8L, twoTrack).tracks.forall(_.samples.isEmpty))
  }

  private def gray(v: Int, w: Int = 16, h: Int = 16) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  test("encodeMjpg sample table locates the exact JPEG sample bytes") {
    // 5 frames at 2-per-chunk: 3 chunks, short tail → 2 stsc runs
    val frames = (0 until 5).map(f => gray(40 * f + 10))
    val bytes = Mp4Codec.encodeMjpg(frames, samplesPerChunk = 2)
    val c = Mp4Codec.parse(9L, bytes)
    val v = c.tracks.head
    assert((v.handler, v.codec) === (("vide", "jpeg")))
    assert((v.width, v.height, v.nSamples) === ((16, 16, 5L)))
    assert(v.samples.size === 5)
    v.samples.zipWithIndex.foreach { case ((off, sz), f) =>
      val jpeg = bytes.slice(off.toInt, (off + sz).toInt)
      // each sample is a standalone JPEG: SOI marker + decodable
      assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth === 16 && img.getHeight === 16)
      // quality-1.0 solid gray roundtrips bit-exact (AviCodecSpec's pin)
      assert((img.getRGB(8, 8) & 0xff) === 40 * f + 10)
    }
  }

  test("co64 (64-bit chunk offsets) expands like stco") {
    // hand-build a minimal co64 container around REAL JPEG sample bytes
    // lifted from an encodeMjpg file (the encoder itself emits stco)
    val bytes = Mp4Codec.encodeMjpg((0 until 3).map(f => gray(30 * f + 5)),
      samplesPerChunk = 2)
    val before = Mp4Codec.parse(10L, bytes)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val mdatPayload = before.tracks.head.samples.map { case (o, s) =>
      bytes.slice(o.toInt, (o + s).toInt) }
    def cc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]*) = {
      val body = p.foldLeft(Array.empty[Byte])(_ ++ _)
      be32(8L + body.length) ++ cc(t) ++ body
    }
    def full(t: String, p: Array[Byte]*) =
      bx(t, (Array[Byte](0, 0, 0, 0) +: p): _*)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val stsd = full("stsd", be32(1), bx("jpeg", new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(16), be16(16), be32(0x00480000L),
      be32(0x00480000L), be32(0), be16(1), new Array[Byte](32),
      be16(0x0018), be16(0xffff)))
    val stts = full("stts", be32(3), be32(3), be32(25))
    val stsc = full("stsc", be32(1), be32(1), be32(3), be32(1))
    val stsz = full("stsz", be32(0), be32(3),
      mdatPayload.map(j => be32(j.length.toLong)).reduce(_ ++ _))
    def moovFor(off: Long) = {
      val co = bx("co64", Array[Byte](0, 0, 0, 0), be32(1),
        be32(off >> 32), be32(off & 0xffffffffL))
      val mdhd = full("mdhd", be32(0), be32(0), be32(600), be32(75),
        be16(0x55c4), be16(0))
      val hdlr = full("hdlr", be32(0), cc("vide"), be32(0), be32(0), be32(0),
        Array(0.toByte))
      val tkhd = full("tkhd", be32(0), be32(0), be32(1), be32(0), be32(75),
        be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        be32(16L << 16), be32(16L << 16))
      val mvhd = full("mvhd", be32(0), be32(0), be32(600), be32(75),
        be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), be32(2))
      bx("moov", mvhd, bx("trak", tkhd, bx("mdia", mdhd, hdlr,
        bx("minf", bx("stbl", stsd, stts, stsc, stsz, co)))))
    }
    val ftyp = bx("ftyp", cc("isom"), be32(512), cc("isom"))
    val moov0 = moovFor(0L)
    val mdatStart = ftyp.length + moov0.length + 8L
    val file = ftyp ++ moovFor(mdatStart) ++
      bx("mdat", mdatPayload.reduce(_ ++ _))
    val c64 = Mp4Codec.parse(11L, file)
    val t = c64.tracks.head
    assert(t.samples.size === 3)
    t.samples.zip(mdatPayload).foreach { case ((o, s), jpeg) =>
      assert(file.slice(o.toInt, (o + s).toInt).sameElements(jpeg))
    }
  }

  test("encodePcm16 uniform stsz expands to per-frame ranges that decode " +
    "back bit-exact (twos big-endian, negatives included)") {
    val vals = Array(100, -100, 32767, -32768, 0, 7, -7, 1234, -4321)
    val bytes = Mp4Codec.encodePcm16(vals, sampleRate = 8000,
      samplesPerChunk = 4) // 3 chunks, short tail → 2 stsc runs
    val t = Mp4Codec.parse(13L, bytes).tracks.head
    assert((t.handler, t.codec) === (("soun", "twos")))
    assert((t.channels, t.sampleRate) === ((1, 8000)))
    assert((t.timescale, t.nSamples) === ((8000L, vals.length.toLong)))
    assert(t.samples.size === vals.length)
    assert(t.samples.forall(_._2 == 2L))
    val decoded = t.samples.map { case (o, _) =>
      (bytes(o.toInt) << 8) | (bytes(o.toInt + 1) & 0xff) }
    assert(decoded === vals.toSeq)
    // and through the production audio path
    val (rate, s) = graft.multimodal.Multimodal.PcmCodec.samples(
      graft.multimodal.Multimodal.MediaRecord(13L, bytes, "audio/mp4"))
    assert(rate === 8000 && s.toSeq === vals.toSeq)
  }

  test("entropy-coded MP4 audio fails loudly as the documented seam") {
    // metadata-only mp4a container: no sample table → loud, and even
    // with one the codec check rejects non-PCM entries
    val e = intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.PcmCodec.samples(
        graft.multimodal.Multimodal.MediaRecord(14L, twoTrack, "audio/mp4"))
    }
    assert(e.getMessage.contains("14"))
  }

  test("a sample table pointing outside the container fails loudly") {
    val bytes = Mp4Codec.encodeMjpg(Seq(gray(99)), samplesPerChunk = 1)
    // corrupt the single stco offset to point past EOF
    val stcoAt = (0 until bytes.length - 4).find { o =>
      bytes(o) == 's' && bytes(o + 1) == 't' && bytes(o + 2) == 'c' &&
        bytes(o + 3) == 'o'
    }.get
    val bad = bytes.clone()
    val ob = stcoAt + 12 // version/flags(4) + count(4) → first offset
    bad(ob) = 0x7f.toByte; bad(ob + 1) = 0xff.toByte
    bad(ob + 2) = 0xff.toByte; bad(ob + 3) = 0xff.toByte
    val e = intercept[IllegalArgumentException] { Mp4Codec.parse(12L, bad) }
    assert(e.getMessage.contains("12") && e.getMessage.contains("overruns"))
  }
}
