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
}
