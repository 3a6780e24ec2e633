package graft

import graft.multimodal.AdtsCodec
import org.scalatest.funsuite.AnyFunSuite

/** ADTS transport walk: header roundtrip, tiling invariant, duration
  * arithmetic, and loud refusal of malformed streams. */
class AdtsCodecSpec extends AnyFunSuite {

  test("encode/parse roundtrip with varying frame sizes") {
    val bytes = AdtsCodec.encode(sampleRateIdx = 4, channels = 2,
      nFrames = 5, payloadLen = i => 20 + i * 3)
    val m = AdtsCodec.parse(1L, bytes)
    assert(m.nFrames == 5)
    assert(m.profile == 1) // AAC-LC
    assert(m.sampleRate == 44100)
    assert(m.channels == 2)
    assert(m.audioBytes == (0 until 5).map(20 + _ * 3).sum)
    // tiling invariant: payload + headers == stream length
    assert(m.audioBytes + 5 * AdtsCodec.HeaderBytes == bytes.length)
    assert(m.durationMs == 5L * 1024 * 1000 / 44100)
  }

  test("every published sampling frequency index decodes") {
    for (s <- 0 to 12) {
      val m = AdtsCodec.parse(2L,
        AdtsCodec.encode(s, channels = 1, nFrames = 1, payloadLen = _ => 9))
      assert(m.sampleRate == AdtsCodec.SampleRateHz(s))
    }
  }

  test("malformed streams fail loudly with the doc id") {
    def bad(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](AdtsCodec.parse(9L, bytes)).getMessage
    val ok = AdtsCodec.encode(4, 2, 2, _ => 10)
    assert(bad(Array[Byte](0x12, 0x34)).contains("9"))
    assert(bad(ok.take(ok.length - 3)).contains("overruns"))
    val badSync = ok.clone(); badSync(0) = 0x00
    assert(bad(badSync).contains("sync"))
    val crc = ok.clone(); crc(1) = (crc(1) & ~0x01).toByte
    assert(bad(crc).contains("CRC"))
    val layer = ok.clone(); layer(1) = (layer(1) | 0x02).toByte
    assert(bad(layer).contains("layer"))
    val sfi = ok.clone(); sfi(2) = ((sfi(2) & ~0x3c) | (13 << 2)).toByte
    assert(bad(sfi).contains("reserved sampling"))
    assert(bad(Array.empty[Byte]).contains("empty"))
  }

  test("CRC-protected frames round-trip; corrupt payload or CRC fails loudly") {
    // parameter sweep fuzz: every (sfi, channels, frame-count) shape
    // writes protection_absent=0 frames whose CRC-16 must verify
    for (s <- Seq(0, 4, 12); ch <- Seq(1, 2, 7); nf <- Seq(1, 3, 6)) {
      val bytes = AdtsCodec.encode(s, ch, nf,
        payloadLen = i => 8 + 5 * i, crc = true)
      val m = AdtsCodec.parse(7L, bytes)
      assert(m.nFrames == nf && m.crcFrames == nf)
      assert(m.audioBytes + nf.toLong * (AdtsCodec.HeaderBytes +
        AdtsCodec.CrcBytes) == bytes.length, "CRC tiling invariant")
    }
    // plain streams report zero CRC frames
    assert(AdtsCodec.parse(7L, AdtsCodec.encode(4, 2, 3, _ => 10)).crcFrames == 0)
    // flip bytes across the protected region: every corruption of the
    // payload OR the stored CRC word must fail as a CRC mismatch
    val ok = AdtsCodec.encode(4, 2, 1, _ => 12, crc = true)
    for (i <- AdtsCodec.HeaderBytes until ok.length) {
      val bad = ok.clone(); bad(i) = (bad(i) ^ 0x41).toByte
      val e = intercept[IllegalArgumentException](AdtsCodec.parse(9L, bad))
      assert(e.getMessage.contains("CRC mismatch"), s"byte $i: ${e.getMessage}")
    }
  }

  test("mid-stream parameter changes are rejected") {
    val a = AdtsCodec.encode(4, 2, 1, _ => 10)
    val b = AdtsCodec.encode(5, 2, 1, _ => 10)
    val msg = intercept[IllegalArgumentException](
      AdtsCodec.parse(3L, a ++ b)).getMessage
    assert(msg.contains("parameter change"))
  }
}
