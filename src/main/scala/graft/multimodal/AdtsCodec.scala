package graft.multimodal

/** ADTS (Audio Data Transport Stream) codec — self-written walker +
  * writer for the transport layer every raw `.aac` stream and most
  * broadcast AAC rides on (public spec: ISO/IEC 14496-3 §1.A.3). This
  * narrows the compressed-audio seam from "AAC is opaque" to "the AAC
  * RAW DATA BLOCK is opaque": the framing — the part a 100 TB ingest
  * pipeline actually needs to shard, count, slice and align audio — is
  * real and byte-exact, while the payload (Huffman-coded MDCT data)
  * stays the same documented entropy-codec seam as MP3's subband data
  * and H.264's slices ([[Multimodal]], [[Mp3Codec]]).
  *
  * What parses for REAL: the 12-bit syncword walk, MPEG version bit,
  * layer bits (must be 00), the AOT profile field, the published
  * sampling-frequency-index table, channel configuration, the 13-bit
  * frame length (header-inclusive — the walk's tiling invariant), the
  * VBR buffer-fullness marker, raw-data-blocks-per-frame, and — for
  * protection_absent = 0 frames — the 16-bit CRC (the ISO/IEC 11172-3
  * CRC-16: poly 0x8005 MSB-first, init 0xFFFF) VERIFIED over the frame's
  * header and raw data block; a mismatch fails loudly, never a silent
  * skip. (The spec's bit-level CRC coverage ranges vary by raw-data-block
  * layout; this codec pins the byte-aligned form its writer emits —
  * 7 header bytes + payload — and any foreign coverage convention
  * surfaces as a loud mismatch, the honest failure mode for a walker
  * that cannot decode the entropy data anyway.) Every frame's length is
  * bounds-checked against the buffer; the frames must tile the payload
  * exactly; a bad sync, reserved table index or overrun throws
  * `IllegalArgumentException` naming the doc id (the codec-family
  * failure contract). */
object AdtsCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("audio/aac")

  /** The MPEG-4 sampling-frequency-index table (index 13–14 reserved,
    * 15 = explicit-frequency escape — all rejected). */
  val SampleRateHz: Array[Int] = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Samples per raw data block (the AAC-LC long-window frame). */
  val SamplesPerFrame = 1024

  val HeaderBytes = 7

  val CrcBytes = 2

  /** One parsed ADTS stream: per-stream facts from the header walk.
    * `audioBytes` counts raw-data-block payload only (length minus
    * headers and CRC words), so `audioBytes + nFrames·7 +
    * crcFrames·2 == stream length` — the tiling invariant the walk
    * enforces. `crcFrames` counts the protection_absent = 0 frames
    * whose CRC verified. */
  case class AdtsMeta(nFrames: Int, profile: Int, sampleRate: Int,
      channels: Int, audioBytes: Long, durationMs: Long, crcFrames: Int)

  /** ISO/IEC 11172-3 CRC-16 (poly x^16+x^15+x^2+1 = 0x8005, MSB-first,
    * init 0xFFFF) over `[from, until)`, chainable via `init`. */
  private def crc16(bytes: Array[Byte], from: Int, until: Int,
      init: Int = 0xffff): Int = {
    var crc = init
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- writer

  /** Write an ADTS stream: `nFrames` frames at the given table indexes,
    * AAC-LC profile, one raw data block per frame. Payload byte counts
    * come from `payloadLen(i)` so frame sizes genuinely vary; payload
    * bytes are a deterministic counter fill (the raw data block is the
    * documented codec seam). `crc = true` writes protection_absent = 0
    * frames: the 13-bit length grows by the 2 CRC bytes that follow the
    * header, CRC-16 computed over header + payload. */
  def encode(sampleRateIdx: Int, channels: Int, nFrames: Int,
      payloadLen: Int => Int, crc: Boolean = false): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 12,
      s"bad sampling frequency index $sampleRateIdx")
    require(channels >= 1 && channels <= 7, s"bad channel config $channels")
    val crcB = if (crc) CrcBytes else 0
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until nFrames) {
      val plen = payloadLen(i)
      require(plen >= 1 && plen <= (1 << 13) - 1 - HeaderBytes - crcB,
        s"bad payload length $plen for frame $i")
      val flen = HeaderBytes + crcB + plen
      val frame = new Array[Byte](HeaderBytes + plen)
      // syncword FFF, ID=0 (MPEG-4), layer=00, protection_absent bit
      frame(0) = 0xff.toByte
      frame(1) = (0xf0 | (if (crc) 0x0 else 0x1)).toByte
      // profile=01 (AAC-LC: AOT 2 - 1), sfi, private=0, channels[2]
      frame(2) = ((0x1 << 6) | (sampleRateIdx << 2) | ((channels >> 2) & 0x1)).toByte
      // channels[1:0], orig=0, home=0, cid=0, cstart=0, frameLen[12:11]
      frame(3) = (((channels & 0x3) << 6) | ((flen >> 11) & 0x3)).toByte
      frame(4) = ((flen >> 3) & 0xff).toByte // frameLen[10:3]
      // frameLen[2:0], fullness[10:6] (VBR marker 0x7ff)
      frame(5) = (((flen & 0x7) << 5) | 0x1f).toByte
      frame(6) = 0xfc.toByte // fullness[5:0]=all-ones, rdb-1 = 0
      for (j <- 0 until plen)
        frame(HeaderBytes + j) = ((i * 31 + j) & 0xff).toByte
      out.write(frame, 0, HeaderBytes)
      if (crc) {
        val v = crc16(frame, 0, frame.length)
        out.write((v >> 8) & 0xff); out.write(v & 0xff)
      }
      out.write(frame, HeaderBytes, plen)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- walker

  /** Walk one ADTS stream: header-read per frame, O(nFrames), payload
    * never decoded. The whole buffer must tile into frames. */
  def parse(docId: Long, bytes: Array[Byte]): AdtsMeta = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    var o = 0
    var n = 0
    var crcN = 0
    var profile = -1; var sfi = -1; var ch = -1
    var audio = 0L
    while (o < bytes.length) {
      if (o + HeaderBytes > bytes.length) fail(s"truncated ADTS header at $o")
      def u(i: Int) = bytes(o + i) & 0xff
      if (u(0) != 0xff || (u(1) & 0xf0) != 0xf0) fail(s"bad ADTS sync at $o")
      if ((u(1) & 0x06) != 0) fail(s"nonzero layer bits at $o")
      if ((u(1) & 0x08) != 0) fail(s"MPEG-2 (ID=1) ADTS frame at $o — " +
        "this walker parses the MPEG-4 (ID=0) streams its writer emits")
      val hasCrc = (u(1) & 0x01) == 0
      val p = (u(2) >> 6) & 0x3
      val s = (u(2) >> 2) & 0xf
      if (s > 12) fail(s"reserved sampling frequency index $s at $o")
      val c = ((u(2) & 0x1) << 2) | ((u(3) >> 6) & 0x3)
      if (c == 0) fail(s"program-config-element channel setup at $o — " +
        "out of this walker's scope")
      val hdr = HeaderBytes + (if (hasCrc) CrcBytes else 0)
      val flen = ((u(3) & 0x3) << 11) | (u(4) << 3) | ((u(5) >> 5) & 0x7)
      if (flen < hdr || o + flen > bytes.length)
        fail(s"frame at $o overruns the stream (len $flen)")
      val rdb = (u(6) & 0x3) + 1
      if (rdb != 1) fail(s"$rdb raw data blocks per frame at $o — " +
        "not produced by this codec's writer")
      if (n == 0) { profile = p; sfi = s; ch = c }
      else if (p != profile || s != sfi || c != ch)
        fail(s"mid-stream parameter change at $o")
      if (hasCrc) {
        // header + raw data block, the CRC word itself excluded
        val computed = crc16(bytes, o + HeaderBytes + CrcBytes, o + flen,
          init = crc16(bytes, o, o + HeaderBytes))
        val stored = (u(7) << 8) | u(8)
        if (computed != stored)
          fail(f"ADTS CRC mismatch at $o (stored 0x$stored%04x, " +
            f"computed 0x$computed%04x)")
        crcN += 1
      }
      audio += flen - hdr
      o += flen
      n += 1
    }
    if (n == 0) fail("empty ADTS stream")
    AdtsMeta(n, profile, SampleRateHz(sfi), ch, audio,
      n.toLong * SamplesPerFrame * 1000L / SampleRateHz(sfi), crcN)
  }
}
