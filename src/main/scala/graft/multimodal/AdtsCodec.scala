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
  * VBR buffer-fullness marker, and raw-data-blocks-per-frame. Every
  * frame's length is bounds-checked against the buffer; the frames
  * must tile the payload exactly; a bad sync, reserved table index or
  * overrun throws `IllegalArgumentException` naming the doc id (the
  * codec-family failure contract). CRC-protected frames
  * (protection_absent = 0) are rejected loudly — the writer never
  * produces them, and silently skipping an unverified CRC would be the
  * wrong-but-plausible path this module must not have. */
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

  /** One parsed ADTS stream: per-stream facts from the header walk.
    * `audioBytes` counts raw-data-block payload only (length minus the
    * headers), so `audioBytes + nFrames·7 == stream length` — the
    * tiling invariant the walk enforces. */
  case class AdtsMeta(nFrames: Int, profile: Int, sampleRate: Int,
      channels: Int, audioBytes: Long, durationMs: Long)

  // ------------------------------------------------------------- writer

  /** Write an ADTS stream: `nFrames` frames at the given table indexes,
    * AAC-LC profile, protection_absent = 1 (no CRC), one raw data block
    * per frame. Payload byte counts come from `payloadLen(i)` so frame
    * sizes genuinely vary; payload bytes are a deterministic counter
    * fill (the raw data block is the documented codec seam). */
  def encode(sampleRateIdx: Int, channels: Int, nFrames: Int,
      payloadLen: Int => Int): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 12,
      s"bad sampling frequency index $sampleRateIdx")
    require(channels >= 1 && channels <= 7, s"bad channel config $channels")
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until nFrames) {
      val plen = payloadLen(i)
      require(plen >= 1 && plen <= (1 << 13) - 1 - HeaderBytes,
        s"bad payload length $plen for frame $i")
      val flen = HeaderBytes + plen
      // syncword FFF, ID=0 (MPEG-4), layer=00, protection_absent=1
      out.write(0xff); out.write(0xf1)
      // profile=01 (AAC-LC: AOT 2 - 1), sfi, private=0, channels[2]
      out.write((0x1 << 6) | (sampleRateIdx << 2) | ((channels >> 2) & 0x1))
      // channels[1:0], orig=0, home=0, cid=0, cstart=0, frameLen[12:11]
      out.write(((channels & 0x3) << 6) | ((flen >> 11) & 0x3))
      out.write((flen >> 3) & 0xff) // frameLen[10:3]
      // frameLen[2:0], fullness[10:6] (VBR marker 0x7ff)
      out.write(((flen & 0x7) << 5) | 0x1f)
      out.write(0xfc) // fullness[5:0]=all-ones, rdb-1 = 0
      for (j <- 0 until plen) out.write((i * 31 + j) & 0xff)
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
    var profile = -1; var sfi = -1; var ch = -1
    var audio = 0L
    while (o < bytes.length) {
      if (o + HeaderBytes > bytes.length) fail(s"truncated ADTS header at $o")
      def u(i: Int) = bytes(o + i) & 0xff
      if (u(0) != 0xff || (u(1) & 0xf0) != 0xf0) fail(s"bad ADTS sync at $o")
      if ((u(1) & 0x06) != 0) fail(s"nonzero layer bits at $o")
      if ((u(1) & 0x08) != 0) fail(s"MPEG-2 (ID=1) ADTS frame at $o — " +
        "this walker parses the MPEG-4 (ID=0) streams its writer emits")
      if ((u(1) & 0x01) == 0)
        fail(s"CRC-protected ADTS frame at $o — not produced by this " +
          "codec's writer")
      val p = (u(2) >> 6) & 0x3
      val s = (u(2) >> 2) & 0xf
      if (s > 12) fail(s"reserved sampling frequency index $s at $o")
      val c = ((u(2) & 0x1) << 2) | ((u(3) >> 6) & 0x3)
      if (c == 0) fail(s"program-config-element channel setup at $o — " +
        "out of this walker's scope")
      val flen = ((u(3) & 0x3) << 11) | (u(4) << 3) | ((u(5) >> 5) & 0x7)
      if (flen < HeaderBytes || o + flen > bytes.length)
        fail(s"frame at $o overruns the stream (len $flen)")
      val rdb = (u(6) & 0x3) + 1
      if (rdb != 1) fail(s"$rdb raw data blocks per frame at $o — " +
        "not produced by this codec's writer")
      if (n == 0) { profile = p; sfi = s; ch = c }
      else if (p != profile || s != sfi || c != ch)
        fail(s"mid-stream parameter change at $o")
      audio += flen - HeaderBytes
      o += flen
      n += 1
    }
    if (n == 0) fail("empty ADTS stream")
    AdtsMeta(n, profile, SampleRateHz(sfi), ch, audio,
      n.toLong * SamplesPerFrame * 1000L / SampleRateHz(sfi))
  }
}
