package graft.multimodal

/** MP3 metadata codec — self-written walker + writer for the ID3v2.3
  * tag layer (public spec: id3.org ID3v2.3.0) and the MPEG-1 Layer III
  * frame-header layer (ISO/IEC 11172-3) — the most common audio file
  * on the public web, hence the audio ingest surface a crawl pipeline
  * meets right after WAV/FLAC. What parses for REAL with zero codec
  * libraries:
  *
  *  - ID3v2.3: the 10-byte tag header (syncsafe size), the frame walk
  *    (4-byte id, big-endian size, 2 flag bytes), ISO-8859-1 text
  *    frames (TIT2 title, TPE1 artist);
  *  - the MPEG frame-header walk: 11-bit sync, version/layer bits, the
  *    published bitrate and sample-rate index tables for MPEG-1 Layer
  *    III, padding — each frame's byte length is
  *    `144·bitrate/sampleRate + padding`, so the walk counts frames
  *    and audio bytes in O(nFrames) header reads, and duration falls
  *    out as `nFrames · 1152 / sampleRate` (1152 samples per L3
  *    frame).
  *
  * The frame PAYLOAD (Huffman-coded MDCT subband data) is counted,
  * never decoded — the same documented entropy-codec seam as H.264/
  * AAC ([[Multimodal]]). Malformed bytes throw
  * `IllegalArgumentException` naming the doc id: every size is
  * bounds-checked, a bad sync or reserved table index can never hang
  * the walk or return garbage. */
object Mp3Codec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("audio/mpeg")

  /** MPEG-1 Layer III bitrate table, kbit/s (index 1–14; 0 = free
    * format and 15 = reserved are both rejected). */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, Hz (index 3 = reserved, rejected). */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  val SamplesPerFrame = 1152

  /** One parsed MP3: the ID3v2 text facts plus the frame-walk facts.
    * `tagBytes` is the whole ID3v2 region (header + frames), so
    * `tagBytes + audioBytes == file length` — the tiling invariant the
    * walk enforces. */
  case class Mp3Meta(title: String, artist: String, tagBytes: Int,
      nFrames: Int, bitrateKbps: Int, sampleRate: Int, channels: Int,
      audioBytes: Long, durationMs: Long)

  // ------------------------------------------------------------- writer

  /** Write an ID3v2.3-tagged MPEG-1 Layer III file: TIT2 + TPE1 text
    * frames, then `nFrames` audio frames at the given table indexes,
    * padding bit set on every odd frame (so frame sizes genuinely
    * vary). Frame payloads are a deterministic counter fill (Huffman
    * data is the documented codec seam). */
  def encode(title: String, artist: String, bitrateIdx: Int,
      sampleRateIdx: Int, nFrames: Int, mono: Boolean): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"bad sample-rate index $sampleRateIdx")
    require(nFrames >= 1, "MP3 needs at least one audio frame")
    val out = new java.io.ByteArrayOutputStream()

    def textFrame(id: String, text: String): Array[Byte] = {
      val body = text.getBytes("ISO-8859-1")
      val f = new Array[Byte](10 + 1 + body.length)
      System.arraycopy(id.getBytes("US-ASCII"), 0, f, 0, 4)
      val sz = 1 + body.length // ID3v2.3 frame size is plain big-endian
      f(4) = (sz >>> 24).toByte; f(5) = ((sz >> 16) & 0xff).toByte
      f(6) = ((sz >> 8) & 0xff).toByte; f(7) = (sz & 0xff).toByte
      f(8) = 0; f(9) = 0 // frame flags
      f(10) = 0 // encoding: ISO-8859-1
      System.arraycopy(body, 0, f, 11, body.length)
      f
    }
    val frames = textFrame("TIT2", title) ++ textFrame("TPE1", artist)
    val tagSize = frames.length // syncsafe: 7 bits per byte
    require(tagSize < (1 << 28), "ID3 tag too large")
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0) // v2.3.0
    out.write(0) // flags
    out.write((tagSize >> 21) & 0x7f); out.write((tagSize >> 14) & 0x7f)
    out.write((tagSize >> 7) & 0x7f); out.write(tagSize & 0x7f)
    out.write(frames)

    val br = BitrateKbps(bitrateIdx) * 1000
    val sr = SampleRateHz(sampleRateIdx)
    var i = 0
    while (i < nFrames) {
      val pad = i % 2 // odd frames padded: sizes genuinely vary
      val len = 144 * br / sr + pad
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
      f(2) = ((bitrateIdx << 4) | (sampleRateIdx << 2) | (pad << 1)).toByte
      f(3) = (if (mono) 0xc0 else 0x00).toByte // channel mode
      var b = 4
      while (b < len) { f(b) = ((i + b) & 0xff).toByte; b += 1 }
      out.write(f)
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- walker

  /** Walk one MP3: ID3v2 tag then every MPEG frame header. O(tag
    * frames + audio frames) header reads; audio payload bytes are
    * never touched. The file must tile exactly (tag + frames = EOF). */
  def parse(docId: Long, bytes: Array[Byte]): Mp3Meta = {
    require(bytes.length >= 10, s"doc $docId: MP3 payload too short")
    var title = ""; var artist = ""
    var o = 0
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      require((bytes(3) & 0xff) == 3,
        s"doc $docId: only ID3v2.3 is handled, got v2.${bytes(3) & 0xff}")
      require((bytes(5) & 0xff) == 0,
        s"doc $docId: ID3v2 flags 0x%02x unsupported".format(bytes(5) & 0xff))
      val tagSize = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val tagEnd = 10 + tagSize
      require(tagEnd <= bytes.length,
        s"doc $docId: ID3v2 tag size overruns the file")
      var p = 10
      while (p + 10 <= tagEnd && bytes(p) != 0) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val sz = ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
          ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
        require(sz >= 0 && p + 10 + sz <= tagEnd,
          s"doc $docId: ID3 frame $id overruns the tag")
        if ((id == "TIT2" || id == "TPE1") && sz >= 1) {
          require((bytes(p + 10) & 0xff) == 0,
            s"doc $docId: ID3 frame $id uses a non-ISO-8859-1 encoding")
          val text = new String(bytes, p + 11, sz - 1, "ISO-8859-1")
          if (id == "TIT2") title = text else artist = text
        }
        p += 10 + sz
      }
      o = tagEnd
    }
    val tagBytes = o

    var nFrames = 0
    var bitrateIdx = -1; var srIdx = -1; var channels = 0
    var audioBytes = 0L
    while (o < bytes.length) {
      require(o + 4 <= bytes.length,
        s"doc $docId: truncated MPEG frame header at $o")
      require((bytes(o) & 0xff) == 0xff && (bytes(o + 1) & 0xe0) == 0xe0,
        s"doc $docId: missing MPEG frame sync at $o")
      require((bytes(o + 1) & 0x18) == 0x18,
        s"doc $docId: frame at $o is not MPEG-1")
      require((bytes(o + 1) & 0x06) == 0x02,
        s"doc $docId: frame at $o is not Layer III")
      val bi = (bytes(o + 2) >> 4) & 0xf
      val si = (bytes(o + 2) >> 2) & 0x3
      val pad = (bytes(o + 2) >> 1) & 0x1
      require(bi >= 1 && bi <= 14,
        s"doc $docId: frame at $o has reserved/free bitrate index $bi")
      require(si <= 2, s"doc $docId: frame at $o has reserved sample-rate index")
      if (nFrames == 0) {
        bitrateIdx = bi; srIdx = si
        channels = if (((bytes(o + 3) >> 6) & 0x3) == 0x3) 1 else 2
      } else require(bi == bitrateIdx && si == srIdx,
        s"doc $docId: VBR stream (frame $nFrames changes table indexes) — " +
          "only CBR is handled here")
      val len = 144 * (BitrateKbps(bi) * 1000) / SampleRateHz(si) + pad
      require(o + len <= bytes.length,
        s"doc $docId: MPEG frame at $o overruns the file")
      audioBytes += len
      nFrames += 1
      o += len
    }
    require(nFrames > 0, s"doc $docId: MP3 has no audio frames")
    val sr = SampleRateHz(srIdx)
    Mp3Meta(title, artist, tagBytes, nFrames, BitrateKbps(bitrateIdx), sr,
      channels, audioBytes, nFrames.toLong * SamplesPerFrame * 1000L / sr)
  }
}
