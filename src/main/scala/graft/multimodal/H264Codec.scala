package graft.multimodal

/** H.264/AVC Annex-B codec — self-written walker + writer for the NAL
  * transport layer every raw `.h264` elementary stream (and every
  * MPEG-TS video PID) rides on (public spec: ITU-T H.264 / ISO/IEC
  * 14496-10, §7.3–7.4 + Annex B). This narrows the compressed-VIDEO
  * seam the same way [[AdtsCodec]] narrowed audio's: the framing a
  * 100 TB ingest pipeline actually needs — shard boundaries, keyframe
  * (IDR) positions for splittable range reads, stream geometry for
  * size/quality filters — is real and bit-exact, while the slice DATA
  * (CAVLC/CABAC-coded residuals) stays the same documented
  * entropy-codec seam as MP3 subband data and AAC raw data blocks.
  *
  * What parses for REAL:
  *  - the Annex-B start-code scan (both the 3-byte `000001` and the
  *    `zero_byte`-prefixed 4-byte form real encoders emit before
  *    parameter sets and IDR frames);
  *  - the NAL header (forbidden_zero_bit, nal_ref_idc, nal_unit_type);
  *  - RBSP emulation-prevention removal (`00 00 03 0x` → `00 00 0x`,
  *    §7.4.1.1) — and the writer performs the inverse escape, so the
  *    gate's payloads genuinely contain sequences that would alias a
  *    start code if either side were wrong;
  *  - a bit-exact exp-Golomb SPS parse (profile_idc, level_idc, the
  *    High-profile chroma/bit-depth block, log2_max_frame_num,
  *    pic_width_in_mbs / pic_height_in_map_units → luma dimensions,
  *    frame_mbs_only) and the PPS id fields;
  *  - stream-structure rules: SPS before PPS before slices, first
  *    slice is IDR, every NAL bounds-checked, the whole buffer must
  *    tile into NALs.
  *
  * Out of this walker's scope, rejected loudly rather than skipped:
  * interlaced streams (frame_mbs_only_flag = 0), frame cropping, VUI,
  * scaling matrices, separate colour planes, and every NAL type the
  * writer does not produce (SEI, AUD, slice partitions). Slice
  * headers/data are counted and checksummed, never decoded. */
object H264Codec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("video/h264")

  /** profile_idc values whose SPS carries the chroma-format /
    * bit-depth / scaling-matrix block (§7.3.2.1.1's high-profile
    * condition list). */
  val HighProfiles: Set[Int] =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** One parsed elementary stream: transport-layer facts only.
    * `sliceRbspBytes`/`sliceRbspSum` count and sum the slice RBSP
    * payload bytes AFTER emulation-prevention removal (so they are
    * reproducible closed-form from what the producer wrote, no matter
    * how many escape bytes the wire form needed). */
  case class H264Meta(width: Int, height: Int, profile: Int, level: Int,
      maxFrameNum: Int, chromaFormat: Int, nIdr: Int, nNonIdr: Int,
      sliceRbspBytes: Long, sliceRbspSum: Long)

  // --------------------------------------------------------- bit I/O

  /** MSB-first bit writer with the exp-Golomb codes SPS/PPS use. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    /** ue(v): leadingZeroBits zeros, then (v+1) in leadingZeroBits+1 bits. */
    def ue(v: Int): Unit = {
      require(v >= 0, s"ue($v)")
      val lz = 31 - Integer.numberOfLeadingZeros(v + 1)
      u(lz, 0); u(lz + 1, v + 1)
    }
    /** se(v): the signed mapping k>0 → 2k-1, k<=0 → -2k (§9.1.1). */
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte boundary. */
    def trailing(): Unit = { u(1, 1); if (nbits != 0) u(8 - nbits, 0) }
    def toBytes: Array[Byte] = {
      require(nbits == 0, "unterminated RBSP — call trailing()")
      buf.toByteArray
    }
  }

  /** MSB-first bit reader over an (already unescaped) RBSP. */
  private final class BitReader(bytes: Array[Byte], docId: Long) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = pos >> 3
        if (byteIdx >= bytes.length)
          throw new IllegalArgumentException(
            s"doc $docId: truncated RBSP at bit $pos")
        v = (v << 1) | ((bytes(byteIdx) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var lz = 0
      while (u(1) == 0) {
        lz += 1
        if (lz > 31) throw new IllegalArgumentException(
          s"doc $docId: exp-Golomb prefix overruns 31 bits")
      }
      ((1 << lz) | u(lz)) - 1
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  // --------------------------------------- emulation prevention layer

  /** RBSP → EBSP: insert `03` after every `00 00` that precedes a byte
    * `<= 03` (§7.4.1.1 — without this, payload bytes could alias a
    * start code and corrupt the Annex-B scan). */
  def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** EBSP slice `[from, to)` → RBSP: drop each `03` in a `00 00 03`
    * run after checking the byte it protects is `<= 03` (a bare
    * `00 00 0x` with x <= 2 inside a NAL is illegal and fails). */
  def unescape(docId: Long, ebsp: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var zeros = 0
    var i = from
    while (i < to) {
      val b = ebsp(i) & 0xff
      if (zeros >= 2 && b <= 2)
        throw new IllegalArgumentException(
          s"doc $docId: unescaped 00 00 0$b inside a NAL at ${i - 2}")
      if (zeros >= 2 && b == 3) {
        if (i + 1 < to && (ebsp(i + 1) & 0xff) > 3)
          throw new IllegalArgumentException(
            s"doc $docId: emulation byte at $i protects nothing")
        zeros = 0
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ writer

  private def nal(out: java.io.ByteArrayOutputStream, longStart: Boolean,
      refIdc: Int, nalType: Int, rbsp: Array[Byte]): Unit = {
    if (longStart) out.write(0)
    out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | nalType)
    out.write(escape(rbsp))
  }

  /** Write an Annex-B elementary stream: one SPS (4-byte start code),
    * one PPS (3-byte), then `nFrames` single-NAL frames — frame `i` is
    * IDR (type 5, 4-byte start code) iff `i % idrEvery == 0`, non-IDR
    * (type 1, 3-byte) otherwise. Slice RBSP bytes come from
    * `payloadByte(i, j)` for `j < payloadLen(i)`; the LAST byte of
    * each slice must be nonzero (trailing RBSP zeros are not
    * recoverable once a start code follows — the real reason §7.4.2.7
    * lets decoders discard them, and a byte-exact walk can't allow
    * that ambiguity). */
  def encode(widthMbs: Int, heightMapUnits: Int, profileIdc: Int,
      levelIdc: Int, log2MaxFrameNumMinus4: Int, nFrames: Int,
      idrEvery: Int, payloadLen: Int => Int,
      payloadByte: (Int, Int) => Int): Array[Byte] = {
    require(widthMbs >= 1 && heightMapUnits >= 1,
      s"bad geometry ${widthMbs}x$heightMapUnits MBs")
    require(log2MaxFrameNumMinus4 >= 0 && log2MaxFrameNumMinus4 <= 12,
      s"bad log2_max_frame_num_minus4 $log2MaxFrameNumMinus4")
    require(nFrames >= 1 && idrEvery >= 1, s"bad cadence $nFrames/$idrEvery")

    val sps = new BitWriter
    sps.u(8, profileIdc)
    sps.u(8, 0) // constraint_set flags + reserved_zero_2bits
    sps.u(8, levelIdc)
    sps.ue(0) // seq_parameter_set_id
    if (HighProfiles(profileIdc)) {
      sps.ue(1) // chroma_format_idc = 4:2:0
      sps.ue(0); sps.ue(0) // bit_depth_{luma,chroma}_minus8
      sps.u(1, 0) // qpprime_y_zero_transform_bypass_flag
      sps.u(1, 0) // seq_scaling_matrix_present_flag
    }
    sps.ue(log2MaxFrameNumMinus4)
    sps.ue(2) // pic_order_cnt_type = 2 (display order = decode order)
    sps.ue(1) // max_num_ref_frames
    sps.u(1, 0) // gaps_in_frame_num_value_allowed_flag
    sps.ue(widthMbs - 1) // pic_width_in_mbs_minus1
    sps.ue(heightMapUnits - 1) // pic_height_in_map_units_minus1
    sps.u(1, 1) // frame_mbs_only_flag (progressive only)
    sps.u(1, 1) // direct_8x8_inference_flag
    sps.u(1, 0) // frame_cropping_flag
    sps.u(1, 0) // vui_parameters_present_flag
    sps.trailing()

    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pic_parameter_set_id, seq_parameter_set_id
    pps.u(1, 0) // entropy_coding_mode_flag (CAVLC)
    pps.u(1, 0) // bottom_field_pic_order_in_frame_present_flag
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    pps.u(1, 0) // weighted_pred_flag
    pps.u(2, 0) // weighted_bipred_idc
    pps.se(0); pps.se(0); pps.se(0) // pic_init_qp/qs, chroma_qp_offset
    pps.u(1, 0) // deblocking_filter_control_present_flag
    pps.u(1, 0) // constrained_intra_pred_flag
    pps.u(1, 0) // redundant_pic_cnt_present_flag
    pps.trailing()

    val out = new java.io.ByteArrayOutputStream()
    nal(out, longStart = true, refIdc = 3, nalType = 7, sps.toBytes)
    nal(out, longStart = false, refIdc = 3, nalType = 8, pps.toBytes)
    for (i <- 0 until nFrames) {
      val plen = payloadLen(i)
      require(plen >= 1, s"empty slice payload for frame $i")
      val rbsp = Array.tabulate[Byte](plen)(j => payloadByte(i, j).toByte)
      require(rbsp(plen - 1) != 0,
        s"frame $i slice payload ends in 00 — trailing RBSP zeros are " +
          "ambiguous against the next start code")
      val idr = i % idrEvery == 0
      nal(out, longStart = idr, refIdc = if (idr) 3 else 2,
        nalType = if (idr) 5 else 1, rbsp)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ walker

  /** Walk one Annex-B stream: start-code scan → NAL header → SPS/PPS
    * bit parse, slice RBSPs counted + summed, never decoded.
    * O(bytes) single pass; the whole buffer must tile into NALs. */
  def parse(docId: Long, bytes: Array[Byte]): H264Meta = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    if (bytes.length < 4) fail("stream shorter than one start code")

    /** Index of the next `00 00 01` at or after `from`, or -1. */
    def nextStart(from: Int): Int = {
      var i = from
      while (i + 2 < bytes.length) {
        if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) return i
        i += 1
      }
      -1
    }

    val first = nextStart(0)
    if (first != 0 && !(first == 1 && bytes(0) == 0))
      fail("stream does not begin with an Annex-B start code")

    var width = -1; var height = -1; var profile = -1; var level = -1
    var maxFrameNum = -1; var chroma = -1
    var ppsSeen = false
    var nIdr = 0; var nNonIdr = 0
    var sliceBytes = 0L; var sliceSum = 0L

    var o = first + 3 // first NAL header byte
    while (o < bytes.length) {
      // span of this NAL: up to the next start code, minus the
      // zero_byte that belongs to a following 4-byte start code.
      val next = nextStart(o)
      var end = if (next < 0) bytes.length else next
      if (next > o && bytes(end - 1) == 0) end -= 1
      if (end <= o) fail(s"empty NAL at $o")
      val hdr = bytes(o) & 0xff
      if ((hdr & 0x80) != 0) fail(s"forbidden_zero_bit set at $o")
      val refIdc = (hdr >> 5) & 0x3
      val nalType = hdr & 0x1f
      nalType match {
        case 7 =>
          if (width >= 0) fail(s"second SPS at $o")
          val r = new BitReader(unescape(docId, bytes, o + 1, end), docId)
          profile = r.u(8)
          r.u(8) // constraint flags
          level = r.u(8)
          if (r.ue() != 0) fail(s"SPS at $o: nonzero seq_parameter_set_id")
          chroma = if (HighProfiles(profile)) {
            val cf = r.ue()
            if (cf == 3) fail(s"SPS at $o: separate-colour-plane stream " +
              "— out of this walker's scope")
            if (r.ue() != 0 || r.ue() != 0)
              fail(s"SPS at $o: >8-bit stream — out of scope")
            r.u(1) // qpprime_y_zero_transform_bypass_flag
            if (r.u(1) != 0) fail(s"SPS at $o: scaling matrices — out " +
              "of this walker's scope")
            cf
          } else 1 // chroma_format_idc absent ⇒ inferred 4:2:0
          maxFrameNum = 1 << (r.ue() + 4)
          val poc = r.ue()
          if (poc == 1) { // delta-based POC carries a ue list — skip it
            r.u(1); r.se(); r.se()
            val n = r.ue(); var k = 0
            while (k < n) { r.se(); k += 1 }
          }
          r.ue() // max_num_ref_frames
          r.u(1) // gaps_in_frame_num_value_allowed_flag
          width = (r.ue() + 1) * 16
          val hUnits = r.ue() + 1
          val frameMbsOnly = r.u(1)
          if (frameMbsOnly != 1)
            fail(s"SPS at $o: interlaced stream — out of scope")
          height = hUnits * 16
          r.u(1) // direct_8x8_inference_flag
          if (r.u(1) != 0) fail(s"SPS at $o: frame cropping — out of scope")
          if (r.u(1) != 0) fail(s"SPS at $o: VUI — out of scope")
        case 8 =>
          if (width < 0) fail(s"PPS at $o before any SPS")
          val r = new BitReader(unescape(docId, bytes, o + 1, end), docId)
          if (r.ue() != 0 || r.ue() != 0)
            fail(s"PPS at $o: nonzero parameter-set ids")
          ppsSeen = true
        case 5 | 1 =>
          if (!ppsSeen) fail(s"slice at $o before SPS+PPS")
          if (nalType == 1 && nIdr == 0)
            fail(s"non-IDR slice at $o before any IDR — undecodable head")
          if (nalType == 5 && refIdc == 0)
            fail(s"IDR at $o with nal_ref_idc 0")
          val rbsp = unescape(docId, bytes, o + 1, end)
          if (rbsp.isEmpty) fail(s"empty slice RBSP at $o")
          if (nalType == 5) nIdr += 1 else nNonIdr += 1
          sliceBytes += rbsp.length
          var j = 0
          while (j < rbsp.length) { sliceSum += rbsp(j) & 0xff; j += 1 }
        case t =>
          fail(s"NAL type $t at $o — not produced by this codec's writer")
      }
      if (next >= 0 && next + 3 >= bytes.length)
        fail(s"dangling start code at $next — no NAL follows")
      o = if (next < 0) bytes.length else next + 3
    }
    if (width < 0) fail("no SPS in stream")
    if (nIdr == 0) fail("no IDR frame in stream")
    H264Meta(width, height, profile, level, maxFrameNum, chroma,
      nIdr, nNonIdr, sliceBytes, sliceSum)
  }
}
