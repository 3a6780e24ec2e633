package graft.multimodal

/** MPEG transport stream (`.ts`) container codec — self-written demux
  * walker + writer for the broadcast/HLS transport format (public spec:
  * ISO/IEC 13818-1 "Systems"; every HLS segment on the public web is
  * one of these). After AVI (q110), MP4 (q115) and Y4M (q137) this is
  * the fourth container a multimodal ingest meets, and the first
  * MULTIPLEXED one: fixed 188-byte packets interleave many elementary
  * streams, so the walk is a demux, not a single-track seek.
  *
  * What parses for REAL here, with zero codec libraries:
  *  - the packet layer: sync byte, PID, payload_unit_start_indicator,
  *    adaptation-field control + length arithmetic, continuity
  *    counters (the per-PID mod-16 sequence that detects packet loss);
  *  - the PSI layer: PAT (PID 0) → program number + PMT PID, PMT →
  *    PCR PID + per-elementary-stream `stream_type`, both sections
  *    validated against their CRC32/MPEG checksums (poly 0x04C11DB7,
  *    init 0xFFFFFFFF, unreflected — table below).
  *
  * The elementary-stream PAYLOAD bytes (H.264 NALs, AAC ADTS frames)
  * are counted, never decoded — that is the same documented
  * inter-frame/entropy-codec seam as [[Multimodal]]'s H.264/AAC stubs.
  * Like [[AviCodec]]/[[Mp4Codec]]/[[Y4mCodec]], malformed bytes throw
  * `IllegalArgumentException` naming the doc id (never hang, never
  * return garbage): every adaptation length is bounds-checked, every
  * section length is range-checked before a single byte is read. */
object TsCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("video/mp2t")

  val PacketSize = 188
  private val SyncByte = 0x47

  /** Per-elementary-stream demux stats: the packet-layer facts a
    * transport health scan reports (payload bytes = post-adaptation
    * bytes, the PES budget; ccErrors counts mod-16 discontinuities). */
  case class EsStats(pid: Int, streamType: Int, nPackets: Int,
      payloadBytes: Long, nPusi: Int, ccErrors: Int)

  /** One demuxed transport stream: PSI facts + per-PID stats (ES PIDs
    * only, PAT/PMT packets excluded), sorted by pid. */
  case class Demux(programNumber: Int, pmtPid: Int, pcrPid: Int,
      nPackets: Int, streams: IndexedSeq[EsStats])

  /** Elementary-stream spec for [[encode]]: `nPackets` transport
    * packets on `pid` carrying `streamType` (0x1B H.264, 0x0F AAC per
    * the 13818-1 registry), the FIRST packet flagged PUSI and carrying
    * an adaptation field of `firstAdaptLen` bytes (0 = payload-only). */
  case class EsSpec(pid: Int, streamType: Int, nPackets: Int,
      firstAdaptLen: Int)

  // CRC32/MPEG-2 (unreflected, poly 0x04C11DB7, init 0xFFFFFFFF, no
  // final xor) — the checksum every PSI section carries.
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def crc32Mpeg(bytes: Array[Byte], from: Int, len: Int): Int = {
    var crc = 0xffffffff
    var i = from
    val end = from + len
    while (i < end) {
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- writer

  /** Write one single-program transport stream: a PAT packet (PID 0),
    * a PMT packet, then each stream's packets in spec order with
    * continuity counters 0,1,2,… mod 16. Payload fill bytes are a
    * deterministic per-PID counter pattern (they are PES budget, not
    * parsed content — the documented codec seam). */
  def encode(programNumber: Int, pmtPid: Int, pcrPid: Int,
      streams: Seq[EsSpec]): Array[Byte] = {
    require(streams.nonEmpty, "TS needs at least one elementary stream")
    require(pmtPid >= 0x0010 && pmtPid <= 0x1ffe, s"bad PMT PID $pmtPid")
    streams.foreach { s =>
      require(s.pid >= 0x0020 && s.pid <= 0x1ffe && s.pid != pmtPid,
        s"bad ES PID ${s.pid}")
      require(s.nPackets >= 1, s"ES ${s.pid}: needs >= 1 packet")
      require(s.firstAdaptLen >= 0 && s.firstAdaptLen <= 182,
        s"ES ${s.pid}: adaptation length ${s.firstAdaptLen} out of range")
    }
    val out = new java.io.ByteArrayOutputStream(
      PacketSize * (2 + streams.map(_.nPackets).sum))

    // PSI section bytes (table header through CRC), wrapped into one
    // packet each: pointer_field 0x00, section, 0xFF stuffing.
    def psiPacket(pid: Int, section: Array[Byte]): Array[Byte] = {
      val p = new Array[Byte](PacketSize)
      java.util.Arrays.fill(p, 0xff.toByte)
      p(0) = SyncByte.toByte
      p(1) = (0x40 | (pid >> 8)).toByte // PUSI set
      p(2) = (pid & 0xff).toByte
      p(3) = 0x10 // payload only, CC 0
      p(4) = 0 // pointer_field
      require(5 + section.length <= PacketSize,
        s"PSI section for PID $pid does not fit one packet")
      System.arraycopy(section, 0, p, 5, section.length)
      p
    }

    def section(tableId: Int, tableIdExt: Int, data: Array[Byte]): Array[Byte] = {
      // section_length counts from right after its own field to the end
      // of the CRC: 5 fixed header bytes + data + 4 CRC.
      val secLen = 5 + data.length + 4
      val s = new Array[Byte](3 + secLen)
      s(0) = tableId.toByte
      s(1) = (0xb0 | (secLen >> 8)).toByte // syntax=1, reserved bits set
      s(2) = (secLen & 0xff).toByte
      s(3) = (tableIdExt >> 8).toByte
      s(4) = (tableIdExt & 0xff).toByte
      s(5) = 0xc1.toByte // version 0, current_next=1
      s(6) = 0 // section_number
      s(7) = 0 // last_section_number
      System.arraycopy(data, 0, s, 8, data.length)
      val crc = crc32Mpeg(s, 0, 8 + data.length)
      s(8 + data.length) = (crc >>> 24).toByte
      s(9 + data.length) = ((crc >> 16) & 0xff).toByte
      s(10 + data.length) = ((crc >> 8) & 0xff).toByte
      s(11 + data.length) = (crc & 0xff).toByte
      s
    }

    // PAT: one program → PMT PID.
    out.write(psiPacket(0, section(0x00, 1, Array(
      (programNumber >> 8).toByte, (programNumber & 0xff).toByte,
      (0xe0 | (pmtPid >> 8)).toByte, (pmtPid & 0xff).toByte))))

    // PMT: PCR PID, empty program_info, one loop entry per stream.
    val pmtData = new java.io.ByteArrayOutputStream()
    pmtData.write(0xe0 | (pcrPid >> 8)); pmtData.write(pcrPid & 0xff)
    pmtData.write(0xf0); pmtData.write(0) // program_info_length 0
    streams.foreach { s =>
      pmtData.write(s.streamType)
      pmtData.write(0xe0 | (s.pid >> 8)); pmtData.write(s.pid & 0xff)
      pmtData.write(0xf0); pmtData.write(0) // ES_info_length 0
    }
    out.write(psiPacket(pmtPid, section(0x02, programNumber,
      pmtData.toByteArray)))

    // Elementary-stream packets.
    streams.foreach { s =>
      var j = 0
      while (j < s.nPackets) {
        val p = new Array[Byte](PacketSize)
        p(0) = SyncByte.toByte
        p(1) = (((if (j == 0) 0x40 else 0x00)) | (s.pid >> 8)).toByte
        p(2) = (s.pid & 0xff).toByte
        val adapt = if (j == 0) s.firstAdaptLen else 0
        val afc = if (adapt > 0) 0x3 else 0x1
        p(3) = ((afc << 4) | (j % 16)).toByte
        var body = 4
        if (adapt > 0) {
          p(4) = adapt.toByte
          // flags byte (PCR_flag if the 6-byte PCR fits) + stuffing.
          p(5) = (if (adapt >= 7) 0x10 else 0x00).toByte
          java.util.Arrays.fill(p, 6, 5 + adapt, 0xff.toByte)
          body = 5 + adapt
        }
        var b = body
        while (b < PacketSize) { // deterministic PES-budget fill
          p(b) = ((s.pid + j + b) & 0xff).toByte
          b += 1
        }
        out.write(p)
        j += 1
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- walker

  /** Demux the packet layer + PSI of one transport stream. One pass,
    * O(nPackets); ES payload bytes are never read (only counted). */
  def parse(docId: Long, bytes: Array[Byte]): Demux = {
    require(bytes.length > 0 && bytes.length % PacketSize == 0,
      s"doc $docId: TS length ${bytes.length} is not a multiple of 188")
    val n = bytes.length / PacketSize
    var programNumber = -1
    var pmtPid = -1
    var pcrPid = -1
    val streamType = scala.collection.mutable.Map[Int, Int]()
    case class Acc(var nPackets: Int = 0, var payloadBytes: Long = 0L,
      var nPusi: Int = 0, var ccErrors: Int = 0, var lastCc: Int = -1)
    val acc = scala.collection.mutable.LinkedHashMap[Int, Acc]()

    var k = 0
    while (k < n) {
      val o = k * PacketSize
      require((bytes(o) & 0xff) == SyncByte,
        s"doc $docId: packet $k missing 0x47 sync byte")
      val pid = ((bytes(o + 1) & 0x1f) << 8) | (bytes(o + 2) & 0xff)
      val pusi = (bytes(o + 1) & 0x40) != 0
      val afc = (bytes(o + 3) >> 4) & 0x3
      val cc = bytes(o + 3) & 0xf
      require(afc != 0, s"doc $docId: packet $k has reserved AFC 00")
      var body = o + 4
      if ((afc & 0x2) != 0) { // adaptation field present
        val aLen = bytes(o + 4) & 0xff
        val maxLen = if (afc == 0x2) 183 else 182
        require(aLen <= maxLen,
          s"doc $docId: packet $k adaptation length $aLen exceeds $maxLen")
        if (afc == 0x2) require(aLen == 183,
          s"doc $docId: packet $k adaptation-only but length $aLen != 183")
        body = o + 5 + aLen
      }
      val payloadLen = if ((afc & 0x1) != 0) o + PacketSize - body else 0

      if (pid == 0) { // ---- PAT
        require(pusi, s"doc $docId: multi-packet PAT unsupported here")
        val sec = sectionAt(docId, k, bytes, body, expectTableId = 0x00)
        // one 4-byte program entry after the 8-byte section header
        require(sec.dataLen >= 4,
          s"doc $docId: PAT carries no program entry")
        programNumber = ((bytes(sec.data) & 0xff) << 8) |
          (bytes(sec.data + 1) & 0xff)
        pmtPid = ((bytes(sec.data + 2) & 0x1f) << 8) |
          (bytes(sec.data + 3) & 0xff)
      } else if (pid == pmtPid) { // ---- PMT
        require(pusi, s"doc $docId: multi-packet PMT unsupported here")
        val sec = sectionAt(docId, k, bytes, body, expectTableId = 0x02)
        require(sec.dataLen >= 4, s"doc $docId: PMT too short")
        pcrPid = ((bytes(sec.data) & 0x1f) << 8) | (bytes(sec.data + 1) & 0xff)
        val piLen = ((bytes(sec.data + 2) & 0x0f) << 8) |
          (bytes(sec.data + 3) & 0xff)
        var e = sec.data + 4 + piLen
        val end = sec.data + sec.dataLen
        require(e <= end, s"doc $docId: PMT program_info overruns section")
        while (e < end) {
          require(e + 5 <= end,
            s"doc $docId: PMT stream loop entry overruns section")
          val st = bytes(e) & 0xff
          val esPid = ((bytes(e + 1) & 0x1f) << 8) | (bytes(e + 2) & 0xff)
          val esLen = ((bytes(e + 3) & 0x0f) << 8) | (bytes(e + 4) & 0xff)
          streamType(esPid) = st
          e += 5 + esLen
        }
        require(e == end, s"doc $docId: PMT stream loop misaligned")
      } else if (pid != 0x1fff) { // ---- elementary stream (skip null pkts)
        val a = acc.getOrElseUpdate(pid, Acc())
        a.nPackets += 1
        a.payloadBytes += payloadLen
        if (pusi) a.nPusi += 1
        if (payloadLen > 0) { // CC increments only on payload packets
          if (a.lastCc >= 0 && ((a.lastCc + 1) & 0xf) != cc) a.ccErrors += 1
          a.lastCc = cc
        }
      }
      k += 1
    }
    require(programNumber >= 0, s"doc $docId: TS has no PAT")
    require(pcrPid >= 0, s"doc $docId: TS has no PMT")
    acc.keys.foreach { pid =>
      require(streamType.contains(pid),
        s"doc $docId: PID $pid carries payload but is not in the PMT")
    }
    Demux(programNumber, pmtPid, pcrPid, n,
      acc.toIndexedSeq.map { case (pid, a) =>
        EsStats(pid, streamType(pid), a.nPackets, a.payloadBytes,
          a.nPusi, a.ccErrors)
      }.sortBy(_.pid))
  }

  private case class Section(data: Int, dataLen: Int)

  /** Validate one PSI section at `body` (pointer_field first) — table
    * id, length bounds, and the trailing CRC32/MPEG — and return the
    * post-header data window. */
  private def sectionAt(docId: Long, pkt: Int, bytes: Array[Byte],
      body: Int, expectTableId: Int): Section = {
    val lim = (body / PacketSize + 1) * PacketSize
    require(body + 1 <= lim, s"doc $docId: packet $pkt PSI pointer overruns")
    val ptr = bytes(body) & 0xff
    val s = body + 1 + ptr
    require(s + 3 <= lim, s"doc $docId: packet $pkt PSI header overruns")
    val tableId = bytes(s) & 0xff
    require(tableId == expectTableId,
      s"doc $docId: packet $pkt expected table 0x%02x, got 0x%02x"
        .format(expectTableId, tableId))
    val secLen = ((bytes(s + 1) & 0x0f) << 8) | (bytes(s + 2) & 0xff)
    require(s + 3 + secLen <= lim,
      s"doc $docId: packet $pkt PSI section overruns its packet")
    require(secLen >= 9, s"doc $docId: packet $pkt PSI section too short")
    val crcAt = s + 3 + secLen - 4
    val want = ((bytes(crcAt) & 0xff) << 24) | ((bytes(crcAt + 1) & 0xff) << 16) |
      ((bytes(crcAt + 2) & 0xff) << 8) | (bytes(crcAt + 3) & 0xff)
    val got = crc32Mpeg(bytes, s, 3 + secLen - 4)
    require(got == want,
      s"doc $docId: packet $pkt PSI CRC mismatch (corrupt section)")
    Section(s + 8, secLen - 5 - 4)
  }
}
