package graft.multimodal

/** WARC web-archive codec — self-written reader + writer for the
  * format LLM pretraining corpora are actually mined from (public
  * spec: ISO 28500 / WARC 1.1; Common Crawl ships every crawl as
  * `.warc.gz` files in exactly the member-per-record layout written
  * here). After the media containers (AVI/MP4/Y4M/TS/FLAC) this is
  * the TEXT-pipeline container: a crawl ingest's first stage is this
  * walk, before any language ID, quality gate or dedup ever runs.
  *
  * What parses for REAL here, with zero new dependencies:
  *  - the gzip MEMBER layer: Common Crawl compresses each record as
  *    its own gzip member and concatenates them, so readers can split
  *    work at member boundaries without inflating the whole file.
  *    The reader walks members with `java.util.zip.Inflater` (raw
  *    deflate after a validated 10-byte gzip header) and verifies
  *    each member's CRC32 + ISIZE trailer — `GZIPInputStream` is NOT
  *    used because it hides member boundaries, and the boundary is
  *    the unit of parallelism at 100 TB;
  *  - the WARC framing: `WARC/1.x` version line, CRLF-terminated
  *    named headers, `Content-Length`-framed content block, the
  *    mandatory CRLF CRLF record terminator;
  *  - the HTTP layer of `response` records: status line + header /
  *    body split at the first CRLF CRLF, which is where the actual
  *    document bytes live.
  *
  * Like the media codecs, malformed bytes throw
  * `IllegalArgumentException` naming the doc id — every length is
  * bounds-checked before a byte is read, a truncated member or a
  * Content-Length overrun can never hang or return garbage. */
object WarcCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("application/warc", "application/warc+gzip")

  /** One WARC record for [[encode]]: `warcType` per the ISO 28500
    * registry (`response`, `metadata`, …), `targetUri`/`date` go out
    * verbatim as `WARC-Target-URI`/`WARC-Date`, `content` is the
    * record's content block (for `response` records: the full HTTP
    * message, status line first). */
  case class WarcRecord(warcType: String, targetUri: String, date: String,
      contentType: String, content: Array[Byte])

  /** One parsed record: the framing facts plus the HTTP split for
    * `response` records (`httpStatus` = -1 and `payload` = the whole
    * content block for non-HTTP records). `memberBytes` is the size
    * of the record's own gzip member (0 when the input was plain). */
  case class ParsedRecord(warcType: String, targetUri: String, date: String,
      contentType: String, contentLength: Int, httpStatus: Int,
      httpHeaderBytes: Int, payload: Array[Byte], memberBytes: Int)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  // ------------------------------------------------------------- writer

  private def recordBytes(r: WarcRecord, i: Int): Array[Byte] = {
    val head = new StringBuilder()
    head ++= "WARC/1.1\r\n"
    head ++= s"WARC-Type: ${r.warcType}\r\n"
    head ++= s"WARC-Record-ID: <urn:graft:record-$i>\r\n"
    head ++= s"WARC-Date: ${r.date}\r\n"
    head ++= s"WARC-Target-URI: ${r.targetUri}\r\n"
    head ++= s"Content-Type: ${r.contentType}\r\n"
    head ++= s"Content-Length: ${r.content.length}\r\n"
    head ++= "\r\n"
    val out = new java.io.ByteArrayOutputStream(
      head.length + r.content.length + 4)
    out.write(head.toString.getBytes("US-ASCII"))
    out.write(r.content)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Render records as one plain WARC file (version line, headers,
    * content block, CRLF CRLF terminator — ISO 28500 §4). */
  def encode(records: Seq[WarcRecord]): Array[Byte] = {
    require(records.nonEmpty, "WARC needs at least one record")
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) => out.write(recordBytes(r, i)) }
    out.toByteArray
  }

  /** Render records as a Common-Crawl-layout `.warc.gz`: each record
    * a complete gzip member, members concatenated. */
  def encodeGzip(records: Seq[WarcRecord]): Array[Byte] = {
    require(records.nonEmpty, "WARC needs at least one record")
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(recordBytes(r, i))
      gz.finish()
      // close() ends the native Deflater NOW (closing the underlying
      // ByteArrayOutputStream is a no-op). Without it every member
      // leaks a native zlib stream until finalization — measured as a
      // 30×/decade blow-up at the sf1 sweep (100k live deflaters).
      gz.close()
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- reader

  /** Parse one WARC file, plain or member-gzipped (auto-detected from
    * the 0x1f8b magic). One pass; content blocks are sliced, never
    * scanned, so the walk is O(headers + payload copy). */
  def parse(docId: Long, bytes: Array[Byte]): IndexedSeq[ParsedRecord] = {
    require(bytes.length >= 2, s"doc $docId: WARC payload too short")
    if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      gzipMembers(docId, bytes).flatMap { case (plain, memberBytes) =>
        parsePlain(docId, plain).map(_.copy(memberBytes = memberBytes))
      }
    } else parsePlain(docId, bytes)
  }

  /** Split a concatenated-member gzip stream into (inflated bytes,
    * member compressed size) pairs, verifying each member's header
    * magic, CRC32 and ISIZE trailer (RFC 1952). */
  def gzipMembers(docId: Long,
      bytes: Array[Byte]): IndexedSeq[(Array[Byte], Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Array[Byte], Int)]()
    var o = 0
    while (o < bytes.length) {
      require(o + 10 <= bytes.length,
        s"doc $docId: truncated gzip member header at $o")
      require((bytes(o) & 0xff) == 0x1f && (bytes(o + 1) & 0xff) == 0x8b,
        s"doc $docId: bad gzip magic at member offset $o")
      require((bytes(o + 2) & 0xff) == 8,
        s"doc $docId: gzip member at $o is not deflate")
      val flg = bytes(o + 3) & 0xff
      require((flg & 0xe0) == 0,
        s"doc $docId: gzip member at $o sets reserved FLG bits")
      var h = o + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        require(h + 2 <= bytes.length, s"doc $docId: truncated FEXTRA at $h")
        val xlen = (bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)
        h += 2 + xlen
      }
      if ((flg & 0x08) != 0) h = skipZeroTerminated(docId, bytes, h) // FNAME
      if ((flg & 0x10) != 0) h = skipZeroTerminated(docId, bytes, h) // FCOMMENT
      if ((flg & 0x02) != 0) h += 2 // FHCRC
      require(h <= bytes.length, s"doc $docId: gzip member header overruns")

      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(bytes, h, bytes.length - h)
      val buf = new Array[Byte](8192)
      val body = new java.io.ByteArrayOutputStream()
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
            s"doc $docId: truncated deflate stream in member at $o")
          body.write(buf, 0, n)
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"doc $docId: corrupt deflate stream in member at $o: " +
              e.getMessage)
      }
      val compressed = inf.getBytesRead.toInt
      inf.end()
      val trailerAt = h + compressed
      require(trailerAt + 8 <= bytes.length,
        s"doc $docId: gzip member at $o missing its 8-byte trailer")
      val plain = body.toByteArray
      val crc = new java.util.zip.CRC32(); crc.update(plain)
      val wantCrc = u32le(bytes, trailerAt)
      require(crc.getValue == wantCrc,
        s"doc $docId: gzip member at $o CRC mismatch")
      val wantIsize = u32le(bytes, trailerAt + 4)
      require((plain.length.toLong & 0xffffffffL) == wantIsize,
        s"doc $docId: gzip member at $o ISIZE mismatch")
      val next = trailerAt + 8
      out += ((plain, next - o))
      o = next
    }
    out.toIndexedSeq
  }

  private def skipZeroTerminated(docId: Long, bytes: Array[Byte],
      from: Int): Int = {
    var i = from
    while (i < bytes.length && bytes(i) != 0) i += 1
    require(i < bytes.length, s"doc $docId: unterminated gzip header field")
    i + 1
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Walk plain (already-inflated) WARC bytes record by record. */
  private def parsePlain(docId: Long,
      bytes: Array[Byte]): IndexedSeq[ParsedRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[ParsedRecord]()
    var o = 0
    while (o < bytes.length) {
      val verEnd = lineEnd(docId, bytes, o)
      val ver = ascii(bytes, o, verEnd)
      require(ver == "WARC/1.1" || ver == "WARC/1.0",
        s"doc $docId: record at $o has bad version line '$ver'")
      var p = verEnd + 2
      var warcType = ""; var uri = ""; var date = ""; var ctype = ""
      var clen = -1
      var done = false
      while (!done) {
        val e = lineEnd(docId, bytes, p)
        if (e == p) { done = true; p += 2 } // blank line ends headers
        else {
          val line = ascii(bytes, p, e)
          val c = line.indexOf(':')
          require(c > 0, s"doc $docId: malformed WARC header '$line'")
          val k = line.substring(0, c); val v = line.substring(c + 1).trim
          k match {
            case "WARC-Type" => warcType = v
            case "WARC-Target-URI" => uri = v
            case "WARC-Date" => date = v
            case "Content-Type" => ctype = v
            case "Content-Length" =>
              clen = try v.toInt catch {
                case _: NumberFormatException => throw
                  new IllegalArgumentException(
                    s"doc $docId: bad Content-Length '$v'")
              }
            case _ => () // WARC-Record-ID and friends: tolerated
          }
          p = e + 2
        }
      }
      require(clen >= 0, s"doc $docId: record at $o missing Content-Length")
      require(p + clen.toLong + 4 <= bytes.length,
        s"doc $docId: record at $o content block overruns the file")
      val content = java.util.Arrays.copyOfRange(bytes, p, p + clen)
      require(bytes(p + clen) == '\r' && bytes(p + clen + 1) == '\n' &&
          bytes(p + clen + 2) == '\r' && bytes(p + clen + 3) == '\n',
        s"doc $docId: record at $o missing the CRLF CRLF terminator")
      out += httpSplit(docId, warcType, uri, date, ctype, content)
      o = p + clen + 4
    }
    require(out.nonEmpty, s"doc $docId: WARC file has no records")
    out.toIndexedSeq
  }

  /** Split a `response` record's HTTP message into status + headers +
    * body; non-response records pass their content through whole. */
  private def httpSplit(docId: Long, warcType: String, uri: String,
      date: String, ctype: String, content: Array[Byte]): ParsedRecord = {
    if (warcType != "response")
      return ParsedRecord(warcType, uri, date, ctype, content.length,
        httpStatus = -1, httpHeaderBytes = 0, payload = content,
        memberBytes = 0)
    val statusEnd = lineEnd(docId, content, 0)
    val status = ascii(content, 0, statusEnd)
    require(status.startsWith("HTTP/1.") && status.length >= 12,
      s"doc $docId: response record has bad status line '$status'")
    val code = try status.substring(9, 12).toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"doc $docId: bad HTTP status in '$status'")
    }
    // body starts after the first CRLF CRLF
    var i = statusEnd
    while (i + 4 <= content.length &&
        !(content(i) == '\r' && content(i + 1) == '\n' &&
          content(i + 2) == '\r' && content(i + 3) == '\n')) i += 1
    require(i + 4 <= content.length,
      s"doc $docId: response record has no HTTP header/body split")
    val payload = java.util.Arrays.copyOfRange(content, i + 4, content.length)
    ParsedRecord(warcType, uri, date, ctype, content.length, code,
      httpHeaderBytes = i + 4, payload = payload, memberBytes = 0)
  }

  private def lineEnd(docId: Long, bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
      i += 1
    require(i + 1 < bytes.length,
      s"doc $docId: unterminated line at offset $from")
    i
  }

  private def ascii(b: Array[Byte], from: Int, to: Int): String =
    new String(b, from, to - from, "US-ASCII")
}
