package graft.multimodal

/** PDF text-extraction codec — self-written writer + object walker for
  * the document format public crawl corpora carry more text in than any
  * other binary container. Public spec: ISO 32000-1 (PDF 1.7; the
  * classic-xref subset here is unchanged since PDF 1.4), FlateDecode =
  * RFC 1950 zlib, decoded with the JDK `Inflater` — the same
  * zero-dependency inflate discipline as [[ZipCodec]] (which speaks raw
  * RFC 1951) and [[WarcCodec]] (gzip).
  *
  * What parses for REAL: the header version, the `startxref` tail scan
  * (the format's documented discovery rule), the CLASSIC cross-reference
  * table (20-byte entries, multi-subsection), PDF 1.5 cross-reference
  * STREAMS (/Type /XRef: /W binary entries, /Index subsections,
  * FlateDecode + the PNG row predictors real writers emit),
  * INCREMENTAL-UPDATE chains (/Prev-linked sections merged newest-first
  * — a replaced object resolves to its newest body), COMPRESSED OBJECT
  * STREAMS (/Type /ObjStm: xref type-2 entries dereference members out
  * of the decoded stream, one inflate per stream per doc), the trailer
  * dictionary (classic or in-stream), a recursive-descent object parser
  * (dicts, arrays, names, numbers, literal + hex strings, indirect
  * references, booleans/null), stream objects with direct OR indirect
  * /Length, plain and /FlateDecode content decode, single and
  * multi-stream /Contents (parts joined with whitespace, ISO 32000-1
  * §7.8.2), the catalog → /Pages → /Kids → /Contents walk, and a BT/ET
  * text-operator scan that decodes `(…) Tj` and `[(…) n (…)] TJ` show
  * ops — including the full literal-string escape set (\( \) \\ \n \r
  * \t \b \f, 1-3 digit octal, line continuations, balanced nested
  * parens).
  *
  * Out-of-scope shapes fail LOUDLY, never silently mis-parse (the codec
  * family contract): encrypted files (/Encrypt), chained object streams
  * (/Extends), hybrid-reference files (/XRefStm), FDICT/overgrown
  * flate streams, unsupported filters or predictors, nested page
  * trees, the `'`/`"` show operators, unbalanced BT/ET, /Prev loops,
  * and any truncated or overrunning slice — each throws
  * `IllegalArgumentException` naming the doc id.
  *
  * Scale shape: parsing is a single driver-free byte walk per blob —
  * [[Multimodal.pdfPagesBatched]] runs it inside one narrow
  * mapPartitions and reduces each page to text + counters before any
  * shuffle. */
object PdfCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("application/pdf")

  /** One page's spec for the writer: text segments (first shown via Tj,
    * the rest via one TJ array with kerning numbers between elements)
    * and whether the content stream is FlateDecode-compressed. */
  case class PageSpec(segments: Seq[String], flate: Boolean)

  /** One extracted page: decoded text (segments concatenated in show
    * order), show-operator count, decoded content-stream bytes, and
    * whether the stream was flate-compressed. */
  case class Page(text: String, nTextOps: Int, contentBytes: Int,
      flate: Boolean)

  case class PdfMeta(version: String, nObjects: Int, pages: Seq[Page])

  // ------------------------------------------------------------- writer

  private def escapeString(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '('  => b.append("\\(")
      case ')'  => b.append("\\)")
      case '\\' => b.append("\\\\")
      case c if c < 0x20 || c > 0x7e =>
        require(c <= 0xff, s"non-latin1 char ${c.toInt} in PDF string")
        b.append(f"\\${c.toInt}%03o")
      case c => b.append(c)
    }
    b.toString
  }

  private def deflateZlib(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, false) // zlib wrapper
    d.setInput(data); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    buf.toByteArray
  }

  /** One page's rendered operator stream + the stream-object body bytes
    * (dict, stream, endstream) — shared by the classic/xref-stream
    * writers and the incremental-update section. */
  private def contentObjBody(p: PageSpec): Array[Byte] = {
    val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
    ops.append(s"(${escapeString(p.segments.head)}) Tj ")
    if (p.segments.size > 1)
      ops.append(p.segments.tail
        .map(s => s"(${escapeString(s)})").mkString("[ ", " -120 ", " ] TJ "))
    ops.append("ET")
    val raw = ops.toString.getBytes("ISO-8859-1")
    val data = if (p.flate) deflateZlib(raw) else raw
    val filter = if (p.flate) " /Filter /FlateDecode" else ""
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"<< /Length ${data.length}$filter >>\nstream\n"
      .getBytes("ISO-8859-1"))
    out.write(data, 0, data.length)
    out.write("\nendstream\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** Write the shared object body (header + objects 1..fontObj) into
    * `out`; returns (per-object offsets, fontObj). */
  private def writeObjects(out: java.io.ByteArrayOutputStream,
      pages: Seq[PageSpec]): (Array[Long], Int) = {
    require(pages.nonEmpty, "pdf needs at least one page")
    pages.foreach(p => require(p.segments.nonEmpty, "page needs text"))
    val n = pages.size
    val fontObj = 3 + 2 * n
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Long](fontObj + 1)
    w("%PDF-1.4\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2) {
      val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $n >>\n")
    }
    pages.zipWithIndex.foreach { case (_, i) =>
      obj(3 + i)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >>\n"))
    }
    pages.zipWithIndex.foreach { case (p, i) =>
      obj(3 + n + i)(out.write(contentObjBody(p)))
    }
    obj(fontObj)(
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    (offsets, fontObj)
  }

  /** Write one deterministic single-section PDF: catalog, pages node,
    * one page + one content stream per [[PageSpec]], a shared Type1
    * font, the classic xref table and trailer. Content streams carry
    * the page's first segment as `(…) Tj` and the remaining segments as
    * one `[(…) -120 (…)] TJ`; `flate` streams are zlib-compressed
    * (/Filter /FlateDecode). */
  def encode(pages: Seq[PageSpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val (offsets, fontObj) = writeObjects(out, pages)
    val xrefAt = out.size()
    w(s"xref\n0 ${fontObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to fontObj).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The same document with a PDF 1.5 CROSS-REFERENCE STREAM instead of
    * the classic table — the majority post-2005 real-world shape: W
    * [1 4 2] binary entries for every object (including the xref stream
    * itself), FlateDecode with the PNG Up predictor (/Predictor 12, the
    * spelling virtually every real writer emits), trailer keys living
    * in the stream dictionary, startxref pointing at the object. */
  def encodeXrefStream(pages: Seq[PageSpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val (offsets, fontObj) = writeObjects(out, pages)
    val xrefObj = fontObj + 1
    val rowsBelow = (0, 0L, 0xffff) +:
      (1 to fontObj).map(i => (1, offsets(i), 0))
    writeXrefStreamObj(out, xrefObj, rowsBelow)
    out.toByteArray
  }

  /** Write the cross-reference STREAM object for ids `0 until xrefObj`
    * (`rowsBelow` = (type, field2, field3) per id, in id order) plus
    * the stream's own type-1 row, W [1 4 2] under the PNG Up predictor,
    * trailer keys in the stream dict, and the startxref tail. */
  private def writeXrefStreamObj(out: java.io.ByteArrayOutputStream,
      xrefObj: Int, rowsBelow: Seq[(Int, Long, Int)]): Unit = {
    require(rowsBelow.size == xrefObj, "one row per object id below the xref")
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val xrefAt = out.size().toLong
    val rows = rowsBelow :+ ((1, xrefAt, 0))
    val wN = 7 // 1-byte type + 4-byte field2 + 2-byte field3
    val raw = new Array[Byte](rows.size * wN)
    rows.zipWithIndex.foreach { case ((tpe, f2, f3), id) =>
      val b = id * wN
      raw(b) = tpe.toByte
      raw(b + 1) = ((f2 >> 24) & 0xff).toByte
      raw(b + 2) = ((f2 >> 16) & 0xff).toByte
      raw(b + 3) = ((f2 >> 8) & 0xff).toByte
      raw(b + 4) = (f2 & 0xff).toByte
      raw(b + 5) = ((f3 >> 8) & 0xff).toByte
      raw(b + 6) = (f3 & 0xff).toByte
    }
    // PNG Up predictor: each wN-byte row prefixed by filter byte 2 and
    // delta-coded against the previous row
    val pred = new Array[Byte](rows.size * (wN + 1))
    rows.indices.foreach { r =>
      pred(r * (wN + 1)) = 2
      (0 until wN).foreach { c =>
        val above = if (r == 0) 0 else raw((r - 1) * wN + c) & 0xff
        pred(r * (wN + 1) + 1 + c) = ((raw(r * wN + c) & 0xff) - above).toByte
      }
    }
    val data = deflateZlib(pred)
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size ${xrefObj + 1} /W [ 1 4 2 ] " +
      s"/Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $wN >> " +
      s"/Length ${data.length} >>\nstream\n")
    out.write(data, 0, data.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
  }

  /** The same document with its NON-STREAM objects (catalog, pages
    * node, page dicts, font) packed into a COMPRESSED OBJECT STREAM
    * (/Type /ObjStm, FlateDecode) referenced by xref type-2 entries —
    * together with [[encodeXrefStream]] the two shapes virtually every
    * post-2005 writer emits. Content streams stay top-level (a stream
    * cannot live inside an object stream, per spec). */
  def encodeObjectStreams(pages: Seq[PageSpec]): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    pages.foreach(p => require(p.segments.nonEmpty, "page needs text"))
    val n = pages.size
    val fontObj = 3 + 2 * n
    val objStmObj = fontObj + 1
    val xrefObj = fontObj + 2
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    val contentOff = new Array[Long](n)
    pages.zipWithIndex.foreach { case (p, i) =>
      contentOff(i) = out.size().toLong
      w(s"${3 + n + i} 0 obj\n"); out.write(contentObjBody(p)); w("endobj\n")
    }
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    val members: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $n >>") ++
        (0 until n).map(i => (3 + i) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
            s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
            s"/Contents ${3 + n + i} 0 R >>")) ++
        Seq(fontObj ->
          "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = members.map(_._2 + "\n")
    val offs = bodies.map(_.length).scanLeft(0)(_ + _)
    val header = members.map(_._1).zip(offs)
      .map { case (num, o) => s"$num $o" }.mkString("", " ", "\n")
    val data = deflateZlib(
      (header + bodies.mkString).getBytes("ISO-8859-1"))
    val objStmAt = out.size().toLong
    w(s"$objStmObj 0 obj\n<< /Type /ObjStm /N ${members.size} " +
      s"/First ${header.length} /Filter /FlateDecode " +
      s"/Length ${data.length} >>\nstream\n")
    out.write(data, 0, data.length)
    w("\nendstream\nendobj\n")
    val memberIdx = members.map(_._1).zipWithIndex.toMap
    val rowsBelow = (0 until xrefObj).map { id =>
      if (id == 0) (0, 0L, 0xffff)
      else if (memberIdx.contains(id)) (2, objStmObj.toLong, memberIdx(id))
      else if (id == objStmObj) (1, objStmAt, 0)
      else (1, contentOff(id - 3 - n), 0) // content stream objects
    }
    writeXrefStreamObj(out, xrefObj, rowsBelow)
    out.toByteArray
  }

  /** A classic-xref INCREMENTAL UPDATE chain: the base document renders
    * page 0 with `placeholder` text, then an appended update section
    * replaces page 0's content object and chains to the base table via
    * /Prev — a correct parse MUST prefer the newest section's entry, so
    * the extracted page-0 text is `pages.head`'s, never the
    * placeholder. */
  def encodeIncremental(pages: Seq[PageSpec], placeholder: String): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    val basePages = PageSpec(Seq(placeholder), flate = false) +: pages.tail
    val base = encode(basePages)
    val s = new String(base, "ISO-8859-1")
    val prevAt = {
      val i = s.lastIndexOf("startxref")
      s.substring(i + "startxref".length).trim.takeWhile(_.isDigit).toLong
    }
    val n = pages.size
    val fontObj = 3 + 2 * n
    val contentObj = 3 + n // page 0's content stream object
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    def w(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    val objAt = out.size().toLong
    w(s"$contentObj 0 obj\n")
    out.write(contentObjBody(pages.head))
    w("endobj\n")
    val xrefAt = out.size()
    w(s"xref\n0 1\n0000000000 65535 f \n$contentObj 1\n")
    w(f"$objAt%010d 00000 n \n")
    w(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R /Prev $prevAt >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------- object-level parser

  /** The PDF object model subset the walker needs. */
  private sealed trait V
  private case class VNum(v: Double) extends V
  private case class VName(v: String) extends V
  private case class VStr(v: String) extends V
  private case class VArr(v: Seq[V]) extends V
  private case class VDict(v: Map[String, V]) extends V
  private case class VRef(num: Int) extends V
  private case object VOther extends V // true/false/null

  private class Cursor(docId: Long, val bytes: Array[Byte], var pos: Int) {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    def peek: Int = if (pos < bytes.length) bytes(pos) & 0xff else -1
    def next(): Int = { val c = peek; if (c < 0) fail("truncated PDF"); pos += 1; c }
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (isWs(peek)) pos += 1
        if (peek == '%') { while (peek >= 0 && peek != '\n' && peek != '\r') pos += 1 }
        else go = false
      }
    }
    def expect(s: String): Unit = {
      skipWs()
      if (!startsWith(s)) fail(s"expected '$s' at offset $pos")
      pos += s.length
    }
    def startsWith(s: String): Boolean =
      pos + s.length <= bytes.length &&
        (0 until s.length).forall(i => bytes(pos + i) == s.charAt(i).toByte)
    def keyword(): String = {
      skipWs()
      val b = new StringBuilder
      while (peek >= 'A' && peek <= 'z' &&
        (Character.isLetter(peek) || peek == '\'' || peek == '"')) b.append(next().toChar)
      if (b.isEmpty && (peek == '\'' || peek == '"')) b.append(next().toChar)
      b.toString
    }

    /** One object value; `n g R` lookahead folds into [[VRef]]. */
    def value(): V = {
      skipWs()
      peek match {
        case '<' if pos + 1 < bytes.length && bytes(pos + 1) == '<' =>
          pos += 2; dict()
        case '<' => hexString()
        case '(' => VStr(literalString())
        case '[' =>
          pos += 1
          val items = scala.collection.mutable.ArrayBuffer.empty[V]
          skipWs()
          while (peek != ']') { items += value(); skipWs() }
          pos += 1
          VArr(items.toSeq)
        case '/' => VName(name())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          numberOrRef()
        case 't' if startsWith("true")  => pos += 4; VOther
        case 'f' if startsWith("false") => pos += 5; VOther
        case 'n' if startsWith("null")  => pos += 4; VOther
        case c => fail(s"unexpected byte $c in object at offset $pos")
      }
    }
    def name(): String = {
      expect("/")
      val b = new StringBuilder
      while (peek > 0x20 && !"()<>[]{}/%".contains(peek.toChar)) {
        val c = next()
        if (c == '#') { // #xx hex escape in names
          val h = Integer.parseInt(s"${next().toChar}${next().toChar}", 16)
          b.append(h.toChar)
        } else b.append(c.toChar)
      }
      b.toString
    }
    private def rawNumber(): Double = {
      skipWs()
      val b = new StringBuilder
      while (peek == '+' || peek == '-' || peek == '.' ||
        (peek >= '0' && peek <= '9')) b.append(next().toChar)
      if (b.isEmpty) fail(s"expected number at offset $pos")
      b.toString.toDouble
    }
    private def numberOrRef(): V = {
      val save = pos
      val a = rawNumber()
      if (a == math.rint(a) && a >= 0) {
        val afterA = pos
        skipWs()
        if (peek >= '0' && peek <= '9') {
          rawNumber(); skipWs()
          if (peek == 'R') { pos += 1; return VRef(a.toInt) }
        }
        pos = afterA
        val _ = save
      }
      VNum(a)
    }
    def dict(): VDict = { // after '<<'
      val m = scala.collection.mutable.LinkedHashMap.empty[String, V]
      skipWs()
      while (!startsWith(">>")) {
        val k = name()
        m(k) = value()
        skipWs()
      }
      pos += 2
      VDict(m.toMap)
    }
    private def hexString(): V = {
      expect("<")
      val b = new StringBuilder
      while (peek != '>') { val c = next(); if (!isWs(c)) b.append(c.toChar) }
      pos += 1
      val h = if (b.length % 2 == 1) b.append('0').toString else b.toString
      VStr(h.grouped(2).map(x => Integer.parseInt(x, 16).toChar).mkString)
    }

    /** PDF literal string: balanced nested parens, the full escape set,
      * 1-3 digit octal, escaped-newline continuation. */
    def literalString(): String = {
      expect("(")
      val b = new StringBuilder
      var depth = 1
      while (depth > 0) {
        val c = next()
        c match {
          case '(' => depth += 1; b.append('(')
          case ')' => depth -= 1; if (depth > 0) b.append(')')
          case '\\' =>
            val e = next()
            e match {
              case 'n' => b.append('\n'); case 'r' => b.append('\r')
              case 't' => b.append('\t'); case 'b' => b.append('\b')
              case 'f' => b.append('\f')
              case '(' => b.append('('); case ')' => b.append(')')
              case '\\' => b.append('\\')
              case '\r' => if (peek == '\n') pos += 1 // continuation
              case '\n' => // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 1
                while (k < 3 && peek >= '0' && peek <= '7') {
                  v = v * 8 + (next() - '0'); k += 1
                }
                b.append((v & 0xff).toChar)
              case d => b.append(d.toChar) // spec: ignore the backslash
            }
          case c => b.append(c.toChar)
        }
      }
      b.toString
    }
  }

  // ------------------------------------------------------------- walker

  /** Walk one PDF: header, startxref tail scan, classic xref table,
    * trailer, catalog → pages → per-page content decode (plain or
    * FlateDecode) → BT/ET text-operator scan. O(bytes); payload never
    * re-copied beyond the one decoded stream per page. */
  def parse(docId: Long, bytes: Array[Byte]): PdfMeta = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    if (bytes.length < 32) fail("truncated PDF (shorter than any header)")
    if (!new String(bytes, 0, 5, "ISO-8859-1").equals("%PDF-"))
      fail("bad PDF header")
    var e = 5
    while (e < bytes.length && bytes(e) != '\n' && bytes(e) != '\r') e += 1
    val version = new String(bytes, 5, e - 5, "ISO-8859-1")

    // startxref: bounded tail scan (a trailing comment may follow %%EOF)
    val tailFrom = math.max(0, bytes.length - 1024)
    val tail = new String(bytes, tailFrom, bytes.length - tailFrom, "ISO-8859-1")
    val sxAt = tail.lastIndexOf("startxref")
    if (sxAt < 0) fail("no startxref in the trailer region")
    if (!tail.contains("%%EOF")) fail("no %%EOF marker")
    val sx = new Cursor(docId, bytes, tailFrom + sxAt + "startxref".length)
    sx.skipWs()
    val xrefAt = {
      val b = new StringBuilder
      while (sx.peek >= '0' && sx.peek <= '9') b.append(sx.next().toChar)
      if (b.isEmpty) fail("startxref carries no offset")
      b.toString.toLong
    }
    if (xrefAt < 0 || xrefAt >= bytes.length) fail("startxref offset out of range")

    // ---- cross-reference chain walk: classic TABLES and PDF 1.5 xref
    // STREAMS, linked oldest-ward via /Prev (incremental updates).
    // Sections merge NEWEST-FIRST: the first section to claim an object
    // id — in-use or free — wins, the incremental-update precedence
    // rule (a replaced object's old body is unreachable, a freed one
    // never resolves from an older section).
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    val compressed = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    val claimed = scala.collection.mutable.Set.empty[Int]
    val trailerDicts = scala.collection.mutable.ArrayBuffer.empty[Map[String, V]]
    val visited = scala.collection.mutable.Set.empty[Long]
    var at = xrefAt
    while (at >= 0) {
      if (at >= bytes.length) fail("xref offset out of range")
      if (!visited.add(at)) fail("xref /Prev chain loops")
      if (visited.size > 64) fail("xref /Prev chain longer than 64 sections")
      val cur = new Cursor(docId, bytes, at.toInt)
      cur.skipWs()
      // a digit here means the offset lands on an OBJECT — the PDF 1.5+
      // cross-reference stream; otherwise the classic `xref` table
      val dict =
        if (cur.peek >= '0' && cur.peek <= '9')
          readXrefStreamSection(docId, cur, offsets, compressed, claimed)
        else readClassicXrefSection(docId, cur, offsets, claimed)
      trailerDicts += dict
      if (dict.contains("Encrypt"))
        fail("encrypted PDF (/Encrypt) — out of this codec's scope")
      if (dict.contains("XRefStm"))
        fail("hybrid-reference file (/XRefStm) — out of this codec's scope")
      at = dict.get("Prev") match {
        case Some(VNum(p)) => p.toLong
        case Some(_)       => fail("/Prev is not an offset")
        case None          => -1L
      }
    }
    val size = trailerDicts.head.get("Size") match {
      case Some(VNum(s)) => s.toInt
      case _             => fail("trailer has no /Size")
    }
    // single-section files keep the strict census (a truncated table is
    // loud); chained files may legitimately carry freed objects, so only
    // an OVERFULL census is corrupt there
    val inUse = offsets.size + compressed.size
    if (trailerDicts.size == 1 && inUse != size - 1)
      fail(s"xref holds $inUse in-use objects, /Size says ${size - 1}")
    if (inUse > size - 1)
      fail(s"xref chain holds $inUse in-use objects, /Size says ${size - 1}")
    val rootRef = trailerDicts.flatMap(_.get("Root")).headOption match {
      case Some(VRef(r)) => r
      case Some(_)       => fail("/Root is not a reference")
      case None          => fail("trailer has no /Root reference")
    }

    // decoded object-stream cache — one inflate per /ObjStm per doc,
    // however many members resolve through it
    val objStmCache =
      scala.collection.mutable.Map.empty[Int, (Map[Int, Int], Array[Byte])]

    /** Decode object stream `stmNum`: returns (member → absolute byte
      * offset in the decoded bytes, decoded bytes). */
    def loadObjStm(stmNum: Int): (Map[Int, Int], Array[Byte]) =
      objStmCache.getOrElseUpdate(stmNum, {
        if (compressed.contains(stmNum))
          fail(s"object stream $stmNum is itself compressed — corrupt xref")
        val (d, data) = getObj(stmNum)
        if (d.get("Type") != Some(VName("ObjStm")))
          fail(s"object $stmNum is not /Type /ObjStm")
        if (d.contains("Extends"))
          fail("chained object streams (/Extends) — out of this codec's scope")
        val nMembers = d.get("N") match {
          case Some(VNum(v)) => v.toInt
          case _             => fail(s"object stream $stmNum has no /N")
        }
        val first = d.get("First") match {
          case Some(VNum(v)) => v.toInt
          case _             => fail(s"object stream $stmNum has no /First")
        }
        val raw = data.getOrElse(fail(s"object $stmNum carries no stream"))
        val dec = d.get("Filter") match {
          case None                       => raw
          case Some(VName("FlateDecode")) => inflateZlib(docId, raw)
          case Some(VArr(Seq(VName("FlateDecode")))) => inflateZlib(docId, raw)
          case Some(f) => fail(s"unsupported object-stream filter $f")
        }
        val hc = new Cursor(docId, dec, 0)
        val pairs = (0 until nMembers).map(_ => (readInt(hc), readInt(hc)))
        if (hc.pos > first)
          fail(s"object stream $stmNum: member table overruns /First")
        (pairs.map { case (num, off) =>
          if (first + off > dec.length)
            fail(s"object stream $stmNum: member $num offset overruns the stream")
          num -> (first + off)
        }.toMap, dec)
      })

    /** A compressed member's parsed value. */
    def compressedValue(num: Int, stm: Int): V = {
      val (memberOffs, dec) = loadObjStm(stm)
      val off = memberOffs.getOrElse(num,
        fail(s"object $num not listed in object stream $stm"))
      new Cursor(docId, dec, off).value()
    }

    /** Parse object `num` expecting a bare NUMBER body (an indirect
      * /Length target). */
    def resolveNumber(num: Int, what: String): Double =
      compressed.get(num) match {
        case Some((stm, _)) => compressedValue(num, stm) match {
          case VNum(v) => v
          case _       => fail(s"object $num is not a number ($what)")
        }
        case None =>
          val off = offsets.getOrElse(num,
            fail(s"object $num missing from the xref table ($what)"))
          val c = new Cursor(docId, bytes, off.toInt)
          val declared = readInt(c)
          if (declared != num) fail(s"xref points object $num at object $declared")
          c.skipWs(); readInt(c)
          c.expect("obj")
          c.value() match {
            case VNum(v) => v
            case _       => fail(s"object $num is not a number ($what)")
          }
      }

    /** Parse object `num`; a stream object returns (dict, Some(data)).
      * Compressed members (xref type-2) parse out of their decoded
      * object stream — they can never carry a stream themselves. */
    def getObj(num: Int): (Map[String, V], Option[Array[Byte]]) = {
      compressed.get(num).foreach { case (stm, _) =>
        return compressedValue(num, stm) match {
          case d: VDict => (d.v, None)
          case _ => fail(s"object $num (compressed) is not a dictionary")
        }
      }
      val off = offsets.getOrElse(num,
        fail(s"object $num missing from the xref table"))
      val c = new Cursor(docId, bytes, off.toInt)
      val declared = readInt(c)
      if (declared != num) fail(s"xref points object $num at object $declared")
      c.skipWs(); readInt(c)
      c.expect("obj")
      c.skipWs()
      val v = c.value() match {
        case d: VDict => d.v
        case _        => fail(s"object $num is not a dictionary")
      }
      c.skipWs()
      if (c.startsWith("stream")) {
        c.pos += "stream".length
        if (c.peek == '\r') c.pos += 1
        if (c.peek == '\n') c.pos += 1 else fail(s"object $num: stream keyword not followed by EOL")
        val len = v.get("Length") match {
          case Some(VNum(l)) => l.toInt
          case Some(VRef(r)) =>
            resolveNumber(r, s"object $num's indirect /Length").toInt
          case _ => fail(s"object $num: stream has no /Length")
        }
        if (c.pos + len > bytes.length) fail(s"object $num: stream overruns the file")
        val data = java.util.Arrays.copyOfRange(bytes, c.pos, c.pos + len)
        c.pos += len
        c.skipWs(); c.expect("endstream")
        (v, Some(data))
      } else {
        c.expect("endobj")
        (v, None)
      }
    }

    def refOf(v: Option[V], what: String): Int = v match {
      case Some(VRef(r)) => r
      case Some(VArr(_)) => fail(s"$what is an array — out of this codec's scope")
      case _             => fail(s"missing $what reference")
    }

    val (catalog, _) = getObj(rootRef)
    if (catalog.get("Type") != Some(VName("Catalog")))
      fail("/Root does not reference a /Catalog")
    val (pagesNode, _) = getObj(refOf(catalog.get("Pages"), "/Pages"))
    if (pagesNode.get("Type") != Some(VName("Pages")))
      fail("catalog /Pages does not reference a /Pages node")
    val kids = pagesNode.get("Kids") match {
      case Some(VArr(ks)) => ks.map {
        case VRef(r) => r
        case _       => fail("/Kids holds a non-reference")
      }
      case _ => fail("pages node has no /Kids array")
    }
    pagesNode.get("Count") match {
      case Some(VNum(cnt)) if cnt.toInt == kids.size => ()
      case Some(VNum(cnt)) =>
        fail(s"/Count ${cnt.toInt} disagrees with ${kids.size} /Kids")
      case _ => fail("pages node has no /Count")
    }

    val pages = kids.map { pref =>
      val (page, _) = getObj(pref)
      page.get("Type") match {
        case Some(VName("Page"))  => ()
        case Some(VName("Pages")) =>
          fail("nested page trees — out of this codec's scope")
        case _ => fail("kid is not a /Page")
      }
      val contentRefs: Seq[Int] = page.get("Contents") match {
        case Some(VRef(r)) => Seq(r)
        case Some(VArr(items)) if items.nonEmpty => items.map {
          case VRef(r) => r
          case _       => fail("/Contents array holds a non-reference")
        }
        case _ => fail("missing /Contents reference")
      }
      val parts = contentRefs.map { cref =>
        val (cdict, cdata) = getObj(cref)
        val raw = cdata.getOrElse(fail("/Contents is not a stream object"))
        cdict.get("Filter") match {
          case None => (raw, false)
          case Some(VName("FlateDecode")) => (inflateZlib(docId, raw), true)
          case Some(VArr(Seq(VName("FlateDecode")))) =>
            (inflateZlib(docId, raw), true)
          case Some(f) => fail(s"unsupported stream filter $f")
        }
      }
      // a multi-stream /Contents array parses as ONE stream with
      // whitespace between the parts (ISO 32000-1 §7.8.2)
      val data =
        if (parts.size == 1) parts.head._1
        else {
          val b = new java.io.ByteArrayOutputStream()
          parts.zipWithIndex.foreach { case ((d, _), i) =>
            if (i > 0) b.write('\n')
            b.write(d, 0, d.length)
          }
          b.toByteArray
        }
      val flate = parts.exists(_._2)
      val (text, nOps) = extractText(docId, data)
      Page(text, nOps, data.length, flate)
    }
    PdfMeta(version, inUse, pages)
  }

  /** Classic cross-reference TABLE at the cursor: multi-subsection
    * 20-byte entries, then the trailer dictionary. Entries merge
    * first-claim-wins into `offsets`/`claimed` (the chain walk calls
    * sections newest-first). */
  private def readClassicXrefSection(docId: Long, cur: Cursor,
      offsets: scala.collection.mutable.Map[Int, Long],
      claimed: scala.collection.mutable.Set[Int]): Map[String, V] = {
    val bytes = cur.bytes
    cur.expect("xref")
    cur.skipWs()
    while (!cur.startsWith("trailer")) {
      val header = new Cursor(docId, bytes, cur.pos)
      val start = { header.skipWs(); readInt(header) }
      val count = { header.skipWs(); readInt(header) }
      cur.pos = header.pos
      // skip to the line end: entries start on the next line
      while (cur.peek == ' ') cur.pos += 1
      if (cur.peek == '\r') cur.pos += 1
      if (cur.peek == '\n') cur.pos += 1
      (0 until count).foreach { i =>
        if (cur.pos + 20 > bytes.length) cur.fail("truncated xref entry")
        val entry = new String(bytes, cur.pos, 20, "ISO-8859-1")
        if (entry(17) != 'n' && entry(17) != 'f')
          cur.fail(s"malformed 20-byte xref entry for object ${start + i}")
        if (claimed.add(start + i) && entry(17) == 'n')
          offsets(start + i) = entry.substring(0, 10).toLong
        cur.pos += 20
      }
      cur.skipWs()
    }
    cur.expect("trailer")
    cur.skipWs(); cur.expect("<<")
    cur.dict().v
  }

  /** PDF 1.5 cross-reference STREAM at the cursor (`N G obj << /Type
    * /XRef … >> stream`): /W-array binary entries over the /Index
    * subsections, optionally FlateDecode-compressed with a PNG
    * predictor (/DecodeParms). Its dictionary IS the trailer (returned).
    * Type-2 entries (objects living in compressed object streams) are
    * out of this codec's scope and fail loudly. */
  private def readXrefStreamSection(docId: Long, cur: Cursor,
      offsets: scala.collection.mutable.Map[Int, Long],
      compressed: scala.collection.mutable.Map[Int, (Int, Int)],
      claimed: scala.collection.mutable.Set[Int]): Map[String, V] = {
    def fail(msg: String): Nothing = cur.fail(msg)
    readInt(cur); cur.skipWs(); readInt(cur)
    cur.expect("obj")
    cur.skipWs()
    val dict = cur.value() match {
      case d: VDict => d.v
      case _        => fail("xref-stream object is not a dictionary")
    }
    if (dict.get("Type") != Some(VName("XRef")))
      fail("startxref lands on an object that is not /Type /XRef")
    // /Length must be direct here (resolving an indirect one needs the
    // very table this stream defines)
    val len = dict.get("Length") match {
      case Some(VNum(l)) => l.toInt
      case _             => fail("xref stream needs a direct /Length")
    }
    cur.skipWs()
    if (!cur.startsWith("stream")) fail("xref-stream object carries no stream")
    cur.pos += "stream".length
    if (cur.peek == '\r') cur.pos += 1
    if (cur.peek == '\n') cur.pos += 1
    else fail("xref stream keyword not followed by EOL")
    if (cur.pos + len > cur.bytes.length) fail("xref stream overruns the file")
    val rawData =
      java.util.Arrays.copyOfRange(cur.bytes, cur.pos, cur.pos + len)
    val inflated = dict.get("Filter") match {
      case None                       => rawData
      case Some(VName("FlateDecode")) => inflateZlib(docId, rawData)
      case Some(VArr(Seq(VName("FlateDecode")))) => inflateZlib(docId, rawData)
      case Some(f) => fail(s"unsupported xref stream filter $f")
    }
    val (predictor, columns) = dict.get("DecodeParms") match {
      case None => (1, 0)
      case Some(VDict(p)) =>
        val pr = p.get("Predictor") match {
          case Some(VNum(v)) => v.toInt
          case None          => 1
          case Some(_)       => fail("/Predictor is not a number")
        }
        val co = p.get("Columns") match {
          case Some(VNum(v)) => v.toInt
          case None          => 1
          case Some(_)       => fail("/Columns is not a number")
        }
        (pr, co)
      case Some(_) => fail("/DecodeParms is not a dictionary")
    }
    val wArr = dict.get("W") match {
      case Some(VArr(ws)) if ws.size == 3 => ws.map {
        case VNum(v) if v >= 0 && v <= 8 => v.toInt
        case _ => fail("/W holds a non-number or out-of-range width")
      }
      case _ => fail("xref stream has no 3-element /W array")
    }
    if (wArr(1) == 0)
      fail("/W offset-field width 0 — out of this codec's scope")
    val rowLen = wArr.sum
    val data = unpredict(docId, inflated, predictor,
      if (columns > 0) columns else rowLen)
    if (rowLen == 0 || data.length % rowLen != 0)
      fail(s"xref stream data (${data.length} bytes) is no multiple of " +
        s"the $rowLen-byte /W row")
    val sizeN = dict.get("Size") match {
      case Some(VNum(v)) => v.toInt
      case _             => fail("xref stream has no /Size")
    }
    val index: Seq[(Int, Int)] = dict.get("Index") match {
      case None => Seq((0, sizeN))
      case Some(VArr(items)) if items.nonEmpty && items.size % 2 == 0 =>
        items.grouped(2).map {
          case Seq(VNum(a), VNum(b)) => (a.toInt, b.toInt)
          case _                     => fail("/Index holds a non-number")
        }.toSeq
      case Some(_) => fail("/Index is not an even-length array")
    }
    val nRows = index.map(_._2.toLong).sum
    if (nRows * rowLen != data.length)
      fail(s"/Index declares $nRows entries, the stream holds " +
        s"${data.length / rowLen}")
    var p = 0
    def field(width: Int, dflt: Long): Long =
      if (width == 0) dflt
      else {
        var v = 0L
        (0 until width).foreach { _ => v = (v << 8) | (data(p) & 0xff); p += 1 }
        v
      }
    index.foreach { case (start, count) =>
      (0 until count).foreach { i =>
        val tpe = field(wArr(0), 1L)
        val f2 = field(wArr(1), 0L)
        val f3 = field(wArr(2), 0L)
        tpe match {
          case 0 => claimed.add(start + i); ()
          case 1 => if (claimed.add(start + i)) offsets(start + i) = f2
          case 2 =>
            // compressed: the object lives at index f3 of object
            // stream f2 — dereferenced lazily through loadObjStm
            if (claimed.add(start + i))
              compressed(start + i) = (f2.toInt, f3.toInt)
          case t => fail(s"unknown xref entry type $t for object ${start + i}")
        }
      }
    }
    dict
  }

  /** Reverse the PNG row predictors xref streams use (bpp = 1 byte):
    * predictor 1 = identity; ≥ 10 = per-row PNG filter byte (None, Sub,
    * Up, Average, Paeth — the filter byte decides per row, so one
    * implementation covers predictors 10–15). */
  private def unpredict(docId: Long, data: Array[Byte], predictor: Int,
      columns: Int): Array[Byte] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    if (predictor == 1) data
    else if (predictor >= 10) {
      if (columns <= 0) fail("PNG predictor needs a positive /Columns")
      if (data.length % (columns + 1) != 0)
        fail("predicted xref data is no multiple of the row length")
      val rows = data.length / (columns + 1)
      val out = new Array[Byte](rows * columns)
      (0 until rows).foreach { r =>
        val ft = data(r * (columns + 1)) & 0xff
        (0 until columns).foreach { c =>
          val x = data(r * (columns + 1) + 1 + c) & 0xff
          val a = if (c == 0) 0 else out(r * columns + c - 1) & 0xff
          val b = if (r == 0) 0 else out((r - 1) * columns + c) & 0xff
          val d = if (c == 0 || r == 0) 0 else out((r - 1) * columns + c - 1) & 0xff
          val recon = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 =>
              val pp = a + b - d
              val pa = math.abs(pp - a)
              val pb = math.abs(pp - b)
              val pc = math.abs(pp - d)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else d)
            case t => fail(s"unknown PNG filter type $t in predicted xref data")
          }
          out(r * columns + c) = (recon & 0xff).toByte
        }
      }
      out
    } else fail(s"unsupported /Predictor $predictor")
  }

  private def readInt(c: Cursor): Int = {
    c.skipWs()
    val b = new StringBuilder
    while (c.peek >= '0' && c.peek <= '9') b.append(c.next().toChar)
    if (b.isEmpty) c.fail(s"expected integer at offset ${c.pos}")
    b.toString.toInt
  }

  /** Absolute inflate ceiling: a PDF declares only the COMPRESSED
    * /Length, so an unbounded loop is a flate-bomb amplifier on exactly
    * the untrusted crawl bytes this codec targets. The cap is the looser
    * of 1000× the compressed size and 16 MiB — generous for any real
    * content stream, loud on a bomb. */
  private def inflateCap(compressed: Int): Long =
    math.max(1000L * compressed, 16L << 20)

  private def inflateZlib(docId: Long, data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(false) // zlib wrapper, RFC 1950
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    val cap = inflateCap(data.length)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n == 0 && !inf.finished()) {
          // zero progress and not finished: truncated input, an FDICT
          // (preset-dictionary) stream — which Inflater reports via
          // needsDictionary() with needsInput() still false, hanging a
          // naive input-only check — or any other stuck state. All are
          // out-of-scope/corrupt for PDF FlateDecode: fail loudly.
          if (inf.needsDictionary())
            throw new IllegalArgumentException(
              s"doc $docId: FlateDecode stream demands a preset " +
                "dictionary (FDICT) — out of this codec's scope")
          throw new IllegalArgumentException(
            s"doc $docId: truncated FlateDecode stream")
        }
        out.write(tmp, 0, n)
        if (out.size() > cap)
          throw new IllegalArgumentException(
            s"doc $docId: FlateDecode output exceeds $cap bytes from " +
              s"${data.length} compressed — refusing a flate bomb")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"doc $docId: corrupt FlateDecode stream (${e.getMessage})")
    } finally inf.end()
    out.toByteArray
  }

  /** BT/ET + Tj/TJ scan over one decoded content stream: show-op strings
    * concatenate in operator order; every other operator just clears the
    * operand stack. `'`/`"` (show-with-positioning) and unbalanced
    * BT/ET fail loudly. */
  private def extractText(docId: Long, content: Array[Byte]): (String, Int) = {
    val c = new Cursor(docId, content, 0)
    def fail(msg: String): Nothing = c.fail(msg)
    val text = new StringBuilder
    var nOps = 0
    var inBT = false
    val operands = scala.collection.mutable.ArrayBuffer.empty[V]
    while ({ c.skipWs(); c.peek >= 0 }) {
      c.peek match {
        case '(' => operands += VStr(c.literalString())
        case '[' | '<' | '/' => operands += c.value()
        case ch if ch == '+' || ch == '-' || ch == '.' ||
          (ch >= '0' && ch <= '9') => operands += c.value()
        case _ =>
          val op = c.keyword()
          if (op.isEmpty) fail(s"unparseable content byte at ${c.pos}")
          op match {
            case "BT" =>
              if (inBT) fail("nested BT"); inBT = true; operands.clear()
            case "ET" =>
              if (!inBT) fail("ET outside BT"); inBT = false; operands.clear()
            case "Tj" =>
              if (!inBT) fail("Tj outside BT/ET")
              operands.lastOption match {
                case Some(VStr(s)) => text.append(s); nOps += 1
                case _             => fail("Tj without a string operand")
              }
              operands.clear()
            case "TJ" =>
              if (!inBT) fail("TJ outside BT/ET")
              operands.lastOption match {
                case Some(VArr(items)) =>
                  items.foreach {
                    case VStr(s) => text.append(s)
                    case VNum(_) => () // kerning adjustment
                    case _       => fail("TJ array holds a non-string/number")
                  }
                  nOps += 1
                case _ => fail("TJ without an array operand")
              }
              operands.clear()
            case "'" | "\"" =>
              fail(s"show operator $op — out of this codec's scope")
            case _ => operands.clear() // positioning/state op
          }
      }
    }
    if (inBT) fail("unterminated BT block")
    (text.toString, nOps)
  }
}
