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
  * table (20-byte entries, multi-subsection), the trailer dictionary,
  * a recursive-descent object parser (dicts, arrays, names, numbers,
  * literal + hex strings, indirect references, booleans/null), stream
  * objects with direct /Length, plain and /FlateDecode content decode,
  * the catalog → /Pages → /Kids → /Contents walk, and a BT/ET text-
  * operator scan that decodes `(…) Tj` and `[(…) n (…)] TJ` show ops —
  * including the full literal-string escape set (\( \) \\ \n \r \t \b
  * \f, 1-3 digit octal, line continuations, balanced nested parens).
  *
  * Out-of-scope shapes fail LOUDLY, never silently mis-parse (the codec
  * family contract): encrypted files (/Encrypt in the trailer),
  * cross-reference STREAMS (PDF 1.5 xref offset landing on an object),
  * incremental-update chains (/Prev), indirect /Length, unsupported
  * filters, nested page trees, multi-stream /Contents arrays, the
  * `'`/`"` show operators, unbalanced BT/ET, and any truncated or
  * overrunning slice — each throws `IllegalArgumentException` naming
  * the doc id.
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

  /** Write one deterministic single-section PDF: catalog, pages node,
    * one page + one content stream per [[PageSpec]], a shared Type1
    * font, the classic xref table and trailer. Content streams carry
    * the page's first segment as `(…) Tj` and the remaining segments as
    * one `[(…) -120 (…)] TJ`; `flate` streams are zlib-compressed
    * (/Filter /FlateDecode). */
  def encode(pages: Seq[PageSpec]): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    pages.foreach(p => require(p.segments.nonEmpty, "page needs text"))
    val n = pages.size
    val fontObj = 3 + 2 * n
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def wb(b: Array[Byte]): Unit = out.write(b, 0, b.length)
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
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
      ops.append(s"(${escapeString(p.segments.head)}) Tj ")
      if (p.segments.size > 1)
        ops.append(p.segments.tail
          .map(s => s"(${escapeString(s)})").mkString("[ ", " -120 ", " ] TJ "))
      ops.append("ET")
      val raw = ops.toString.getBytes("ISO-8859-1")
      val data = if (p.flate) deflateZlib(raw) else raw
      val filter = if (p.flate) " /Filter /FlateDecode" else ""
      obj(3 + n + i) {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        wb(data)
        w("\nendstream\n")
      }
    }
    obj(fontObj)(
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    val xrefAt = out.size()
    w(s"xref\n0 ${fontObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to fontObj).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\n")
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

    // classic xref table — a digit here means the offset lands on an
    // OBJECT, i.e. a PDF 1.5+ cross-reference stream: out of scope, loud
    val cur = new Cursor(docId, bytes, xrefAt.toInt)
    cur.skipWs()
    if (cur.peek >= '0' && cur.peek <= '9')
      fail("cross-reference stream (PDF 1.5+) — out of this codec's scope")
    cur.expect("xref")
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
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
        if (cur.pos + 20 > bytes.length) fail("truncated xref entry")
        val entry = new String(bytes, cur.pos, 20, "ISO-8859-1")
        if (entry.length != 20 || (entry(17) != 'n' && entry(17) != 'f'))
          fail(s"malformed 20-byte xref entry for object ${start + i}")
        if (entry(17) == 'n')
          offsets(start + i) = entry.substring(0, 10).toLong
        cur.pos += 20
      }
      cur.skipWs()
    }
    cur.expect("trailer")
    cur.skipWs(); cur.expect("<<")
    val trailer = cur.dict().v
    if (trailer.contains("Encrypt"))
      fail("encrypted PDF (/Encrypt) — out of this codec's scope")
    if (trailer.contains("Prev"))
      fail("incremental-update xref chain (/Prev) — out of this codec's scope")
    val size = trailer.get("Size") match {
      case Some(VNum(s)) => s.toInt
      case _             => fail("trailer has no /Size")
    }
    if (offsets.size != size - 1)
      fail(s"xref holds ${offsets.size} in-use objects, /Size says ${size - 1}")
    val rootRef = trailer.get("Root") match {
      case Some(VRef(r)) => r
      case _             => fail("trailer has no /Root reference")
    }

    /** Parse object `num`; a stream object returns (dict, Some(data)). */
    def getObj(num: Int): (Map[String, V], Option[Array[Byte]]) = {
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
          case Some(VRef(_)) =>
            fail(s"object $num: indirect /Length — out of this codec's scope")
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
      val (cdict, cdata) = getObj(refOf(page.get("Contents"), "/Contents"))
      val raw = cdata.getOrElse(fail("/Contents is not a stream object"))
      val (data, flate) = cdict.get("Filter") match {
        case None => (raw, false)
        case Some(VName("FlateDecode")) => (inflateZlib(docId, raw), true)
        case Some(VArr(Seq(VName("FlateDecode")))) =>
          (inflateZlib(docId, raw), true)
        case Some(f) => fail(s"unsupported stream filter $f")
      }
      val (text, nOps) = extractText(docId, data)
      Page(text, nOps, data.length, flate)
    }
    PdfMeta(version, offsets.size, pages)
  }

  private def readInt(c: Cursor): Int = {
    c.skipWs()
    val b = new StringBuilder
    while (c.peek >= '0' && c.peek <= '9') b.append(c.next().toChar)
    if (b.isEmpty) c.fail(s"expected integer at offset ${c.pos}")
    b.toString.toInt
  }

  private def inflateZlib(docId: Long, data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(false) // zlib wrapper, RFC 1950
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException(
            s"doc $docId: truncated FlateDecode stream")
        out.write(tmp, 0, n)
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
