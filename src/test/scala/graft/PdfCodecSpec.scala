package graft

import graft.multimodal.PdfCodec
import org.scalatest.funsuite.AnyFunSuite

/** PdfCodec: writer↔walker round-trips (plain + FlateDecode, Tj + TJ),
  * the literal-string escape set fuzzed on hostile text, and the loud
  * out-of-scope rejections (encrypted, xref streams, incremental
  * chains, indirect /Length, unbalanced BT). */
class PdfCodecSpec extends AnyFunSuite {

  private def pdf(pages: (Seq[String], Boolean)*): Array[Byte] =
    PdfCodec.encode(pages.map { case (segs, fl) =>
      PdfCodec.PageSpec(segs, fl)
    })

  test("single plain page round-trips text, op count and version") {
    val b = pdf((Seq("Hello world"), false))
    val m = PdfCodec.parse(1L, b)
    assert(m.version == "1.4")
    assert(m.pages.size == 1)
    assert(m.pages.head.text == "Hello world")
    assert(m.pages.head.nTextOps == 1)
    assert(!m.pages.head.flate)
  }

  test("multi-page mixed plain/flate round-trips in page order") {
    val b = pdf(
      (Seq("page one ", "left", "right"), true),
      (Seq("page two"), false),
      (Seq("page ", "three"), true))
    val m = PdfCodec.parse(2L, b)
    assert(m.pages.map(_.text) ==
      Seq("page one leftright", "page two", "page three"))
    assert(m.pages.map(_.flate) == Seq(true, false, true))
    assert(m.pages.map(_.nTextOps) == Seq(2, 1, 2))
    // decoded content bytes equal the raw operator stream length
    assert(m.pages.forall(p => p.contentBytes > 20))
    assert(m.nObjects == 9) // catalog + pages node + 3 pages + 3 contents + font
  }

  test("escape set round-trips hostile strings byte-exactly") {
    val hostile = Seq(
      "parens (nested (deep)) and \\ backslash",
      "control\nchars\tand\rmore\u0001end",
      "high latin1 éÿ bytes",
      ")))(((",
      "trailing backslash \\")
    val b = pdf((hostile, false), (hostile.reverse, true))
    val m = PdfCodec.parse(3L, b)
    assert(m.pages(0).text == hostile.mkString)
    assert(m.pages(1).text == hostile.reverse.mkString)
  }

  test("pseudo-random escape fuzz on paren/backslash-dense strings") {
    val rnd = new scala.util.Random(42)
    (0 until 25).foreach { i =>
      val chars = "()\\\n\r\t ab\u0000ÿ"
      val segs = (0 until 1 + rnd.nextInt(3)).map(_ =>
        (0 until 1 + rnd.nextInt(30))
          .map(_ => chars(rnd.nextInt(chars.length))).mkString)
      val m = PdfCodec.parse(i.toLong, pdf((segs, i % 2 == 0)))
      assert(m.pages.head.text == segs.mkString, s"fuzz case $i")
    }
  }

  test("encrypted, hybrid-reference, looping and truncated files fail loudly") {
    val good = pdf((Seq("x"), false))
    val s = new String(good, "ISO-8859-1")
    def expectFail(mutated: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        PdfCodec.parse(9L, mutated.getBytes("ISO-8859-1"))
      }
      assert(e.getMessage.contains(needle),
        s"wanted '$needle' in: ${e.getMessage}")
    }
    expectFail(s.replace("/Size", "/Encrypt 7 0 R /Size"), "encrypted")
    expectFail(s.replace("/Size", "/XRefStm 99 /Size"), "hybrid-reference")
    // a /Prev pointing back at THIS table → chain-loop rejection
    val ownXref = {
      val i = s.lastIndexOf("startxref")
      s.substring(i + "startxref".length).trim.takeWhile(_.isDigit)
    }
    expectFail(s.replace("/Size", s"/Prev $ownXref /Size"), "loops")
    // point startxref at a non-XRef object body → the typed rejection
    val objAt = s.indexOf("1 0 obj")
    expectFail(s.replaceAll("startxref\n\\d+", s"startxref\n$objAt"),
      "not /Type /XRef")
    expectFail("%PDF-1.4\njunk" + (" " * 40), "startxref")
    expectFail("nope" + s.drop(4), "bad PDF header")
    expectFail(s.take(s.length / 2), "startxref")
  }

  test("xref-stream files (W entries, PNG Up predictor) round-trip") {
    val b = PdfCodec.encodeXrefStream(Seq(
      PdfCodec.PageSpec(Seq("stream xref ", "page one"), flate = true),
      PdfCodec.PageSpec(Seq("page two"), flate = false)))
    val m = PdfCodec.parse(11L, b)
    assert(m.pages.map(_.text) == Seq("stream xref page one", "page two"))
    assert(m.pages.map(_.flate) == Seq(true, false))
    // the xref stream object itself is a counted in-use object
    assert(m.nObjects == 8) // catalog+pages+2 pages+2 contents+font+xref
  }

  test("incremental updates resolve the NEWEST object along the /Prev chain") {
    val pages = Seq(
      PdfCodec.PageSpec(Seq("final page zero text"), flate = true),
      PdfCodec.PageSpec(Seq("page one"), flate = false))
    val b = PdfCodec.encodeIncremental(pages, placeholder = "OLD TEXT")
    val m = PdfCodec.parse(12L, b)
    assert(m.pages.map(_.text) == Seq("final page zero text", "page one"))
    assert(m.pages.head.flate)
    // the base document REALLY carried the placeholder: truncating the
    // file at the first %%EOF yields the pre-update text
    val s = new String(b, "ISO-8859-1")
    val baseEnd = s.indexOf("%%EOF\n") + "%%EOF\n".length
    val base = PdfCodec.parse(12L, s.take(baseEnd).getBytes("ISO-8859-1"))
    assert(base.pages.head.text == "OLD TEXT")
    assert(!base.pages.head.flate)
  }

  test("indirect /Length and multi-stream /Contents parse (hand-rolled file)") {
    // a 3-object content layer: page /Contents [ 4 0 R 6 0 R ], object
    // 4's /Length indirect via object 5 — both newly-supported shapes
    val c1 = "BT /F1 12 Tf (Hello ) Tj"
    val c2 = "(world) Tj ET"
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>\n",
      2 -> "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\n",
      3 -> ("<< /Type /Page /Parent 2 0 R " +
        "/Contents [ 4 0 R 6 0 R ] >>\n"),
      4 -> s"<< /Length 5 0 R >>\nstream\n$c1\nendstream\n",
      5 -> s"${c1.length}\n",
      6 -> s"<< /Length ${c2.length} >>\nstream\n$c2\nendstream\n")
    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { case (num, body) =>
      val off = out.length
      out.append(s"$num 0 obj\n").append(body).append("endobj\n")
      num -> off
    }.toMap
    val xrefAt = out.length
    out.append(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    (1 to objs.size).foreach(i => out.append(f"${offsets(i)}%010d 00000 n \n"))
    out.append(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\n")
    out.append(s"startxref\n$xrefAt\n%%EOF\n")
    val m = PdfCodec.parse(13L, out.toString.getBytes("ISO-8859-1"))
    assert(m.pages.size == 1)
    assert(m.pages.head.text == "Hello world")
    assert(m.pages.head.nTextOps == 2)
  }

  test("compressed object streams (ObjStm + type-2 entries) round-trip") {
    val b = PdfCodec.encodeObjectStreams(Seq(
      PdfCodec.PageSpec(Seq("objstm ", "page one"), flate = true),
      PdfCodec.PageSpec(Seq("page two"), flate = false)))
    val m = PdfCodec.parse(16L, b)
    assert(m.pages.map(_.text) == Seq("objstm page one", "page two"))
    assert(m.pages.map(_.flate) == Seq(true, false))
    // catalog+pages+2 page dicts+font compressed; 2 contents + ObjStm +
    // xref stream top-level
    assert(m.nObjects == 9)
    // the type-2 indirection is real: the raw bytes hold no top-level
    // "1 0 obj" catalog — it only exists inside the decoded ObjStm
    assert(!new String(b, "ISO-8859-1").contains("1 0 obj"))
  }

  test("a type-2 entry pointing at a missing object stream fails loudly") {
    // hand-rolled minimal xref STREAM whose obj1 claims to live in
    // object stream 9, which the xref never lists
    val head = "%PDF-1.5\n"
    val out = new StringBuilder(head)
    val xrefAt = out.length
    val rows: Array[Byte] = Array[Byte](
      0, 0, 0, 0, 0, 0, 0,
      2, 0, 0, 0, 9, 0, 0,
      1, 0, 0, 0, 9, 0, 0)
    out.append("2 0 obj\n<< /Type /XRef /Size 3 /W [ 1 4 2 ] " +
      s"/Length ${rows.length} /Root 1 0 R >>\nstream\n")
    val pre = out.toString.getBytes("ISO-8859-1")
    val tail = s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%EOF\n"
      .getBytes("ISO-8859-1")
    val all = pre ++ rows ++ tail
    val e = intercept[IllegalArgumentException] { PdfCodec.parse(14L, all) }
    assert(e.getMessage.contains("missing from the xref table"),
      s"got: ${e.getMessage}")
  }

  test("FDICT (preset-dictionary) flate streams fail loudly, not hang") {
    val good = pdf((Seq("flate body text"), true))
    // the zlib header of the flate content stream is 0x78 0x9C; 0x78
    // 0xBB is a VALID header with the FDICT flag set (checksum holds) —
    // Inflater then reports needsDictionary() with needsInput() false,
    // which a naive input-only loop spins on forever
    val idx = {
      val s = new String(good, "ISO-8859-1")
      s.indexOf("stream\n") + "stream\n".length
    }
    assert((good(idx) & 0xff) == 0x78 && (good(idx + 1) & 0xff) == 0x9c)
    val bad = good.clone()
    bad(idx + 1) = 0xBB.toByte
    val e = intercept[IllegalArgumentException] { PdfCodec.parse(15L, bad) }
    assert(e.getMessage.contains("preset"), s"got: ${e.getMessage}")
  }

  test("dangling indirect /Length and foreign filters fail loudly") {
    val good = pdf((Seq("abcd"), false))
    val s = new String(good, "ISO-8859-1")
    // in-dict mutations shift everything after the content object —
    // repoint startxref at the moved table (stale entries are fine: the
    // walk must fail on the dict before dereferencing anything past it)
    def fixStartxref(m: String): Array[Byte] =
      m.replaceAll("startxref\n\\d+",
        "startxref\n" + (m.indexOf("\nxref\n0 ") + 1))
        .getBytes("ISO-8859-1")
    // indirect /Length is SUPPORTED now, but a reference to an object
    // the xref never listed must still fail loudly at resolution
    val e1 = intercept[IllegalArgumentException] {
      PdfCodec.parse(9L,
        fixStartxref(s.replaceFirst("/Length \\d+", "/Length 99 0 R")))
    }
    assert(e1.getMessage.contains("missing from the xref table"))
    val e2 = intercept[IllegalArgumentException] {
      PdfCodec.parse(9L,
        fixStartxref(s.replaceFirst("<< /Length",
          "<< /Filter /LZWDecode /Length")))
    }
    assert(e2.getMessage.contains("unsupported stream filter"))
  }

  test("unbalanced BT and out-of-scope show operators fail loudly") {
    // hand-roll content streams through a one-page wrapper by patching
    // the plain content bytes (same /Length, same offsets)
    def patched(ops: String): Array[Byte] = {
      val template = "BT /F1 12 Tf 72 720 Td (padpadpad) Tj ET"
      require(ops.length == template.length, s"${ops.length} vs ${template.length}")
      val good = new String(pdf((Seq("padpadpad"), false)), "ISO-8859-1")
      assert(good.contains(template))
      good.replace(template, ops).getBytes("ISO-8859-1")
    }
    val e1 = intercept[IllegalArgumentException] {
      PdfCodec.parse(9L, patched("BT /F1 12 Tf 72 720 Td (padpadpad) Tj BT"))
    }
    assert(e1.getMessage.contains("nested BT"))
    val e2 = intercept[IllegalArgumentException] {
      PdfCodec.parse(9L, patched("BT /F1 12 Tf 72 720 Td (padpadpad)  ' ET"))
    }
    assert(e2.getMessage.contains("out of this codec's scope"))
  }

  test("corrupt flate stream fails loudly, not garbage") {
    val good = pdf((Seq("flate body text"), true))
    // flip bytes in the middle of the compressed stream
    val idx = {
      val s = new String(good, "ISO-8859-1")
      s.indexOf("stream\n") + 10
    }
    val bad = good.clone()
    bad(idx) = (bad(idx) ^ 0x55).toByte
    bad(idx + 1) = (bad(idx + 1) ^ 0x77).toByte
    // the adler32/stream check catches it (corrupt FlateDecode), or —
    // for flips the checksum can't see before decode fails — the text
    // scan rejects the garbage operators; never a silent wrong answer
    val e = intercept[IllegalArgumentException] { PdfCodec.parse(9L, bad) }
    assert(e.getMessage.startsWith("doc 9:"))
  }
}
