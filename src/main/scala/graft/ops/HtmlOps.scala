package graft.ops

/** HTML main-content extraction — the crawl-pipeline stage between the
  * WARC ingest (q146/q156) and text dedup/quality: real corpora arrive
  * as markup, and the extractor must segment block-level text, skip
  * script/style raw text, decode entities, and classify boilerplate
  * (navigation, footers) OUT by link density — the jusText/trafilatura
  * family of rules, reduced to its deterministic core so the oracle can
  * replay classification closed-form (q170).
  *
  * What parses for REAL, self-written: tag scanning with attributes,
  * HTML comments, the HTML5 raw-text rule for `<script>`/`<style>`
  * (content runs to the literal close tag — markup-looking bytes inside
  * are data, not tags), the five standard entities, and a flat
  * block-level text model (`p`, `nav`, `footer`, `title`, `h1`, `h2`,
  * `li` open/close delimit blocks; inline `<a>` counts links; `div` and
  * other structural tags carry no text of their own). Malformed markup
  * — unterminated tags/comments/raw-text, mismatched or nested block
  * tags, unknown entities — throws `IllegalArgumentException` naming
  * the doc id, the codec-family failure contract. */
object HtmlOps {

  case class Block(idx: Int, tag: String, text: String, nLinks: Int)

  /** Tags that delimit one text block each in the flat model. */
  val BlockTags: Set[String] =
    Set("p", "nav", "footer", "title", "h1", "h2", "li")

  /** Escape text for embedding into markup (the generator half of the
    * roundtrip — decode(escape(x)) == x for the parser below). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The extraction composition the crawl chain ships (q171): kept
    * blocks' text in document order, space-joined — kept = not the
    * title, >= 3 words, and links*2 < words (the jusText-style
    * link-density rule q170 audits block by block). */
  def mainText(docId: Long, html: String): String =
    blocks(docId, html).filter { b =>
      // limit -1 keeps trailing empty tokens — the same word count the
      // oracle's DuckDB string_split sees, so a block ending in a space
      // classifies identically on both sides (r15 advice)
      val w = b.text.split(" ", -1).length
      b.tag != "title" && w >= 3 && b.nLinks * 2 < w
    }.map(_.text).mkString(" ")

  /** Find the end of a tag opened at `lt` (`html(lt) == '<'`), honoring
    * QUOTED attribute values — a `>` inside `"…"` or `'…'` is data, not
    * the tag end (the naive indexOf('>') mis-split it — r15 verdict).
    * Returns the index of the closing '>' or -1 when the tag (or a
    * quote inside it) never terminates. */
  private def tagEnd(html: String, lt: Int): Int = {
    var i = lt + 1
    while (i < html.length) {
      html.charAt(i) match {
        case '>' => return i
        case q @ ('"' | '\'') =>
          val close = html.indexOf(q, i + 1)
          if (close < 0) return -1
          i = close + 1
        case _ => i += 1
      }
    }
    -1
  }

  /** Walk one document's markup into its ordered text blocks. */
  def blocks(docId: Long, html: String): IndexedSeq[Block] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    val sb = new StringBuilder
    var i = 0
    var open: String = null
    var links = 0
    var idx = 0
    while (i < html.length) {
      val ch = html.charAt(i)
      if (ch == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          if (end < 0) fail(s"unterminated comment at $i")
          i = end + 3
        } else {
          val gt = tagEnd(html, i)
          if (gt < 0) fail(s"unterminated tag at $i")
          val raw = html.substring(i + 1, gt)
          val closing = raw.startsWith("/")
          val body = if (closing) raw.substring(1) else raw
          val name = body.takeWhile(_.isLetterOrDigit).toLowerCase
          if (name.isEmpty) fail(s"empty tag name at $i")
          i = gt + 1
          if (!closing && (name == "script" || name == "style")) {
            // HTML5 raw-text rule: data runs to the LITERAL close tag
            val end = html.indexOf(s"</$name>", i)
            if (end < 0) fail(s"unterminated <$name> raw text")
            i = end + name.length + 3
          } else if (BlockTags(name)) {
            if (closing) {
              if (open != name)
                fail(s"</$name> closes ${if (open == null) "no block" else s"<$open>"}")
              out += Block(idx, name, sb.toString, links)
              idx += 1; open = null; sb.clear(); links = 0
            } else {
              if (open != null) fail(s"<$name> nested inside <$open>")
              open = name
            }
          } else if (name == "a" && !closing && open != null) {
            links += 1
          } // html/head/body/div/... are structure, not text blocks
        }
      } else if (ch == '&') {
        val semi = html.indexOf(';', i)
        if (semi < 0 || semi - i > 8) fail(s"malformed entity at $i")
        val dec = html.substring(i + 1, semi) match {
          case "amp" => '&'
          case "lt" => '<'
          case "gt" => '>'
          case "quot" => '"'
          case "#39" => '\''
          case e => fail(s"unsupported entity &$e;")
        }
        if (open != null) sb.append(dec)
        i = semi + 1
      } else {
        if (open != null) sb.append(ch)
        i += 1
      }
    }
    if (open != null) fail(s"unclosed <$open> at end of document")
    require(out.nonEmpty, s"doc $docId: markup has no text blocks")
    out.toIndexedSeq
  }
}
