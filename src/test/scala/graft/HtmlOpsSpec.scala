package graft

import graft.ops.HtmlOps
import org.scalatest.funsuite.AnyFunSuite

/** HTML block walker: raw-text rule, entity decode, link counting, and
  * loud refusal of malformed markup. */
class HtmlOpsSpec extends AnyFunSuite {

  test("blocks segment, scripts/styles/comments are data-skipped, entities decode") {
    val html = "<html><head><title>T one</title>" +
      "<style>p { color: red; }</style></head><body>" +
      "<!-- a <p>commented-out</p> block -->" +
      "<script>var s = '</div><p>looks like markup</p>';</script>" +
      "<p>alpha &amp; beta <a href=\"/x\">gamma</a> &lt;delta&gt;</p>" +
      "<nav><a href=\"/\">Home</a></nav></body></html>"
    val got = HtmlOps.blocks(1L, html)
    assert(got.map(_.tag) == IndexedSeq("title", "p", "nav"))
    assert(got(0).text == "T one")
    assert(got(1).text == "alpha & beta gamma <delta>")
    assert(got(1).nLinks == 1)
    assert(got(2).nLinks == 1)
    assert(got.map(_.idx) == IndexedSeq(0, 1, 2))
  }

  test("'>' inside a quoted attribute value does not end the tag") {
    val html = "<p>alpha <a href=\"/x\" data-sym=\"a>b\">beta</a> gamma" +
      " <a href='/y' title='1>0'>delta</a></p>"
    val got = HtmlOps.blocks(3L, html)
    assert(got.map(_.text) == IndexedSeq("alpha beta gamma delta"))
    assert(got.head.nLinks == 2)
    // an unterminated quote is an unterminated tag, loudly
    val msg = intercept[IllegalArgumentException](
      HtmlOps.blocks(4L, "<p><a href=\"/never>text</p>")).getMessage
    assert(msg.contains("unterminated tag"))
  }

  test("mainText counts words like the oracle's string_split (trailing empties kept)") {
    // 'w x ' splits to 3 tokens under string_split semantics, so the
    // block passes the >= 3-word rule even with only 2 visible words
    val html = "<p>w x&#39; </p><nav><a href=\"/\">Home</a></nav>"
    assert(HtmlOps.mainText(5L, html) == "w x' ")
  }

  test("escape/decode roundtrip") {
    val s = "a & b < c > d"
    val html = s"<p>${HtmlOps.escape(s)}</p>"
    assert(HtmlOps.blocks(2L, html).head.text == s)
  }

  test("malformed markup fails loudly with the doc id") {
    def bad(html: String): String =
      intercept[IllegalArgumentException](HtmlOps.blocks(9L, html)).getMessage
    assert(bad("<p>unclosed").contains("9"))
    assert(bad("<p>a<nav>b</nav></p>").contains("nested"))
    assert(bad("<p>a</footer>").contains("closes"))
    assert(bad("<p>bad &copy; entity</p>").contains("unsupported entity"))
    assert(bad("<script>never closed").contains("unterminated <script>"))
    assert(bad("<!-- open comment <p>x</p>").contains("unterminated comment"))
  }
}
