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
