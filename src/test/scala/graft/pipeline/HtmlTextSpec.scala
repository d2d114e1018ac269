package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HtmlTextSpec extends SparkTestBase {
  import spark.implicits._

  private def x(html: String): String = HtmlText.htmlToText(html)

  test("strips tags, decodes entities, collapses whitespace") {
    assert(x("<p>hello   world</p>") === "hello world")
    assert(x("<p>a&amp;b &lt;tag&gt; &quot;q&quot; &apos;s&apos;</p>")
      === "a&b <tag> \"q\" 's'")
    assert(x("<p>n&#98;sp&nbsp;here &#x41;&#66;</p>") === "nbsp here AB")
    assert(x("<p>unknown &fake; stays</p>") === "unknown &fake; stays")
    // inline tags vanish without word breaks; block tags break lines
    assert(x("a<b>c</b>d") === "acd")
    assert(x("<p>one</p><p>two</p>") === "one\ntwo")
    assert(x("line1<br>line2") === "line1\nline2")
    // intra-block newlines/tabs collapse to single spaces (HTML ws rules)
    assert(x("<p>a\n\t b\u000B\fc</p>") === "a b\u000B c")
    assert(x("<p>a\n\t b\f\rc</p>") === "a b c")
  }

  test("drops script/style/comments wholesale, surviving embedded traps") {
    assert(x("""<script>if (1 < 2) { var s = "</div>"; }</script><p>t</p>""")
      === "t")
    assert(x("<SCRIPT SRC='x.js'>a</ScRiPt><p>t</p>") === "t")
    assert(x("<style>p { color: red } /* <p>no</p> */</style><p>t</p>") === "t")
    assert(x("<!-- <p>fake</p> --><p>t</p>") === "t")
    // scriptx is NOT script: the tag-name terminator check
    assert(x("<scriptx><p>t</p>") === "t")
  }

  test("is total on crawl garbage") {
    assert(x(null) === "")
    assert(x("") === "")
    assert(x("no html at all") === "no html at all")
    assert(x("<p>unterminated") === "unterminated")
    assert(x("<script>never closed <p>gone") === "")
    assert(x("<!-- never closed <p>gone") === "")
    // "<<<>" parses as one malformed tag; the stray ">>" is text
    assert(x("<<<>>><p>&</p>&#zz; &#999999999999;")
      === ">>\n&\n&#zz; &#999999999999;")
    // input NUL and \u000B are CONTENT (RE2 \s parity with the DuckDB
    // oracle): preserved verbatim, never a line break, never collapsed
    assert(x("<p>a\u0000b</p>") === "a\u0000b")
    assert(x("<p>a\u000Bb</p>") === "a\u000Bb")
    assert(x("<p>a \u000B b</p>") === "a \u000B b")
    // and a NUL still cannot fake a block boundary
    assert(x("<p>a\u0000b</p>").count(_ == '\n') === 0)
  }

  test("WARC -> HTML body -> text chain matches the direct kernel") {
    val docs = Seq(
      (1L, "<html><body><p>alpha &amp; beta</p></body></html>"),
      (2L, "<p>two</p><script>x</script><p>lines</p>"))
    val warc = graft.sources.Warc.encodeWarc(
      docs.map { case (id, h) =>
        (s"https://t/$id", 200,
          h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }, gzipPerRecord = true)
    val files = Seq((0L, warc)).toDF("g", "payload")
    val recs = graft.sources.Warc.warcRecords(files).toDF()
      .filter($"warc_type" === "response")
    val extracted = HtmlText.extractFromBodies(recs)
      .select($"target_uri", $"text").as[(String, String)].collect().toMap
    assert(extracted("https://t/1") === "alpha & beta")
    assert(extracted("https://t/2") === "two\nlines")
  }
}
