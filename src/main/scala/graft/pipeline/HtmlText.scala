package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WET-style HTML→text extraction — the step between WARC ingestion
 * ([[graft.sources.Warc]]) and the text pipeline (C4/Gopher filters,
 * dedup, quality): crawl response bodies are HTML; training corpora are
 * the visible text. Common Crawl publishes exactly this transform as its
 * WET files.
 *
 * The kernel is a single-pass character state machine, not regex — crawl
 * HTML is adversarial (unterminated tags, megabyte attributes, nested
 * garbage), and a backtracking regex over it is a DoS vector while a
 * state machine is strictly O(n):
 *
 *  - `<script>`/`<style>` elements drop whole (case-insensitive,
 *    attribute-tolerant), `<!-- -->` comments drop whole;
 *  - block-level tags (p, div, br, li, h1–h6, tr, td, table, ul, ol,
 *    section, article, header, footer, blockquote, pre, hr, title, …)
 *    become line breaks; inline tags vanish (HTML's own rendering
 *    semantics — `a<b>c</b>` renders "ac");
 *  - the core character entities decode (`&amp; &lt; &gt; &quot; &apos;
 *    &nbsp;`) plus numeric `&#NNN;`/`&#xHH;` forms; unknown entities
 *    pass through literally (crawl reality — never throw);
 *  - within each line, every whitespace run collapses to one space and
 *    edges trim (HTML whitespace semantics); empty lines drop; lines
 *    join with `\n`.
 *
 * Deterministic and engine-portable by construction: the
 * `warc_html_extract` oracle rebuilds the expected text in SQL from the
 * source documents and compares md5s byte-exactly.
 *
 * Scale: per-row map work — no shuffle, no driver involvement;
 * throughput scales with cores like the media decoders.
 */
object HtmlText {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td",
    "th", "table", "ul", "ol", "dl", "dt", "dd", "section", "article",
    "header", "footer", "blockquote", "pre", "hr", "form", "nav", "aside",
    "main", "figure", "figcaption", "title")

  // block boundaries are tracked as OFFSETS into the pre-collapse buffer
  // (not an in-band sentinel char), so no input byte -- NUL included -- can
  // mint or mask one; crawl bytes pass through as content verbatim

  /** Decode one entity starting at `i` (the `&`); returns (decoded code
    * point or -1 when not an entity, next index). */
  private def entity(s: String, i: Int): (Int, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return (-1, i) // not an entity: literal &
    val name = s.substring(i + 1, semi)
    name match {
      case "amp" => ('&'.toInt, semi + 1)
      case "lt" => ('<'.toInt, semi + 1)
      case "gt" => ('>'.toInt, semi + 1)
      case "quot" => ('"'.toInt, semi + 1)
      case "apos" => ('\''.toInt, semi + 1)
      case "nbsp" => (' '.toInt, semi + 1)
      case _ if name.length > 1 && name.charAt(0) == '#' =>
        val cp =
          if (name.length > 2 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
            scala.util.Try(Integer.parseInt(name.substring(2), 16)).getOrElse(-1)
          else scala.util.Try(Integer.parseInt(name.substring(1))).getOrElse(-1)
        if (cp > 0 && Character.isValidCodePoint(cp)) (cp, semi + 1)
        else (-1, i)
      case _ => (-1, i) // unknown entity: keep literal
    }
  }

  /** Case-insensitive check that `s` at `from` starts with `tag` followed
    * by a name terminator (whitespace, '>', '/'). */
  private def tagAt(s: String, from: Int, tag: String): Boolean = {
    if (from + tag.length > s.length) return false
    var k = 0
    while (k < tag.length) {
      if (Character.toLowerCase(s.charAt(from + k)) != tag.charAt(k)) return false
      k += 1
    }
    val end = from + tag.length
    end >= s.length || !Character.isLetterOrDigit(s.charAt(end))
  }

  /** Case-insensitive indexOf for the two raw-text element closers. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(0, from)
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(s.charAt(i + k)) == needle.charAt(k))
        k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  /** The extraction kernel (see object doc). Total: any input, including
    * non-HTML garbage, yields a string; never throws. */
  def htmlToText(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 20))
    var breaks = new Array[Int](16) // block-break offsets into `out`
    var nBreaks = 0
    def addBreak(): Unit = {
      if (nBreaks == breaks.length)
        breaks = java.util.Arrays.copyOf(breaks, breaks.length * 2)
      breaks(nBreaks) = out.length(); nBreaks += 1
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 3 < n && html.charAt(i + 1) == '!' && html.charAt(i + 2) == '-'
          && html.charAt(i + 3) == '-') { // comment
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (tagAt(html, i + 1, "script") ||
                   tagAt(html, i + 1, "style")) {
          val closer =
            if (tagAt(html, i + 1, "script")) "</script" else "</style"
          val end = indexOfIgnoreCase(html, closer, i + 1)
          i =
            if (end < 0) n
            else html.indexOf('>', end) match {
              case -1 => n
              case e => e + 1
            }
          addBreak()
        } else {
          // generic tag: read the name, skip to '>'
          var j = i + 1
          if (j < n && html.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          val close = html.indexOf('>', j)
          i = if (close < 0) n else close + 1
          if (BlockTags.contains(name)) addBreak()
        }
      } else if (c == '&') {
        val (cp, next) = entity(html, i)
        if (cp >= 0) { out.appendCodePoint(cp); i = next }
        else { out.append('&'); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // per-line whitespace collapse + trim, drop empties, join with \n.
    // the collapsible set is EXACTLY RE2's \s ([\t\n\f\r ]) so the
    // SQL-rebuilt oracle (DuckDB regexp_replace '\s+') holds for
    // arbitrary corpus text -- \u000B and NUL are content, not
    // whitespace (the documented Java-vs-RE2 parity trap class)
    val text = out.toString
    val sb = new java.lang.StringBuilder(text.length)
    var first = true
    var seg = 0
    var bi = 0
    while (bi <= nBreaks) {
      val brk = if (bi < nBreaks) breaks(bi) else text.length
      var k = seg
      val line = new java.lang.StringBuilder(brk - seg)
      var pendingSpace = false
      while (k < brk) {
        val ch = text.charAt(k)
        if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' ||
          ch == '\f') pendingSpace = line.length() > 0
        else {
          if (pendingSpace) { line.append(' '); pendingSpace = false }
          line.append(ch)
        }
        k += 1
      }
      if (line.length() > 0) {
        if (!first) sb.append('\n')
        sb.append(line)
        first = false
      }
      seg = brk
      bi += 1
    }
    sb.toString
  }

  /** Column form for pipeline composition. */
  def htmlToTextCol(html: Column): Column = {
    val u = udf((s: String) => htmlToText(s))
    u(html)
  }

  /** Extract text from a binary HTML body column (the
    * [[graft.sources.Warc.warcRecords]] output shape): UTF-8 decode then
    * the kernel, one map-side pass. */
  def extractFromBodies(records: DataFrame, bodyCol: String = "body",
                        outCol: String = "text"): DataFrame =
    records.withColumn(outCol,
      htmlToTextCol(col(bodyCol).cast("string")))
}
