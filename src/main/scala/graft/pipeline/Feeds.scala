package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * RSS 2.0 / Atom feed ingestion (late r15) — the THIRD frontier feeder
 * and the primary FRESHNESS channel: where sitemaps declare a site's
 * whole url space at maintenance cadence, feeds announce what changed
 * in the last hours, so a crawl that wants news-grade freshness polls
 * feeds between sitemap passes. Same discipline as [[Sitemaps]]:
 * dependency-free positional scanners (total on garbage — feed XML in
 * the wild is as broken as HTML), entity decode + the frontier's OWN
 * canonicalization before the crawled check, verbatim date strings
 * (RFC 822 pubDate vs RFC 3339 updated — normalization is the
 * consumer's step, exactly the sitemap-lastmod contract).
 */
object Feeds {

  /** One feed entry: (link, date|null). Entries are the regions opened
    * by `<item` (RSS 2.0) or `<entry` (Atom) tags — channel-level
    * prologue links (the feed's OWN homepage — fetching it per poll
    * would be a self-DDoS) never count. Within a region the FIRST link
    * wins: an RSS `<link>` carries its url as TEXT content; an Atom
    * `<link …>` carries it in the `href` attribute (either quote
    * form). The FIRST `<pubDate>`/`<updated>`/`<published>` text in
    * the region is the entry's date, verbatim; a region without one
    * pairs null. Case-insensitive, linear, never throws. */
  def entries(xml: String): Array[(String, String)] = {
    if (xml == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val n = xml.length
    def lower(c: Char): Char = Character.toLowerCase(c)
    def tagAt(i: Int, t: String): Boolean = {
      if (i + t.length > n) return false
      var k = 0
      while (k < t.length) {
        if (lower(xml.charAt(i + k)) != t.charAt(k)) return false
        k += 1
      }
      true
    }
    // a region OPEN is "<item" / "<entry" followed by a delimiter —
    // "<items>" or "<entryPoint>" must not open one
    def opensAt(i: Int, t: String): Boolean =
      tagAt(i, t) && i + t.length < n && {
        val c = xml.charAt(i + t.length)
        c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }
    var link: String = null
    var date: String = null
    var inRegion = false
    def flush(): Unit = {
      if (inRegion && link != null) out += ((link, date))
      link = null; date = null
    }
    def textUntil(from: Int, close: String): (String, Int) = {
      var j = from
      while (j < n && xml.charAt(j) != '<') j += 1
      if (j < n && tagAt(j, close)) (xml.substring(from, j), j + close.length)
      else (null, j)
    }
    var i = 0
    while (i < n) {
      if (xml.charAt(i) != '<') i += 1
      else if (opensAt(i, "<item")) {
        flush(); inRegion = true; i += 5
      } else if (opensAt(i, "<entry")) {
        flush(); inRegion = true; i += 6
      } else if (tagAt(i, "</item>")) {
        flush(); inRegion = false; i += 7
      } else if (tagAt(i, "</entry>")) {
        flush(); inRegion = false; i += 8
      } else if (inRegion && link == null && tagAt(i, "<link")) {
        // Atom form: href attribute inside the tag (self-closing or
        // not); RSS form: "<link>" then text content
        val tagClose = {
          var j = i + 5
          while (j < n && xml.charAt(j) != '>') j += 1
          j
        }
        if (tagClose >= n) i = tagClose
        else if (xml.charAt(i + 5) == '>') {
          val (t, next) = textUntil(i + 6, "</link>")
          if (t != null) { link = t.trim; i = next } else i = next
        } else {
          val attrs = xml.substring(i + 5, tagClose)
          link = hrefOf(attrs)
          i = tagClose + 1
        }
      } else if (inRegion && date == null && (tagAt(i, "<pubdate>") ||
          tagAt(i, "<updated>"))) {
        val close = if (tagAt(i, "<pubdate>")) "</pubdate>" else "</updated>"
        val (t, next) = textUntil(i + 9, close)
        if (t != null) { date = t.trim; i = next } else i = next
      } else if (inRegion && date == null && tagAt(i, "<published>")) {
        val (t, next) = textUntil(i + 11, "</published>")
        if (t != null) { date = t.trim; i = next } else i = next
      } else i += 1
    }
    flush()
    out.toArray
  }

  /** First href attribute value in an attribute region — double- or
    * single-quoted (the [[HtmlText]] href contract). */
  private def hrefOf(attrs: String): String = {
    val lower = attrs.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val h = lower.indexOf("href", from)
      if (h < 0) return null
      // attribute-name boundary: "xhref=" must not match
      if (h > 0 && !" \t\n\r/".contains(attrs.charAt(h - 1))) {
        from = h + 4
      } else {
        var j = h + 4
        while (j < attrs.length && attrs.charAt(j) == ' ') j += 1
        if (j < attrs.length && attrs.charAt(j) == '=') {
          j += 1
          while (j < attrs.length && attrs.charAt(j) == ' ') j += 1
          if (j < attrs.length &&
            (attrs.charAt(j) == '"' || attrs.charAt(j) == '\'')) {
            val q = attrs.charAt(j)
            val end = attrs.indexOf(q, j + 1)
            if (end > 0) return attrs.substring(j + 1, end)
            return null
          }
        }
        from = h + 4
      }
    }
    null // unreachable
  }

  /** [[entries]] over a RAW (possibly gzipped) fetched body. */
  def entriesFromBytes(body: Array[Byte]): Array[(String, String)] =
    Sitemaps.decodeBody(body).map(entries).getOrElse(Array.empty)

  /** Seed candidates from fetched feed bodies: entry links
    * entity-decoded (RSS mandates XML escaping — `&amp;` in every
    * multi-param news url) and canonicalized exactly like the frontier
    * ([[UrlResolve.selfNormalize]] — relative/non-http(s) links null
    * out; feeds carry absolute urls by convention), anti-joined
    * against `crawled`, ref-counted across feeds, with `feed_date` =
    * the MAX verbatim date across listings (null when none declares
    * one) — the freshness signal a fetcher weighs against
    * [[Crawl.recrawlChurn]] exactly like sitemap lastmod. Same output
    * shape as [[Sitemaps.seedsWithLastmod]] modulo the column name. */
  def seedsFromFeeds(feeds: DataFrame, crawled: DataFrame,
                     bodyCol: String = "body",
                     urlCol: String = "url"): DataFrame = {
    val pairs = udf((b: Array[Byte]) => entriesFromBytes(b))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    feeds.select(explode(pairs(col(bodyCol))).as("_fe"))
      .select(canon(col("_fe._1")).as("url"), col("_fe._2").as("feed_date"))
      .filter(col("url").isNotNull)
      .join(crawled.select(col(urlCol).cast("string").as("url")),
        Seq("url"), "left_anti")
      .groupBy("url")
      .agg(count(lit(1)).as("n_refs"), max(col("feed_date")).as("feed_date"))
  }
}
