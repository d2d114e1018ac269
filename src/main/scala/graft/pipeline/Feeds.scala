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
      } else if (inRegion && link == null && tagAt(i, "<link") &&
          i + 5 < n && {
            // tag-name boundary (r16, the ADVICE finding — the opensAt
            // discipline): "<linked>" / "<linkage href=…>" inside an
            // entry must not be treated as its link element. '>' opens
            // the RSS text form, whitespace the Atom attribute form,
            // '/' a (useless but well-formed) self-close.
            val c = xml.charAt(i + 5)
            c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
              c == '/'
          }) {
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

  /** First `name` attribute value in an attribute region — double- or
    * single-quoted (the [[HtmlText]] href contract), name matched
    * case-insensitively at an attribute-name boundary ("xhref=" never
    * matches href). */
  private def attrOf(attrs: String, name: String): String = {
    val lower = attrs.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val h = lower.indexOf(name, from)
      if (h < 0) return null
      if (h > 0 && !" \t\n\r/".contains(attrs.charAt(h - 1))) {
        from = h + name.length
      } else {
        var j = h + name.length
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
        from = h + name.length
      }
    }
    null // unreachable
  }

  private def hrefOf(attrs: String): String = attrOf(attrs, "href")

  /** One harvested media enclosure: (url, mime type|null,
    * declared length|null, entry date|null, entry title|null) —
    * values verbatim. The title is the caption source of an
    * audio-text pipeline (podcast item titles caption the audio). */
  final case class Enclosure(url: String, mimeType: String,
                             length: String, date: String,
                             title: String)

  /** Media enclosures per entry region — the AUDIO/VIDEO harvest the
    * [[entries]] link scanner deliberately skips. Two forms count:
    *
    *  - RSS 2.0 `<enclosure url=… type=… length=…/>` (attributes any
    *    order; url required, the rest optional) — the podcast form;
    *  - Atom `<link rel="enclosure" href=… type=… length=…>` — the
    *    RFC 4287 §4.2.7.2 equivalent. A `<link>` without
    *    rel=enclosure is an ENTRY link, never media.
    *
    * ALL enclosures of a region emit (the RSS single-enclosure
    * convention is widely violated by podcast feeds); each pairs with
    * the region's first date, which may appear after it — emission
    * happens at region close. Same tolerance discipline as
    * [[entries]]: case-insensitive, linear, never throws, prologue
    * (channel-level) enclosures never count. */
  def enclosures(xml: String): Array[Enclosure] = {
    if (xml == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Enclosure]
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
    def opensAt(i: Int, t: String): Boolean =
      tagAt(i, t) && i + t.length < n && {
        val c = xml.charAt(i + t.length)
        c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
          c == '/'
      }
    def regionOpensAt(i: Int, t: String): Boolean =
      tagAt(i, t) && i + t.length < n && {
        val c = xml.charAt(i + t.length)
        c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }
    var pending = List.empty[(String, String, String)]
    var date: String = null
    var title: String = null
    var inRegion = false
    def flush(): Unit = {
      if (inRegion) pending.reverse.foreach { case (u, ty, le) =>
        out += Enclosure(u, ty, le, date, title)
      }
      pending = Nil; date = null; title = null
    }
    def textUntil(from: Int, close: String): (String, Int) = {
      var j = from
      while (j < n && xml.charAt(j) != '<') j += 1
      if (j < n && tagAt(j, close)) (xml.substring(from, j), j + close.length)
      else (null, j)
    }
    def attrsEnd(from: Int): Int = {
      var j = from
      while (j < n && xml.charAt(j) != '>') j += 1
      j
    }
    var i = 0
    while (i < n) {
      if (xml.charAt(i) != '<') i += 1
      else if (regionOpensAt(i, "<item")) {
        flush(); inRegion = true; i += 5
      } else if (regionOpensAt(i, "<entry")) {
        flush(); inRegion = true; i += 6
      } else if (tagAt(i, "</item>")) {
        flush(); inRegion = false; i += 7
      } else if (tagAt(i, "</entry>")) {
        flush(); inRegion = false; i += 8
      } else if (inRegion && opensAt(i, "<enclosure")) {
        val end = attrsEnd(i + 10)
        if (end < n) {
          val attrs = xml.substring(i + 10, end)
          val u = attrOf(attrs, "url")
          if (u != null)
            pending ::= ((u, attrOf(attrs, "type"), attrOf(attrs, "length")))
        }
        i = end + (if (end < n) 1 else 0)
      } else if (inRegion && opensAt(i, "<link")) {
        val end = attrsEnd(i + 5)
        if (end < n && xml.charAt(i + 5) != '>') {
          val attrs = xml.substring(i + 5, end)
          val rel = attrOf(attrs, "rel")
          if (rel != null &&
            rel.trim.equalsIgnoreCase("enclosure")) {
            val u = hrefOf(attrs)
            if (u != null)
              pending ::=
                ((u, attrOf(attrs, "type"), attrOf(attrs, "length")))
          }
        }
        i = end + (if (end < n) 1 else 0)
      } else if (inRegion && title == null && tagAt(i, "<title>")) {
        val (t, next) = textUntil(i + 7, "</title>")
        if (t != null) { title = t.trim; i = next } else i = next
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

  /** [[enclosures]] over a RAW (possibly gzipped) fetched body. */
  def enclosuresFromBytes(body: Array[Byte]): Array[Enclosure] =
    Sitemaps.decodeBody(body).map(enclosures).getOrElse(Array.empty)

  /** [[entries]] over a RAW (possibly gzipped) fetched body. */
  def entriesFromBytes(body: Array[Byte]): Array[(String, String)] =
    Sitemaps.decodeBody(body).map(entries).getOrElse(Array.empty)

  private def epochDays(y: Int, m: Int, d: Int): Long = {
    // Howard Hinnant's days-from-civil — integer-exact, engine-free
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe.toLong * 365 + yoe / 4 - yoe / 100 + doy
    era.toLong * 146097 + doe - 719468
  }

  private val Months = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5,
    "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10,
    "nov" -> 11, "dec" -> 12)

  // the RFC 822 named-zone table (GMT family + the US zones the RFC
  // defines); single-letter military zones are out of contract
  private val Zones = Map(
    "gmt" -> 0, "ut" -> 0, "utc" -> 0, "z" -> 0,
    "est" -> -5 * 3600, "edt" -> -4 * 3600, "cst" -> -6 * 3600,
    "cdt" -> -5 * 3600, "mst" -> -7 * 3600, "mdt" -> -6 * 3600,
    "pst" -> -8 * 3600, "pdt" -> -7 * 3600)

  /** Comparable recency KEY for a verbatim feed date — epoch seconds,
    * or null when unparseable. Feeds mix two date dialects (RSS
    * pubDate is RFC 822 letter-initial, Atom updated is RFC 3339
    * digit-initial), so a lexicographic MAX across feeds is
    * format-determined, never recency-determined (the r15 ADVICE
    * finding). This parses BOTH into one epoch key:
    *
    *  - RFC 822/1123: optional `Www, ` weekday (skipped unvalidated —
    *    feeds get weekdays wrong constantly), 1-2 digit day, English
    *    3-letter month, 4-digit year, `HH:mm[:ss]`, zone = GMT/UT/
    *    UTC/Z, `±hhmm`, or the RFC's named US zones; a MISSING zone
    *    reads as GMT (lenient — feeds are garbage-rich). 2-digit
    *    years and military zones are out of contract (null).
    *  - RFC 3339 / ISO 8601: `yyyy-MM-dd`, optional `T`/space +
    *    `HH:mm[:ss[.frac]]`, optional `Z` or `±hh[:]mm`; a bare date
    *    reads as midnight UTC.
    *
    * Field ranges validate (month 1-12, day 1-31, hh ≤ 23, mm/ss ≤
    * 59); anything else is null. Deterministic, dependency-free, never
    * throws — FeedsSpec cross-checks a battery against java.time. */
  def dateKey(s: String): java.lang.Long = {
    if (s == null) return null
    val t = s.trim
    if (t.isEmpty) return null
    val n = t.length
    var i = 0
    def digitsAt(at: Int, min: Int, max: Int): Int = {
      // reads [min,max] digits at `at`; returns count or -1
      var k = at
      while (k < n && k - at < max && t.charAt(k).isDigit) k += 1
      if (k - at < min) -1 else k - at
    }
    def num(at: Int, len: Int): Int = {
      var v = 0
      var k = at
      while (k < at + len) { v = v * 10 + (t.charAt(k) - '0'); k += 1 }
      v
    }
    def skipWs(): Unit = while (i < n && t.charAt(i) == ' ') i += 1
    def iso(): java.lang.Long = {
      i = 0
      // ---- RFC 3339 / ISO 8601 ----
      if (digitsAt(0, 4, 4) != 4) return null
      val y = num(0, 4); i = 4
      if (i >= n || t.charAt(i) != '-' || digitsAt(i + 1, 2, 2) != 2)
        return null
      val mo = num(i + 1, 2); i += 3
      if (i >= n || t.charAt(i) != '-' || digitsAt(i + 1, 2, 2) != 2)
        return null
      val d = num(i + 1, 2); i += 3
      if (mo < 1 || mo > 12 || d < 1 || d > 31) return null
      var hh = 0; var mi = 0; var ss = 0; var off = 0
      if (i < n) {
        val sep = t.charAt(i)
        if (sep != 'T' && sep != 't' && sep != ' ') return null
        i += 1
        if (digitsAt(i, 2, 2) != 2) return null
        hh = num(i, 2); i += 2
        if (i >= n || t.charAt(i) != ':' || digitsAt(i + 1, 2, 2) != 2)
          return null
        mi = num(i + 1, 2); i += 3
        if (i < n && t.charAt(i) == ':') {
          if (digitsAt(i + 1, 2, 2) != 2) return null
          ss = num(i + 1, 2); i += 3
          if (i < n && t.charAt(i) == '.') {
            i += 1
            val f = digitsAt(i, 1, 9)
            if (f < 0) return null
            i += f // fraction truncates: keys compare at second grain
          }
        }
        if (i < n) {
          val zc = t.charAt(i)
          if (zc == 'Z' || zc == 'z') i += 1
          else if (zc == '+' || zc == '-') {
            val sign = if (zc == '-') -1 else 1
            if (digitsAt(i + 1, 2, 2) != 2) return null
            val oh = num(i + 1, 2); i += 3
            var om = 0
            if (i < n && t.charAt(i) == ':') {
              if (digitsAt(i + 1, 2, 2) != 2) return null
              om = num(i + 1, 2); i += 3
            } else if (digitsAt(i, 2, 2) == 2) { om = num(i, 2); i += 2 }
            if (oh > 23 || om > 59) return null
            off = sign * (oh * 3600 + om * 60)
          } else return null
        }
      }
      if (i != n || hh > 23 || mi > 59 || ss > 59) return null
      epochDays(y, mo, d) * 86400L + hh * 3600L + mi * 60L + ss - off
    }
    def rfc822(): java.lang.Long = {
      i = 0
      // ---- RFC 822 / 1123 ----
      // optional weekday: letters then ','
      val comma = t.indexOf(',')
      if (comma >= 0 && comma <= 9 &&
        (0 until comma).forall(k => t.charAt(k).isLetter)) i = comma + 1
      skipWs()
      val dl = digitsAt(i, 1, 2)
      if (dl < 0) return null
      val d = num(i, dl); i += dl
      skipWs()
      if (i + 3 > n) return null
      val mo = Months.getOrElse(
        t.substring(i, i + 3).toLowerCase(java.util.Locale.ROOT), -1)
      if (mo < 0) return null
      i += 3
      skipWs()
      if (digitsAt(i, 4, 4) != 4) return null
      val y = num(i, 4); i += 4
      skipWs()
      if (digitsAt(i, 2, 2) != 2) return null
      val hh = num(i, 2); i += 2
      if (i >= n || t.charAt(i) != ':' || digitsAt(i + 1, 2, 2) != 2)
        return null
      val mi = num(i + 1, 2); i += 3
      var ss = 0
      if (i < n && t.charAt(i) == ':') {
        if (digitsAt(i + 1, 2, 2) != 2) return null
        ss = num(i + 1, 2); i += 3
      }
      skipWs()
      var off = 0
      if (i < n) {
        val zc = t.charAt(i)
        if (zc == '+' || zc == '-') {
          val sign = if (zc == '-') -1 else 1
          if (digitsAt(i + 1, 4, 4) != 4) return null
          val oh = num(i + 1, 2); val om = num(i + 3, 2); i += 5
          if (oh > 23 || om > 59) return null
          off = sign * (oh * 3600 + om * 60)
        } else {
          val zEnd = {
            var k = i
            while (k < n && t.charAt(k).isLetter) k += 1
            k
          }
          val z = Zones.get(
            t.substring(i, zEnd).toLowerCase(java.util.Locale.ROOT))
          if (z.isEmpty) return null
          off = z.get; i = zEnd
        }
      }
      if (i != n || d < 1 || d > 31 || hh > 23 || mi > 59 || ss > 59)
        return null
      epochDays(y, mo, d) * 86400L + hh * 3600L + mi * 60L + ss - off
    }
    if (!t.charAt(0).isDigit) rfc822()
    else {
      // digit-initial is USUALLY ISO, but the weekday-less RFC 822
      // form ("05 Aug 2025 …") is digit-initial too — fall through
      val k = iso()
      if (k != null) k else rfc822()
    }
  }

  /** Seed candidates from fetched feed bodies: entry links
    * entity-decoded (RSS mandates XML escaping — `&amp;` in every
    * multi-param news url) and canonicalized exactly like the frontier
    * ([[UrlResolve.selfNormalize]] — relative/non-http(s) links null
    * out; feeds carry absolute urls by convention), anti-joined
    * against `crawled`, ref-counted across feeds, with `feed_date` =
    * the MOST RECENT date across listings, verbatim (null when none
    * declares one) — the freshness signal a fetcher weighs against
    * [[Crawl.recrawlChurn]] exactly like sitemap lastmod. Recency is
    * the [[dateKey]] epoch (r16, the ADVICE finding: RSS pubDates are
    * RFC 822 letter-initial, Atom dates RFC 3339 digit-initial, so a
    * lexicographic MAX always preferred the RFC 822 string regardless
    * of actual recency); the winner is `max(struct(key, date))` — an
    * unparseable date (null key, smallest) loses to any parsed one,
    * and among only-unparseable dates the fold degrades to the old
    * lexicographic MAX. Same output shape as
    * [[Sitemaps.seedsWithLastmod]] modulo the column name. */
  def seedsFromFeeds(feeds: DataFrame, crawled: DataFrame,
                     bodyCol: String = "body",
                     urlCol: String = "url"): DataFrame = {
    val pairs = udf((b: Array[Byte]) => entriesFromBytes(b))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    val key = udf((s: String) => Option(dateKey(s)).map(_.longValue))
    feeds.select(explode(pairs(col(bodyCol))).as("_fe"))
      .select(canon(col("_fe._1")).as("url"), col("_fe._2").as("feed_date"))
      .filter(col("url").isNotNull)
      .join(crawled.select(col(urlCol).cast("string").as("url")),
        Seq("url"), "left_anti")
      .groupBy("url")
      .agg(count(lit(1)).as("n_refs"),
        max(struct(key(col("feed_date")).as("k"), col("feed_date").as("d")))
          .as("_fd"))
      .select(col("url"), col("n_refs"), col("_fd.d").as("feed_date"))
  }

  /** Media-enclosure fetch list from fetched feed bodies (r17) — the
    * AUDIO/VIDEO sibling of [[seedsFromFeeds]], the discovery channel
    * an audio-text pipeline starts from (podcast RSS is where
    * narrated-speech training data lives; the enclosure IS the media
    * url). Urls entity-decode + canonicalize exactly like entry links
    * and anti-join the fetched set; per url: `n_refs` across feeds,
    * `mime_type` = MAX declared type (cross-feed declarations rarely
    * disagree; max is the deterministic fold), `length_bytes` = MAX
    * parsed length (a size hint for fetch budgeting; non-numeric
    * declarations null out), `feed_date` = the recency-keyed max
    * ([[dateKey]] — the seedsFromFeeds fold). Feed-count-sized
    * everywhere: one body parse per feed, one url-keyed aggregate. */
  def enclosureSeeds(feeds: DataFrame, fetched: DataFrame,
                     bodyCol: String = "body",
                     urlCol: String = "url"): DataFrame = {
    val encs = udf((b: Array[Byte]) => enclosuresFromBytes(b)
      .map(e => (e.url, e.mimeType, e.length, e.date)))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    val key = udf((s: String) => Option(dateKey(s)).map(_.longValue))
    val lenOf = udf { (s: String) =>
      if (s == null || s.isEmpty || !s.forall(_.isDigit) || s.length > 18)
        None
      else Some(s.toLong)
    }
    feeds.select(explode(encs(col(bodyCol))).as("_en"))
      .select(canon(col("_en._1")).as("url"),
        col("_en._2").as("mime_type"), lenOf(col("_en._3")).as("len"),
        col("_en._4").as("feed_date"))
      .filter(col("url").isNotNull)
      .join(fetched.select(col(urlCol).cast("string").as("url")),
        Seq("url"), "left_anti")
      .groupBy("url")
      .agg(count(lit(1)).as("n_refs"),
        max(col("mime_type")).as("mime_type"),
        max(col("len")).as("length_bytes"),
        max(struct(key(col("feed_date")).as("k"), col("feed_date").as("d")))
          .as("_fd"))
      .select(col("url"), col("n_refs"), col("mime_type"),
        col("length_bytes"), col("_fd.d").as("feed_date"))
  }

  /** AUDIO/VIDEO–text PAIRS from fetched feed bodies (r17) — the
    * LAION-Audio shape, where the podcast item TITLE captions the
    * enclosure: one row per distinct (media url, caption), captions
    * entity-decoded and whitespace-collapsed (the html_extract
    * convention — `\s+` → one space, trimmed; empty → null), urls
    * canonicalized exactly like the fetch list. Cross-feed repeats of
    * the same (url, caption) fold with `n_refs`; `mime_type` is the
    * MAX declared type. Title-less enclosures ride through with a
    * null caption — the consumer decides whether captionless media is
    * usable (speech pipelines often caption from the audio itself).
    * No fetched anti-join: pairs are corpus rows, not a frontier —
    * gate the FETCH via [[enclosureSeeds]]. Feed-count-sized: one
    * parse per body, one (url, caption)-keyed aggregate. */
  def enclosurePairs(feeds: DataFrame,
                     bodyCol: String = "body"): DataFrame = {
    val encs = udf((b: Array[Byte]) => enclosuresFromBytes(b)
      .map(e => (e.url, e.mimeType, e.title)))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    val capOf = udf { (s: String) =>
      if (s == null) None
      else {
        val c = HtmlText.decodeAttr(s)
          .replaceAll("\\s+", " ").trim
        if (c.isEmpty) None else Some(c)
      }
    }
    feeds.select(explode(encs(col(bodyCol))).as("_ep"))
      .select(canon(col("_ep._1")).as("url"),
        col("_ep._2").as("mime_type"), capOf(col("_ep._3")).as("caption"))
      .filter(col("url").isNotNull)
      .groupBy("url", "caption")
      .agg(count(lit(1)).as("n_refs"),
        max(col("mime_type")).as("mime_type"))
      .select(col("url"), col("caption"), col("mime_type"), col("n_refs"))
  }

  /** The LEDGER/attribution form of [[enclosurePairs]] (r17): one row
    * per distinct (FEED url, media_url, caption, mime_type) — no
    * cross-feed fold, so a per-batch ledger keyed by feed url can
    * supersede a refetched feed's pairs wholesale (the images-ledger
    * cache semantics). Same url canonicalization and caption
    * processing as enclosurePairs; the within-feed distinct folds a
    * feed that lists the same enclosure twice. */
  def enclosuresBySource(feeds: DataFrame, urlCol: String = "url",
                         bodyCol: String = "body"): DataFrame = {
    val encs = udf((b: Array[Byte]) => enclosuresFromBytes(b)
      .map(e => (e.url, e.mimeType, e.title)))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    val capOf = udf { (s: String) =>
      if (s == null) None
      else {
        val c = HtmlText.decodeAttr(s)
          .replaceAll("\\s+", " ").trim
        if (c.isEmpty) None else Some(c)
      }
    }
    feeds.select(col(urlCol).cast("string").as("url"),
        explode(encs(col(bodyCol))).as("_ep"))
      .select(col("url"), canon(col("_ep._1")).as("media_url"),
        capOf(col("_ep._3")).as("caption"),
        col("_ep._2").as("mime_type"))
      .filter(col("media_url").isNotNull)
      .distinct()
  }

  /** [[enclosuresBySource]] with the ingest ledger's SUPERSESSION
    * SENTINELS fused into the same pass (r18): a feed that harvests no
    * pair — zero enclosures, or every url failing canonicalization —
    * emits ONE all-null (url, null, null, null) row instead of being
    * anti-joined in afterwards, via explode_outer over the parsed
    * enclosure array. A feed with BOTH real pairs and failed-canon
    * enclosures additionally folds its failures into one all-null row;
    * every ledger read/compaction drops null-media_url rows AFTER its
    * latest-batch selection, so the extra sentinel is invisible there
    * (FeedsSpec pins the row-level equivalence to
    * enclosuresBySource ∪ sentinels). Real pairs are byte-identical to
    * [[enclosuresBySource]]'s — same parse, canonicalization, caption
    * processing and within-feed distinct. */
  def enclosuresBySourceWithSentinels(feeds: DataFrame,
                                      urlCol: String = "url",
                                      bodyCol: String = "body"): DataFrame = {
    val encs = udf((b: Array[Byte]) => enclosuresFromBytes(b)
      .map(e => (e.url, e.mimeType, e.title)))
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    val capOf = udf { (s: String) =>
      if (s == null) None
      else {
        val c = HtmlText.decodeAttr(s)
          .replaceAll("\\s+", " ").trim
        if (c.isEmpty) None else Some(c)
      }
    }
    feeds.select(col(urlCol).cast("string").as("url"),
        explode_outer(encs(col(bodyCol))).as("_ep"))
      .select(col("url"), canon(col("_ep._1")).as("media_url"),
        capOf(col("_ep._3")).as("caption"),
        col("_ep._2").as("mime_type"))
      .select(col("url"), col("media_url"),
        when(col("media_url").isNotNull, col("caption")).as("caption"),
        when(col("media_url").isNotNull, col("mime_type")).as("mime_type"))
      .distinct()
  }
}
