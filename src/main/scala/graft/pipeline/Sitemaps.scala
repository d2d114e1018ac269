package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sitemap ingestion (sitemaps.org protocol) — the OTHER frontier feeder:
 * where [[HtmlText.htmlLinks]] discovers urls by crawling, sitemaps are
 * the site-declared seed list (robots.txt `Sitemap:` lines →
 * [[Robots.sitemapUrls]] → fetch → this parser). Both `<urlset>` page
 * entries and `<sitemapindex>` child-sitemap entries surface as `<loc>`
 * values — one extraction serves both levels of the hierarchy.
 */
object Sitemaps {

  /** The exact pattern [[locs]] implements, in the Java∩RE2 subset —
    * DuckDB `regexp_extract_all(xml, pattern, 1)` rebuilds the kernel's
    * output verbatim (the [[HtmlText.LinkPattern]] convention; the spec
    * cross-checks against `java.util.regex`). */
  val LocPattern: String = "(?i)<loc>([^<]*)</loc>"

  /** `<loc>` values in document order. Semantics are EXACTLY leftmost
    * non-overlapping [[LocPattern]] matches (group 1) — values are kept
    * verbatim at THIS layer so the pattern string remains the portable
    * oracle (the protocol XML-escapes `&`/`<` inside loc; [[seeds]]
    * decodes + canonicalizes before the crawled check). O(n) scan,
    * total on garbage, never throws. */
  def locs(xml: String): Array[String] = {
    if (xml == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
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
    var i = 0
    while (i < n) {
      if (xml.charAt(i) == '<' && tagAt(i, "<loc>")) {
        val capStart = i + 5
        var j = capStart
        while (j < n && xml.charAt(j) != '<') j += 1
        if (j < n && tagAt(j, "</loc>")) {
          out += xml.substring(capStart, j)
          i = j + 6 // resume after the closing tag (non-overlapping)
        } else i = j // '<' that is not </loc>: the [^<]* capture can
        // never complete here; the next match can only start at this '<'
      } else i += 1
    }
    out.toArray
  }

  /** Column form: array of locs per sitemap body. */
  def locsCol(xml: Column): Column = {
    val u = udf((s: String) => locs(s))
    u(xml)
  }

  /** [[locs]] over a RAW fetched body: sitemaps ship gzipped
    * (`sitemap.xml.gz` — the protocol's own 50 MB/50k-url limits assume
    * it) at least as often as plain, so the binary form sniffs the gzip
    * magic and inflates (multi-member, bomb-guarded — the shared
    * [[graft.sources.Warc.gunzipAll]] kernel) before the UTF-8 decode
    * (REPLACE — the protocol mandates UTF-8; garbage bytes must not
    * kill a task) and the `<loc>` scan. Corrupt gzip yields no locs.
    * Total, never throws. */
  def locsFromBytes(body: Array[Byte]): Array[String] = {
    if (body == null) return Array.empty
    graft.sources.Warc.gunzipAll(body) match {
      case None => Array.empty // corrupt compressed body: costs itself
      case Some(bytes) =>
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        locs(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    }
  }

  /** Column form of [[locsFromBytes]]. */
  def locsFromBytesCol(body: Column): Column = {
    val u = udf((b: Array[Byte]) => locsFromBytes(b))
    u(body)
  }

  /** Seed candidates from fetched sitemap bodies: every `<loc>` value
    * XML-entity-decoded (the protocol MANDATES escaping `&` as `&amp;`
    * inside loc — a raw capture fetches multi-param urls at a wrong
    * address), CANONICALIZED exactly like the frontier
    * ([[UrlResolve.selfNormalize]] — since r14; a non-canonical loc
    * fetched raw lands a ledger row that never matches the
    * frontier-normalized form of the same page, one duplicate fetch per
    * seed), then anti-joined against `crawled` and ref-counted across
    * sitemaps (a url listed by several sitemaps is a stronger seed).
    * Relative and non-http(s) locs null out at the canonicalize. Same
    * output shape as [[Crawl.frontier]] — the two feeders union
    * naturally, and the 'crawled side is frontier-normalized BY
    * CONSTRUCTION' invariant now covers both. */
  def seeds(sitemaps: DataFrame, crawled: DataFrame,
            xmlCol: String = "body", urlCol: String = "url"): DataFrame =
    seedsOf(sitemaps, crawled, locsCol(col(xmlCol)), urlCol)

  /** [[seeds]] over RAW (possibly gzipped) fetched bodies — the shape a
    * crawl actually lands sitemaps in ([[locsFromBytes]]). */
  def seedsFromBytes(sitemaps: DataFrame, crawled: DataFrame,
                     bodyCol: String = "body",
                     urlCol: String = "url"): DataFrame =
    seedsOf(sitemaps, crawled, locsFromBytesCol(col(bodyCol)), urlCol)

  private def seedsOf(sitemaps: DataFrame, crawled: DataFrame,
                      locsExpr: Column, urlCol: String): DataFrame = {
    // decode + canonicalize in ONE kernel call per loc (the explode must
    // sit in its own projection — generators cannot nest in expressions)
    val canon =
      udf((s: String) => UrlResolve.selfNormalize(HtmlText.decodeAttr(s)))
    sitemaps.select(explode(locsExpr).as("_loc"))
      .select(canon(col("_loc")).as("url"))
      .filter(col("url").isNotNull)
      // left_anti is insensitive to right-side duplicates — no distinct
      .join(crawled.select(col(urlCol).cast("string").as("url")),
        Seq("url"), "left_anti")
      .groupBy("url")
      .agg(count(lit(1)).as("n_refs"))
  }
}
