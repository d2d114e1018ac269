package graft.pipeline

import graft.SparkTestBase

/** RFC 9309 semantics: grouping, agent selection, longest-match with
  * allow-tie, `*`/`$` patterns (cross-checked against an independent
  * regex evaluator), and the DataFrame gate end-to-end. */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  test("parse: groups, stacked agents, comments, unknown keys, empty disallow") {
    val body =
      """# a comment line
        |User-Agent: GraftBot
        |User-agent: OtherBot
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok
        |Crawl-delay: 10
        |Sitemap: https://h/x.xml
        |
        |user-agent: *
        |Disallow:
        |disallow: /tmp/
        |Allow : /tmp/keep
        |noise line without colon
        |Disallow: /after-blank-still-in-group
        |""".stripMargin
    val rules = Robots.parse(body)
    // stacked agents both receive the group's two rules
    assert(rules.count(_.agent == "graftbot") === 2)
    assert(rules.count(_.agent == "otherbot") === 2)
    assert(rules.filter(_.agent == "graftbot").map(r => (r.allow, r.path))
      === Seq((false, "/private/"), (true, "/private/ok")))
    // empty disallow adds no rule; the '*' group still gets the other two
    assert(rules.filter(_.agent == "*").map(r => (r.allow, r.path))
      === Seq((false, "/tmp/"), (true, "/tmp/keep"),
        (false, "/after-blank-still-in-group")))
    // rules before any user-agent line are dropped
    assert(Robots.parse("Disallow: /x\nAllow: /y") === Seq.empty)
    assert(Robots.parse(null) === Seq.empty)
  }

  /** Independent evaluator: the RFC pattern as an anchored regex. */
  private def regexMatches(pattern: String, path: String): Boolean = {
    val endAnchor = pattern.nonEmpty && pattern.last == '$'
    val pat = if (endAnchor) pattern.dropRight(1) else pattern
    val rx = pat.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*")
    val full = "^" + rx + (if (endAnchor) "$" else ".*")
    java.util.regex.Pattern.matches(full, path)
  }

  test("pathMatches equals the regex evaluator on curated and random cases") {
    val cases = Seq(
      ("/a", "/abc"), ("/a$", "/abc"), ("/a$", "/a"), ("/*c", "/abc"),
      ("/a*", "/a"), ("/a*$", "/ab"), ("/x", "/a"), ("/*", "/"),
      ("/p", "/"), ("/fish*.php", "/fishheads/catfish.php?x=2"),
      ("/*.php$", "/index.php"), ("/*.php$", "/index.php?x=1"),
      ("/a*b*c", "/aXbYbZc"), ("/a*b*c$", "/aXbYbZcd"),
      ("/**/x", "/q/x"), ("/$", "/"), ("/$", "/a"), ("/", "/anything"))
    for ((p, s) <- cases)
      assert(Robots.pathMatches(p, s) === regexMatches(p, s), s"($p, $s)")
    val rnd = new scala.util.Random(7)
    val chars = "ab/*$."
    def randStr(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen))(chars(rnd.nextInt(chars.length))).mkString
    for (_ <- 0 until 2000) {
      val p = randStr(8)
      val s = randStr(10).replace("$", "d") // paths rarely contain '$'
      assert(Robots.pathMatches(p, s) === regexMatches(p, s),
        s"pattern=$p path=$s")
    }
  }

  test("isAllowed: longest match wins, allow wins ties, no match allows") {
    val rules = Seq(
      (false, "/p"), (true, "/page"), (false, "/page/private"))
    assert(Robots.isAllowed(rules, "/page/1"))          // /page beats /p
    assert(!Robots.isAllowed(rules, "/plain"))          // only /p matches
    assert(!Robots.isAllowed(rules, "/page/private/x")) // longest disallow
    assert(Robots.isAllowed(rules, "/other"))           // no match
    // exact tie: allow wins
    assert(Robots.isAllowed(Seq((false, "/t/"), (true, "/t/")), "/t/x"))
    assert(Robots.isAllowed(Seq.empty, "/x"))
  }

  test("rulesForAgent: longest named prefix, '*' fallback") {
    val all = Seq(
      Robots.Rule("*", false, "/all"),
      Robots.Rule("graft", false, "/g"),
      Robots.Rule("graftbot", false, "/gb"))
    assert(Robots.rulesForAgent(all, "GraftBot/1.0")
      === Seq((false, "/gb")))
    assert(Robots.rulesForAgent(all, "graft-x") === Seq((false, "/g")))
    assert(Robots.rulesForAgent(all, "unrelated") === Seq((false, "/all")))
    assert(Robots.rulesForAgent(Seq.empty, "x") === Seq.empty)
  }

  test("sitemapUrls: group-independent, comments stripped, case-insensitive key") {
    val body =
      """Sitemap: https://h/a.xml   # before any group
        |User-agent: *
        |Disallow: /x
        |sitemap: https://h/b.xml
        |SITEMAP:
        |""".stripMargin
    assert(Robots.sitemapUrls(body)
      === Seq("https://h/a.xml", "https://h/b.xml"))
    assert(Robots.sitemapUrls(null) === Seq.empty)
  }

  test("sitemapsFromRecords: resolve, normalize, status gate, fetched anti-join") {
    def rf(uri: String, status: Int, body: String) =
      graft.sources.Warc.ResponseFixture(uri, status,
        contentType = "text/plain",
        body = body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val warc = graft.sources.Warc.encodeWarcFixtures(Seq(
      rf("https://a.example/robots.txt", 200,
        "User-agent: *\nDisallow: /x\n" +
          "Sitemap: /rel/sm.xml\n" +                 // relative: resolves
          "Sitemap: https://cdn.example/shared.xml\n" +
          "sitemap: HTTPS://A.EXAMPLE/Caps/sm.xml\n"), // scheme+host lower
      rf("https://b.example/robots.txt", 200,
        "Sitemap: https://cdn.example/shared.xml\n" + // second ref
          "Sitemap: https://b.example/fetched.xml\n"), // anti-joins away
      rf("https://c.example/robots.txt", 404,
        "Sitemap: https://c.example/never.xml\n"),     // status-gated
      rf("https://d.example/page.html", 200,
        "Sitemap: https://d.example/not-robots.xml\n"))) // wrong path
    val records = graft.sources.Warc.warcRecords(
      Seq(Tuple1(warc)).toDF("payload")).toDF()
    val fetched = Seq("https://b.example/fetched.xml").toDF("url")
    val got = Robots.sitemapsFromRecords(records, fetched)
      .orderBy("url").as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("https://a.example/Caps/sm.xml", 1L),
      ("https://a.example/rel/sm.xml", 1L),
      ("https://cdn.example/shared.xml", 2L)))
  }

  /** Independent evaluator for the loc kernel. */
  private def regexLocs(xml: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(Sitemaps.LocPattern).matcher(xml)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toSeq
  }

  test("Sitemaps.locs equals the declared regex on contract and soup cases") {
    val cases = Seq(
      "<urlset><url><loc>https://a/1</loc></url></urlset>",
      "<LOC>https://upper/</LOC> and <Loc>https://mixed/</lOc>",
      "<loc>unterminated forever",
      "<loc>stops<at-first-lt</loc>",
      "<loc><loc>https://nested/</loc></loc>",
      "<loc></loc><loc>x</loc>",
      "plain text no tags", "")
    for (c <- cases)
      assert(Sitemaps.locs(c).toSeq === regexLocs(c), s"case: $c")
    val rnd = new scala.util.Random(11)
    val atoms = Seq("<loc>", "</loc>", "<LOC>", "</LOC>", "<", ">", "x",
      "https://r/", "lo", "c>")
    for (_ <- 0 until 300) {
      val s = Seq.fill(rnd.nextInt(30))(atoms(rnd.nextInt(atoms.length)))
        .mkString
      assert(Sitemaps.locs(s).toSeq === regexLocs(s), s"soup: $s")
    }
  }

  test("Sitemaps.seeds: absolute locs minus crawled, ref-counted") {
    val maps = Seq(
      (1L, "<urlset><url><loc>https://n/1</loc></url>" +
        "<url><loc>https://s/1</loc></url>" +
        "<url><loc>/rel</loc></url></urlset>"),
      (2L, "<sitemapindex><sitemap><loc>https://n/1</loc></sitemap>" +
        "<sitemap><loc>https://n/2</loc></sitemap></sitemapindex>"))
      .toDF("id", "body")
    val crawled = Seq("https://s/1").toDF("url")
    val got = Sitemaps.seeds(maps, crawled)
      .as[(String, Long)].collect().toSet
    // the sitemapindex body routes to childSitemaps (r15), so only the
    // urlset's locs seed pages: n/1 once, s/1 crawled, /rel relative
    assert(got === Set(("https://n/1", 1L)))
    assert(Sitemaps.childSitemaps(
        maps.select(maps("body").cast("binary").as("body")), crawled)
      .as[(String, Long, Option[String])].collect().toSet ===
      Set(("https://n/1", 1L, None), ("https://n/2", 1L, None)))
  }

  test("seeds decode XML entities and canonicalize like the frontier (r14)") {
    val maps = Seq(
      // &amp;-escaped multi-param loc (the protocol MANDATES escaping),
      // an uppercase-host :443 variant of a CRAWLED page (must
      // normalize INTO the crawled set, not seed a duplicate fetch),
      // a whitespace-padded loc, a tracking-param loc, a mailto
      (1L, "<urlset><url><loc>https://q.ex/p?a=1&amp;b=2</loc></url>" +
        "<url><loc>HTTPS://S.EX:443/1</loc></url>" +
        "<url><loc>\n  https://pad.ex/x \n</loc></url>" +
        "<url><loc>https://t.ex/y?gclid=g&amp;keep=1</loc></url>" +
        "<url><loc>mailto:x@y.ex</loc></url></urlset>"))
      .toDF("id", "body")
    val crawled = Seq("https://s.ex/1").toDF("url")
    val got = Sitemaps.seeds(maps, crawled)
      .as[(String, Long)].collect().toSet
    assert(got === Set(
      ("https://q.ex/p?a=1&b=2", 1L),
      ("https://pad.ex/x", 1L),
      ("https://t.ex/y?keep=1", 1L)), s"seeds: $got")
  }

  test("seedsFromBytes: gzipped and plain sitemap bodies, corrupt costs itself") {
    def gz(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes("UTF-8")); g.finish()
      out.toByteArray
    }
    val xml1 = "<urlset><url><loc>https://n/1</loc></url>" +
      "<url><loc>https://n/2</loc></url></urlset>"
    val xml2 = "<urlset><url><LOC>https://n/1</LOC></url>" +
      "<url><loc>/relative</loc></url></urlset>"
    val corrupt = Array[Byte](0x1F, 0x8B.toByte, 8, 0, 1, 2, 3) // bad gzip
    val maps = Seq(gz(xml1), xml2.getBytes("UTF-8"), corrupt, null)
      .toDF("body")
    val crawled = Seq("https://n/2").toDF("url")
    val got = Sitemaps.seedsFromBytes(maps, crawled)
      .as[(String, Long)].collect().toSet
    // gz + plain both parse (n/1 twice), crawled n/2 drops, relative
    // filtered, corrupt/null bodies yield nothing
    assert(got === Set(("https://n/1", 2L)))
    // parity: the string form over the same decoded xml agrees
    val viaStrings = Sitemaps.seeds(Seq(xml1, xml2).toDF("body"), crawled)
      .as[(String, Long)].collect().toSet
    assert(viaStrings === got)
  }

  test("locsWithLastmod: positional pairing, stray/extra lastmods, loc parity") {
    val xml =
      "<lastmod>2027-01-01</lastmod>" + // stray before any loc: drops
        "<urlset>" +
        "<url><loc>https://a/1</loc><lastmod>2026-01-02</lastmod></url>" +
        "<url><loc>https://a/2</loc></url>" + // no lastmod: null
        // a second lastmod inside one entry: FIRST wins
        "<url><LOC>https://a/3</LOC><LASTMOD>2026-03-03</LASTMOD>" +
        "<lastmod>2026-04-04</lastmod></url>" +
        "<url><loc>https://a/4</loc><lastmod>2026-05-05" // unterminated
    assert(Sitemaps.locsWithLastmod(xml).toSeq === Seq(
      ("https://a/1", "2026-01-02"), ("https://a/2", null),
      ("https://a/3", "2026-03-03"), ("https://a/4", null)))
    // loc extraction identical to the declared-pattern kernel, pinned
    // on the contract/soup battery the locs test uses
    val cases = Seq(xml, "", "<loc>", "<loc></loc>", "<loc>x</loc>",
      "<loc>a<loc>b</loc>", "<LOC>u</loc><lastmod>m</lastmod>")
    for (c <- cases)
      assert(Sitemaps.locsWithLastmod(c).map(_._1).toSeq ===
        Sitemaps.locs(c).toSeq, s"case: $c")
    assert(Sitemaps.locsWithLastmod(null).isEmpty)
    // the seeds composition: refs aggregate, lastmod = string MAX over
    // listings, nulls ignored; gzip + plain bodies both parse
    def gz(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes("UTF-8")); g.finish()
      out.toByteArray
    }
    val m1 = "<urlset><url><loc>https://n/1</loc>" +
      "<lastmod>2026-02-01</lastmod></url>" +
      "<url><loc>https://n/2</loc></url></urlset>"
    val m2 = "<urlset><url><loc>https://n/1</loc>" +
      "<lastmod>2026-03-01</lastmod></url>" +
      "<url><loc>https://crawled/x</loc><lastmod>2026-09-09</lastmod>" +
      "</url></urlset>"
    val maps = Seq(gz(m1), m2.getBytes("UTF-8")).toDF("body")
    val crawled = Seq("https://crawled/x").toDF("url")
    val got = Sitemaps.seedsWithLastmod(maps, crawled)
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("https://n/1", 2L, "2026-03-01"),
      ("https://n/2", 1L, null)))
  }

  test("sitemapindex routing: children never seed pages, pages never list as children (r15)") {
    def gz(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes("UTF-8")); g.finish()
      out.toByteArray
    }
    // classification is by FIRST root tag, case-insensitive, and
    // survives a decoy mention of the other root in a comment
    assert(Sitemaps.isIndex("<?xml?><SiteMapIndex><loc>x</loc>"))
    assert(!Sitemaps.isIndex(
      "<urlset><!-- not a <sitemapindex> --><loc>x</loc></urlset>"))
    assert(!Sitemaps.isIndex("<loc>bare soup stays a page listing</loc>"))
    assert(!Sitemaps.isIndex(null))
    val index =
      "<sitemapindex>" +
        "<sitemap><loc>https://s/child1.xml</loc>" +
        "<lastmod>2026-02-02</lastmod></sitemap>" +
        "<sitemap><loc>https://s/child2.xml.gz</loc></sitemap>" +
        "<sitemap><loc>https://s/fetched.xml</loc></sitemap>" +
        "</sitemapindex>"
    val urlset = "<urlset><url><loc>https://s/page1</loc>" +
      "<lastmod>2026-07-07</lastmod></url></urlset>"
    val maps = Seq(gz(index), urlset.getBytes("UTF-8")).toDF("body")
    val fetched = Seq("https://s/fetched.xml").toDF("url")
    // children: index locs only, lastmod carried, fetched anti-joined
    val children = Sitemaps.childSitemaps(maps, fetched)
      .as[(String, Long, String)].collect().toSet
    assert(children === Set(("https://s/child1.xml", 1L, "2026-02-02"),
      ("https://s/child2.xml.gz", 1L, null)))
    // page seeds: urlset locs only — the index's children must NOT leak
    val pages = Sitemaps.seedsFromBytes(maps, fetched)
      .as[(String, Long)].collect().toSet
    assert(pages === Set(("https://s/page1", 1L)))
    val pagesLm = Sitemaps.seedsWithLastmod(maps, fetched)
      .as[(String, Long, String)].collect().toSet
    assert(pagesLm === Set(("https://s/page1", 1L, "2026-07-07")))
    // the string form gates identically
    assert(Sitemaps.seeds(Seq(index, urlset).toDF("body"), fetched)
      .as[(String, Long)].collect().toSet === Set(("https://s/page1", 1L)))
  }

  test("Feeds.entries: RSS/Atom regions, first-link/first-date, prologue excluded") {
    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>c</title><link>https://site.example/</link>
        |<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        |<item><title>a</title><link>https://site.example/a?x=1&amp;y=2</link>
        |<pubDate>Tue, 05 Aug 2025 10:00:00 GMT</pubDate>
        |<link>https://site.example/ignored-second</link></item>
        |<item><link>https://site.example/no-date</link></item>
        |<item><pubDate>Wed, 06 Aug 2025 11:00:00 GMT</pubDate>
        |<link>https://site.example/date-first</link></item>
        |<item><title>linkless</title></item>
        |</channel></rss>""".stripMargin
    // the channel-level link/date never count; dates pair within their
    // region regardless of order; a linkless item emits nothing
    assert(Feeds.entries(rss).toSeq === Seq(
      ("https://site.example/a?x=1&amp;y=2",
        "Tue, 05 Aug 2025 10:00:00 GMT"),
      ("https://site.example/no-date", null),
      ("https://site.example/date-first",
        "Wed, 06 Aug 2025 11:00:00 GMT")))
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<link rel="self" href="https://f.example/feed.xml"/>
        |<ENTRY><LINK HREF='https://f.example/e1'/>
        |<updated>2025-08-01T09:00:00Z</updated></ENTRY>
        |<entry><link rel="alternate" href="https://f.example/e2" />
        |<published>2025-08-02T09:00:00Z</published></entry>
        |</feed>""".stripMargin
    assert(Feeds.entries(atom).toSeq === Seq(
      ("https://f.example/e1", "2025-08-01T09:00:00Z"),
      ("https://f.example/e2", "2025-08-02T09:00:00Z")))
    // totality on garbage
    assert(Feeds.entries(null).isEmpty)
    assert(Feeds.entries("<item><link>x").isEmpty) // unterminated: drops
    assert(Feeds.entries("<items><link>u</link></items>").isEmpty,
      "<items> must not open a region")
    // attribute-name boundary: xhref must not satisfy the href capture
    assert(Feeds.entries(
      "<entry><link xhref=\"https://bad/\" href=\"https://good/\"/></entry>")
      .toSeq === Seq(("https://good/", null)))
    // tag-name boundary (r16): <linked>/<linkage href=…> inside an
    // entry are NOT its link element — the real <link> after them wins
    assert(Feeds.entries(
      "<entry><linked>https://bad/</linked>" +
        "<linkage href=\"https://bad2/\"/>" +
        "<link href=\"https://good2/\"/></entry>")
      .toSeq === Seq(("https://good2/", null)))
    // the seeds composition: decode + canonicalize + crawled anti-join
    // + max date; gzip bodies parse
    def gz(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes("UTF-8")); g.finish()
      out.toByteArray
    }
    val f1 = "<rss><channel><item><link>https://n.example/1?a=1&amp;b=2</link>" +
      "<pubDate>2025-01-01</pubDate></item>" +
      "<item><link>https://crawled.example/x</link></item></channel></rss>"
    val f2 = "<feed><entry><link href=\"https://n.example/1?a=1&amp;b=2\"/>" +
      "<updated>2025-02-02</updated></entry>" +
      "<entry><link href=\"/relative-dropped\"/></entry></feed>"
    val seeds = Feeds.seedsFromFeeds(
      Seq(gz(f1), f2.getBytes("UTF-8")).toDF("body"),
      Seq("https://crawled.example/x").toDF("url"))
      .as[(String, Long, String)].collect().toSet
    assert(seeds === Set(("https://n.example/1?a=1&b=2", 2L, "2025-02-02")))
  }

  test("Feeds.enclosures: RSS + Atom forms, region dates, prologue/rel gates") {
    val rss =
      """<rss><channel>
        |<enclosure url="https://m/prologue.mp3" type="audio/mpeg"/>
        |<item><link>https://page/1</link>
        |<enclosure length="100" type="audio/mpeg" url="https://m/a.mp3"/>
        |<enclosure url="https://m/b.mp3"/>
        |<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |<item><enclosure type="x" length="5"/></item>
        |</channel></rss>""".stripMargin
    assert(Feeds.enclosures(rss).toSeq === Seq(
      Feeds.Enclosure("https://m/a.mp3", "audio/mpeg", "100",
        "Mon, 01 Jan 2024 00:00:00 GMT", null),
      Feeds.Enclosure("https://m/b.mp3", null, null,
        "Mon, 01 Jan 2024 00:00:00 GMT", null)))
    val atom =
      """<feed><link rel="enclosure" href="https://m/pro.mp4"/>
        |<entry><link href="https://page/2"/>
        |<LINK REL='enclosure' HREF='https://m/v.mp4' TYPE='video/mp4' LENGTH='42'/>
        |<updated>2024-02-02T00:00:00Z</updated></entry>
        |<entry><link rel="alternate" href="https://page/3"/></entry>
        |</feed>""".stripMargin
    assert(Feeds.enclosures(atom).toSeq === Seq(
      Feeds.Enclosure("https://m/v.mp4", "video/mp4", "42",
        "2024-02-02T00:00:00Z", null)))
    assert(Feeds.enclosures(null).isEmpty)
    // unterminated region drops its pending enclosures? No — flush at
    // end-of-input emits them (tolerant-prefix, the entries() rule
    // differs: it requires a link; an enclosure IS the payload)
    assert(Feeds.enclosures(
      "<item><enclosure url=\"https://m/t.mp3\"/>").toSeq ===
      Seq(Feeds.Enclosure("https://m/t.mp3", null, null, null, null)))
    // the region TITLE captions every enclosure of the region, even
    // when it appears after the enclosure; first title wins
    assert(Feeds.enclosures(
      "<item><enclosure url=\"https://m/c.mp3\"/>" +
        "<title>Ep 1 &amp; intro</title><title>late</title></item>")
      .toSeq === Seq(Feeds.Enclosure("https://m/c.mp3", null, null, null,
        "Ep 1 &amp; intro")))
    // the seeds composition: decode + canonicalize + anti-join + folds
    val f1 = "<rss><channel><item>" +
      "<enclosure url=\"https://m/e.mp3?a=1&amp;b=2\" type=\"audio/mpeg\" length=\"7\"/>" +
      "<pubDate>Wed, 01 Jan 2020 00:00:00 GMT</pubDate></item>" +
      "<item><enclosure url=\"https://m/gone.mp3\"/></item></channel></rss>"
    val f2 = "<feed><entry>" +
      "<link rel=\"enclosure\" href=\"https://m/e.mp3?a=1&amp;b=2\" type=\"audio/mpeg\" length=\"bad\"/>" +
      "<updated>2024-02-02T00:00:00Z</updated></entry></feed>"
    val got = Feeds.enclosureSeeds(
      Seq(f1.getBytes("UTF-8"), f2.getBytes("UTF-8")).toDF("body"),
      Seq("https://m/gone.mp3").toDF("url"))
      .as[(String, Long, String, Option[Long], String)].collect().toSet
    // recency: the 2024 ISO date beats the 2020 RFC 822 one by EPOCH
    // (lexicographically 'W' > '2' would pick the wrong one); length =
    // max parsed (the "bad" declaration nulls out)
    assert(got === Set(("https://m/e.mp3?a=1&b=2", 2L, "audio/mpeg",
      Some(7L), "2024-02-02T00:00:00Z")))
    // audio-text pairs: the region title captions the enclosure
    // (entity-decoded, ws-collapsed); cross-feed repeats fold;
    // title-less enclosures keep a null caption
    val f3 = "<rss><channel><item><title> Ep 9 &amp;\n  more </title>" +
      "<enclosure url=\"https://m/e.mp3?a=1&amp;b=2\" type=\"audio/mpeg\"/>" +
      "</item></channel></rss>"
    val pairs = Feeds.enclosurePairs(
      Seq(f1.getBytes("UTF-8"), f2.getBytes("UTF-8"), f3.getBytes("UTF-8"))
        .toDF("body"))
      .as[(String, Option[String], String, Long)].collect().toSet
    assert(pairs === Set(
      ("https://m/e.mp3?a=1&b=2", None, "audio/mpeg", 2L),
      ("https://m/e.mp3?a=1&b=2", Some("Ep 9 & more"), "audio/mpeg", 1L),
      ("https://m/gone.mp3", None, null, 1L)))
  }

  test("Feeds.enclosures: randomized attribute order/quotes/case round-trip") {
    val rnd = new scala.util.Random(23)
    for (n <- 0 until 200) {
      val url = s"https://m/e$n.mp3"
      val ty = if (rnd.nextBoolean()) "audio/mpeg" else null
      val le = if (rnd.nextBoolean()) (100 + n).toString else null
      def attr(name: String, v: String): Option[String] =
        Option(v).map { x =>
          val q = if (rnd.nextBoolean()) "\"" else "'"
          val nm = if (rnd.nextBoolean()) name.toUpperCase else name
          val sp = if (rnd.nextBoolean()) " = " else "="
          s"$nm$sp$q$x$q"
        }
      val attrs = rnd.shuffle(List(
        attr("url", url), attr("type", ty), attr("length", le),
        Some(s"data-x='noise$n'")).flatten).mkString(" ")
      val xml = s"<item><enclosure $attrs/><pubDate>D$n</pubDate></item>"
      val got = Feeds.enclosures(xml)
      assert(got.length === 1, xml)
      assert(got(0) === Feeds.Enclosure(url, ty, le, s"D$n", null), xml)
    }
  }

  test("Feeds.dateKey: both dialects to one epoch, java.time cross-check") {
    import java.time.{Instant, OffsetDateTime}
    import java.time.format.DateTimeFormatter
    def iso(s: String): Long = Instant.parse(s).getEpochSecond
    // RFC 3339 battery vs java.time
    assert(Feeds.dateKey("2025-08-02T09:00:00Z") ===
      iso("2025-08-02T09:00:00Z"))
    assert(Feeds.dateKey("2026-03-05") === iso("2026-03-05T00:00:00Z"))
    assert(Feeds.dateKey("1999-12-31T23:59:59.999Z") ===
      iso("1999-12-31T23:59:59Z"), "fraction truncates")
    assert(Feeds.dateKey("2025-08-02T09:00:00+02:00") ===
      iso("2025-08-02T07:00:00Z"))
    assert(Feeds.dateKey("2025-08-02 09:30:00-0130") ===
      iso("2025-08-02T11:00:00Z"))
    assert(Feeds.dateKey("2025-08-02T09:15") ===
      iso("2025-08-02T09:15:00Z"), "seconds optional, zone-less = UTC")
    // RFC 822/1123 battery vs java.time's RFC_1123 parser
    def rfc(s: String): Long = OffsetDateTime
      .parse(s, DateTimeFormatter.RFC_1123_DATE_TIME).toEpochSecond
    for (s <- Seq("Tue, 05 Aug 2025 10:00:00 GMT",
        "Mon, 5 May 2025 01:02:03 +0200",
        "Wed, 31 Dec 2025 23:59:59 -0830"))
      assert(Feeds.dateKey(s) === rfc(s), s)
    // weekday optional + unvalidated; named US zones; seconds optional
    assert(Feeds.dateKey("05 Aug 2025 10:00:00 GMT") ===
      Feeds.dateKey("Fri, 05 Aug 2025 10:00:00 GMT"))
    assert(Feeds.dateKey("Tue, 05 Aug 2025 10:00 EST") ===
      iso("2025-08-05T15:00:00Z"))
    assert(Feeds.dateKey("Tue, 05 Aug 2025 10:00:00") ===
      iso("2025-08-05T10:00:00Z"), "missing zone reads as GMT")
    // unparseable forms are null, never throw
    for (bad <- Seq(null, "", "yesterday", "2025-13-01", "2025-02-3",
        "Tue, 05 Aug 25 10:00:00 GMT", "Tue, 05 Aug 2025 10:00:00 J",
        "2025-08-02T24:00:00Z", "Tue, 05 Xxx 2025 10:00:00 GMT"))
      assert(Feeds.dateKey(bad) === null, s"'$bad'")
  }

  test("seedsFromFeeds: cross-dialect MAX is recency, not format") {
    // the same url listed by an RSS feed (RFC 822, EARLIER) and an
    // Atom feed (RFC 3339, LATER): lexicographic max would pick the
    // letter-initial RFC 822 string ('M' > '2'); the dateKey fold must
    // pick the Atom date. An unparseable date loses to any parsed one.
    val rss = ("<rss><channel><item><link>https://n.example/a</link>" +
      "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>" +
      "<item><link>https://n.example/b</link>" +
      "<pubDate>garbage date</pubDate></item></channel></rss>")
      .getBytes("UTF-8")
    val atom = ("<feed><entry><link href=\"https://n.example/a\"/>" +
      "<updated>2025-02-02</updated></entry>" +
      "<entry><link href=\"https://n.example/b\"/>" +
      "<updated>2010-01-01</updated></entry></feed>").getBytes("UTF-8")
    val seeds = Feeds.seedsFromFeeds(
      Seq(rss, atom).toDF("body"), Seq.empty[String].toDF("url"))
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(seeds("https://n.example/a") === ((2L, "2025-02-02")))
    assert(seeds("https://n.example/b") === ((2L, "2010-01-01")))
  }

  test("outcomesFromRecords: 304 preserves the prior outcome (no row)") {
    // h1 cached a disallow at batch 0; a conditional refetch answers
    // 304 at batch 1 — the ruleless allow-all sentinel must NOT be
    // emitted for it, or latest-wins reads would drop the disallow.
    // A real 404 (h2) still earns the sentinel; a revisit recapture of
    // robots.txt (h3) is the other unchanged form and also emits none.
    def recsOf(fx: graft.sources.Warc.ResponseFixture*) =
      graft.sources.Warc.warcRecords(
        Seq((0L, graft.sources.Warc.encodeWarcFixtures(fx))).toDF("g", "payload"))
        .toDF()
    val b0 = Robots.outcomesFromRecords(recsOf(
      graft.sources.Warc.ResponseFixture("https://h1.example/robots.txt",
        200, contentType = "text/plain",
        body = "User-agent: *\nDisallow: /private/\n".getBytes("UTF-8"))))
    assert(b0.as[(String, String, Boolean, String)].collect().toSet ===
      Set(("h1.example", "*", false, "/private/")))
    val b1 = Robots.outcomesFromRecords(recsOf(
      graft.sources.Warc.ResponseFixture("https://h1.example/robots.txt",
        304, contentType = "text/plain"),
      graft.sources.Warc.ResponseFixture("https://h2.example/robots.txt",
        404, contentType = "text/plain"),
      graft.sources.Warc.ResponseFixture("https://h3.example/robots.txt",
        200, contentType = "text/plain", warcType = "revisit")))
    assert(b1.as[(String, String, Boolean, String)].collect().toSet ===
      Set(("h2.example", "*", true, "")),
      "304 and revisit robots responses must emit NO outcome row")
  }

  test("filterAllowed gates urls per host; hosts without robots allow all") {
    val robots = Seq(
      ("a.example",
        "User-agent: graftbot\nDisallow: /private/\nAllow: /private/pub\n" +
          "User-agent: *\nDisallow: /"),
      ("b.example", "User-agent: *\nDisallow: /*.zip$"),
      ("c.example", "User-agent: otherbot\nDisallow: /"))
      .toDF("host", "body")
    val rules = Robots.rulesDf(robots)
    assert(rules.count() === 5)

    val urls = Seq(
      "https://a.example/private/x",    // named group: disallowed
      "https://a.example/private/pub1", // allow overrides (longer match)
      "https://a.example/open",         // named group silent -> allowed
      "https://b.example/data.zip",     // '*' group, $-anchored: dropped
      "https://b.example/data.zipx",    // anchor must not match
      "https://c.example/anything",     // otherbot group not ours -> allowed
      "https://d.example/no-robots")    // no rows for host -> allowed
      .toDF("url")
    val kept = Robots.filterAllowed(urls, rules, "GraftBot/2.1")
      .as[String].collect().toSet
    assert(kept === Set(
      "https://a.example/private/pub1",
      "https://a.example/open",
      "https://b.example/data.zipx",
      "https://c.example/anything",
      "https://d.example/no-robots"))
    // output schema is the input's (no leaked join columns)
    assert(Robots.filterAllowed(urls, rules, "GraftBot/2.1").columns
      === urls.columns)
  }

  test("filterAllowed keys hosts canonically: case, userinfo, port variants") {
    val rules = Robots.rulesDf(Seq(
      ("A.Example", "User-agent: *\nDisallow: /private/")) // mixed-case row
      .toDF("host", "body"))
    val urls = Seq(
      "https://a.example/private/x",        // plain: disallowed
      "https://u@a.example/private/y",      // userinfo must not evade
      "https://A.EXAMPLE/private/z",        // host case must not evade
      "https://a.example:8443/private/w",   // explicit port must not evade
      "https://a.example/open")
      .toDF("url")
    val kept = Robots.filterAllowed(urls, rules, "graftbot")
      .as[String].collect().toSet
    assert(kept === Set("https://a.example/open"))

    // uppercase SCHEME must not collapse the path to "/" (pathOf would
    // then never match the Disallow — the same silent-allow evasion)
    val shouty = Seq("HTTPS://a.example/private/s").toDF("url")
    assert(Robots.filterAllowed(shouty, rules, "graftbot").count() === 0)
  }

  test("rulesFromRecords: RFC 9309 fetch outcomes — 200/3xx-chain/5xx/4xx/loop") {
    def rf(uri: String, status: Int, location: String = null,
           body: String = "") =
      graft.sources.Warc.ResponseFixture(uri, status,
        contentType = "text/plain", location = location,
        body = body.getBytes("UTF-8"))
    val warc = graft.sources.Warc.encodeWarcFixtures(Seq(
      rf("https://ok.test/robots.txt", 200,
        body = "User-agent: *\nDisallow: /private"),
      // a TWO-hop chain through a non-robots url; the final 200's
      // rules apply to the ORIGINATING host
      rf("https://moved.test/robots.txt", 301,
        location = "https://moved.test/hop"),
      rf("https://moved.test/hop", 302,
        location = "https://cdn.test/master-robots"),
      rf("https://cdn.test/master-robots", 200,
        body = "User-agent: *\nDisallow: /x"),
      rf("https://err.test/robots.txt", 500),
      rf("https://gone.test/robots.txt", 404),
      rf("https://loop.test/robots.txt", 301,
        location = "https://loop.test/robots.txt"),
      // 503 then a successful retry: the 200 wins
      rf("https://retry.test/robots.txt", 503),
      rf("https://retry.test/robots.txt", 200,
        body = "User-agent: *\nDisallow: /p")))
    val records = graft.sources.Warc.warcRecords(
      Seq(Tuple1(warc)).toDF("payload")).toDF()
    val rules = Robots.rulesFromRecords(records)
      .as[(String, String, Boolean, String)].collect().toSet
    assert(rules === Set(
      ("ok.test", "*", false, "/private"),
      ("moved.test", "*", false, "/x"),
      ("retry.test", "*", false, "/p"),
      // unreachable (5xx) synthesizes complete disallow
      ("err.test", "*", false, "/")))
    // 404 and the exhausted loop produce NO rows = allow-all default
    val urls = Seq("https://err.test/a", "https://gone.test/a",
      "https://loop.test/a", "https://ok.test/private/1",
      "https://ok.test/pub", "https://moved.test/x/1",
      "https://moved.test/y").toDF("url")
    val kept = Robots.filterAllowed(urls, Robots.rulesFromRecords(records),
      "graftbot").as[String].collect().toSet
    assert(kept === Set("https://gone.test/a", "https://loop.test/a",
      "https://ok.test/pub", "https://moved.test/y"))
  }

  test("parseDelays: group membership, winning agent, garbage tolerance") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 1.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 10
        |
        |User-agent: slowbot
        |Crawl-delay: nonsense
        |Crawl-delay: -3
        |Crawl-delay: 7
        |""".stripMargin
    assert(Robots.parseDelays(body).toSet ===
      Set(("graftbot", 1.5), ("*", 10.0), ("slowbot", 7.0)))
    // a crawl-delay line closes a group like a rule line does (parse
    // and parseDelays share the boundary model)
    val boundary = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /q"
    assert(Robots.parseDelays(boundary) === Seq(("a", 2.0)))
    assert(Robots.parse(boundary).map(_.agent) === Seq("b"))
    assert(Robots.parseDelays(null) === Seq.empty)
    assert(Robots.parseDelays("Crawl-delay: 5") === Seq.empty) // no group
  }

  test("crawlDelayDf picks the winning group per host, max on conflict") {
    val robots = Seq(
      ("a.example", "User-agent: graftbot\nCrawl-delay: 2\n" +
        "User-agent: *\nCrawl-delay: 50"),       // named group wins
      ("B.EXAMPLE", "User-agent: *\nCrawl-delay: 3"), // host lowercased
      ("c.example", "User-agent: otherbot\nCrawl-delay: 9"), // not ours: none
      ("d.example", "User-agent: graft\nCrawl-delay: 1\n" +
        "User-agent: graftbot\nCrawl-delay: 4"), // longest prefix wins
      ("e.example", "User-agent: graftbot\nCrawl-delay: 2\n" +
        "User-agent: graftbot\nCrawl-delay: 6")) // same agent twice: max
      .toDF("host", "body")
    val got = Robots.crawlDelayDf(robots, "GraftBot/2.1")
      .as[(String, Double)].collect().toSet
    assert(got === Set(("a.example", 2.0), ("b.example", 3.0),
      ("d.example", 4.0), ("e.example", 6.0)))
  }
  test("enclosuresBySourceWithSentinels == enclosuresBySource + sentinels (r18 pin)") {
    import org.apache.spark.sql.functions.{col, lit}
    // fixtures: a two-enclosure feed, a zero-enclosure feed, a feed
    // whose ONLY enclosure fails canonicalization (relative url), a
    // feed mixing a good and a failing enclosure, and a DUPLICATE feed
    // url fetched twice in the batch
    def b(s: String) = s.getBytes("UTF-8")
    val feeds = Seq(
      ("https://f/two", b("<rss><channel><item><title>One</title>" +
        "<enclosure url=\"https://m/1.mp3\" type=\"audio/mpeg\"/></item>" +
        "<item><title>Two</title>" +
        "<enclosure url=\"https://m/2.mp3\" type=\"audio/mpeg\"/></item>" +
        "</channel></rss>")),
      ("https://f/none", b("<rss><channel><item><title>dry</title>" +
        "</item></channel></rss>")),
      ("https://f/rel", b("<rss><channel><item><title>rel</title>" +
        "<enclosure url=\"/only/relative.mp3\"/></item></channel></rss>")),
      ("https://f/mixed", b("<rss><channel><item><title>mix</title>" +
        "<enclosure url=\"https://m/ok.mp3\"/>" +
        "<enclosure url=\"also-relative.mp3\"/></item></channel></rss>")),
      ("https://f/none", b("<feed></feed>"))
    ).toDF("url", "body")
    val fused = Feeds.enclosuresBySourceWithSentinels(feeds)
      .as[(String, Option[String], Option[String], Option[String])]
      .collect().toSet
    val plain = Feeds.enclosuresBySource(feeds)
      .as[(String, Option[String], Option[String], Option[String])]
      .collect().toSet
    // real pairs: byte-identical to enclosuresBySource
    assert(fused.filter(_._2.isDefined) === plain)
    // sentinels: one all-null row per feed url that harvested nothing,
    // PLUS one for the mixed feed (its failing enclosure folds to a
    // sentinel row the ledger reads drop) -- never for clean feeds
    val sentinels = fused.filter(_._2.isEmpty).map(_._1)
    assert(sentinels === Set("https://f/none", "https://f/rel",
      "https://f/mixed"))
    fused.filter(_._2.isEmpty).foreach { r =>
      assert(r._3.isEmpty && r._4.isEmpty, s"sentinel must be all-null: $r")
    }
    // and the ledger-read semantics are invariant: dropping null
    // media_url AFTER any latest-batch selection sees identical rows
    assert(fused.filter(_._2.isDefined).map(r => (r._1, r._2.get)) ===
      plain.map(r => (r._1, r._2.get)))
  }
}
