package graft.pipeline

/** RFC 3986 resolution: the §5.4 example battery (normal AND abnormal),
  * a `java.net.URI.resolve` cross-check on the normal cases, the
  * crawl-specific deltas (fragment strip, non-http schemes → null), and
  * the fused-normalization kernel pinned against the normalizeUrl
  * Column chain. */
class UrlResolveSpec extends graft.SparkTestBase {

  private val base = "http://a.ex/b/c/d;p?q"

  // RFC 3986 §5.4.1 normal examples (fragments stripped by our contract;
  // g: scheme cases adapted — non-http schemes are null here)
  private val normal = Seq(
    "g" -> "http://a.ex/b/c/g",
    "./g" -> "http://a.ex/b/c/g",
    "g/" -> "http://a.ex/b/c/g/",
    "/g" -> "http://a.ex/g",
    "//g" -> "http://g",
    "?y" -> "http://a.ex/b/c/d;p?y",
    "g?y" -> "http://a.ex/b/c/g?y",
    "#s" -> "http://a.ex/b/c/d;p?q", // fragment strip: same-document
    "g#s" -> "http://a.ex/b/c/g",
    "g?y#s" -> "http://a.ex/b/c/g?y",
    ";x" -> "http://a.ex/b/c/;x",
    "g;x" -> "http://a.ex/b/c/g;x",
    "g;x?y#s" -> "http://a.ex/b/c/g;x?y",
    "" -> "http://a.ex/b/c/d;p?q",
    "." -> "http://a.ex/b/c/",
    "./" -> "http://a.ex/b/c/",
    ".." -> "http://a.ex/b/",
    "../" -> "http://a.ex/b/",
    "../g" -> "http://a.ex/b/g",
    "../.." -> "http://a.ex/",
    "../../" -> "http://a.ex/",
    "../../g" -> "http://a.ex/g")

  // §5.4.2 abnormal examples — java.net.URI diverges on the excess-..
  // cases (it keeps the leading ".."), so these are pinned explicitly
  private val abnormal = Seq(
    "../../../g" -> "http://a.ex/g",
    "../../../../g" -> "http://a.ex/g",
    "/./g" -> "http://a.ex/g",
    "/../g" -> "http://a.ex/g",
    "g." -> "http://a.ex/b/c/g.",
    ".g" -> "http://a.ex/b/c/.g",
    "g.." -> "http://a.ex/b/c/g..",
    "..g" -> "http://a.ex/b/c/..g",
    "./../g" -> "http://a.ex/b/g",
    "./g/." -> "http://a.ex/b/c/g/",
    "g/./h" -> "http://a.ex/b/c/g/h",
    "g/../h" -> "http://a.ex/b/c/h",
    "g;x=1/./y" -> "http://a.ex/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a.ex/b/c/y",
    // §5.4.2 query/fragment-in-dot-segment cases
    "g?y/./x" -> "http://a.ex/b/c/g?y/./x",
    "g?y/../x" -> "http://a.ex/b/c/g?y/../x")

  test("RFC 3986 §5.4.1 normal battery") {
    normal.foreach { case (ref, want) =>
      assert(UrlResolve.resolve(base, ref) === want, s"ref=$ref")
    }
  }

  test("RFC 3986 §5.4.2 abnormal battery (excess .. consumed at root)") {
    abnormal.foreach { case (ref, want) =>
      assert(UrlResolve.resolve(base, ref) === want, s"ref=$ref")
    }
  }

  test("java.net.URI cross-check on the normal cases") {
    val b = java.net.URI.create(base)
    normal.foreach { case (ref, _) =>
      // skip the same-document forms and query-only refs: URI.resolve
      // has known RFC 2396-era deviations there (JDK-4708535 drops the
      // base's last segment on "?y") — those cases are pinned explicitly
      // in the battery above instead
      if (ref.nonEmpty && !ref.startsWith("#") && !ref.startsWith("?")) {
        val viaUri = b.resolve(java.net.URI.create(ref)).normalize()
        val noFrag = new java.net.URI(viaUri.getScheme, viaUri.getAuthority,
          viaUri.getPath, viaUri.getQuery, null)
        assert(UrlResolve.resolve(base, ref) === noFrag.toString, s"ref=$ref")
      }
    }
  }

  test("absolute refs: http(s) kept (scheme lowercased), others null") {
    assert(UrlResolve.resolve(base, "https://Other.EX:8443/X?z=1#f") ===
      "https://Other.EX:8443/X?z=1") // authority case is normalizeUrl's job
    assert(UrlResolve.resolve(base, "HTTP://x.ex/p/../q") === "http://x.ex/q")
    assert(UrlResolve.resolve(base, "mailto:a@b") === null)
    assert(UrlResolve.resolve(base, "javascript:void(0)") === null)
    assert(UrlResolve.resolve(base, "data:text/plain,x") === null)
    assert(UrlResolve.resolve(base, "ftp://x.ex/f") === null)
    assert(UrlResolve.resolve(base, "tel:+123") === null)
  }

  test("network-path refs take the base scheme") {
    assert(UrlResolve.resolve("https://a.ex/p", "//b.ex/q?r") ===
      "https://b.ex/q?r")
    assert(UrlResolve.resolve("http://a.ex/p", "//b.ex") === "http://b.ex")
  }

  test("empty base path merges at root; colon segments are not schemes") {
    assert(UrlResolve.resolve("https://a.ex", "g") === "https://a.ex/g")
    assert(UrlResolve.resolve("https://a.ex?q=1", "g") === "https://a.ex/g")
    // "b:c" after a slash is NOT a scheme (colon preceded by '/')
    assert(UrlResolve.resolve(base, "g/b:c") === "http://a.ex/b/c/g/b:c")
    // but a leading "x:y" IS a scheme per RFC — non-http → null
    assert(UrlResolve.resolve(base, "x:y") === null)
  }

  test("WHATWG href pre-clean: wrapped whitespace strips, inner tabs vanish") {
    assert(UrlResolve.resolve(base, "\n  https://x.ex/p  \t") ===
      "https://x.ex/p")
    assert(UrlResolve.resolve(base, "  g  ") === "http://a.ex/b/c/g")
    assert(UrlResolve.resolve(base, "\t/abs\r\n") === "http://a.ex/abs")
    // internal tab/LF/CR removed ANYWHERE — even splitting the scheme
    assert(UrlResolve.resolve(base, "ht\ttps://y.ex/q") === "https://y.ex/q")
    assert(UrlResolve.resolve(base, "g/h\n i") === "http://a.ex/b/c/g/h i")
    // whitespace-only ref == empty ref (same-document)
    assert(UrlResolve.resolve(base, "   ") === "http://a.ex/b/c/d;p?q")
  }

  test("total on garbage: malformed bases and refs never throw") {
    assert(UrlResolve.resolve(null, "g") === null)
    assert(UrlResolve.resolve(base, null) === null)
    assert(UrlResolve.resolve("not a url", "g") === null)
    assert(UrlResolve.resolve("ftp://a.ex/p", "g") === null)
    assert(UrlResolve.resolve("http:///missing-host", "g") === null)
    assert(UrlResolve.resolve("http://", "g") === null)
    assert(UrlResolve.resolve(base, "http://") === null)
    assert(UrlResolve.resolve(base, "http:no-slashes") === null)
    assert(UrlResolve.resolve(base, "#") === "http://a.ex/b/c/d;p?q")
  }

  test("randomized relative refs agree with java.net.URI (normal cases)") {
    val rnd = new scala.util.Random(31)
    val segs = Seq("a", "bb", "c.d", ".", "..", "x1")
    val bases = Seq("http://h.ex/p/q/r", "https://h.ex/p/", "http://h.ex/",
      "https://h.ex/a/b/c/d/e")
    var checked = 0
    for (_ <- 0 until 1000) {
      val b = bases(rnd.nextInt(bases.length))
      val depth = 1 + rnd.nextInt(4)
      val lead = if (rnd.nextInt(4) == 0) "/" else ""
      val trail = if (rnd.nextInt(4) == 0) "/" else ""
      val q = if (rnd.nextInt(4) == 0) "?k=v" else ""
      val ref = lead + Seq.fill(depth)(segs(rnd.nextInt(segs.length)))
        .mkString("/") + trail + q
      val viaUri =
        try {
          val u = java.net.URI.create(b)
            .resolve(java.net.URI.create(ref)).normalize()
          new java.net.URI(u.getScheme, u.getAuthority, u.getPath,
            u.getQuery, null).toString
        } catch { case _: Exception => null }
      // skip java's known excess-.. divergence (it keeps leading ..
      // where RFC 3986 consumes them at the root)
      if (viaUri != null && !viaUri.contains("..")) {
        assert(UrlResolve.resolve(b, ref) === viaUri,
          s"base=$b ref=$ref")
        checked += 1
      }
    }
    assert(checked > 600, s"only $checked comparable samples — generator broken?")
  }

  test("normalizeResolved equals the normalizeUrl Column chain") {
    // resolve outputs covering every normalization rule + no-op fast
    // paths, plus randomized composites
    val seeds = Seq(
      "https://a.ex/page/1",                      // fast path: untouched
      "https://a.ex",                             // empty path
      "https://A.EX/Path/Kept",                   // authority lower, path kept
      "https://u@B.EX:8443/x",                    // userinfo+port lowercase
      "http://a.ex:80/x", "https://a.ex:443/x",   // default ports elide
      "http://a.ex:80", "https://a.ex:443?q=1",   // port at end / before query
      "http://a.ex:8080/x",                       // non-default port kept
      "https://a.ex/x/",                          // trailing slash
      "https://a.ex/x?utm_source=a",              // lone tracking param
      "https://a.ex/x?utm_a=1&utm_b=2&keep=3",    // adjacent tracking params
      "https://a.ex/x?keep=1&gclid=g",            // trailing tracking param
      "https://a.ex/x?gclid=",                    // empty value
      "https://a.ex/x?xgclid=v&my_fbclid=a",      // suffix look-alikes kept
      "https://a.ex/x?fbclid=f&",                 // dangling &
      "https://a.ex/x?",                          // dangling ?
      "https://a.ex/a&gclid=in-path",             // '&' in PATH (chain strips!)
      "https://a.ex&",                            // '&' ends AUTHORITY (r14:
                                                  // DanglingRe strips it)
      "https://u&gclid=x@h.ex/p",                 // '&' in userinfo (UtmRe
                                                  // fires unanchored)
      "https://a&b.ex/p",                         // benign '&' in authority
      "https://a.ex/x?a=1&b=2",                   // clean query untouched
      "https://résumé.ex/p",            // non-ASCII authority
      "https://a.ex/UPPER/path",                  // path case preserved
      // percent-normalization (r14): unreserved escapes decode in any
      // hex case, reserved escapes uppercase their hex, and the
      // malformed-escape fallback replays the chain's exact patterns
      "https://a.ex/%7etilde", "https://a.ex/%7Etilde",
      "https://a.ex/p?k=%41%6223",                // %41%62 -> Ab
      "https://a.ex/a%2fb",                       // reserved: %2f -> %2F
      "https://a.ex/%3f%3d",                      // %3F%3D stays encoded
      "https://a.ex/%2d%2e%5f%7e",                // all unreserved marks
      "https://a.ex/p?x=%zz",                     // malformed: not hex
      "https://a.ex/p%4",                         // dangling single nibble
      "https://a.ex/%6%61",                       // THE adjacency trap: a
      // decoded 'a' completes %6a for the chain; kernel must match it
      "https://a.ex/%4%41", "https://a.ex/%%41",  // more malformed soup
      "https://a.ex/%")                           // lone percent
    val rnd = new scala.util.Random(7)
    val hosts = Seq("a.ex", "B.Ex:443", "u@C.EX", "d.ex:9090")
    val paths = Seq("", "/p", "/p/", "/P&gclid=x", "/a/b",
      "/%7e", "/%2F%61", "/%6%62", "/x%")
    val queries = Seq("", "?utm_x=1", "?k=1&gclid=2", "?&", "?k=1&utm_a=&z=3",
      "?e=%7E&f=%4a", "?g=%5%35")
    val randoms = for (_ <- 0 until 200) yield
      s"${if (rnd.nextBoolean()) "http" else "https"}://${hosts(rnd.nextInt(hosts.length))}" +
        s"${paths(rnd.nextInt(paths.length))}${queries(rnd.nextInt(queries.length))}"
    val all = (seeds ++ randoms).distinct
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def viaChain(urls: Seq[String]): Map[String, String] =
      urls.toDF("u")
        .select(col("u"), UrlFilter.normalizeUrl(col("u")).as("n"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val chain = viaChain(all)
    all.foreach { u =>
      assert(UrlResolve.normalizeResolved(u) === chain(u), s"url=$u")
    }
    // and the fused form == the unfused composition through resolve
    val base = "https://base.ex/dir/page"
    val hrefs = Seq("sub/x?utm_source=t", "../Up/", "//H.EX:443/q?gclid=1&k=2",
      "HTTP://A.EX:80/p/", "?utm_a=1", "x")
    val resolved = hrefs.map(h => h -> UrlResolve.resolve(base, h)).toMap
    val chain2 = viaChain(resolved.values.filter(_ != null).toSeq)
    hrefs.foreach { href =>
      val unfused = Option(resolved(href)).map(chain2)
      assert(Option(UrlResolve.resolveAndNormalize(base, href)) === unfused,
        s"href=$href")
    }
  }

  test("pctNormalize scan equals the PctSteps replay on 5000 %-soups") {
    // independent reference: the chain's own pattern list replayed via
    // java.util.regex (the engine Spark's regexp_replace runs on) —
    // the kernel's malformed-escape FALLBACK is this replay, so the
    // property exercises the valid-escape SCAN path against it under
    // randomness far beyond the fixture arms (dangling nibbles, %%,
    // decoded-char adjacency, every hex case)
    val patterns = UrlFilter.PctSteps.map { case (p, r) =>
      (java.util.regex.Pattern.compile(p), r)
    }
    def replay(s: String): String =
      patterns.foldLeft(s) { case (acc, (p, r)) =>
        p.matcher(acc).replaceAll(r)
      }
    val rnd = new scala.util.Random(17)
    val atoms = "0123456789abcdefABCDEF%%%~._-xyzXYZ/?&"
    for (_ <- 0 until 5000) {
      val s = Seq.fill(2 + rnd.nextInt(24))(
        atoms(rnd.nextInt(atoms.length))).mkString
      assert(UrlResolve.pctNormalize(s) === replay(s), s"soup: $s")
    }
  }

  test("adversarial dot-runs stay linear and resolve") {
    val mega = "./" * 200000 + "x"
    val t0 = System.nanoTime()
    assert(UrlResolve.resolve(base, mega) === "http://a.ex/b/c/x")
    val up = "../" * 200000 + "y"
    assert(UrlResolve.resolve(base, up) === "http://a.ex/y")
    assert((System.nanoTime() - t0) < 5e9, "dot-run resolution not linear")
  }
}
