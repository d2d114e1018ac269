package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document-level text analysis for large-scale training-data pipelines:
 * language ID, quality scoring, token counting, fingerprinting.
 *
 * Everything column-first: built-in `functions._` expressions stay inside
 * whole-stage codegen, so these run at parquet-scan speed with no UDF
 * ser/de. The only Scala closures are languageId/rollingFingerprint (genuine
 * per-string imperative logic).
 */
object TextMetrics {

  // ------------------------------------------------------------- html strip

  /**
   * Strip HTML to visible text — the web-crawl extraction step every
   * pretraining pipeline runs before quality/dedup. Column-only (fully
   * codegen'd, fuses into the scan) and every pattern stays in the
   * Java∩RE2 subset — `(?is)` inline flags and lazy `.*?` are in both;
   * no lookarounds — so the same strings oracle-check in DuckDB:
   *
   *   1. drop <script>/<style> blocks WITH their content (their text is
   *      code, not prose),
   *   2. drop comments,
   *   3. tags → one space (block boundaries must not glue words),
   *   4. decode the six ubiquitous entities, `&amp;` LAST so
   *      `&amp;lt;` decodes to the literal text `&lt;`, not to `<`,
   *   5. collapse whitespace and trim (spaces only — the portable trim).
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ----------------------------------------------------- compression signal

  /** zlib-deflate compression ratio (compressed / raw UTF-8 bytes) — the
    * Gopher/Dolma gibberish detector: repeated boilerplate compresses
    * toward 0, natural prose lands ~0.3–0.6, random noise pushes past 1.
    * Deterministic for a fixed JVM (level 6 deflate) but NOT
    * cross-engine-reproducible (SQL has no deflate), so this metric is
    * spec-verified and excluded from hash-checked oracles by design;
    * filter thresholds on it are robust to zlib-version drift because
    * the classes it separates differ by integer factors, not low bits. */
  def compressionRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(raw)
        d.finish()
        // worst-case deflate expansion: ~5 B per 16 KiB block + header
        val buf = new Array[Byte](raw.length + raw.length / 1000 + 128)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        n.toDouble / raw.length
      }
    }

  // ------------------------------------------------------------ token counts

  /** Whitespace tokens of trimmed text; empty/blank text ⇒ empty array (a
    * bare split would yield [""]). THE engine-parity-sensitive tokenization
    * rule — every ws-token consumer (counts, chunking, n-gram stats) must
    * go through this one definition so Spark queries and their
    * `regexp_split_to_array(trim(text), '\s+')` oracles cannot drift. */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count (codegen'd). */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Adjacent ws-token bigrams ("a b", "b c", ...) as one tight pass per
    * row. A `transform(sequence(...))` formulation evaluates its lambda
    * INTERPRETED per element (the round-1 shingle trap — 100× slower at
    * sf0.1), so this is a UDF kernel like the other per-string loops.
    * Tokenization is char-identical to [[wsTokens]]: space-only trim
    * (Java String.trim strips ALL chars <= U+0020 — not SQL trim) and a
    * limit -1 split that keeps trailing empty tokens, exactly like
    * Spark's `split` and DuckDB's `regexp_split_to_array`. */
  val wsBigramsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) Array.empty[String]
      else {
        val t = wsTokenArr(s)
        if (t.length < 2) Array.empty[String]
        else Array.tabulate(t.length - 1)(i => t(i) + " " + t(i + 1))
      }
    }

  /** The [[wsTokens]] tokenization as a plain-Scala kernel for other
    * per-row UDF loops (bigrams, chunking): space-only trim, limit -1
    * split keeping trailing empties, empty-after-trim → empty array.
    * Null-intolerant by contract — callers guard null themselves (the
    * Column form propagates null). */
  private[graft] def wsTokenArr(s: String): Array[String] = {
    val tr = trimSpaces(s)
    if (tr.isEmpty) Array.empty[String] else tr.split("\\s+", -1)
  }

  /**
   * BPE-ish token count: word pieces = runs of letters, runs of digits, or
   * single non-space symbols (a portable approximation of GPT-2's pre-token
   * regex that parses identically under Java regex and RE2).
   */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  // ---------------------------------------------------------- quality scores

  /** Ratio of non-alphanumeric, non-space chars (symbol noise). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      (n - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double") / n)
  }

  /** Ratio of whitespace chars. */
  def spaceRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      (n - length(regexp_replace(text, "\\s", ""))).cast("double") / n)
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = tokenCountWs(text)
    when(toks === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(text), "\\s", "")).cast("double") / toks)
  }

  private val EnStopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are common English stopwords (quality signal:
    * real prose has 0.2-0.5; keyword spam / boilerplate has ≈0). */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    val stop = filter(toks, t => t.isin(EnStopwords: _*))
    when(n === 0, lit(0.0)).otherwise(size(stop).cast("double") / n)
  }

  /**
   * Composite quality score in [0,1]: rewards stopword presence and sane
   * word lengths, penalizes symbol noise. Weights are heuristic (the
   * reference has no quality model; this is the pipeline extension).
   */
  def qualityScore(text: Column): Column = {
    val stop = stopwordRatio(text)
    val punct = punctRatio(text)
    val mwl = meanWordLen(text)
    val lenOk = when(mwl >= 3.0 && mwl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    val stopOk = least(stop * lit(4.0), lit(1.0))
    val punctOk = greatest(lit(1.0) - punct * lit(4.0), lit(0.0))
    (stopOk * lit(0.4) + punctOk * lit(0.3) + lenOk * lit(0.3))
  }

  // --------------------------------------------------- Gopher quality rules

  /** Gopher's stop-word presence list (Rae et al. 2021, A1.1): a document
    * must contain at least 2 of these to pass the rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * The Gopher document-quality rule set (Rae et al. 2021, Appendix A1.1)
   * as one codegen'd column struct — the published standard web-corpus
   * filter, distinct from the heuristic composite [[qualityScore]]. Every
   * threshold is evaluated in INTEGER-EXACT cross-multiplied form
   * (`mean word length ≥ 3` ⇔ `Σlen ≥ 3·n`), so there is no float ratio
   * anywhere and the rule bits reproduce on any engine:
   *  - r_wordcount: 50 ≤ words ≤ 100 000 (ws tokens)
   *  - r_meanlen:   3 ≤ mean word length ≤ 10
   *  - r_symbol:    (# + "...") symbol-to-word ratio ≤ 0.1
   *  - r_bullet:    ≤ 10% of lines start with a bullet (•, *, -)
   *  - r_ellipsis:  ≤ 30% of lines end with "..."
   *  - r_alpha:     ≥ 80% of words contain an alphabetic character
   *  - r_stop:      ≥ 2 distinct [[GopherStopwords]] present
   *  - keep:        conjunction of all seven
   * Counting stays regex/replace column arithmetic in the Java∩RE2 subset
   * (letter-word counting consumes the leading separator, so matches =
   * letter-carrying tokens exactly; the ellipsis line-end alternation
   * lists `\n` before `$` so Java's before-final-terminator `$` and RE2's
   * end-of-text `$` agree). Blank text fails r_wordcount/r_stop → dropped.
   */
  def gopherRules(text: Column): Column = {
    val tr = trim(text)
    val nWords = tokenCountWs(text).cast("long")
    val sumLen = length(regexp_replace(tr, "\\s", "")).cast("long")
    val alphaWords =
      regexp_count(tr, lit("(^|\\s)[^\\s]*[a-zA-Z][^\\s]*")).cast("long")
    val hashes =
      (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellipses =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", "")))
        .cast("long") / 3).cast("long")
    val nLines = size(split(text, "\n")).cast("long")
    val bulletLines =
      regexp_count(text, lit("(^|\n)[ \t]*[•*-]")).cast("long")
    val ellLines =
      regexp_count(text, lit("\\.\\.\\.[ \t]*(\n|$)")).cast("long")
    val stopHits = GopherStopwords
      .map(w => when(array_contains(wsTokens(lower(text)), w), 1L).otherwise(0L))
      .reduce(_ + _)

    val rWordcount = nWords >= 50L && nWords <= 100000L
    val rMeanlen = sumLen >= nWords * 3 && sumLen <= nWords * 10
    val rSymbol = (hashes + ellipses) * 10 <= nWords
    val rBullet = bulletLines * 10 <= nLines
    val rEllipsis = ellLines * 10 <= nLines * 3
    val rAlpha = alphaWords * 5 >= nWords * 4
    val rStop = stopHits >= 2L
    struct(
      nWords.as("n_words"),
      rWordcount.as("r_wordcount"), rMeanlen.as("r_meanlen"),
      rSymbol.as("r_symbol"), rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"), rStop.as("r_stop"),
      (rWordcount && rMeanlen && rSymbol && rBullet && rEllipsis &&
        rAlpha && rStop).as("keep"))
  }

  // ------------------------------------------------------- repetition signals

  /** Fraction of whitespace tokens that repeat an earlier token
    * (1 - distinct/total) — the word-level "duplicate line fraction" analog
    * of the Gopher repetition rules for corpora without line structure.
    * Column-first: stays in the scan projection, no shuffle. */
  def dupWordFraction(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise((n - size(array_distinct(toks))).cast("double") / n)
  }

  /** SQL `trim` semantics: strip SPACES only. Java's `String.trim` strips
    * every char <= U+0020, so a doc with a leading/trailing tab or newline
    * would tokenize differently here than in SQL `trim` (the DuckDB oracle
    * and the column-side `dupWordFraction` above) — the split must also
    * keep leading/trailing empty tokens (`limit = -1`) to match
    * `regexp_split_to_array` / Spark `split`. */
  /**
   * Gopher-style repetition metric (Rae et al. 2021 §A1.1, "fraction of
   * characters in duplicate n-grams"): over all word n-gram OCCURRENCES
   * of a document, the fraction of their characters contributed by
   * n-grams occurring at least twice. 0.0 for docs with fewer than n
   * tokens; a doc repeated verbatim scores ≈ 1.0. One tight two-pass
   * kernel per row (count grams, then sum lengths) — the
   * `transform(sequence(...))` formulation would evaluate interpreted
   * per element. Integer sums + one final double division, so any BIGINT
   * engine reproduces the value bit-for-bit.
   */
  def dupNgramCharFractionUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(n >= 1, "n must be positive")
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) 0.0
      else {
        val toks = wsTokenArr(s)
        if (toks.length < n) 0.0
        else {
          val m = toks.length - n + 1
          val grams = new Array[String](m)
          val counts = new java.util.HashMap[String, Int](m * 2)
          val sb = new java.lang.StringBuilder(n * 12)
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
            val g = sb.toString
            grams(i) = g
            counts.merge(g, 1, Integer.sum)
            i += 1
          }
          var dup = 0L
          var tot = 0L
          i = 0
          while (i < m) {
            val len = grams(i).length.toLong
            tot += len
            if (counts.get(grams(i)) >= 2) dup += len
            i += 1
          }
          if (tot == 0L) 0.0 else dup.toDouble / tot
        }
      }
    }
  }

  private[graft] def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Occurrence share of the single most frequent word 2-gram (boilerplate /
    * spam detector: real prose tops out ≈0.05, templated spam ≫0.2). Pure
    * function — one hash-map pass per string, used inside a UDF (the HOF
    * equivalent is an interpreted O(n²) scan per row). */
  def topBigramFraction(text: String): Double = {
    if (text == null) return 0.0
    val trimmed = trimSpaces(text)
    if (trimmed.isEmpty) return 0.0
    val toks = trimmed.split("\\s+", -1)
    if (toks.length < 2) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    var max = 0
    while (i < toks.length - 1) {
      val g = toks(i) + " " + toks(i + 1)
      val c = counts.merge(g, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    // both operands are exact ints → the double quotient is identical in
    // every IEEE-754 engine (oracle-safe)
    max.toDouble / (toks.length - 1)
  }

  // ------------------------------------------------------------- language ID

  private val StopwordsByLang: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "as", "was", "on", "are", "this"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es", "del"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den", "des", "ein", "eine", "im", "für", "auf", "nicht"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "dans", "pour", "que", "qui", "sur"))

  /**
   * N-gram/stopword language-ID heuristic: CJK codepoint share decides zh;
   * otherwise the language whose stopword set covers the most tokens wins
   * (ties → "en"). Pure function — used inside a UDF.
   */
  def languageId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        val b = Character.UnicodeBlock.of(c)
        if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
          b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA ||
          b == Character.UnicodeBlock.HANGUL_SYLLABLES) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.2) return "zh"
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var best = "en"; var bestScore = -1
    for ((lang, stops) <- StopwordsByLang.toSeq.sortBy(_._1)) {
      var score = 0
      tokens.foreach(t => if (stops.contains(t)) score += 1)
      if (score > bestScore) { bestScore = score; best = lang }
    }
    if (bestScore == 0) "und" else best
  }

  // ------------------------------------------------------------ fingerprints

  /** Deterministic 64-bit polynomial rolling hash of normalized text
    * (lowercase, collapsed whitespace) — the document fingerprint. */
  def rollingFingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim
    var h = 1125899906842597L // prime
    var i = 0
    while (i < norm.length) { h = 31 * h + norm.charAt(i); i += 1 }
    h
  }

  /** Register language_id / quality / fingerprint as SQL UDFs. */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("language_id", (s: String) => languageId(s))
    spark.udf.register("doc_fingerprint", (s: String) => rollingFingerprint(s))
    spark.udf.register("top_bigram_fraction", (s: String) => topBigramFraction(s))
  }

  /** Full per-document profile (one codegen'd projection, no shuffle). */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("*"),
      length(t).as("m_chars"),
      tokenCountWs(t).as("m_tokens_ws"),
      tokenCountBpeish(t).as("m_tokens_bpeish"),
      punctRatio(t).as("m_punct_ratio"),
      spaceRatio(t).as("m_space_ratio"),
      meanWordLen(t).as("m_mean_word_len"),
      stopwordRatio(t).as("m_stopword_ratio"),
      qualityScore(t).as("m_quality"))
  }
}
