package graft.analysis

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextMetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(
      ("hello world", 2, 2),
      ("  padded   spaces  ", 2, 2),
      ("", 0, 0),
      ("don't stop-me now!", 3, 8), // don ' t stop - me now !
      ("x2 42", 2, 3)               // x 2 42
    ).toDF("text", "ws", "bpeish")
    val got = df.select(col("ws"), col("bpeish"),
      TextMetrics.tokenCountWs(col("text")).as("g_ws"),
      TextMetrics.tokenCountBpeish(col("text")).as("g_bp")).collect()
    got.foreach { r =>
      assert(r.getInt(2) === r.getInt(0), s"ws mismatch in $r")
      assert(r.getInt(3) === r.getInt(1), s"bpeish mismatch in $r")
    }
  }

  test("quality metrics are bounded and ordered sensibly") {
    val prose = "the cat sat on the mat and it was happy with the sun"
    val spam = "$$$ BUY NOW!!! @@@ ### $$$ WIN WIN WIN !!! ### @@@ $$$"
    val rows = Seq(prose, spam).toDF("text")
      .select(TextMetrics.qualityScore(col("text")).as("q"),
        TextMetrics.punctRatio(col("text")).as("p"),
        TextMetrics.stopwordRatio(col("text")).as("s"))
      .as[(Double, Double, Double)].collect()
    val (proseQ, spamQ) = (rows(0)._1, rows(1)._1)
    assert(proseQ > spamQ, s"prose $proseQ must outscore spam $spamQ")
    rows.foreach { case (q, p, s) =>
      assert(q >= 0.0 && q <= 1.0); assert(p >= 0.0 && p <= 1.0)
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("language id: charset and stopword heuristics") {
    assert(TextMetrics.languageId("the cat is on the mat and it is happy") === "en")
    assert(TextMetrics.languageId("el gato está en la casa y es feliz con el sol") === "es")
    assert(TextMetrics.languageId("der Hund ist im Haus und die Katze ist auf dem Dach nicht") === "de")
    assert(TextMetrics.languageId("le chat est dans la maison et les oiseaux sur le toit") === "fr")
    assert(TextMetrics.languageId("这是一个中文句子，用来测试语言识别") === "zh")
    assert(TextMetrics.languageId("zxqw plugh xyzzy") === "und")
    assert(TextMetrics.languageId("") === "und")
  }

  test("fingerprint is normalization-invariant and deterministic") {
    val a = TextMetrics.rollingFingerprint("Hello   World")
    val b = TextMetrics.rollingFingerprint("hello world")
    val c = TextMetrics.rollingFingerprint("hello world!")
    assert(a === b)  // case + whitespace normalize away
    assert(a !== c)
    assert(a === TextMetrics.rollingFingerprint("Hello   World"))
  }

  test("profile adds all metric columns in one projection") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val prof = TextMetrics.profile(docs)
    val cols = prof.columns.toSet
    Seq("m_chars", "m_tokens_ws", "m_tokens_bpeish", "m_punct_ratio",
      "m_space_ratio", "m_mean_word_len", "m_stopword_ratio", "m_quality")
      .foreach(c => assert(cols.contains(c), s"missing $c"))
    val r = prof.agg(min("m_quality"), max("m_quality"),
      min("m_tokens_ws")).as[(Double, Double, Int)].head()
    assert(r._1 >= 0.0 && r._2 <= 1.0 && r._3 > 0)
    // n_chars ground truth column must agree with m_chars
    assert(prof.filter(col("m_chars") =!= col("n_chars")).count() === 0)
  }

  test("topBigramFraction matches SQL trim semantics on non-space whitespace") {
    // SQL trim strips spaces only, and regexp_split keeps boundary empties:
    // "\ta b" -> ["", "a", "b"] -> 2 bigrams, each once -> 0.5. Java's
    // String.trim would strip the tab and report 1.0 — the doc_repetition
    // oracle computes 0.5, so the UDF must too.
    assert(TextMetrics.topBigramFraction("\ta b") === 0.5)
    // trailing tab: split must keep the trailing empty token (limit = -1)
    assert(TextMetrics.topBigramFraction("a b\t") === 0.5)
    // plain spaces unchanged by the fix
    assert(TextMetrics.topBigramFraction("  a b  ") === 1.0)
    assert(TextMetrics.topBigramFraction("a b a b c") === 0.5)
    // and the column-side dupWordFraction sees the same 3 tokens for "\ta b"
    val dup = Seq("\ta b").toDF("text")
      .select(TextMetrics.dupWordFraction(col("text")).as("d"))
      .as[Double].head()
    assert(dup === 0.0)
  }

  test("dupNgramCharFraction: hand-computed cases, bounds, and doubling") {
    def frac(n: Int, s: String): Double =
      Seq(s).toDF("t")
        .select(TextMetrics.dupNgramCharFractionUdf(n)(col("t")).as("f"))
        .as[Double].head()
    // "a b a b c": bigrams [a b, b a, a b, b c] — "a b" occurs twice
    // (2 occurrences × 3 chars = 6 dup chars) of 12 total chars
    assert(frac(2, "a b a b c") === 6.0 / 12.0)
    // no repetition -> 0; fewer than n tokens -> 0; empty/null-ish -> 0
    assert(frac(2, "all distinct words here") === 0.0)
    assert(frac(3, "a b") === 0.0)
    assert(frac(2, "   ") === 0.0)
    // doubling a text drives the fraction toward 1 (every gram except
    // those straddling the seam occurs twice; seam grams ALSO repeat
    // here because the halves are identical end-to-start... verify >= 0.9)
    val t = "one two three four five six seven eight nine ten"
    val d = frac(3, t + " " + t)
    assert(d > 0.9 && d <= 1.0, s"doubled-text dup3 fraction $d")
    // bounds on the corpus
    val bad = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(TextMetrics.dupNgramCharFractionUdf(2)(col("text")).as("f"))
      .filter(col("f") < 0.0 || col("f") > 1.0).count()
    assert(bad === 0L)
  }

  test("wsBigramsUdf tokenizes char-identically to the wsTokens column path") {
    def viaUdf(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextMetrics.wsBigramsUdf(col("t")))
        .as[Seq[String]].head()
    def viaColumn(s: String): Seq[String] = {
      val toks = Seq(s).toDF("t").select(TextMetrics.wsTokens(col("t")))
        .as[Seq[String]].head()
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    // non-space whitespace at the boundaries is the divergence trap: SQL
    // trim strips spaces only and regexp_split keeps boundary empties
    for (s <- Seq("hello world\n", "\ta b", "a b\t", "  a b  ", "a", "", "   "))
      assert(viaUdf(s) === viaColumn(s), s"diverged on ${s.replace("\n", "\\n")}")
    assert(viaUdf("hello world\n") === Seq("hello world", "world "))
  }

  test("compressionRatio separates boilerplate, prose, and noise") {
    val boiler = "click here to subscribe " * 200
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders through seventeen different meadows looking for dinner ") * 20
    val noise = {
      var x = 0x9e3779b97f4a7c15L
      (1 to 4000).map { _ =>
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17 // xorshift, fixed seed
        ('a' + math.floorMod(x, 26L).toInt).toChar
      }.mkString
    }
    val rows = Seq(("b", boiler), ("p", prose), ("n", noise)).toDF("k", "t")
      .select($"k", TextMetrics.compressionRatio($"t").as("r"))
      .as[(String, Double)].collect().toMap
    assert(rows("b") < rows("p"), s"boilerplate must compress best: $rows")
    assert(rows("p") < rows("n"), s"noise must compress worst: $rows")
    assert(rows("b") < 0.1 && rows("n") > 0.5, s"class separation lost: $rows")
    // empty text is defined as incompressible
    val empty = Seq(("e", "")).toDF("k", "t")
      .select(TextMetrics.compressionRatio($"t")).as[Double].head()
    assert(empty === 1.0)
  }

  test("stripHtml: tags, script/style content, comments, entities") {
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      // script/style bodies are code, not prose — dropped entirely
      "<script>var x = 1;</script>before<style>p{}</style>after" -> "before after",
      "<SCRIPT a=\"b\">x</SCRIPT>kept" -> "kept",
      "a<!-- hidden <b>note</b> -->b" -> "a b",
      // entity decode, &amp; last: &amp;lt; is the TEXT "&lt;", not "<"
      "1 &lt; 2 &amp;&amp; 3 &gt; 2" -> "1 < 2 && 3 > 2",
      "literal &amp;lt; stays" -> "literal &lt; stays",
      "&quot;q&quot; &#39;s&#39; a&nbsp;b" -> "\"q\" 's' a b",
      // whitespace collapse across removed block boundaries
      "<div>one</div>\n\n<div>two</div>" -> "one two",
      "plain text" -> "plain text")
    val got = cases.map(_._1).toDF("h")
      .select($"h", TextMetrics.stripHtml($"h").as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"stripHtml('$in')")
    }
  }

  test("gopherRules: each rule trips on its targeted pathology") {
    import org.apache.spark.sql.Row
    // a healthy base passing every rule: 50 prose-like words with
    // stopwords, letters, sane lengths, no symbols/bullets/ellipses
    val healthy = (Seq("the", "cat", "sat", "with", "it") ++
      (1 to 45).map(i => s"word$i")).mkString(" ")
    def rules(t: String): Row = {
      val r = Seq(Tuple1(t)).toDF("text")
        .select(TextMetrics.gopherRules($"text").as("g"))
        .select("g.*").head()
      assert(r.schema.fieldNames.toSeq === Seq("n_words", "r_wordcount",
        "r_meanlen", "r_symbol", "r_bullet", "r_ellipsis", "r_alpha",
        "r_stop", "keep"))
      r
    }
    val ok = rules(healthy)
    assert(ok.getBoolean(8), s"healthy doc must keep: $ok")

    // word count: 49 words fails, blank fails
    assert(!rules(healthy.split(" ").take(49).mkString(" ")).getBoolean(1))
    assert(!rules("  ").getBoolean(1))
    // mean word length: single-char words (mean 1 < 3)
    assert(!rules(Seq.fill(60)("a").mkString(" ")).getBoolean(2))
    // symbol ratio: 7 hashes over 50 words > 10%
    assert(!rules(healthy + " # # # # # # #").getBoolean(3))
    // "..." counts into the same symbol budget
    assert(!rules(healthy + " ... ... ... ... ... ... ...").getBoolean(3))
    // bullet lines: 2 of 3 lines start with bullets
    assert(!rules("• a\n• b\n" + healthy).getBoolean(4))
    // ellipsis line-ends: 2 of 3 lines (incl. the $-terminated last one)
    assert(!rules("x...\n" + healthy + "\nend...").getBoolean(5))
    // alpha words: digits-only tokens dilute below 80%
    assert(!rules(healthy + " " + (1 to 20).map(_.toString).mkString(" "))
      .getBoolean(6))
    // stopwords: only one distinct stopword present
    assert(!rules((Seq("the") ++ (1 to 49).map(i => s"word$i")).mkString(" "))
      .getBoolean(7))
    // n_words is the exact ws token count
    assert(ok.getLong(0) === 50L)
  }
}
