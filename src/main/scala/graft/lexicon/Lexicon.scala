package graft.lexicon

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.TextAnalyzer

/**
 * The reference's flagship pipeline (kreeben/resin):
 *  - build    ≙ StringAnalyzer.BuildLexicon (StringAnalyzer.cs:35-86):
 *    corpus → tokenize into sparse vectors → per-token identity angle key →
 *    dedup by key → sorted columnar store.
 *  - validate ≙ StringAnalyzer.ValidateLexicon (StringAnalyzer.cs:88-171):
 *    re-tokenize corpus, point-lookup each token's angle, fail on a miss,
 *    compare stored vs fresh vector (mutualAngle), count collisions below the
 *    identity threshold, track the global minimum angle.
 *
 * Spark-first shape: the single-threaded enumerator pipeline becomes
 * `flatMap → dropDuplicates(angle) → sortWithinPartitions → parquet`, and
 * validation becomes one equi-join + one aggregate. At 100 TB the only
 * shuffles are the dedup hash-exchange and the join; both partition by the
 * angle key, so AQE can coalesce and skew-split freely. The lexicon (distinct
 * tokens) is orders of magnitude smaller than the corpus, so the validate
 * join broadcasts when it fits.
 */
object Lexicon {

  /** Lexicon row: identity-angle key + the token's sparse vector. */
  final case class Entry(angle: Double, label: String,
                         indices: Array[Int], values: Array[Double])

  /** Token occurrence during validation (pre-join). */
  final case class TokenRow(angle: Double, label: String,
                            indices: Array[Int], values: Array[Double])

  /**
   * Tokenize a corpus column into (angle, label, indices, values) rows.
   * Pure mapPartitions flatMap: fully parallel, no shuffle.
   *
   * Each partition memoizes vectorization by label: corpora are Zipfian,
   * so a small fraction of distinct labels covers almost all occurrences,
   * and `vectorizeToken`'s per-OCCURRENCE 512-double buffer + scan was the
   * pipeline's hottest kernel. The memo is bounded (cleared if a
   * pathological vocabulary outgrows it) so executor memory stays flat;
   * entries are immutable rows, safe to re-emit (the encoder copies).
   */
  private final val MemoMaxLabels = 1 << 18

  def tokenize(docs: DataFrame, textCol: String,
               dims: Int = TextAnalyzer.DefaultDims): Dataset[TokenRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).na.drop()
      .as[String]
      .mapPartitions { texts =>
        val memo = new java.util.HashMap[String, TokenRow]()
        texts.flatMap { text =>
          TextAnalyzer.splitWords(text).map { w =>
            var t = memo.get(w)
            if (t == null) {
              if (memo.size >= MemoMaxLabels) memo.clear()
              val v = TextAnalyzer.vectorizeToken(w, dims)
              t = TokenRow(TextAnalyzer.angleOfId(v, dims), v.label, v.indices, v.values)
              memo.put(w, t)
            }
            t
          }
        }
      }
  }

  /**
   * Build the lexicon DataFrame: one row per distinct identity angle
   * (set semantics of ColumnWriter.TryPut — first writer wins).
   */
  def build(docs: DataFrame, textCol: String = "text",
            dims: Int = TextAnalyzer.DefaultDims): Dataset[Entry] =
    buildFromTokens(tokenize(docs, textCol, dims))

  /** Lexicon from an already-tokenized corpus — lets build + validate share
    * ONE tokenize pass (persist the token Dataset, feed it to both): the
    * 512-d vectorizer is the most expensive kernel in the pipeline and must
    * not run twice over the same corpus. */
  def buildFromTokens(tokens: Dataset[TokenRow]): Dataset[Entry] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .dropDuplicates("angle")
      .map(t => Entry(t.angle, t.label, t.indices, t.values))
  }

  /**
   * Build and persist sorted-by-angle parquet (write locality ≙ the
   * reference's pre-write sort, StringAnalyzer.cs:69-70; parquet min/max
   * row-group stats then give data-skipping on angle lookups).
   */
  def buildAndWrite(docs: DataFrame, path: String, textCol: String = "text",
                    dims: Int = TextAnalyzer.DefaultDims): Unit =
    build(docs, textCol, dims)
      .repartitionByRange(col("angle"))
      .sortWithinPartitions("angle")
      .write.mode("overwrite").parquet(path)

  /**
   * Validation result: verdict + diagnostics (mirrors the reference's logged
   * aggregates: doc/token counts, collision count, global lowest mutual
   * angle and its token).
   */
  final case class ValidationReport(ok: Boolean, totalTokens: Long,
                                    missing: Long, collisions: Long,
                                    minMutualAngle: Double,
                                    leastEntropicToken: String)

  /** Stored-vs-fresh sparse cosine — a column UDF (not a Dataset.map over
    * Row) so the join→aggregate plan stays in whole-stage codegen with only
    * this scalar call interpreted. */
  private val mutualAngleUdf = udf(
    (ia: Seq[Int], va: Seq[Double], ib: Seq[Int], vb: Seq[Double]) =>
      graft.functions.VectorOps.cosineSparse(
        ia.toArray, va.toArray, ib.toArray, vb.toArray))

  /**
   * Validate a corpus against a lexicon: every token's angle must exist
   * (miss ⇒ ok=false) and the stored vector must be ≈ the fresh vector.
   * One left join + one aggregate; Catalyst broadcasts the smaller side.
   */
  def validate(docs: DataFrame, lexicon: DataFrame, textCol: String = "text",
               dims: Int = TextAnalyzer.DefaultDims,
               identityAngle: Double = TextAnalyzer.DefaultIdentityAngle): ValidationReport =
    validateTokens(tokenize(docs, textCol, dims), lexicon, identityAngle)

  /** `validate` over an already-tokenized corpus — pair with
    * `buildFromTokens` so the corpus is vectorized exactly once for the
    * build + validate round-trip.
    *
    * Occurrences pre-aggregate by (angle, label) BEFORE the lexicon join:
    * every occurrence of a label carries the identical fresh vector, so the
    * stored-vs-fresh cosine is computed once per DISTINCT token and weighted
    * by its occurrence count — on a Zipfian corpus that's orders of
    * magnitude fewer UDF calls than per-occurrence scoring, and the groupBy
    * compresses map-side to vocabulary size before it ever shuffles. An
    * angle collision (two labels, one angle) keeps its own group, so each
    * label still scores its own fresh vector against the stored entry —
    * semantics identical to the per-occurrence join. */
  def validateTokens(tokens: Dataset[TokenRow], lexicon: DataFrame,
                     identityAngle: Double = TextAnalyzer.DefaultIdentityAngle): ValidationReport = {
    val lex = lexicon.select(col("angle").as("lex_angle"),
      col("indices").as("lex_indices"), col("values").as("lex_values"))

    val grouped = tokens.toDF()
      .groupBy(col("angle"), col("label"))
      .agg(count(lit(1)).as("occ"),
        first(col("indices")).as("indices"),
        first(col("values")).as("values"))

    val joined = grouped.join(lex, col("angle") === col("lex_angle"), "left")
    val hit = col("lex_angle").isNotNull
    val mutual = joined.select(
      col("label"), col("occ"),
      hit.as("hit"),
      when(hit, mutualAngleUdf(col("indices"), col("values"),
        col("lex_indices"), col("lex_values"))).as("mutual"))

    val agg = mutual.agg(
      coalesce(sum(col("occ")), lit(0L)).as("total"),
      sum(when(!col("hit"), col("occ")).otherwise(0L)).as("missing"),
      sum(when(col("hit") && col("mutual") < identityAngle, col("occ")).otherwise(0L)).as("collisions"),
      min(when(col("hit"), col("mutual"))).as("minMutual"),
      min_by(col("label"), when(col("hit"), col("mutual"))).as("worstToken")
    ).collect()(0)

    val total = agg.getLong(0)
    val missing = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    val collisions = if (agg.isNullAt(2)) 0L else agg.getLong(2)
    val minMutual = if (agg.isNullAt(3)) 1.0 else agg.getDouble(3)
    val worst = if (agg.isNullAt(4)) "" else agg.getString(4)
    ValidationReport(missing == 0L, total, missing, collisions, minMutual, worst)
  }

  /**
   * ≙ LexiconInspector.FindMissingAngles/SampleAngles (LexiconInspector.cs:
   * 20-42): uniform angle probes in [-1,1] (seeded), anti-joined against the
   * lexicon keys.
   */
  def findMissingAngles(lexicon: DataFrame, count: Int, seed: Long = 12345L): Array[Double] = {
    val spark = lexicon.sparkSession
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val probes = Seq.fill(count)(rnd.nextDouble() * 2.0 - 1.0)
    probes.toDF("angle")
      .join(lexicon.select("angle"), Seq("angle"), "left_anti")
      .as[Double].collect()
  }

  private val SynthAlphabet = "abcdefghijklmnopqrstuvwxyz"

  /**
   * ≙ TokenSynthesizer.SynthesizeLabelForDimensions (TokenSynthesizer.cs:
   * 32-66): grow a nonsensical-but-readable label one character at a time,
   * steering each positional bigram toward the target hashed dimensions.
   * At every position the alphabet is scanned from a seeded rotation and
   * the first character whose bigram feature
   * (`TextAnalyzer.positionalBigramDim` — the vectorizer's own +0.75
   * bucket, not a parallel hash) lands in a still-unmet target dim is
   * taken; if none hits, the rotation start char is used. Stops early once
   * every target is met (≙ the reference's hit-and-length break,
   * TokenSynthesizer.cs:61-62).
   */
  def synthesizeLabelForDims(targetDims: Array[Int], rnd: scala.util.Random,
                             dims: Int = TextAnalyzer.DefaultDims): String = {
    val sb = new StringBuilder
    sb.append(SynthAlphabet.charAt(rnd.nextInt(SynthAlphabet.length)))
    val unmet = scala.collection.mutable.Set(targetDims.toIndexedSeq: _*)
    var i = 0
    while (i < 6 && unmet.nonEmpty) {
      val pos = sb.length - 1
      val start = rnd.nextInt(SynthAlphabet.length)
      var pick = SynthAlphabet.charAt(start)
      var t = 0
      var found = false
      while (t < SynthAlphabet.length && !found) {
        val c = SynthAlphabet.charAt((start + t) % SynthAlphabet.length)
        val d = TextAnalyzer.positionalBigramDim(sb.charAt(pos), c, pos, dims)
        if (unmet.contains(d)) { pick = c; unmet -= d; found = true }
        t += 1
      }
      sb.append(pick)
      i += 1
    }
    sb.append(SynthAlphabet.charAt(rnd.nextInt(SynthAlphabet.length)))
    sb.result()
  }

  /**
   * ≙ TokenSynthesizer.Synthesize (TokenSynthesizer.cs:68-78, seed 12345 at
   * :10-14): deterministic dim-targeting labels for negative validation —
   * each label aims at a random 4-7-dim target set, and the resulting
   * strings are (with overwhelming probability) out-of-vocabulary for any
   * real corpus, so `validate` on a corpus of them must fail. Driver-side
   * fixture generator, plain Scala.
   */
  def synthesizeLabels(count: Int, seed: Long = 12345L,
                       dims: Int = TextAnalyzer.DefaultDims): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until count).map { _ =>
      val k = 4 + rnd.nextInt(4)
      val targets = Array.fill(k)(rnd.nextInt(dims))
      // "qzx" never occurs as a substring of natural-language tokens, so the
      // negative-validation fixture is GUARANTEED out-of-vocabulary rather
      // than merely improbable (a bare 3-8-char lowercase label can collide
      // with a real short word). Suffix, not prefix: a prefix would shift
      // every position and undo the dim targeting above; a suffix only adds
      // bigrams after the targeted ones are already met.
      synthesizeLabelForDims(targets, rnd, dims) + "qzx"
    }
  }
}
