package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Byte-pair-encoding merge learning over a corpus — the "train a
 * tokenizer on your data" step of an LLM pipeline, distributed the way
 * the classic trainer (Sennrich et al. 2016) is meant to scale:
 *
 *  - the corpus collapses ONCE into the word-frequency table (the only
 *    corpus-sized aggregation — everything after runs on vocabulary-
 *    sized data, exactly why WordPiece/BPE training is tractable on
 *    100 TB corpora),
 *  - each merge round counts adjacent symbol pairs weighted by word
 *    frequency (all index-adjacent occurrences, the reference
 *    convention), picks the max with an engine-portable tie-break
 *    (count desc, pair ascii asc), and applies the merge as one literal
 *    string replace over the separator-joined symbol column —
 *    left-to-right non-overlapping in Java and SQL alike.
 *
 * Application-rule nuance: the literal replace of "a\u0001b" also
 * rewrites sites where `a` is the SUFFIX of a longer symbol (or `b` a
 * prefix) — e.g. after ('a','b')→'ab', a later ('b','c') merge glues
 * "…ab\u0001c…" into symbol 'abc'. Textbook BPE would match whole
 * symbols only. This variant is deliberate: the codegen'd literal
 * replace IS the scale win, counting stays symbol-true (pairsUdf splits
 * on the separator), learn/encode/tokenizeWord all share the rule, and
 * the DuckDB oracle replays the identical replace — so the contract is
 * self-consistent and cross-engine exact, just not boundary-pure on
 * corpora where merged strings straddle symbol edges.
 *
 * Symbols ride a `\u0001`-joined string (never arrays) so a merge is
 * `replace(sym, "a\u0001b", "ab")` — a codegen'd literal replace, no
 * per-element lambda work. The per-round argmax is a one-row collect
 * (the driver-side routing-constant pattern); rounds run on the
 * vocabulary table, so `numMerges` rounds cost `numMerges` tiny jobs
 * after the single corpus pass.
 *
 * Lineage discipline (real tokenizer training is numMerges ≈ 32k, not
 * 3): the word-frequency table is MATERIALIZED once before the round
 * loop — without that, round k's lazy plan re-executes the corpus
 * aggregation plus all k−1 prior replaces, i.e. numMerges+1 corpus
 * passes — and the symbol column is re-checkpointed every
 * [[CheckpointInterval]] rounds with the superseded round's blocks
 * released eagerly (the connectedComponents precedent in
 * [[graft.dedup.Dedup]]), so plan depth and executor storage stay
 * bounded no matter how many merges are learned. Reliable
 * `checkpoint()` is used when the caller configured a checkpoint dir
 * (do so on a real cluster); `localCheckpoint()` otherwise.
 */
object Bpe {

  /** Symbol separator inside the joined representation — U+0001 cannot
    * occur in [[Dedup.normalized]] output (lowercase alnum + space). */
  val Sep = "\u0001"

  /** One learned merge: step (1-based), the two symbols, their
    * concatenation, and the frequency-weighted pair count. */
  final case class Merge(step: Int, sym_a: String, sym_b: String,
                         merged: String, cnt: Long)

  /** Word-frequency table of a corpus under the engine's canonical
    * normalization: (word, freq), empty words dropped. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(Dedup.normalized(col(textCol)).as("_nt"))
      .filter(length(col("_nt")) > 0)
      .select(explode(split(col("_nt"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Characters joined by [[Sep]]: "abc" → "a\u0001b\u0001c". */
  private val charJoinUdf: UserDefinedFunction = udf { (w: String) =>
    if (w == null) null
    else {
      val sb = new java.lang.StringBuilder(w.length * 2)
      var i = 0
      while (i < w.length) {
        if (i > 0) sb.append('\u0001')
        sb.append(w.charAt(i))
        i += 1
      }
      sb.toString
    }
  }

  /** All adjacent symbol pairs of a joined representation, one entry per
    * index-adjacent occurrence (overlaps included — the counting
    * convention; application is left-to-right non-overlapping). */
  private val pairsUdf: UserDefinedFunction = udf { (sym: String) =>
    if (sym == null) Array.empty[String]
    else {
      val parts = sym.split('\u0001')
      if (parts.length < 2) Array.empty[String]
      else Array.tabulate(parts.length - 1)(i =>
        parts(i) + "\u0001" + parts(i + 1))
    }
  }

  /**
   * Learn `numMerges` BPE merges from a (word, freq) table. Returns the
   * merge table in application order. Stops early when no pair occurs
   * twice (a merge that fires once is noise, and DuckDB's LIMIT-1 oracle
   * would tie-break among count-1 pairs meaninglessly).
   */
  /** Rounds between symbol-column re-checkpoints: each round's job pays
    * at most this many stacked literal replaces over the last
    * materialization, and executor storage holds at most two round
    * states (current + the one being superseded) at any instant. */
  val CheckpointInterval = 8

  /**
   * Learn merges, optionally MANY per counting round (`maxBatch` > 1) —
   * the batching that makes 32k-merge tokenizer training a few hundred
   * Spark jobs instead of 32k. Per round, the top pairs are fetched once
   * and a SAFE batch is selected driver-side; safety here means the
   * batched merge sequence is PROVABLY identical to one-at-a-time BPE
   * (spec-pinned batched == sequential, incl. randomized corpora), by
   * two rules over the (cnt desc, pair asc)-sorted fetch:
   *
   *  1. select a PREFIX of non-interacting pairs, stopping at the first
   *     candidate whose symbols OR whose concatenation a+b touches the
   *     blocked set — the symbols AND the concatenations of every
   *     earlier selection. Symbol-disjointness keeps selected counts
   *     unchanged by each other; blocking concatenations both ways
   *     matters because a merge (a,b) can BOOST a pre-existing pair
   *     whose member symbol IS the string ab (every (ab,y) adjacency it
   *     creates adds to that pair's count) — and any such pair sorting
   *     before the stop would either be selected (then a+b ∈ blocked
   *     stops (a,b) itself) or stop the prefix, so every boostable pair
   *     sorts AFTER the stop point;
   *  2. keep only selections with cnt STRICTLY above 3 × the stop
   *     point's count (`cStop`). A non-kept pair's post-batch count is
   *     bounded by original (≤ cStop, rule 1) + one boost per side, and
   *     each boost is capped by a neighbor pair's count — every created
   *     (x,ab) occurrence was an (x,a) adjacency, and neighbor pairs
   *     share a symbol with a selection so they too sort after the stop
   *     (≤ cStop each) — hence ≤ 3·cStop < cnt(kept), ties impossible.
   *
   * When rule 2 empties the batch (counts too flat to dominate the
   * unknown region), the round falls back to the plain argmax — exactly
   * the sequential step, so flat-count regions degrade to classic BPE
   * instead of risking order drift. `maxBatch = 1` IS the classic loop.
   */
  def learnMerges(words: DataFrame, numMerges: Int,
                  maxBatch: Int = 1): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be at least 1")
    require(maxBatch >= 1, "maxBatch must be at least 1")
    val sc = words.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    // The ONE corpus pass: word frequencies (plus the char join)
    // materialize before the loop, so every round after runs on the
    // vocabulary-sized table — never back through the corpus scan.
    var syms = materialize(words.select(col("freq"),
      charJoinUdf(col("word")).as("sym")))
    var sinceCheckpoint = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // fetch headroom beyond maxBatch so the stop point is usually
      // observed inside the fetch (otherwise the last row's count is the
      // conservative cStop) — still a driver-tiny routing-constant list
      val fetchK = if (maxBatch == 1) 1 else maxBatch * 4
      val top = syms
        .select(col("freq"), explode(pairsUdf(col("sym"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(fetchK)
        .collect()
      if (top.isEmpty || top.head.getLong(1) < 2L) done = true
      else {
        val blocked = scala.collection.mutable.Set.empty[String]
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var cStop = -1L
        var i = 0
        while (i < top.length && cStop < 0L) {
          val pair = top(i).getString(0)
          val cnt = top(i).getLong(1)
          val Array(a, b) = pair.split('\u0001')
          if (cnt < 2L) cStop = 1L // below the merge floor: known region ends
          else if (selected.length >= maxBatch ||
              blocked(a) || blocked(b) || blocked(a + b))
            cStop = cnt
          else {
            selected += ((pair, cnt))
            blocked += a; blocked += b; blocked += (a + b)
            i += 1
          }
        }
        if (cStop < 0L)
          cStop = if (top.length < fetchK) 1L else top.last.getLong(1)
        var batch = selected.takeWhile(_._2 > 3L * cStop).toSeq
        if (batch.isEmpty)
          batch = Seq((top.head.getString(0), top.head.getLong(1)))
        batch = batch.take(numMerges - step + 1)
        batch.foreach { case (pair, cnt) =>
          val Array(a, b) = pair.split('\u0001')
          out += Merge(step, a, b, a + b, cnt)
          syms = syms.withColumn("sym",
            replace(col("sym"), lit(pair), lit(a + b)))
          step += 1
        }
        sinceCheckpoint += batch.length
        if (sinceCheckpoint >= CheckpointInterval) {
          val next = materialize(syms)
          Dedup.release(syms) // superseded round's blocks, eagerly
          syms = next
          sinceCheckpoint = 0
        }
      }
    }
    Dedup.release(syms) // the result is driver-side; free the last round
    out.toSeq
  }

  /** The learned merge table as a DataFrame — the query-surface form. */
  def learnMergesDf(spark: SparkSession, docs: DataFrame, textCol: String,
                    numMerges: Int, maxBatch: Int = 1): DataFrame = {
    import spark.implicits._
    learnMerges(wordFrequencies(docs, textCol), numMerges, maxBatch)
      .toDF("step", "sym_a", "sym_b", "merged", "cnt")
  }

  /** Apply a learned merge table to tokenize one word — the inference
    * side, for specs and spot checks (same left-to-right replace rule). */
  def tokenizeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var sym = word.toCharArray.mkString(Sep)
    merges.foreach { m => sym = sym.replace(m.sym_a + Sep + m.sym_b, m.merged) }
    if (sym.isEmpty) Seq.empty else sym.split('\u0001').toSeq
  }

  /** Per-task word→tokens memo bound: corpora repeat words heavily, so
    * encoding each DISTINCT word once per task is the whole win; the cap
    * keeps a pathological vocabulary from growing executor state. */
  private val EncodeCacheCap = 1 << 16

  /**
   * Distributed BPE ENCODE — apply a learned merge table to a corpus:
   * each document becomes its token sequence (document order preserved).
   * The inference side of [[learnMerges]], same left-to-right
   * non-overlapping replace rule, so `encode ∘ learn` round-trips
   * exactly (a word that became one symbol during training encodes to
   * that symbol).
   *
   * Scale shape: ONE tight per-row UDF pass — the merge table rides the
   * task closure (vocabulary-sized, tiny), words memoize per task (see
   * [[EncodeCacheCap]]), no shuffle, no per-element higher-order
   * functions; the projection fuses into the scan. Encoding 100 TB is
   * embarrassingly parallel.
   */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val ms = merges.sortBy(_.step)
      .map(m => (m.sym_a + Sep + m.sym_b, m.merged)).toArray
    val cache = new java.util.HashMap[String, Array[String]]()
    val encUdf = udf { (text: String) =>
      def encWord(w: String): Array[String] = {
        var toks = cache.get(w)
        if (toks == null) {
          var sym = w.toCharArray.mkString(Sep)
          var i = 0
          while (i < ms.length) {
            sym = sym.replace(ms(i)._1, ms(i)._2)
            i += 1
          }
          toks = sym.split('\u0001')
          if (cache.size >= EncodeCacheCap) cache.clear()
          cache.put(w, toks)
        }
        toks
      }
      val words = Dedup.normalizeTokens(text)
      val out = new scala.collection.mutable.ArrayBuffer[String](words.length)
      words.foreach { w => if (w.nonEmpty) out ++= encWord(w) }
      out.toArray
    }
    docs.select(col(idCol), encUdf(col(textCol)).as("tokens"))
  }
}
