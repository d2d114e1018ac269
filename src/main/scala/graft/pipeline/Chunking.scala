package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document chunking for retrieval / context-window preprocessing: split
 * each document into overlapping windows of `windowSize` whitespace
 * tokens advancing by `stride` (stride < windowSize ⇒ overlap, the usual
 * RAG shape; stride == windowSize ⇒ disjoint packing windows).
 *
 * Scale design: a pure per-row explode — one tight UDF pass per document
 * emits every (token count, chunk text) window, then `posexplode` numbers
 * them. No shuffle; chunking 100 TB is one map stage whose output can
 * stream straight into a partitioned writer. The kernel is a per-row
 * while-loop, NOT `transform(sequence(...))` with a per-element `slice` —
 * array higher-order lambdas evaluate INTERPRETED per element
 * (ArrayTransform is CodegenFallback; the round-1 shingle / round-6
 * bigram trap, ~100× at sf0.1). Chunk identity is (doc id, chunk_idx) —
 * deterministic, so downstream chunk-level dedup (Dedup.*) and embedding
 * indexes (SimilarityIndex.*) compose on a stable key.
 *
 * Window-count contract (integer arithmetic, reproducible in any engine):
 * n ≤ windowSize ⇒ 1 chunk (an empty doc yields one empty chunk);
 * otherwise ceil((n - windowSize) / stride) + 1, so the last window
 * always reaches the final token. Null text ⇒ null chunk array ⇒ zero
 * output rows (posexplode of null), matching the Column formulation it
 * replaced.
 */
object Chunking {

  /** All windows of one document: (n_tokens, text) per chunk, one pass
    * over the token array with a shared StringBuilder. */
  private def chunkKernel(windowSize: Int, stride: Int) = udf { (s: String) =>
    if (s == null) null
    else {
      val toks = graft.analysis.TextMetrics.wsTokenArr(s)
      val n = toks.length
      val nChunks = if (n <= windowSize) 1 else (n - windowSize + stride - 1) / stride + 1
      val sb = new java.lang.StringBuilder(windowSize * 8)
      Array.tabulate(nChunks) { i =>
        val from = i * stride
        val until = math.min(from + windowSize, n)
        sb.setLength(0)
        var j = from
        while (j < until) {
          if (j > from) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        ((until - from).toLong, sb.toString)
      }
    }
  }

  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    windowSize: Int, stride: Int): DataFrame = {
    require(windowSize > 0 && stride > 0, "windowSize and stride must be positive")
    df.select(col(idCol),
      posexplode(chunkKernel(windowSize, stride)(col(textCol)))
        .as(Seq("chunk_idx", "_chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("_chunk._1").as("n_chunk_tokens"),
        col("_chunk._2").as("chunk_text"))
  }

  /** seg_key packs (doc_id, seg_idx) into one long: doc_id << 20 |
    * seg_idx — 2^20 segments per document, doc ids up to 2^43. Both
    * bounds are GUARDED with raise_error, never silently wrapped (a
    * collided key would corrupt packing/dedup invisibly). */
  val SegIdxBits: Int = 20

  /**
   * Oversized-document segmentation — the whale-splitter packing and
   * budget selection defer to ([[Packing.packByTokenBudget]] isolates a
   * document LONGER than the budget into its own over-budget bin;
   * `Sampling.tokenBudgetSelect` admits or rejects it whole): split every
   * document with more than `maxTokens` whitespace tokens into
   * `maxTokens`-sized pieces advancing by `maxTokens - overlap` (overlap
   * > 0 = the context-continuity convention; the final piece reaches the
   * last token and may be shorter). Documents at or under the limit pass
   * through as their own single segment — segmentation is a no-op
   * exactly when no whale exists.
   *
   * Identity: (idCol, seg_idx) — stable and deterministic — plus
   * `seg_key` = idCol·2^[[SegIdxBits]] + seg_idx, the unique NUMERIC key
   * downstream ordering-sensitive operators need ([[Packing]]'s keyCol,
   * `store.Ranks`): key order = (doc, position) order, so packed streams
   * read documents contiguously. Every other input column travels with
   * the segment (metadata survives the split); `textCol` is REPLACED by
   * the segment text and `n_seg_tokens` carries the recount.
   *
   * Scale shape: one per-row UDF pass + posexplode — pure map, zero
   * shuffle, streams straight into packing's one bounded exchange. The
   * kernel is [[chunkByTokens]]'s (the tight while-loop, not an
   * interpreted HOF); a 10M-token whale costs its own row's work, nothing
   * anyone else's.
   */
  def segmentByTokens(df: DataFrame, idCol: String, textCol: String,
                      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    Seq("seg_idx", "seg_key", "n_seg_tokens", "_seg").foreach { r =>
      require(!df.columns.contains(r),
        s"segmentByTokens reserves the column name $r")
    }
    val stride = maxTokens - overlap
    val others = df.columns.filter(_ != textCol).map(col).toSeq
    val maxDoc = Long.MaxValue >> SegIdxBits
    val segCap = 1L << SegIdxBits
    val exploded = df.select(others :+
      posexplode(chunkKernel(maxTokens, stride)(col(textCol)))
        .as(Seq("seg_idx", "_seg")): _*)
    exploded
      .withColumn("seg_idx", col("seg_idx").cast("long"))
      .withColumn("n_seg_tokens", col("_seg._1"))
      .withColumn(textCol, col("_seg._2"))
      .withColumn("seg_key",
        when(col(idCol) < 0 || col(idCol) > maxDoc, raise_error(concat(
          lit(s"segmentByTokens: $idCol outside [0, $maxDoc] — " +
            "seg_key would overflow: "), col(idCol).cast("string"))))
        .when(col("seg_idx") >= segCap, raise_error(concat(
          lit(s"segmentByTokens: more than $segCap segments in one " +
            "document — seg_key would collide: "), col(idCol).cast("string"))))
        // cast BEFORE the shift: shiftleft on an IntegerType id is a
        // 32-bit shift that wraps silently — exactly the collided-key
        // corruption the guards above exist to prevent
        .otherwise(shiftleft(col(idCol).cast("long"), SegIdxBits) +
          col("seg_idx")))
      .drop("_seg")
  }
}
