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
}
