package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document chunking for retrieval / context-window preprocessing: split
 * each document into overlapping windows of `windowSize` whitespace
 * tokens advancing by `stride` (stride < windowSize ⇒ overlap, the usual
 * RAG shape; stride == windowSize ⇒ disjoint packing windows).
 *
 * Scale design: a pure per-row explode — tokenize, compute the window
 * count arithmetically, `posexplode` the slices. No shuffle, no UDF; the
 * whole operator fuses into the scan projection, so chunking 100 TB is
 * one map stage whose output can stream straight into a partitioned
 * writer. Chunk identity is (doc id, chunk_idx) — deterministic, so
 * downstream chunk-level dedup (Dedup.*) and embedding indexes
 * (SimilarityIndex.*) compose on a stable key.
 *
 * Window-count contract (integer arithmetic, reproducible in any engine):
 * n ≤ windowSize ⇒ 1 chunk (an empty doc yields one empty chunk);
 * otherwise ceil((n - windowSize) / stride) + 1, so the last window
 * always reaches the final token.
 */
object Chunking {

  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    windowSize: Int, stride: Int): DataFrame = {
    require(windowSize > 0 && stride > 0, "windowSize and stride must be positive")
    val toks = graft.analysis.TextMetrics.wsTokens(col(textCol))
    val n = size(toks)
    // integer ceil((n - w)/s) + 1 via (n - w + s - 1) div s + 1
    val nChunks = when(n <= windowSize, lit(1L)).otherwise(
      floor((n - windowSize + stride - 1) / lit(stride.toDouble)).cast("long") + 1L)
    df.select(col(idCol), toks.as("_toks"), nChunks.as("_n_chunks"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), col("_n_chunks") - 1L),
          i => slice(col("_toks"), (i * stride).cast("int") + 1, lit(windowSize))))
          .as(Seq("chunk_idx", "chunk_tokens")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk_tokens")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk_tokens"), " ").as("chunk_text"))
  }
}
