package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine any
 * number of per-query rankings — lexical ([[graft.index.Bm25]]), vector
 * ([[graft.index.SimilarityIndex]] top-k), static priors — into one
 * list by summing 1/(k0 + rank) per (query, doc). Fusing on RANKS, not
 * scores, is the point: the inputs need no score calibration, which is
 * why RRF is the default hybrid-retrieval combiner.
 *
 * Cross-engine parity by construction: ranks are integers, each
 * contribution is ONE correctly-rounded double division, and
 * contributions sum through DECIMAL so order cannot matter — the fused
 * ranking hash-compares bit-for-bit on any engine (mirror the SQL as
 * `CAST(1.0 AS DOUBLE) / (k0 + rank)`; a bare `1.0 / ...` is DECIMAL
 * division in DuckDB, a different number).
 *
 * Scale shape: input rankings are already top-k-bounded (≤ |queries|·k
 * rows each), so the union + one hash aggregation + bounded
 * [[TopK.topKPerGroup]] re-rank all run on probe-sized data — never a
 * window, never corpus-sized.
 */
object RankFusion {

  /**
   * @param rankings frames of (queryId, idCol, ..., rank) — `rank`
   *        1-based as [[TopK.topKPerGroup]] emits; extra columns ignored
   * @param k  fused list size per query
   * @param k0 the RRF damping constant (60 in the original paper)
   */
  def rrf(rankings: Seq[DataFrame], k: Int, k0: Int = 60,
          queryId: String = "query_id", idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k0 >= 0, "k0 must be non-negative")
    val contribs = rankings.map(
      _.select(col(queryId), col(idCol),
        (lit(1.0) / (lit(k0) + col("rank"))).as("_c")))
    val scored = contribs.reduce(_ unionByName _)
      .groupBy(col(queryId), col(idCol))
      .agg(sum(col("_c").cast("decimal(28,12)")).as("_s"))
      .select(col(queryId), col(idCol), col("_s").cast("double").as("score"))
    TopK.topKPerGroup(scored, queryId, idCol, "score", k)
  }
}
