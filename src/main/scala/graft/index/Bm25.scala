package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TopK

/**
 * BM25 lexical relevance scoring — the classic term-based ranking
 * companion to the vector paths in [[SimilarityIndex]] (the reference
 * ranks by vector cosine only; lexical top-k is the extension a search
 * user expects next to it).
 *
 * Scoring uses the log-free Robertson–Spärck-Jones idf variant
 *
 *   idf(t)  = (N - df_t + 0.5) / (df_t + 0.5)
 *   s(q, d) = Σ_{t ∈ q} idf(t) · (tf · (k1+1)) / (tf + k1·(1-b+b·dl/avgdl))
 *
 * deliberately: every operation is +, -, ×, ÷ on IEEE doubles — all
 * correctly rounded — and k1 = 1.25 / b = 0.75 are exact binary
 * fractions, so the same formula computes BIT-IDENTICAL scores on any
 * engine (a `log` differs by ±1 ulp across libm implementations, which
 * would silently break cross-engine reproducibility of a ranking; the
 * RSJ ratio is monotone in df exactly like its log, so rankings match
 * classic BM25 per term). Per-(query, doc) term scores are summed
 * through DECIMAL so summation order cannot matter.
 *
 * Scale shape: postings = one (doc, term) aggregation of the corpus
 * (one shuffle). Queries are an interactive probe set: their distinct
 * terms BROADCAST to the postings scan, per-query-term df broadcasts
 * back, so the corpus-sized posting list is never shuffled by a search;
 * the only post-scan exchanges move (query, doc) hit rows — bounded by
 * docs actually containing query terms — into the decimal sum and the
 * bounded [[TopK.topKPerGroup]] aggregation (never a window funnel).
 * Tokenization is [[Dedup.normalized]], the engine's one canonical
 * normalization, so dedup and search agree on what a term is.
 */
object Bm25 {

  /** k1 and b as EXACT binary fractions — part of the cross-engine
    * bit-parity contract, do not "tune" to inexact decimals. */
  val K1 = 1.25
  val B = 0.75

  /** Posting list (doc_id, term, tf, dl) over normalized tokens; docs
    * normalizing to nothing carry no postings (they can never match). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), Dedup.normalized(col(textCol)).as("_nt"))
      .filter(length(col("_nt")) > 0)
      .select(col("doc_id"), split(col("_nt"), " ").as("_w"))
    base
      .select(col("doc_id"), size(col("_w")).cast("long").as("dl"),
        explode(col("_w")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /**
   * Persist a BM25 index (the lexical sibling of `ivfBuild`):
   *  - `postings/` — (term, doc_id, tf, dl)
   *  - `terms/`    — (term, df_t), the per-term document frequency, so a
   *    search never re-aggregates the corpus for df
   *  - `stats/`    — one row (n, sdl): corpus doc count and total token
   *    count as EXACT integers (avgdl is derived by one double division
   *    at search time — identical in any engine)
   * Each table derives from the postings parquet just written — disk
   * materialization, no memory persist, any corpus size (the
   * minhashIndexBuild pattern).
   */
  def bm25IndexBuild(docs: DataFrame, path: String,
                     idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    postings(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/postings")
    val post = spark.read.parquet(s"$path/postings")
    post.groupBy("term").agg(count(lit(1)).as("df_t"))
      .write.mode("overwrite").parquet(s"$path/terms")
    post.groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /**
   * Search a persisted [[bm25IndexBuild]] index: query terms broadcast
   * into the postings and terms scans (the corpus-sized tables are read
   * map-side, never shuffled by a search); the only exchanges move
   * (query, doc) hit rows into the decimal sum and the bounded top-k.
   */
  def bm25SearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, k: Int,
                        queryId: String = "query_id",
                        queryText: String = "qtext"): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats").head()
    // sum over zero postings is SQL null — an empty index must search
    // to an empty result, not an NPE
    val nDocs = stats.getLong(0)
    val sumDl = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val qTerms = queryTerms(queries, queryId, queryText)
    val dfq = spark.read.parquet(s"$path/terms")
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"))
    score(spark.read.parquet(s"$path/postings"), qTerms, dfq, nDocs, sumDl, k)
  }

  /**
   * Ad-hoc (index-free) top-k BM25: (query_id, doc_id, score, rank),
   * rank 1 = best, ties broken by doc_id ascending (engine-portable).
   * The posting aggregation is computed ONCE (localCheckpoint) and feeds
   * stats, df, and scoring; blocks release with the result
   * (ContextCleaner / [[Dedup.release]]). For corpora beyond block
   * storage — or any search-more-than-once use — build a persisted index
   * with [[bm25IndexBuild]] instead.
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               queryId: String = "query_id", queryText: String = "qtext"): DataFrame = {
    val post = postings(docs, idCol, textCol).localCheckpoint()
    val head = post.groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("sdl")).head()
    val sumDl = if (head.isNullAt(1)) 0L else head.getLong(1)
    val qTerms = queryTerms(queries, queryId, queryText)
    val dfq = post
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df_t"))
    score(post, qTerms, dfq, head.getLong(0), sumDl, k)
  }

  /** Distinct normalized (query_id, term) pairs. */
  private def queryTerms(queries: DataFrame, queryId: String,
                         queryText: String): DataFrame =
    queries
      .select(col(queryId).as("query_id"),
        Dedup.normalized(col(queryText)).as("_nt"))
      .filter(length(col("_nt")) > 0)
      .select(col("query_id"), explode(split(col("_nt"), " ")).as("term"))
      .distinct()

  /** The shared scoring tail. Every arithmetic step mirrors the oracle
    * SQL token-for-token:
    *   avgdl = sdl / n                            (one double division)
    *   idf   = (N - df + 0.5) / (df + 0.5)
    *   norm  = 0.25 + 0.75 * dl / avgdl           (1 - b + b·dl/avgdl)
    *   ts    = idf * (tf * 2.25) / (tf + 1.25 * norm)
    */
  private def score(post: DataFrame, qTerms: DataFrame, dfq: DataFrame,
                    nDocs: Long, sumDl: Long, k: Int): DataFrame = {
    val avgdl = sumDl.toDouble / nDocs
    val idf = (lit(nDocs) - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))
    val norm = lit(0.25) + lit(0.75) * col("dl").cast("double") / lit(avgdl)
    val ts = idf * (col("tf") * lit(2.25)) / (col("tf") + lit(1.25) * norm)
    val scored = post
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .withColumn("_ts", ts)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_ts").cast("decimal(28,10)")).as("_sd"))
      .select(col("query_id"), col("doc_id"), col("_sd").cast("double").as("score"))
    TopK.topKPerGroup(scored, "query_id", "doc_id", "score", k)
  }
}
