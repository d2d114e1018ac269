package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Feature-hashed TF-IDF document vectors — the classical-ML featurizer
 * (hashing trick, Weinberger et al. 2009): terms hash into a fixed
 * `dims`-dimensional space, weights are tf·idf with colliding terms
 * summed, vectors L2-normalized. The sparse (doc, dim, weight) output
 * feeds linear models directly and composes with the engine's ANN stack
 * (cosine of L2-normalized vectors = dot product).
 *
 * Engine-portable by construction, so the full weight matrix
 * hash-checks cross-engine:
 *  - the dimension hash is the first 8 hex chars of md5 — md5 is
 *    everywhere, and hex→int is one portable cast (no xxhash64 in SQL
 *    engines),
 *  - idf is the log-free RSJ ratio (N − df + 0.5)/(df + 0.5) (the
 *    [[graft.index.Bm25]] contract — monotone like log-idf, but every
 *    op correctly rounded),
 *  - collision sums and the norm's Σw² route through DECIMAL(28,10) so
 *    summation order cannot matter; the per-weight normalization is one
 *    correctly-rounded division by one sqrt.
 *
 * Scale shape: tf is one (doc, term) aggregation; df joins on term
 * (vocabulary-sized right side — AQE handles the skewless hash join);
 * the collision sum and norm group on (doc, dim) / doc. No window, no
 * driver action — N rides a broadcast one-row aggregate.
 */
object Featurize {

  /** Sparse hashed TF-IDF vectors: (idCol, dim, weight), L2-normalized
    * per document; docs with no tokens yield no rows. */
  def hashedTfidf(docs: DataFrame, idCol: String, textCol: String,
                  dims: Int): DataFrame = {
    require(dims >= 2, "dims must be at least 2")
    val tokUdf = udf { (s: String) => Dedup.normalizeTokens(s) }
    val tokens = docs
      .select(col(idCol), explode(tokUdf(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tokens.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n1 = broadcast(tf.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("_n")))
    val dim = pmod(conv(substring(md5(col("term")), 1, 8), 16, 10)
      .cast("long"), lit(dims.toLong))
    val idf = (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val w = tf.join(dfT, "term").crossJoin(n1)
      .select(col(idCol), dim.as("dim"),
        (col("tf") * idf).as("_w"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("_w").cast("decimal(28,10)")).cast("double").as("_wr"))
    val norms = w.groupBy(col(idCol))
      .agg(sqrt(sum((col("_wr") * col("_wr")).cast("decimal(28,10)"))
        .cast("double")).as("_nv"))
    w.join(norms, idCol)
      .select(col(idCol), col("dim"), (col("_wr") / col("_nv")).as("weight"))
  }
}
