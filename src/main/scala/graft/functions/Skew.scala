package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Manual skew-mitigation primitives for joins whose hot keys overwhelm a
 * single reducer at scale. AQE's skew-join split handles most cases at
 * runtime; these are the explicit form for when the skew is known up front
 * (e.g. a boilerplate shingle shared by millions of documents) or when AQE
 * is unavailable (streaming joins, RDD-bridged stages).
 *
 * Shape: the big side gets a pseudo-random salt in [0, salts); the small
 * side is replicated once per salt value; the equi-join key becomes
 * (key, salt), spreading each hot key across `salts` reducers. Join output
 * is identical to the unsalted join (the salt is internal), so correctness
 * is checkable by equality — see SkewSpec.
 */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `salts` reducers. `small` is replicated `salts`× — keep it
    * the dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already carry a _salt column — rename it before saltedJoin")
    // deterministic per-row salt: hash of partition+offset spreads rows
    // uniformly without an RNG (output is salt-invariant either way)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for hot grouping keys: partial-aggregate on
    * (key, salt), then final on key. Only pays off for non-algebraic
    * aggregates (e.g. collect_list caps) or extreme single-key skew —
    * hash aggregation already map-side combines sums/counts. */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     salts: Int = 16): DataFrame = {
    // only _salt is hazardous (withColumn silently replaces it); _n/_s are
    // born in the first agg whose output namespace excludes input columns
    require(!df.columns.contains("_salt"),
      "input already carries a _salt column — rename it before saltedCountSum")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    salted.groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$valueCol"))
  }
}
