package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / corpus mixing for training-data pipelines.
 *
 * Everything here is RNG-free: membership is a pure function of the row key
 * via a Knuth multiplicative hash over the low 32 bits. That buys three
 * properties `df.sample`/`sampleBy` cannot give at 100 TB:
 *
 *  - reproducible across engines (the same arithmetic runs in DuckDB SQL,
 *    so sampled outputs are oracle-checkable row-for-row),
 *  - reproducible across retries/partitionings (no per-partition RNG state —
 *    a recomputed task samples identical rows, so downstream caches and
 *    shuffle retries stay consistent),
 *  - composable: train/val splits are complements by construction; mixing
 *    weights can be re-tuned without re-shuffling anything (pure map, the
 *    filter fuses into the scan).
 *
 * The hash: h(k) = (((k mod 2^31) * 2654435761) mod 2^32) / 2^32 ∈ [0,1),
 * Knuth's golden-ratio multiplier over the 31-bit-folded key — well-
 * distributed on sequential ids, and exact in BIGINT arithmetic for ANY
 * 64-bit key: the fold keeps the product < 2^63, so no engine ever
 * overflows (Spark would wrap silently, DuckDB would raise — either way
 * the cross-engine row-for-row guarantee would break exactly when ids
 * grow past 32 bits; folding INSIDE the hash makes that impossible).
 */
object Sampling {

  private val KnuthMult = 2654435761L
  private val Mod32 = 4294967296L  // 2^32
  private val Fold31 = 2147483648L // 2^31

  /** h(key) scaled to [0, 2^32): the sampling coordinate. The key is
    * pre-folded to 31 bits inside the hash (pmod, so negative keys fold
    * non-negative too): (2^31-1) * 2654435761 < 2^63, overflow-free for
    * any Long key in any BIGINT engine. SQL mirror:
    * `((key % 2147483648) * 2654435761) % 4294967296` (non-negative keys). */
  def hashCoord(key: Column): Column =
    pmod(pmod(key, lit(Fold31)) * lit(KnuthMult), lit(Mod32))

  /** Keep rows whose hash coordinate falls below `fraction` — a
    * deterministic Bernoulli sample. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashCoord(col(keyCol)) < lit((fraction * Mod32).toLong))

  /**
   * Weighted corpus mixing: per-stratum sampling fractions (e.g. language →
   * weight), one declarative filter — `when` chains on the stratum column,
   * so the whole mix is a single scan with the predicate pushed down; no
   * shuffle, no RNG, no driver loop. Strata absent from `weights` are
   * dropped (weight 0).
   */
  def mixByWeights(df: DataFrame, stratumCol: String, keyCol: String,
                   weights: Map[String, Double]): DataFrame = {
    val threshold = weights.foldLeft(lit(0L)) { case (acc, (stratum, w)) =>
      when(col(stratumCol) === stratum, lit((w * Mod32).toLong)).otherwise(acc)
    }
    df.filter(hashCoord(col(keyCol)) < threshold)
  }

  /**
   * Deterministic train/validation split: complement partitions of the same
   * hash coordinate, so union(train, val) == corpus and train ∩ val == ∅ by
   * construction — across any retry, partitioning, or engine.
   */
  def trainValSplit(df: DataFrame, keyCol: String,
                    valFraction: Double): (DataFrame, DataFrame) = {
    val cut = lit((valFraction * Mod32).toLong)
    (df.filter(hashCoord(col(keyCol)) >= cut),
      df.filter(hashCoord(col(keyCol)) < cut))
  }

  /**
   * Deterministic global shuffle for training order: rank rows by their
   * hash coordinate (tie-broken by the key itself, so the order is total
   * even where the 32-bit coordinate collides) and assign the 0-based
   * position. A training run that reads shards in position order sees a
   * reproducible permutation of the corpus — same across engines, retries
   * and repartitionings, with no RNG state.
   *
   * Scale shape: range-partition on (coordinate, key) + per-partition sort
   * + cumulative-count offset (graft.store.Ranks) — never a global
   * single-task window funnel.
   */
  def globalShuffleOrder(df: DataFrame, keyCol: String,
                         posName: String = "pos"): DataFrame = {
    require(!df.columns.contains("_shuffle_coord"),
      "globalShuffleOrder reserves the internal column name _shuffle_coord")
    graft.store.Ranks.withOrderedIndexBy(
      df.withColumn("_shuffle_coord", hashCoord(col(keyCol))),
      Seq("_shuffle_coord", keyCol), posName)
      .drop("_shuffle_coord")
  }
}
