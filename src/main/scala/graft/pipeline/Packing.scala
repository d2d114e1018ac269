package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for pretraining pipelines: assign documents to
 * fixed-token-budget bins (the "pack short documents into 4k-token rows"
 * step), as a declarative plan.
 *
 * Semantics are concat-then-chunk: within a (stratum, shard) stream the
 * documents are laid end-to-end in key order and the stream is cut every
 * `tokenBudget` tokens; a document belongs to the bin where it STARTS
 * (bin = floor(cumsum_before / budget)), so a straddling document may push
 * its bin past the budget by less than its own length — the convention
 * that keeps every bin a contiguous segment and no document dropped or
 * reordered (oversized documents get isolated bins; segmentation happens
 * downstream). Made distributed by sharding:
 *
 *  - The window partitions by (stratum, shard), NEVER globally — each
 *    window holds |stratum|/nShards docs, so no single task funnels the
 *    corpus. A global `Window.orderBy` would serialize 100 TB through one
 *    task — the exact funnel the top-k paths also ban.
 *  - `shard = key mod nShards` is deterministic, so bin ids are stable
 *    across retries/engines (oracle-checkable in DuckDB with the same
 *    window SQL).
 *  - Bin ids are globally unique via (stratum, shard, bin) — callers
 *    group by that triple to materialize packed rows.
 */
object Packing {

  /**
   * @param df          input frame
   * @param keyCol      unique numeric row key (orders docs within a shard)
   * @param tokensCol   per-row token count
   * @param stratumCol  grouping column packs never cross (e.g. language)
   * @param tokenBudget bin capacity in tokens
   * @param nShards     parallel packing streams per stratum
   * @return input columns + (shard, bin) — bin local to (stratum, shard)
   */
  def packByTokenBudget(df: DataFrame, keyCol: String, tokensCol: String,
                        stratumCol: String, tokenBudget: Long,
                        nShards: Int = 64): DataFrame = {
    val cumWindow = Window
      .partitionBy(col(stratumCol), col("shard"))
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(keyCol), lit(nShards.toLong)))
      .withColumn("_cum", sum(col(tokensCol)).over(cumWindow))
      // integral `div`, not double-divide-then-cast: DuckDB's oracle uses
      // `//`, and double rounding can flip a bin at a boundary once the
      // cumulative sum exceeds ~2^53/budget — `div` is exact for all longs
      .withColumn("_start", col("_cum") - col(tokensCol))
      .withColumn("bin", expr(s"_start div ${tokenBudget}L"))
      .drop("_cum", "_start")
  }

  /**
   * The packing last mile: materialize each (stratum, shard, bin) as ONE
   * training row — member documents laid end-to-end in key order, joined
   * with `sep` (the document-separator token of the downstream
   * tokenizer). Composes [[packByTokenBudget]] with a single hash
   * aggregation.
   *
   * Scale shape: aggregation state per group is BIN-BOUNDED — a bin
   * holds at most `tokenBudget` tokens plus one straddling document, so
   * no group can accumulate a corpus-sized buffer (contrast a naive
   * group-by-stratum concat, where one stratum is the corpus). The sort
   * inside each bin is an `array_sort` over that bounded member list,
   * never a window. Output: (stratumCol, shard, bin, n_docs, n_tokens,
   * text), one row per bin.
   */
  def assemblePacked(df: DataFrame, keyCol: String, textCol: String,
                     tokensCol: String, stratumCol: String,
                     tokenBudget: Long, nShards: Int = 64,
                     sep: String = "\n\n"): DataFrame = {
    val binned = packByTokenBudget(df, keyCol, tokensCol, stratumCol,
      tokenBudget, nShards)
    binned.groupBy(col(stratumCol), col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        // struct sort orders by the leading unique key, so the concat
        // order is the packing order regardless of shuffle arrival
        array_join(transform(
          array_sort(collect_list(struct(col(keyCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("text"))
  }
}
