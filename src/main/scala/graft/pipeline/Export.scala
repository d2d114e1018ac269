package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sharded training-data export — the write-side last mile after packing
 * and mixing: training jobs consume fixed-size shards in a globally
 * shuffled order (every epoch reader and resume-from-step offset assumes
 * a stable, reproducible shard layout), so the assignment must be
 * DETERMINISTIC across runs, engines, and partitionings.
 *
 * Assignment = the [[Sampling.globalShuffleOrder]] permutation (Knuth-hash
 * coordinate, then key — the training-order rank that already backs
 * `doc_global_shuffle`) chopped into `rowsPerShard` chunks:
 *
 *   shard = pos div rowsPerShard,   pos_in_shard = pos mod rowsPerShard
 *
 * — integer arithmetic on an exact rank, so the layout reproduces
 * bit-for-bit anywhere. The rank is the range-partitioned two-phase rank
 * (one shuffle, no global window funnel).
 *
 * [[writeShards]] lands `shard=N` partition dirs plus a `manifest/`
 * table (per-shard row count and exact BIGINT sums of any requested
 * signal columns, e.g. token counts) — readers size epochs and seek
 * without listing data files. One extra exchange keyed by shard
 * (bounded by rowsPerShard per task) clusters each shard into one file.
 */
object Export {

  /** Deterministic shard assignment: `(input columns…, shard,
    * pos_in_shard)`. */
  def assignShards(df: DataFrame, keyCol: String,
                   rowsPerShard: Long): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    require(!df.columns.contains("_ex_pos"),
      "assignShards reserves the internal column name _ex_pos")
    Sampling.globalShuffleOrder(df, keyCol, "_ex_pos")
      .withColumn("shard", expr(s"_ex_pos div $rowsPerShard"))
      .withColumn("pos_in_shard", col("_ex_pos") % rowsPerShard)
      .drop("_ex_pos")
  }

  /**
   * Write `shard=N` parquet dirs (one file per shard — the training-reader
   * contract) and the `manifest/` sidecar. Returns the shard count.
   *
   * The manifest derives from a RE-READ of the just-written data — by
   * design, a write AUDIT: it manifests what actually landed, so a lost
   * task file or a partial write can never ship a manifest that
   * over-promises rows to the training reader. The audit is NOT a second
   * full scan: the projection below is `shard` (a partition column —
   * zero data bytes) plus the signal columns only, so parquet column
   * pruning reads a few longs per row (with no signal columns, just the
   * row-count metadata path) — a sliver of the corpus bytes, paid once,
   * page-cache-warm right after the write.
   */
  def writeShards(df: DataFrame, keyCol: String, out: String,
                  rowsPerShard: Long,
                  signalCols: Seq[String] = Nil): Long = {
    val assigned = assignShards(df, keyCol, rowsPerShard)
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pos_in_shard")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$out/data")
    val aggs = count(lit(1)).as("n_rows") +:
      signalCols.map(c => sum(col(c).cast("long")).as(s"sum_$c"))
    val spark = df.sparkSession
    val manifest = spark.read.parquet(s"$out/data")
      .select((col("shard") +: signalCols.map(col)): _*) // structural prune
      .groupBy("shard").agg(aggs.head, aggs.tail: _*)
    manifest.repartition(1).write.mode("overwrite").parquet(s"$out/manifest")
    spark.read.parquet(s"$out/manifest").count()
  }

  /** Read one shard back in its written order (partition-pruned by the
    * `shard=` dir; the in-shard sort is the written row order). */
  def readShard(spark: SparkSession, out: String, shard: Long): DataFrame =
    spark.read.parquet(s"$out/data")
      .filter(col("shard") === shard)
      .orderBy("pos_in_shard")
}
