package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RowBridge

/**
 * Distributed global ordering index (≙ reference ColumnReader.IndexOf,
 * ColumnReader.cs:64-67 — rank of a key in the sorted key set).
 *
 * A bare `Window.orderBy(key)` funnels every row through one task (Spark
 * even warns "No Partition Defined for Window operation"), which is wrong at
 * any real scale. Instead: range-partition by the key (each partition owns a
 * disjoint, ordered key range), sort within partitions, then zip the global
 * index — `zipWithIndex` counts rows per partition in one job and offsets
 * each partition by the cumulative count.
 *
 * Determinism note: range boundaries come from sampling, so the count pass
 * and the output pass must observe the SAME physical partitioning. Both of
 * zipWithIndex's jobs run against one RDD instance (RowBridge), so the
 * shuffle is materialized once and reused — the earlier persist()-based
 * two-phase rank held the frame cached for the caller's whole lineage and
 * never released it; this holds nothing beyond the shuffle files.
 */
object Ranks {

  /** Append a 0-based global rank-by-`orderCol` column named `idxName`.
    * Input rows must be unique on `orderCol` for the rank to be a stable
    * total order (callers pass key sets). */
  def withOrderedIndex(df: DataFrame, orderCol: String, idxName: String,
                       numPartitions: Int = 0): DataFrame =
    withOrderedIndexBy(df, Seq(orderCol), idxName, numPartitions)

  /** Multi-column variant: rank by the lexicographic order of `orderCols`
    * (rows must be unique on the combination for a stable total order). */
  def withOrderedIndexBy(df: DataFrame, orderCols: Seq[String], idxName: String,
                         numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.head, orderCols.tail: _*)
    RowBridge.zipWithGlobalIndex(parted, idxName)
  }
}
