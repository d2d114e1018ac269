package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet-backed keyed column with set semantics — the reference's storage
 * layer (kreeben/resin `Resin.KeyValue`) re-expressed Spark-first.
 *
 * Capability map (SURVEY.md §2.1):
 *  - tryPutAll    ≙ ColumnWriter.TryPut (ColumnWriter.cs:14-27): insert iff
 *    key absent column-wide (dedup insert, first writer wins).
 *  - putOrAppend  ≙ ColumnWriter.PutOrAppend (ColumnWriter.cs:29-70): values
 *    for an existing key are appended, preserving insertion order across
 *    sessions (≙ linked-node chains, LinkedAddress.cs:5-13).
 *  - get          ≙ ColumnReader.Get + ConcatenateMany (ColumnReader.cs:18-38,
 *    93-129): all values for a key in insertion order.
 *  - getMany      ≙ ColumnReader.GetMany (ColumnReader.cs:40-62).
 *  - keys         ≙ ReadOperations.ReadSortedSetOfAllKeysInColumn
 *    (ReadOperations.cs:7-28).
 *  - keyExists    ≙ ReadOperations.KeyExists (ReadOperations.cs:40-44).
 *  - indexOf      ≙ ColumnReader.IndexOf (ColumnReader.cs:64-67).
 *  - truncate     ≙ StreamFactory.Truncate (StreamFactory.cs:19-27).
 *
 * Physical layout: one parquet dir per column, rows `(key, batch, seq,
 * value)`, range-partitioned and sorted by key at rest. Parquet row-group
 * min/max stats on the sorted key give data-skipping point lookups (the
 * Spark analog of the reference's sorted `.key` pages + binary search);
 * `(batch, seq)` is the durable insertion order (the analog of the linked
 * value chain). There is no page-size concept — row groups play that role.
 *
 * Scale notes: append = one new parquet batch, no read-modify-write (the
 * reference's `.val` stream is append-only/immutable for the same reason).
 * tryPutAll anti-joins against existing keys — a key-partitioned shuffle
 * that AQE sizes at runtime; at 100 TB pre-bucket both sides on `key` to
 * make it a zero-shuffle sort-merge.
 */
final class KeyValueColumn(spark: SparkSession, path: String, keyCol: String = "key") {

  import spark.implicits._

  private def exists: Boolean =
    try { spark.read.parquet(path).schema; true }
    catch { case _: Throwable => false }

  /** Current column contents (empty frame with no schema if never written). */
  def read(): Option[DataFrame] = if (exists) Some(spark.read.parquet(path)) else None

  private def nextBatch(): Long = read() match {
    case Some(df) => df.agg(max(col("batch"))).as[Option[Long]].head().getOrElse(-1L) + 1L
    case None => 0L
  }

  private def stamp(batchData: DataFrame, batch: Long): DataFrame = {
    // seq: per-batch insertion order. A caller-provided `seq` column is
    // authoritative — it survives any shuffle, so it is THE way to keep
    // strict arrival order across a shuffled multi-partition batch.
    // Fallback: monotonically_increasing_id, which orders by (partitionId,
    // offset-within-partition) — exact for single-partition batches and
    // for any source whose partition order IS the insertion order (files
    // read in order, sorted frames); for an arbitrarily shuffled
    // multi-partition batch the global order is partition order, not the
    // caller's row order. (A global window would funnel the batch through
    // one task — wrong at scale.)
    val withSeq =
      if (batchData.columns.contains("seq"))
        batchData.withColumn("seq", col("seq").cast("long"))
      else batchData.withColumn("seq", monotonically_increasing_id())
    withSeq.withColumn("batch", lit(batch))
  }

  /**
   * Set-semantics insert: rows whose key already exists (in the column or
   * earlier in this batch) are dropped. Returns the number of rows written.
   */
  def tryPutAll(batchData: DataFrame): Long = {
    val batch = nextBatch()
    // first-writer-wins within the batch: with a caller seq the "first"
    // row per key is well-defined (min seq); without one it is arbitrary
    // (dropDuplicates keeps whichever row the scan surfaces first)
    val deduped =
      if (batchData.columns.contains("seq")) {
        val others = batchData.columns.filter(_ != keyCol)
        batchData.groupBy(col(keyCol))
          .agg(min_by(struct(others.map(col): _*), col("seq")).as("_row"))
          .select(col(keyCol) +: others.map(c => col(s"_row.$c").as(c)): _*)
      } else batchData.dropDuplicates(keyCol)
    val fresh = read() match {
      case Some(existing) =>
        deduped.join(existing.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      case None => deduped
    }
    val stamped = stamp(fresh, batch).cache()
    val n = stamped.count()
    if (n > 0) {
      stamped
        .repartitionByRange(col(keyCol))
        .sortWithinPartitions(keyCol, "seq")
        .write.mode(SaveMode.Append).parquet(path)
    }
    stamped.unpersist()
    n
  }

  /** Upsert-append: every row is written; later reads see all values of a
    * key in (batch, seq) insertion order. */
  def putOrAppend(batchData: DataFrame): Unit = {
    val batch = nextBatch()
    stamp(batchData, batch)
      .repartitionByRange(col(keyCol))
      .sortWithinPartitions(keyCol, "seq")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** All values for a key, insertion-ordered (empty if absent). Point lookup
    * rides parquet min/max pruning on the sorted key column. */
  def get(key: Any): DataFrame = read() match {
    case Some(df) =>
      df.filter(col(keyCol) === lit(key)).orderBy("batch", "seq").drop("batch", "seq")
    case None => spark.emptyDataFrame
  }

  /** Values plus their count (≙ GetMany's out-count). */
  def getMany(key: Any): (DataFrame, Long) = {
    val df = get(key)
    (df, if (df.columns.isEmpty) 0L else df.count())
  }

  /** Grouped view: one row per key with its insertion-ordered value array. */
  def grouped(valueCol: String): DataFrame = read() match {
    case Some(df) =>
      df.groupBy(col(keyCol))
        .agg(transform(
          array_sort(collect_list(struct(col("batch"), col("seq"), col(valueCol)))),
          x => x.getField(valueCol)).as("values"),
          count(lit(1)).as("n"))
    case None => spark.emptyDataFrame
  }

  /** Sorted distinct key set. */
  def keys(): DataFrame = read() match {
    case Some(df) => df.select(col(keyCol)).distinct().orderBy(col(keyCol))
    case None => spark.emptyDataFrame
  }

  def keyExists(key: Any): Boolean = read() match {
    case Some(df) => !df.filter(col(keyCol) === lit(key)).isEmpty
    case None => false
  }

  /** Rank of a key in the sorted key set (0-based; -1 if absent).
    * Computed as a distributed count of smaller keys — no global window
    * (a `Window.orderBy` with no partition would single-task the key set). */
  def indexOf(key: Any): Long = read() match {
    case Some(df) =>
      if (!keyExists(key)) -1L
      else df.select(col(keyCol)).distinct().filter(col(keyCol) < lit(key)).count()
    case None => -1L
  }

  /** Drop the column entirely. */
  def truncate(): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
