package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global ordering index (≙ reference ColumnReader.IndexOf,
 * ColumnReader.cs:64-67 — rank of a key in the sorted key set).
 *
 * A bare `Window.orderBy(key)` funnels every row through one task (Spark
 * even warns "No Partition Defined for Window operation"), which is wrong at
 * any real scale. This is the classic two-phase rank instead:
 *
 *   1. range-partition by the order key (each partition owns a disjoint,
 *      ordered key range),
 *   2. count rows per partition, cumulate the counts driver-side
 *      (numPartitions rows — trivially small at any data size),
 *   3. rank within partitions (a properly partitioned window) and add the
 *      partition's global offset.
 *
 * The partitioned frame is persisted for the duration of the lineage: range
 * boundaries come from sampling, so the count pass and the rank pass must
 * observe the *same* physical partitioning.
 */
object Ranks {

  /** Append a 0-based global rank-by-`orderCol` column named `idxName`.
    * Input rows must be unique on `orderCol` for the rank to be a stable
    * total order (callers pass key sets). */
  def withOrderedIndex(df: DataFrame, orderCol: String, idxName: String,
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(n, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .persist()
    val counts = parted.groupBy("_pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_offset", org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
    parted.join(broadcast(offsetsDf), "_pid")
      .withColumn(idxName,
        (row_number().over(w) - lit(1)).cast("long") + col("_offset"))
      .drop("_pid", "_offset")
  }
}
