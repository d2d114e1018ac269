package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.LongType

/** Bridge to `SparkSession.internalCreateDataFrame`, which Spark 4 hides
  * behind `private[sql]`. Lives under `org.apache.spark.sql` solely to
  * satisfy the access qualifier; keep all graft logic out of this file.
  *
  * `zipWithGlobalIndex` appends each row's global position (partition order
  * × row order) as a long column. Both of `zipWithIndex`'s jobs (the
  * per-partition count and every downstream action) run against the SAME
  * RDD instance, so the upstream shuffle is materialized once and reused —
  * the partitioning the counts observed is, by construction, the
  * partitioning the output reads. No persist() needed, and the rows stay
  * InternalRow end-to-end (no external Row codec round-trip).
  */
object RowBridge {

  def zipWithGlobalIndex(df: DataFrame, idxName: String): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = df.schema.add(idxName, LongType, nullable = false)
    val rdd = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (r, i) =>
        // copy: unsafe scan rows are buffer-reused; the JoinedRow is fresh
        // per row because downstream exchanges may buffer references
        new JoinedRow(r.copy(), new GenericInternalRow(Array[Any](i))): InternalRow
      }
    }
    spark.internalCreateDataFrame(rdd, schema)
  }

  /** Append each row's EXCLUSIVE global running sum of `weightCol` (a
    * non-null LongType column) as `cumName`: row i gets
    * Σ weights of rows 0..i-1 in (partition order × row order). Same
    * same-RDD-instance contract as [[zipWithGlobalIndex]]: the
    * per-partition totals job and the output job share one RDD, so the
    * sampled range partitioning cannot drift between the two passes. */
  def zipWithGlobalCumSum(df: DataFrame, weightCol: String,
                          cumName: String): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val wIdx = df.schema.fieldIndex(weightCol)
    require(df.schema(wIdx).dataType == LongType,
      s"$weightCol must be LongType for the exact integer running sum")
    val schema = df.schema.add(cumName, LongType, nullable = false)
    val rdd = df.queryExecution.toRdd
    val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(wIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = rdd.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = offsets.value(pid)
      it.map { r =>
        val joined =
          new JoinedRow(r.copy(), new GenericInternalRow(Array[Any](acc)))
        acc += r.getLong(wIdx)
        joined: InternalRow
      }
    }
    spark.internalCreateDataFrame(out, schema)
  }
}
