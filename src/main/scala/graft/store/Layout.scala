package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) write layout for multi-dimensional data
 * skipping. Range-partitioning parquet on ONE column gives tight row-group
 * min/max stats on that column only; interleaving the bits of two key
 * columns and range-partitioning on the combined z-value gives partitions
 * that are small RECTANGLES in (a, b) space — so predicates on EITHER
 * column prune row groups, the property Delta/Iceberg sell as OPTIMIZE
 * ZORDER.
 *
 * The interleave kernel is the classic magic-number bit spread — five
 * shift-mask steps per dimension, pure 64-bit arithmetic with no UDF, so
 * it whole-stage-codegens here and runs verbatim in any engine for
 * oracle checks. Inputs are clamped to their low 16 bits (callers bucket
 * wider domains first — z-ordering needs only coarse rank, not exact
 * values).
 */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,...,30. */
  private def spread16(x: Column): Column = {
    val masked = x.bitwiseAND(lit(0xFFFFL))
    val s1 = masked.bitwiseOR(shiftleft(masked, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates (a even bits, b odd). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /**
   * Write `df` as parquet laid out along the z-curve of (colA, colB):
   * range-partition on the z-value, sort within partitions by it. Row
   * groups then carry tight min/max on BOTH columns, so either-column
   * predicates skip data at scan time.
   */
  def zOrderWrite(df: DataFrame, path: String, colA: String, colB: String,
                  numPartitions: Int = 0): Unit = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    require(!df.columns.contains("_z"),
      "input already has a '_z' column — rename it before zOrderWrite")
    df.withColumn("_z", zValue(col(colA), col(colB)))
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
