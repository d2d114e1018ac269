package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
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
    require(!df.columns.contains("_z"),
      "input already has a '_z' column — rename it before zOrderWrite")
    writeAlongZ(df, zValue(col(colA), col(colB)), path, numPartitions)
  }

  private def writeAlongZ(df: DataFrame, z: Column, path: String,
                          numPartitions: Int): Unit = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.withColumn("_z", z)
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  // ------------------------------------------- bucketize for wide domains

  /**
   * Quantile bucket boundaries mapping arbitrary numeric/timestamp/date
   * domains onto the curve's 16 bits — the misuse-proofing for
   * [[zValue]]'s low-16-bit clamp, which silently collapses a >16-bit
   * domain (e.g. epoch millis) onto its low bits and destroys pruning
   * power. One Greenwald-Khanna sketch pass over BOTH columns (no
   * shuffle, no sort — map-side sketch merge only), ≤ 65535 split points
   * per column on the driver. Rank buckets, not value buckets: any
   * distribution, however skewed, fills the 16-bit range evenly, which is
   * exactly what a space-filling curve wants. Values are sketch-ranked
   * after a cast to double (coarse RANK is the goal; the 2^53 mantissa
   * bound on exact long representation is irrelevant at 16-bit
   * granularity).
   */
  def fitBuckets16(df: DataFrame, cols: Seq[String],
                   relativeError: Double = 1e-4): Seq[Array[Double]] = {
    val casted = df.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"_bk$i") }: _*)
    val probs = Array.tabulate(65535)(i => (i + 1).toDouble / 65536.0)
    casted.na.drop("any")
      .stat.approxQuantile(cols.indices.map(i => s"_bk$i").toArray,
        probs, relativeError)
      .toSeq
  }

  /** Bucket index in [0, 65535] of a (double-cast) value: the count of
    * fitted boundaries <= v, via binary search — monotone in v, so bucket
    * order preserves value order up to bucket granularity. Null in → null
    * out. */
  def bucket16(boundaries: Array[Double]): UserDefinedFunction = udf { (v: Double) =>
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /**
   * [[zOrderWrite]] for raw wide-domain columns (timestamps, epoch
   * millis, 64-bit ids): quantile-bucketize both columns onto 16 bits
   * first, then lay out along the z-curve of the bucket ranks. The
   * written data is byte-identical to the input rows (bucket and z
   * columns are both dropped); only the ROW ORDER — and therefore the
   * row-group min/max stats on the two raw columns — changes, so raw-
   * value predicates on either column still prune.
   */
  def zOrderWriteBucketed(df: DataFrame, path: String, colA: String,
                          colB: String, numPartitions: Int = 0,
                          relativeError: Double = 1e-4): Unit = {
    require(!df.columns.contains("_z"),
      "input already has a '_z' column — rename it before zOrderWriteBucketed")
    val Seq(ba, bb) = fitBuckets16(df, Seq(colA, colB), relativeError)
    writeAlongZ(df,
      zValue(bucket16(ba)(col(colA).cast("double")),
             bucket16(bb)(col(colB).cast("double"))),
      path, numPartitions)
  }
}
