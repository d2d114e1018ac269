package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: left rows carry an inclusive [start, end]
 * interval, right rows a point timestamp; the result is every (left,
 * right) pair sharing the key with the point inside the interval —
 * sessions × their events, validity windows × readings, etc.
 *
 * Spark plans a bare range predicate as a sort-merge join on the equality
 * keys with the range as a post-join FILTER — every right row of a key
 * meets every left interval of that key first (per-key cartesian), which
 * dies on keys with long histories. The scale pattern is axis binning:
 * each interval explodes into the fixed-width time bins it covers
 * (bounded by span/binWidth — cap it via `maxBinsPerInterval`), each
 * point maps to exactly one bin, and the join becomes an EQUI-join on
 * (key, bin) followed by the exact range filter. Shuffle volume is
 * rows × bins-per-interval, never per-key |L|×|R|.
 *
 * Bin arithmetic is integer-exact (a - mod(a,w))/w on microseconds, so
 * boundary points land in the same bin on every engine.
 */
object RangeJoin {

  /** Exact floor-division of epoch-microseconds into `widthUs` bins: the
    * numerator is an exact multiple of the width, so the double quotient
    * is integral and the long cast is lossless. */
  private def binOf(ts: Column, widthUs: Long): Column = {
    val us = unix_micros(ts)
    ((us - pmod(us, lit(widthUs))) / lit(widthUs)).cast("long")
  }

  /**
   * @param binWidthUs bin width in microseconds (e.g. 3_600_000_000L = 1h);
   *        choose it near the typical interval span so most intervals
   *        explode into 1-2 bins.
   * @param maxBinsPerInterval guard against degenerate intervals (an
   *        open-ended or year-long interval would explode into thousands
   *        of bins); longer intervals fail fast rather than silently
   *        flooding the shuffle.
   */
  def binnedRangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      startCol: String, endCol: String, tsCol: String,
                      binWidthUs: Long = 3600000000L,
                      maxBinsPerInterval: Int = 1000): DataFrame = {
    require(keyCols.nonEmpty, "binnedRangeJoin needs at least one key column")
    require(binWidthUs > 0, "binWidthUs must be positive")
    val startBin = binOf(col(startCol), binWidthUs)
    val endBin = binOf(col(endCol), binWidthUs)
    val guard = when(endBin - startBin >= maxBinsPerInterval,
      raise_error(concat(lit(s"interval spans more than $maxBinsPerInterval bins at "),
        col(startCol)))).otherwise(endBin)
    val leftBinned = left
      // inverted intervals (end < start) are empty under BETWEEN semantics
      // — and must be dropped BEFORE the explode: a negative span slips
      // past the >= maxBins guard and sequence(start, stop) with
      // stop < start generates a DESCENDING sequence, silently exploding
      // one corrupt row into arbitrarily many bins
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("_range_bin", explode(sequence(startBin, guard)))
    val rightBinned = right
      .filter(col(tsCol).isNotNull)
      .withColumn("_range_bin", binOf(col(tsCol), binWidthUs))
    leftBinned
      .join(rightBinned, keyCols :+ "_range_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_range_bin")
  }
}
