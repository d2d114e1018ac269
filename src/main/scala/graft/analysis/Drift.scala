package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift detection between two corpus snapshots — the
 * pipeline-QA guard that catches a silently changed upstream mix (a
 * crawler losing a language, a dedup pass eating one source) before it
 * trains into a model.
 *
 * Statistic: total-variation / L1 distance between the two empirical
 * bin distributions, computed EXACTLY:
 *
 *   L1 = Σ_bins | a_b/A − b_b/B |  =  Σ | a_b·B − b_b·A | / (A·B)
 *
 * The right-hand form is pure integer arithmetic until one final
 * division: products and the absolute-difference sum run in
 * DECIMAL(38,0) (A and B can be 10¹²-row counts at 100 TB — a BIGINT
 * product would overflow, silently in Spark, loudly in DuckDB; decimal
 * arithmetic is exact and portable in both), so the statistic is
 * bit-identical on any engine. Range [0, 2]: 0 = identical mixes,
 * 2 = disjoint supports.
 *
 * Scale shape: one groupBy per side on the bin expression (map-side
 * partial), a full-outer join of the two tiny bin tables, one scalar
 * aggregation. The corpus is scanned once per side and never shuffled
 * beyond the bin counts.
 */
object Drift {

  /** Per-bin counts of both sides with absent bins as 0:
    * (bin, n_a, n_b), plus the exact per-bin |a·B − b·A| numerator. */
  def binCounts(a: DataFrame, b: DataFrame, bin: Column): DataFrame = {
    val ca = a.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_b"))
    ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
  }

  /**
   * L1 (total-variation ×2) drift between snapshots `a` and `b` over the
   * binning expression: one row (l1, n_bins, n_a, n_b). The side totals
   * ride a broadcast one-row aggregate over the tiny bin table (no
   * window, no driver action). An empty side divides by zero and yields
   * IEEE NaN — identically in any engine; callers treat NaN as "no
   * distribution to compare".
   */
  def l1Drift(a: DataFrame, b: DataFrame, bin: Column): DataFrame = {
    val bins = binCounts(a, b, bin)
    val dec = "decimal(38,0)"
    val totals = bins.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    bins.crossJoin(broadcast(totals))
      .agg(
        sum(abs(col("n_a").cast(dec) * col("_tb").cast(dec) -
          col("n_b").cast(dec) * col("_ta").cast(dec))).as("_num"),
        count(lit(1)).as("n_bins"),
        first(col("_ta")).as("n_a"),
        first(col("_tb")).as("n_b"))
      .select(
        {
          // ANSI mode raises on division by zero even for doubles —
          // make the empty-side NaN contract explicit instead
          val den = (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double")
          when(den === 0.0, lit(Double.NaN))
            .otherwise(col("_num").cast("double") / den).as("l1")
        },
        col("n_bins"), col("n_a"), col("n_b"))
  }
}
