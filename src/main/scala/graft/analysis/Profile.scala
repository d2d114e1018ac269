package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level data profiling — the pipeline-QA companion to the corpus
 * metrics in [[TextMetrics]]: one row per profiled column with row count,
 * null count, distinct count, and min/max (stringified), computed in a
 * SINGLE aggregation pass over the table.
 *
 * Scale shape: one `agg` carrying every per-column expression. The
 * multiple `count(DISTINCT)`s expand the scan rows (Catalyst's Expand —
 * one replica per distinct aggregate) into ONE shuffle; that is the
 * honest cost of exact distincts and it is linear, never a per-column
 * rescan of the table. For 100 TB interactive profiling where ±2% is
 * fine, `exact = false` swaps in `approx_count_distinct` (HyperLogLog++,
 * no Expand, plain map-side partials) — approximate counts are
 * engine-specific, so only the exact form is oracle-comparable.
 *
 * min/max are computed in the column's native type (so numeric columns
 * order numerically) and stringified afterwards. String formatting of
 * floating-point and timestamp values differs across engines — profile
 * integer/string columns when cross-engine hash parity matters.
 */
object Profile {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Profile `cols` of `df`: (col_name, n_rows, n_nulls, n_distinct,
    * min_str, max_str), one row per column, ordered by col_name. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach { c =>
      require(Ident.pattern.matcher(c).matches(),
        s"profile column name must be a plain identifier, got '$c'")
      require(df.columns.contains(c), s"column '$c' not in ${df.columns.mkString(",")}")
    }
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"_nn_$c"),
        nd.as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    // unpivot the single stats row declaratively (stack generator — no
    // driver-side row surgery, the result stays a plan)
    val stackArgs = cols
      .map(c => s"'$c', _nn_$c, _nd_$c, _mn_$c, _mx_$c").mkString(", ")
    one.select(col("_n"),
        expr(s"stack(${cols.length}, $stackArgs)")
          .as(Seq("col_name", "_nn", "n_distinct", "min_str", "max_str")))
      .select(col("col_name"), col("_n").as("n_rows"),
        (col("_n") - col("_nn")).as("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }
}
