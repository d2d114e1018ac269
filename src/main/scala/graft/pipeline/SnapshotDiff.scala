package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level snapshot diff — classify every key of two corpus snapshots as
 * `added`, `removed`, or `changed`. The change-data-capture primitive for
 * corpus maintenance: which documents does the nightly crawl add, drop, or
 * rewrite relative to the last training snapshot? Complements
 * [[graft.analysis.Drift]] (distribution-level diff) with the row-level
 * answer, and feeds the appendable indexes (what to append, what to
 * tombstone).
 *
 * Scale design: each side collapses to `(key, md5-of-values)` in a
 * map-side projection BEFORE the join, so the shuffle ships a fixed ~48
 * bytes per row no matter how wide the snapshot — diffing two 100 TB
 * snapshots moves only key+hash through the exchange, then one
 * co-partitioned sort-merge full-outer join on the key. No window, no
 * driver action. Snapshots bucketed by key diff with no shuffle at all.
 *
 * The value hash is md5 over a U+0001-separated canonical string (nulls →
 * a U+0002-prefixed sentinel no real value starts with), chosen over
 * xxhash64 because every SQL engine has md5 — the whole diff, hash
 * included, replays bit-for-bit in DuckDB/Trino for oracle checks.
 * Contract: keys are unique per snapshot; value columns should be
 * string/integer types so the canonical cast is engine-portable.
 */
object SnapshotDiff {

  /** Canonical md5 row hash over `valueCols` (null-safe, order-fixed). */
  def rowHash(valueCols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*))

  /** Diff `newDf` against `oldDf` on `keyCols`: one row per key whose
    * presence or `valueCols` content differs, with `change` in
    * {'added', 'removed', 'changed'}. Unchanged keys emit nothing. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "snapshot diff needs at least one key and one value column")
    val reserved = (oldDf.columns ++ newDf.columns).filter(_.startsWith("_sd_"))
    require(reserved.isEmpty,
      s"snapshot diff reserves internal column names _sd_*, found: ${reserved.mkString(", ")}")
    val keys = keyCols.map(col)
    val oldH = oldDf.select(keys :+ rowHash(valueCols).as("_sd_old"): _*)
    val newH = newDf.select(keys :+ rowHash(valueCols).as("_sd_new"): _*)
    oldH.join(newH, keyCols, "full_outer")
      .withColumn("change",
        when(col("_sd_old").isNull, lit("added"))
          .when(col("_sd_new").isNull, lit("removed"))
          .when(col("_sd_old") =!= col("_sd_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys :+ col("change"): _*)
  }
}
