package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analysis.TextMetrics
import graft.dedup.Dedup

/**
 * The canonical pretraining-corpus cleaning pipeline, composed from the
 * engine's text-analysis and dedup operators: language filter → quality
 * filter → normalized exact-dedup (first id wins). One declarative plan —
 * the filters fuse into the scan projection, and the only shuffle is the
 * dedup window on the normalized-content hash.
 *
 * At 100 TB this is the shape that matters: per-row scoring is codegen'd
 * scan-side work, the dedup partitions by content hash (uniform by
 * construction), and the output is a kept-id set that downstream stages
 * join against instead of materializing cleaned text copies.
 */
object CorpusClean {

  /** Clean `docs`: keep rows whose predicted language is in `keepLangs` and
    * whose composite quality ≥ `minQuality`, then keep the smallest id per
    * normalized-content group. Adds `pred_lang` and `m_quality` columns. */
  def clean(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            minQuality: Double = 0.5,
            keepLangs: Seq[String] = Seq("en")): DataFrame = {
    val langUdf = udf((s: String) => TextMetrics.languageId(s))
    val scored = docs
      .withColumn("pred_lang", langUdf(col(textCol)))
      .withColumn("m_quality", TextMetrics.qualityScore(col(textCol)))
      .filter(col("pred_lang").isin(keepLangs: _*) &&
        col("m_quality") >= minQuality)
    val w = Window.partitionBy(md5(Dedup.normalized(col(textCol))))
      .orderBy(col(idCol))
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
