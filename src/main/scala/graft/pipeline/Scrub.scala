package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for training-data pipelines: detect and redact personally
 * identifying strings (emails, IPv4 addresses, SSN-like ids, international
 * phone numbers) before a corpus is packed for training.
 *
 * Scale design: pure `regexp_replace`/`regexp_count` column expressions —
 * codegen'd, no UDF, no shuffle; the whole scrub fuses into the scan
 * projection. Patterns are deliberately restricted to the syntax subset
 * shared by Java regex and RE2 (`\b`, `\d`, bounded repetition, character
 * classes — no lookarounds, no backreferences), so the SAME pattern
 * strings run unchanged in DuckDB/Trino/Hyperscan for oracle checks or
 * mixed-engine pipelines.
 *
 * Redaction order is fixed (email → IPv4 → SSN → phone) and the
 * replacement tokens contain no digits or '@', so later patterns can
 * never match inside an earlier replacement: the scrub is idempotent.
 */
object Scrub {

  /** Pattern and replacement token per PII type, in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\+\\d{1,3}[ -]\\d{3}[ -]\\d{3,4}[ -]\\d{3,4}\\b", "<PHONE>"))

  /** Redact all PII types from a text column, in the fixed order. */
  def redactPii(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Per-type match counts over the ORIGINAL text (before redaction),
    * as one struct column field per type: n_email, n_ipv4, ... */
  def piiCounts(text: Column): Seq[Column] =
    Patterns.map { case (name, re, _) =>
      regexp_count(text, lit(re)).as(s"n_$name")
    }

  /** Profile + scrub in one projection: id, per-type counts, redacted
    * text. Counts are measured pre-redaction; the projection stays a
    * single codegen'd map over the scan. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: piiCounts(col(textCol)) :+
      redactPii(col(textCol)).as("redacted"): _*)

  private lazy val compiledPatterns =
    Patterns.map { case (_, re, token) => (java.util.regex.Pattern.compile(re), token) }

  /** Pure-string kernel applying the same patterns in the same order —
    * the Java regex engine also backs the column path's regexp_replace,
    * so results are char-identical. */
  def redactPiiString(s: String): String =
    if (s == null) null
    else compiledPatterns.foldLeft(s) { case (acc, (p, token)) =>
      p.matcher(acc).replaceAll(token)
    }

  /** Register `pii_redact` for SQL callers (`SELECT pii_redact(text) ...`). */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("pii_redact", (s: String) => redactPiiString(s))
}
