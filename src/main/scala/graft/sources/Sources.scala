package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Ingestion sources (SURVEY.md §2.6) — the reference's Wikipedia
 * CirrusSearch gzip-JSON reader re-expressed as `spark.read` wrappers:
 *
 *  - readJsonLines ≙ WikipediaHelper.ReadGZipJsonFile
 *    (WikipediaHelper.cs:13-57 single-field, 59-112 multi-field): stream a
 *    gzip JSON-lines dump, skip the CirrusSearch index-header lines,
 *    project a field set, synthesize a `url` from `title`, and paginate
 *    with skip/take. Spark decompresses `.gz` transparently and
 *    parallelizes across files; the reference's manual gzip stream loop
 *    disappears.
 *  - loadTables ≙ the driver test-table loaders (TESTDATA.md).
 *
 * CirrusSearch dumps interleave `{"index":{...}}` action lines with
 * document lines; the reference skips them by only parsing lines that
 * carry the wanted field. We do the same declaratively: read permissive
 * JSON, drop rows where all projected fields are null.
 *
 * Scale notes: one gzip file is one non-splittable partition — at 100 TB
 * ingest from many files (the dumps ship in parts) so the read
 * parallelizes; a post-read `repartition` rebalances if the parts are
 * skewed. Schema inference samples the data — pass an explicit schema via
 * `spark.read.schema(...)` in production to avoid the extra pass.
 */
object Sources {

  /** All driver test tables by name (TESTDATA.md). */
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Run `body` with `spark.sql.legacy.parquet.nanosAsLong` set, restoring
    * the prior value (or unsetting) afterwards. The conf is consulted at
    * schema RESOLUTION (the eager `spark.read.parquet(...)` call inside
    * `body`), so the flip does not need to outlive it — a SourcesSpec test
    * pins that the returned frame still executes after restore and that
    * other nanos-parquet reads in the session are unaffected. */
  def withNanosAsLong[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Normalize an events frame's `ts` to a session-zone TimestampType,
    * whatever the file stored: INT64 TIMESTAMP(NANOS) dumps arrive as
    * long under the nanos conf (floor-truncate to µs — integer division;
    * a double round-trip would lose precision), µs dumps arrive as
    * TIMESTAMP_NTZ (cast is a value-preserving relabel under the UTC
    * session zone every entry point pins). Shared by the batch reader
    * here and EventStreams.hourlyAggStream's readStream. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // the nanos conf is consulted only when the file actually stores
      // TIMESTAMP(NANOS) — a no-op for µs dumps, so holding it for the
      // read keeps legacy dumps loadable without a second code path
      withNanosAsLong(spark) {
        normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every test table as a temp view so spark.sql can see them. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { t =>
      table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /**
   * Gzip JSON-lines reader with field projection, url synthesis and
   * skip/take pagination (≙ WikipediaHelper.ReadGZipJsonFile). `fields`
   * maps 1:1 to the reference's `HashSet<string> fieldsToRead`
   * (WikipediaHelper.cs:59). Rows where every requested field is null
   * (e.g. CirrusSearch `{"index":...}` action lines) are dropped.
   *
   * Note: the reference's `skip` loop (WikipediaHelper.cs:31-34) never
   * advances the line — a reference bug SURVEY.md flags; here skip is
   * honored correctly via a monotonic row index.
   */
  def readJsonLines(spark: SparkSession, path: String, fields: Seq[String],
                    skip: Long = 0L, take: Long = Long.MaxValue,
                    synthesizeUrl: Boolean = true,
                    urlPrefix: String = "https://en.wikipedia.org/wiki/"): DataFrame = {
    val raw = spark.read.json(path)
    val present = fields.filter(raw.columns.contains)
    require(present.nonEmpty, s"none of $fields present in $path")
    val docs = raw
      .filter(present.map(col(_).isNotNull).reduce(_ || _))
      .select(present.map(col): _*)
    val paged =
      if (skip > 0 || take < Long.MaxValue) {
        // deterministic pagination needs a stable order; JSON-lines input
        // order = (file, line) order, which zipWithIndex preserves. The
        // bridge keeps rows as InternalRow end-to-end (no external Row
        // decode/encode round-trip).
        org.apache.spark.sql.graft.RowBridge.zipWithGlobalIndex(docs, "_row_idx")
          .filter(col("_row_idx") >= skip && col("_row_idx") < skip + take)
          .drop("_row_idx")
      } else docs
    if (synthesizeUrl && paged.columns.contains("title"))
      paged.withColumn("url", concat(lit(urlPrefix), url_encode(col("title"))))
    else paged
  }
}
