package graft.sources

import graft.SparkTestBase
import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** ≙ reference WikipediaHelper semantics (WikipediaHelper.cs:13-112):
  * gzip JSON-lines, header/action lines skipped, field projection, url
  * synthesis from title, skip/take pagination. */
class SourcesSpec extends SparkTestBase {

  private lazy val dumpPath: String = {
    val dir = Files.createTempDirectory("graft_dump")
    val f = dir.resolve("dump.json.gz")
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(f)), "UTF-8"))
    // CirrusSearch-style: action lines interleaved with doc lines
    (0 until 10).foreach { i =>
      w.write(s"""{"index":{"_id":"$i"}}"""); w.newLine()
      w.write(s"""{"title":"Page $i","text":"body of page $i","popularity":$i}"""); w.newLine()
    }
    w.close()
    f.toString
  }

  test("reads gzip json-lines, drops action lines, projects fields") {
    val df = Sources.readJsonLines(spark, dumpPath, Seq("title", "text"))
    assert(df.count() === 10)
    assert(df.columns.toSet === Set("title", "text", "url"))
    val r = df.filter(df("title") === "Page 3").head()
    assert(r.getAs[String]("text") === "body of page 3")
    assert(r.getAs[String]("url") === "https://en.wikipedia.org/wiki/Page+3")
  }

  test("skip/take paginate in input order (reference skip bug fixed)") {
    val df = Sources.readJsonLines(spark, dumpPath, Seq("title"),
      skip = 2, take = 3, synthesizeUrl = false)
    val titles = df.collect().map(_.getAs[String]("title")).sorted
    assert(titles === Array("Page 2", "Page 3", "Page 4"))
  }

  test("events read scopes the nanos conf: restored after read, frame still runs") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      val events = Sources.table(spark, sfDir, "events")
      // the flip must not outlive the read (getOption reports the session
      // default "false" once restored — never the flipped "true")...
      assert(!spark.conf.getOption(key).contains("true"),
        "nanos conf leaked session-wide from Sources.table")
      // ...the returned frame must still execute after the restore...
      assert(events.count() > 0)
      assert(events.schema("ts").dataType.typeName === "timestamp")
      // ...and the loader is schema-adaptive: a RAW read of the same file
      // either refuses TIMESTAMP(NANOS) (legacy dumps, Spark's default
      // behavior — proving the conf did not leak) or surfaces a bare
      // NTZ/µs timestamp (regenerated dumps) — in both generations only
      // Sources.table delivers the session-zone TimestampType column
      val rawTs = scala.util.Try(
        spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType)
      assert(rawTs.isFailure ||
        rawTs.get.typeName.startsWith("timestamp"),
        s"unexpected raw ts type: $rawTs")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("registerAll exposes every test table to spark.sql") {
    Sources.registerAll(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
  }

  test("format zoo: parquet/json/csv round-trip the same rows") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.25))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("graft_formats")
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      val p = dir.resolve(fmt).toString
      df.write.format(fmt).option("header", "true").save(p)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true").load(p)
        .select($"id".cast("long"), $"name", $"score".cast("double"))
        .as[(Long, String, Double)].collect().sortBy(_._1)
      assert(back.toSeq === Seq((1L, "alpha", 1.5), (2L, "beta", -2.0),
        (3L, "gamma", 0.25)), s"round-trip mismatch for $fmt")
    }
  }
}
