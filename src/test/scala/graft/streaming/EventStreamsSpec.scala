package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("windowed counts aggregate by 5-minute window and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedTypeCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    input.addData(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0),
      (ts(2), "view", 5.0), (ts(7), "click", 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_counts")
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(0), "view", 1L, 5.0)))
    assert(rows.contains((ts(5), "click", 1L, 3.0)))
  }

  test("streaming dedup keeps first event per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupByKey(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData((1L, ts(0), 1.0), (1L, ts(0), 1.0), (2L, ts(1), 2.0))
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() === 2)
  }

  test("stateful sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    // user 7: burst at 10:00-10:02, then new session at 11:00 (gap > 30 min)
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    input.addData(
      EventStreams.Event(1, ts(0), 7L, "click", 1.0),
      EventStreams.Event(2, ts(1), 7L, "view", 2.0),
      EventStreams.Event(3, ts(2), 7L, "click", 3.0))
    q.processAllAvailable()
    input.addData(
      EventStreams.Event(4, Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "click", 4.0))
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sessions_out")
      .as[EventStreams.SessionUpdate].collect()
    // first session (3 events, total 6.0) must have been emitted when the
    // 11:00 event opened a new one
    assert(sessions.exists(su => su.user_id == 7L && su.n_events == 3L &&
      math.abs(su.total_value - 6.0) < 1e-9), s"got ${sessions.mkString(",")}")
  }

  test("sessionize preserves microsecond precision in session_start") {
    implicit val sqlCtx = spark.sqlContext
    val start = Timestamp.valueOf("2024-01-01 10:00:00")
    start.setNanos(123456000) // 10:00:00.123456 — µs the old ms path lost
    val later = Timestamp.valueOf("2024-01-01 12:00:00")
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_us_out")
      .outputMode("append").start()
    input.addData(
      EventStreams.Event(1, start, 9L, "click", 1.0),
      EventStreams.Event(2, later, 9L, "click", 2.0))
    q.processAllAvailable(); q.stop()
    val closed = spark.table("sessions_us_out")
      .as[EventStreams.SessionUpdate].collect()
    assert(closed.length === 1)
    assert(closed.head.session_start.getNanos === 123456000,
      s"µs component lost: ${closed.head.session_start}")
  }

  test("sessionizeWithTimeout flushes the trailing session via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    // gap 60 s, watermark delay 10 s: the 10:00-10:01 session times out
    // as soon as the watermark passes 10:02
    val q = EventStreams.sessionizeWithTimeout(input.toDS(),
      gapSeconds = 60, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sessions_flush_out")
      .outputMode("append").start()
    input.addData(
      EventStreams.Event(1, ts(0), 7L, "click", 1.0),
      EventStreams.Event(2, ts(1), 7L, "view", 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_flush_out").count() === 0,
      "open session must not emit before the watermark passes last+gap")
    // a different user's late-hour event advances the watermark far past
    // 10:01+60s; the next batch fires user 7's timeout
    input.addData(
      EventStreams.Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 8L, "click", 4.0))
    q.processAllAvailable()
    // one more batch so the timeout (evaluated against the watermark
    // committed at the previous batch's end) actually executes
    input.addData(
      EventStreams.Event(4, Timestamp.valueOf("2024-01-01 11:00:01"), 8L, "click", 5.0))
    q.processAllAvailable(); q.stop()
    val flushed = spark.table("sessions_flush_out")
      .as[EventStreams.SessionUpdate].collect()
    assert(flushed.exists(su => su.user_id == 7L && su.n_events == 2L &&
      math.abs(su.total_value - 3.0) < 1e-9),
      s"trailing session not flushed: ${flushed.mkString(",")}")
  }

  test("durable hourly stream compacts the changelog last-writer-wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_durable_").toFile
    dir.deleteOnExit()
    val eventsPath = s"${dir.getAbsolutePath}/events"
    val outPath = s"${dir.getAbsolutePath}/out"
    val ckptPath = s"${dir.getAbsolutePath}/ckpt"
    // two files => two micro-batches at maxFilesPerTrigger=1; hour 10
    // 'click' spans both files, so the log holds two click rows and
    // compaction must resolve to the SECOND batch's aggregate, not
    // duplicate or keep the first
    val nanos = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      .getTime * 1000000L
    Seq((1L, nanos(0), 7L, "click", 1.0), (2L, nanos(1), 7L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(eventsPath)
    Seq((3L, nanos(2), 8L, "click", 3.0), (4L, nanos(40), 8L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(eventsPath)
    val result = EventStreams.runHourlyStreamDurable(spark,
      eventsPath, outPath, ckptPath, maxFilesPerTrigger = Some(1))
      .select("hour", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00")
    assert(result === Set(
      (h10, "click", 3L, 8.0),
      (h10, "view", 1L, 2.0)),
      s"durable sink content wrong: $result")
    // the raw log must be a changelog: the superseded batch-0 click row is
    // still present (append-only), distinguished by batch_id
    val raw = spark.read.parquet(outPath)
    assert(raw.filter($"event_type" === "click").count() === 2,
      "changelog should retain the superseded click row")
    assert(raw.select("batch_id").distinct().count() === 2)
  }

  test("compactAndRewrite keeps read cost flat and later batches still win") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toFile
    dir.deleteOnExit()
    val eventsPath = s"${dir.getAbsolutePath}/events"
    val outPath = s"${dir.getAbsolutePath}/out"
    val ckptPath = s"${dir.getAbsolutePath}/ckpt"
    val nanos = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      .getTime * 1000000L
    // same two-file fixture as the durable test: hour-10 'click' spans both
    // micro-batches, so the raw log holds a superseded row to compact away
    Seq((1L, nanos(0), 7L, "click", 1.0), (2L, nanos(1), 7L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(eventsPath)
    Seq((3L, nanos(2), 8L, "click", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(eventsPath)
    EventStreams.runHourlyStreamDurable(spark, eventsPath, outPath, ckptPath,
      maxFilesPerTrigger = Some(1))
    val stateBefore = EventStreams.compactHourlyLog(spark.read.parquet(outPath))
      .select("hour", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val rawBefore = spark.read.parquet(outPath).count()
    assert(rawBefore > stateBefore.size, "fixture must hold a superseded row")

    val rows = EventStreams.compactAndRewrite(spark, outPath)
    assert(rows === stateBefore.size.toLong, "compacted log = one row per key")
    val after = spark.read.parquet(outPath)
    assert(after.count() === rows, "read cost flat after rewrite")
    assert(EventStreams.compactHourlyLog(after)
      .select("hour", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet === stateBefore,
      "rewrite must preserve the resolved state")
    // idempotent: a second run changes nothing
    assert(EventStreams.compactAndRewrite(spark, outPath) === rows)

    // an append with a HIGHER batch_id (what a resumed stream writes next)
    // still wins over the rewritten baseline (re-read: frames created
    // before a rewrite hold the superseded file listing, by contract)
    val maxBatch = spark.read.parquet(outPath)
      .agg(max($"batch_id")).head().getLong(0)
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00")
    Seq((h10, "click", 9L, 99.0, maxBatch + 1))
      .toDF("hour", "event_type", "n", "sum_value", "batch_id")
      .write.mode("append").parquet(outPath)
    val resolved = EventStreams.compactHourlyLog(spark.read.parquet(outPath))
      .filter($"event_type" === "click")
      .select("n", "sum_value").as[(Long, Double)].head()
    assert(resolved === ((9L, 99.0)), "later batch must override the baseline")
  }

  test("streaming lexicon emits first-seen angles only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = EventStreams.lexiconStream(input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("lex_out")
      .outputMode("append").start()
    input.addData("a world of dew", "a world of struggle")
    q.processAllAvailable(); q.stop()
    val labels = spark.table("lex_out").select("label").as[String].collect().toSet
    assert(labels === Set("a", "world", "of", "dew", "struggle"))
  }
}
