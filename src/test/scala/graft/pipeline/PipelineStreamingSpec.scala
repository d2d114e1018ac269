package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateless pipeline operators (PII scrub, chunking) are pure
  * projections, so the SAME operator code runs unchanged under Structured
  * Streaming — batch/stream unification is part of the operator contract,
  * spec-pinned here against the batch results. */
class PipelineStreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "mail a@b.io from 10.0.0.1 about the quick brown fox"),
    (2L, "a b c d e f g"),
    (3L, "clean text with no pii at all"))

  test("Scrub.scrub runs unchanged on a stream and matches batch output") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Scrub.scrub(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("scrub_stream")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSet
    val batch = Scrub.scrub(docs.toDF("id", "text"), "id", "text")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.exists(_._6.contains("<EMAIL>")))
  }

  test("Chunking.chunkByTokens runs unchanged on a stream and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Chunking.chunkByTokens(input.toDF().toDF("id", "text"),
        "id", "text", windowSize = 4, stride = 2)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("chunk_stream")
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = Chunking.chunkByTokens(docs.toDF("id", "text"),
        "id", "text", windowSize = 4, stride = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.contains((2L, 1L, 4L, "c d e f")))
  }

  private val webDocs = Seq(
    (1L, "A good long sentence here.\nshort\nAnother fine sentence stays!" +
      "\nA third keeper sentence indeed."),
    (2L, "lorem ipsum template page.\nWith a sentence kept.\nAnd one more" +
      " kept.\nAnd a third kept."),
    (3L, "code page { with braces }.\nKept sentence one two three."))

  test("c4Clean runs unchanged on a stream and matches batch output") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CorpusClean.c4Clean(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    input.addData(webDocs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("c4_stream")
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    val batch = CorpusClean.c4Clean(webDocs.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    assert(streamed === batch)
    // the lorem and brace pages are page-dropped in both worlds
    assert(streamed.filter(!_._5).map(_._1) === Set(2L, 3L))
  }

  test("gopherRules runs unchanged on a stream and matches batch output") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val rules = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"),
        graft.analysis.TextMetrics.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.keep"))
    val q = rules(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    input.addData(webDocs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gopher_stream")
      .as[(Long, Long, Boolean)].collect().toSet
    val batch = rules(webDocs.toDF("doc_id", "text"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed === batch)
  }

  test("lmScoreStream scores micro-batches against the persisted model") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("lm-score-stream")
      .resolve("idx").toString
    val model = Seq((100L, "the quick brown fox jumps the quick wall"))
      .toDF("doc_id", "text")
    graft.analysis.NgramLm.lmIndexBuild(model, idxPath)

    val results = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.lmScoreStream(spark,
      input.toDF().toDF("doc_id", "text"), idxPath) { (scored, batchId) =>
      val rows = scored.collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      results.synchronized { results(batchId) = rows }
    }.start()
    input.addData((1L, "the quick brown fox"), (2L, "unseen words only here"))
    q.processAllAvailable(); q.stop()

    val batchScores = graft.analysis.NgramLm.lmScoreIndexed(spark, idxPath,
      Seq((1L, "the quick brown fox"), (2L, "unseen words only here"))
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(results(0L) === batchScores)
    // the in-model doc scores strictly above the out-of-model doc
    val m = batchScores.toMap
    assert(m(1L) > m(2L))
  }

  test("classifyStream predicts micro-batches exactly like the batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    val model = graft.analysis.Classify.centroidTrain(Seq(
      ("ball goal ball", "sport"),
      ("cake bread cake", "food")).toDF("text", "label"))

    val results = scala.collection.mutable.Map.empty[Long, Set[(Long, String)]]
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.classifyStream(spark,
      input.toDF().toDF("doc_id", "text"), model) { (scored, batchId) =>
      val rows = scored.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      results.synchronized { results(batchId) = rows }
    }.start()
    input.addData((1L, "ball ball goal"), (2L, "bread cake"), (3L, "zzz"))
    q.processAllAvailable()
    input.addData((4L, "goal goal"))
    q.processAllAvailable(); q.stop()

    // per-batch output equals the batch operator on the same rows — incl.
    // the emit-less no-overlap doc
    assert(results(0L) === Set(1L -> "sport", 2L -> "food"))
    assert(results(1L) === Set(4L -> "sport"))
  }

  test("decontaminateStream drops benchmark-overlapping docs at ingest") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq("the secret benchmark question about owls")
      .toDF("text")

    val results = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.decontaminateStream(spark,
      input.toDF().toDF("doc_id", "text"), benchmark, n = 4) {
      (clean, batchId) =>
        val ids = clean.select("doc_id").collect().map(_.getLong(0)).toSet
        results.synchronized { results(batchId) = ids }
    }.start()
    input.addData(
      (1L, "a clean training document with plain words"),
      (2L, "contains the secret benchmark question about owls verbatim"),
      (3L, "another unrelated document"))
    q.processAllAvailable(); q.stop()

    assert(results(0L) === Set(1L, 3L))
    // equals the batch operator on the same rows
    val batch = Decontaminate.decontaminate(
      Seq((1L, "a clean training document with plain words"),
        (2L, "contains the secret benchmark question about owls verbatim"),
        (3L, "another unrelated document")).toDF("doc_id", "text"),
      "doc_id", "text", benchmark, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(results(0L) === batch)
  }
}
