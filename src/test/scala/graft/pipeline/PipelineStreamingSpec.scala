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
}
