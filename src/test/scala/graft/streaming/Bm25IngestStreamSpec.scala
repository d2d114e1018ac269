package graft.streaming

import graft.SparkTestBase
import graft.index.Bm25
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous BM25 ingest: per micro-batch installment appends must leave
  * the index bit-identical to a one-shot build over everything, and
  * foreachBatch replays must be idempotent by installment numbering. */
class Bm25IngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a tour of spark catalyst and tungsten internals")
  ).toDF("doc_id", "text")

  test("streamed batches search bit-identically to a one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("bm25-stream")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(seed, idxPath)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.bm25IngestStream(spark,
      input.toDF().toDF("doc_id", "text"), idxPath) { id =>
      batches.synchronized { batches += id }
    }.start()
    input.addData(
      (10L, "lazy evaluation makes spark plans composable"),
      (11L, "dogs and foxes are mammals"))
    q.processAllAvailable()
    input.addData((20L, "quick quick quick repetition stresses tf"))
    q.processAllAvailable()
    q.stop()
    assert(batches.toSet === Set(0L, 1L))

    val queries = Seq((100L, "quick fox"), (101L, "spark plans"))
      .toDF("query_id", "qtext")
    val streamed = Bm25.bm25SearchIndexed(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val onePath = java.nio.file.Files.createTempDirectory("bm25-oneshot")
      .resolve("idx").toString
    val all = seed.unionByName(Seq(
      (10L, "lazy evaluation makes spark plans composable"),
      (11L, "dogs and foxes are mammals"),
      (20L, "quick quick quick repetition stresses tf")
    ).toDF("doc_id", "text"))
    Bm25.bm25IndexBuild(all, onePath)
    val oneShot = Bm25.bm25SearchIndexed(spark, onePath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    assert(streamed === oneShot)
    assert(streamed.nonEmpty)
  }

  test("replaying an installment overwrites instead of double-counting") {
    val idxPath = java.nio.file.Files.createTempDirectory("bm25-replay")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(seed, idxPath)
    val batch = Seq((10L, "lazy evaluation makes spark plans composable"))
      .toDF("doc_id", "text")
    val inst = EventStreams.StreamInstallmentBase
    Bm25.bm25IndexAppendAt(spark, idxPath, batch, inst)
    val queries = Seq((100L, "spark plans")).toDF("query_id", "qtext")
    val once = Bm25.bm25SearchIndexed(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    // the at-least-once replay: same batch, same installment number
    Bm25.bm25IndexAppendAt(spark, idxPath, batch, inst)
    val twice = Bm25.bm25SearchIndexed(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(twice === once, "replayed installment must not change df/N/avgdl")

    // a blind auto-numbered re-append WOULD double-count (the contract
    // the explicit numbering exists to prevent)
    Bm25.bm25IndexAppend(spark, idxPath, batch.withColumn("doc_id",
      org.apache.spark.sql.functions.lit(99L)))
    val polluted = Bm25.bm25SearchIndexed(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(polluted !== once)
  }
}
