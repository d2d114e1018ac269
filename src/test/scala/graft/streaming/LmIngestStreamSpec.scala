package graft.streaming

import graft.SparkTestBase
import graft.analysis.NgramLm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous LM-count ingest: per micro-batch installment appends must
  * leave the model scoring bit-identically to a one-shot build over
  * everything, and foreachBatch replays must be idempotent. */
class LmIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a tour of spark catalyst and tungsten internals")
  ).toDF("doc_id", "text")

  private val probe = Seq(
    (100L, "the quick brown dog"),
    (101L, "spark internals for foxes")
  ).toDF("doc_id", "text")

  private def scores(path: String) =
    NgramLm.lmScoreIndexed(spark, path, probe)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("streamed count batches score bit-identically to a one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("lm-stream")
      .resolve("idx").toString
    NgramLm.lmIndexBuild(seed, idxPath)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.lmIngestStream(spark,
      input.toDF().toDF("doc_id", "text"), idxPath) { id =>
      batches.synchronized { batches += id }
    }.start()
    input.addData(
      (10L, "lazy evaluation makes spark plans composable"),
      (11L, "dogs and foxes are mammals"))
    q.processAllAvailable()
    input.addData((20L, "quick quick quick repetition stresses counts"))
    q.processAllAvailable()
    q.stop()
    assert(batches.toSet === Set(0L, 1L))

    val streamed = scores(idxPath)

    val onePath = java.nio.file.Files.createTempDirectory("lm-oneshot")
      .resolve("idx").toString
    NgramLm.lmIndexBuild(seed.unionByName(Seq(
      (10L, "lazy evaluation makes spark plans composable"),
      (11L, "dogs and foxes are mammals"),
      (20L, "quick quick quick repetition stresses counts")
    ).toDF("doc_id", "text")), onePath)
    assert(streamed === scores(onePath))
    assert(streamed.exists(_._3 > 0))
  }

  test("replaying an installment overwrites instead of double-counting") {
    val idxPath = java.nio.file.Files.createTempDirectory("lm-replay")
      .resolve("idx").toString
    NgramLm.lmIndexBuild(seed, idxPath)
    val batch = Seq((10L, "quick brown cats")).toDF("doc_id", "text")
    val inst = EventStreams.StreamInstallmentBase
    NgramLm.lmIndexAppendAt(spark, idxPath, batch, inst)
    val once = scores(idxPath)
    NgramLm.lmIndexAppendAt(spark, idxPath, batch, inst)
    assert(scores(idxPath) === once,
      "replayed installment must not change any count")
    // a blind auto-numbered re-append WOULD double-count
    NgramLm.lmIndexAppend(spark, idxPath, batch)
    assert(scores(idxPath) !== once)
  }
}
