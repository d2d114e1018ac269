package graft.streaming

import graft.SparkTestBase
import graft.pipeline.SpanDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous window-index ingest: per micro-batch installment appends
  * must leave probes identical to a one-shot build over everything, and
  * replays must be idempotent. */
class SpanIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six")
  ).toDF("doc_id", "text")

  private val probe = Seq(
    (100L, "intro alpha beta gamma delta outro"),
    (101L, "seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  private def probed(path: String) =
    SpanDedup.spanIndexProbe(spark, path, probe)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("streamed batches probe identically to a one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("span-stream")
      .resolve("idx").toString
    SpanDedup.spanIndexBuild(seed, idxPath, k = 4)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.spanIngestStream(spark,
      input.toDF().toDF("doc_id", "text"), idxPath) { id =>
      batches.synchronized { batches += id }
    }.start()
    input.addData((10L, "seven eight nine ten context words"))
    q.processAllAvailable()
    input.addData((11L, "more nine ten eleven twelve tail"))
    q.processAllAvailable()
    q.stop()
    assert(batches.toSet === Set(0L, 1L))

    val streamed = probed(idxPath)
    val onePath = java.nio.file.Files.createTempDirectory("span-oneshot")
      .resolve("idx").toString
    SpanDedup.spanIndexBuild(seed.unionByName(Seq(
      (10L, "seven eight nine ten context words"),
      (11L, "more nine ten eleven twelve tail")
    ).toDF("doc_id", "text")), onePath, k = 4)
    assert(streamed === probed(onePath))
    // both probe docs must have lost their duplicated spans
    assert(streamed.forall(_._3 > 0))
  }

  test("replaying an installment overwrites instead of duplicating deltas") {
    val idxPath = java.nio.file.Files.createTempDirectory("span-replay")
      .resolve("idx").toString
    SpanDedup.spanIndexBuild(seed, idxPath, k = 4)
    val batch = Seq((10L, "seven eight nine ten context words"))
      .toDF("doc_id", "text")
    val inst = EventStreams.StreamInstallmentBase
    SpanDedup.spanIndexAppendAt(spark, idxPath, batch, inst)
    val once = probed(idxPath)
    val sizeOnce = spark.read.parquet(s"$idxPath/wins").count()
    SpanDedup.spanIndexAppendAt(spark, idxPath, batch, inst)
    assert(probed(idxPath) === once)
    assert(spark.read.parquet(s"$idxPath/wins").count() === sizeOnce,
      "replayed installment must not mint duplicate delta rows")
  }
}
