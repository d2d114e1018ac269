package graft.streaming

import graft.SparkTestBase
import graft.index.Pq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous PQ ingest: streamed installments must search identically
  * to batch appends of the same vectors (stored-codebook parity), and
  * replays must overwrite. */
class PqIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("streamed batches search identically to batch appends") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("pq-stream")
      .resolve("idx").toString
    val seed = embs.filter($"vec_id" < 50)
    Pq.pqBuild(seed, idxPath, m = 8, ksub = 16)

    val b1 = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
      .as[(Long, Array[Float])].collect().toSeq
    val b2 = embs.filter($"vec_id" >= 60 && $"vec_id" < 70)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.pqIngestStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idxPath)().start()
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val queries = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val streamed = Pq.pqSearch(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val batchPath = java.nio.file.Files.createTempDirectory("pq-batch")
      .resolve("idx").toString
    Pq.pqBuild(seed, batchPath, m = 8, ksub = 16)
    Pq.pqAppend(spark, batchPath,
      embs.filter($"vec_id" >= 50 && $"vec_id" < 60))
    Pq.pqAppend(spark, batchPath,
      embs.filter($"vec_id" >= 60 && $"vec_id" < 70))
    val batched = Pq.pqSearch(spark, batchPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    assert(streamed === batched)
    assert(streamed.nonEmpty)
  }

  test("replaying an installment overwrites instead of duplicating") {
    val idxPath = java.nio.file.Files.createTempDirectory("pq-replay")
      .resolve("idx").toString
    Pq.pqBuild(embs.filter($"vec_id" < 50), idxPath, m = 8, ksub = 16)
    val batch = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
    val inst = EventStreams.StreamInstallmentBase
    Pq.pqAppendAt(spark, idxPath, batch, inst)
    val rowsOnce = spark.read.parquet(s"$idxPath/codes").count()
    Pq.pqAppendAt(spark, idxPath, batch, inst)
    val rowsTwice = spark.read.parquet(s"$idxPath/codes").count()
    assert(rowsTwice === rowsOnce, "replay must not duplicate code rows")
  }
}
