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

  test("IVF-PQ ingest stream: streamed == batch appends; replays overwrite (r17)") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("ivfpq-stream")
      .resolve("idx").toString
    val seed = embs.filter($"vec_id" < 50)
    Pq.ivfPqBuild(seed, idxPath, nlist = 4, m = 8, ksub = 16,
      storeRaw = true)
    val b1 = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.ivfPqIngestStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idxPath)().start()
    input.addData(b1: _*)
    q.processAllAvailable()
    // the replay contract: re-process the same batch id by a fresh
    // stream over the same data -> dynamic overwrite, no duplicates
    q.stop()
    val queries = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val streamed = Pq.ivfPqSearch(spark, idxPath, queries, k = 5,
        nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val batchPath = java.nio.file.Files.createTempDirectory("ivfpq-batch")
      .resolve("idx").toString
    Pq.ivfPqBuild(seed, batchPath, nlist = 4, m = 8, ksub = 16,
      storeRaw = true)
    Pq.ivfPqAppendAt(spark, batchPath,
      embs.filter($"vec_id" >= 50 && $"vec_id" < 60),
      EventStreams.StreamInstallmentBase)
    val batched = Pq.ivfPqSearch(spark, batchPath, queries, k = 5,
        nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed === batched)
    assert(streamed.nonEmpty)
    // raw sidecar rode the streamed ingest (lockstep through streams)
    assert(spark.read.parquet(s"$idxPath/raw").count() === 60)
    // replay: same ingest number again -> no duplicates in codes OR raw
    Pq.ivfPqAppendAt(spark, idxPath,
      embs.filter($"vec_id" >= 50 && $"vec_id" < 60),
      EventStreams.StreamInstallmentBase)
    assert(spark.read.parquet(s"$idxPath/codes").count() === 60)
    assert(spark.read.parquet(s"$idxPath/raw").count() === 60)
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
