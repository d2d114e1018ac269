package graft.streaming

import graft.SparkTestBase
import graft.index.Quantize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous int8 ingest: streamed installments must search identically
  * to batch appends of the same vectors, and replays must overwrite. */
class Int8IngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("streamed batches search identically to batch appends") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("int8-stream")
      .resolve("idx").toString
    val seed = embs.filter($"vec_id" < 50)
    Quantize.int8Build(seed, idxPath)

    val b1 = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
      .as[(Long, Array[Float])].collect().toSeq
    val b2 = embs.filter($"vec_id" >= 60 && $"vec_id" < 70)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.int8IngestStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idxPath)().start()
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val queries = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val streamed = Quantize.int8SearchIndexed(spark, idxPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val batchPath = java.nio.file.Files.createTempDirectory("int8-batch")
      .resolve("idx").toString
    Quantize.int8Build(seed, batchPath)
    Quantize.int8Append(spark, batchPath, embs.filter($"vec_id" >= 50 && $"vec_id" < 60))
    Quantize.int8Append(spark, batchPath, embs.filter($"vec_id" >= 60 && $"vec_id" < 70))
    val batched = Quantize.int8SearchIndexed(spark, batchPath, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    assert(streamed === batched)
    assert(streamed.nonEmpty)
  }

  test("replaying an installment overwrites instead of duplicating") {
    val idxPath = java.nio.file.Files.createTempDirectory("int8-replay")
      .resolve("idx").toString
    Quantize.int8Build(embs.filter($"vec_id" < 50), idxPath)
    val batch = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
    val inst = EventStreams.StreamInstallmentBase
    Quantize.int8AppendAt(spark, idxPath, batch, inst)
    val rowsOnce = spark.read.parquet(s"$idxPath/codes").count()
    Quantize.int8AppendAt(spark, idxPath, batch, inst)
    val rowsTwice = spark.read.parquet(s"$idxPath/codes").count()
    assert(rowsTwice === rowsOnce, "replay must not duplicate code rows")
  }
}
