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

  test("dedup ingest prunes each batch against the corpus, then folds it in") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("int8-dedup-stream")
      .resolve("idx").toString
    val seed = embs.filter($"vec_id" < 50)
    Quantize.int8Build(seed, idxPath)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Array[Float])].collect().toSeq
    // b1: 5 fresh vectors + 2 exact twins of seed rows (must drop) + an
    // intra-batch duplicate pair 900/901 (keep-min: 900 survives)
    val fresh = rows(embs.filter($"vec_id" >= 50 && $"vec_id" < 55))
    val twins = rows(embs.filter($"vec_id" < 2)
      .select(($"vec_id" + 800L).as("vec_id"), $"embedding"))
    val dupPair = rows(embs.filter($"vec_id" === 10L)
      .select(lit(900L).as("vec_id"),
        transform($"embedding", x => -x).as("embedding")))
      .flatMap(r => Seq(r, (901L, r._2)))
    // b2: a twin of a B1 SURVIVOR (must drop — the index grew) + 1 fresh
    val b2twin = rows(embs.filter($"vec_id" === 50L)
      .select(lit(950L).as("vec_id"), $"embedding"))
    val b2fresh = rows(embs.filter($"vec_id" === 70L))

    val kept = scala.collection.mutable.Map.empty[Long, Long]
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.int8DedupIngestStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idxPath, threshold = 0.98) {
      (batchId, n) => kept.synchronized { kept(batchId) = n }
    }.start()
    input.addData((fresh ++ twins ++ dupPair): _*)
    q.processAllAvailable()
    input.addData((b2twin ++ b2fresh): _*)
    q.processAllAvailable()
    q.stop()

    assert(kept(0L) === 6L, s"b1: 5 fresh + dup-pair rep expected, got $kept")
    assert(kept(1L) === 1L, s"b2: only the fresh row expected, got $kept")
    val inst0 = EventStreams.StreamInstallmentBase
    val ids0 = spark.read.parquet(s"$idxPath/codes/installment=$inst0")
      .select("vec_id").as[Long].collect().toSet
    assert(ids0 === Set(50L, 51L, 52L, 53L, 54L, 900L))
    val ids1 = spark.read.parquet(s"$idxPath/codes/installment=${inst0 + 1}")
      .select("vec_id").as[Long].collect().toSet
    assert(ids1 === Set(70L))
  }

  test("dedup ingest replay reproduces the same survivors (as-of probe)") {
    val idxPath = java.nio.file.Files.createTempDirectory("int8-dedup-replay")
      .resolve("idx").toString
    Quantize.int8Build(embs.filter($"vec_id" < 50), idxPath)
    val inst = EventStreams.StreamInstallmentBase
    val batch = embs.filter($"vec_id" >= 50 && $"vec_id" < 55)
      .unionByName(embs.filter($"vec_id" < 2)
        .select(($"vec_id" + 800L).as("vec_id"), $"embedding"))
    // simulate the foreachBatch body twice with the same batchId: the
    // as-of probe must NOT see the first attempt's own installment, so
    // the replayed survivors are identical, not empty
    def attempt(): Set[Long] = {
      val survivors = Quantize.int8ProbePrune(spark, idxPath, batch, 0.98,
        asOfInstallment = inst - 1)
      Quantize.int8AppendAt(spark, idxPath, survivors, inst)
      graft.dedup.Dedup.release(survivors)
      spark.read.parquet(s"$idxPath/codes/installment=$inst")
        .select("vec_id").as[Long].collect().toSet
    }
    val first = attempt()
    val replay = attempt()
    assert(first === Set(50L, 51L, 52L, 53L, 54L))
    assert(replay === first, "replay must reproduce, not self-match to empty")
  }
}
