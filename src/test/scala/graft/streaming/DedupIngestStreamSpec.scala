package graft.streaming

import graft.SparkTestBase
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous ingest dedup: per micro-batch probe → drop → append →
  * emit. The index is the only state, so a later batch must be deduped
  * against EARLIER BATCHES' survivors, not just the initial corpus. */
class DedupIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("batches dedup against the initial corpus AND earlier batches") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("ingest-idx")
      .resolve("idx").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark engines and parquet files")
    ).toDF("doc_id", "text")
    Dedup.minhashIndexBuild(corpus, "text", "doc_id", idxPath,
      shingleK = 3, numHashes = 64, bands = 32)

    val emitted = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.dedupIngestStream(spark,
      input.toDF().toDF("doc_id", "text"), idxPath,
      "text", "doc_id", threshold = 0.5) { (fresh, batchId) =>
      emitted.synchronized {
        emitted(batchId) = fresh.select("doc_id").as[Long].collect().toSet
      }
    }.start()

    // batch 0: one dup of the initial corpus (dropped), one novel doc
    input.addData(
      (101L, "the quick brown fox jumps over the lazy dog today"),
      (102L, "a totally new take on distributed columnar indexes"))
    q.processAllAvailable()
    // batch 1: a near-dup of batch 0's SURVIVOR (dropped — proves the
    // append made 102 visible), plus one more novel doc
    input.addData(
      (201L, "a totally new take on distributed columnar indexes again"),
      (202L, "unrelated text about watermarks and session windows"))
    q.processAllAvailable()
    q.stop()

    assert(emitted(0L) === Set(102L), s"batch 0 emitted ${emitted(0L)}")
    assert(emitted(1L) === Set(202L), s"batch 1 emitted ${emitted(1L)}")
    // the index holds initial corpus + both survivors, nothing else
    val stored = spark.read.parquet(s"$idxPath/sets")
      .select("id").as[Long].collect().toSet
    assert(stored === Set(1L, 2L, 102L, 202L))
  }

  test("a replayed batch overwrites its own installment and re-emits (r15)") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("ingest-replay")
      .resolve("idx").toString
    Dedup.minhashIndexBuild(Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"),
      "text", "doc_id", idxPath, shingleK = 3, numHashes = 64, bands = 32)
    def runBatch0(): Set[Long] = {
      var got: Set[Long] = null
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.dedupIngestStream(spark,
        input.toDF().toDF("doc_id", "text"), idxPath,
        "text", "doc_id", threshold = 0.5) { (fresh, _) =>
        got = fresh.select("doc_id").as[Long].collect().toSet
      }.start()
      input.addData(
        (101L, "the quick brown fox jumps over the lazy dog today"),
        (102L, "a totally new take on distributed columnar indexes"))
      q.processAllAvailable()
      q.stop()
      got
    }
    val first = runBatch0()
    val rowsAfterFirst = spark.read.parquet(s"$idxPath/sets").count()
    // a fresh checkpointless stream re-delivers batchId 0 — the
    // at-least-once replay. The probe pins asOf inst-1 (its own
    // completed append excluded, no self-match suppression), so the
    // SAME survivor set re-emits, and AppendAt overwrites its own
    // installment instead of minting a duplicate one.
    val replay = runBatch0()
    assert(first === Set(102L) && replay === Set(102L),
      s"first=$first replay=$replay")
    assert(spark.read.parquet(s"$idxPath/sets").count() === rowsAfterFirst,
      "the replay must not grow the index")
    assert(spark.read.parquet(s"$idxPath/sets")
      .select("id").as[Long].collect().toSet === Set(1L, 102L))
  }
}
