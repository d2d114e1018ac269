package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted 64-bit hamming index (the eighth index family): probes must
  * equal the one-shot banded join restricted to stored×batch pairs, across
  * appends, snapshots, tombstones, and compaction; pruning must apply the
  * anchored/keep-min policy; the stored side must never shuffle. */
class HammingIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  // hand hashes with known hamming structure (bit-sparse, no accidental
  // chunk collisions below the threshold)
  private val stored = Seq(
    (1L, 0x0000000000000000L),
    (2L, 0x00000000000000FFL),
    (3L, 0xF0F0F0F0F0F0F0F0L),
    (4L, 0x123456789ABCDEF0L)
  ).toDF("id", "h")

  // 101 = exact twin of 1; 102 = 1-bit off 3; 103 = far from everything;
  // 104/105 = an intra-batch duplicate pair, far from stored
  private val batch = Seq(
    (101L, 0x0000000000000000L),
    (102L, 0xF0F0F0F0F0F0F0F1L),
    (103L, 0x5555555555555555L),
    (104L, 0x0FF0000000000000L),
    (105L, 0x0FF0000000000001L)
  ).toDF("id", "h")

  test("probe finds stored twins at the exact threshold; appends fold in") {
    val path = tmp("hx-idx")
    Dedup.hammingIndexBuild(stored.filter($"id" <= 2), path, "id", "h")
    Dedup.hammingIndexAppend(spark, path, stored.filter($"id" > 2), "id", "h")
    val pairs = Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
        maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 101L, 0), (3L, 102L, 1)))
    // threshold 0: only the exact twin remains
    val exact = Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
        maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(exact === Set((1L, 101L, 0)))
  }

  test("asOf pins the stored side; tombstones apply to every read") {
    val path = tmp("hx-asof")
    Dedup.hammingIndexBuild(stored.filter($"id" <= 2), path, "id", "h")
    Dedup.hammingIndexAppend(spark, path, stored.filter($"id" > 2), "id", "h")
    val snap = Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
        maxHamming = 3, asOfInstallment = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(snap === Set((1L, 101L, 0)), s"snapshot leaked the append: $snap")
    Dedup.hammingIndexDelete(spark, path, Seq(1L).toDF("id"))
    val afterDel = Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
        maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(afterDel === Set((3L, 102L, 1)), s"tombstone leaked: $afterDel")
    // takedown semantics: the snapshot read is filtered too
    val snapDel = Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
        maxHamming = 3, asOfInstallment = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(snapDel.isEmpty, s"snapshot kept a tombstoned row: $snapDel")
    // compaction folds physically and preserves results
    val rows = Dedup.hammingIndexCompact(spark, path)
    assert(rows === 3L)
    assert(!graft.store.Tombstones.any(spark, path))
    assert(Dedup.hammingIndexProbe(spark, path, batch, "id", "h",
      maxHamming = 3).as[(Long, Long, Int)].collect().toSet === afterDel)
  }

  test("prune: anchored components drop, batch-only keep-min, rest survive") {
    val path = tmp("hx-prune")
    Dedup.hammingIndexBuild(stored, path, "id", "h")
    // 101 anchored by 1 → drops; 102 anchored by 3 → drops; {104, 105}
    // batch-only pair → 104 keeps, 105 drops; 103 untouched
    val survivors = Dedup.hammingIndexPrune(spark, path, batch, "id", "h",
        maxHamming = 3)
      .select("id").as[Long].collect().toSet
    assert(survivors === Set(103L, 104L))
    val viaBroadcast = Dedup.hammingIndexPrune(spark, path, batch, "id", "h",
      maxHamming = 3, broadcastDrop = true)
    assert(viaBroadcast.columns.toSeq === batch.columns.toSeq)
    assert(viaBroadcast.select("id").as[Long].collect().toSet === survivors)
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingIndexPrune(spark, path,
        batch.withColumn("_hx_x", lit(1)), "id", "h")
    }
    assert(e.getMessage.contains("_hx_"))
  }

  test("streamed dedup ingest prunes per batch and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("hx-stream")
    Dedup.hammingIndexBuild(stored, path, "id", "h")
    val kept = scala.collection.mutable.Map.empty[Long, Long]
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStreams.hammingDedupIngestStream(spark,
      input.toDF().toDF("id", "h"), path) {
      (b, n) => kept.synchronized { kept(b) = n }
    }.start()
    input.addData((101L, 0x0000000000000000L), (103L, 0x5555555555555555L))
    q.processAllAvailable()
    // b2: a twin of the b1 SURVIVOR 103 must drop — the index grew
    input.addData((203L, 0x5555555555555555L), (204L, 0xAAAA00000000AAAAL))
    q.processAllAvailable()
    q.stop()
    assert(kept(0L) === 1L, s"b1: only 103 should survive, got $kept")
    assert(kept(1L) === 1L, s"b2: only 204 should survive, got $kept")
    // replay: simulate the foreachBatch body twice at the same batch id
    val inst = graft.streaming.EventStreams.StreamInstallmentBase + 50
    val b = Seq((301L, 0x0000000000000000L), (302L, 0x00FF00FF00FF00FFL))
      .toDF("id", "h")
    def attempt(): Set[Long] = {
      val s = Dedup.hammingIndexPrune(spark, path, b, "id", "h",
        asOfInstallment = inst - 1)
      Dedup.hammingIndexAppendAt(spark, path, s, inst, "id", "h")
      Dedup.release(s)
      spark.read.parquet(s"$path/hashes/installment=$inst")
        .select("id").as[Long].collect().toSet
    }
    val first = attempt()
    assert(first === Set(302L)) // 301 is a twin of stored 1
    assert(attempt() === first, "replay must reproduce, not self-match to empty")
  }

  test("the stored index is never shuffled by a probe — batch side broadcasts") {
    val path = tmp("hx-plan")
    Dedup.hammingIndexBuild(stored, path, "id", "h")
    val plan = Dedup.hammingIndexProbe(spark, path, batch, "id", "h")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch chunks must broadcast into the stored scan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the stored hash scan must stream map-side, never shuffle:\n$plan")
  }

  test("probe equals the in-memory banded join restricted to stored x batch") {
    // real-data cross-check: image aHashes from the synthetic fixture
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(90)
      .filter($"doc_id" % 3 === 0)
    val media = graft.multimodal.Multimodal.syntheticMedia(docs, "doc_id", "text")
    val hashes = graft.multimodal.Multimodal.perceptualHashes(media).toDF()
      .select(col("id"), col("ahash"))
    val twins = hashes.select(($"id" + 1000L).as("id"), $"ahash")
    val path = tmp("hx-real")
    Dedup.hammingIndexBuild(hashes, path, "id", "ahash")
    val probed = Dedup.hammingIndexProbe(spark, path, twins, "id", "ahash",
        maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val oneShot = Dedup.hammingNearDuplicates64(
        hashes.unionByName(twins), "id", "ahash", maxHamming = 3)
      .filter($"id_a" < 1000L && $"id_b" >= 1000L)
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === oneShot)
    assert(probed.nonEmpty)
  }
}
