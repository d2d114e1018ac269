package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted video frame-hash index (the ninth index family): containment
  * probes must equal the one-shot videoContainmentDups restricted to
  * stored×batch pairs, across appends, snapshots, tombstones, and
  * compaction; the df guard must resolve from summed deltas; the stored
  * side must never shuffle. */
class VideoIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  // real fixture videos (doc_id % 3 == 2 are P6 frame streams) hashed by
  // the real parser, and clipped twins (even frames only) whose distinct
  // hash sets are subsets — containment 1.0 by construction
  private lazy val media = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" % 3 === 2).limit(60)
    graft.multimodal.Multimodal.syntheticMedia(docs, "doc_id", "text")
  }
  private lazy val frames =
    graft.multimodal.Multimodal.videoFrameHashes(media).toDF()
      .select(col("id"), col("frame_idx"), col("ahash"))
  private lazy val clippedTwins = {
    import spark.implicits._
    val twins = media.map { m =>
      val fs = graft.multimodal.Multimodal.decodeFrames(m.payload)
      val out = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < fs.length) {
        if (f % 2 == 0)
          out.write(graft.multimodal.Multimodal.encodePpm(
            m.meta.width, m.meta.height, fs(f)))
        f += 1
      }
      graft.multimodal.Multimodal.MediaRow(m.id + 1000000L, out.toByteArray, m.meta)
    }
    graft.multimodal.Multimodal.videoFrameHashes(twins).toDF()
      .select(col("id"), col("frame_idx"), col("ahash"))
  }

  private def oneShotPairs(): Set[(Long, Long, Long, Double)] = {
    // the one-shot operator over corpus ∪ twins, restricted to cross pairs
    val clipped = media.map { m =>
      val fs = graft.multimodal.Multimodal.decodeFrames(m.payload)
      val out = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < fs.length) {
        if (f % 2 == 0)
          out.write(graft.multimodal.Multimodal.encodePpm(
            m.meta.width, m.meta.height, fs(f)))
        f += 1
      }
      graft.multimodal.Multimodal.MediaRow(m.id + 1000000L, out.toByteArray, m.meta)
    }
    graft.multimodal.Multimodal.videoContainmentDups(
        media.unionByName(clipped), threshold = 0.9, maxDocFreq = 100000)
      .filter($"id_a" < 1000000L && $"id_b" >= 1000000L)
      .as[(Long, Long, Long, Double)].collect().toSet
  }

  test("probe equals the one-shot containment join restricted to stored x batch") {
    val path = tmp("vx-idx")
    Dedup.videoIndexBuild(frames.filter($"id" % 2 === 0), path)
    Dedup.videoIndexAppend(spark, path, frames.filter($"id" % 2 === 1))
    val probed = Dedup.videoContainmentProbe(spark, path, clippedTwins,
        threshold = 0.9, maxDocFreq = 100000)
      .as[(Long, Long, Long, Double)].collect().toSet
    val oneShot = oneShotPairs()
    assert(probed === oneShot)
    // every twin pairs with its own original at containment 1.0 (the
    // clipped hash set is a subset of the original's by construction)
    assert(probed.count { case (a, b, _, c) => b == a + 1000000L && c == 1.0 }
      === media.count().toInt)
    assert(probed.nonEmpty)
  }

  test("asOf pins the stored side; tombstones apply to every read; compact folds") {
    val path = tmp("vx-del")
    val evenIds = frames.filter($"id" % 2 === 0)
    Dedup.videoIndexBuild(evenIds, path)
    Dedup.videoIndexAppend(spark, path, frames.filter($"id" % 2 === 1))
    val full = Dedup.videoContainmentProbe(spark, path, clippedTwins,
        threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect().toSet
    val snap = Dedup.videoContainmentProbe(spark, path, clippedTwins,
        threshold = 0.9, asOfInstallment = 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(snap === full.filter(_._1 % 2 == 0), "snapshot must prune the append")

    // tombstone one video: its pairs vanish, snapshots included (takedown)
    val victim = full.head._1
    Dedup.videoIndexDelete(spark, path, Seq(victim).toDF("id"))
    val afterDel = Dedup.videoContainmentProbe(spark, path, clippedTwins,
        threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(afterDel === full.filterNot(_._1 == victim), "tombstone leaked")
    if (victim % 2 == 0)
      assert(Dedup.videoContainmentProbe(spark, path, clippedTwins,
          threshold = 0.9, asOfInstallment = 0)
        .filter($"corpus_id" === victim).isEmpty,
        "takedown must apply to snapshot reads")

    // double-delete nets zero df deltas (self-enforced live-ids contract)
    Dedup.videoIndexDelete(spark, path, Seq(victim).toDF("id"))
    val dfSums = spark.read.parquet(s"$path/dfs")
      .groupBy("h").agg(sum("c").as("c")).filter($"c" < 0)
    assert(dfSums.isEmpty, "double-delete drove df deltas negative")

    // physical fold: deletes cleared, sizes/dfs recomputed, results kept
    val survivors = Dedup.videoIndexCompact(spark, path)
    assert(!graft.store.Tombstones.any(spark, path))
    assert(spark.read.parquet(s"$path/frames").filter($"id" === victim).isEmpty)
    assert(survivors ===
      frames.select("id").distinct().count() - 1)
    assert(Dedup.videoContainmentProbe(spark, path, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet === afterDel)
  }

  test("hot hashes are guarded via summed stored dfs; batch side shrinks, not stored") {
    val path = tmp("vx-hot")
    // synthetic: hash 7 is in every stored video (a test card); hash
    // 100+id is unique per video
    val stored = (1L to 5L).flatMap(id =>
      Seq((id, 0, 7L), (id, 1, 100L + id))).toDF("id", "frame_idx", "ahash")
    Dedup.videoIndexBuild(stored, path)
    val batch = Seq((101L, 0, 7L), (101L, 1, 101L)).toDF("id", "frame_idx", "ahash")
    // unguarded: batch {7, 101} vs stored 1 {7, 101} → containment 1.0;
    // vs stored 2..5 share only 7 → 0.5
    val unguarded = Dedup.videoContainmentProbe(spark, path, batch,
        threshold = 0.4, maxDocFreq = 100000)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(unguarded.size === 5)
    // guard at 4: hash 7 (df 5) prunes; only the shared-101 pair survives,
    // its containment still over the FULL set sizes
    val guarded = Dedup.videoContainmentProbe(spark, path, batch,
        threshold = 0.4, maxDocFreq = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(guarded === Set((1L, 101L, 1L, 0.5)))
  }

  test("replay-idempotent appends: AppendAt overwrites its own partitions") {
    val path = tmp("vx-replay")
    Dedup.videoIndexBuild(frames.filter($"id" % 2 === 0), path)
    val b = frames.filter($"id" % 2 === 1)
    Dedup.videoIndexAppendAt(spark, path, b, 7)
    val once = Dedup.videoContainmentProbe(spark, path, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet
    Dedup.videoIndexAppendAt(spark, path, b, 7) // replay
    val twice = Dedup.videoContainmentProbe(spark, path, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet
    assert(twice === once, "replayed append must overwrite, not duplicate")
  }

  test("prune: contained batch videos drop, batch-only groups keep-min, rest survive") {
    val path = tmp("vx-prune")
    // stored: videos 1..3 with distinct frame sets
    val stored = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L),
      (2L, 0, 20L), (2L, 1, 21L),
      (3L, 0, 30L), (3L, 1, 31L), (3L, 2, 32L), (3L, 3, 33L)
    ).toDF("id", "frame_idx", "ahash")
    Dedup.videoIndexBuild(stored, path)
    val batch = Seq(
      // 101: clipped copy of stored 1 (subset) → anchored, drops
      (101L, 0, 10L), (101L, 1, 12L),
      // 102/103: batch-only near-dup pair (103 ⊂ 102) → keep-min 102
      (102L, 0, 40L), (102L, 1, 41L), (102L, 2, 42L),
      (103L, 0, 40L), (103L, 1, 41L),
      // 104: nothing like it → survives
      (104L, 0, 50L), (104L, 1, 51L)
    ).toDF("id", "frame_idx", "ahash")
    val surv = Dedup.videoIndexPrune(spark, path, batch, threshold = 0.9)
    assert(surv.columns.toSeq === batch.columns.toSeq)
    assert(surv.select("id").distinct().as[Long].collect().toSet
      === Set(102L, 104L))
    // survivors carry ALL their frames, ready for videoIndexAppend
    assert(surv.filter($"id" === 102L).count() === 3)
    val viaBroadcast = Dedup.videoIndexPrune(spark, path, batch,
      threshold = 0.9, broadcastDrop = true)
    assert(viaBroadcast.select("id").distinct().as[Long].collect().toSet
      === Set(102L, 104L))
    val e = intercept[IllegalArgumentException] {
      Dedup.videoIndexPrune(spark, path, batch.withColumn("_vc_x", lit(1)))
    }
    assert(e.getMessage.contains("_vc_"))
  }

  test("dedup-ingest stream prunes per batch and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("vx-dstream")
    Dedup.videoIndexBuild(Seq((1L, 0, 10L), (1L, 1, 11L))
      .toDF("id", "frame_idx", "ahash"), path)
    val kept = scala.collection.mutable.Map.empty[Long, Long]
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Long)]
    val q = graft.streaming.EventStreams.videoDedupIngestStream(spark,
      input.toDF().toDF("id", "frame_idx", "ahash"), path) {
      (b, n) => kept.synchronized { kept(b) = n }
    }.start()
    // b1: 101 is a clipped copy of stored 1 → drops; 102 survives
    input.addData((101L, 0, 10L), (102L, 0, 40L), (102L, 1, 41L))
    q.processAllAvailable()
    // b2: 202 is a clipped copy of the b1 SURVIVOR 102 → the index grew
    input.addData((202L, 0, 40L), (203L, 0, 50L))
    q.processAllAvailable()
    q.stop()
    assert(kept(0L) === 1L, s"b1: only 102 should survive, got $kept")
    assert(kept(1L) === 1L, s"b2: only 203 should survive, got $kept")
    // replay the foreachBatch body at a fixed installment: the as-of probe
    // excludes its own partition, so a retry cannot self-match to empty
    val inst = graft.streaming.EventStreams.StreamInstallmentBase + 50
    val b = Seq((301L, 0, 10L), (301L, 1, 11L), (302L, 0, 60L))
      .toDF("id", "frame_idx", "ahash")
    def attempt(): Set[Long] = {
      val s = Dedup.videoIndexPrune(spark, path, b,
        asOfInstallment = inst - 1)
      Dedup.videoIndexAppendAt(spark, path, s, inst)
      Dedup.release(s)
      spark.read.parquet(s"$path/frames/installment=$inst")
        .select("id").distinct().as[Long].collect().toSet
    }
    val first = attempt()
    assert(first === Set(302L)) // 301 is stored 1's frame set verbatim
    assert(attempt() === first, "replay must reproduce, not self-match to empty")
  }

  test("streamed ingest equals batch appends; replays overwrite their partitions") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("vx-stream")
    Dedup.videoIndexBuild(frames.filter($"id" % 2 === 0), path)
    val oddRows = frames.filter($"id" % 2 === 1)
      .as[(Long, Int, Long)].collect().toSeq
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Long)]
    val q = graft.streaming.EventStreams.videoIngestStream(spark,
      input.toDF().toDF("id", "frame_idx", "ahash"), path)().start()
    input.addData(oddRows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = Dedup.videoContainmentProbe(spark, path, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet
    val batchPath = tmp("vx-stream-b")
    Dedup.videoIndexBuild(frames.filter($"id" % 2 === 0), batchPath)
    Dedup.videoIndexAppend(spark, batchPath, frames.filter($"id" % 2 === 1))
    val batched = Dedup.videoContainmentProbe(spark, batchPath, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed === batched, "stream ingest must equal batch appends")
    // replay: AppendAt at the streamed installment reproduces all three
    // partitions (sizes/dfs included), so results cannot drift
    val inst = graft.streaming.EventStreams.StreamInstallmentBase + 0
    Dedup.videoIndexAppendAt(spark, path, frames.filter($"id" % 2 === 1), inst)
    assert(Dedup.videoContainmentProbe(spark, path, clippedTwins,
      threshold = 0.9).as[(Long, Long, Long, Double)].collect().toSet === streamed)
  }

  test("the stored index is never shuffled by a probe — batch side broadcasts") {
    val path = tmp("vx-plan")
    Dedup.videoIndexBuild(frames, path)
    val plan = Dedup.videoContainmentProbe(spark, path, clippedTwins)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch hashes must broadcast into the stored scan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the stored frame scan must stream map-side, never shuffle:\n$plan")
  }
}
