package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int): Seq[(Long, Long, String)] =
    Chunking.chunkByTokens(Seq((1L, text)).toDF("id", "text"), "id", "text", w, s)
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("overlapping windows advance by stride and reach the last token") {
    // 7 tokens, window 4, stride 2 → ceil(3/2)+1 = 3 chunks
    val got = chunks("a b c d e f g", 4, 2)
    assert(got === Seq(
      (0L, 4L, "a b c d"),
      (1L, 4L, "c d e f"),
      (2L, 3L, "e f g")))
  }

  test("short and empty docs yield exactly one chunk") {
    assert(chunks("a b", 4, 2) === Seq((0L, 2L, "a b")))
    assert(chunks("   ", 4, 2) === Seq((0L, 0L, "")))
  }

  test("stride == window gives disjoint full-coverage packing") {
    val got = chunks("a b c d e f g h i", 3, 3)
    assert(got.map(_._3) === Seq("a b c", "d e f", "g h i"))
  }

  test("every token position is covered and overlaps match the stride") {
    val n = 53; val w = 8; val s = 5
    val text = (1 to n).map(i => s"t$i").mkString(" ")
    val got = chunks(text, w, s)
    assert(got.size === ((n - w + s - 1) / s + 1))
    got.zipWithIndex.foreach { case ((idx, len, body), i) =>
      assert(idx === i.toLong)
      val toks = body.split(" ")
      assert(toks.head === s"t${i * s + 1}") // window starts at stride*i
      assert(len === math.min(w, n - i * s).toLong)
    }
    assert(got.last._3.endsWith(s"t$n")) // last window reaches the end
  }

  test("chunking is a pure map — no shuffle, no interpreted array lambda") {
    val df = Chunking.chunkByTokens(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", "text", 64, 48)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    // the kernel is a single per-row UDF — never transform(sequence(...)),
    // whose lambda evaluates interpreted per element (CodegenFallback)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("transform("),
      s"chunking must not use an array HOF lambda:\n$optimized")
  }

  test("null text yields zero chunk rows") {
    val got = Chunking.chunkByTokens(
      Seq((1L, "a b"), (2L, null)).toDF("id", "text"), "id", "text", 4, 2)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  // ------------------------------------------- oversized-doc segmentation

  test("segmentByTokens: whales split byte-exactly, short docs pass through with metadata") {
    val df = Seq(
      (1L, "en", "a b c d e f g h i j"), // 10 tokens — the whale
      (2L, "de", "x y")                  // under the limit
    ).toDF("doc_id", "lang", "text")
    val got = Chunking.segmentByTokens(df, "doc_id", "text", maxTokens = 4)
      .select("doc_id", "lang", "seg_idx", "seg_key", "n_seg_tokens", "text")
      .as[(Long, String, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._3))
    assert(got.filter(_._1 == 1L).map(r => (r._3, r._5, r._6)).toSeq === Seq(
      (0L, 4L, "a b c d"), (1L, 4L, "e f g h"), (2L, 2L, "i j")))
    // short doc: single segment, text unchanged, metadata travels
    assert(got.filter(_._1 == 2L).toSeq ===
      Seq((2L, "de", 0L, (2L << 20) + 0L, 2L, "x y")))
    // seg_key packs (doc, position): key order == document order
    assert(got.map(_._4).toSeq === got.map(_._4).sorted.toSeq)
    assert(got.head._4 === (1L << 20))
    // overlap: stride = max - overlap, last segment reaches the end
    val ov = Chunking.segmentByTokens(df.filter($"doc_id" === 1L),
        "doc_id", "text", maxTokens = 4, overlap = 1)
      .select("seg_idx", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(ov.map(_._2).toSeq ===
      Seq("a b c d", "d e f g", "g h i j"))
  }

  test("segmentByTokens guards: key overflow raises, reserved names reject") {
    val bad = Seq((-1L, "a b c d e")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Chunking.segmentByTokens(bad, "doc_id", "text", 2).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("seg_key would overflow"), msgs)
    intercept[IllegalArgumentException] {
      Chunking.segmentByTokens(
        Seq((1L, "a", 0L)).toDF("doc_id", "text", "seg_key"),
        "doc_id", "text", 2)
    }
    intercept[IllegalArgumentException] {
      Chunking.segmentByTokens(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 4, overlap = 4)
    }
  }

  test("segment-then-pack: no bin exceeds budget except by one straddling segment") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val budget = 64L
    val segs = Chunking.segmentByTokens(docs, "doc_id", "text", maxTokens = 32)
    // every segment is whale-free by construction
    assert(segs.filter($"n_seg_tokens" > 32).isEmpty)
    val packed = Packing.packByTokenBudget(segs, "seg_key", "n_seg_tokens",
      "lang", budget, nShards = 4)
    val bins = packed.groupBy("lang", "shard", "bin")
      .agg(sum("n_seg_tokens").as("tot"), max("n_seg_tokens").as("mx"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(bins.nonEmpty)
    bins.foreach { case (lang, shard, bin, tot, mx, n) =>
      // a bin overshoots only by (part of) its straddling LAST segment,
      // which is itself <= maxTokens — the whale-isolation failure mode
      // (a single doc >> budget in its own bin) is structurally gone
      assert(tot < budget + 32,
        s"bin ($lang,$shard,$bin) holds $tot tokens over $n segments")
      assert(mx <= 32)
    }
    // without segmentation the corpus DOES have whales that overflow bins
    val raw = docs.select(col("doc_id"), col("lang"),
      graft.analysis.TextMetrics.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    assert(raw.filter($"n_tokens" > budget).count() > 0,
      "fixture must contain over-budget docs for this test to bite")
  }
}
