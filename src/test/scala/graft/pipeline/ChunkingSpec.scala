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
}
