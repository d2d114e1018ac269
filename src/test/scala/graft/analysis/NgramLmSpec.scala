package graft.analysis

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("hand-computed self-score on a fixed corpus") {
    // uni: a:3 b:3 c:1 x:1 (N=8); bi: "a b":3 "b a":1 "b c":1
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x"), (4L, " "))
      .toDF("doc_id", "text")
    val out = byId(NgramLm.selfScore(docs))
    // (a,b)=⌊1e6·3/3⌋=1000000  (b,a)=(b,c)=⌊1e6·1/3⌋=333333
    assert(out(0) === ((1L, 4L, 2666666L, 666666L)))
    assert(out(1) === ((2L, 1L, 1000000L, 1000000L)))
    assert(out(2) === ((3L, 0L, 0L, 0L)))  // 1 token → no pairs
    assert(out(3) === ((4L, 0L, 0L, 0L)))  // blank → no pairs
  }

  test("backoff branch: unseen bigram scores 2·Scale·c(w2)/(5·N)") {
    val model = Seq((1L, "a b")).toDF("doc_id", "text") // uni a:1 b:1, N=2
    val uni = NgramLm.unigramCounts(model)
    val bi = NgramLm.bigramCounts(model)
    val tot = NgramLm.totalTokens(model)
    val probe = Seq((10L, "b a"), (11L, "a c")).toDF("doc_id", "text")
    val out = byId(NgramLm.scoreDocs(probe, uni, bi, tot))
    // (b,a): backoff ⌊2e6·1/(5·2)⌋ = 200000 ; (a,c): c unseen → 0
    assert(out(0) === ((10L, 1L, 200000L, 200000L)))
    assert(out(1) === ((11L, 1L, 0L, 0L)))
  }

  test("minCount pruning drops singleton bigrams to the backoff branch") {
    val corpus = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    // bi "a b":2 kept at minCount=2; "b a":1, "b c":1 pruned
    val uni = NgramLm.unigramCounts(corpus, minCount = 2L) // a:2 b:3 kept, c pruned
    val bi = NgramLm.bigramCounts(corpus, minCount = 2L)
    val tot = NgramLm.totalTokens(corpus) // N=6 (pruning-independent)
    val out = byId(NgramLm.scoreDocs(corpus, uni, bi, tot))
    // d1: (a,b)=⌊1e6·2/2⌋=1e6, (b,a) backoff ⌊2e6·2/30⌋=133333, (a,b)=1e6
    assert(out(0) === ((1L, 3L, 2133333L, 711111L)))
    // d2: (b,c) backoff, c pruned → coalesce 0 → 0
    assert(out(1) === ((2L, 1L, 0L, 0L)))
  }

  test("shuffled-model path equals the broadcast path") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = NgramLm.selfScore(docs, broadcastModel = true)
    val b = NgramLm.selfScore(docs, broadcastModel = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("deterministic under repartitioning; avg bounded by Scale") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = byId(NgramLm.selfScore(docs))
    val b = byId(NgramLm.selfScore(docs.repartition(7)))
    assert(a.toSeq === b.toSeq)
    assert(a.length === docs.count())
    // seen-branch ≤ Scale; backoff < Scale — the fixed-point range contract
    assert(a.forall { case (_, _, _, avg) => avg >= 0 && avg <= NgramLm.Scale })
  }

  test("broadcast path plans hash joins, not sort-merge, for the lookups") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = NgramLm.selfScore(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "model lookups must not shuffle the pair stream in broadcast mode")
  }

  test("reserved internal names are guarded") {
    val docs = Seq((1L, "a b", 0L)).toDF("doc_id", "text", "_lm_s")
    intercept[IllegalArgumentException] {
      NgramLm.selfScore(docs)
    }
  }
}
