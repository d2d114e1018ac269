package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick tour of spark catalyst and tungsten internals"),
    (3L, "lazy evaluation makes spark plans composable"),
    (4L, "dogs and foxes are mammals"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("postings carry tf and dl over normalized tokens; empty docs drop out") {
    val p = Bm25.postings(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    val byDoc = p.groupBy(_._1)
    assert(!byDoc.contains(5L))
    // doc 1: "the" twice, 9 tokens
    val d1 = byDoc(1L).map(r => r._2 -> r._3).toMap
    assert(d1("the") === 2L && d1("fox") === 1L)
    assert(byDoc(1L).forall(_._4 === 9L))
  }

  test("a query matching one doc's exact words ranks that doc first") {
    val q = Seq((100L, "quick brown fox")).toDF("query_id", "qtext")
    val got = Bm25.bm25TopK(docs, q, k = 3)
      .orderBy("rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(got.head._2 === 1L, s"expected doc 1 first, got ${got.toSeq}")
    assert(got.map(_._3).sameElements(got.map(_._3).sorted.reverse),
      "scores must be non-increasing in rank")
    // only docs sharing a term appear: 1 (all), 2 (quick), 4 (none of
    // quick/brown/fox — 'foxes' does not stem-match)
    assert(got.map(_._2).toSet.subsetOf(Set(1L, 2L)))
  }

  test("rarer terms out-rank common ones at equal tf (idf monotone in df)") {
    // 'spark' appears in 2 docs, 'fox' in 1: a fox query must score doc 1
    // higher than a spark query scores doc 3 (same tf=1, comparable dl)
    val q = Seq((1L, "fox"), (2L, "spark")).toDF("query_id", "qtext")
    val got = Bm25.bm25TopK(docs, q, k = 1)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L), s"idf ordering violated: $got")
  }

  test("persisted index search equals the ad-hoc operator exactly") {
    val q = Seq((100L, "quick brown fox"), (101L, "spark plans")).toDF("query_id", "qtext")
    val adhoc = Bm25.bm25TopK(docs, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val path = java.nio.file.Files.createTempDirectory("bm25-idx")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs, path)
    val indexed = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(indexed === adhoc)
    assert(indexed.nonEmpty)
  }

  test("an empty corpus searches to an empty result, ad-hoc and indexed") {
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val q = Seq((1L, "anything")).toDF("query_id", "qtext")
    assert(Bm25.bm25TopK(empty, q, k = 3).isEmpty)
    val path = java.nio.file.Files.createTempDirectory("bm25-empty")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(empty, path)
    assert(Bm25.bm25SearchIndexed(spark, path, q, k = 3).isEmpty)
  }

  test("search-after-append equals the one-shot build exactly") {
    val q = Seq((100L, "quick brown fox"), (101L, "spark plans")).toDF("query_id", "qtext")
    val onePath = java.nio.file.Files.createTempDirectory("bm25-one")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs, onePath)
    val oneShot = Bm25.bm25SearchIndexed(spark, onePath, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val appPath = java.nio.file.Files.createTempDirectory("bm25-app")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter($"doc_id" % 2 === 0), appPath)
    Bm25.bm25IndexAppend(spark, appPath, docs.filter($"doc_id" % 2 === 1))
    val appended = Bm25.bm25SearchIndexed(spark, appPath, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    // df, N, and avgdl are sums of integer installment deltas, so the
    // scores are BIT-identical, not merely rank-identical
    assert(appended === oneShot)
    assert(appended.nonEmpty)
  }

  test("asOfInstallment pins a search to the pre-append snapshot") {
    val q = Seq((100L, "quick brown fox"), (101L, "spark plans")).toDF("query_id", "qtext")
    val basePath = java.nio.file.Files.createTempDirectory("bm25-snap-base")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter($"doc_id" <= 2), basePath)
    val buildOnly = Bm25.bm25SearchIndexed(spark, basePath, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val appPath = java.nio.file.Files.createTempDirectory("bm25-snap-app")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter($"doc_id" <= 2), appPath)
    Bm25.bm25IndexAppend(spark, appPath, docs.filter($"doc_id" > 2))
    // as-of 0: bit-identical to the build-only index (df/N/avgdl all
    // resolve from installment 0 alone)
    val snap = Bm25.bm25SearchIndexed(spark, appPath, q, k = 5,
      asOfInstallment = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(snap === buildOnly)
    val full = Bm25.bm25SearchIndexed(spark, appPath, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full !== snap, "appended docs must be visible to the full read")
  }

  test("compaction folds deltas to one installment and preserves results") {
    val q = Seq((100L, "quick brown fox")).toDF("query_id", "qtext")
    val path = java.nio.file.Files.createTempDirectory("bm25-cmp")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter($"doc_id" <= 2), path)
    Bm25.bm25IndexAppend(spark, path, docs.filter($"doc_id" === 3L))
    Bm25.bm25IndexAppend(spark, path, docs.filter($"doc_id" >= 4L))
    val before = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val nTerms = Bm25.bm25IndexCompact(spark, path)
    val after = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(after === before)
    // one delta row per term, one stats row
    val termRows = spark.read.parquet(s"$path/terms")
    assert(termRows.count() === nTerms)
    assert(termRows.select("installment").distinct().count() === 1)
    assert(spark.read.parquet(s"$path/stats").count() === 1)
  }

  test("append into an empty stats listing fails with a corruption message") {
    val path = java.nio.file.Files.createTempDirectory("bm25-empty")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter($"doc_id" <= 2), path)
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete()
    }
    val statsDir = new java.io.File(s"$path/stats")
    Option(statsDir.listFiles()).foreach(_.foreach(wipe))
    assert(statsDir.exists() && statsDir.listFiles().isEmpty)
    val e = intercept[IllegalStateException] {
      Bm25.bm25IndexAppend(spark, path, docs.filter($"doc_id" === 3L))
    }
    assert(e.getMessage.contains("no installment= partitions"))
  }

  test("tombstones: search-after-delete equals a fresh build over the remainder, bit-exact") {
    val path = java.nio.file.Files.createTempDirectory("bm25-del")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs, path)
    Bm25.bm25IndexDelete(spark, path, Seq(1L, 3L).toDF("doc_id"))
    val q = Seq((100L, "quick brown fox"), (101L, "spark plans lazy"))
      .toDF("query_id", "qtext")
    val got = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    // the negative df/N/dl deltas make scores EXACTLY a fresh build's
    // over corpus-minus-deleted — not merely the same id set
    val fresh = java.nio.file.Files.createTempDirectory("bm25-del-fresh")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter(!$"doc_id".isin(1L, 3L)), fresh)
    val want = Bm25.bm25SearchIndexed(spark, fresh, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === want)
    assert(!got.exists(r => r._2 == 1L || r._2 == 3L))
    // vacuum: postings fold physically, results unchanged, deletes clear
    val survivors = Bm25.bm25IndexVacuum(spark, path)
    assert(survivors === 2L) // docs 2 and 4 (doc 5 is empty, never indexed)
    assert(!graft.store.Tombstones.any(spark, path), "deletes dir not cleared")
    assert(spark.read.parquet(s"$path/postings")
      .filter($"doc_id".isin(1L, 3L)).isEmpty)
    val after = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(after === got)
    // the lifecycle composes: append after vacuum, still fresh-equivalent
    Bm25.bm25IndexAppend(spark, path, docs.filter($"doc_id" === 1L))
    val freshAll = java.nio.file.Files.createTempDirectory("bm25-del-f2")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter(!$"doc_id".isin(3L)), freshAll)
    val got2 = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want2 = Bm25.bm25SearchIndexed(spark, freshAll, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got2 === want2)
  }

  test("double-delete is a self-enforced no-op: re-deleting nets zero deltas") {
    val path = java.nio.file.Files.createTempDirectory("bm25-ddel")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs, path)
    Bm25.bm25IndexDelete(spark, path, Seq(1L).toDF("doc_id"))
    val q = Seq((100L, "quick brown fox")).toDF("query_id", "qtext")
    val once = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    // the r10 review's contract gap: a second delete of the same id used
    // to double-subtract df/N/dl silently — now it must change nothing
    Bm25.bm25IndexDelete(spark, path, Seq(1L, 2L).toDF("doc_id"))
    // id 1 contributes nothing (already tombstoned); id 2 deletes normally
    val twice = Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val fresh = java.nio.file.Files.createTempDirectory("bm25-ddel-f")
      .resolve("idx").toString
    Bm25.bm25IndexBuild(docs.filter(!$"doc_id".isin(1L, 2L)), fresh)
    val want = Bm25.bm25SearchIndexed(spark, fresh, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(twice === want,
      s"double-delete corrupted the statistics: $twice vs $want")
    assert(once !== twice, "the live id 2 must still delete")
    // a pure re-delete (every id already dead) changes nothing at all
    Bm25.bm25IndexDelete(spark, path, Seq(1L, 2L).toDF("doc_id"))
    assert(Bm25.bm25SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet === want)
  }

  test("no window funnel and no corpus-side shuffle past the posting build") {
    val big = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val q = Seq((1L, "alpha beta gamma")).toDF("query_id", "qtext")
    val plan = Bm25.bm25TopK(big, q, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bm25 must not rank via window:\n$plan")
    // query terms + df both broadcast into the posting scan
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probes:\n$plan")
  }
}
