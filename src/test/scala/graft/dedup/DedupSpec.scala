package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "The quick brown fox jumps over the lazy dog!"), // normalized dup of 1
    (4L, "the quick brown fox leaps over the lazy dog"), // near dup (1 word)
    (5L, "completely different content about spark engines and parquet files"),
    (6L, "Completely different content about spark engines and parquet files") // norm dup of 5
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id")
    assert(groups.count() === 5) // 1+2 collapse
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
    assert(kept.count() === 5)
    assert(kept.filter($"doc_id" === 2L).count() === 0) // min id kept
  }

  test("normalization collapses case and punctuation") {
    val n = docs.select(Dedup.normalized($"text").as("n"))
      .distinct().count()
    assert(n === 3) // {1,2,3}, {4}, {5,6}... plus: 4 distinct? 1,2,3 same; 4; 5,6 same → 3
  }

  test("shingles produce word k-grams") {
    val sh = Seq((1L, "a b c d")).toDF("id", "text")
      .select(Dedup.shingles($"text", 2).as("sh"))
      .as[Seq[String]].head()
    assert(sh === Seq("a b", "b c", "c d"))
    // shorter than k → whole text as one shingle
    val short = Seq((1L, "a b")).toDF("id", "text")
      .select(Dedup.shingles($"text", 5).as("sh")).as[Seq[String]].head()
    assert(short === Seq("a b"))
  }

  test("shinglesUdf produces exactly array_distinct(shingles(...)) sets") {
    // the DuckDB ngram/minhash oracles mirror the HOF formulation; the UDF
    // fast path must stay set-identical on adversarial inputs
    val fixtures = Seq("", "   ", "a", "a b", "a b c d e f",
      "Hello, World!! multi  space\tand\ttabs", "x; y; z -- punct",
      "ONE one One oNe", "1 2 3 4 5 6 7 8 9", "ümlaut łatin ascii-only")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = fixtures.toDF("id", "text")
    Seq(2, 4).foreach { k =>
      val hof = df.select($"id",
        org.apache.spark.sql.functions.array_distinct(
          Dedup.shingles($"text", k)).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val fast = df.select($"id", Dedup.shinglesUdf(k)($"text").as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      fixtures.foreach { case (id, t) =>
        assert(fast(id).toSet === hof(id).toSet, s"k=$k text='$t'")
      }
    }
  }

  test("minhash LSH finds near-duplicates and skips distinct docs") {
    val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup must surface: $pairs")
    assert(pairs.contains((1L, 3L)), s"normalized dup must surface: $pairs")
    assert(pairs.contains((1L, 4L)), s"near dup must surface: $pairs")
    assert(pairs.contains((5L, 6L)), s"second cluster must surface: $pairs")
    assert(!pairs.exists(p => Set(1L, 2L, 3L, 4L).contains(p._1) &&
      Set(5L, 6L).contains(p._2)), "clusters must not cross-match")
  }

  test("simhash near-duplicates by hamming distance") {
    val pairs = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L))) // same normalized tokens → same simhash
    assert(pairs.contains((5L, 6L)))
  }

  test("ngram jaccard join computes exact jaccard") {
    val out = Dedup.ngramJaccardJoin(docs, "text", "doc_id",
      shingleK = 2, threshold = 0.4)
    val m = out.as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(math.abs(m((1L, 2L)) - 1.0) < 1e-12) // identical sets
    assert(m.contains((1L, 4L)) && m((1L, 4L)) < 1.0)
    assert(!m.keySet.exists(p => p._1 <= 4L && p._2 >= 5L))
  }

  test("containment join finds subset dups that jaccard under-scores") {
    val subset = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta"),  // strict prefix of 1
      (3L, "totally different words everywhere in this one")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentJoin(subset, "text", "doc_id",
      shingleK = 2, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // every bigram of doc 2 appears in doc 1 -> containment exactly 1.0
    assert(cont((1L, 2L)) === 1.0)
    assert(!cont.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair's symmetric jaccard is 3/9 — below any dedup cut
    val jac = Dedup.ngramJaccardJoin(subset, "text", "doc_id",
      shingleK = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(jac((1L, 2L)) < 0.5)
  }

  test("embedding near-duplicates via hyperplane LSH") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)),  // ≈ vec 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.05f, 0.0f)),  // ≈ vec 3
      (5L, Array(-1.0f, -0.2f, 0.5f, -0.3f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(vecs, "embedding", "vec_id",
      dims = 4, threshold = 0.95, planes = 8, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"got $pairs")
    assert(pairs.contains((3L, 4L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("semanticDedup keeps one representative per cluster and all singletons") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.1f)),   // exact copy of 1
      (7L, Array(1.001f, 0.0f, 0.0f, 0.1f)), // near copy of 1 -> same cluster
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // exact copy of 3
      (5L, Array(-1.0f, -0.2f, 0.5f, -0.3f)) // singleton
    ).toDF("vec_id", "embedding")
    val survivors = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      dims = 4, threshold = 0.999, planes = 8, bands = 4)
    // schema passes through untouched; keep-min leaves 1 (not 2/7), 3
    // (not 4), and the unclustered 5
    assert(survivors.columns.toSeq === Seq("vec_id", "embedding"))
    val ids = survivors.select("vec_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 5L), s"got $ids")
    Dedup.release(survivors)

    // broadcastDrop keeps the corpus out of the anti-join shuffle
    // entirely (BroadcastHashJoin LeftAnti) with identical survivors
    val bcast = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      dims = 4, threshold = 0.999, planes = 8, bands = 4,
      broadcastDrop = true)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n$plan")
    val bIds = bcast.select("vec_id").as[Long].collect().toSet
    assert(bIds === Set(1L, 3L, 5L), s"got $bIds")
    Dedup.release(bcast)
  }

  test("semanticDedup with no near-duplicates returns the corpus untouched") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val survivors = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      dims = 4, threshold = 0.999, planes = 8, bands = 4)
    assert(survivors.select("vec_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    Dedup.release(survivors)
  }

  test("minhashPrune keeps one representative per text cluster") {
    val mk = (base: String, extra: String) => base + " " + extra
    val common = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, mk(common, "alpha beta")),
      (2L, mk(common, "alpha gamma")),      // near copy of 1
      (9L, mk(common, "alpha beta")),       // exact copy of 1
      (5L, (100 to 125).map(i => s"zzz$i").mkString(" "))  // singleton
    ).toDF("doc_id", "text")
    val survivors = Dedup.minhashPrune(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
    assert(survivors.columns.toSeq === Seq("doc_id", "text"))
    val ids = survivors.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 5L), s"got $ids")
    Dedup.release(survivors)

    val bcast = Dedup.minhashPrune(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5,
      broadcastDrop = true)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n$plan")
    assert(bcast.select("doc_id").as[Long].collect().toSet === Set(1L, 5L))
    Dedup.release(bcast)
  }

  test("simhash64 kernel: identical token sets collide, disjoint differ") {
    val a = Dedup.simhash64(Seq("alpha", "beta", "gamma"))
    val b = Dedup.simhash64(Seq("alpha", "beta", "gamma"))
    assert(a === b)
    val c = Dedup.simhash64(Seq("totally", "unrelated", "words", "here"))
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }
}
