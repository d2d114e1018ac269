package graft.analysis

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the classic Sennrich fixture: {low:5, lower:2, newest:6, widest:3}
  private val words = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "freq")

  test("learns the hand-computed merge sequence with portable tie-breaks") {
    val merges = Bpe.learnMerges(words, numMerges = 3)
    // pair counts: es=9, st=9 (tie → 'es' < 'st'), then est=9,
    // then lo=7 (tie with ow → 'lo' wins)
    assert(merges.map(m => (m.step, m.sym_a, m.sym_b, m.merged, m.cnt)) === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("tokenizeWord applies merges left-to-right non-overlapping") {
    val merges = Bpe.learnMerges(words, numMerges = 3)
    assert(Bpe.tokenizeWord("lowest", merges) === Seq("lo", "w", "est"))
    assert(Bpe.tokenizeWord("low", merges) === Seq("lo", "w"))
    assert(Bpe.tokenizeWord("unseen", merges) === Seq("u", "n", "s", "e", "e", "n"))
    assert(Bpe.tokenizeWord("", merges) === Seq.empty)
  }

  test("overlapping pairs count per occurrence, merge applies disjointly") {
    // 'aaaa' ×2: pairs a-a = 3 per word → cnt 6; merging gives aa,aa
    val w = Seq(("aaaa", 2L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(w, numMerges = 2)
    assert(merges.head.merged === "aa" && merges.head.cnt === 6L)
    // round 2: aa-aa adjacency → 'aaaa'
    assert(merges(1).merged === "aaaa" && merges(1).cnt === 2L)
    assert(Bpe.tokenizeWord("aaaaa", merges) === Seq("aaaa", "a"))
  }

  test("stops early when no pair repeats") {
    val w = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    assert(Bpe.learnMerges(w, numMerges = 5).isEmpty)
  }

  test("wordFrequencies uses the canonical normalization") {
    val docs = Seq((1L, "The QUICK fox! the quick-fox")).toDF("doc_id", "text")
    val got = Bpe.wordFrequencies(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map("the" -> 2L, "quick" -> 2L, "fox" -> 2L))
  }

  test("encode matches tokenizeWord word-by-word, in document order") {
    val merges = Bpe.learnMerges(words, numMerges = 3)
    val docs = Seq(
      (1L, "Lowest, newest!"),
      (2L, "the low lower"),
      (3L, ""),
      (4L, "unseen")
    ).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("lo", "w", "est", "n", "e", "w", "est"))
    assert(got(2L) ===
      Seq("t", "h", "e") ++ Seq("lo", "w") ++ Seq("lo", "w", "e", "r"))
    assert(got(3L) === Seq.empty)
    assert(got(4L) === Seq("u", "n", "s", "e", "e", "n"))
  }

  test("encode with no merges is character tokenization") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a", "b", "c", "d"))
  }

  test("encode is partitioning-invariant (per-task memo is transparent)") {
    val merges = Bpe.learnMerges(words, numMerges = 3)
    val docs = (1L to 200L).map(i => (i, s"newest low newest wide$i"))
      .toDF("doc_id", "text")
    val a = Bpe.encode(docs.repartition(7), "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encode(docs.coalesce(1), "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(a === b)
  }
}
