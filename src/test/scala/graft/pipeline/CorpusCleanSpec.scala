package graft.pipeline

import graft.SparkTestBase

class CorpusCleanSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog ran over the hill"), // good en
    (2L, "THE QUICK BROWN FOX AND THE LAZY DOG RAN OVER THE HILL"), // dup of 1 (normalized)
    (3L, "el rapido zorro y el perro en la casa de la villa"),      // es
    (4L, "!!! ??? *** ### $$$ %%% @@@ &&& ^^^ ~~~ ||| +++"),        // junk
    (5L, "the and of to in is that it for with as at by on")        // stopword-heavy en
  ).toDF("doc_id", "text")

  test("cleaning keeps quality en docs, drops junk/other-language/dups") {
    val kept = CorpusClean.clean(docs, minQuality = 0.5, keepLangs = Seq("en"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L), "good English doc must survive")
    assert(!kept.contains(2L), "normalized duplicate must be dropped (min id wins)")
    assert(!kept.contains(3L), "Spanish doc must be dropped by the language filter")
    assert(!kept.contains(4L), "symbol junk must be dropped by the quality filter")
  }

  test("clean output carries pred_lang and m_quality columns") {
    val row = CorpusClean.clean(docs, minQuality = 0.0, keepLangs = Seq("en", "es"))
      .filter($"doc_id" === 3L)
      .select("pred_lang", "m_quality").as[(String, Double)].head()
    assert(row._1 === "es")
    assert(row._2 >= 0.0 && row._2 <= 1.0)
  }
}
