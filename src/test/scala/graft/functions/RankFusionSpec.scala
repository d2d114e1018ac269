package graft.functions

import graft.SparkTestBase

class RankFusionSpec extends SparkTestBase {
  import spark.implicits._

  test("rrf matches the hand-computed fusion of two rankings") {
    // query 1: ranking A = [10, 11, 12], ranking B = [11, 13]
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = RankFusion.rrf(Seq(a, b), k = 4)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)

    def c(r: Int) = 1.0 / (60 + r)
    // 11 is in both lists -> fuses to the top; B's rank-2 (13) edges out
    // A's rank-3 (12): 1/62 > 1/63
    assert(got.map(_._1).toSeq === Seq(11L, 10L, 13L, 12L))
    assert(math.abs(got.head._2 - (c(2) + c(1))) < 1e-12)
    assert(math.abs(got(1)._2 - c(1)) < 1e-12)
  }

  test("single-ranking rrf preserves the input order") {
    val a = Seq((1L, 5L, 1), (1L, 6L, 2), (2L, 7L, 1))
      .toDF("query_id", "doc_id", "rank")
    val got = RankFusion.rrf(Seq(a), k = 10)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 5L, 1), (1L, 6L, 2), (2L, 7L, 1)))
  }

  test("ties broken by doc_id ascending (engine-portable)") {
    // docs 8 and 9 get identical contributions
    val a = Seq((1L, 9L, 1), (1L, 8L, 1)).toDF("query_id", "doc_id", "rank")
    val got = RankFusion.rrf(Seq(a), k = 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq === Seq(8L, 9L))
  }
}
