package graft.analysis

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: (String, Int)*) =
    rows.flatMap { case (bin, n) => Seq.fill(n)(bin) }.toDF("g")

  test("identical distributions have zero drift") {
    val a = mk("x" -> 10, "y" -> 20)
    val got = Drift.l1Drift(a, a, col("g"))
      .as[(Double, Long, Long, Long)].head()
    assert(got === ((0.0, 2L, 30L, 30L)))
  }

  test("proportional distributions have zero drift regardless of size") {
    val a = mk("x" -> 10, "y" -> 20)
    val b = mk("x" -> 5, "y" -> 10)
    assert(Drift.l1Drift(a, b, col("g")).select("l1").as[Double].head() === 0.0)
  }

  test("disjoint supports hit the maximum L1 of 2") {
    val a = mk("x" -> 7)
    val b = mk("y" -> 3)
    val got = Drift.l1Drift(a, b, col("g"))
      .as[(Double, Long, Long, Long)].head()
    assert(got._1 === 2.0 && got._2 === 2L)
  }

  test("hand-computed mixed case is exact") {
    // a: x=3/4, y=1/4; b: x=1/4, y=3/4 → L1 = |3/4-1/4|·2 = 1.0
    val a = mk("x" -> 3, "y" -> 1)
    val b = mk("x" -> 1, "y" -> 3)
    assert(Drift.l1Drift(a, b, col("g")).select("l1").as[Double].head() === 1.0)
  }

  test("absent bins count as zero on the missing side") {
    val a = mk("x" -> 1, "y" -> 1)
    val b = mk("x" -> 2)
    // a: (1/2, 1/2); b: (1, 0) → |1/2-1| + |1/2-0| = 1.0
    val got = Drift.l1Drift(a, b, col("g"))
      .as[(Double, Long, Long, Long)].head()
    assert(got === ((1.0, 2L, 2L, 2L)))
  }

  test("an empty side yields NaN, not a crash") {
    val a = mk("x" -> 5)
    val b = mk().limit(0)
    val l1 = Drift.l1Drift(a, b, col("g")).select("l1").as[Double].head()
    assert(l1.isNaN)
  }
}
