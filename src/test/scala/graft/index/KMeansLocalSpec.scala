package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Driver-local bounded k-means (r17's fit engine; specs added r18 per
  * the advisor): sample determinism and layout-independence, fit
  * determinism, multi-restart selection, and the non-finite-vector
  * guard (a single NaN point must not poison every restart into an
  * empty centroid set). */
class KMeansLocalSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: Seq[Array[Float]], parts: Int) =
    rows.map(v => Tuple1(v)).toDF("vec").repartition(parts)

  private val rnd = new scala.util.Random(42)
  private val base: Seq[Array[Float]] =
    (0 until 500).map { i =>
      val c = i % 4
      Array.tabulate(8)(d => (c * 10.0 + rnd.nextGaussian()).toFloat)
    }

  test("boundedSample is layout-independent and deterministically ordered") {
    val a = KMeansLocal.boundedSample(vecs(base, 1), "vec", 100)
    val b = KMeansLocal.boundedSample(vecs(base, 13), "vec", 100)
    val c = KMeansLocal.boundedSample(vecs(rnd.shuffle(base), 7), "vec", 100)
    assert(a.length === 100)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "partitioning changed the sample")
    assert(a.map(_.toSeq).toSeq === c.map(_.toSeq).toSeq,
      "row order changed the sample")
  }

  test("boundedSample excludes null and non-finite vectors") {
    val dirty = base.take(20) ++ Seq(
      Array(Float.NaN, 1f, 2f, 3f, 4f, 5f, 6f, 7f),
      Array(Float.PositiveInfinity, 1f, 2f, 3f, 4f, 5f, 6f, 7f),
      null.asInstanceOf[Array[Float]])
    val got = KMeansLocal.boundedSample(vecs(dirty, 3), "vec", 1000)
    assert(got.length === 20, "non-finite/null rows must be excluded")
    assert(got.forall(_.forall(java.lang.Double.isFinite)))
  }

  test("fit is deterministic and NaN-free data yields k centers") {
    val pts = KMeansLocal.boundedSample(vecs(base, 5), "vec", 400)
    val c1 = KMeansLocal.fit(pts, 4, seed = 7L)
    val c2 = KMeansLocal.fit(pts, 4, seed = 7L)
    assert(c1.length === 4)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq,
      "same (points, k, seed) must reproduce the same centers")
    // a different seed is allowed to differ, but must still return k
    assert(KMeansLocal.fit(pts, 4, seed = 8L).length === 4)
    // k > n clamps to n
    assert(KMeansLocal.fit(pts.take(3), 4, seed = 7L).length === 3)
    // empty sample -> empty centers (the empty-corpus contract)
    assert(KMeansLocal.fit(Array.empty, 4, seed = 7L).isEmpty)
  }

  test("multi-restart keeps the lowest-wcss centers; a NaN-poisoned fit still returns centers") {
    val pts = KMeansLocal.boundedSample(vecs(base, 5), "vec", 400)
    // restarts=1 cost can only be >= the multi-restart pick's cost
    def cost(cs: Array[Array[Double]]): Double =
      pts.map { p =>
        cs.map(c => c.zip(p).map { case (x, y) =>
          (x - y) * (x - y)
        }.sum).min
      }.sum
    val multi = KMeansLocal.fit(pts, 4, seed = 7L, restarts = 5)
    val single = KMeansLocal.fit(pts, 4, seed = 7L, restarts = 1)
    assert(cost(multi) <= cost(single) + 1e-9)
    // even if every restart's wcss is the MaxValue sentinel (forced by
    // NaN points handed straight to fit), a valid center ARRAY is
    // returned instead of empty — the r18 `best == null` guard
    val poisoned = pts.take(10) :+ Array.fill(8)(Double.NaN)
    val cs = KMeansLocal.fit(poisoned, 2, seed = 7L)
    assert(cs.nonEmpty, "NaN-poisoned fit must still return centers")
  }
}
