package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Driver-local, deterministic k-means over a ROW-BOUNDED training sample
 * (r17 optimization round) — the fit engine behind [[SimilarityIndex]]'s
 * coarse centroids and [[Pq]]'s subspace codebooks.
 *
 * Why not MLlib: a distributed KMeans fit costs ~15 scheduler round-trips
 * (k-means|| init rounds + one job per Lloyd iteration) regardless of
 * data size. Index builds here train on a FAISS-practice bounded sample
 * (~max(256·k, 10⁴) points — codebooks need ~10³ points per centroid,
 * more adds nothing), so the training set is a driver-side constant by
 * construction (the readCentroids / routing-constant pattern) and the
 * fit itself is milliseconds of driver math. One narrow corpus pass
 * extracts the sample; nothing else touches the cluster.
 *
 * Determinism is STRONGER than the MLlib path it replaces: the sample is
 * hash-ranked over the vector CONTENT (lowest `bound` xxhash64 values),
 * then sorted driver-side by (hash, elementwise value) — the same sample
 * in the same order for any partitioning, file-split geometry, or core
 * count, where both `DataFrame.sample()` (per-partition RNG) and MLlib's
 * k-means|| init (per-partition seeded sampling) shift with layout. The
 * centroids are therefore a pure function of (corpus content, k, seed).
 *
 * Declared-query safety: every oracled query contract over these
 * centroids is centroid-VALUE-independent by construction (DuckDB cannot
 * replay a k-means — the contracts are structural: self-recall, planted
 * scalar-multiple twins routing to identical lists, nprobe = nlist
 * exactness, covering-pool refined exactness), so swapping the fit
 * engine cannot change any declared output; the oracle gate re-proves
 * this per query.
 */
private[graft] object KMeansLocal {

  /** Hash-ranked bounded sample of a float-vector column, collected to
    * the driver and deterministically ordered. One narrow scan of `df`
    * (TakeOrderedAndProject — every partition keeps ≤ bound candidate
    * rows, the driver merges); null rows are excluded in the scan, and
    * vectors carrying a non-finite element are dropped DRIVER-SIDE
    * after the take (r18 — a single NaN point poisons every restart's
    * wcss, mirroring the PQ fit path's guard; filtering on the driver
    * keeps the distributed pass free of per-row UDF cost — a
    * pathological NaN row can displace one sample slot, which is fine
    * for a bounded heuristic sample). The distributed take orders by
    * (hash, vector), not the hash alone, so even a true 64-bit hash
    * collision at the cutoff selects the same rows on any layout. */
  def boundedSample(df: DataFrame, vecCol: String, bound: Long): Array[Array[Double]] = {
    val lim = math.min(bound, Int.MaxValue.toLong).toInt
    require(lim > 0, s"sample bound must be positive, got $bound")
    val rows = df.select(col(vecCol).as("_km_v"))
      .where(col("_km_v").isNotNull)
      .withColumn("_km_h", xxhash64(col("_km_v")))
      .orderBy(col("_km_h"), col("_km_v"))
      .limit(lim)
      .select(col("_km_h"), col("_km_v"))
      .collect()
    val pts: Array[(Long, Array[Double])] = rows.flatMap { r =>
      val s = r.getSeq[Float](1)
      val a = new Array[Double](s.length)
      var i = 0
      var finite = true
      while (i < s.length) {
        val d = s(i).toDouble
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          finite = false
        a(i) = d
        i += 1
      }
      if (finite) Some((r.getLong(0), a)) else None
    }
    // pin the ORDER (the init RNG walks it): hash asc, then elementwise —
    // equal-hash rows are almost always identical vectors, but a true
    // collision must still order deterministically
    java.util.Arrays.sort(pts, new java.util.Comparator[(Long, Array[Double])] {
      override def compare(x: (Long, Array[Double]), y: (Long, Array[Double])): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) return c
        val a = x._2; val b = y._2
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val d = java.lang.Double.compare(a(i), b(i))
          if (d != 0) return d
          i += 1
        }
        Integer.compare(a.length, b.length)
      }
    })
    pts.map(_._2)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /**
   * Multi-restart seeded k-means++ + Lloyd, entirely on the driver:
   * `restarts` independent seeded inits, each Lloyd-converged, lowest
   * within-cluster sum of squares wins (ties → the earliest seed).
   * Restarts are what buys back (and typically exceeds) the MLlib
   * k-means|| init quality this replaces — the IVF recall-report
   * queries' floors ride on cluster quality, and a single k-means++
   * draw has a fatter distortion tail than an oversampled k-means||
   * init. Bounded driver math either way (~restarts × n·k·dim·iters
   * flops on a ≤10⁴-row sample).
   *
   * Deterministic given (points order, k, seed): D²-weighted init walks
   * a seeded RNG, assignment ties break to the LOWEST centroid index,
   * and a cluster that empties keeps its previous center (no
   * re-seeding randomness). Squared-Euclidean objective — the MLlib
   * contract this replaces. Returns min(k, |points|) centers.
   */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
          maxIter: Int = 10, restarts: Int = 5): Array[Array[Double]] = {
    var best: Array[Array[Double]] = null
    var bestCost = Double.MaxValue
    var r = 0
    while (r < restarts) {
      val c = fitOnce(points, k, seed + r, maxIter)
      val cost = wcss(points, c)
      // strict <: earliest seed wins ties; `best == null` guards the
      // degenerate all-restarts-at-sentinel-cost case (r18) so a valid
      // center set is always returned — identical selection on any
      // finite-cost input
      if (best == null || cost < bestCost) { bestCost = cost; best = c }
      r += 1
    }
    if (best == null) Array.empty else best
  }

  private def wcss(points: Array[Array[Double]], centers: Array[Array[Double]]): Double = {
    if (centers.isEmpty) return Double.MaxValue
    var s = 0.0
    var i = 0
    while (i < points.length) {
      var bd = Double.MaxValue
      var j = 0
      while (j < centers.length) {
        val d = sqDist(points(i), centers(j))
        if (d < bd) bd = d
        j += 1
      }
      s += bd
      i += 1
    }
    s
  }

  private def fitOnce(points: Array[Array[Double]], k: Int, seed: Long,
                      maxIter: Int): Array[Array[Double]] = {
    val n = points.length
    if (n == 0) return Array.empty
    val kk = math.min(k, n)
    val rng = new java.util.Random(seed)
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rng.nextInt(n)).clone()
    if (kk > 1) {
      val d2 = Array.fill(n)(Double.MaxValue)
      var c = 0
      while (c + 1 < kk) {
        var i = 0
        while (i < n) {
          val d = sqDist(points(i), centers(c))
          if (d < d2(i)) d2(i) = d
          i += 1
        }
        var sum = 0.0
        i = 0
        while (i < n) { sum += d2(i); i += 1 }
        val next =
          if (sum <= 0.0 || sum.isNaN) (c + 1) % n // all-identical sample
          else {
            val target = rng.nextDouble() * sum
            var acc = 0.0
            var pick = -1
            i = 0
            while (i < n && pick < 0) {
              acc += d2(i)
              if (acc >= target) pick = i
              i += 1
            }
            if (pick < 0) n - 1 else pick
          }
        centers(c + 1) = points(next).clone()
        c += 1
      }
    }
    // Lloyd
    val assign = new Array[Int](n)
    val dim = points(0).length
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val d = sqDist(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j } // strict < : lowest index wins ties
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Long](kk)
      i = 0
      while (i < n) {
        val p = points(i)
        val s = sums(assign(i))
        var t = 0
        val m = math.min(dim, p.length)
        while (t < m) { s(t) += p(t); t += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      moved = false
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          val nc = sums(j)
          val inv = 1.0 / counts(j)
          var t = 0
          while (t < dim) { nc(t) *= inv; t += 1 }
          if (!moved && sqDist(nc, centers(j)) > 1e-12) moved = true
          centers(j) = nc
        } // empty cluster: keep the previous center (deterministic)
        j += 1
      }
      iter += 1
    }
    centers
  }
}
