package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected-components cluster resolution: transitivity, worst-case
  * chains, random graphs vs a driver-side union-find oracle, and the
  * materialization-lifetime contract. */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = Dedup.connectedComponents(
      pairs.toDF("a", "b"), "a", "b")
    val out = df.as[(Long, Long)].collect().toMap
    Dedup.release(df)
    out
  }

  /** Driver-side union-find oracle. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("a≈b, b≈c collapse transitively into one cluster") {
    val labels = labelsOf(Seq((1L, 2L), (2L, 3L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a node pairing with two smaller unlinked ids still forms ONE cluster") {
    // canonical edges {(3,1),(3,2)} have disjoint child/parent sides but
    // are NOT a star (3 has two parents) — the termination test must not
    // accept them as converged (regression: early-exit returned node 3
    // with two representatives)
    val labels = labelsOf(Seq((1L, 3L), (2L, 3L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("chain graph (worst case for propagation) converges to the min id") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val labels = labelsOf(chain)
    assert(labels.size === 64)
    assert(labels.values.toSet === Set(1L))
  }

  test("disjoint components keep separate representatives") {
    val labels = labelsOf(Seq((10L, 20L), (20L, 30L), (100L, 200L), (7L, 7L)))
    // self-loop (7,7) is dropped entirely — 7 never appears
    assert(labels === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      100L -> 100L, 200L -> 100L))
  }

  test("empty pair list yields empty labels") {
    val df = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(df.count() === 0)
    Dedup.release(df)
  }

  test("random graph matches a union-find oracle") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(labelsOf(pairs) === unionFind(pairs))
  }

  test("duplicateClusters summarizes components with sorted members") {
    val df = Dedup.duplicateClusters(
      Seq((5L, 3L), (3L, 9L), (40L, 41L)).toDF("a", "b"), "a", "b")
    val rows = df.orderBy("rep").as[(Long, Long, String)].collect().toSeq
    Dedup.release(df)
    assert(rows === Seq((3L, 3L, "3,5,9"), (40L, 2L, "40,41")))
  }

  test("incremental fold equals one-shot clustering on the full pair set") {
    val rnd = new scala.util.Random(7)
    val all = Seq.fill(400)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val (historical, fresh) = all.splitAt(250)
    val full = labelsOf(all)

    val labels0 = Dedup.connectedComponents(historical.toDF("a", "b"), "a", "b")
    val folded = Dedup.connectedComponentsIncremental(labels0,
      fresh.toDF("a", "b"), "a", "b")
    val got = folded.as[(Long, Long)].collect().toMap
    Dedup.release(labels0)
    Dedup.release(folded)
    assert(got === full)
  }

  test("incremental fold merges two historical clusters through one new edge") {
    val labels0 = Dedup.connectedComponents(
      Seq((1L, 2L), (10L, 20L)).toDF("a", "b"), "a", "b")
    val folded = Dedup.connectedComponentsIncremental(labels0,
      Seq((2L, 20L)).toDF("a", "b"), "a", "b")
    val got = folded.as[(Long, Long)].collect().toMap
    Dedup.release(labels0)
    Dedup.release(folded)
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 20L -> 1L))
  }

  test("superseded rounds are unpersisted; release frees the final blocks") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = (1L until 32L).map(i => (i, i + 1))
    val df = Dedup.connectedComponents(chain.toDF("a", "b"), "a", "b")
    df.count()
    // exactly one materialized round (ours) may back the result
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"expected at most 1 live materialization, got $added")
    Dedup.release(df)
    val remaining = spark.sparkContext.getPersistentRDDs.keySet.intersect(added)
    assert(remaining.isEmpty, s"release left blocks behind: $remaining")
  }
}
