package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val intervals = Seq(
    (1L, "s1", ts(0), ts(10)),
    (1L, "s2", ts(20), ts(30)),   // crosses no bin at 1h, same key
    (2L, "s3", ts(5), ts(6))
  ).toDF("key", "tag", "start", "end")

  private val points = Seq(
    (1L, 100L, ts(0)),   // boundary: start inclusive
    (1L, 101L, ts(10)),  // boundary: end inclusive
    (1L, 102L, ts(15)),  // between intervals → no match
    (1L, 103L, ts(25)),
    (2L, 104L, ts(5, 30)),
    (3L, 105L, ts(5))    // key never intervaled
  ).toDF("key", "pid", "pts")

  test("points join intervals inclusively on both boundaries") {
    val got = RangeJoin.binnedRangeJoin(intervals, points, Seq("key"),
        "start", "end", "pts")
      .select($"tag", $"pid").as[(String, Long)].collect().toSet
    assert(got === Set(("s1", 100L), ("s1", 101L), ("s2", 103L), ("s3", 104L)))
  }

  test("matches the naive non-equi join on random data across bin widths") {
    val rnd = new scala.util.Random(29)
    val l = (1 to 120).map { i =>
      val st = rnd.nextInt(3000)
      (rnd.nextInt(6).toLong, i.toLong,
        new Timestamp(ts(0).getTime + st * 1000L),
        new Timestamp(ts(0).getTime + (st + rnd.nextInt(600)) * 1000L))
    }.toDF("key", "iid", "start", "end")
    val r = (1 to 400).map { i =>
      (rnd.nextInt(6).toLong, i.toLong,
        new Timestamp(ts(0).getTime + rnd.nextInt(3600) * 1000L))
    }.toDF("key", "pid", "pts")

    val naive = l.join(r, Seq("key"))
      .filter($"pts" >= $"start" && $"pts" <= $"end")
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet

    for (widthUs <- Seq(60000000L, 300000000L, 3600000000L)) {
      val got = RangeJoin.binnedRangeJoin(l, r, Seq("key"),
          "start", "end", "pts", binWidthUs = widthUs)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      assert(got === naive, s"bin width $widthUs diverged")
    }
  }

  test("composite keys and inverted intervals: full-tuple match, empty BETWEEN") {
    val l = Seq((1L, "x", "s1", ts(0), ts(10)),
      (1L, "y", "s2", ts(0), ts(10)),
      (2L, "x", "inv", ts(10), ts(0))) // inverted → matches nothing
      .toDF("k1", "k2", "tag", "start", "end")
    val r = Seq((1L, "x", 100L, ts(5)), (1L, "y", 101L, ts(5)),
      (2L, "x", 102L, ts(5))).toDF("k1", "k2", "pid", "pts")
    val got = RangeJoin.binnedRangeJoin(l, r, Seq("k1", "k2"),
        "start", "end", "pts")
      .select($"tag", $"pid").as[(String, Long)].collect().toSet
    assert(got === Set(("s1", 100L), ("s2", 101L)))
  }

  test("degenerate intervals fail fast instead of flooding the shuffle") {
    val wide = Seq((1L, "w", ts(0),
      Timestamp.valueOf("2031-01-01 00:00:00"))).toDF("key", "tag", "start", "end")
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(wide, points, Seq("key"),
        "start", "end", "pts", maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("spans more than"))
  }

  test("plan is an equi-join on (key, bin) — no cartesian, no nested loop") {
    val plan = RangeJoin.binnedRangeJoin(intervals, points, Seq("key"),
      "start", "end", "pts").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join must stay an equi-join:\n$plan")
  }
}
