package graft.analysis

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), None),
    (3L, None, Some(10)),
    (4L, Some("a"), Some(30))
  ).toDF("id", "s", "v")

  test("profile reports rows, nulls, distincts, min/max per column") {
    val got = Profile.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("s") === (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("v") === (("v", 4L, 1L, 2L, "10", "30")))
  }

  test("approximate mode still reports exact nulls and min/max") {
    val got = Profile.profile(df, Seq("s"), exact = false)
      .as[(String, Long, Long, Long, String, String)].head()
    assert(got._2 === 4L && got._3 === 1L && got._5 === "a" && got._6 === "b")
    // HLL on 2 values is exact in practice, but only sanity-bound it
    assert(got._4 >= 1L && got._4 <= 3L)
  }

  test("profile rejects unknown and non-identifier columns") {
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.profile(df, Seq("a; drop")))
    intercept[IllegalArgumentException](Profile.profile(df, Seq.empty))
  }

  test("one aggregation pass: a single Expand, no per-column rescans") {
    val big = spark.read.parquet(s"$sfDir/orders.parquet")
    val plan = Profile.profile(big,
      Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    // exactly one scan of the source table
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected one table scan, got $scans:\n$plan")
  }
}
