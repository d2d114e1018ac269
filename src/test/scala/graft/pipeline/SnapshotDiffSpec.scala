package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, Some("alpha"), "en"),
    (2L, Some("beta"), "en"),
    (3L, Some("gamma"), "fr"),
    (5L, None: Option[String], "de")
  ).toDF("id", "text", "lang")

  private val newSnap = Seq(
    (1L, Some("alpha"), "en"),        // unchanged
    (2L, Some("beta v2"), "en"),      // changed (text)
    (4L, Some("delta"), "en"),        // added
    (5L, Some("epsilon"), "de")       // changed (null -> value)
  ).toDF("id", "text", "lang")        // 3 removed

  test("classifies added, removed, changed; drops unchanged") {
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"), Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(d === Map(2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed"))
  }

  test("null vs sentinel-lookalike value does not collide") {
    // a real value equal to the null sentinel's visible text must not
    // hash-collide with an actual null (the U+0002 prefix disambiguates)
    val o = Seq((1L, None: Option[String])).toDF("id", "v")
    val n = Seq((1L, Some("NULL"))).toDF("id", "v")
    val d = SnapshotDiff.diff(o, n, Seq("id"), Seq("v"))
      .as[(Long, String)].collect()
    assert(d === Array((1L, "changed")))
  }

  test("value column order is part of the hash contract") {
    val o = Seq((1L, "a", "b")).toDF("id", "x", "y")
    val n = Seq((1L, "b", "a")).toDF("id", "x", "y")
    assert(SnapshotDiff.diff(o, n, Seq("id"), Seq("x", "y")).count() === 1)
    assert(SnapshotDiff.diff(o, o, Seq("id"), Seq("x", "y")).count() === 0)
  }

  test("reserved _sd_ columns are rejected") {
    val bad = Seq((1L, "a")).toDF("id", "_sd_old")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(bad, bad, Seq("id"), Seq("_sd_old"))
    }
  }

  test("wide values collapse to hashes before the exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qe = SnapshotDiff.diff(
      docs.filter(pmod($"doc_id", lit(10)) =!= 7),
      docs.filter(pmod($"doc_id", lit(10)) =!= 5),
      Seq("doc_id"), Seq("text", "lang")).queryExecution
    assert(!qe.executedPlan.toString.contains("Window"))
    // every shuffle's input is the narrow (key, hash) projection — the
    // text column itself never ships through an exchange (sparkPlan has
    // no exchanges yet; unwrap AQE to reach the prepared initial plan)
    val phys = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val exchanges = phys.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, qe.sparkPlan.toString)
    exchanges.foreach { e =>
      val names = e.child.output.map(_.name).toSet
      assert(names.subsetOf(Set("doc_id", "_sd_old", "_sd_new")),
        s"wide columns shipped through a shuffle: $names")
    }
  }
}
