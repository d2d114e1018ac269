package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the bounded top-k aggregate: same results as the window-rank
  * definition it replaces, with a plan that contains NO window funnel —
  * the per-query rank must never send a full group through one task
  * (mirrors RanksSpec's two-phase-rank contract). */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(7)
    (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, math.rint(rnd.nextDouble() * 100) / 10)
    }.toDF("g", "id", "score").repartition(8)
  }

  test("topKPerGroup matches the window-rank definition, ties on lower id") {
    val df = fixture.cache()
    val got = TopK.topKPerGroup(df, "g", "id", "score", 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val w = Window.partitionBy($"g").orderBy(desc("score"), $"id")
    val want = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"g", $"id", $"score", $"rank".cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === want)
    df.unpersist()
  }

  test("k larger than the group returns the whole group ranked") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("g", "id", "score")
    val got = TopK.topKPerGroup(df, "g", "id", "score", 10)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(got.toList === List((1L, 11L, 0.9, 1), (1L, 10L, 0.5, 2)))
  }

  test("NaN and signed-zero scores order exactly like the window it replaces") {
    // NaN sorts ABOVE every double in Spark's desc ordering, and -0.0 ties
    // 0.0 — the reachable case is a NaN cosine from a zero vector. The
    // bounded aggregate must agree with the window definition on both,
    // whatever the buffer fill order (ids spread over partitions).
    val df = Seq(
      (1L, 1L, Double.NaN), (1L, 2L, 1.0), (1L, 3L, Double.NaN),
      (1L, 4L, -0.0), (1L, 5L, 0.0), (1L, 6L, 0.5),
      (2L, 7L, Double.NaN), (2L, 8L, 2.0)
    ).toDF("g", "id", "score").repartition(4).cache()
    val got = TopK.topKPerGroup(df, "g", "id", "score", 4)
      .select($"g", $"id", $"rank").as[(Long, Long, Int)].collect().toSet
    val w = Window.partitionBy($"g").orderBy(desc("score"), $"id")
    val want = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 4)
      .select($"g", $"id", $"rank".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    df.unpersist()
  }

  test("plan is a partial aggregate, not a window funnel") {
    val plan = TopK.topKPerGroup(fixture, "g", "id", "score", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bounded top-k must not plan a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate (partial combine before the exchange):\n$plan")
  }

  private def labelFixture = {
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (1 to 400).map { _ =>
      (rnd.nextInt(4).toLong, words(rnd.nextInt(words.size)),
        math.rint(rnd.nextDouble() * 30) / 10) // coarse scores force ties
    }.toDF("g", "label", "score").repartition(8)
  }

  test("topLabelsPerGroup matches the window definition, ties on smaller label") {
    val df = labelFixture.cache()
    val got = TopK.topLabelsPerGroup(df, "g", "label", "score", 3)
      .as[(Long, String, Double, Int)].collect().toSet
    val w = Window.partitionBy($"g").orderBy(desc("score"), $"label")
    val want = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"g", $"label", $"score", $"rank".cast("int"))
      .as[(Long, String, Double, Int)].collect().toSet
    assert(got === want)
    df.unpersist()
  }

  test("topLabelsPerGroup plans the same bounded partial aggregate") {
    val plan = TopK.topLabelsPerGroup(labelFixture, "g", "label", "score", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("ObjectHashAggregate"))
  }
}
