package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Morton implementation, bit by bit. */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zValue matches a bit-by-bit Morton reference") {
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(300)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = pts.toDF("a", "b")
      .select(Layout.zValue($"a", $"b")).as[Long].collect().toSeq
    assert(got === pts.map { case (a, b) => mortonRef(a, b) })
  }

  test("zValue stays whole-stage-codegen'd — no UDF in the kernel") {
    val plan = spark.range(10).select(Layout.zValue($"id", $"id"))
      .queryExecution.executedPlan.toString
    assert(plan.startsWith("*("), s"z kernel must codegen:\n$plan")
  }

  test("z-ordered partitions are rectangles: both dims far narrower than global") {
    val rnd = new scala.util.Random(9)
    val df = Seq.fill(20000)((rnd.nextInt(65536), rnd.nextInt(65536)))
      .toDF("a", "b")
    val parts = df.withColumn("_z", Layout.zValue($"a", $"b"))
      .repartitionByRange(16, $"_z")
      .select(spark_partition_id().as("p"), $"a", $"b")
      .groupBy("p")
      .agg((max($"a") - min($"a")).as("spanA"),
        (max($"b") - min($"b")).as("spanB"))
      .as[(Int, Int, Int)].collect()
    assert(parts.length === 16)
    // a z-range covering 1/16 of the curve spans at most ~1/4 of each
    // axis (each partition sits inside a quadrant-of-quadrant grid cell);
    // range-partitioning on a alone would leave spanB at the full 65535
    val avgA = parts.map(_._2.toDouble).sum / parts.length
    val avgB = parts.map(_._3.toDouble).sum / parts.length
    assert(avgA < 65536 * 0.45, s"avg a-span $avgA not narrowed")
    assert(avgB < 65536 * 0.45, s"avg b-span $avgB not narrowed")
  }

  test("bucketed z-order narrows BOTH raw wide-domain columns; plain clamp does not") {
    val rnd = new scala.util.Random(11)
    // epoch-millis-style a (>> 16 bits) and sparse 64-bit-ish b: the raw
    // zValue clamp sees only the noisy low 16 bits of each
    val df = Seq.fill(20000)(
      (1700000000000L + rnd.nextInt(1000000000).toLong,
        rnd.nextLong().abs / 1000))
      .toDF("a", "b")

    def avgSpans(dir: String): (Double, Double) = {
      val spans = spark.read.parquet(dir)
        .select(input_file_name().as("f"), $"a", $"b")
        .groupBy("f")
        .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
        .as[(String, Long, Long)].collect()
      (spans.map(_._2.toDouble).sum / spans.length,
        spans.map(_._3.toDouble).sum / spans.length)
    }

    val bucketed = java.nio.file.Files.createTempDirectory("zb").resolve("t").toString
    Layout.zOrderWriteBucketed(df, bucketed, "a", "b", numPartitions = 16)
    assert(spark.read.parquet(bucketed).count() === 20000)
    val (ba, bb) = avgSpans(bucketed)
    val spanA = 1000000000.0
    val spanB = df.agg(max($"b") - min($"b")).as[Long].head().toDouble
    assert(ba < spanA * 0.45, s"bucketed a-span $ba not narrowed vs $spanA")
    assert(bb < spanB * 0.45, s"bucketed b-span $bb not narrowed vs $spanB")

    // the motivating failure: the raw 16-bit clamp leaves both spans wide
    val clamped = java.nio.file.Files.createTempDirectory("zc").resolve("t").toString
    Layout.zOrderWrite(df, clamped, "a", "b", numPartitions = 16)
    val (ca, cb) = avgSpans(clamped)
    assert(ca > spanA * 0.8 && cb > spanB * 0.8,
      s"clamped spans unexpectedly narrow ($ca, $cb) — test premise broken")
  }

  test("bucket16 is monotone and rank-uniform on skewed data") {
    val skewed = (1 to 10000).map(i => math.pow(i.toDouble, 3)).toDF("v")
    val Seq(bounds) = Layout.fitBuckets16(skewed, Seq("v"))
    val got = skewed.select($"v", Layout.bucket16(bounds)($"v").as("bk"))
      .as[(Double, Int)].collect().sortBy(_._1)
    // monotone in v
    got.sliding(2).foreach { case Array(x, y) => assert(x._2 <= y._2); case _ => }
    // rank-uniform: quartiles of the VALUE domain land near quartile buckets
    // despite the cubic skew
    val q1 = got(2500)._2; val q3 = got(7500)._2
    assert(math.abs(q1 - 16384) < 1000, s"q1 bucket $q1 far from 16384")
    assert(math.abs(q3 - 49152) < 1000, s"q3 bucket $q3 far from 49152")
    assert(got.head._2 >= 0 && got.last._2 <= 65535)
  }

  test("zOrderWrite round-trips all rows with row-group-prunable stats") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").resolve("t")
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(5000)((rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt()))
      .toDF("a", "b", "payload")
    // 16 partitions = an even power of 4: every z-range is a quadrant-of-
    // quadrant cell, so BOTH axes narrow (an odd power like 8 halves only
    // one axis per cell — inherent to the curve, not a layout bug)
    Layout.zOrderWrite(df, dir.toString, "a", "b", numPartitions = 16)
    val back = spark.read.parquet(dir.toString)
    assert(back.count() === 5000)
    assert(back.columns.toSet === Set("a", "b", "payload"))
    // per-file spans narrowed on BOTH columns (files align with partitions)
    val spans = back.select(input_file_name().as("f"), $"a", $"b")
      .groupBy("f")
      .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
      .as[(String, Int, Int)].collect()
    assert(spans.length >= 16)
    assert(spans.map(_._2.toDouble).sum / spans.length < 65536 * 0.45)
    assert(spans.map(_._3.toDouble).sum / spans.length < 65536 * 0.45)
  }
}
