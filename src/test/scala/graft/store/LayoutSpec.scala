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
