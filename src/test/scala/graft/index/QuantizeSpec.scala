package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("pack/unpack is the identity on int8 codes") {
    val scale = Quantize.maxAbs(embs, "embedding") / 127.0
    val codes = embs.limit(50)
      .select($"vec_id", Quantize.codesUdf(scale)($"embedding").as("c"))
    val roundTrip = codes.select($"vec_id",
      Quantize.unpackCodesUdf(Quantize.packCodesUdf($"c")).as("c2"), $"c")
    assert(roundTrip.filter($"c" =!= $"c2").isEmpty)
    // every code must actually fit a signed byte
    val bounds = codes.select(explode($"c").as("x"))
      .agg(min("x"), max("x")).head()
    assert(bounds.getInt(0) >= -127 && bounds.getInt(1) <= 127)
  }

  test("reconstruction error is bounded by scale/2 per component") {
    val scale = Quantize.maxAbs(embs, "embedding") / 127.0
    val err = udf { (v: Seq[Float], c: Seq[Int]) =>
      v.zip(c).map { case (x, q) => math.abs(x.toDouble - q * scale) }.max
    }
    val worst = embs
      .select(err($"embedding", Quantize.codesUdf(scale)($"embedding")).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(worst <= scale / 2 + 1e-12, s"worst reconstruction error $worst > ${scale / 2}")
  }

  test("a corpus-member query returns itself at rank 1") {
    val scale = Quantize.maxAbs(embs, "embedding") / 127.0
    val q = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val top1 = Quantize.int8TopK(embs, q, k = 1, scale)
      .as[(Long, Long, Double, Int)].collect()
    assert(top1.length === 4)
    assert(top1.forall(r => r._1 === r._2), s"self not top-1: ${top1.toSeq}")
  }

  test("quantized top-5 recovers most of the float top-5 (recall contract)") {
    val scale = Quantize.maxAbs(embs, "embedding") / 127.0
    val q = embs.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val quant = Quantize.int8TopK(embs, q, k = 5, scale)
    val exact = SimilarityIndex.bruteForceTopK(embs, q, k = 5)
    val report = SimilarityIndex.approxRecallReport(quant, exact, recallFloor = 3)
      .as[(Long, Long, Boolean)].collect()
    assert(report.length === 8)
    assert(report.forall(_._3), s"int8 recall collapsed: ${report.toSeq}")
  }

  test("search through a two-installment index equals the one-shot scan") {
    val q = embs.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val path = java.nio.file.Files.createTempDirectory("int8-idx")
      .resolve("idx").toString
    Quantize.int8Build(embs.filter($"vec_id" % 2 === 0), path)
    Quantize.int8Append(spark, path, embs.filter($"vec_id" % 2 === 1))
    val indexed = Quantize.int8SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val direct = Quantize.int8TopK(embs, q, k = 5, scale)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(indexed === direct)
    assert(indexed.nonEmpty)
  }

  test("asOfInstallment pins a search to the pre-append snapshot") {
    val q = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val path = java.nio.file.Files.createTempDirectory("int8-snap")
      .resolve("idx").toString
    Quantize.int8Build(embs.filter($"vec_id" % 2 === 0), path)
    val buildOnly = Quantize.int8SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    Quantize.int8Append(spark, path, embs.filter($"vec_id" % 2 === 1))
    val snap = Quantize.int8SearchIndexed(spark, path, q, k = 5,
      asOfInstallment = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(snap === buildOnly)
    val full = Quantize.int8SearchIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full !== snap, "appended vectors must be visible to the full read")
  }

  test("IVF-SQ8: self-recall, append parity, and partition-pruned probes") {
    val q = embs.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val path = java.nio.file.Files.createTempDirectory("ivfsq8")
      .resolve("idx").toString
    Quantize.ivfSq8Build(embs, path, nlist = 8, fitSampleFraction = 1.0)
    val hits = Quantize.ivfSq8Search(spark, path, q, k = 5, nprobe = 4)
    val top1 = hits.filter($"rank" === 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(top1.length === 8)
    assert(top1.forall(r => r._1 === r._2), s"self not top-1: ${top1.toSeq}")

    // probe plan prunes to the probed list partitions
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected list_id partition pruning:\n$plan")

    // append against frozen centroids+scale == one-shot build
    val appPath = java.nio.file.Files.createTempDirectory("ivfsq8-app")
      .resolve("idx").toString
    Quantize.ivfSq8Build(embs.filter($"vec_id" % 2 === 0), appPath,
      nlist = 8, fitSampleFraction = 1.0)
    Quantize.ivfSq8Append(spark, appPath, embs.filter($"vec_id" % 2 === 1))
    val appended = Quantize.ivfSq8Search(spark, appPath, q, k = 1, nprobe = 8)
      .filter($"rank" === 1).as[(Long, Long, Double, Int)].collect()
    assert(appended.length === 8)
    assert(appended.forall(r => r._1 === r._2),
      s"appended member must still self-match: ${appended.toSeq}")
  }

  test("zero vectors are excluded, not NaN-ranked") {
    val withZero = embs.limit(20).unionByName(
      Seq((999999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val scale = Quantize.maxAbs(withZero, "embedding") / 127.0
    val q = Seq((999999L, Array.fill(64)(0.0f)), (0L, Array.fill(64)(0.1f)))
      .toDF("query_id", "query_vec")
    val got = Quantize.int8TopK(withZero, q, k = 3, scale)
      .as[(Long, Long, Double, Int)].collect()
    assert(!got.exists(_._1 === 999999L), "zero-norm query must drop out")
    assert(got.forall(r => !r._3.isNaN && r._2 != 999999L))
  }

  test("scoring plan has no window funnel and broadcasts the query side") {
    val scale = Quantize.maxAbs(embs, "embedding") / 127.0
    val q = embs.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val plan = Quantize.int8TopK(embs, q, k = 5, scale)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"int8 top-k must not rank via window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
  }
}
