package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("n_chars"))

  test("assignShards chops the global shuffle order into exact chunks") {
    val n = docs.count()
    val a = Export.assignShards(docs, "doc_id", rowsPerShard = 32L)
    val sizes = a.groupBy("shard").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    val nShards = sizes.length
    assert(nShards === ((n + 31) / 32))
    assert(sizes.dropRight(1).forall(_._2 === 32L), s"non-full shard: $sizes")
    assert(sizes.last._2 === (if (n % 32 == 0) 32L else n % 32))
    // pos_in_shard is a 0-based dense order within the shard
    val bad = a.filter(col("pos_in_shard") < 0 || col("pos_in_shard") >= 32)
    assert(bad.isEmpty)
    // equals the globalShuffleOrder-derived reference
    val ref = Sampling.globalShuffleOrder(docs, "doc_id", "pos")
      .select(col("doc_id"), expr("pos div 32").as("shard"),
        (col("pos") % 32).as("pos_in_shard"))
      .as[(Long, Long, Long)].collect().toSet
    val got = a.select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === ref)
  }

  test("assignment is invariant under input repartitioning") {
    val a = Export.assignShards(docs, "doc_id", 50L)
      .select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    val b = Export.assignShards(docs.repartition(13), "doc_id", 50L)
      .select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("writeShards lands one file per shard and an exact manifest") {
    val out = java.nio.file.Files.createTempDirectory("export").toString
    val nShards = Export.writeShards(docs, "doc_id", out, 64L,
      signalCols = Seq("n_chars"))
    val n = docs.count()
    assert(nShards === ((n + 63) / 64))
    // one data file per shard dir
    val dataDir = new java.io.File(s"$out/data")
    val shardDirs = dataDir.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === nShards)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} has ${files.length} files")
    }
    // manifest counts and signal sums match the data
    val manifest = spark.read.parquet(s"$out/manifest")
      .as[(Long, Long, Long)].collect().toMap2
    val direct = spark.read.parquet(s"$out/data")
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(manifest === direct)
    assert(manifest.values.map(_._1).sum === n)
  }

  test("readShard returns the shard in written order, pruned to one dir") {
    val out = java.nio.file.Files.createTempDirectory("export-read").toString
    Export.writeShards(docs, "doc_id", out, 100L)
    val rows = Export.readShard(spark, out, 1L)
      .select("pos_in_shard").as[Long].collect()
    assert(rows.toSeq === rows.sorted.toSeq)
    assert(rows.length === 100)
    val plan = Export.readShard(spark, out, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard read must partition-prune:\n$plan")
  }

  test("rowsPerShard and reserved columns are validated") {
    intercept[IllegalArgumentException] {
      Export.assignShards(docs, "doc_id", 0L)
    }
    intercept[IllegalArgumentException] {
      Export.assignShards(docs.withColumn("_ex_pos", lit(1)), "doc_id", 10L)
    }
  }

  private implicit class MapOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
