package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Scale-evidence specs (SCALE.md): bucketed tables co-locate equi-joins
  * with zero shuffle, and partitioned layouts prune at the scan. These pin
  * the physical-plan shapes the 100 TB story depends on. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables sort-merge join with no shuffle exchange") {
    // default warehouse dir (static conf); DROP TABLE below cleans up
    val a = (1L to 10000L).map(k => (k, s"a-$k")).toDF("key", "va")
    val b = (1L to 10000L).map(k => (k, k * 2.0)).toDF("key", "vb")
    a.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bt_a")
    b.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bt_a").join(spark.table("bt_b"), "key")
      assert(joined.count() === 10000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_a")
      spark.sql("DROP TABLE IF EXISTS bt_b")
    }
  }

  test("partitioned parquet prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (1 to 1000).map(i => (i.toLong, i % 10, s"row-$i"))
      .toDF("id", "bucket", "payload")
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"bucket" === 3)
    assert(pruned.count() === 100)
    val scan = pruned.queryExecution.executedPlan.toString
    // the partition filter must reach the file index, not a post-scan Filter
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"expected partition pruning in:\n$scan")
  }
}
