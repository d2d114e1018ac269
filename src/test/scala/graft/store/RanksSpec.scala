package graft.store

import graft.SparkTestBase

class RanksSpec extends SparkTestBase {
  import spark.implicits._

  test("withOrderedIndex assigns the exact global sort rank") {
    // adversarial layout: keys arrive shuffled across many partitions
    val keys = scala.util.Random.shuffle((0L until 5000L).map(_ * 7 % 4999).distinct)
    val df = spark.sparkContext.parallelize(keys, 16).toDF("key")
    val ranked = Ranks.withOrderedIndex(df, "key", "idx")
      .select("key", "idx").as[(Long, Long)].collect().sortBy(_._1)
    val expected = keys.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    assert(ranked.toSeq === expected)
  }

  test("withOrderedIndex survives fewer rows than partitions") {
    val df = Seq(30L, 10L, 20L).toDF("key")
    val ranked = Ranks.withOrderedIndex(df, "key", "idx", numPartitions = 8)
      .select("key", "idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranked.toSeq === Seq((10L, 0L), (20L, 1L), (30L, 2L)))
  }
}
