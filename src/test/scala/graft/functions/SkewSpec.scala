package graft.functions

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // heavily skewed: one hot key with 10k rows, a long tail of singletons
  private lazy val big = ((1 to 10000).map(i => (1L, i.toDouble)) ++
    (2 to 50).map(k => (k.toLong, k.toDouble))).toDF("key", "value")
  private lazy val small = (1 to 50).map(k => (k.toLong, s"dim-$k")).toDF("key", "name")

  test("salted join output equals the plain join") {
    val plain = big.join(small, Seq("key"))
      .select("key", "value", "name").as[(Long, Double, String)]
      .collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedJoin(big, small, "key", salts = 8)
      .select("key", "value", "name").as[(Long, Double, String)]
      .collect().sortBy(r => (r._1, r._2))
    assert(salted === plain)
  }

  test("salted two-phase aggregate equals the direct aggregate") {
    val direct = big.groupBy("key")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("sum_value"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val salted = Skew.saltedCountSum(big, "key", "value", salts = 8)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(salted.map(r => (r._1, r._2)) === direct.map(r => (r._1, r._2)))
    salted.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s._3 - d._3) < 1e-6)
    }
  }
}
