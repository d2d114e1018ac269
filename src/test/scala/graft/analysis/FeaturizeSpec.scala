package graft.analysis

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta alpha"),
    (2L, "beta gamma"),
    (3L, "delta delta delta"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("vectors are L2-normalized and empty docs vanish") {
    val v = Featurize.hashedTfidf(docs, "doc_id", "text", dims = 16)
      .as[(Long, Long, Double)].collect()
    assert(!v.exists(_._1 == 4L))
    val norms = v.groupBy(_._1).view
      .mapValues(rows => math.sqrt(rows.map(r => r._3 * r._3).sum)).toMap
    norms.foreach { case (id, n) =>
      assert(math.abs(n - 1.0) < 1e-9, s"doc $id norm $n")
    }
    assert(v.forall(r => r._2 >= 0 && r._2 < 16))
  }

  test("rarer terms carry more weight (idf monotone)") {
    // 'alpha' (df=1, tf=2) must outweigh 'beta' (df=2, tf=1) in doc 1
    val dimOf = (t: String) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val v = Featurize.hashedTfidf(docs, "doc_id", "text", dims = 16)
      .filter($"doc_id" === 1L).as[(Long, Long, Double)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(dimOf("alpha") !== dimOf("beta"), "fixture must not collide")
    assert(v(dimOf("alpha")) > v(dimOf("beta")),
      s"idf ordering violated: $v")
  }

  test("colliding terms sum into one dimension") {
    // dims=2 forces collisions; per-doc dim count is <= 2 and weights
    // still normalize
    val v = Featurize.hashedTfidf(docs, "doc_id", "text", dims = 2)
      .as[(Long, Long, Double)].collect()
    assert(v.groupBy(_._1).forall(_._2.length <= 2))
    val n1 = math.sqrt(v.filter(_._1 == 1L).map(r => r._3 * r._3).sum)
    assert(math.abs(n1 - 1.0) < 1e-9)
  }

  test("no window and no driver action in the plan") {
    val big = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val plan = Featurize.hashedTfidf(big, "doc_id", "text", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hashedTfidf must not window:\n$plan")
  }
}
