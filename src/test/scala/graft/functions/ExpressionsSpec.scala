package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.functions._

/** The native Catalyst cosine_similarity expression: Column API, SQL
  * registration via GraftExtensions, and agreement with the scalar kernel
  * (both interpreted eval and whole-stage codegen paths run under collect). */
class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.5f, -0.5f, 2.0f), Array(-1.0f, 4.0f, 0.25f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)) // zero norm → 0
  ).toDF("id", "a", "b")

  test("cosineNative matches the scalar kernel on float arrays") {
    val got = vecs
      .select($"id", CosineSimilarity.cosineNative($"a", $"b").as("cos"))
      .as[(Long, Double)].collect().toMap
    val expected = vecs.as[(Long, Array[Float], Array[Float])].collect()
      .map { case (id, a, b) => id -> VectorOps.cosineFloat(a, b) }.toMap
    got.foreach { case (id, c) =>
      assert(math.abs(c - expected(id)) < 1e-12, s"id=$id: $c vs ${expected(id)}")
    }
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(got(2L) === 0.0)
    assert(got(4L) === 0.0) // zero-norm guard, not NaN
  }

  test("cosine_similarity is callable from SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("vecs_t")
    val r = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM vecs_t ORDER BY id")
      .as[(Long, Double)].collect()
    assert(r.length === 4)
    assert(math.abs(r.head._2 - 1.0) < 1e-12)
  }

  test("cosine_similarity rejects non-array arguments") {
    vecs.createOrReplaceTempView("vecs_t")
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(id, a) FROM vecs_t").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_similarity") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
