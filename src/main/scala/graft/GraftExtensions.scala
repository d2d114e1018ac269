package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.CosineSimilarity

/**
 * SparkSessionExtensions entry point: registers graft's native Catalyst
 * functions so plain SQL can call them. Activate with
 * `spark.sql.extensions=graft.GraftExtensions` or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "cosine_similarity(a, b) takes exactly two arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
