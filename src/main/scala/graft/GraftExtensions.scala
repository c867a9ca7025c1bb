package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** Engine extensions: registers the native expressions as SQL functions so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works anywhere the
  * DataFrame API does. Install with
  * `.withExtensions(new GraftExtensions)` on the session builder, or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarity)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  val cosineSimilarity: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    info("cosine_similarity",
      "_FUNC_(a, b) - cosine similarity of two array<double> vectors (codegen)"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })
}
