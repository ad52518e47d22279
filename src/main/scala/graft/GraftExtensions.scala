package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, WordShingles}

/** SparkSessionExtensions hook — the supported way to ship this engine's
  * custom Catalyst expressions to SQL users (SURVEY §4): activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`), after which
  * `vec_dot(a, b)` and `word_shingles3(text)` resolve in `spark.sql`
  * exactly like builtins, codegen included.
  *
  * No custom Rule or SparkStrategy is injected: every operator in
  * SURVEY §2 maps onto Catalyst's existing plan space; the engine extends
  * Spark only at the expression level, where the builtin HOFs measurably
  * cannot express the per-pair kernels (see VectorExpressions /
  * ShingleExpressions scaladoc).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles3"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles3"),
      (args: Seq[Expression]) => WordShingles(args.head)))
  }
}
