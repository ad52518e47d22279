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
  * Two extension tiers are injected, each only where Spark's built-ins
  * genuinely cannot express the semantics (SURVEY §4 preference order):
  *  - expression level: `vec_dot(a, b)` / `word_shingles3(text)` — custom
  *    codegen expressions replacing the CodegenFallback HOFs (see
  *    VectorExpressions / ShingleExpressions scaladoc);
  *  - operator level: [[graft.plans.AsOfJoinStrategy]] plans the custom
  *    [[graft.plans.AsOfJoinPlan]] logical node into a merge-based
  *    physical as-of join (Spark has no native as-of join).
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
    // Spark ships a production Bloom-filter aggregate/probe pair in
    // catalyst (it powers runtime row-level filtering) but does NOT
    // register them as SQL functions. Exposing them through the extension
    // point gives users the build-once/probe-many membership primitive
    // (semi-join prefilter, dirty-key screens) with zero new code — the
    // sketch is Spark's own, merge-able across partitions, and the probe
    // side stays codegen.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Cost-based identstr SPJ must run AFTER V2 pushdown and
    // PartitionPruning; the injectOptimizerRule batch runs before both,
    // so the builder registers the real rule into the session's
    // experimental extraOptimizations ("User Provided Optimizers", the
    // LAST optimizer batch) and contributes nothing itself.
    ext.injectOptimizerRule { session =>
      if (!session.experimental.extraOptimizations
            .contains(graft.plans.IdentstrSpjAutoRule))
        session.experimental.extraOptimizations =
          session.experimental.extraOptimizations :+
            graft.plans.IdentstrSpjAutoRule
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(p: org.apache.spark.sql.catalyst.plans.logical
            .LogicalPlan) = p
      }
    }
    // SQL maintenance statements (OPTIMIZE / VACUUM / DESCRIBE HISTORY)
    // — the Delta-style injected-parser surface; see GraftSqlParser.
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}
