package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two double arrays — a custom Catalyst
  * `Expression` with whole-stage-codegen support.
  *
  * Why custom (SURVEY §4.3): Spark's array HOFs (`aggregate`, `zip_with`)
  * are CodegenFallback — interpreted per element — which measured ~200µs per
  * 64-dim cosine on the 2M-pair dedup join. Unrolling to 64 chained
  * `element_at` products stays in codegen but generates oversized methods
  * the JIT refuses. A `doGenCode` loop over `ArrayData.getDouble` is both
  * tiny and JIT-hot: the per-pair cost drops to the ~100ns a dot product
  * should take.
  *
  * Accumulation is the ascending-index left fold `((0+p0)+p1)+…` — the same
  * IEEE-754 order as DuckDB's list_dot_product / list_cosine_similarity, so
  * results rounded to 4 decimals hash-match the oracle.
  *
  * Assumes non-null elements (embeddings are dense); inputs shorter than the
  * other side are truncated to the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the vector kernel. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** dot(a,b) / (‖a‖‖b‖) — same arithmetic shape as DuckDB's
    * list_cosine_similarity (single divide at the end).
    */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))
}
