package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row kernel for word-3-gram shingling, shared by interpreted eval and the
  * generated code (the codegen path emits one static call per row).
  *
  * Exactly equivalent to the declarative formulation it replaces —
  *   array_distinct(transform(sequence(1, n-2), i ->
  *     concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
  * with toks = split(text, ' ') — including empty-token behavior (split
  * keeps trailing empties) and first-occurrence dedup order, so the DuckDB
  * oracles that re-derive shingles in SQL are unaffected.
  */
object ShingleKernel {
  def shingle3(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it  = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }
}

/** string → array<string> of distinct word-3-gram shingles as a custom
  * Catalyst Expression.
  *
  * Why custom (SURVEY §4.3): the HOF formulation above is CodegenFallback —
  * every lambda application is interpreted, measured ~60µs per shingle,
  * i.e. ~5 s for the 2.5M shingles of sf0.1's documents. One compiled loop
  * per row does the same work in ~0.3 s and keeps the surrounding projection
  * inside whole-stage codegen.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingle3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.shingle3($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleFunctions {
  def wordShingles3(text: Column): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text)))
}
