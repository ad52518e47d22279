package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** Unit coverage for the pipeline-level transforms (error-port routing and
  * macro substitution) beyond the end-to-end oracle rows.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("errorPort splits rows exhaustively and error rows carry raw + reason") {
    import spark.implicits._
    val df = Seq(("1|10.5", true), ("2|x", false), ("3", false))
      .toDF("raw", "unused")
      .withColumn("parts", split(col("raw"), "\\|"))
    val ok = size(col("parts")) === 2 &&
      expr("try_cast(parts[1] AS DOUBLE)").isNotNull
    val reason = when(size(col("parts")) < 2, lit("missing_field"))
      .otherwise(lit("bad_number"))
    val (main, error) = Pipeline.errorPort(df, ok, col("raw"), reason)
    assert(main.count() == 1)
    val errs = error.orderBy("raw_record").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(errs == Seq(("2|x", "bad_number"), ("3", "missing_field")))
  }

  test("substituteMacros resolves all macros and fails fast on unknown ones") {
    assert(Pipeline.substituteMacros(
      "a = '${x}' AND b = ${y.z}", Map("x" -> "v", "y.z" -> "9")) ==
      "a = 'v' AND b = 9")
    val e = intercept[IllegalArgumentException](
      Pipeline.substituteMacros("${missing}", Map.empty))
    assert(e.getMessage.contains("missing"))
  }

  test("op_error_port main+error counts partition the input exactly") {
    val out = SparkEntry.queries("op_error_port")(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    val nOrders = Tables.orders(spark, sf).count()
    assert(total == nOrders, s"ports must partition the input: $total != $nOrders")
  }
}
