package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 FunctionCatalog implementations of the table format's partition
  * transforms (round-11 verdict #3 — the Iceberg SystemFunctions shape
  * re-derived for this format): a scan that reports
  * `KeyGroupedPartitioning(bucket(8, k))` only becomes a
  * storage-partitioned join when Spark can RESOLVE that transform, which
  * it does by loading `bucket`/`days` from the table catalog's
  * FunctionCatalog and binding them against the argument types. The
  * bound function's `canonicalName` is what the two join sides compare
  * for compatibility, and `produceResult` replays EXACTLY the arithmetic
  * the writer stamped into the layout (`Acid.PartBucket`/`PartDays`
  * `.eval`), so any evaluation Spark chooses to do agrees with the
  * on-disk partition values byte-for-byte.
  */
object AcidFunctions {

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): floorMod(xxhash64(col, seed=42), n) — the " +
        "graft-acid write-time bucket transform"
    // UnsupportedOperationException per the UnboundFunction.bind
    // contract (round-12 advice): Spark's transform resolution treats it
    // as "this catalog can't serve the transform" and falls back to a
    // shuffle instead of failing the query
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType))
        throw new UnsupportedOperationException(
          s"bucket(n, col) binds (INT, BIGINT), got ${inputType.sql}")
      Bucket
    }
  }

  object Bucket extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(int,bigint)"
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val n = input.getInt(0)
      Math.floorMod(XXH64.hashLong(input.getLong(1), Acid.BucketSeed),
        n.toLong).toInt
    }
  }

  object DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): UTC epoch-day of a micros timestamp — the graft-acid " +
        "write-time day transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType)))
        throw new UnsupportedOperationException(
          s"days(ts) binds a TIMESTAMP, got ${inputType.sql}")
      DaysBound(inputType.fields(0).dataType)
    }
  }

  /** Bound per input flavor (TZ/NTZ both carry micros internally) with a
    * single canonical name, so the two sides of a join stay compatible
    * whichever flavor each table declares. */
  case class DaysBound(in: DataType) extends ScalarFunction[Integer] {
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days(timestamp)"
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      Math.floorDiv(input.getLong(0), Acid.MicrosPerDay).toInt
  }

  object HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "hours(ts): UTC epoch-hour of a micros timestamp — the graft-acid " +
        "write-time hour transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType)))
        throw new UnsupportedOperationException(
          s"hours(ts) binds a TIMESTAMP, got ${inputType.sql}")
      HoursBound(inputType.fields(0).dataType)
    }
  }

  case class HoursBound(in: DataType) extends ScalarFunction[Integer] {
    override def name(): String = "hours"
    override def canonicalName(): String = "graft.hours(timestamp)"
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      Math.floorDiv(input.getLong(0), Acid.MicrosPerHour).toInt
  }

  object MonthsUnbound extends UnboundFunction {
    override def name(): String = "months"
    override def description(): String =
      "months(ts): months since 1970-01 of a micros timestamp (UTC " +
        "calendar) — the graft-acid write-time month transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType)))
        throw new UnsupportedOperationException(
          s"months(ts) binds a TIMESTAMP, got ${inputType.sql}")
      MonthsBound(inputType.fields(0).dataType)
    }
  }

  /** produceResult calls the SAME `PartMonths.eval` that stamped the
    * layout, so SPJ evaluation agrees with the on-disk partition values
    * byte-for-byte (calendar arithmetic re-derivation would risk drift). */
  case class MonthsBound(in: DataType) extends ScalarFunction[Integer] {
    override def name(): String = "months"
    override def canonicalName(): String = "graft.months(timestamp)"
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    private val spec = Acid.PartMonths("x")
    override def produceResult(input: InternalRow): Integer =
      spec.eval(input.getLong(0)).toInt
  }

  object YearsUnbound extends UnboundFunction {
    override def name(): String = "years"
    override def description(): String =
      "years(ts): years since 1970 of a micros timestamp (UTC " +
        "calendar) — the graft-acid write-time year transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType)))
        throw new UnsupportedOperationException(
          s"years(ts) binds a TIMESTAMP, got ${inputType.sql}")
      YearsBound(inputType.fields(0).dataType)
    }
  }

  case class YearsBound(in: DataType) extends ScalarFunction[Integer] {
    override def name(): String = "years"
    override def canonicalName(): String = "graft.years(timestamp)"
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    private val spec = Acid.PartYears("x")
    override def produceResult(input: InternalRow): Integer =
      spec.eval(input.getLong(0)).toInt
  }

  /** Width-specialized single-argument truncate, `truncate_<n>(col)` —
    * the SPJ spelling: Spark's `KeyGroupedPartitioning
    * .supportsExpressions` only accepts transforms with ONE child (the
    * bucket transform smuggles its literal into `numBucketsOpt`; a
    * generic 2-arg transform is rejected and the scan degrades to
    * UnknownPartitioning). The scan therefore reports `truncate_1024(k)`
    * while DDL/DESCRIBE keep the standard `truncate(1024, k)`; both
    * sides of a join resolve the same name through this catalog and
    * compare equal canonical names per width. */
  case class TruncateNUnbound(n: Int) extends UnboundFunction {
    override def name(): String = s"truncate_$n"
    override def description(): String =
      s"truncate_$n(col): col - floorMod(col, $n) — width-specialized " +
        "single-arg spelling of the truncate transform (SPJ alignment)"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == LongType))
        throw new UnsupportedOperationException(
          s"truncate_$n(col) binds a BIGINT, got ${inputType.sql}")
      TruncateN(n)
    }
  }

  case class TruncateN(n: Int) extends ScalarFunction[java.lang.Long] {
    override def name(): String = s"truncate_$n"
    override def canonicalName(): String = s"graft.truncate_$n(bigint)"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long = {
      val v = input.getLong(0)
      java.lang.Long.valueOf(v - Math.floorMod(v, n.toLong))
    }
  }

  /** String-truncate SPJ spelling, `truncstr_<n>(col)`: the bound
    * function replays `PartTruncateStr.evalBytes` — the order-preserving
    * packed prefix that stamped the layout — so SPJ evaluation agrees
    * with the on-disk partition values byte-for-byte. Width-specialized
    * for the same reason as TruncateNUnbound. */
  case class TruncStrNUnbound(n: Int) extends UnboundFunction {
    override def name(): String = s"truncstr_$n"
    override def description(): String =
      s"truncstr_$n(col): order-preserving packed prefix of the first " +
        s"min($n, 8) UTF-8 bytes — the graft-acid string truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType))
        throw new UnsupportedOperationException(
          s"truncstr_$n(col) binds a STRING, got ${inputType.sql}")
      TruncStrN(n)
    }
  }

  case class TruncStrN(n: Int) extends ScalarFunction[java.lang.Long] {
    override def name(): String = s"truncstr_$n"
    override def canonicalName(): String = s"graft.truncstr_$n(string)"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long =
      java.lang.Long.valueOf(
        Acid.packPrefix(input.getUTF8String(0).getBytes, n))
  }

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(n, col): col - floorMod(col, n) — the graft-acid " +
        "write-time numeric truncate transform (Iceberg semantics)"
    override def bind(inputType: StructType): BoundFunction = {
      if (!(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType))
        throw new UnsupportedOperationException(
          s"truncate(n, col) binds (INT, BIGINT), got ${inputType.sql}")
      Truncate
    }
  }

  object Truncate extends ScalarFunction[java.lang.Long] {
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate(int,bigint)"
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long = {
      val n = input.getInt(0).toLong
      val v = input.getLong(1)
      java.lang.Long.valueOf(v - Math.floorMod(v, n))
    }
  }
}
