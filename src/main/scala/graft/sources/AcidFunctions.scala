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
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType,
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
      require(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == TimestampNTZType),
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
}
