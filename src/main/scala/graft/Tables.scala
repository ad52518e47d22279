package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.ts` is Parquet TIMESTAMP(NANOS), which Spark 4.x rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set — after which `ts` arrives
    * as a Long of nanoseconds. We truncate to microseconds with *integer*
    * division (`div`), never via double math: ns-since-epoch (~1.7e18)
    * exceeds the 2^53 double mantissa, so a float path can land 1µs off the
    * value DuckDB's `CAST(ts AS TIMESTAMP)` produces and break hash parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
