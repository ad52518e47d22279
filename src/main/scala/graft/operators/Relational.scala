package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core — SURVEY.md §2.2 (project/filter), §2.3 (joins),
  * §2.4 (aggregation), §2.5 (windows), §2.6 (sort/limit/set ops).
  *
  * Determinism rules (SURVEY §2 preamble): every query ends in a total
  * ORDER BY, double aggregates are `round(_, 2)`, and no nondeterministic
  * ids/partition info ever reach the output — so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  // --- §2.4 agg_hash: TPC-H Q1 shape --------------------------------------
  // groupBy → HashAggregateExec with partial (map-side) + final aggregation;
  // only the 2 grouping keys shuffle, so this scales linearly with input.
  val aggHash: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def queries: Map[String, Q] = Map(
    "agg_hash" -> aggHash
  )

  def oracles: Map[String, String] = Map(
    "agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 2) AS avg_qty,
        | count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
