package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Scratch, TestSpark}

/** Round-17 pins.
  *
  * First family: the fstats NaN-literal hole (round-16 ADVICE, medium).
  * A conjunct whose literal is NaN (`x = NaN`, `x <= NaN`, `x IN (NaN)`)
  * is TRUE for NaN rows under Spark semantics — NaN equals NaN and
  * orders above every value — yet `fltDecode` refuses the literal, so
  * before the fix it silently dropped out of the sortable-bits envelope
  * and pruning ran on the REMAINING conjuncts: `x = NaN AND x >= 0`
  * produced nanPossible=false with lo=enc(0.0), and a nan-bearing file
  * whose finite bounds were all negative was pruned — its matching NaN
  * rows lost (wrong rows, not just a weak plan). The fix skips fstats
  * pruning for any column whose conjunction carries an undecodable
  * literal, in both the V2 scan tier and the V1 relation tier.
  */
class Round17Spec extends AnyFunSuite {
  import TestSpark._

  test("fstats pruning: NaN literal disables the column's pruning (V2 + V1)") {
    import spark.implicits._
    val root = Scratch.fresh("r17_nanlit", sf)
    val cat = "r17nl"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, x DOUBLE)")
    // file A: finite bounds all NEGATIVE, plus NaN every 10th row — the
    // exact shape the pre-fix prune dropped under `x = NaN AND x >= 0`
    spark.range(100L).select(col("id").as("k"),
      when(col("id") % 10 === 0, lit(Double.NaN))
        .otherwise(-lit(100.5d) + col("id")).as("x"))
      .createOrReplaceTempView("r17_nl_a")
    spark.sql(s"INSERT INTO $cat.t SELECT k, x FROM r17_nl_a")
    // file B: NaN-free, positive bounds
    spark.range(100L).select((col("id") + 100L).as("k"),
      (col("id") + lit(0.5d)).as("x"))
      .createOrReplaceTempView("r17_nl_b")
    spark.sql(s"INSERT INTO $cat.t SELECT k, x FROM r17_nl_b")
    // NaN = NaN holds and NaN >= 0.0 holds: the 10 NaN rows of file A
    // match even though A's finite bounds sit entirely below zero
    val q = spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE x = double('NaN') AND x >= 0.0")
    assert(q.head.getLong(0) === 10L,
      "NaN rows must survive a NaN-literal conjunction over the V2 scan")
    // IN with a NaN member takes the same hole through the probe collector
    val q2 = spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE x IN (double('NaN')) AND x >= 0.0")
    assert(q2.head.getLong(0) === 10L)
    // an upper bound with a NaN literal (`x <= NaN` is true for ALL rows
    // incl. NaN — NaN orders above everything) must not prune by bounds
    val q3 = spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE x <= double('NaN')")
    assert(q3.head.getLong(0) === 200L)
    // NaN-free conjunctions keep pruning exactly as before
    AcidSql.resetRowGroupMetrics()
    val q4 = spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE x > 50.0 AND x < 60.0")
    assert(q4.head.getLong(0) === 10L)
    assert(AcidSql.vecRowsFooter.sum() <= 100L,
      "NaN-free window must still prune the out-of-range file")
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")

    // V1 relation tier: same fixture via the library path
    val dir = s"$root/v1"
    Acid.create(spark, dir,
      (0L until 200L).map(k =>
        (k, if (k < 100L) { if (k % 10 == 0) Double.NaN else k - 100.5 }
            else k - 99.5)).toDF("k", "x"),
      "k", 2)
    val v1 = spark.read.format("graft-acid").load(dir)
    assert(v1.filter(col("x") === Double.NaN && col("x") >= 0.0).count() === 10L,
      "NaN rows must survive a NaN-literal conjunction over the V1 relation")
    assert(AcidRelation.lastScanFor(dir)._1 === 2,
      "the NaN-literal column must not prune any file on V1")
  }
}
