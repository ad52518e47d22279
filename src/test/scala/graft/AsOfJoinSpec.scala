package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** Edge-case coverage for the custom as-of join operator beyond the
  * end-to-end DuckDB oracle: tie handling, unmatched fact rows (inner
  * semantics), key isolation, and multi-partition correctness.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def run(
      fact: Seq[(Long, Long, Long)], dim: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    val f = fact.toDF("fid", "fkey", "fts").repartition(4)
    val d = dim.toDF("dkey", "dts", "tag").repartition(3)
    AsOfJoin.join(f, d, "fkey", "dkey", "fts", "dts")
      .select("fid", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  test("picks the greatest dim ts at-or-before each fact ts, per key") {
    val out = run(
      fact = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 15L)),
      dim = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (1L, 99L, "z")))
    assert(out == Seq((1L, "b"), (2L, "c"), (3L, "c")))
  }

  test("fact rows before any dim row are dropped (inner as-of)") {
    val out = run(
      fact = Seq((1L, 1L, 3L), (2L, 1L, 7L)),
      dim = Seq((1L, 5L, "a")))
    assert(out == Seq((2L, "a")))
  }

  test("keys never leak matches across each other") {
    val out = run(
      fact = Seq((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L)),
      dim = Seq((1L, 9L, "k1"), (3L, 2L, "k3")))
    assert(out == Seq((1L, "k1"), (3L, "k3")))
  }

  test("exact ts tie matches (<= semantics)") {
    val out = run(
      fact = Seq((1L, 7L, 100L)),
      dim = Seq((7L, 100L, "exact"), (7L, 101L, "later")))
    assert(out == Seq((1L, "exact")))
  }

  test("null keys never match, on either side (SQL equality semantics)") {
    import spark.implicits._
    val f = Seq((1L, Option(1L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("fid", "fkey", "fts").repartition(4)
    val d = Seq((Option(1L), 5L, "a"), (Option.empty[Long], 1L, "nulldim"))
      .toDF("dkey", "dts", "tag").repartition(3)
    val out = AsOfJoin.join(f, d, "fkey", "dkey", "fts", "dts")
      .select("fid", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    // fact#2 (null key) matches nothing; the null-key dim row is never a
    // candidate for anyone.
    assert(out == Seq((1L, "a")))
  }

  test("non-Long-backed ts columns are rejected up front") {
    import spark.implicits._
    val f = Seq((1L, 1L, 10)).toDF("fid", "fkey", "fts") // fts is Int
    val d = Seq((1L, 5L, "a")).toDF("dkey", "dts", "tag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(f, d, "fkey", "dkey", "fts", "dts")
    }
    assert(e.getMessage.contains("fts"))
  }

  test("matches the window-encoding equivalent on the events fixture") {
    val native = SparkEntry.queries("join_asof_native")(spark, sf)
      .select("event_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    // join_asof (window encoding, LEFT semantics) restricted to matched rows
    val window = SparkEntry.queries("join_asof")(spark, sf)
      .filter("click_ts IS NOT NULL")
      .select("event_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(native == window)
  }
}
