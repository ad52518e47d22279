package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions. The headline is the events.ts precision canary: the
  * driver's testdata has shipped `ts` as Parquet TIMESTAMP(NANOS) (rounds
  * 1-6) and timestamp[us] (round 7+), and a loader that assumes one encoding
  * either throws at analysis (batch) or silently collapses event time 1000×
  * (streaming read with a hardcoded Long schema). These tests synthesize the
  * same 120-event fixture at ns, µs-NTZ, µs-UTC, and ms precision and pin
  * both loaders to identical µs output on every variant.
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  // ---- fixture synthesis ------------------------------------------------
  // 120 events, 60 s apart (whole seconds, so the ms variant is lossless),
  // spanning three 1 h tumbling buckets. Base = 2023-11-14T22:13:20Z.
  private val BaseUs = 1700000000000000L
  private val N      = 120
  // (event_id, ts_us, user_id, event_type, value) — tuples, not a nested
  // case class (Spark can't encode inner classes of a test suite).
  private val evs = (0 until N).map { i =>
    (i.toLong, BaseUs + i * 60000000L, (i % 10).toLong,
      Seq("click", "view", "purchase")(i % 3), i * 0.5)
  }

  /** Spark-written variant: ts encoded per `tsCol` / writer conf. */
  private def sparkFixture(tag: String, tsCol: DataFrame => DataFrame,
      outputType: String = "TIMESTAMP_MICROS"): String = {
    val dir = Scratch.fresh(s"r8_prec_$tag", sf)
    import spark.implicits._
    val df = evs.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("props", lit("{}"))
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", outputType)
    try tsCol(df)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    dir
  }

  /** parquet-mr-written TIMESTAMP(NANOS) variant — Spark cannot write NANOS,
    * so drop to the example writer. Sub-µs remainders (+333 ns per row mod 3)
    * exercise the integer-division truncation.
    */
  private def nanosFixture(): String = {
    val dir = Scratch.fresh("r8_prec_ns", sf)
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val w = ExampleParquetWriter.builder(new HPath(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try evs.foreach { case (id, us, user, typ, v) =>
      val g = gf.newGroup()
      g.append("event_id", id)
      g.append("ts", us * 1000L + (id % 3) * 333L)
      g.append("user_id", user)
      g.append("event_type", typ)
      g.append("value", v)
      g.append("props", "{}")
      w.write(g)
    } finally w.close()
    dir
  }

  private lazy val nsDir   = nanosFixture()
  private lazy val usNtzDir = sparkFixture("us_ntz",
    _.withColumn("ts", col("ts").cast(TimestampNTZType)))
  private lazy val usTzDir  = sparkFixture("us_tz", identity)
  private lazy val msDir    = sparkFixture("ms", identity, "TIMESTAMP_MILLIS")

  private def loadedMicros(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("precision canary: batch loader is identical across ns/µs-ntz/µs-tz/ms") {
    val expected = evs.map(e => (e._1, e._2))
    assert(Tables.eventsTsType(spark, nsDir)    === LongType)
    assert(Tables.eventsTsType(spark, usNtzDir) === TimestampNTZType)
    assert(Tables.eventsTsType(spark, usTzDir)  === TimestampType)
    for ((dir, tag) <- Seq(nsDir -> "ns", usNtzDir -> "us_ntz",
        usTzDir -> "us_tz", msDir -> "ms"))
      assert(loadedMicros(dir) === expected, s"variant $tag diverged")
  }

  test("precision canary: driver testdata loads as session-TZ TIMESTAMP") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("composite merge: exact-pair matching with leading-column pruning") {
    import graft.sources.Acid
    import spark.implicits._
    val dir = Scratch.fresh("r8_composite", sf)
    // 1000 rows, k1 = i div 10 (0..99), k2 = i % 10 — 10 lines per group.
    val t = spark.range(1000)
      .select(expr("id div 10").as("k1"), expr("id % 10").as("k2"),
        (col("id") * 100).as("v"))
    Acid.create(spark, dir, t, Seq("k1", "k2"), 4, None)
    // Update exactly one (k1, k2) pair; insert one new pair under an
    // existing leading key.
    val batch = Seq((2L, 5L, -1L), (2L, 77L, -2L)).toDF("k1", "k2", "v")
    val r = Acid.merge(spark, dir, batch, "w")
    // Leading-key pruning: k1=2 lives in one of the 4 range files.
    assert(r.filesRewritten === 1 && r.filesTotal === 4)
    val snap = Acid.snapshot(spark, dir)
    assert(snap.count() === 1001)
    // ONLY the exact pair updated — the other 9 lines of group 2 intact
    // (a leading-key-only match would have clobbered all of them).
    assert(snap.filter(col("k1") === 2 && col("v") < 0).count() === 2)
    assert(snap.filter(col("k1") === 2 && col("k2") === 5).head.getLong(2) === -1L)
    assert(snap.filter(col("k1") === 2 && col("k2") === 3).head.getLong(2) === 2300L)
    // A batch not leading with the key columns is refused.
    intercept[IllegalArgumentException] {
      Acid.merge(spark, dir, Seq((1L, 1L)).toDF("k2", "v"), "w2")
    }
  }

  test("rename refuses on CHECK-constrained columns; chained renames keep one physical name") {
    import graft.sources.Acid
    import scala.util.Try
    val root = Scratch.fresh("r8_rename", sf)
    val cat = "graft_r8ren_" + java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    val t = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    Acid.create(spark, dir, t, "k", 2, Some("v >= 0"))
    spark.sql(s"DROP TABLE IF EXISTS $cat.missing") // force catalog init
    // constrained column refuses; unconstrained renames fine
    assert(Try(spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO w")).isFailure)
    Acid.setConstraint(spark, dir, None)
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO w")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN w TO x")
    // chained renames resolve to the ORIGINAL physical name
    assert(Acid.colMapOf(dir) === Map("x" -> "v"))
    assert(spark.table(s"$cat.t").filter(col("x") === 10).count() === 1)
    assert(Acid.snapshot(spark, dir).columns.toSeq === Seq("k", "x"))
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }

  test("OPTIMIZE and DELETE after a rename keep physical names and values") {
    import graft.sources.Acid
    val root = Scratch.fresh("r8_ren_opt", sf)
    val cat = "graft_r8ro_" + java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    val t = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    Acid.create(spark, dir, t, "k", 4)
    spark.sql(s"DROP TABLE IF EXISTS $cat.missing")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO w")
    // the rewrite must land PHYSICAL names — a logical-name rewrite would
    // read back all-NULL through the mapping (the round-8 near-miss)
    Acid.optimize(spark, dir, 2)
    assert(spark.table(s"$cat.t").filter(col("w").isNull).count() === 0)
    assert(spark.table(s"$cat.t").agg(sum(col("w"))).head.getLong(0) === 9900L)
    // DELETE with a logical-name predicate over the physical files
    spark.sql(s"DELETE FROM $cat.t WHERE w >= 180")
    assert(spark.table(s"$cat.t").count() === 90)
    assert(Acid.snapshot(spark, dir).agg(sum(col("w"))).head.getLong(0) === 8010L)
    // a shallow clone carries the mapping sidecars — without them the
    // clone would serve the physical name and the logical one would
    // read as missing
    val cloneDir = s"$root/t_clone"
    Acid.cloneShallow(spark, dir, cloneDir)
    assert(Acid.snapshot(spark, cloneDir).columns.toSeq === Seq("k", "w"))
    assert(Acid.snapshot(spark, cloneDir)
      .agg(sum(col("w"))).head.getLong(0) === 8010L)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }

  test("composite-key convert: in-place onboarding keeps exact-pair merges") {
    import graft.sources.Acid
    import spark.implicits._
    val dir = Scratch.fresh("r8_conv_comp", sf)
    spark.range(200)
      .select(expr("id div 20").as("k1"), expr("id % 20").as("k2"),
        (col("id") + 7).as("v"))
      .coalesce(2).write.mode("overwrite").parquet(dir)
    // Spark writes part files into the dir itself; flatten the layout the
    // way convert expects (no _SUCCESS, files at top level) — already true.
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, "_SUCCESS"))
    assert(Acid.convert(spark, dir, Seq("k1", "k2")) >= 1)
    Acid.merge(spark, dir, Seq((3L, 4L, -5L)).toDF("k1", "k2", "v"), "w")
    val snap = Acid.snapshot(spark, dir)
    assert(snap.count() === 200)
    assert(snap.filter(col("v") < 0).count() === 1)
    assert(snap.filter(col("k1") === 3 && col("k2") === 5).head.getLong(2) === 72L)
  }

  test("partitioned DDL: every inserted file carries exactly one partition value") {
    import graft.sources.Acid
    val root = Scratch.fresh("r8_partfiles", sf)
    val cat = "graft_r8pf_" + java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.pt")
    spark.sql(s"CREATE TABLE $cat.pt (k BIGINT, p BIGINT, v BIGINT) PARTITIONED BY (p)")
    spark.range(1000)
      .select(col("id").as("k"), expr("id % 7").as("p"), (col("id") * 3).as("v"))
      .createOrReplaceTempView("r8_pf_src")
    spark.sql(s"INSERT INTO $cat.pt SELECT k, p, v FROM r8_pf_src")
    val entries = Acid.readManifest(s"$root/pt", Acid.latestVersion(s"$root/pt")).files
    // the segment-rolling writer gives every file a ONE-value stats2
    // range — the property manifest partition-pruning depends on
    assert(entries.nonEmpty)
    assert(entries.forall(_.stats2.exists { case (c, lo, hi) => c == "p" && lo == hi }))
    assert(entries.map(_.stats2.get._2).distinct.size === 7)
    spark.sql(s"DROP TABLE IF EXISTS $cat.pt")
  }

  test("VACUUM DRY RUN reports orphans without reclaiming them") {
    import graft.sources.Acid
    val root = Scratch.fresh("r8_dryrun", sf)
    val cat = "graft_r8dr_" + java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    Acid.create(spark, dir,
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")), "k", 4)
    spark.sql(s"DROP TABLE IF EXISTS $cat.missing")
    Acid.optimize(spark, dir, 2) // orphans the 4 original files
    val dry = spark.sql(s"VACUUM $cat.t DRY RUN").head
    assert(dry.getLong(0) >= 4, "dry run must report the orphaned originals")
    // nothing reclaimed: time travel to v0 still works
    assert(Acid.snapshot(spark, dir, 0).count() === 100)
    val real = spark.sql(s"VACUUM $cat.t").head
    assert(real.getLong(0) === dry.getLong(0), "real vacuum reclaims what dry run reported")
    intercept[Exception](Acid.snapshot(spark, dir, 0).count())
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }

  test("precision canary: streaming loader is identical across ns and µs") {
    val run = SparkEntry.queries("st_tumbling")
    def result(dir: String) =
      run(spark, dir).collect().map(_.toSeq).toSeq
    val ns = result(nsDir)
    val us = result(usNtzDir)
    assert(ns.nonEmpty && ns === us)
    // The 120-minute fixture (22:13Z + 120 × 60 s) crosses three 1 h
    // buckets × 3 event types.
    assert(ns.size === 9)
  }
}
