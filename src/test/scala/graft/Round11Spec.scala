package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Acid, AcidSql}

/** Round-11 pins: row-group pruning inside the V2 parquet readers —
  * filtered reads must decode a strict subset of row groups (footer-block
  * accounting), results must stay byte-identical to an unfiltered read
  * filtered in memory, and the deletion-vector paths must keep their
  * contracts (key-level DVs compose with the filter; positional DVs
  * disable it, because they address absolute row ordinals).
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  /** A 2-file ACID table of 20k rows, OPTIMIZE-rewritten under a small
    * parquet.block.size so each file is key-sorted across many row
    * groups. Returns the table dir. */
  private def rowGroupTable(tag: String): String = {
    val root = Scratch.fresh(tag, sf)
    val dir = s"$root/t"
    val t = spark.range(20000).select(col("id").as("k"),
      (col("id") * 7 % 1000).as("v"),
      concat(lit("s"), lpad(col("id").cast("string"), 8, "0")).as("tag"))
    Acid.create(spark, dir, t, "k", 2)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.block.size", "16384")
    hc.set("parquet.page.size", "4096")
    try Acid.optimizeRange(spark, dir, 0L, Long.MaxValue, 2): Unit
    finally {
      hc.unset("parquet.block.size"); hc.unset("parquet.page.size")
    }
    dir
  }

  test("columnar V2 read: pushed range filter decodes a strict row-group subset, parity holds") {
    val dir = rowGroupTable("r11_rg_col")
    AcidSql.resetRowGroupMetrics()
    val got = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("k") >= 5000L && col("k") <= 5500L)
      .agg(count(lit(1)), sum(col("v")), min(col("k")), max(col("k"))).head
    val (read, total) = (AcidSql.rowGroupsRead.sum, AcidSql.rowGroupsTotal.sum)
    assert(read >= 1 && read < total,
      s"expected a strict row-group subset, read $read of $total")
    assert(got.getLong(0) === 501L)
    assert(got.getLong(1) === (5000L to 5500L).map(_ * 7 % 1000).sum)
    assert(got.getLong(2) === 5000L && got.getLong(3) === 5500L)
    // unfiltered read decodes every group of every file it opens
    AcidSql.resetRowGroupMetrics()
    assert(spark.read.format("graft-acid-sql").load(dir).count() === 20000L)
    assert(AcidSql.rowGroupsRead.sum === AcidSql.rowGroupsTotal.sum)
  }

  test("columnar V2 read: string equality prunes row groups via binary stats") {
    val dir = rowGroupTable("r11_rg_str")
    AcidSql.resetRowGroupMetrics()
    // tag is zero-padded so lexicographic order == key order: tight stats
    val got = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("tag") === "s00012345").select(col("k")).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(12345L))
    val (read, total) = (AcidSql.rowGroupsRead.sum, AcidSql.rowGroupsTotal.sum)
    assert(read >= 1 && read < total,
      s"string point probe should skip groups, read $read of $total")
  }

  test("key-level DV composes with the pushed filter; results exact") {
    val dir = rowGroupTable("r11_rg_dv")
    Acid.deleteWhereMor(spark, dir, col("k") % 10 === 3, None, "w")
    // DV present → masked columnar read since round 12 (was the row
    // reader); filter still pushed (key DVs are by key, not ordinal, so
    // row-group/record skipping cannot break them)
    val got = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("k") >= 100L && col("k") <= 200L)
      .select(col("k")).collect().map(_.getLong(0)).sorted
    val want = (100L to 200L).filterNot(_ % 10 == 3)
    assert(got.toSeq === want)
  }

  test("positional DV disables row-group skipping, stays exact") {
    val dir = rowGroupTable("r11_rg_pdv")
    Acid.deleteWherePositional(spark, dir, col("k") % 10 === 3, None, "w")
    val got = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("k") >= 100L && col("k") <= 200L)
      .select(col("k")).collect().map(_.getLong(0)).sorted
    val want = (100L to 200L).filterNot(_ % 10 == 3)
    assert(got.toSeq === want)
  }

  test("schema-evolved file drops the untranslatable conjunct, keeps reading") {
    val root = Scratch.fresh("r11_rg_evo", sf)
    val dir = s"$root/t"
    val t = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    Acid.create(spark, dir, t, "k", 2)
    // merge a batch carrying a NEW column: untouched files predate `w`
    val batch = spark.range(10).select(col("id").as("k"),
      (col("id") * 2).as("v"), lit(7L).as("w"))
    Acid.merge(spark, dir, batch, "m")
    // filter on the evolved column: files without `w` must not throw and
    // must surface their rows (predicate re-applied above reads NULL-safe)
    val got = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("w") === 7L).count()
    assert(got === 10L)
  }

  test("checkpoint shards stay key-sorted under a merge-heavy history") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Scratch.fresh("r11_shard_sort", sf)
    val t = spark.range(6000).select(col("id").as("k"), (col("id") * 2).as("v"))
    Acid.create(spark, dir, t, "k", 600)
    import spark.implicits._
    // 10 scattered point merges: each rewrite moves its entry to the
    // manifest TAIL (path-keyed fold re-appends), so by commit #10 the
    // cadence checkpoint's full list is key-shuffled at the tail — the
    // drift that made unsorted shards overlap and planning degrade
    (1 to 10).foreach { i =>
      val k = (i * 577L) % 6000L
      assert(!Acid.merge(spark, dir,
        Seq((k, -i.toLong)).toDF("k", "v"), s"w$i").skipped)
    }
    Acid.clearManifestCache()
    val cpP = Paths.get(dir, "_log", "c00010.txt")
    assert(Files.exists(cpP), "cadence checkpoint at v10")
    val cp = Files.readAllLines(cpP).asScala.toSeq
    assert(cp(1) === "@shards")
    val ranges = cp.drop(2).filter(_.nonEmpty)
      .map(_.split('|')).map(a => (a(2).toLong, a(3).toLong))
    assert(ranges.sortBy(_._1) === ranges, "shards written in key order")
    assert(ranges.sliding(2).forall {
      case Seq((_, h0), (l1, _)) => l1 > h0
      case _                     => true
    }, s"shard key ranges stay pairwise disjoint: $ranges")
    // a mid-keyspace window still parses exactly ONE shard
    val (ents, total, shardsParsed) =
      Acid.planRangeEntries(dir, 10, 3000L, 3019L)
    assert(total === 600 && shardsParsed === 1 && ents.nonEmpty,
      s"window planning after merges: ${ents.size} entries, $shardsParsed shards")
  }

  test("storage-partitioned join: two bucket(8,k) tables join with zero exchanges") {
    val root = Scratch.fresh("r11_spj", sf)
    val cat = "graft_r11spj_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.a")
    spark.sql(s"DROP TABLE IF EXISTS $cat.b")
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, w BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.range(5000).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("r11a")
    spark.sql(s"INSERT INTO $cat.a SELECT k, v FROM r11a")
    spark.sql(s"INSERT INTO $cat.b SELECT k, v * 3 FROM r11a WHERE k % 2 = 0")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(
        s"SELECT a.k, a.v, b.w FROM $cat.a a JOIN $cat.b b ON a.k = b.k")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected an exchange-free storage-partitioned join:\n$plan")
      val rows = q.collect()
      assert(rows.length === 2500)
      assert(rows.map(_.getLong(2)).sum === (0L until 5000L by 2).map(_ * 6L).sum)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("SPJ on a (days, bucket) two-transform layout joins exchange-free") {
    val root = Scratch.fresh("r11_spj2", sf)
    val cat = "graft_r11spj2_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    Seq("a", "b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.$t")
      spark.sql(s"""CREATE TABLE $cat.$t (k BIGINT, ts TIMESTAMP, uid BIGINT,
                   |v BIGINT) PARTITIONED BY (days(ts), bucket(4, uid))""".stripMargin)
    }
    spark.range(800).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 80) * 86400000000 + id * 1000 AS BIGINT)) AS ts",
      "CAST(id % 8 AS BIGINT) AS uid", "id AS v")
      .createOrReplaceTempView("r11_spj2_src")
    spark.sql(s"INSERT INTO $cat.a SELECT k, ts, uid, v FROM r11_spj2_src")
    spark.sql(s"INSERT INTO $cat.b SELECT k, ts, uid, v * 10 FROM r11_spj2_src")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(s"""SELECT a.k, b.v FROM $cat.a a JOIN $cat.b b
                           |ON a.ts = b.ts AND a.uid = b.uid""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"two-transform SPJ should plan exchange-free:\n$plan")
      // each (ts, uid) pair is unique, so the join is 1:1
      assert(q.count() === 800L)
      assert(q.agg(sum(col("v"))).head.getLong(0) === (0L until 800L).map(_ * 10L).sum)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tbl_spj_join row matches a direct computation and pins exchange-free") {
    val df = SparkEntry.queries("tbl_spj_join")(spark, sf)
    val r = df.head
    val base = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("pc"))
    val b = base.filter(col("k") % 3 === 0)
    val w = base.as("a").join(b.as("b"), "k")
      .agg(count(lit(1)),
        sum(col("a.pc") + col("b.pc") * 2),
        min(col("k")), max(col("k"))).head
    assert(r.getLong(0) === w.getLong(0))
    assert(r.getLong(1) === w.getLong(1))
    assert(r.getLong(2) === w.getLong(2))
    assert(r.getLong(3) === w.getLong(3))
    assert(r.getBoolean(4))
  }

  test("tbl_cbo_ndv row: non-key NDV exposed, reorder pinned, values match") {
    val df = SparkEntry.queries("tbl_cbo_ndv")(spark, sf)
    val r = df.head
    val base = Tables.orders(spark, sf).select(
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderpriority").as("prio")).filter(col("prio") < "3")
    val w = base.agg(count(lit(1)), sum(col("cents"))).head
    assert(r.getLong(0) === w.getLong(0))
    assert(r.getLong(1) === w.getLong(1))
    assert(r.getBoolean(2), "non-key NDV must surface in attribute stats")
    assert(r.getBoolean(3), "prio dim must reorder before the code dim")
  }

  test("ndv stamps round-trip the manifest and fold into scan stats") {
    val root = Scratch.fresh("r11_ndv", sf)
    val dir = s"$root/t"
    val t = spark.range(4000).select(col("id").as("k"),
      concat(lit("g"), (col("id") % 7).cast("string")).as("grp"))
    Acid.create(spark, dir, t, "k", 4)
    val m = Acid.readManifest(dir, 0)
    assert(m.files.nonEmpty && m.files.forall(_.ndv.exists(_._1 == "grp")),
      "every file carries an NDV stamp for grp")
    // 7 values present in every range file: HLL is exact at this size
    assert(m.files.forall(_.ndv.find(_._1 == "grp").get._2 === 7L))
  }

  test("distributed vacuum splits prefixes recursively; exact counts, no double-listing") {
    import java.nio.file.{Files, Paths}
    val dir = Scratch.fresh("r11_vac_split", sf)
    Acid.create(spark, dir,
      spark.range(6000).select(col("id").as("k"), col("id").as("v")), "k", 600)
    // orphans in THREE shapes the split must each cover exactly once:
    // root-level loose file, flat orphan dir, nested orphan subtree
    spark.range(10).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$dir/d_orphan_flat")
    spark.range(10).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$dir/d_orphan_nest/sub/leaf")
    val flatParts = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(dir, "d_orphan_flat"))
      try st.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally st.close()
    }
    Files.copy(
      {
        import scala.jdk.CollectionConverters._
        val st = Files.walk(Paths.get(dir, "d_orphan_flat"))
        try st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally st.close()
      },
      Paths.get(dir, "loose_orphan.parquet"))
    val expect = flatParts * 2 + 1
    val (dry, liveN) = Acid.vacuum(spark, dir, 0, dryRun = true)
    assert(dry === expect && liveN === 600,
      s"dry run counts each orphan exactly once: ($dry, $liveN), want $expect")
    val (del, _) = Acid.vacuum(spark, dir, 0)
    assert(del === expect)
    assert(!Files.exists(Paths.get(dir, "loose_orphan.parquet")))
    assert(Acid.snapshot(spark, dir).count() === 6000L, "live data untouched")
  }

  test("nested ADD COLUMN: metadata-only splice, physical schemas stay mixed") {
    val root = Scratch.fresh("r11_nested", sf)
    val dir = s"$root/t"
    import org.apache.spark.sql.types.LongType
    val t = spark.range(1000).select(col("id").as("k"),
      struct((col("id") % 5).cast("string").as("tag"),
        (col("id") * 2).as("w")).as("m"))
    Acid.create(spark, dir, t, "k", 4)
    Acid.addColumn(spark, dir, Seq("m", "extra"), LongType)
    // read splices the declared-only leaf as NULL on every carried file
    val snap = Acid.snapshot(spark, dir)
    assert(snap.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("tag", "w", "extra"))
    assert(snap.filter(col("m.extra").isNotNull).count() === 0L)
    assert(snap.filter(col("m.w").isNotNull).count() === 1000L,
      "existing leaves untouched by the splice")
    // a merge writes the field for keys 0..99; untouched files stay narrow
    import spark.implicits._
    val batch = spark.range(100).select(col("id").as("k"),
      struct((col("id") % 5).cast("string").as("tag"), (col("id") * 2).as("w"),
        (col("id") + 7).as("extra")).as("m"))
    assert(!Acid.merge(spark, dir, batch, "w1").skipped)
    val after = Acid.snapshot(spark, dir)
    assert(after.filter(col("m.extra").isNotNull).count() === 100L)
    assert(after.filter(col("k") === 42L).select(col("m.extra")).head.getLong(0) === 49L)
    assert(after.filter(col("k") === 500L).select(col("m.extra")).head.isNullAt(0))
    // physical proof: at least one carried file still has the NARROW struct
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    val widths = m.files.map(f => spark.read.parquet(s"$dir/${f.path}")
      .schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType].length).toSet
    assert(widths === Set(2, 3), s"mixed physical widths expected, got $widths")
    // deeper nesting refuses cleanly on a non-struct parent
    intercept[IllegalArgumentException] {
      Acid.addColumn(spark, dir, Seq("k", "x"), LongType)
    }
  }

  test("parquet bloom on the key skips row groups in an UNSORTED layout") {
    val root = Scratch.fresh("r11_bloomrg", sf)
    val cat = "graft_r11brg_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.u")
    spark.sql(s"CREATE TABLE $cat.u (k BIGINT, v BIGINT)")
    try {
      spark.conf.set("spark.graft.write.rowGroupBytes", "65536")
      // keys SHUFFLED before the write: every row group spans ~the full
      // key range, so min/max stats cannot skip a point probe — only the
      // key bloom the V2 writer embeds can
      spark.range(60000).selectExpr("id AS k", "id * 2 AS v")
        .orderBy(expr("hash(id)")).coalesce(1)
        .createOrReplaceTempView("r11brg_src")
      spark.sql(s"INSERT INTO $cat.u SELECT k, v FROM r11brg_src")
    } finally spark.conf.set("spark.graft.write.rowGroupBytes", "0")
    AcidSql.resetRowGroupMetrics()
    val got = spark.sql(s"SELECT v FROM $cat.u WHERE k = 31337").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(62674L))
    val (read, total) = (AcidSql.rowGroupsRead.sum, AcidSql.rowGroupsTotal.sum)
    assert(total >= 4, s"fixture must span several row groups, got $total")
    assert(read >= 1 && read * 2 <= total,
      s"bloom should reject most groups of an unsorted layout: $read of $total")
  }

  test("V2 SQL surface holds struct columns: create, insert, select, nested ALTER") {
    val root = Scratch.fresh("r11_sqlnested", sf)
    val cat = "graft_r11sn_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.n")
    spark.sql(s"""CREATE TABLE $cat.n (k BIGINT,
                 |meta STRUCT<tag: STRING, w: BIGINT>, v BIGINT)""".stripMargin)
    spark.range(500).selectExpr("id AS k",
      "named_struct('tag', concat('t', CAST(id % 5 AS STRING)), 'w', id * 2) AS meta",
      "id * 3 AS v").createOrReplaceTempView("r11sn_src")
    spark.sql(s"INSERT INTO $cat.n SELECT k, meta, v FROM r11sn_src")
    // read back through the V2 row reader: nested values exact, NULL-safe
    assert(spark.sql(s"SELECT count(*) FROM $cat.n").head.getLong(0) === 500L)
    assert(spark.sql(s"SELECT sum(meta.w) FROM $cat.n").head.getLong(0)
      === (0L until 500L).map(_ * 2L).sum)
    assert(spark.sql(s"SELECT meta.tag FROM $cat.n WHERE k = 7").head.getString(0) === "t2")
    // a NULL struct row survives the round-trip as NULL
    spark.sql(s"INSERT INTO $cat.n VALUES (1000, NULL, 5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.n WHERE meta IS NULL")
      .head.getLong(0) === 1L)
    // nested ALTER: metadata-only; old files NULL-fill the new leaf
    spark.sql(s"ALTER TABLE $cat.n ADD COLUMNS (meta.score BIGINT)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.n WHERE meta.score IS NOT NULL")
      .head.getLong(0) === 0L)
    // an INSERT at the wide shape lands; narrow files keep NULL-filling
    spark.sql(s"INSERT INTO $cat.n SELECT 2000, named_struct(" +
      "'tag', 'x', 'w', CAST(1 AS BIGINT), 'score', CAST(99 AS BIGINT)), 6")
    val agg = spark.sql(s"""SELECT count(*) AS n,
                           |sum(coalesce(meta.score, 0)) AS s
                           |FROM $cat.n""".stripMargin).head
    assert(agg.getLong(0) === 502L && agg.getLong(1) === 99L)
    // nested column pruning: SELECT meta.w only — still exact
    assert(spark.sql(s"SELECT sum(meta.w) FROM $cat.n").head.getLong(0)
      === (0L until 500L).map(_ * 2L).sum + 1L)
  }

  test("tbl_sql_nested row matches a direct computation") {
    val df = SparkEntry.queries("tbl_sql_nested")(spark, sf)
    val r = df.head
    val base = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val nBase = base.count()
    val ins = base.filter(col("k") % 11 === 0)
    val w = ins.agg(count(lit(1)), sum(col("cents")), sum(col("k") * 5)).head
    assert(r.getLong(0) === nBase + w.getLong(0))
    assert(r.getLong(1) ===
      base.agg(sum(col("cents"))).head.getLong(0) + w.getLong(1))
    assert(r.getLong(2) === w.getLong(2), "sum_score")
    assert(r.getLong(3) === w.getLong(0), "n_scored")
    assert(r.getLong(4) === base.select(col("prio")).distinct().count())
    assert(r.getBoolean(5), "nested ALTER must be metadata-only")
  }

  test("V2 SQL surface holds ARRAY<FLOAT> embedding columns") {
    val root = Scratch.fresh("r11_sqlembed", sf)
    val cat = "graft_r11se_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.e")
    spark.sql(s"CREATE TABLE $cat.e (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)")
    Tables.embeddings(spark, sf).createOrReplaceTempView("r11se_src")
    spark.sql(s"INSERT INTO $cat.e SELECT vec_id, embedding, label FROM r11se_src")
    val n = Tables.embeddings(spark, sf).count()
    assert(spark.sql(s"SELECT count(*) FROM $cat.e").head.getLong(0) === n)
    // element-exact round-trip: quantized per-row sums match the source
    val q = "aggregate(transform(embedding, " +
      "x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)), " +
      "CAST(0 AS BIGINT), (a, x) -> a + x)"
    val got = spark.sql(s"SELECT sum($q) FROM $cat.e").head.getLong(0)
    val want = spark.sql(s"SELECT sum($q) FROM r11se_src").head.getLong(0)
    assert(got === want)
    assert(spark.sql(s"SELECT size(embedding) FROM $cat.e WHERE vec_id = 3")
      .head.getInt(0) === 64)
    // NULL array and empty array both survive the round-trip
    spark.sql(s"INSERT INTO $cat.e VALUES (900001, NULL, 7), " +
      "(900002, array(), 7)")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.e WHERE embedding IS NULL").head.getLong(0) === 1L)
    assert(spark.sql(
      s"SELECT size(embedding) FROM $cat.e WHERE vec_id = 900002").head.getInt(0) === 0)
  }

  test("V2 SQL surface holds MAP columns: round-trip, NULL map, NULL values") {
    val root = Scratch.fresh("r11_sqlmap", sf)
    val cat = "graft_r11sm_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.m")
    spark.sql(s"CREATE TABLE $cat.m (k BIGINT, attrs MAP<STRING, BIGINT>)")
    spark.range(300).selectExpr("id AS k",
      "map(concat('a', CAST(id % 3 AS STRING)), id * 2, 'b', id) AS attrs")
      .createOrReplaceTempView("r11sm_src")
    spark.sql(s"INSERT INTO $cat.m SELECT k, attrs FROM r11sm_src")
    spark.sql(s"INSERT INTO $cat.m VALUES (9001, NULL), " +
      "(9002, map()), (9003, map('x', CAST(NULL AS BIGINT)))")
    assert(spark.sql(s"SELECT count(*) FROM $cat.m").head.getLong(0) === 303L)
    assert(spark.sql(s"SELECT sum(attrs['b']) FROM $cat.m").head.getLong(0)
      === (0L until 300L).sum)
    assert(spark.sql(s"SELECT attrs['a1'] FROM $cat.m WHERE k = 7")
      .head.getLong(0) === 14L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.m WHERE attrs IS NULL")
      .head.getLong(0) === 1L)
    assert(spark.sql(s"SELECT size(attrs) FROM $cat.m WHERE k = 9002")
      .head.getInt(0) === 0)
    val r3 = spark.sql(
      s"SELECT size(attrs), attrs['x'] FROM $cat.m WHERE k = 9003").head
    assert(r3.getInt(0) === 1 && r3.isNullAt(1), "NULL value under a live key")
  }

  test("nested scans take the vectorized path") {
    val root = Scratch.fresh("r11_nestcol", sf)
    val cat = "graft_r11nc_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, meta STRUCT<tag: STRING, w: BIGINT>, " +
      "emb ARRAY<FLOAT>)")
    spark.range(100).selectExpr("id AS k",
      "named_struct('tag', 'x', 'w', id) AS meta",
      "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) AS emb")
      .createOrReplaceTempView("r11nc_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM r11nc_src")
    val q = spark.sql(s"SELECT meta.w, emb FROM $cat.t")
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "struct+array scan should be vectorized")
    assert(q.collect().map(_.getLong(0)).sum === (0L until 100L).sum)
  }

  test("row-level UPDATE and MERGE work on a struct-carrying catalog table") {
    val root = Scratch.fresh("r11_rowlevel_nested", sf)
    val cat = "graft_r11rn_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, meta STRUCT<tag: STRING, w: BIGINT>, v BIGINT)")
    spark.range(200).selectExpr("id AS k",
      "named_struct('tag', concat('t', CAST(id % 4 AS STRING)), 'w', id) AS meta",
      "id AS v").createOrReplaceTempView("r11rn_src")
    spark.sql(s"INSERT INTO $cat.t SELECT k, meta, v FROM r11rn_src")
    spark.sql(s"UPDATE $cat.t SET v = v + 1000 WHERE meta.tag = 't2'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE v >= 1000")
      .head.getLong(0) === 50L)
    assert(spark.sql(s"SELECT sum(meta.w) FROM $cat.t").head.getLong(0)
      === (0L until 200L).sum, "struct payload survives the rewrite")
    spark.sql(s"DELETE FROM $cat.t WHERE meta.w < 10 AND meta.tag = 't1'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) === 197L)
  }

  test("KeyGroupedPartitioning satisfies a groupBy on the bucket column") {
    val root = Scratch.fresh("r11_spjagg", sf)
    val cat = "graft_r11sa_" +
      java.nio.file.Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.g")
    spark.sql(s"CREATE TABLE $cat.g (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.range(4000).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("r11sa_src")
    spark.sql(s"INSERT INTO $cat.g SELECT k, v FROM r11sa_src")
    // same-key rows are co-located by the storage partitioning, so the
    // partial/final aggregate pair collapses without an exchange
    val q = spark.sql(s"SELECT k, sum(v) FROM $cat.g GROUP BY k")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucketed key should plan exchange-free:\n$plan")
    assert(q.count() === 4000L)
  }

  test("tbl_nested_evolve row matches a direct computation") {
    val df = SparkEntry.queries("tbl_nested_evolve")(spark, sf)
    val r = df.head
    val base = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("pc"),
      col("o_orderpriority").as("prio"))
    val mk = base.agg(max(col("k"))).head.getLong(0)
    val hit = col("k") % 7 === 1 && col("k") < lit(mk / 3)
    val w = base.agg(count(lit(1)),
      sum(when(hit, col("pc") + 50).otherwise(col("pc"))),
      sum(when(hit, col("k") * 3).otherwise(0L)),
      sum(when(hit, 1L).otherwise(0L)),
      countDistinct(col("prio"))).head
    (0 to 4).foreach(i => assert(r.getLong(i) === w.getLong(i), s"col $i"))
    assert(r.getBoolean(5), "ALTER must be metadata-only (pre-merge NULLs)")
  }

  test("tbl_rowgroup_skip row matches a direct computation") {
    val df = SparkEntry.queries("tbl_rowgroup_skip")(spark, sf)
    val r = df.head
    val base = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("pc"))
    val mk = base.agg(max(col("k"))).head.getLong(0)
    val w = base.filter(col("k") >= mk / 2 && col("k") <= mk / 2 + mk / 16)
      .agg(count(lit(1)), sum(col("pc")), min(col("k")), max(col("k"))).head
    assert(r.getLong(0) === w.getLong(0))
    assert(r.getLong(1) === w.getLong(1))
    assert(r.getLong(2) === w.getLong(2))
    assert(r.getLong(3) === w.getLong(3))
    assert(r.getBoolean(4) && r.getBoolean(5))
  }
}
