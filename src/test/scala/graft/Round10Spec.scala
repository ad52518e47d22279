package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Acid

/** Round-10 regression pins for the round-9 advisor findings: composite-key
  * branch merge (leading-key-only matching silently deleted sibling lines),
  * OPTIMIZE WHERE on transform-partitioned tables (the stats2 label is not
  * a real column), session-zone-independent NTZ partition re-stamping, and
  * xmlns re-injection of single-quoted values carrying double quotes.
  */
class Round10Spec extends AnyFunSuite {
  import TestSpark._

  private def catFor(tag: String, root: String): String = {
    val cat = s"graft_r10${tag}_" +
      Paths.get(sf).getFileName.toString.replace('.', '_')
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("mergeBranch matches composite keys on every key column") {
    val root = Scratch.fresh("r10_br_comp", sf)
    val dir = s"$root/t"
    import spark.implicits._
    // 10 groups x 20 lines: (k1, k2) unique, k1 alone is not
    val t = spark.range(200).select(expr("id div 20").as("k1"),
      expr("id % 20").as("k2"), (col("id") * 3).as("v"))
    Acid.create(spark, dir, t, Seq("k1", "k2"), 4, None)
    Acid.createBranch(spark, dir, "b")
    // update exactly (3,7) and insert the new pair (3,99): the 19 sibling
    // lines of k1=3 share the batch rows' leading key and must survive
    Acid.mergeBranch(spark, dir, "b",
      Seq((3L, 7L, -1L), (3L, 99L, -2L)).toDF("k1", "k2", "v"))
    val br = Acid.snapshotBranch(spark, dir, "b")
    assert(br.count() === 201L, "200 base rows + 1 inserted pair")
    assert(br.filter(col("k1") === 3).count() === 21L,
      "k1=3 group keeps its 20 lines and gains the insert")
    assert(br.filter(col("k1") === 3 && col("k2") === 7).head.getLong(2) === -1L)
    assert(br.filter(col("k1") === 3 && col("k2") === 8).head.getLong(2) === (3L * 20 + 8) * 3,
      "sibling line untouched")
    assert(br.filter(col("k1") === 3 && col("k2") === 99).head.getLong(2) === -2L)
    // main stays blind until publish; publish lands the audited state
    assert(Acid.snapshot(spark, dir).count() === 200L)
    assert(Acid.publishBranch(spark, dir, "b").isRight)
    assert(Acid.snapshot(spark, dir).filter(col("k1") === 3).count() === 21L)
  }

  test("OPTIMIZE WHERE on a days-partitioned table re-stamps transform stats") {
    val root = Scratch.fresh("r10_optr_days", sf)
    val cat = catFor("od", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, v BIGINT)
                 |PARTITIONED BY (days(ts))""".stripMargin)
    // 10 days x 5 rows, keys contiguous per day
    spark.range(50).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 5) * 86400000000 + id * 1000000 AS BIGINT)) AS ts",
      "id AS v").createOrReplaceTempView("r10_optr_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT k, ts, v FROM r10_optr_src")
    val m0 = Acid.readManifest(dir, Acid.latestVersion(dir))
    assert(m0.files.size === 10)
    // the stats2 label here is 'days(ts)' — not a column; promoting it to
    // statsOf's col2 crashed the whole statement after the rewrite landed
    val (touched, after, before) =
      Acid.optimizeRange(spark, dir, 0L, 9L, targetFiles = 1)
    assert(touched === 2 && before === 10 && after === 9,
      s"days 0-1 bin-pack to one file: ($touched, $after, $before)")
    val m1 = Acid.readManifest(dir, Acid.latestVersion(dir))
    val rewritten = m1.files.filterNot(m0.files.toSet)
    assert(rewritten.nonEmpty && rewritten.forall(_.stats2.exists {
      case (c, lo2, hi2) => c == "days(ts)" && lo2 <= hi2 }),
      s"rewritten files re-stamp days(ts): ${rewritten.map(_.stats2)}")
    assert(spark.table(s"$cat.ev").count() === 50L)
    // pruning away from the rewrite stays sharp
    val win = "ts >= TIMESTAMP'2024-01-06 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-09 00:00:00'"
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ev WHERE $win").head.getLong(0)
      === (25 until 40).sum.toLong)
    val (scanned, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(scanned <= 3 && total === m1.files.size,
      s"post-optimize window pruned $scanned/$total")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("NTZ partition re-stamp is session-zone independent") {
    val root = Scratch.fresh("r10_ntz", sf)
    val cat = catFor("nz", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP_NTZ, v BIGINT)
                 |PARTITIONED BY (days(ts))""".stripMargin)
    // 5 days x 4 rows at 00:30 wall clock — early hours, maximally
    // sensitive to a positive-zone cast shift; NTZ built zone-free
    spark.range(20).coalesce(1).selectExpr("id AS k",
      "timestampadd(SECOND, CAST(id AS INT), timestampadd(DAY, CAST(id DIV 4 AS INT), " +
        "TIMESTAMP_NTZ'2024-01-01 00:30:00')) AS ts",
      "id AS v").createOrReplaceTempView("r10_ntz_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT k, ts, v FROM r10_ntz_src")
    val m0 = Acid.readManifest(dir, Acid.latestVersion(dir))
    assert(m0.files.size === 5)
    assert(m0.files.map(_.stats2).min === Some(("days(ts)", 19723L, 19723L)),
      "writer stamps raw NTZ micros (2024-01-01 = epoch day 19723)")
    // library merge under Auckland (+13 in January): the rewrite's
    // re-stamp must reproduce the writer's as-if-UTC basis, not shift the
    // day to 19722 through a session-zone cast
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Auckland")
    try {
      import spark.implicits._
      assert(!Acid.merge(spark, dir,
        Seq((0L, 999L), (1L, 999L), (2L, 999L)).toDF("k", "v"), "w").skipped)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    val m1 = Acid.readManifest(dir, Acid.latestVersion(dir))
    val rewritten = m1.files.filterNot(m0.files.toSet)
    assert(rewritten.nonEmpty && rewritten.forall(
      _.stats2.contains(("days(ts)", 19723L, 19723L))),
      s"re-stamp zone-shifted: ${rewritten.map(_.stats2)}")
    // the day-0 window scan must therefore still see the merged rows
    val win = "ts >= TIMESTAMP_NTZ'2024-01-01 00:00:00' AND " +
      "ts < TIMESTAMP_NTZ'2024-01-02 00:00:00'"
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ev WHERE $win").head.getLong(0)
      === 999L * 3 + 3)
    val (scanned, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(scanned === 1 && total === m1.files.size,
      s"day-0 probe pruned $scanned/$total")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("sharded manifests: pointer format, fresh-parse parity, pruned planning") {
    val dir = Scratch.fresh("r10_shard", sf)
    val t = spark.range(6000).select(col("id").as("k"), (col("id") * 2).as("v"))
    Acid.create(spark, dir, t, "k", 600)
    val v0 = Files.readAllLines(Paths.get(dir, "_log", "v00000.txt"))
    assert(v0.get(1) === "@shards", "a 600-entry full manifest writes a pointer")
    val nShards = (600 + Acid.CheckpointShardEntries - 1) / Acid.CheckpointShardEntries
    assert(v0.size === 2 + nShards, "pointer is O(shards) lines, not O(files)")
    Acid.clearManifestCache()
    assert(Acid.snapshot(spark, dir).count() === 6000L,
      "fresh parse through shards reproduces the snapshot")
    // pruned planning: a 20-key window parses ONE shard, not the table
    Acid.clearManifestCache()
    val (ents, total, shardsParsed) = Acid.planRangeEntries(dir, 0, 100L, 119L)
    assert(total === 600 && shardsParsed === 1 && ents.size <= 3,
      s"window planning: ${ents.size} entries, $shardsParsed shards")
    val (df, scanned, total2) = Acid.scanRange(spark, dir, 100L, 119L)
    assert(total2 === 600 && scanned === ents.size && df.count() === 20L)
    // a delta tail folds over the sharded base without parsing all shards
    import spark.implicits._
    assert(!Acid.merge(spark, dir, Seq((9999L, -1L)).toDF("k", "v"), "w").skipped)
    Acid.clearManifestCache()
    val (e1, t1, sp1) = Acid.planRangeEntries(dir, 1, 9999L, 9999L)
    assert(t1 === 601 && sp1 === 0 && e1.size === 1 && e1.head.minKey === 9999L,
      s"insert beyond every shard range plans zero shards: ($t1, $sp1, $e1)")
    // an update rewrite swaps the touched entry in pruned planning
    assert(!Acid.merge(spark, dir, Seq((100L, -5L)).toDF("k", "v"), "w2").skipped)
    Acid.clearManifestCache()
    val (e2, t2, _) = Acid.planRangeEntries(dir, 2, 100L, 119L)
    assert(t2 === 601 && e2.nonEmpty)
    val (df2, _, _) = Acid.scanRange(spark, dir, 100L, 119L)
    assert(df2.agg(sum(col("v"))).head.getLong(0)
      === (101 to 119).map(_ * 2L).sum - 5L)
    // full fresh read agrees with pruned planning's total
    Acid.clearManifestCache()
    assert(Acid.readManifest(dir, 2).files.size === t2)
  }

  test("vacuum distributes orphan discovery and deletion past the threshold") {
    val dir = Scratch.fresh("r10_vac_dist", sf)
    Acid.create(spark, dir,
      spark.range(6000).select(col("id").as("k"), col("id").as("v")), "k", 600)
    // an abandoned (never-committed) write attempt leaves 25 orphans
    spark.range(100).select(col("id").as("k"), col("id").as("v"))
      .repartition(25).write.parquet(s"$dir/d_orphan")
    val (dry, liveN) = Acid.vacuum(spark, dir, 0, dryRun = true)
    assert(dry === 25 && liveN === 600, s"dry run: ($dry, $liveN)")
    val (del, liveN2) = Acid.vacuum(spark, dir, 0)
    assert(del === 25 && liveN2 === 600, s"vacuum: ($del, $liveN2)")
    val leftover = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(Paths.get(dir, "d_orphan"))
      try st.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally st.close()
    }
    assert(leftover === 0, "orphan parquet files deleted by executors")
    assert(Acid.snapshot(spark, dir).count() === 6000L, "live data untouched")
  }

  test("multi-column partition spec: day window and bucket probe intersect") {
    val root = Scratch.fresh("r10_multi", sf)
    val cat = catFor("mp", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(
      s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, uid BIGINT, v BIGINT)
         |PARTITIONED BY (days(ts), bucket(4, uid))""".stripMargin)
    // 10 days x 8 uids: the writer rolls (day, bucket) tuple segments
    spark.range(800).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 80) * 86400000000 + id * 1000 AS BIGINT)) AS ts",
      "CAST(id % 8 AS BIGINT) AS uid", "id AS v")
      .createOrReplaceTempView("r10_multi_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT k, ts, uid, v FROM r10_multi_src")
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    assert(m.files.nonEmpty && m.files.forall(_.stats2.exists {
      case (c, lo, hi) => c == "days(ts)" && lo == hi }),
      s"leading transform one-value stats2: ${m.files.map(_.stats2).take(3)}")
    assert(m.files.forall(_.pstats.exists {
      case (c, lo, hi) => c == "bucket(4,uid)" && lo == hi }),
      s"secondary transform one-value pstats: ${m.files.map(_.pstats).take(3)}")
    val win = "ts >= TIMESTAMP'2024-01-03 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-05 00:00:00'"
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE $win").head
    val (sDay, total) = graft.sources.AcidSql.lastScanFor(dir)
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE uid = 3").head
    val (sBkt, _) = graft.sources.AcidSql.lastScanFor(dir)
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE $win AND uid = 3").head
    val (sBoth, _) = graft.sources.AcidSql.lastScanFor(dir)
    assert(sDay < total && sBkt < total && sBoth < sDay && sBoth < sBkt,
      s"intersection plan: day=$sDay bucket=$sBkt both=$sBoth of $total")
    val got = spark.sql(
      s"SELECT sum(v) FROM $cat.ev WHERE $win AND uid = 3").head.getLong(0)
    val want = spark.sql("SELECT sum(v) FROM r10_multi_src " +
      "WHERE k >= 160 AND k < 320 AND k % 8 = 3").head.getLong(0)
    assert(got === want)
    // .partitions lists BOTH transforms' dimensions
    val parts = spark.read.table(s"$cat.ev.partitions")
      .select("transform").distinct().collect().map(_.getString(0)).sorted
    assert(parts === Array("bucket(4,uid)", "days(ts)"), parts.toSeq.toString)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("partition-spec evolution: each file generation prunes under its own spec") {
    val root = Scratch.fresh("r10_evolve", sf)
    val cat = catFor("pe", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(
      s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, p BIGINT, v BIGINT)
         |PARTITIONED BY (p)""".stripMargin)
    spark.range(200).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 40) * 86400000000 AS BIGINT)) AS ts",
      "id % 5 AS p", "id AS v").createOrReplaceTempView("r10_evolve_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT k, ts, p, v FROM r10_evolve_src")
    val gen1 = Acid.readManifest(dir, Acid.latestVersion(dir)).files.toSet
    assert(gen1.forall(_.stats2.exists(_._1 == "p")))
    // ALTER the spec — metadata only, no rewrite; new files stamp days(ts)
    assert(Acid.evolvePartSpec(spark, dir, "days(ts)") === 1)
    spark.sql(s"INSERT INTO $cat.ev SELECT k + 200, ts, p, v + 200 " +
      "FROM r10_evolve_src")
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    val gen2 = m.files.filterNot(gen1)
    assert(gen2.nonEmpty && gen2.forall(_.stats2.exists(_._1 == "days(ts)")))
    assert(gen1.forall(m.files.contains), "no gen-1 file rewritten")
    // a p-probe prunes gen-1 under identity(p); gen-2 kept conservatively
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE p = 3").head
    val (sP, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(sP < total && sP >= gen2.size,
      s"p-probe pruned gen-1 only: $sP of $total")
    // a ts-window prunes gen-2 under days(ts); gen-1 kept conservatively
    val win = "ts >= TIMESTAMP'2024-01-02 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-03 00:00:00'"
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE $win").head
    val (sT, _) = graft.sources.AcidSql.lastScanFor(dir)
    assert(sT < total && sT >= gen1.size,
      s"ts-window pruned gen-2 only: $sT of $total")
    // correctness across both generations
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE p = 3").head.getLong(0)
      === 80L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE $win").head.getLong(0)
      === 80L)
    // both specs' source columns are drop-guarded
    assert(scala.util.Try(
      spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN p")).isFailure)
    assert(scala.util.Try(
      spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN ts")).isFailure)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("deep clone survives source vacuum; branch DELETE stays isolated until publish") {
    val root = Scratch.fresh("r10_deep_brdel", sf)
    import spark.implicits._
    val src = s"$root/src"
    Acid.create(spark, src,
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")), "k", 4)
    // rewrite k=5's file so the source has a non-trivial history
    assert(!Acid.merge(spark, src, Seq((5L, -5L)).toDF("k", "v"), "w").skipped)
    val dst = s"$root/deep"
    val copied = Acid.cloneDeep(spark, src, dst)
    assert(copied >= 4)
    assert(Acid.snapshot(spark, dst).count() === 100L)
    // vacuum the source to its head and drop every pre-head manifest:
    // the deep clone must be unaffected (the shallow clone's hazard)
    Acid.vacuum(spark, src, Acid.latestVersion(src))
    Acid.clearManifestCache()
    assert(Acid.snapshot(spark, dst).count() === 100L)
    assert(Acid.snapshot(spark, dst).filter(col("k") === 5).head.getLong(1) === -5L)
    // branch-scoped DELETE: staged on the branch, invisible on main
    Acid.createBranch(spark, dst, "gdpr")
    val (h, deleted) = Acid.deleteOnBranch(spark, dst, "gdpr",
      col("k") % 10 === 3 && col("k") < 50, Some((0L, 50L)))
    assert(h === 0 && deleted === 5L, s"head=$h deleted=$deleted")
    assert(Acid.snapshotBranch(spark, dst, "gdpr").count() === 95L)
    assert(Acid.snapshot(spark, dst).count() === 100L, "main blind to the delete")
    assert(Acid.publishBranch(spark, dst, "gdpr").isRight)
    val after = Acid.snapshot(spark, dst)
    assert(after.count() === 95L)
    assert(after.filter(col("k") === 3).isEmpty &&
      after.filter(col("k") === 53).count() === 1L,
      "only the keyRange-scoped matches deleted")
  }

  test("V2 key column stats feed CBO: attribute stats exposed, join reorder engages") {
    val root = Scratch.fresh("r10_cbo", sf)
    val cat = catFor("cb", root)
    Seq("fact", "dim1", "dim2").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.$t"))
    spark.range(10000).selectExpr("id AS k", "id % 100 AS ck", "id AS cents")
      .createOrReplaceTempView("r10_cbo_fact")
    spark.sql(s"CREATE TABLE $cat.fact AS SELECT * FROM r10_cbo_fact")
    spark.sql(s"CREATE TABLE $cat.dim1 AS SELECT id AS ck FROM range(100)")
    spark.sql(s"CREATE TABLE $cat.dim2 AS SELECT id AS k2 FROM range(3)")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // merge keys are unique by contract -> distinctCount == numRows,
      // min/max fold the manifest's exact per-file ranges
      val stats = spark.table(s"$cat.fact").queryExecution.optimizedPlan.stats
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.distinctCount.exists(_.toLong == 10000L)),
        s"key attribute stats: ${stats.attributeStats}")
      assert(kStat.exists(_.min.exists(_.toString.toLong == 0L)))
      assert(kStat.exists(_.max.exists(_.toString.toLong == 9999L)))
      // with stats live, CBO's join reorder applies the 3-row dim FIRST
      val q = s"""SELECT count(*) AS n FROM $cat.fact f
                 |JOIN $cat.dim1 d1 ON f.ck = d1.ck
                 |JOIN $cat.dim2 d2 ON f.k % 25 = d2.k2""".stripMargin
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      assert(plan.contains("/dim1[") && plan.contains("/dim2["))
      assert(plan.indexOf("/dim2[") < plan.indexOf("/dim1["),
        s"selective dim joins first under CBO:\n$plan")
      assert(spark.sql(q).head.getLong(0) === 1200L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
    Seq("fact", "dim1", "dim2").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.$t"))
  }

  test("round-10 SQL statements: spec evolution, clone, branch delete, refs") {
    val root = Scratch.fresh("r10_sql", sf)
    val dir = s"$root/t"
    import spark.implicits._
    Acid.create(spark, dir, spark.range(100).select(col("id").as("k"),
      expr("timestamp_micros(1704067200000000 + id * 86400000000)").as("ts"),
      (col("id") % 5).as("p"), col("id").as("v")), "k", 4)
    // ALTER ... SET PARTITION SPEC appends a spec version
    assert(spark.sql(s"ALTER TABLE '$dir' SET PARTITION SPEC (p)")
      .head.getLong(0) === 0L)
    assert(spark.sql(s"ALTER TABLE '$dir' SET PARTITION SPEC (days(ts))")
      .head.getLong(0) === 1L)
    // a malformed spec refuses (no such column)
    assert(scala.util.Try(spark.sql(
      s"ALTER TABLE '$dir' SET PARTITION SPEC (days(nope))")).isFailure)
    // CLONE ... TO ... [DEEP]
    assert(spark.sql(s"CLONE '$dir' TO '$root/shallow'").head.getLong(0) === 4L)
    assert(spark.sql(s"CLONE '$dir' TO '$root/deep' DEEP").head.getLong(0) === 4L)
    assert(Acid.snapshot(spark, s"$root/deep").count() === 100L)
    // DELETE FROM ... BRANCH ... WHERE: staged only, main blind
    spark.sql(s"CREATE BRANCH fix ON '$dir'")
    val r = spark.sql(s"DELETE FROM '$dir' BRANCH fix WHERE v % 10 = 7").head
    assert(r.getLong(1) === 10L, s"branch delete: $r")
    assert(Acid.snapshot(spark, dir).count() === 100L)
    assert(Acid.snapshotBranch(spark, dir, "fix").count() === 90L)
    // SHOW REFS lists the branch with one staged commit
    val refs = spark.sql(s"SHOW REFS ON '$dir'").collect()
    assert(refs.exists(x => x.getString(0) == "branch" &&
      x.getString(1) == "fix" && x.getLong(3) == 1L), refs.toSeq.toString)
    // the `.refs` METADATA TABLE serves identical rows through the catalog
    val cat2 = catFor("sqm", root)
    val viaTable = spark.read.table(s"$cat2.t.refs")
      .orderBy(col("kind"), col("name")).collect().toSeq
    assert(viaTable == Acid.refs(spark, dir)
      .orderBy(col("kind"), col("name")).collect().toSeq, viaTable.toString)
    // OPTIMIZE ... BRANCH refuses modifier combos
    assert(scala.util.Try(spark.sql(
      s"OPTIMIZE '$dir' BRANCH fix ZORDER BY (v)")).isFailure)
  }

  test("round-10 fixture rows run end-to-end with true booleans") {
    val r8 = Acid.queries("tbl_branch_optimize")(spark, sf).head
    assert(Seq("compacted", "main_isolated", "published_compacted")
      .forall(r8.getAs[Boolean](_)), s"tbl_branch_optimize: $r8")
    val r9 = Acid.queries("tbl_refs_meta")(spark, sf).collect()
    assert(r9.length === 3 && r9.forall(_.getAs[Boolean]("sql_matches")),
      s"tbl_refs_meta: ${r9.toSeq}")
    val r1 = Acid.queries("tbl_vacuum_scale")(spark, sf).head
    assert(r1.getAs[Boolean]("distributed") && r1.getAs[Boolean]("orphans_reclaimed"),
      s"tbl_vacuum_scale: $r1")
    val r2 = Acid.queries("tbl_ckpt_shard")(spark, sf).head
    assert(r2.getAs[Boolean]("sharded_pointer") && r2.getAs[Boolean]("shards_pruned"),
      s"tbl_ckpt_shard: $r2")
    val r3 = Acid.queries("tbl_branch_delete")(spark, sf).head
    assert(Seq("main_isolated", "published", "carried_byte_identical")
      .forall(r3.getAs[Boolean](_)), s"tbl_branch_delete: $r3")
    val r4 = Acid.queries("tbl_clone_deep")(spark, sf).head
    assert(r4.getAs[Boolean]("independent"), s"tbl_clone_deep: $r4")
    val r5 = Acid.queries("tbl_part_multi")(spark, sf).head
    assert(Seq("day_pruned", "bucket_pruned", "intersected")
      .forall(r5.getAs[Boolean](_)), s"tbl_part_multi: $r5")
    val r6 = Acid.queries("tbl_part_evolve")(spark, sf).head
    assert(Seq("own_spec_stats", "old_spec_prunes", "new_spec_prunes",
      "drop_guarded").forall(r6.getAs[Boolean](_)), s"tbl_part_evolve: $r6")
    val r7 = Acid.queries("tbl_cbo_stats")(spark, sf).head
    assert(r7.getAs[Boolean]("stats_exposed") && r7.getAs[Boolean]("reordered"),
      s"tbl_cbo_stats: $r7")
  }

  test("spec evolution on a RENAMED table stores physical names, prunes on logical") {
    val root = Scratch.fresh("r10_evo_ren", sf)
    val cat = catFor("er", root)
    val dir = s"$root/t"
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, ts TIMESTAMP, v BIGINT)")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN ts TO event_ts")
    // caller evolves using the LOGICAL name; the sidecar must persist the
    // PHYSICAL one (the writer resolves against the physical write schema)
    assert(Acid.evolvePartSpec(spark, dir, "days(event_ts)") === 0)
    spark.range(40).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 10) * 86400000000 AS BIGINT)) AS ts",
      "id AS v").createOrReplaceTempView("r10_evoren_src")
    spark.sql(s"INSERT INTO $cat.t SELECT k, ts, v FROM r10_evoren_src")
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    assert(m.files.nonEmpty && m.files.forall(_.stats2.exists {
      case (c, lo, hi) => c == "days(ts)" && lo == hi }),
      s"stamped under the physical label: ${m.files.map(_.stats2)}")
    // predicates on the LOGICAL name prune through the mapping
    spark.sql(s"SELECT count(*) FROM $cat.t WHERE " +
      "event_ts >= TIMESTAMP'2024-01-02 00:00:00' AND " +
      "event_ts < TIMESTAMP'2024-01-03 00:00:00'").head
    val (scanned, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(scanned >= 1 && scanned * 2 <= total,
      s"logical-name window pruned $scanned/$total")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t WHERE " +
      "event_ts >= TIMESTAMP'2024-01-02 00:00:00' AND " +
      "event_ts < TIMESTAMP'2024-01-03 00:00:00'").head.getLong(0)
      === (10 until 20).sum.toLong)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }

  test("pruned planning agrees with readManifest across checkpoint+delta+shard chains") {
    val dir = Scratch.fresh("r10_plan_parity", sf)
    import spark.implicits._
    Acid.create(spark, dir,
      spark.range(6000).select(col("id").as("k"), (col("id") * 2).as("v")), "k", 600)
    // 25 single-row merges: delta manifests + checkpoints at v10/v20
    (1 to 25).foreach { i =>
      assert(!Acid.merge(spark, dir,
        Seq((9000L + i, i.toLong)).toDF("k", "v"), s"w$i").skipped)
    }
    val head = Acid.latestVersion(dir)
    assert(head === 25)
    for (v <- Seq(5, 10, 19, 25); (lo, hi) <- Seq((0L, 59L), (9000L, 9030L),
        (Long.MinValue, Long.MaxValue))) {
      Acid.clearManifestCache()
      val (ents, total, _) = Acid.planRangeEntries(dir, v, lo, hi)
      Acid.clearManifestCache()
      val m = Acid.readManifest(dir, v)
      val want = m.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
      assert(total === m.files.size, s"v$v [$lo,$hi] total")
      assert(ents.map(_.path).toSet === want.map(_.path).toSet,
        s"v$v [$lo,$hi] overlap set")
    }
  }

  test("deep clone of a SHALLOW clone resolves source references") {
    val root = Scratch.fresh("r10_deep_of_shallow", sf)
    import spark.implicits._
    Acid.create(spark, s"$root/orig",
      spark.range(60).select(col("id").as("k"), col("id").as("v")), "k", 3)
    Acid.cloneShallow(spark, s"$root/orig", s"$root/sh"): Unit
    // diverge the shallow clone, then deep-copy it: the deep clone must
    // materialize BOTH the clone-local rewrite and the ../orig references
    assert(!Acid.merge(spark, s"$root/sh", Seq((5L, -5L)).toDF("k", "v"), "w").skipped)
    val copied = Acid.cloneDeep(spark, s"$root/sh", s"$root/deep")
    assert(copied >= 3)
    // obliterate BOTH ancestors
    Seq("orig", "sh").foreach { t =>
      import scala.jdk.CollectionConverters._
      val w = Files.walk(Paths.get(root, t))
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
    Acid.clearManifestCache()
    val snap = Acid.snapshot(spark, s"$root/deep")
    assert(snap.count() === 60L)
    assert(snap.filter(col("k") === 5).head.getLong(1) === -5L)
  }

  test("SQL UPDATE and streamed epochs re-stamp transform stats") {
    val root = Scratch.fresh("r10_v2_restamp", sf)
    val cat = catFor("vr", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, v BIGINT)
                 |PARTITIONED BY (days(ts))""".stripMargin)
    spark.range(50).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 10) * 86400000000 AS BIGINT)) AS ts",
      "id AS v").createOrReplaceTempView("r10_v2r_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT k, ts, v FROM r10_v2r_src")
    val m0 = Acid.readManifest(dir, Acid.latestVersion(dir))
    // a row-level rewrite (UPDATE) previously dropped the day stamps
    spark.sql(s"UPDATE $cat.ev SET v = -1 WHERE k < 3")
    val m1 = Acid.readManifest(dir, Acid.latestVersion(dir))
    val rewritten = m1.files.filterNot(m0.files.toSet)
    assert(rewritten.nonEmpty && rewritten.forall(_.stats2.exists {
      case (c, lo, hi) => c == "days(ts)" && lo <= hi }),
      s"UPDATE re-stamps days(ts): ${rewritten.map(_.stats2)}")
    // pruning away from the rewrite stays sharp
    spark.sql(s"SELECT count(*) FROM $cat.ev WHERE " +
      "ts >= TIMESTAMP'2024-01-03 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-04 00:00:00'").head
    val (scanned, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(scanned >= 1 && scanned * 2 <= total, s"pruned $scanned/$total")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ev WHERE k < 3").head.getLong(0)
      === -3L)
    // a streamed epoch into the partitioned table stamps day ranges too
    val srcDir = s"$root/stream_src"
    spark.range(10).coalesce(1).selectExpr("id + 100 AS k",
      "timestamp_micros(CAST(1704067200000000 + 6 * 86400000000 + id AS BIGINT)) AS ts",
      "id AS v").write.parquet(srcDir)
    val q = spark.readStream
      .schema("k BIGINT, ts TIMESTAMP, v BIGINT").parquet(srcDir)
      .writeStream.format("graft-acid-sql")
      .option("path", dir)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val m2 = Acid.readManifest(dir, Acid.latestVersion(dir))
    val streamed = m2.files.filterNot(m1.files.toSet)
    assert(streamed.nonEmpty && streamed.forall(_.stats2.exists {
      case (c, lo, hi) => c == "days(ts)" && lo == hi && lo == 19729L }),
      s"streamed epoch stamps day 19729: ${streamed.map(_.stats2)}")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("three-transform partition spec stamps and prunes every dimension") {
    val root = Scratch.fresh("r10_tri", sf)
    val cat = catFor("t3", root)
    val dir = s"$root/ev"
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(
      s"""CREATE TABLE $cat.ev (k BIGINT, ts TIMESTAMP, uid BIGINT, src BIGINT, v BIGINT)
         |PARTITIONED BY (days(ts), bucket(4, uid), bucket(2, src))""".stripMargin)
    spark.range(400).coalesce(1).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id DIV 80) * 86400000000 AS BIGINT)) AS ts",
      "CAST(id % 8 AS BIGINT) AS uid", "CAST(id % 2 AS BIGINT) AS src", "id AS v")
      .createOrReplaceTempView("r10_tri_src")
    spark.sql(s"INSERT INTO $cat.ev SELECT * FROM r10_tri_src")
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    assert(m.files.forall(f => f.stats2.exists(_._1 == "days(ts)") &&
      f.pstats.exists(_._1 == "bucket(4,uid)") &&
      f.pstats.exists(_._1 == "bucket(2,src)")),
      s"all three transforms stamped: ${m.files.take(2).map(f => (f.stats2, f.pstats))}")
    // the triple-predicate scan intersects all three verdicts
    val q = "ts >= TIMESTAMP'2024-01-02 00:00:00' AND " +
      "ts < TIMESTAMP'2024-01-03 00:00:00' AND uid = 3 AND src = 1"
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE $q").head.getLong(0)
      === spark.sql(s"SELECT count(*) FROM r10_tri_src WHERE " +
        "k >= 80 AND k < 160 AND k % 8 = 3 AND k % 2 = 1").head.getLong(0))
    val (scanned, total) = graft.sources.AcidSql.lastScanFor(dir)
    assert(scanned >= 1 && scanned * 4 <= total,
      s"triple intersection pruned $scanned/$total")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
  }

  test("vacuum reclaims unreferenced shard files of retained versions") {
    val dir = Scratch.fresh("r10_shard_orphan", sf)
    Acid.create(spark, dir,
      spark.range(3000).select(col("id").as("k"), col("id").as("v")), "k", 300)
    import spark.implicits._
    assert(!Acid.merge(spark, dir, Seq((9999L, 1L)).toDF("k", "v"), "w").skipped)
    val logd = Paths.get(dir, "_log")
    // plant a losing commit attempt's shard for the RETAINED v0
    val orphan = logd.resolve("s_v00000_deadbeef.000.txt")
    Files.writeString(orphan, "junk/x.parquet|1|0|0")
    val liveShards = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(logd)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("s_") && n != orphan.getFileName.toString).toSet
      finally st.close()
    }
    Acid.vacuum(spark, dir, 0)
    assert(!Files.exists(orphan), "unreferenced shard of a retained version dies")
    liveShards.foreach(n => assert(Files.exists(logd.resolve(n)),
      s"referenced shard $n survives"))
    Acid.clearManifestCache()
    assert(Acid.snapshot(spark, dir).count() === 3001L)
  }

  test("RESTORE TABLE SQL rolls back by version and by timestamp") {
    val dir = Scratch.fresh("r10_restore_sql", sf)
    import spark.implicits._
    Acid.create(spark, dir,
      spark.range(50).select(col("id").as("k"), col("id").as("v")), "k", 2)
    assert(!Acid.merge(spark, dir, Seq((1L, -1L)).toDF("k", "v"), "bad").skipped)
    val r = spark.sql(s"RESTORE TABLE '$dir' TO VERSION AS OF 0").head
    assert(r.getLong(0) === 0L && r.getLong(1) === 2L)
    assert(Acid.snapshot(spark, dir).filter(col("k") === 1).head.getLong(1) === 1L,
      "bad merge undone")
    // timestamp form: anything at-or-after v2's commit resolves to v2
    val ts = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .plusMinutes(1).toString.replace('T', ' ').takeWhile(_ != '.')
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val r2 = spark.sql(s"RESTORE TABLE '$dir' TO TIMESTAMP AS OF '$ts'").head
      assert(r2.getLong(0) === 2L && r2.getLong(1) === 3L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // a pre-v0 timestamp refuses
    assert(scala.util.Try(spark.sql(
      s"RESTORE TABLE '$dir' TO TIMESTAMP AS OF '1999-01-01 00:00:00'")).isFailure)
  }

  test("manifest render/parse roundtrip holds with pstats and sharded fulls") {
    val rnd = new scala.util.Random(7)
    def entry(i: Int) = Acid.FileEntry(
      path = s"d0/x$i.parquet", rows = rnd.nextInt(1000).toLong,
      minKey = i * 10L, maxKey = i * 10L + 9,
      stats2 = if (i % 3 == 0) Some(("days(ts)", i.toLong, i.toLong)) else None,
      bloom = if (i % 17 == 0) Some((64, "0123456789abcdef")) else None,
      dv = if (i % 11 == 0) Some((s"dv/d$i", 3L)) else None,
      pdv = if (i % 13 == 0) Some((s"pdv/p$i", 2L)) else None,
      bytes = i.toLong,
      cstats = if (i % 5 == 0) Seq(("lang", "aa|b:c", "zz")) else Nil,
      pstats = if (i % 2 == 0)
        Seq(("bucket(4,uid)", i.toLong, i.toLong), ("p2", 0L, 5L)) else Nil)
    for (n <- Seq(10, 600)) { // below and above the shard threshold
      val dir = Scratch.fresh(s"r10_roundtrip_$n", sf)
      val entries = (0 until n).map(entry)
      Acid.commitManifest(dir, Acid.Manifest(0, -1L, entries, Map("w" -> 5L),
        Some("_cdc/x"), Some("price_cents >= 0"), op = "CREATE"))
      Acid.clearManifestCache()
      val m = Acid.readManifest(dir, 0)
      assert(m.files == entries, s"n=$n entry roundtrip")
      assert(m.batchHw == Map("w" -> 5L) && m.cdcPath.contains("_cdc/x") &&
        m.constraint.contains("price_cents >= 0") && m.op == "CREATE")
    }
  }

  test("round-10 llm rows: gopher rules gate, bloom prefilter sound, binary dedup") {
    val dd = Acid.queries("tbl_describe_detail")(spark, sf).head
    assert(dd.getAs[String]("format") == "graft-acid" &&
      dd.getAs[Long]("num_files") == 4L && dd.getAs[Boolean]("size_positive") &&
      dd.getAs[Long]("n_branches") == 1L && dd.getAs[Long]("n_tags") == 1L,
      s"tbl_describe_detail: $dd")
    import graft.operators.Llm
    val g = Llm.queries("llm_gopher_rules")(spark, sf).collect()
    assert(g.length > 0 && g.exists(_.getAs[Boolean]("keep")),
      "some documents pass the gopher gate")
    assert(g.forall { r =>
      r.getAs[Boolean]("keep") == (r.getAs[Boolean]("r_words") &&
        r.getAs[Boolean]("r_wlen") && r.getAs[Boolean]("r_alpha") &&
        r.getAs[Boolean]("r_stop"))
    }, "keep is the conjunction of the rules")
    val b = Llm.queries("llm_dedup_bloom")(spark, sf).collect()
    assert(b.nonEmpty && b.forall(_.getAs[Boolean]("prefilter_sound")),
      s"bloom prefilter found ${b.length} contaminated docs")
    assert(b.forall(_.getAs[Long]("doc_id") % 5 != 0), "hits are corpus-side only")
    val m = Llm.queries("llm_multimodal_dedup")(spark, sf).collect()
    assert(m.map(_.getAs[String]("mime")).distinct.sorted ===
      Seq("audio/wav", "image/png", "video/mp4"))
    assert(m.forall(_.getAs[Long]("n_copies") >= 1L))
  }

  test("re-injected xmlns preserves single-quoted values with double quotes") {
    import graft.sources.Xml
    val dir = Scratch.fresh("r10_ns_quote", sf)
    val body = (0 until 6).map(k =>
      s"""  <x:book key="$k"><name>N$k</name></x:book>""").mkString("\n")
    // a legal single-quoted xmlns value containing a double quote
    Files.write(Paths.get(dir, "cat.xml"),
      ("<catalog xmlns:x='urn:x?q=\"1\"'>\n" + body + "\n</catalog>")
        .getBytes("UTF-8"))
    val rows = Xml.readXmlNodePath(spark, dir, "/catalog/book")
      .collect().map(_.getString(0))
    assert(rows.length === 6)
    assert(rows.forall(_.contains("xmlns:x=\"urn:x?q=&quot;1&quot;\"")),
      s"embedded quotes must escape, got: ${rows.head}")
    // the rewritten snippets stay well-formed records
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import spark.implicits._
    val keys = spark.createDataset(rows.toSeq).toDF("xml")
      .withColumn("p", from_xml(col("xml"),
        StructType(Seq(StructField("_key", LongType)))))
      .select("p._key").collect().map(_.getLong(0)).sorted.toSeq
    assert(keys === (0L until 6L))
  }
}
