package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Scratch, TestSpark}

/** Round-18 pins.
  *
  * First family: catalog function-listing completeness (round-17 verdict
  * next #4): `listFunctions` must serve every FIXED name `loadFunction`
  * honors — months/years were loadable but unlisted, so catalog
  * discovery (and any tool enumerating transforms) missed two of the
  * six. The parametric truncate_N / truncstr_N spellings stay
  * load-on-demand (one name per width — not enumerable).
  */
class Round18Spec extends AnyFunSuite {
  import TestSpark._

  test("listFunctions serves every fixed name loadFunction honors") {
    val root = Scratch.fresh("r18_lsfn", sf)
    val cat = "r18lf"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val plugin = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val listed = plugin.listFunctions(Array.empty).map(_.name()).toSet
    assert(listed == Set("bucket", "days", "hours", "months", "years",
      "truncate"))
    // listing ⊆ loadable: every listed name resolves
    listed.foreach { n =>
      plugin.loadFunction(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty[String], n))
    }
    // the parametric family stays loadable though unlisted
    Seq("truncate_4", "truncstr_4").foreach { n =>
      plugin.loadFunction(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty[String], n))
    }
    // nested namespaces list nothing (transform resolution looks only at
    // the top level)
    assert(plugin.listFunctions(Array("db")).isEmpty)
  }

  /** Second family: `.partitions` decodes STRING identity values
    * (round-17 verdict next #3): the packed 8-byte cell is an internal
    * stat — the operator partitioned by a language code and should see
    * it. The decode trusts ONLY the exact cstats pair (min == max, both
    * exactness bits); a cell whose files cannot prove one shared value
    * (two >8-byte values colliding in the prefix) displays a marked
    * `~[lo..hi]` envelope, never a wrong value. DESCRIBE DETAIL reports
    * the PUBLIC spec spelling (plain identity), not the internal
    * `identstr(...)` flavor. */
  test(".partitions decodes identstr values; collisions mark an envelope") {
    import spark.implicits._
    val root = Scratch.fresh("r18_pdecode", sf)
    val cat = "r18pd"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.docs")
    spark.sql(s"""CREATE TABLE $cat.docs (k BIGINT, lang STRING, n BIGINT)
                 |PARTITIONED BY (lang)""".stripMargin)
    // three short codes (≤ 8 UTF-8 bytes — pack injectively) plus two
    // LONG values sharing an 8-byte prefix (collide into one cell)
    (0L until 60L).map { i =>
      val lang = (i % 5) match {
        case 0 => "en"
        case 1 => "de"
        case 2 => "zh"
        case 3 => "languagecode_aa"
        case _ => "languagecode_bb"
      }
      (i, lang, i * 10)
    }.toDF("k", "lang", "n").createOrReplaceTempView("r18_pd_src")
    spark.sql(s"INSERT INTO $cat.docs SELECT k, lang, n FROM r18_pd_src")
    val parts = spark.read.table(s"$cat.docs.partitions").collect()
    val byStr = parts.flatMap(r => Option(r.getAs[String]("value_str")))
    // every short code decodes to itself
    assert(Set("en", "de", "zh").subsetOf(byStr.toSet), byStr.toSeq.toString)
    // the colliding cell displays a marked envelope bracketing both
    // values — NEVER one of them bare
    val env = byStr.filter(_.startsWith("~["))
    assert(env.length == 1, s"one envelope cell, got ${byStr.toSeq}")
    assert(env.head.contains("languagecode_a") &&
      env.head.contains("languagecode_b"), env.head)
    assert(!byStr.contains("languagecode_aa") &&
      !byStr.contains("languagecode_bb"), byStr.toSeq.toString)
    // row/file totals still reconcile with .files
    assert(parts.map(_.getAs[Long]("rows")).sum == 60L)
    // truncstr cells render their shared byte-prefix as `prefix*`
    spark.sql(s"DROP TABLE IF EXISTS $cat.tr")
    spark.sql(s"""CREATE TABLE $cat.tr (k BIGINT, url STRING, n BIGINT)
                 |PARTITIONED BY (truncate(4, url))""".stripMargin)
    (0L until 40L).map(i => (i, s"http${i % 2}/page$i", i))
      .toDF("k", "url", "n").createOrReplaceTempView("r18_pd_tr")
    spark.sql(s"INSERT INTO $cat.tr SELECT k, url, n FROM r18_pd_tr")
    val trParts = spark.read.table(s"$cat.tr.partitions").collect()
      .flatMap(r => Option(r.getAs[String]("value_str"))).toSet
    assert(trParts == Set("http*"), trParts.toString)
    spark.sql(s"DROP TABLE IF EXISTS $cat.tr")
    // DESCRIBE DETAIL reports the public identity spelling
    val spec = Acid.describeDetail(spark, s"$root/docs")
      .select("partition_spec").head.getString(0)
    assert(spec == "lang", s"public spelling, got '$spec'")
    spark.sql(s"DROP TABLE IF EXISTS $cat.docs")
  }

  /** Third family: metadata-only STRING partition-set DELETE (round-17
    * verdict next #2). Droppable needs the file to PROVE one in-set
    * value through its exact cstats pair plus the zero-null stamp; the
    * named trap is a >8-byte prefix collision — two distinct values in
    * one packed cell — which must REWRITE the file (keeping the other
    * value's rows), never drop it wholesale. A single-valued file
    * carrying NULLs also refuses the drop (NULL fails the predicate and
    * must survive). */
  test("string partition DELETE: short codes drop metadata-only, " +
      "colliding prefixes rewrite, nulls refuse the drop") {
    import spark.implicits._
    val root = Scratch.fresh("r18_sdel", sf)
    val cat = "r18sd"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, lang STRING, n BIGINT)
                 |PARTITIONED BY (lang)""".stripMargin)
    (0L until 80L).map { i =>
      val lang = (i % 4) match {
        case 0 => "en"
        case 1 => "zh"
        case 2 => "languagecode_aa" // collide: shared 8-byte prefix,
        case _ => "languagecode_bb" // exact cstats (< 16 code points)
      }
      (i, lang, i)
    }.toDF("k", "lang", "n").createOrReplaceTempView("r18_sd_src")
    spark.sql(s"INSERT INTO $cat.t SELECT k, lang, n FROM r18_sd_src")
    val dir = s"$root/t"
    // 1) short-code purge: proven single-valued files DROP — one
    //    manifest commit, no rewrite output directory
    val v0 = Acid.latestVersion(dir)
    val before = Acid.readManifest(dir, v0).files.map(_.path).toSet
    spark.sql(s"DELETE FROM $cat.t WHERE lang IN ('zh')")
    val v1 = Acid.latestVersion(dir)
    val after1 = Acid.readManifest(dir, v1).files.map(_.path).toSet
    assert(v1 == v0 + 1 && after1.subsetOf(before) && after1.size < before.size)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, s"d${v1}_sqldel")), "no rewrite dir")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE lang = 'zh'")
      .head.getLong(0) == 0L)
    // 2) the collision trap: both long values share one packed cell
    //    (min != max in the file) — the DELETE must REWRITE that file,
    //    and every languagecode_bb row must survive
    spark.sql(s"DELETE FROM $cat.t WHERE lang IN ('languagecode_aa')")
    val v2 = Acid.latestVersion(dir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, s"d${v2}_sqldel")),
      "collided cell must pay the rewrite, not a wholesale drop")
    val left = spark.sql(
      s"SELECT lang, count(*) AS n FROM $cat.t GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(left.toSeq == Seq(("en", 20L), ("languagecode_bb", 20L)),
      left.toSeq.toString)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    // 3) NULL refusal: a single-valued file CARRYING NULLs cannot drop
    //    (its null rows fail the predicate and survive the delete)
    spark.sql(s"DROP TABLE IF EXISTS $cat.u")
    spark.sql(s"CREATE TABLE $cat.u (k BIGINT, lang STRING, n BIGINT)")
    (0L until 40L).map(i => (i, if (i % 5 == 0) null else "xx", i))
      .toDF("k", "lang", "n").coalesce(1)
      .createOrReplaceTempView("r18_sd_nulls")
    spark.sql(s"INSERT INTO $cat.u SELECT k, lang, n FROM r18_sd_nulls")
    val udir = s"$root/u"
    val uv0 = Acid.latestVersion(udir)
    spark.sql(s"DELETE FROM $cat.u WHERE lang = 'xx'")
    val uv1 = Acid.latestVersion(udir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(udir, s"d${uv1}_sqldel")) && uv1 == uv0 + 1,
      "null-bearing single-valued file must rewrite, not drop")
    assert(spark.sql(s"SELECT count(*) FROM $cat.u").head.getLong(0) == 8L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.u WHERE lang IS NULL")
      .head.getLong(0) == 8L)
    spark.sql(s"DROP TABLE IF EXISTS $cat.u")
  }

  /** Fourth family: DECLARED-SCHEMA VERSIONING (round-17 verdict next #1
    * — the last unversioned schema sidecar closed). Every commit stamps
    * the declared schema's DDL and the defaults sidecar into its
    * manifest header (9th/10th fields, colMap/dropped's pattern), and
    * EVERY schema change now commits a metadata-only ALTER version — so
    * a version pinned between an ADD COLUMN and its first INSERT serves
    * the declared-at-that-version shape (EXISTS-default-filled), a
    * pre-ALTER pin never shows the column, and a pinned load straddling
    * a SET DEFAULT shows the write default that was current THEN. */
  test("declared-schema versioning: pins serve the schema declared at " +
      "their version; SET DEFAULT straddles resolve per version") {
    val root = Scratch.fresh("r18_dsv", sf)
    val cat = "r18dv"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    spark.range(100L).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("r18_dsv_src")
    spark.sql(s"INSERT INTO $cat.t SELECT k, v FROM r18_dsv_src")
    val dir = s"$root/t"
    val vIns = Acid.latestVersion(dir)
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN tier STRING DEFAULT 'basic'")
    val vAlter = Acid.latestVersion(dir)
    assert(vAlter == vIns + 1, "ADD COLUMN commits one metadata version")
    // the pre-ALTER pin never shows the column
    assert(!spark.sql(s"SELECT * FROM $cat.t VERSION AS OF $vIns")
      .columns.contains("tier"))
    // the pin BETWEEN the ADD and its first INSERT serves the declared
    // shape, EXISTS-default-filled — this was the round-17 gap (pinned
    // schemas were file-derived, so this pin hid the column)
    val pinned = spark.sql(s"SELECT * FROM $cat.t VERSION AS OF $vAlter")
    assert(pinned.columns.contains("tier"), "declared-at-version schema")
    assert(pinned.filter(col("tier") === "basic").count() == 100L,
      "EXISTS default fills the pinned read's pre-ALTER files")
    spark.sql(s"INSERT INTO $cat.t (k, v) VALUES (1000, 1)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF $vAlter")
      .head.getLong(0) == 100L, "the pin is immutable across the insert")
    // LIBRARY parity: Acid.snapshot at a pinned version serves the same
    // declared-at-v shape (EXISTS-default-filled) the catalog pin does
    val lib = Acid.snapshot(spark, dir, vAlter)
    assert(lib.columns.contains("tier") &&
      lib.filter(col("tier") === "basic").count() == 100L,
      "library pinned snapshot must match the catalog pin")
    assert(!Acid.snapshot(spark, dir, vIns).columns.contains("tier"))
    // SET DEFAULT commits a version; a pinned load on either side shows
    // the write default current THEN (the catalog's field metadata)
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN tier SET DEFAULT 'gold'")
    val vSet = Acid.latestVersion(dir)
    val plugin = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val id = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "t")
    def curDefaultAt(v: Int): String = plugin.loadTable(id, v.toString)
      .schema().apply("tier").metadata.getString("CURRENT_DEFAULT")
    assert(curDefaultAt(vAlter) == "'basic'" ||
      curDefaultAt(vAlter) == "basic", curDefaultAt(vAlter))
    assert(curDefaultAt(vSet) == "'gold'" ||
      curDefaultAt(vSet) == "gold", curDefaultAt(vSet))
    // and the EXISTS side stays fixed at ADD: pinned reads at both
    // versions fill 'basic' into pre-ALTER files, never 'gold'
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF $vSet " +
      "WHERE tier = 'basic'").head.getLong(0) >= 100L)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }

  /** Fifth family: SPJ over STRING identity partitions (round-17
    * verdict next #5; COST-BASED since round 19, r18 verdict next #4).
    * Keys are the files' PROVEN single values (the exact cstats pair +
    * zero-null stamp), never the packed prefix cell. The engine now
    * chooses per join (IdentstrSpjAutoRule): a BARE co-partitioned
    * lang⋈lang equi-join goes exchange-free by DEFAULT, while a side
    * carrying a real predicate declines (runtime/static pruning stays
    * the win there — tbl_part_identstr pins the fact⋈dim shape); knob
    * "off" disables the rule, "true" still forces. A >8-byte prefix
    * collision declines the whole plan (a shuffle, never a wrong
    * co-location) under either mode. */
  test("identstr SPJ (cost-based): bare lang joins go exchange-free by " +
      "default; filtered sides and collisions decline; knob overrides") {
    import spark.implicits._
    val root = Scratch.fresh("r18_sspj", sf)
    val cat = "r18sj"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    Seq("a", "b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.$t")
      spark.sql(s"""CREATE TABLE $cat.$t (k BIGINT, lang STRING, n BIGINT)
                   |PARTITIONED BY (lang)""".stripMargin)
    }
    (0L until 300L).map(i => (i, Seq("en", "de", "zh", "fr")((i % 4).toInt), i))
      .toDF("k", "lang", "n").createOrReplaceTempView("r18_sj_src")
    spark.sql(s"INSERT INTO $cat.a SELECT k, lang, n FROM r18_sj_src")
    spark.sql(s"INSERT INTO $cat.b SELECT k, lang, n * 10 FROM r18_sj_src " +
      "WHERE k % 2 = 0")
    val q = s"""SELECT a.lang, count(*) AS n, sum(b.n) AS bn
               |FROM $cat.a a JOIN $cat.b b ON a.lang = b.lang
               |GROUP BY a.lang""".stripMargin
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // knob "off": the rule stands down — a shuffle
      spark.conf.set("spark.graft.identstrSpj", "off")
      val off = spark.sql(q)
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"),
        "knob off must keep the scans unreported — a shuffle")
      val expect = off.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      // DEFAULT (auto): bare co-partitioned join — exchange-free,
      // identical results
      spark.conf.set("spark.graft.identstrSpj", "auto")
      val on = spark.sql(q)
      val plan = on.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected an exchange-free lang join by default:\n$plan")
      assert(on.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq == expect)
      // a REAL predicate on one side declines the auto rule (that side
      // may prune instead) — correctness unchanged
      val fq = spark.sql(
        s"""SELECT a.lang, count(*) AS n
           |FROM $cat.a a JOIN $cat.b b ON a.lang = b.lang
           |WHERE b.n > 100 GROUP BY a.lang""".stripMargin)
      assert(fq.queryExecution.executedPlan.toString.contains("Exchange"),
        "a filtered side must decline cost-based SPJ")
      fq.collect(): Unit
      // a colliding >8-byte value declines the plan even when forced
      spark.sql(s"INSERT INTO $cat.a VALUES " +
        "(900, 'languagecode_aa', 1), (901, 'languagecode_bb', 1)")
      spark.conf.set("spark.graft.identstrSpj", "true")
      val coll = spark.sql(q)
      assert(coll.queryExecution.executedPlan.toString.contains("Exchange"),
        "a collided cell must decline SPJ — shuffle, never wrong")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      spark.conf.set("spark.graft.identstrSpj", "auto")
    }
    Seq("a", "b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $cat.$t"))
  }

  /** Sixth family: string-RANGE aligned DELETE (the set shape's interval
    * sibling). Interval containment classifies on the cstats ENVELOPE,
    * exactness-free — truncation only WIDENS the stored bounds
    * (truncBoundMin keeps a prefix, truncBoundMax increments), so
    * envelope-inside proves every row matches even for >16-code-point
    * values whose exactness bits are OFF; a file whose envelope straddles
    * a bound rewrites. */
  test("string range DELETE: covered files drop (even with truncated " +
      "envelopes), straddlers rewrite") {
    import spark.implicits._
    val root = Scratch.fresh("r18_rdel", sf)
    val cat = "r18rd"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.AcidCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, tenant STRING, n BIGINT)")
    // one file per tenant "shard": short codes plus one LONG tenant id
    // (> 16 code points — its cstats bounds truncate, exactness bits off)
    val longT = "tenant_mmmmmmmmmmmmmmmmmmmm" // sorts inside [f, z)
    Seq("alpha", "echo", "golf", longT, "zulu").zipWithIndex.foreach {
      case (t, i) =>
        (0L until 20L).map(j => (i * 100L + j, t, j)).toDF("k", "tenant", "n")
          .coalesce(1).createOrReplaceTempView("r18_rd_one")
        spark.sql(s"INSERT INTO $cat.t SELECT k, tenant, n FROM r18_rd_one")
    }
    val dir = s"$root/t"
    val v0 = Acid.latestVersion(dir)
    // purge the [f, z) shard: echo/alpha/zulu survive; golf and the
    // truncated-envelope long tenant drop WITHOUT a rewrite
    spark.sql(s"DELETE FROM $cat.t WHERE tenant >= 'f' AND tenant < 'z'")
    val v1 = Acid.latestVersion(dir)
    assert(v1 == v0 + 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, s"d${v1}_sqldel")),
      "wholly-covered files (incl. the truncated envelope) drop metadata-only")
    val left = spark.sql(s"SELECT tenant, count(*) AS n FROM $cat.t " +
      "GROUP BY tenant ORDER BY tenant").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(left == Seq(("alpha", 20L), ("echo", 20L), ("zulu", 20L)), left.toString)
    // a straddling file rewrites: one file spanning the 'e'..'g' range
    (0L until 30L).map(j =>
      (1000L + j, if (j % 2 == 0) "echo" else "golf", j))
      .toDF("k", "tenant", "n").coalesce(1)
      .createOrReplaceTempView("r18_rd_mix")
    spark.sql(s"INSERT INTO $cat.t SELECT k, tenant, n FROM r18_rd_mix")
    spark.sql(s"DELETE FROM $cat.t WHERE tenant >= 'f' AND tenant < 'z'")
    val v3 = Acid.latestVersion(dir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, s"d${v3}_sqldel")),
      "the mixed echo/golf file straddles the bound and must rewrite")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE tenant = 'golf'")
      .head.getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE tenant = 'echo'")
      .head.getLong(0) == 35L)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
  }
}
