package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Spark-native connector for the ACID table format (SURVEY §2.10): a V1
  * `RelationProvider` + `PrunedFilteredScan`, so `spark.read
  * .format("graft-acid").load(dir)` — and any SQL view over it — plans
  * manifest file pruning INSIDE Spark's optimizer: the planner hands the
  * relation its pushed-down predicates, key-range filters prune to the
  * overlapping manifest entries (driver metadata only), column pruning
  * passes through to the underlying parquet scan, and the surviving
  * filters are re-applied by Spark above the scan (exactness regardless of
  * pruning precision). `version` option = time travel from SQL.
  *
  * The V1 source API is the right altitude here: the relation's input is
  * already parquet with its own V2 reader underneath — this layer only
  * decides WHICH files participate, which is exactly what
  * `PrunedFilteredScan` expresses. Registered via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister.
  */
class AcidSourceProvider extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-acid"
  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-acid: .load(<table dir>) is required"))
    val version = parameters.get("version").map(_.toInt).getOrElse(-1)
    new AcidRelation(ctx, dir, version)
  }
}

object AcidRelation {
  /** (filesScanned, filesTotal) of the last buildScan, keyed per
    * (table dir, RESOLVED version) — observability hook for AcidSpec's
    * pruning assertion (plan-side metrics are not reachable from a V1
    * relation). Version-scoped so a concurrent time-travel read of the
    * same table (a different relation instance) can't clobber the metric
    * of the snapshot read under test; two simultaneous queries over the
    * SAME (dir, version) still last-write-win — callers read the metric
    * immediately after forcing their scan (the single-threaded
    * probe discipline tbl_sql_source and AcidSpec follow).
    */
  val lastScan: TrieMap[(String, Int), (Int, Int)] = TrieMap.empty

  /** Metric accessor resolving `-1` to the current latest version. */
  def lastScanFor(dir: String, version: Int = -1): (Int, Int) =
    lastScan((dir, if (version < 0) Acid.latestVersion(dir) else version))
}

class AcidRelation(ctx: SQLContext, dir: String, version: Int)
    extends BaseRelation with PrunedFilteredScan {

  private val resolvedVersion =
    if (version < 0) Acid.latestVersion(dir) else version
  private val manifest = Acid.readManifest(dir, resolvedVersion)
  private val keyCol: String =
    ctx.sparkSession.read.parquet(s"$dir/${manifest.files.head.path}")
      .schema.fields.head.name

  override def sqlContext: SQLContext = ctx

  // readMergedAt: survives TYPE-WIDENED tables (declared-schema fallback
  // + upcast to the declared width) — same contract as the library
  // reads, served from the round-19 version-keyed schema cache (the
  // footer sweep + listing job ran ONCE per version, not per relation)
  override val schema: StructType =
    Acid.readMergedAt(ctx.sparkSession, dir, resolvedVersion,
      manifest.files).schema

  // Conservative key bounds from the pushed predicates: unhandled shapes
  // widen the range (never narrow it) — pruning stays sound because Spark
  // re-applies every filter above this scan.
  private def keyBounds(filters: Array[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    filters.foreach {
      case EqualTo(c, v) if c == keyCol =>
        asLong(v).foreach { l => lo = math.max(lo, l); hi = math.min(hi, l) }
      case GreaterThan(c, v) if c == keyCol =>
        asLong(v).foreach(l => lo = math.max(lo, l + 1))
      case GreaterThanOrEqual(c, v) if c == keyCol =>
        asLong(v).foreach(l => lo = math.max(lo, l))
      case LessThan(c, v) if c == keyCol =>
        asLong(v).foreach(l => hi = math.min(hi, l - 1))
      case LessThanOrEqual(c, v) if c == keyCol =>
        asLong(v).foreach(l => hi = math.min(hi, l))
      case In(c, vs) if c == keyCol && vs.nonEmpty =>
        val ls = vs.flatMap(asLong)
        if (ls.length == vs.length) { lo = math.max(lo, ls.min); hi = math.min(hi, ls.max) }
      case And(l, r) =>
        val (l1, h1) = keyBounds(Array(l)); val (l2, h2) = keyBounds(Array(r))
        lo = math.max(lo, math.max(l1, l2)); hi = math.min(hi, math.min(h1, h2))
      case _ => ()
    }
    (lo, hi)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (lo, hi) = keyBounds(filters)
    // STRING/DATE cstats pruning (round-15 — V1 parity with the V2 scan
    // and scanColRange): pushed eq/range/prefix predicates on stamped
    // columns drop files whose lexicographic [min, max] misses the
    // predicate, compared in UTF-8 binary order against the (possibly
    // truncated) bounds. Files without a column's stats are kept, and
    // Spark re-applies every filter above this scan — conservative,
    // never wrong. Library tables keep logical = physical names, so no
    // column mapping applies on this surface.
    val cb = AcidSql.cstatsBounds(filters)
    val inProbes = AcidSql.cstatsInProbes(filters)
    // NUMERIC nstats pruning (round-16 — V1 parity with the V2 tier):
    // integral/timestamp non-key predicates against the stamped [min,max]
    val nb = schema.fields.iterator
      .filter(f => f.name != keyCol && Acid.nstatType(f.dataType))
      .flatMap { fld =>
        val mine = filters.filter(f =>
          f.references.nonEmpty && f.references.forall(_ == fld.name))
        if (mine.isEmpty) None
        else {
          val isTs = fld.dataType ==
            org.apache.spark.sql.types.TimestampType
          val dec = AcidSql.numDecode(isTs)
          val (l, h) = AcidSql.numBounds(mine, fld.name, isTs)
          // per-value IN probes skip the gap files the envelope keeps
          val probes: Seq[Long] = mine.toSeq.collect {
            case In(c, vs) if c == fld.name && vs.nonEmpty =>
              val ls = vs.toSeq.flatMap(dec(_))
              if (ls.length == vs.length) ls else Seq.empty[Long]
          }.flatten
          if (l == Long.MinValue && h == Long.MaxValue && probes.isEmpty) None
          else Some((fld.name, l, h, probes))
        }
      }.toSeq
    // FLOAT/DOUBLE fstats pruning (round-16 — V1 parity with the V2
    // tier): sortable-bits envelope with the NaN rule — a conjunction
    // made only of lower bounds can still match NaN rows (NaN orders
    // above every value), so nan-bearing files survive it
    val fb = schema.fields.iterator
      .filter(f => f.name != keyCol && Acid.fstatType(f.dataType))
      .flatMap { fld =>
        val mine = filters.filter(f =>
          f.references.nonEmpty && f.references.forall(_ == fld.name))
        // an undecodable (NaN) literal anywhere in the conjunction makes
        // bound arithmetic unsound for this column — skip its pruning
        // entirely (AcidSql.fltNanLiteral doc; ADVICE r16 wrong-rows hole)
        if (mine.isEmpty || AcidSql.fltNanLiteral(mine, fld.name)) None
        else {
          val (l, h) = AcidSql.fltBounds(mine, fld.name)
          val probes: Seq[Long] = mine.toSeq.collect {
            case In(c, vs) if c == fld.name && vs.nonEmpty =>
              val ls = vs.toSeq.flatMap(AcidSql.fltDecode(_))
              if (ls.length == vs.length) ls else Seq.empty[Long]
          }.flatten
          val nanPossible = mine.forall {
            case GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
                 IsNotNull(_) => true
            case _ => false
          }
          if (l == Long.MinValue && h == Long.MaxValue && probes.isEmpty) None
          else Some((fld.name, l, h, probes, nanPossible))
        }
      }.toSeq
    val live = manifest.files.filter(f =>
      f.maxKey >= lo && f.minKey <= hi &&
        cb.forall { case (c, (cLo, cHi)) =>
          f.cstats.find(_._1 == c) match {
            case Some((_, mn, mx)) =>
              cLo.forall(Acid.u8Cmp(_, mx) <= 0) &&
                cHi.forall(Acid.u8Cmp(_, mn) >= 0)
            case None => true
          }
        } && nb.forall { case (c, l, h, probes) =>
          f.nstats.find(_._1 == c) match {
            case Some((_, mn, mx)) =>
              h >= mn && l <= mx &&
                (probes.isEmpty || probes.exists(p => p >= mn && p <= mx))
            case None => true
          }
        } && fb.forall { case (c, l, h, probes, nanPossible) =>
          f.fstats.find(_._1 == c) match {
            case Some((_, mn, mx, nan)) =>
              (nanPossible && nan > 0L) ||
                (h >= mn && l <= mx &&
                  (probes.isEmpty || probes.exists(p => p >= mn && p <= mx)))
            case None => true
          }
        } && AcidSql.survivesInProbes(f, inProbes))
    AcidRelation.lastScan.put((dir, resolvedVersion), (live.size, manifest.files.size))
    val s = ctx.sparkSession
    val raw =
      if (live.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
      else Acid.readMergedSubsetAt(s, dir, resolvedVersion, live)
    // merge-on-read deletion vectors: subtract the live entries'
    // sidecar union — key-level with a key anti-join, positional with a
    // (fname, pos) anti-join on the file-source metadata (the same
    // contract as Acid.snapshot; DV-less tables skip both entirely)
    val pdvs = live.flatMap(_.pdv.map(_._1)).distinct
    val posApplied =
      if (pdvs.isEmpty) raw
      else raw
        .withColumn("fname", expr("substring_index(_metadata.file_path, '/', -1)"))
        .withColumn("pos", col("_metadata.row_index"))
        .join(s.read.parquet(pdvs.map(p => s"$dir/$p"): _*)
          .select(col("fname"), col("pos")).distinct(),
          Seq("fname", "pos"), "left_anti")
        .drop("fname", "pos")
    val dvs = live.flatMap(_.dv.map(_._1)).distinct
    val base =
      if (dvs.isEmpty) posApplied
      else posApplied.join(
        s.read.parquet(dvs.map(p => s"$dir/$p"): _*).select(col(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    // re-apply the key range on the inner frame so it reaches the parquet
    // reader (row-group skipping); Spark re-applies the full predicates
    // above this scan either way
    val ranged = base.filter(col(keyCol).between(lo, hi))
    val projected =
      if (requiredColumns.isEmpty) ranged.select()
      else ranged.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}
