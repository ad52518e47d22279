package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The `<cat>.t.history` METADATA TABLE — `DESCRIBE HISTORY` re-derived
  * as the same Iceberg-metadata-table idiom the `.changes` table uses:
  *
  * {{{
  *   SELECT * FROM cat.t.history ORDER BY version
  * }}}
  *
  * One row per RETAINED commit (vacuum trims the log; history serves
  * what the log holds — the same horizon contract as time travel):
  * `version`, `ts` (the manifest's commit mtime — wall-clock, immutable
  * after the atomic rename), `operation` (the manifest's `op` field,
  * Delta's commitInfo analogue: CREATE / WRITE / OVERWRITE / MERGE /
  * DELETE / OPTIMIZE / RESTORE / CLONE / ...; empty for manifests
  * written before the field existed), `n_files` (live entries),
  * `n_rows` (LOGICAL rows: physical entry rows minus distinct key-level
  * and positional deletion-sidecar counts), `has_cdc` (this commit
  * persisted its change rows).
  *
  * Scale: planning reads each retained manifest once on the driver —
  * O(log size) metadata, no data file is touched; the rows ship inside
  * the single input partition (a few dozen bytes per version).
  */
class AcidHistoryTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-acid-history:$dir"
  override def schema(): StructType = AcidHistory.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new AcidHistoryScan(dir)
    }
}

object AcidHistory {
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("has_cdc", BooleanType, nullable = false)))

  /** (version, tsMicros, op, nFiles, nRows, hasCdc) per retained version. */
  def rows(dir: String): Seq[(Long, Long, String, Long, Long, Boolean)] =
    (0 to Acid.latestVersion(dir)).flatMap { v =>
      Acid.manifestMtimeMicros(dir, v).map { ts =>
        val m = Acid.readManifest(dir, v)
        val logicalRows = m.files.map(_.rows).sum -
          m.files.flatMap(_.dv).distinct.map(_._2).sum -
          m.files.flatMap(_.pdv).distinct.map(_._2).sum
        (v.toLong, ts, m.op, m.files.size.toLong, logicalRows,
          m.cdcPath.isDefined)
      }
    }
}

class AcidHistoryScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = AcidHistory.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(AcidHistoryInputPartition(AcidHistory.rows(dir)))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new AcidHistoryPartitionReader(
          p.asInstanceOf[AcidHistoryInputPartition].rows)
    }
}

case class AcidHistoryInputPartition(
    rows: Seq[(Long, Long, String, Long, Long, Boolean)]) extends InputPartition

class AcidHistoryPartitionReader(rows: Seq[(Long, Long, String, Long, Long, Boolean)])
    extends PartitionReader[InternalRow] {
  private val it = rows.iterator
  private var cur: InternalRow = _
  override def next(): Boolean = {
    if (!it.hasNext) return false
    val (v, ts, op, nf, nr, cdc) = it.next()
    val r = new GenericInternalRow(6)
    r.update(0, v); r.update(1, ts); r.update(2, UTF8String.fromString(op))
    r.update(3, nf); r.update(4, nr); r.setBoolean(5, cdc)
    cur = r
    true
  }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

/** The `<cat>.t.files` METADATA TABLE — Iceberg's `db.table.files`
  * re-derived over the manifest: one row per LIVE entry of the latest
  * version with its manifest-carried metadata (physical rows, key
  * min/max, second-dimension stats, deletion-vector row counts, bloom
  * presence). What an operator looks at before choosing OPTIMIZE /
  * optimizeRange / optimizeZorder: fragmentation, clustering overlap
  * and merge-on-read debt are all visible here without touching one
  * data file. Planning is a single driver-side manifest read.
  */
class AcidFilesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-acid-files:$dir"
  override def schema(): StructType = AcidFiles.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new AcidFilesScan(dir)
    }
}

object AcidFiles {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("min_key", LongType, nullable = false),
    StructField("max_key", LongType, nullable = false),
    StructField("stats2_col", StringType, nullable = true),
    StructField("stats2_min", LongType, nullable = true),
    StructField("stats2_max", LongType, nullable = true),
    StructField("dv_rows", LongType, nullable = false),
    StructField("pdv_rows", LongType, nullable = false),
    StructField("has_bloom", BooleanType, nullable = false),
    StructField("bytes", LongType, nullable = false)))
}

class AcidFilesScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = AcidFiles.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(AcidFilesInputPartition(
      Acid.readManifest(dir, Acid.latestVersion(dir)).files))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val entries = p.asInstanceOf[AcidFilesInputPartition].entries
        new PartitionReader[InternalRow] {
          private val it = entries.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val f = it.next()
            val r = new GenericInternalRow(11)
            r.update(0, UTF8String.fromString(f.path))
            r.update(1, f.rows); r.update(2, f.minKey); r.update(3, f.maxKey)
            f.stats2 match {
              case Some((c, mn, mx)) =>
                r.update(4, UTF8String.fromString(c)); r.update(5, mn); r.update(6, mx)
              case None =>
                r.update(4, null); r.update(5, null); r.update(6, null)
            }
            r.update(7, f.dv.map(_._2).getOrElse(0L))
            r.update(8, f.pdv.map(_._2).getOrElse(0L))
            r.setBoolean(9, f.bloom.isDefined)
            r.update(10, f.bytes)
            cur = r
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

case class AcidFilesInputPartition(entries: Seq[Acid.FileEntry])
  extends InputPartition

/** `<cat>.t.partitions` — the Iceberg `db.table.partitions` idiom: one
  * row per live partition value with file/row/byte totals, aggregated
  * from ONE driver-side manifest read (partition-count sized, data
  * never touched). The operator's first look before partition-scoped
  * maintenance: which days are fragmented, which buckets skewed.
  * Files carrying no stats under the table's partition label (e.g.
  * rewritten by a partition-agnostic OPTIMIZE) land on a NULL-value
  * row, so totals always reconcile with `.files`.
  */
class AcidPartitionsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-acid-partitions:$dir"
  override def schema(): StructType = AcidPartitions.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new AcidPartitionsScan(dir)
    }
}

object AcidPartitions {
  val schema: StructType = StructType(Seq(
    StructField("transform", StringType, nullable = false),
    StructField("value", LongType, nullable = true),
    StructField("n_files", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    // round-18: the DECODED partition value for STRING identity layouts
    // (the packed `value` cell is an internal stat, not the language /
    // tenant code the operator partitioned by). The real string when
    // every file in the cell proves ONE value through its exact cstats
    // pair; a marked `~[lo..hi]` envelope when values collide in the
    // 8-byte prefix or a stamp is truncated; NULL for non-string
    // transforms and for the stats-less reconciliation row.
    StructField("value_str", StringType, nullable = true)))
}

case class AcidPartitionsRow(value: Option[Long], nFiles: Long, rows: Long,
    bytes: Long, valueStr: Option[String] = None)
case class AcidPartitionsInputPartition(label: String,
    rows: Seq[AcidPartitionsRow]) extends InputPartition

class AcidPartitionsScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = AcidPartitions.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // one row-group PER TRANSFORM across the spec history (round-10
    // multi-column specs / spec evolution): each transform's files
    // classify by its own one-value stat — stats2 for a leading
    // transform, tagged pstats for secondaries — so `.partitions` shows
    // every declared dimension; single-spec tables read as before
    val specs = Acid.partSpecHistory(dir).flatten.distinct
    val labels = if (specs.isEmpty) Seq("") else specs.map(_.label)
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    labels.map { label =>
      // STRING identity cells decode to their real value (round-18):
      // the packed stamp is NOT single-valued evidence (distinct strings
      // share an 8-byte prefix), so the decode rides the same exact
      // cstats pair the manifest GROUP BY fold trusts — min == max with
      // BOTH exactness bits proves the file holds one value. A cell
      // whose files all prove the SAME value displays it; anything else
      // (collision, truncated stamp, multi-value file) displays a
      // marked `~[lo..hi]` cstats envelope, never a wrong value.
      val strCol: Option[String] = specs.collectFirst {
        case ps @ Acid.PartIdentityStr(c) if ps.label == label => c
      }
      // truncstr cells render their byte-prefix as `prefix*` (round-18):
      // the packed cell IS the min(n, 8)-byte prefix (zero-padded,
      // sign-flipped), so unpacking the cell value decodes it directly —
      // no cstats needed (cstatCols deliberately skips truncstr source
      // columns, their transform stamp covers pruning). A trailing
      // partial multi-byte sequence is dropped, display never splits a
      // character; real strings carry no NUL, so stripping zero padding
      // is unambiguous.
      val isTruncStr = specs.exists {
        case ps: Acid.PartTruncateStr => ps.label == label
        case _ => false
      }
      def unpackCell(cell: Long): String = {
        val v = cell ^ Long.MinValue
        val bs = (0 until 8).map(i =>
          ((v >>> ((7 - i) * 8)) & 0xFFL).toByte).toArray
        val len = { var e = 8; while (e > 0 && bs(e - 1) == 0) e -= 1; e }
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        var l = len
        while (l > 0) {
          try return dec.decode(java.nio.ByteBuffer.wrap(bs, 0, l)).toString
          catch { case _: java.nio.charset.CharacterCodingException => l -= 1 }
        }
        ""
      }
      def decodeCell(v: Long, fs: Seq[Acid.FileEntry]): Option[String] =
        strCol.map { c =>
          def exactVal(f: Acid.FileEntry): Option[String] = for {
            cs <- f.cstats.find(_._1 == c)
            ex <- f.cexact.find(_._1 == c)
            if ex._2 && ex._3 && cs._2 == cs._3
          } yield cs._2
          val vals = fs.map(exactVal)
          if (vals.forall(_.isDefined) && vals.flatten.distinct.size == 1)
            vals.head
          else {
            val bounds = fs.flatMap(_.cstats.find(_._1 == c))
            if (bounds.isEmpty) None
            else Some(s"~[${bounds.map(_._2).min}..${bounds.map(_._3).max}]")
          }
        }.getOrElse(
          if (isTruncStr) Some(unpackCell(v) + "*") else None)
      val grouped = m.files.groupBy(Acid.partitionValueOfAny(_, label))
      val rows = grouped.toSeq.map { case (v, fs) =>
        AcidPartitionsRow(v, fs.size.toLong, fs.map(_.rows).sum,
          fs.map(_.bytes).sum, v.flatMap(decodeCell(_, fs)))
      }.sortBy(_.value.getOrElse(Long.MinValue))
      AcidPartitionsInputPartition(label, rows)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val ip = p.asInstanceOf[AcidPartitionsInputPartition]
        new PartitionReader[InternalRow] {
          private val it = ip.rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val g = it.next()
            val r = new GenericInternalRow(6)
            r.update(0, UTF8String.fromString(ip.label))
            r.update(1, g.value.map(Long.box).orNull)
            r.update(2, g.nFiles); r.update(3, g.rows); r.update(4, g.bytes)
            r.update(5, g.valueStr.map(UTF8String.fromString).orNull)
            cur = r
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

// ============================================================================
// `.refs` — branches and tags as a metadata table (round 10; the Iceberg
// `db.table.refs` idiom): one row per branch (kind, name, base version,
// STAGED commit count) and per tag (pinned version), from one `_log`
// listing. Same rows as SHOW REFS / `Acid.refs`, served as a table so
// ref state composes into SQL (joins against `.history`, audits).
// ============================================================================

class AcidRefsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-acid-refs:$dir"
  override def schema(): StructType = AcidRefs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new AcidRefsScan(dir)
    }
}

object AcidRefs {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("staged", LongType, nullable = false)))
}

case class AcidRefsInputPartition(rows: Seq[(String, String, Long, Long)])
  extends InputPartition

class AcidRefsScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = AcidRefs.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(AcidRefsInputPartition(Acid.refRows(dir)))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val it = p.asInstanceOf[AcidRefsInputPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val g = it.next()
            val r = new GenericInternalRow(4)
            r.update(0, UTF8String.fromString(g._1))
            r.update(1, UTF8String.fromString(g._2))
            r.update(2, g._3); r.update(3, g._4)
            cur = r
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}
