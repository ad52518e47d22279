package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` API surface, the standard pattern for Spark
  * extension libraries: `classic.ExpressionUtils.column/expression` are the
  * supported way to wrap a custom Catalyst Expression as a user-facing
  * Column in Spark 4.x, but they are package-private to org.apache.spark.sql.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (fully resolved) LogicalPlan as a DataFrame —
    * `classic.Dataset.ofRows` is the supported internal constructor for
    * extension libraries shipping custom plan nodes, but it is
    * `private[sql]`.
    */
  def ofRows(s: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** A parquet DataFrame over a MANIFEST-KNOWN file list (round 19,
    * Delta's TahoeLogFileIndex pattern): `spark.read.parquet(paths)`
    * re-stats every path through InMemoryFileIndex — at >32 paths a
    * distributed LISTING JOB per call (measured 1.1 s at 600 local
    * files; minutes at 10^6 remote ones) to learn lengths the manifest
    * already stamps exactly (`Files.size` at commit). This builds the
    * HadoopFsRelation directly over a FileIndex fed from the manifest
    * entries — ZERO filesystem listing at plan time; the scan,
    * pushdown, and `_metadata` behave exactly as the listed reader.
    * Callers must pass EXACT lengths (a wrong length truncates or
    * over-reads the file) — the graft caller guards on stamped
    * bytes > 0 for every entry and falls back to the listing reader
    * otherwise.
    *
    * KNOWN DEVIATION (r19 ADVICE low #4): the fabricated FileStatus
    * carries modificationTime = 0, so `_metadata.file_modification_time`
    * reads 1970-01-01 on this path while the listed-reader fallback
    * returns real mtimes. The manifest stamps no mtime (adding one is a
    * format change), and no declared query or engine-internal reader
    * consumes `_metadata.file_modification_time` (`file_path` /
    * `row_index`, which the DV machinery uses, are exact). Documented
    * rather than fixed.
    */
  def manifestParquetFrame(s: SparkSession, schema: types.StructType,
      files: Seq[(String, Long)]): DataFrame = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
    val cs = s.asInstanceOf[classic.SparkSession]
    val statuses = files.map { case (p, len) =>
      new FileStatus(len, false, 1, 134217728L, 0L, new Path(p))
    }
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = statuses.map(_.getPath)
      override def listFiles(
          partitionFilters: Seq[Expression],
          dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
        Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
      override def inputFiles: Array[String] = files.map(_._1).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = files.map(_._2).sum
      override def partitionSchema: types.StructType = new types.StructType()
    }
    val rel = HadoopFsRelation(index, new types.StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      Map.empty)(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel))
  }

  /** Wrap an InternalRow RDD as a STREAMING DataFrame — what a V1
    * streaming `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`). This is the same `internalCreateDataFrame(...,
    * isStreaming = true)` call the built-in file/rate sources make; it is
    * `private[sql]`-adjacent (public on classic.SparkSession but not on
    * the api surface), hence routed through this one sanctioned bridge.
    */
  def streamingDataFrame(s: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
