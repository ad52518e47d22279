package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Row-group-pruned initialization for Spark's vectorized parquet reader
  * (graft round-11 item #1).
  *
  * Spark's own V2 parquet scan prunes ROW GROUPS inside a file by
  * evaluating pushed predicates against each group's footer
  * stats/dictionary/bloom before any page decodes; the public
  * `initialize(path, columns)` test seam the graft V2 reader previously
  * used reads every group. The production seam — hand the reader a
  * caller-opened [[ParquetFileReader]] whose block list was filtered at
  * open via `FilterCompat` — is the package-private 4-arg `initialize`
  * overload plus the package-private `ParquetRowGroupReader` interface.
  * This object lives in Spark's package solely to reach that seam; no
  * Spark internals are modified, and the init sequence mirrors
  * `SpecificParquetRecordReaderBase.initialize(path, columns)` exactly
  * (`setRequestedSchema` on the file reader, then the 4-arg initialize
  * with the filtered record count).
  *
  * The caller must open `fr` with `useColumnIndexFilter(false)`: the
  * vectorized reader consumes whole row groups via `readNextRowGroup()`,
  * so the filtered record count must equal the surviving groups' full
  * row count — page-level (column-index) filtering would undercount and
  * truncate the read.
  */
object GraftParquetBridge {
  private class RowGroups(fr: ParquetFileReader)
      extends SpecificParquetRecordReaderBase.ParquetRowGroupReader {
    override def readNextRowGroup(): PageReadStore = fr.readNextRowGroup()
    override def close(): Unit = fr.close()
  }

  /** Initialize `r` over `fr`; after this, `initBatch` +
    * `enableReturningBatches` proceed as with any other init path. */
  def initVectorized(r: VectorizedParquetRecordReader, fr: ParquetFileReader,
      fileSchema: MessageType, requested: MessageType): Unit = {
    fr.setRequestedSchema(requested)
    r.initialize(fileSchema, requested, new RowGroups(fr),
      Math.toIntExact(fr.getFilteredRecordCount()))
  }
}
