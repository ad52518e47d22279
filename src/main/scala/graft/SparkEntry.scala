package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Curation, Llm, Multimodal, Pipeline, Relational}
import graft.functions.Scalars
import graft.sources.{Acid, Avro, Xml}
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the binding operator inventory of SURVEY.md §2: one entry
  * per operator row, each a `(SparkSession, sfDir) => DataFrame`. For every
  * SQL-expressible row, `oracleSql` carries the equivalent DuckDB SQL the
  * driver hash-compares against.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalars.queries ++ Llm.queries ++ Multimodal.queries ++
      Xml.queries ++ Acid.queries ++ Avro.queries ++ Streaming.queries ++
      Pipeline.queries ++ Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Scalars.oracles ++ Llm.oracles ++ Multimodal.oracles ++
      Xml.oracles ++ Acid.oracles ++ Avro.oracles ++ Streaming.oracles ++
      Pipeline.oracles ++ Curation.oracles
}
