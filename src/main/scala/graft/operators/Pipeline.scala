package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline-level transforms from the reference's public CDAP surface
  * (SURVEY §0.4): per-record error-port routing generalized to ANY
  * transform, and runtime macro substitution into query parameters.
  */
object Pipeline {
  private type Q = (SparkSession, String) => DataFrame

  /** Per-record error-port routing as a general transform — the reference's
    * XML Parser error policy (ignore / stop / route-to-error-port)
    * generalized: ANY DataFrame splits into a (main, error) pair on a parse
    * predicate, error rows carrying the raw record plus a reason. Both
    * ports are filters over the same scan — narrow, pushdown-friendly, no
    * shuffle; at 100 TB each port is an independent branch of one shared
    * scan, and the error port is typically ≪1% of rows.
    */
  def errorPort(df: DataFrame, ok: Column, raw: Column, reason: Column)
      : (DataFrame, DataFrame) = {
    val main = df.filter(ok)
    val error = df.filter(!coalesce(ok, lit(false)))
      .select(raw.as("raw_record"), reason.as("reason"))
    (main, error)
  }

  /** op_error_port: pipe-delimited records are synthesized from orders with
    * two planted per-record corruption classes (non-numeric amount for
    * o_orderkey % 97 == 0, missing field for % 89 == 0), then PARSED — the
    * routing decision comes from the parse itself (try_cast null / missing
    * field), not from the planting rule. Output is the per-port summary:
    * main-port row count + verified total, error-port counts by reason.
    */
  val opErrorPort: Q = (s, d) => {
    val recs = Tables.orders(s, d).select(
      when(pmod(col("o_orderkey"), lit(97)) === 0,
        concat(col("o_orderkey"), lit("|N/A")))
        .when(pmod(col("o_orderkey"), lit(89)) === 0,
          col("o_orderkey").cast("string"))
        .otherwise(concat(col("o_orderkey"), lit("|"), col("o_totalprice")))
        .as("raw"))
    val parsed = recs
      .withColumn("parts", split(col("raw"), "\\|"))
      .withColumn("key",
        expr("try_cast(parts[0] AS BIGINT)"))
      .withColumn("total",
        when(size(col("parts")) >= 2, expr("try_cast(parts[1] AS DOUBLE)")))
    val ok = size(col("parts")) === 2 && col("key").isNotNull &&
      col("total").isNotNull
    val reason = when(size(col("parts")) < 2, lit("missing_field"))
      .otherwise(lit("bad_number"))
    val (main, error) = errorPort(parsed, ok, col("raw"), reason)
    val mainSummary = main.agg(
      count(lit(1)).as("cnt"),
      round(sum(col("total")), 2).as("sum_total"))
      .select(lit("main").as("port"), lit("parsed").as("reason"),
        col("cnt"), col("sum_total"))
    val errSummary = error.groupBy(col("reason"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("error").as("port"), col("reason"), col("cnt"),
        lit(null).cast("double").as("sum_total"))
    mainSummary.unionByName(errSummary)
      .orderBy(col("port"), col("reason"))
  }

  /** Runtime macro substitution — the reference's `${macro}` config
    * substitution analogue: a runtime config map is substituted into a
    * declarative query template BEFORE the plan is built, so the resolved
    * literals constant-fold and push down to the scan exactly like
    * hand-written predicates (verified by PlanSpec: the resolved filter
    * reaches PushedFilters). Unresolved macros fail fast at plan time.
    */
  def substituteMacros(template: String, config: Map[String, String]): String = {
    val resolved = "\\$\\{([A-Za-z0-9_.]+)\\}".r.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        config.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unresolved macro: $${${m.group(1)}}"))))
    resolved
  }

  /** op_macro_subst: a parameterized per-region revenue query whose region
    * filter, status filter, and rounding scale all arrive as `${macro}`
    * runtime config — the CDAP pattern of one pipeline artifact deployed
    * against many configs.
    */
  val opMacroSubst: Q = (s, d) => {
    val config = Map(
      "targetRegion" -> "ASIA",
      "orderStatus" -> "O",
      "roundScale" -> "2")
    val filterTemplate =
      "r_name = '${targetRegion}' AND o_orderstatus = '${orderStatus}'"
    val resolvedFilter = substituteMacros(filterTemplate, config)
    val scale = substituteMacros("${roundScale}", config).toInt
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(expr(resolvedFilter))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), scale).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** DAG fan-out — CDAP pipeline semantics where one stage's output feeds
    * MULTIPLE downstream branches: the corpus scan is persisted once and
    * two independent aggregation branches (per-language, per-source)
    * consume it, then union into one report. Without the persist each
    * branch would re-scan the source (exchange reuse does not dedup
    * sibling branches — measured in the dedup pipelines); with it, one
    * scan feeds the whole DAG — the fan-out shape that matters when the
    * shared stage is a 100 TB read + expensive parse.
    */
  val opFanoutDag: Q = (s, d) => {
    val shared = Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byLang = shared.groupBy(col("lang").as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .withColumn("branch", lit("by_lang"))
    val bySource = shared.groupBy(col("source").as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .withColumn("branch", lit("by_source"))
    val out = byLang.unionByName(bySource)
      .select(col("branch"), col("key"), col("n_docs"), col("total_chars"))
      .orderBy(col("branch"), col("key"))
      .localCheckpoint(true)
    shared.unpersist()
    out
  }

  /** Schema CONTRACT validation — the pre-flight gate every deployed
    * pipeline runs before touching data: the source's actual schema is
    * checked against the declared contract (name + type per column), with
    * missing columns and type drift reported per row. This is a pure
    * METADATA operation (parquet footer only — no data scan, instant at
    * any data size); the contract includes one deliberately-absent column
    * to exercise the failure arm.
    */
  val opSchemaContract: Q = (s, d) => {
    val contract = Seq(
      ("o_orderkey", "bigint"),
      ("o_custkey", "bigint"),
      ("o_orderstatus", "string"),
      ("o_totalprice", "double"),
      ("o_orderdate", "timestamp_ntz"), // parquet isAdjustedToUTC=false
      ("o_orderpriority", "string"),
      ("o_comment", "string")) // not present in this feed — failure arm
    val actual = Tables.orders(s, d).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    import s.implicits._
    contract.map { case (name, expected) =>
      val got = actual.get(name)
      (name, expected, got.getOrElse("<missing>"),
        got.contains(expected))
    }.toDF("col_name", "expected_type", "actual_type", "ok")
      .orderBy(col("col_name"))
  }

  val queries: Map[String, Q] = Map(
    "op_error_port" -> opErrorPort,
    "op_fanout_dag" -> opFanoutDag,
    "op_schema_contract" -> opSchemaContract,
    "op_macro_subst" -> opMacroSubst)

  val oracles: Map[String, String] = Map(
    "op_fanout_dag" ->
      """SELECT branch, key, n_docs, total_chars FROM (
        |  SELECT 'by_lang' AS branch, lang AS key, count(*) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY lang
        |  UNION ALL
        |  SELECT 'by_source', source, count(*),
        |         CAST(sum(n_chars) AS BIGINT)
        |  FROM documents GROUP BY source)
        |ORDER BY branch, key""".stripMargin,
    "op_error_port" ->
      """WITH recs AS (
        |  SELECT o_orderkey, o_totalprice,
        |   CASE WHEN o_orderkey % 97 = 0 THEN 'bad_number'
        |        WHEN o_orderkey % 89 = 0 THEN 'missing_field'
        |        ELSE 'parsed' END AS reason
        |  FROM orders)
        |SELECT port, reason, cnt, sum_total FROM (
        |  SELECT 'main' AS port, 'parsed' AS reason, count(*) AS cnt,
        |         round(sum(o_totalprice), 2) AS sum_total
        |  FROM recs WHERE reason = 'parsed'
        |  UNION ALL
        |  SELECT 'error', reason, count(*), CAST(NULL AS DOUBLE)
        |  FROM recs WHERE reason <> 'parsed' GROUP BY reason)
        |ORDER BY port, reason""".stripMargin,
    "op_schema_contract" ->
      """SELECT * FROM (VALUES
        |  ('o_comment', 'string', '<missing>', false),
        |  ('o_custkey', 'bigint', 'bigint', true),
        |  ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', true),
        |  ('o_orderkey', 'bigint', 'bigint', true),
        |  ('o_orderpriority', 'string', 'string', true),
        |  ('o_orderstatus', 'string', 'string', true),
        |  ('o_totalprice', 'double', 'double', true))
        | t(col_name, expected_type, actual_type, ok)
        |ORDER BY col_name""".stripMargin,
    "op_macro_subst" ->
      """SELECT n_name, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderstatus = 'O'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
}
