package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // ScaleGen probe fixtures drop the events TIMESTAMP(NANOS) logical type
    // (ts becomes plain INT64), so the DuckDB oracles would silently
    // diverge from Spark there — refuse rather than produce a wrong gate.
    require(!Files.exists(Paths.get(sfDir, "PROBE_ONLY")),
      s"$sfDir is a ScaleGen probe-only fixture (PROBE_ONLY marker present);" +
        " the correctness gate must run against driver-generated testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // When a caller (ParitySpec) already holds a session, getOrCreate
    // reuses it — stopping it on the way out would kill every suite that
    // runs after the gate in the same JVM. Only stop what we created.
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Precision canary (round-7 postmortem): the driver has shipped events.ts
    // at both ns and µs parquet precision; log what this run actually sees so
    // a future precision flip is visible in the gate output, not silent.
    System.err.println(
      s"[verify] events.ts footer type: ${Tables.eventsTsType(spark, sfDir)}")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated key filter for local iteration (same contract
    // as Bench); the driver sets no filter and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Teardown (same contract as Bench): release memoized pipelines and
    // bucketed fixture tables so the gate run leaves no persisted blocks
    // or catalog entries behind.
    graft.operators.Llm.clearCaches()
    graft.operators.Relational.dropBucketedTables()
    graft.sources.Acid.dropSqlTables(spark)
    if (!preExisting) spark.stop()
  }
}
