package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time attribution for one declared query — the round-20
  * measurement harness (guide §1: decide where the time goes before
  * touching anything). Runs the fixture once warm, once measured, and
  * prints every Spark job of the measured run with its duration and
  * call site, plus the driver-side gaps between jobs (metadata/commit/
  * planning time never shows up as a job — the gap line is where ACID
  * commit latency and footer sweeps live).
  *
  * Usage: runMain graft.JobProfile <key> [<key2> ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warm-up, same as Bench
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().count()

    final case class J(id: Int, desc: String, t0: Long, var t1: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    val order = new java.util.concurrent.CopyOnWriteArrayList[J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // The result stage's name carries the action's call site
        // ("collect at Acid.scala:1132") — the attribution that matters;
        // an explicit job description (file-listing jobs set one) wins.
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        val j = J(e.jobId, d, System.nanoTime())
        jobs.put(e.jobId, j); order.add(j): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    }
    args.foreach { key =>
      val fn = SparkEntry.queries(key)
      // warm pass (session machinery, memoized fixtures)
      fn(spark, sfDir).count(): Unit
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count(): Unit
      val t1 = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // drain listener bus
      println(f"\n=== $key: total ${(t1 - t0) / 1e9}%.3f s, " +
        s"${order.size} jobs ===")
      var prevEnd = t0
      import scala.jdk.CollectionConverters._
      order.asScala.toSeq.sortBy(_.t0).foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e9
        if (gap > 0.010)
          println(f"  [driver gap ${gap}%7.3f s]")
        val dur = if (j.t1 < 0) Double.NaN else (j.t1 - j.t0) / 1e9
        println(f"  job ${j.id}%4d ${dur}%7.3f s  ${j.desc.take(110)}")
        if (j.t1 > prevEnd) prevEnd = j.t1
      }
      val tail = (t1 - prevEnd) / 1e9
      if (tail > 0.010) println(f"  [driver tail ${tail}%7.3f s]")
    }
    graft.operators.Llm.clearCaches()
    graft.operators.Relational.dropBucketedTables()
    graft.sources.Acid.dropSqlTables(spark)
    spark.stop()
  }
}
