package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Commit-time DuckDB parity gate (round-5 verdict item #4): runs the
  * full `Verify` dump at sf0.001 and the driver-mimicking
  * `tools/compare.py` hash compare in one test, so oracle drift is caught
  * at commit time instead of round end.
  *
  * SKIPPED (canceled) in the default `sbt test` run because it shells out
  * to the driver-side python environment (duckdb/pandas), which the
  * library itself must not depend on. Run the gate explicitly:
  *
  * {{{  GRAFT_PARITY=1 sbt "testOnly graft.ParitySpec"  }}}
  */
class ParitySpec extends AnyFunSuite {
  import TestSpark._

  test("sf0.001 full-inventory DuckDB hash parity") {
    assume(sys.env.get("GRAFT_PARITY").contains("1"),
      "opt-in gate: set GRAFT_PARITY=1 to run")
    // python3 + duckdb live in the DRIVER environment; a machine without
    // them cancels (does not fail) the gate
    val probe = new ProcessBuilder("python3", "-c", "import duckdb, pandas")
      .redirectErrorStream(true).start()
    assume(probe.waitFor() == 0, "python3 + duckdb not available on this machine")

    val _ = spark // force the shared session so Verify's getOrCreate reuses it
    val out = Files.createTempDirectory("graft_parity").toString
    Verify.main(Array(sf, out))
    assert(Files.exists(Paths.get(out, "oracle_sql.json")))
    val declared = SparkEntry.oracleSql.keySet
    val dumped = {
      val st = Files.list(Paths.get(out))
      try {
        val dirs = st.iterator()
        val b = Set.newBuilder[String]
        while (dirs.hasNext) {
          val p = dirs.next()
          if (Files.isDirectory(p)) b += p.getFileName.toString
        }
        b.result()
      } finally st.close()
    }
    assert((declared -- dumped).isEmpty,
      s"queries declared but silently failed to dump: ${declared -- dumped}")

    val cmp = new ProcessBuilder(
      "python3", "tools/compare.py", sf, out)
      .directory(new java.io.File("/root/repo"))
      .redirectErrorStream(true).start()
    val log = new String(cmp.getInputStream.readAllBytes())
    val code = cmp.waitFor()
    assert(code == 0, s"compare.py reported mismatches:\n${
      log.linesIterator.filter(l => l.contains("FAIL") || l.contains("match"))
        .mkString("\n")}")
  }
}
