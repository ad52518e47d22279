package graft

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.Comparator

/** Shared per-(query, sf) scratch-dir convention for fixture-writing
  * operators: a deterministic directory under java.io.tmpdir, wiped on
  * entry so reruns are idempotent (Verify and Bench both re-invoke query
  * fns). Single implementation — Xml, Streaming and the relational
  * fixture queries all use this; a divergent copy that skips the wipe
  * would silently read stale files after a layout change.
  */
object Scratch {
  def fresh(tag: String, sfDir: String): String = {
    val sf  = Paths.get(sfDir).getFileName.toString
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_fixtures", s"${tag}_$sf")
    if (Files.exists(dir))
      Files.walk(dir).sorted(Comparator.reverseOrder[JPath]())
        .forEach(p => Files.delete(p))
    Files.createDirectories(dir)
    dir.toString
  }
}
