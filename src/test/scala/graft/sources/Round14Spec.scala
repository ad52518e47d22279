package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, Filter}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Scratch, TestSpark}

/** Round-14 pins. (1) Lexicographic pruning bounds MUST use UTF-8 binary
  * order (Spark's STRING ordering, the order statsOf's min/max stamped
  * the manifest cstats in, and the order packPrefix embeds). Java String
  * comparison is UTF-16 code-unit order, which disagrees for BMP chars
  * in [U+E000, U+FFFF] vs supplementary code points: U+E000 encodes as
  * 0xEE 0x80 0x80 (UTF-8) but compares as 0xE000 (UTF-16), while U+10000
  * encodes as 0xF0 0x90 0x80 0x80 but compares via its 0xD800 lead
  * surrogate. Pre-fix, a pushed `c = '<supplementary>'` against a file
  * whose UTF-8 min was a [U+E000,U+FFFF] string failed the Java-order
  * `bound >= min` check and PRUNED a file holding matching rows —
  * missing results, not a loose plan.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark._

  private val supp = new String(Character.toChars(0x10000)) // U+10000 "𐀀"
  private val bmpHi = "" // private-use BMP, above surrogates in UTF-16

  test("u8Cmp is UTF-8 binary order where Java order disagrees") {
    // UTF-8/code-point order: "aaa" < U+E000 < U+10000
    assert(Acid.u8Cmp("aaa", bmpHi) < 0)
    assert(Acid.u8Cmp(bmpHi, supp) < 0, "BMP U+E000 must sort BELOW U+10000 in UTF-8")
    assert(bmpHi.compareTo(supp) > 0, "Java order disagrees (the bug's precondition)")
    assert(Acid.u8Cmp(supp, supp) === 0)
  }

  test("cstatsBounds selects IN/narrow bounds in UTF-8 order, not UTF-16") {
    val got = AcidSql.cstatsBounds(Array[Filter](In("c", Array("aaa", bmpHi, supp))))
    assert(got === Map("c" -> (Some("aaa"), Some(supp))),
      s"IN envelope must be the UTF-8 min/max: $got")
    // two lower bounds: the binding one is the UTF-8 max (supp), not the
    // UTF-16 max (bmpHi)
    val got2 = AcidSql.cstatsBounds(Array[Filter](
      GreaterThanOrEqual("c", bmpHi), GreaterThanOrEqual("c", supp)))
    assert(got2 === Map("c" -> (Some(supp), None)),
      s"narrow must keep the UTF-8-max lower bound: $got2")
  }

  test("supplementary-plane equality never prunes its file (V2 + library paths)") {
    import spark.implicits._
    val root = Scratch.fresh("r14_u8_prune", sf)
    val dir = s"$root/t"
    // two files by key range: file A (k<10) holds bmpHi and supp values —
    // stamped cstats (UTF-8): min=bmpHi, max=supp; file B (k>=10) holds
    // plain ASCII and must be pruned by the same probe.
    val rows = (0L until 20L).map { k =>
      val c = if (k >= 10) f"zz$k%03d" else if (k == 1) supp else bmpHi + k
      (k, c)
    }
    Acid.create(spark, dir, rows.toDF("k", "c"), "k", 2)
    // stamped stats really are UTF-8-ordered with supp as the max
    val m = Acid.readManifest(dir, Acid.latestVersion(dir))
    val fA = m.files.minBy(_.minKey)
    val csA = fA.cstats.find(_._1 == "c")
    assert(csA.exists { case (_, mn, mx) => mx == supp && mn.startsWith(bmpHi) },
      s"file A cstats must be UTF-8 min/max: $csA")

    // V2 path: pushed EqualTo through cstats pruning
    val q = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("c") === supp)
    assert(q.count() === 1L, "pre-fix this returned 0: file A wrongly pruned")
    val (scanned, total) = AcidSql.lastScanFor(dir)
    assert(total === 2 && scanned === 1,
      s"file B (ASCII) must still prune: $scanned/$total")

    // library path: scanColRange point probe on the same value
    val (df2, sc2, tot2) = Acid.scanColRange(spark, dir, "c", supp, supp)
    assert(df2.count() === 1L, "scanColRange pre-fix pruned the matching file")
    assert(tot2 === 2 && sc2 === 1, s"scanColRange pruning: $sc2/$tot2")

    // and an IN mixing the two regimes keeps the file via the UTF-8 max
    val q3 = spark.read.format("graft-acid-sql").load(dir)
      .filter(col("c").isin(supp, "zz015"))
    assert(q3.count() === 2L)
  }
}
