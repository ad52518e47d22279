package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws — SURVEY §5.3. Generators are ScalaCheck with a fixed
  * seed (deterministic CI) and each law is checked over one generated
  * DataFrame rather than per-sample Spark jobs.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[T](g: Gen[T]): T =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  // Strings exercising XML/JSON escaping: letters plus markup specials.
  // Bracketed by letters: the XML datasource trims surrounding whitespace
  // and reads empty elements as null, so only interior-whitespace, non-empty
  // strings are round-trippable by design.
  private val trickyString: Gen[String] = for {
    head <- Gen.alphaNumChar
    mid  <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
              Gen.oneOf('&', '<', '>', '"', '\'', ' ')))
    last <- Gen.alphaNumChar
  } yield (head +: mid.take(18) :+ last).mkString

  private val rowGen: Gen[(Long, String, Double, Boolean)] = for {
    k <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    s <- trickyString
    d <- Gen.choose(-1e6, 1e6)
    b <- Gen.oneOf(true, false)
  } yield (k, s, d, b)

  test("to_xml then from_xml is identity on 200 generated structs") {
    import spark.implicits._
    val rows = sample(Gen.listOfN(200, rowGen)).zipWithIndex
      .map { case ((k, s, d, b), i) => (i.toLong, k, s, d, b) }
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType)))
    val df = rows.toDF("id", "k", "name", "score", "flag")
    val back = df
      .withColumn("x", to_xml(struct(col("k"), col("name"), col("score"), col("flag"))))
      .withColumn("b", from_xml(col("x"), schema))
      .select(col("id"), col("b.k").as("k"), col("b.name").as("name"),
        col("b.score").as("score"), col("b.flag").as("flag"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("to_json then from_json is identity on 200 generated structs") {
    import spark.implicits._
    val rows = sample(Gen.listOfN(200, rowGen)).zipWithIndex
      .map { case ((k, s, d, b), i) => (i.toLong, k, s, d, b) }
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType)))
    val df = rows.toDF("id", "k", "name", "score", "flag")
    val back = df
      .withColumn("j", to_json(struct(col("k"), col("name"), col("score"), col("flag"))))
      .withColumn("b", from_json(col("j"), schema))
      .select(col("id"), col("b.k").as("k"), col("b.name").as("name"),
        col("b.score").as("score"), col("b.flag").as("flag"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits._
    // Texts drawn from a small pool so duplicates are guaranteed.
    val texts = sample(Gen.listOfN(300,
      Gen.oneOf("alpha beta", "Alpha  Beta", "gamma", " gamma ", "delta e f")))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def dedup(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .groupBy("h").agg(min("doc_id").as("doc_id"), first("text").as("text"))
      .select("doc_id", "text", "h")
    val once  = dedup(df).orderBy("doc_id").collect().toSeq
    val twice = dedup(dedup(df)).orderBy("doc_id").collect().toSeq
    assert(once.map(r => (r.getLong(0), r.getString(2))) ==
           twice.map(r => (r.getLong(0), r.getString(2))))
  }

  test("window top-k per group equals per-group sort-take in plain Scala") {
    import spark.implicits._
    val pairs = sample(Gen.listOfN(500, for {
      g <- Gen.choose(0, 9)
      v <- Gen.choose(0, 1000000)
    } yield (g, v)))
    val df = pairs.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val spark_topk = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("g", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val scala_topk = pairs.zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).map(r => (g, r._3))
      }.toSet
    assert(spark_topk == scala_topk)
  }

  test("chunking law: stride-aligned chunk prefixes reassemble the document") {
    // For every doc: chunk i starts at i*stride, spans `size` chars, and
    // concatenating the first `stride` chars of each chunk (full last
    // chunk) reproduces the document exactly — i.e. the overlap scheme
    // loses nothing and duplicates exactly `overlap` chars per boundary.
    val docs = SparkEntry.queries("llm_chunk_text")(spark, sf)
    val byDoc = docs.select("doc_id", "chunk_idx", "off", "chunk_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    byDoc.foreach { case (id, chunks) =>
      val n = texts(id)
      val sorted = chunks.sortBy(_._2)
      // offsets are exactly 0, 400, 800, ...
      sorted.zipWithIndex.foreach { case ((_, idx, off, _), i) =>
        assert(idx == i && off == 400L * i, s"doc $id chunk $i misaligned")
      }
      // coverage: last chunk reaches the end; reassembly length == n
      val (_, _, lastOff, lastLen) = sorted.last
      assert(lastOff + lastLen == n, s"doc $id tail uncovered")
      val reassembled = sorted.init.map(_ => 400L).sum + lastLen
      assert(reassembled == n, s"doc $id reassembly ${reassembled} != $n")
    }
  }

  test("packing law: bins partition the corpus tokens exactly, in order") {
    val bins = SparkEntry.queries("llm_pack_sequences")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalBinTokens = bins.map(_._4).sum
    val totalDocs = bins.map(_._3).sum
    val exp = graft.Tables.documents(spark, sf)
      .agg(sum(ceil(col("n_chars") / 4.0).cast("long")), count(lit(1)))
      .collect()(0)
    assert(totalBinTokens == exp.getLong(0), "token mass not conserved")
    assert(totalDocs == exp.getLong(1), "doc count not conserved")
    // Bin ids start at 0, never exceed the token mass, and are unique per
    // lang. NOT asserted dense: a document longer than one context window
    // legitimately skips bins (its cumsum jumps more than ctx).
    bins.groupBy(_._1).foreach { case (lang, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids.distinct.length == ids.length, s"$lang duplicate bin ids")
      assert(ids.head == 0L, s"$lang first bin not 0")
      val langTokens = bs.map(_._4).sum
      assert(ids.last <= langTokens / 4096, s"$lang bin id beyond token mass")
    }
  }

  test("stats-bound truncation law: min <= s <= max under UTF-8 order, bounded size") {
    import graft.sources.Acid
    // code points across every regime the ordering bugs lived in: ASCII,
    // BMP low, BMP above the surrogate gap, supplementary, and the exact
    // boundary values (U+D7FF, U+E000, U+FFFD, U+10000, U+10FFFF)
    val cp: Gen[Int] = Gen.frequency(
      4 -> Gen.choose(0x20, 0x7E),
      2 -> Gen.choose(0xA0, 0x2FFF),
      2 -> Gen.choose(0xE000, 0xFFFD),
      2 -> Gen.choose(0x10000, 0x10FFFF),
      1 -> Gen.oneOf(0xD7FF, 0xE000, 0xFFFD, 0x10000, 0x10FFFF))
    val str: Gen[String] = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, cp).map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val samples = sample(Gen.listOfN(500, str))
    samples.foreach { s =>
      val mn = Acid.truncBoundMin(s); val mx = Acid.truncBoundMax(s)
      assert(Acid.u8Cmp(mn, s) <= 0, s"min bound must be <= value: ${dbg(s)}")
      assert(Acid.u8Cmp(s, mx) <= 0, s"max bound must be >= value: ${dbg(s)}")
      assert(mn.codePointCount(0, mn.length) <= Acid.CStatsBoundLen)
      // only the all-U+10FFFF-prefix fallback may exceed the budget
      assert(mx == s || mx.codePointCount(0, mx.length) <= Acid.CStatsBoundLen,
        s"max bound must truncate: ${dbg(s)} -> ${dbg(mx)}")
      assert(mn.getBytes("UTF-8").length <= 4 * Acid.CStatsBoundLen)
    }
    // transitivity corollary: any probe v inside a file's true [a, b]
    // range stays inside the truncated stamp [truncMin(a), truncMax(b)]
    val u8 = Ordering.fromLessThan[String](Acid.u8Cmp(_, _) < 0)
    samples.grouped(3).filter(_.size == 3).foreach { g =>
      val Seq(a, v, b) = g.sorted(u8)
      assert(Acid.u8Cmp(Acid.truncBoundMin(a), v) <= 0 &&
        Acid.u8Cmp(v, Acid.truncBoundMax(b)) <= 0,
        s"probe inside [a,b] escaped the truncated stamp: ${g.map(dbg)}")
    }
  }

  /** Round-16 exact-filter-claim soundness law: whenever `exactInterval`
    * decodes a pushed conjunction to Some((lo, hi)), membership in
    * [lo, hi] must EQUAL direct evaluation of the conjunction at every
    * probe point — an unsound decode here returns wrong rows (the claim
    * removes Spark's residual re-filter), not merely an unpruned plan.
    * 300 generated conjunctions of Eq/Gt/Ge/Lt/Le/IsNotNull/And over one
    * column, probed at every literal and its ±1 neighbours. */
  test("exactInterval decode equals direct evaluation on 300 generated conjunctions") {
    import org.apache.spark.sql.sources._
    val lit: Gen[Long] = Gen.oneOf(
      Gen.choose(-100L, 100L),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
        Long.MaxValue - 1, Long.MaxValue))
    def leaf(v: Long): Gen[Filter] = Gen.oneOf[Filter](
      EqualTo("c", v), GreaterThan("c", v), GreaterThanOrEqual("c", v),
      LessThan("c", v), LessThanOrEqual("c", v), IsNotNull("c"))
    val conj: Gen[List[Filter]] = for {
      n  <- Gen.choose(1, 4)
      vs <- Gen.listOfN(n, lit)
      fs <- Gen.sequence[List[Filter], Filter](vs.map(leaf))
      anded <- Gen.oneOf(true, false)
    } yield if (anded && fs.size >= 2)
      List(fs.reduce[Filter]((a, b) => And(a, b))) else fs
    def holds(f: Filter, x: Long): Boolean = f match {
      case EqualTo(_, v: Long)            => x == v
      case GreaterThan(_, v: Long)        => x > v
      case GreaterThanOrEqual(_, v: Long) => x >= v
      case LessThan(_, v: Long)           => x < v
      case LessThanOrEqual(_, v: Long)    => x <= v
      case IsNotNull(_)                   => true
      case And(l, r)                      => holds(l, x) && holds(r, x)
      case other => fail(s"unexpected shape $other")
    }
    def literalsOf(f: Filter): Seq[Long] = f match {
      case EqualTo(_, v: Long)            => Seq(v)
      case GreaterThan(_, v: Long)        => Seq(v)
      case GreaterThanOrEqual(_, v: Long) => Seq(v)
      case LessThan(_, v: Long)           => Seq(v)
      case LessThanOrEqual(_, v: Long)    => Seq(v)
      case And(l, r)                      => literalsOf(l) ++ literalsOf(r)
      case _                              => Seq.empty
    }
    val cases = sample(Gen.listOfN(300, conj))
    cases.foreach { fs =>
      sources.AcidSql.exactInterval(fs, "c", time = false).foreach {
        case (lo, hi) =>
          val probes = (fs.flatMap(literalsOf).flatMap(v =>
            Seq(v - 1, v, v + 1)) ++
            Seq(lo - 1, lo, hi, hi + 1, Long.MinValue, 0L, Long.MaxValue))
            .distinct
          probes.foreach { x =>
            val direct = fs.forall(holds(_, x))
            val decoded = lo <= x && x <= hi
            assert(direct == decoded,
              s"decode [$lo,$hi] disagrees with $fs at x=$x " +
                s"(direct=$direct decoded=$decoded)")
          }
      }
    }
  }

  private def dbg(s: String): String =
    s.codePoints().toArray.map(c => f"U+$c%04X").mkString("[", " ", "]")

  test("exactSet decode equals direct evaluation on 300 generated conjunctions") {
    import org.apache.spark.sql.sources._
    val lit: Gen[Long] = Gen.oneOf(
      Gen.choose(-20L, 20L),
      Gen.oneOf(Long.MinValue, -1L, 0L, 1L, Long.MaxValue))
    def leaf: Gen[Filter] = Gen.oneOf[Gen[Filter]](
      Gen.nonEmptyListOf(lit).map(vs =>
        In("c", vs.take(64).map(_.asInstanceOf[Any]).toArray): Filter),
      lit.map(v => EqualTo("c", v): Filter),
      Gen.const(IsNotNull("c"): Filter)).flatMap(identity)
    val conj: Gen[List[Filter]] = for {
      n  <- Gen.choose(1, 3)
      fs <- Gen.listOfN(n, leaf)
      anded <- Gen.oneOf(true, false)
    } yield if (anded && fs.size >= 2)
      List(fs.reduce[Filter]((a, b) => And(a, b))) else fs
    def holds(f: Filter, x: Long): Boolean = f match {
      case In(_, vs)           => vs.exists(_.asInstanceOf[Long] == x)
      case EqualTo(_, v: Long) => x == v
      case IsNotNull(_)        => true
      case And(l, r)           => holds(l, x) && holds(r, x)
      case other               => fail(s"unexpected shape $other")
    }
    def literalsOf(f: Filter): Seq[Long] = f match {
      case In(_, vs)           => vs.toSeq.map(_.asInstanceOf[Long])
      case EqualTo(_, v: Long) => Seq(v)
      case And(l, r)           => literalsOf(l) ++ literalsOf(r)
      case _                   => Seq.empty
    }
    val asLong: Any => Option[Long] = { case l: Long => Some(l); case _ => None }
    var decodedCount = 0
    sample(Gen.listOfN(300, conj)).foreach { fs =>
      sources.AcidSql.exactSet(fs, "c", asLong).foreach { s =>
        decodedCount += 1
        val probes = (fs.flatMap(literalsOf).flatMap(v => Seq(v - 1, v, v + 1))
          ++ Seq(Long.MinValue, 0L, Long.MaxValue)).distinct
        probes.foreach { x =>
          val direct = fs.forall(holds(_, x))
          assert(direct == s.contains(x),
            s"exactSet($fs) = $s disagrees with direct evaluation at $x")
        }
      }
    }
    assert(decodedCount > 50, s"law must exercise real decodes: $decodedCount")
  }

  /** Round-17 union-of-cells soundness law: whenever `exactCellsWith`
    * decodes a conjunction-of-Or-trees to Some(cells), membership in the
    * cell union must EQUAL direct evaluation at every probe point, the
    * cells must be DISJOINT and SORTED (the aligned DELETE's allIn/
    * noneIn checks assume both), and a wrong decode DELETES wrong rows.
    * Generated: Or-trees of interval conjunctions over one column. */
  test("exactCellsWith decode equals direct evaluation on 300 generated predicates") {
    import org.apache.spark.sql.sources._
    val lit: Gen[Long] = Gen.oneOf(
      Gen.choose(-50L, 50L),
      Gen.oneOf(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
        Long.MaxValue - 1, Long.MaxValue))
    def leaf(v: Long): Gen[Filter] = Gen.oneOf[Filter](
      EqualTo("c", v), GreaterThan("c", v), GreaterThanOrEqual("c", v),
      LessThan("c", v), LessThanOrEqual("c", v), IsNotNull("c"))
    val branch: Gen[Filter] = for {
      n  <- Gen.choose(1, 3)
      vs <- Gen.listOfN(n, lit)
      fs <- Gen.sequence[List[Filter], Filter](vs.map(leaf))
    } yield fs.reduce[Filter]((a, b) => And(a, b))
    val orTree: Gen[Filter] = for {
      n  <- Gen.choose(1, 4)
      bs <- Gen.listOfN(n, branch)
    } yield bs.reduce[Filter]((a, b) => Or(a, b))
    val conj: Gen[List[Filter]] =
      Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, orTree))
    def holds(f: Filter, x: Long): Boolean = f match {
      case EqualTo(_, v: Long)            => x == v
      case GreaterThan(_, v: Long)        => x > v
      case GreaterThanOrEqual(_, v: Long) => x >= v
      case LessThan(_, v: Long)           => x < v
      case LessThanOrEqual(_, v: Long)    => x <= v
      case IsNotNull(_)                   => true
      case And(l, r)                      => holds(l, x) && holds(r, x)
      case Or(l, r)                       => holds(l, x) || holds(r, x)
      case other => fail(s"unexpected shape $other")
    }
    def literalsOf(f: Filter): Seq[Long] = f match {
      case EqualTo(_, v: Long)            => Seq(v)
      case GreaterThan(_, v: Long)        => Seq(v)
      case GreaterThanOrEqual(_, v: Long) => Seq(v)
      case LessThan(_, v: Long)           => Seq(v)
      case LessThanOrEqual(_, v: Long)    => Seq(v)
      case And(l, r)                      => literalsOf(l) ++ literalsOf(r)
      case Or(l, r)                       => literalsOf(l) ++ literalsOf(r)
      case _                              => Seq.empty
    }
    val asLong: Any => Option[Long] = { case l: Long => Some(l); case _ => None }
    var decodedCount = 0
    sample(Gen.listOfN(300, conj)).foreach { fs =>
      sources.AcidSql.exactCellsWith(fs, "c", asLong).foreach { cells =>
        decodedCount += 1
        // structure: sorted, disjoint, non-adjacent (normalize merged)
        cells.sliding(2).foreach {
          case Seq((_, ah), (bl, _)) =>
            assert(ah < Long.MaxValue && ah + 1 < bl,
              s"cells must be sorted, disjoint, non-adjacent: $cells")
          case _ =>
        }
        val probes = (fs.flatMap(literalsOf).flatMap(v =>
          Seq(v - 1, v, v + 1)) ++
          cells.flatMap { case (lo, hi) => Seq(lo - 1, lo, hi, hi + 1) } ++
          Seq(Long.MinValue, 0L, Long.MaxValue)).distinct
        probes.foreach { x =>
          val direct = fs.forall(holds(_, x))
          val decoded = cells.exists { case (lo, hi) => lo <= x && x <= hi }
          assert(direct == decoded,
            s"exactCellsWith($fs) = $cells disagrees at x=$x " +
              s"(direct=$direct decoded=$decoded)")
        }
      }
    }
    assert(decodedCount > 50, s"law must exercise real decodes: $decodedCount")
  }

  test("sortable-bits law: double order, involution, nextUp adjacency") {
    import graft.sources.Acid.{dblSortBits, dblFromSortBits}
    val gen: Gen[Double] = Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(Double.MinValue, Double.MaxValue),
      Gen.oneOf(0.0d, -0.0d, Double.MinPositiveValue,
        -Double.MinPositiveValue, 1e-310, -1e-310,
        Double.PositiveInfinity, Double.NegativeInfinity))
    val vals = sample(Gen.listOfN(400, gen))
    // order: signed-long comparison of encodings equals value comparison
    // after zero-normalization (Spark's semantics equate the zeros)
    for (a <- vals; b <- vals.take(60)) {
      val c = java.lang.Double.compare(a + 0.0d, b + 0.0d)
      val s = java.lang.Long.compare(dblSortBits(a), dblSortBits(b))
      assert(s == c, s"order mismatch: $a vs $b")
    }
    for (v <- vals) {
      // involution: decode returns the exact normalized value, bitwise
      assert(java.lang.Double.doubleToLongBits(dblFromSortBits(dblSortBits(v)))
        === java.lang.Double.doubleToLongBits(v + 0.0d), s"involution: $v")
      // adjacency: +1 in the encoded domain is exactly nextUp, so the
      // strict-bound adjustment (`c > v` -> lo = enc(v)+1) is exact
      if (!v.isInfinite)
        assert(dblFromSortBits(dblSortBits(v) + 1L) === Math.nextUp(v + 0.0d),
          s"adjacency: $v")
    }
  }
}
