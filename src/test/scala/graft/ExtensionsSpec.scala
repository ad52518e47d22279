package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook: custom expressions resolve as SQL
  * functions in any session configured with graft.GraftExtensions.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("vec_dot resolves in SQL and computes the dot product") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("word_shingles3 resolves in SQL, distinct and ordered") {
    val r = spark.sql(
      "SELECT word_shingles3('a b c d a b c d') AS sh")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("word_shingles3 returns empty for short docs") {
    assert(spark.sql("SELECT size(word_shingles3('a b')) AS n")
      .collect()(0).getInt(0) == 0)
  }
}
