package graft.ops

import graft.SharedSpark
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** [[graft.functions.GraftTokens]] / [[graft.functions.WordNgrams]] must be
  * bit-identical to the declarative formulations they replace —
  * `filter(split(lower(text), "\\s+"), len > 0)` and
  * `transform(sequence(...), i => array_join(slice(toks, i, n), " "))` —
  * on random unicode inputs, or every oracle built on `tokens()` drifts.
  */
class TokenExprsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def declTokens(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private def declShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = declTokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        array_join(slice(toks, i, lit(n)), " ")))
  }

  private val alphabet =
    Seq("a", "B", "Ж", "中", "😀", "É", "ß", " ", "\t", "\n", "\r", "", "\f", ".", "#")

  private def randomText(rnd: Random, n: Int): String =
    (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("tokens ≡ filter(split(lower)) on random unicode incl. all \\s bytes") {
    val rnd = new Random(3)
    val rows = ("" +: " \t\n " +: "one" +: "  a  b  " +:
      (1 to 500).map(_ => randomText(rnd, rnd.nextInt(40)))).toDF("t")
    val diff = rows.select(
      TextFunctions.tokens(col("t")).as("got"), declTokens(col("t")).as("want"))
      .where(not(col("got") <=> col("want")))
    assert(diff.count() == 0, diff.collect().take(5).mkString("; "))
  }

  test("rawWordShingles ≡ declarative slice+join for n in 1..4") {
    val rnd = new Random(5)
    val rows = (1 to 300).map(_ => randomText(rnd, rnd.nextInt(60))).toDF("t")
    for (n <- 1 to 4) {
      val diff = rows.select(
        graft.dedup.Shingles.rawWordShingles(col("t"), n).as("got"),
        declShingles(col("t"), n).as("want"))
        .where(not(col("got") <=> col("want")))
      assert(diff.count() == 0, s"n=$n: " + diff.collect().take(5).mkString("; "))
    }
  }

  test("null text propagates; empty and whitespace-only give empty arrays") {
    val df = Seq(Option("a b"), None, Option(""), Option("   ")).toDF("t")
      .select(TextFunctions.tokens(col("t")).as("tk"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a", "b"))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getSeq[String](0).isEmpty)
    assert(rows(3).getSeq[String](0).isEmpty)
  }
}
