package graft.ops

import graft.SharedSpark
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** [[graft.functions.EditDistanceWithin]] ≡ `levenshtein(a,b) <= k ?
  * levenshtein(a,b) : -1` — differential against Spark's built-in over
  * random near/far string pairs, plus the band/strip edge cases.
  */
class EditDistanceWithinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def check(pairs: Seq[(String, String)], k: Int): Unit = {
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        TextFunctions.editDistanceWithin(col("a"), col("b"), k).as("got"),
        levenshtein(col("a"), col("b")).as("full"))
    df.collect().foreach { r =>
      val expected = if (r.getInt(3) <= k) r.getInt(3) else -1
      assert(r.getInt(2) == expected,
        s"(${r.getString(0)}, ${r.getString(1)}) k=$k: got ${r.getInt(2)}, full ${r.getInt(3)}")
    }
  }

  test("edge cases: empty, equal, prefix-only, suffix-only, over-threshold") {
    check(Seq(
      ("", ""), ("", "ab"), ("abc", ""), ("same", "same"),
      ("Customer#000000001", "Customer#000000002"),
      ("Customer#000000001", "Customer#000001100"),
      ("abcdef", "abXdef"), ("abcdef", "Xbcdef"), ("abcdef", "abcdeX"),
      ("abc", "abcde"), ("abcde", "abc"), ("abc", "xyz"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      ("aaaa", "aaaaaa"), ("ababab", "bababa")), 2)
  }

  test("thresholds 0..4 agree with the built-in on random digit-tail keys") {
    val rnd = new Random(7)
    val pairs = (1 to 400).map { _ =>
      val base = f"Key#${rnd.nextInt(100)}%06d"
      val mutate = base.toCharArray
      (0 until rnd.nextInt(4)).foreach { _ =>
        mutate(rnd.nextInt(mutate.length)) = ('0' + rnd.nextInt(10)).toChar
      }
      (base, new String(mutate))
    }
    for (k <- 0 to 4) check(pairs, k)
  }

  test("random unicode strings (code-point edits, incl. astral plane)") {
    val rnd = new Random(11)
    val alphabet = "abé中😀" // ascii, accented, CJK, emoji (surrogate pair)
    def rs(n: Int): String = {
      val cps = alphabet.codePoints().toArray
      (1 to n).map(_ => new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
    }
    val pairs = (1 to 300).map(_ => (rs(rnd.nextInt(8)), rs(rnd.nextInt(8))))
    for (k <- Seq(1, 3)) check(pairs, k)
  }

  test("null inputs yield null") {
    val r = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(TextFunctions.editDistanceWithin(col("a"), col("b"), 2)).head()
    assert(r.isNullAt(0))
  }
}
