package graft.ops

import graft.SharedSpark
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextNormalizeSpec extends AnyFunSuite with SharedSpark {

  private def one(input: String, form: String): String = {
    import spark.implicits._
    Seq(input).toDF("s")
      .select(TextFunctions.normalize(col("s"), form).as("n"))
      .collect().head.getString(0)
  }

  test("NFC composes, NFD decomposes, round trip preserves content") {
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    assert(one(decomposed, "NFC") == composed)
    assert(one(composed, "NFD") == decomposed)
    assert(one(one(composed, "NFD"), "NFC") == composed)
  }

  test("NFKC folds compatibility characters") {
    assert(one("\ufb01le", "NFKC") == "file") // fi ligature
    assert(one("\u2460", "NFKC") == "1")      // circled one
  }

  test("STRIP_ACCENTS drops combining marks from either encoding") {
    assert(one("caf\u00e9 \u00e0 c\u00f4t\u00e9", "STRIP_ACCENTS") == "cafe a cote")
    assert(one("cafe\u0301", "STRIP_ACCENTS") == "cafe")
    assert(one("\u00f1o\u00f1o", "STRIP_ACCENTS") == "nono")
  }

  test("pure-ASCII input is identity under every form") {
    for (f <- graft.functions.TextNormalize.Forms)
      assert(one("plain ascii text 123!", f) == "plain ascii text 123!")
  }

  test("null in, null out; invalid form rejected at construction") {
    import spark.implicits._
    val out = Seq(Option.empty[String]).toDF("s")
      .select(TextFunctions.normalize(col("s"), "NFC").as("n")).collect()
    assert(out.head.isNullAt(0))
    intercept[IllegalArgumentException] {
      TextFunctions.normalize(col("s"), "NFX")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val inputs = Seq("caf\u00e9", "cafe\u0301", "plain", "\ufb01le \u2460", "")
    val df = inputs.toDF("s")
    for (f <- graft.functions.TextNormalize.Forms) {
      val withCodegen = df.select(TextFunctions.normalize(col("s"), f)).collect().map(_.getString(0)).toSeq
      val interpreted = inputs.map(i =>
        Option(graft.functions.TextNormalize.normalize(
          org.apache.spark.unsafe.types.UTF8String.fromString(i), f)).map(_.toString).orNull)
      assert(withCodegen == interpreted, s"form $f")
    }
  }
}
