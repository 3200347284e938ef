package graft.ops

import graft.SharedSpark
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextFunctions.htmlToText]] edge semantics. */
class HtmlExtractSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(TextFunctions.htmlToText(col("h"))).head().getString(0)

  test("non-content subtrees die with their payloads; comments too") {
    assert(extract("<p>keep</p><script>var a = '<p>not text</p>';</script>done") ==
      "keep\ndone")
    assert(extract("a<style media='x'>p{}</style>b<!-- c<p>d -->e") == "a b e")
    assert(extract("<head><title>Page</title></head><p>body</p>") == "body")
  }

  test("block boundaries become line structure; inline tags become spaces") {
    assert(extract("<h1>Title</h1><p>one</p><p>two</p>") == "Title\none\ntwo")
    assert(extract("a<br>b<br/>c") == "a\nb\nc")
    assert(extract("x <b>bold</b> y") == "x bold y")
    assert(extract("<ul><li>1</li><li>2</li></ul>after") == "1\n2\n\nafter")
  }

  test("entities decode; double-encoding survives encoded; whitespace normalizes") {
    assert(extract("Tom &amp; Jerry") == "Tom & Jerry")
    assert(extract("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
    assert(extract("&quot;q&quot; &#39;s&#39; a&nbsp;b") == "\"q\" 's' a b")
    assert(extract("  <p>  lots   of \t space  </p>  ") == "lots of space")
    assert(extract("<p>a</p>\n\n\n<p>b</p>") == "a\n\nb")
  }
}
