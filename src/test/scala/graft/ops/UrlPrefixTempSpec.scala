package graft.ops

import graft.SharedSpark
import graft.dedup.ExactDedup
import graft.sampling.Sampling
import graft.text.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round's new pipeline operators: URL canonicalization
  * ([[UrlOps]]), truncation-prefix dedup
  * ([[ExactDedup.dropPrefixDuplicates]]), and data-derived temperature
  * upsampling ([[Sampling.temperatureUpsample]]).
  */
class UrlPrefixTempSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalize(col("u")).as("c"))
      .head().getString(0)

  test("UrlOps.canonicalize normalizes case, ports, tracking params, fragments, slashes") {
    assert(canon("HTTPS://Shop.Example.COM:443/items/5/?utm_source=x&ref=a#frag") ==
      "https://shop.example.com/items/5?ref=a")
    assert(canon("http://A.B:80/p/") == "http://a.b/p")
    // tracking params in the middle and at the end; gclid/fbclid too
    assert(canon("https://x.y/p?a=1&utm_campaign=c&b=2&gclid=z") ==
      "https://x.y/p?a=1&b=2")
    // path case is preserved, query-only URL keeps its params
    assert(canon("https://x.y/CaseSensitive?Q=V") == "https://x.y/CaseSensitive?Q=V")
    // all params tracked -> bare path, no dangling '?'
    assert(canon("https://x.y/p?utm_source=a&utm_medium=b") == "https://x.y/p")
    // root URL with trailing slash
    assert(canon("https://x.y/") == "https://x.y")
    assert(canon("https://x.y/#top") == "https://x.y")
    // default ports are scheme-specific: http on 443 is NOT default
    assert(canon("http://h:443/x") == "http://h:443/x")
    assert(canon("https://h:80/x") == "https://h:80/x")
    // a trailing slash inside a query VALUE is part of the value
    assert(canon("https://x.y/p?next=/home/") == "https://x.y/p?next=/home/")
  }

  test("UrlOps.host extracts the lowercased host") {
    val h = Seq("HTTPS://Shop.Example.COM:443/a?b=1").toDF("u")
      .select(UrlOps.host(col("u"))).head().getString(0)
    assert(h == "shop.example.com")
  }

  test("dropPrefixDuplicates keeps one survivor per first-k-token prefix") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),             // full page
      (2L, "alpha beta gamma"),                   // same page, truncated INSIDE prefix k=3
      (3L, "alpha beta gamma epsilon zeta"),      // same prefix, longer tail
      (4L, "totally different words here"),
      (5L, "Alpha  Beta   GAMMA")                 // case/whitespace drift
    ).toDF("doc_id", "text")
    val kept = ExactDedup.dropPrefixDuplicates(docs, "text", "doc_id", prefixTokens = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L)) // 2,3,5 collapse onto 1's prefix
    // with a prefix longer than every doc, it degrades to exact-normalized dedup
    val keptAll = ExactDedup.dropPrefixDuplicates(docs, "text", "doc_id", prefixTokens = 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptAll == Seq(1L, 2L, 3L, 4L)) // only 5 (≡ 2 after normalization) drops
  }

  test("temperatureUpsample: factors are sqrt(cmax/c), epochs deterministic, largest source unchanged") {
    // src big: 64 rows, src mid: 16, src rare: 4 -> factors 1, 2, 4
    val df = ((1 to 64).map(i => (s"b$i", "big")) ++
      (1 to 16).map(i => (s"m$i", "mid")) ++
      (1 to 4).map(i => (s"r$i", "rare"))).toDF("k", "src")
    val out = Sampling.temperatureUpsample(df, "src", "k", seed = "t")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // exact integer factors -> no fractional epoch, exact multiplication
    assert(counts == Map("big" -> 64L, "mid" -> 32L, "rare" -> 16L))
    // epochs are 1..factor per key
    val epochs = out.filter(col("src") === "rare").groupBy("k")
      .agg(collect_set("__epoch").as("e")).select("e")
      .as[Seq[Int]].collect()
    assert(epochs.forall(_.sorted == Seq(1, 2, 3, 4)))
    // deterministic: a second run is identical
    val again = Sampling.temperatureUpsample(df, "src", "k", seed = "t")
    assert(out.select("k", "src", "__epoch").except(
      again.select("k", "src", "__epoch")).isEmpty)
    // fractional factor: 9 vs 64 -> sqrt(64/9) ≈ 2.67: every key gets 2
    // epochs, ~2/3 of keys (by the deterministic bucket) get a third
    val df2 = ((1 to 64).map(i => (s"b$i", "big")) ++
      (1 to 9).map(i => (s"n$i", "nine"))).toDF("k", "src")
    val nine = Sampling.temperatureUpsample(df2, "src", "k", seed = "t2")
      .filter(col("src") === "nine").groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(nine.values.forall(c => c == 2L || c == 3L))
    assert(nine.values.sum >= 18L && nine.values.sum <= 27L)
  }
}
