package graft.ops

import graft.SharedSpark
import graft.dedup.{MinHashLSH, Shingles}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The native MinHash kernels must be bit-identical to the declarative
  * formulations they replace — the DuckDB oracles replay that exact math.
  */
class MinHashExprsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def randTokens(rnd: Random, n: Int): Seq[String] =
    (1 to n).map(_ => Seq("alpha", "beta", "γάμμα", "δ", "e😀", "zz")(rnd.nextInt(6)))

  private lazy val toksDf = {
    val rnd = new Random(13)
    (Seq.empty[String] +: Seq("one") +: (1 to 200).map(_ => randTokens(rnd, rnd.nextInt(12))))
      .toDF("tk")
  }

  test("TokenHashes32 ≡ transform(baseHash) (md5 first-8-hex)") {
    val diff = toksDf.select(
      graft.text.TextFunctions.tokenHashes(col("tk")).as("got"),
      transform(col("tk"), t => MinHashLSH.baseHash(t)).as("want"))
      .where(not(col("got") <=> col("want")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("TokenHashesXx40 ≡ transform(pmod(xxhash64, 2^40))") {
    val got = toksDf.select(GraftBridge.column(graft.functions.TokenHashesXx40(
      GraftBridge.convertedExpression(col("tk")))).as("got"),
      transform(col("tk"), t => pmod(xxhash64(t), lit(1L << 40))).as("want"))
      .where(not(col("got") <=> col("want")))
    assert(got.count() == 0, got.collect().take(3).mkString("; "))
  }

  test("shingleHashes (native rolling combine) ≡ combinedShingleHashes for n in 1..4") {
    for (n <- 1 to 4) {
      val diff = toksDf.select(
        MinHashLSH.shingleHashes(col("tk"), n).as("got"),
        Shingles.combinedShingleHashes(col("tk"), n, MinHashLSH.baseHash,
          MinHashLSH.CombineK, Some(MinHashLSH.CombineMod)).as("want"))
        .where(not(col("got") <=> col("want")))
      assert(diff.count() == 0, s"n=$n: " + diff.collect().take(3).mkString("; "))
    }
  }

  test("unreduced xx40 combine (mod=0) ≡ combinedShingleHashes with no finalMod") {
    val diff = toksDf.select(
      GraftBridge.column(graft.functions.RollingHashNgrams(
        graft.functions.TokenHashesXx40(GraftBridge.convertedExpression(col("tk"))),
        3, 1L << 11, 0L)).as("got"),
      Shingles.combinedShingleHashes(col("tk"), 3,
        t => pmod(xxhash64(t), lit(1L << 40)), 1L << 11, None).as("want"))
      .where(not(col("got") <=> col("want")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("MinHashSigs signature columns ≡ k array_min(transform) columns") {
    val k = 16
    val docs = toksDf.where(size(col("tk")) >= 3)
      .select(monotonically_increasing_id().as("id"), col("tk"))
      .select(col("id"), MinHashLSH.shingleHashes(col("tk"), 3).as("hs"))
      .persist()
    val wantCols = MinHashLSH.hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), h => pmod(h * a + b, lit(MinHashLSH.Prime)))).as(s"w_$i")
    }
    val gotArr = GraftBridge.column(graft.functions.MinHashSigs(
      GraftBridge.convertedExpression(col("hs")), k))
    val both = docs.select((col("id") +: gotArr.as("g") +: wantCols): _*)
    val mismatch = both.where(
      (0 until k).map(i => not(element_at(col("g"), i + 1) <=> col(s"w_$i"))).reduce(_ || _))
    assert(mismatch.count() == 0, mismatch.collect().take(3).mkString("; "))
    docs.unpersist()
  }
}
