package graft.ops

import graft.SharedSpark
import graft.text.{SearchIndex, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** [[SearchIndex]] — persisted inverted index: incremental adds must make
  * search equal the scan-everything [[TextFunctions.bm25Rank]] bit for
  * bit; retraction and reload preserve that; queries prune to their
  * terms' buckets.
  */
class SearchIndexSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def canon(df: DataFrame): Seq[(Long, Double, Long)] =
    df.select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  private val docsAll = Seq(
    1L -> "spark shuffle join spark agg window",
    2L -> "join merge sort shuffle shuffle shuffle",
    3L -> "window frame range window partition",
    4L -> "hash agg partial agg merge",
    5L -> "spark window spark window spark",
    6L -> "",
    7L -> "totally unrelated words only")

  test("two-wave incremental index ≡ one-shot bm25Rank; retract; reload") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    val idx = SearchIndex.create(spark, wh, "c1", termBuckets = 4)
    val (w1, w2) = docsAll.splitAt(4)
    assert(idx.addBatch(corpus(w1: _*)) == 4L)
    assert(idx.addBatch(corpus(w2: _*)) == 3L)
    // re-adding an indexed doc is a no-op (immutable-doc contract)
    assert(idx.addBatch(corpus(w1.head)) == 0L)

    val q = Seq("spark", "shuffle", "window")
    val expected = canon(TextFunctions.bm25Rank(
      corpus(docsAll: _*), "doc_id", "text", q, topK = 5))
    assert(canon(idx.search(q, topK = 5)) == expected, "index search diverged from scan")

    // retraction: scores equal a scan over the surviving corpus
    idx.removeDocs(Seq(2L, 5L))
    val afterRemove = canon(TextFunctions.bm25Rank(
      corpus(docsAll.filterNot(d => d._1 == 2L || d._1 == 5L): _*),
      "doc_id", "text", q, topK = 5))
    assert(canon(idx.search(q, topK = 5)) == afterRemove, "retraction diverged")

    val re = SearchIndex.load(spark, wh, "c1").get
    assert(canon(re.search(q, topK = 5)) == afterRemove, "reload diverged")
  }

  test("a query reads only its terms' bucket partitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sidx2").toString
    val idx = SearchIndex.create(spark, wh, "c2", termBuckets = 8)
    idx.addBatch(corpus(docsAll: _*))
    val allFiles = idx.postings.read().inputFiles.toSet
    val hit = idx.search(Seq("spark"), topK = 3).count() // force a plan
    assert(hit > 0)
    // the pruned scan underlying a 1-term query touches a strict subset
    // of the postings file groups (8 buckets, ~7 distinct terms)
    val pruned = idx.postings.readPartitions { p =>
      p.get("term_bucket").contains(
        spark.range(1).select(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(
            org.apache.spark.sql.functions.lit("spark")),
          org.apache.spark.sql.functions.lit(8)).cast("string")).head().getString(0))
    }
    assert(pruned.inputFiles.toSet.subsetOf(allFiles))
    assert(pruned.inputFiles.length < allFiles.size, "no manifest pruning happened")
  }
}
