package graft.streaming

import graft.SharedSpark
import graft.tables.ManagedTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end continuous corpus intake: quality gate + cross-batch
  * content dedup + managed-table landing, with state surviving stream
  * restarts via the checkpoint.
  */
class CorpusIngestSpec extends AnyFunSuite with SharedSpark {

  private def writeDocs(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, text) =>
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"crawl"}"""
    }
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private val good1 = "the quick brown fox jumps over the lazy dog again and again"
  private val good2 = "a steady stream of documents arrives and the pipeline keeps it clean"
  private val good3 = "it is a truth universally acknowledged that corpora need curation"

  test("quality gate + cross-batch dedup + table landing, state survives restart") {
    val in = Files.createTempDirectory("ingest-in").toString
    val ckpt = Files.createTempDirectory("ingest-ckpt").toString
    val wh = Files.createTempDirectory("ingest-wh").toString
    val cfg = CorpusIngest.Config(warehouse = wh, minQuality = 0.5)

    // wave 1: two good docs, one junk doc
    writeDocs(in, "wave1.json", Seq(1L -> good1, 2L -> "x", 3L -> good2))
    val q1 = CorpusIngest.start(spark, in, ckpt, cfg)
    q1.awaitTermination()
    val t = ManagedTable.load(spark, wh, "corpus").get
    val after1 = t.read().select("doc_id").collect().map(_.getLong(0)).sorted
    assert(after1.toSeq == Seq(1L, 3L), "junk doc must be gated out")

    // wave 2 (NEW query, same checkpoint): an exact replay of doc 1's
    // content under a new id, plus a fresh good doc
    writeDocs(in, "wave2.json", Seq(4L -> good1, 5L -> good3))
    val q2 = CorpusIngest.start(spark, in, ckpt, cfg)
    q2.awaitTermination()
    val after2 = ManagedTable.load(spark, wh, "corpus").get
      .read().select("doc_id").collect().map(_.getLong(0)).sorted
    assert(after2.toSeq == Seq(1L, 3L, 5L),
      "cross-batch duplicate content must not land twice")

    // quality + fingerprint columns ride along on landed rows
    val row = ManagedTable.load(spark, wh, "corpus").get.read()
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).collect().head
    assert(row.getAs[Double]("quality") >= 0.5)
    assert(row.getAs[String]("fingerprint").length == 32)
  }

  test("near-dup gate: batches probe the persisted MinHash index; survivors extend it") {
    val in = Files.createTempDirectory("nd-in").toString
    val ckpt = Files.createTempDirectory("nd-ckpt").toString
    val wh = Files.createTempDirectory("nd-wh").toString
    val cfg = CorpusIngest.Config(warehouse = wh, minQuality = 0.3,
      nearDupIndex = Some("corpus_minhash"), nearDupK = 16, nearDupBands = 16)

    writeDocs(in, "wave1.json", Seq(10L -> good1, 11L -> good2))
    CorpusIngest.start(spark, in, ckpt, cfg).awaitTermination()
    val t = ManagedTable.load(spark, wh, "corpus").get
    assert(t.read().count() == 2)

    // wave 2: a near-dup of doc 10 (one word changed), a fresh doc, and
    // an in-batch near-dup pair (keep the smaller id)
    val nearDup10 = good1.replace("jumps", "leaps")
    val freshA = "some entirely novel passage about catalyst expression trees"
    val freshB = "some entirely novel passage about catalyst projection trees"
    writeDocs(in, "wave2.json", Seq(20L -> nearDup10, 21L -> freshA, 22L -> freshB))
    CorpusIngest.start(spark, in, ckpt, cfg).awaitTermination()
    // reload: the pre-wave-2 handle pins the older snapshot version
    val t2 = ManagedTable.load(spark, wh, "corpus").get
    val ids = t2.read().select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(10L, 11L, 21L),
      s"near-dup of an indexed doc and the larger in-batch twin must be gated, got $ids")
    // the index grew by exactly the survivors
    val idx = graft.dedup.MinHashIndex.load(spark, wh, "corpus_minhash").get
    assert(idx.signatures.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(10L, 11L, 21L))
    // replaying the landed batch (marker present) is a no-op for both tables
    import spark.implicits._
    CorpusIngest.landBatch(cfg,
      Seq((20L, nearDup10, "en", "crawl"), (21L, freshA, "en", "crawl"),
        (22L, freshB, "en", "crawl")).toDF("doc_id", "text", "lang", "source")
        .withColumn("quality", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("fingerprint", org.apache.spark.sql.functions.lit("f")),
      batchId = 1L)
    assert(ManagedTable.load(spark, wh, "corpus").get.read().count() == 3)
    assert(graft.dedup.MinHashIndex.load(spark, wh, "corpus_minhash").get
      .signatures.count() == 3)
  }

  test("a replayed micro-batch lands exactly once (batch-id marker rides the commit)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("replay-wh").toString
    val cfg = CorpusIngest.Config(warehouse = wh)
    val batch = Seq((1L, good1, "en", "c")).toDF("doc_id", "text", "lang", "source")
    CorpusIngest.landBatch(cfg, batch, batchId = 0L)
    // the at-least-once replay: same batch id arrives again
    CorpusIngest.landBatch(cfg, batch, batchId = 0L)
    val t = ManagedTable.load(spark, wh, "corpus").get
    assert(t.read().count() == 1, "replayed batch landed twice")
    assert(t.meta.properties(CorpusIngest.BatchIdProp) == "0")
    // the next genuine batch still lands
    CorpusIngest.landBatch(cfg,
      Seq((2L, good3, "en", "c")).toDF("doc_id", "text", "lang", "source"), batchId = 1L)
    assert(ManagedTable.load(spark, wh, "corpus").get.read().count() == 2)
  }

  test("redaction stage: PII is scrubbed before landing, and redaction-equal docs dedup") {
    val in = Files.createTempDirectory("pii-in").toString
    val ckpt = Files.createTempDirectory("pii-ckpt").toString
    val wh = Files.createTempDirectory("pii-wh").toString
    val cfg = CorpusIngest.Config(warehouse = wh, redactPii = true)
    // two docs identical except for the concrete email they leak — after
    // redaction they are the same content and must land once
    val t1 = s"$good1 contact alice@example.com for details"
    val t2 = s"$good1 contact bob@other.org for details"
    writeDocs(in, "w1.json", Seq(1L -> t1, 2L -> t2))
    CorpusIngest.start(spark, in, ckpt, cfg).awaitTermination()
    val rows = graft.tables.ManagedTable.load(spark, wh, "corpus").get.read()
      .select("doc_id", "text").collect()
    assert(rows.length == 1, "redaction-equal documents must dedup to one")
    assert(rows.head.getString(1).contains("<EMAIL>"))
    assert(!rows.head.getString(1).contains("example.com"))
  }

  test("rejects() is the exact complement of the gate") {
    import spark.implicits._
    val df = Seq((1L, good1), (2L, "x"), (3L, good2)).toDF("doc_id", "text")
    val r = CorpusIngest.rejects(df, 0.5).select("doc_id").as[Long].collect()
    assert(r.toSeq == Seq(2L))
  }

  test("expectation rules gate intake before dedup state; rejects() names the violations") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("ingest-exp-in").toString
    val ckpt = Files.createTempDirectory("ingest-exp-ckpt").toString
    val wh = Files.createTempDirectory("ingest-exp-wh").toString
    val rules = Seq(
      graft.operators.Expectations.Rule("lang_known", col("lang").isin("en", "de")),
      graft.operators.Expectations.Rule("source_present", col("source").isNotNull))
    val cfg = CorpusIngest.Config(warehouse = wh, tableName = "corpus_exp",
      minQuality = 0.5, expectations = rules)
    // doc 2 violates lang_known (fr), doc 3 is junk-quality
    val lines = Seq(
      s"""{"doc_id":1,"text":"$good1","lang":"en","source":"crawl"}""",
      s"""{"doc_id":2,"text":"$good2","lang":"fr","source":"crawl"}""",
      s"""{"doc_id":3,"text":"x","lang":"en","source":"crawl"}""")
    Files.write(java.nio.file.Paths.get(in, "w.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    CorpusIngest.start(spark, in, ckpt, cfg).awaitTermination()
    val landed = ManagedTable.load(spark, wh, "corpus_exp").get
      .read().select("doc_id").as[Long].collect().sorted
    assert(landed.toSeq == Seq(1L), s"landed: ${landed.toSeq}")
    // batch audit reproduces the quarantine with reasons
    val df = Seq((1L, good1, "en", "crawl"), (2L, good2, "fr", "crawl"),
      (3L, "x", "en", "crawl")).toDF("doc_id", "text", "lang", "source")
    val audit = CorpusIngest.rejects(df, 0.5, rules)
      .select(col("doc_id"), col("__violations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(audit == Map(2L -> List("lang_known"), 3L -> List("min_quality")))
  }
}
