package graft.ops

import graft.SharedSpark
import graft.dedup.Decontaminate
import graft.sampling.Sampling
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted semantics for the corpus-curation additions: decontamination,
  * PII redaction, sequence packing, histogram-threshold quality filter.
  * (Every Queries entry additionally runs e2e in QueriesContractSpec and
  * is oracle-checked by the driver.)
  */
class CurationOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // ------------------------------------------------------- decontamination

  private val evalDocs = Seq(
    (100L, "alpha beta gamma delta epsilon zeta")
  ).toDF("doc_id", "text")

  private val trainDocs = Seq(
    // shares the 5-gram "beta gamma delta epsilon zeta"
    (1L, "intro words beta gamma delta epsilon zeta trailing"),
    // same words, different order — no shared 5-gram
    (2L, "zeta epsilon delta gamma beta alpha"),
    // clean
    (3L, "one two three four five six seven"),
    // shorter than 5 tokens — can never be contaminated
    (4L, "alpha beta gamma")
  ).toDF("doc_id", "text")

  test("contaminationFlags: shared 5-gram flags, reorder/short/clean do not") {
    val flags = Decontaminate.contaminationFlags(trainDocs, evalDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("decontaminate drops exactly the flagged docs") {
    val clean = Decontaminate.decontaminate(trainDocs, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(clean === Array(2L, 3L, 4L))
  }

  // ------------------------------------------------------ incremental dedup

  test("incrementalSweep drops corpus-known content, keeps one per batch group") {
    import graft.dedup.ExactDedup
    val corpus = Seq((100L, "already ingested doc")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "already  INGESTED   doc"), // normalizes to corpus content → drop
      (2L, "fresh pair"),
      (3L, "FRESH pair"),              // within-batch dup of 2 → drop
      (4L, "unique newcomer")
    ).toDF("doc_id", "text")
    val kept = ExactDedup.incrementalSweep(batch,
        ExactDedup.groups(corpus, "text", "doc_id").select("content_hash"),
        "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 4L))
  }

  test("bloomSweep (verified) is exactly incrementalSweep; unverified never misses a true dup") {
    import graft.dedup.ExactDedup
    val corpus = (0L until 200L).map(i => (i, s"corpus doc number $i")).toDF("doc_id", "text")
    val corpusFps = ExactDedup.groups(corpus, "text", "doc_id").select("content_hash")
    val batch = (
      (0L until 50L).map(i => (1000L + i, s"corpus doc number ${i * 4}")) ++ // known → drop
      (0L until 50L).map(i => (2000L + i, s"brand new doc $i")) ++           // fresh → keep
      Seq((3000L, "brand new doc 0"))                                        // batch dup → drop
    ).toDF("doc_id", "text")
    val exact = ExactDedup.incrementalSweep(batch, corpusFps, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val bloomed = ExactDedup.bloomSweep(batch, corpusFps, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(bloomed === exact)
    assert(exact === (2000L until 2050L).toArray)
    // unverified mode: no false negatives (every corpus-known row still
    // dropped) and kept set is a subset of the verified answer
    val fast = ExactDedup.bloomSweep(batch, corpusFps, "text", "doc_id", verify = false)
      .select("doc_id").as[Long].collect().sorted
    assert(fast.toSet.subsetOf(exact.toSet))
    assert(fast.forall(_ >= 2000L))
    // empty corpus degrades to pure within-batch dedup
    val none = ExactDedup.bloomSweep(batch, corpusFps.limit(0), "text", "doc_id")
      .select("doc_id").as[Long].collect()
    assert(none.length === 100)
  }

  // ---------------------------------------------------------- PII redaction

  test("redactPii tags emails, IPv4s and phones; counts agree") {
    val df = Seq(
      ("mail a.user+tag@sub.example.org then 192.168.0.1 then +1-555-0199 end"),
      ("no pii here at all"),
      ("two mails x@y.com and z@w.io, ip 10.0.0.255")
    ).toDF("t").select(
      TextFunctions.redactPii(col("t")).as("red"),
      TextFunctions.piiCount(col("t"), TextFunctions.EmailPattern).as("ne"),
      TextFunctions.piiCount(col("t"), TextFunctions.Ipv4Pattern).as("ni"),
      TextFunctions.piiCount(col("t"), TextFunctions.PhonePattern).as("np"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "mail <EMAIL> then <IP> then <PHONE> end")
    assert((rows(0).getLong(1), rows(0).getLong(2), rows(0).getLong(3)) === ((1L, 1L, 1L)))
    assert(rows(1).getString(0) === "no pii here at all")
    assert((rows(1).getLong(1), rows(1).getLong(2), rows(1).getLong(3)) === ((0L, 0L, 0L)))
    assert(rows(2).getString(0) === "two mails <EMAIL> and <EMAIL>, ip <IP>")
    assert((rows(2).getLong(1), rows(2).getLong(2), rows(2).getLong(3)) === ((2L, 1L, 0L)))
  }

  // ------------------------------------------------------------- chunking

  test("tokenChunks: geometry — starts every size-overlap, last chunk short") {
    val df = Seq((1L, (1 to 130).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(TextFunctions.tokenChunks(col("tk"), 64, 8)).as("ch"))
      .select(col("ch.s").as("s"), size(col("ch.ctoks")).as("n"),
        element_at(col("ch.ctoks"), 1).as("first"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    // 130 tokens, window 64, step 56 → starts 1, 57, 113
    assert(rows.map(_._1).toSeq === Seq(1, 57, 113))
    assert(rows.map(_._2).toSeq === Seq(64, 64, 18))
    assert(rows.map(_._3).toSeq === Seq("t1", "t57", "t113"))
    // consecutive chunks overlap by exactly `overlap` tokens
    assert(57 === 1 + (64 - 8) && 113 === 57 + (64 - 8))
  }

  test("tokenChunks: single short doc yields exactly one full-copy chunk") {
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(TextFunctions.tokens(col("text")).as("tk"))
      .select(explode(TextFunctions.tokenChunks(col("tk"), 64, 8)).as("ch"))
      .select(col("ch.s"), col("ch.ctoks")).collect()
    assert(one.length === 1)
    assert(one.head.getInt(0) === 1)
    assert(one.head.getSeq[String](1) === Seq("a", "b", "c"))
  }

  // -------------------------------------------------------- sequence packing

  test("packBins: bins follow the deterministic hash layout exactly") {
    val docs = (0L until 40L).map(i => (i, "g" + (i % 2), 300L + (i % 7) * 100L))
      .toDF("doc_id", "grp", "n_tokens")
    val got = Sampling.packBins(docs, "grp", "doc_id", "n_tokens", capacity = 1000, seed = "s")
      .select("grp", "doc_id", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // independently replay: order by (bucket, key) per group, cut at 1000
    val order = docs
      .select(col("grp"), col("doc_id"), col("n_tokens"),
        Sampling.bucket(col("doc_id"), "s").as("bk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = order.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._2)).toSeq.map { r =>
        val bin = cum / 1000; cum += r._3; (g, r._2) -> bin
      }
    }.toMap
    assert(got === expected)
    // sanity: multiple bins actually exist, and bins are dense from 0
    assert(got.values.max > 0)
    assert(got.filter(_._1._1 == "g0").values.toSeq.sorted.distinct ===
      (0L to got.filter(_._1._1 == "g0").values.max).toSeq)
  }

  test("packBins is invariant to input row order and partitioning") {
    val docs = (0L until 40L).map(i => (i, "g" + (i % 3), 100L + i))
      .toDF("doc_id", "grp", "n_tokens")
    val a = Sampling.packBins(docs, "grp", "doc_id", "n_tokens", 512, "s")
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.packBins(docs.orderBy(rand(7)).repartition(7), "grp", "doc_id",
        "n_tokens", 512, "s")
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  // --------------------------------------------- histogram threshold filter

  test("keepTopFraction keeps the smallest top score set covering frac") {
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0), (5L, 3.0))
      .toDF("id", "score")
    // target = ceil(5 * 0.4) = 2; cum from top: 3.0→1, 2.0→3 ≥ 2 ⇒ thr 2.0
    val kept = Sampling.keepTopFraction(df, "score", 0.4)
      .select("id").as[Long].collect().sorted
    assert(kept === Array(3L, 4L, 5L))
    // frac=1.0 keeps everything
    assert(Sampling.keepTopFraction(df, "score", 1.0).count() === 5)
    // a frac small enough that the top score alone covers it keeps just that
    assert(Sampling.keepTopFraction(df, "score", 0.2)
      .select("id").as[Long].collect().toSeq === Seq(5L))
  }

  // --------------------------------------------------- duplicate-span removal

  private val spanDocs = Seq(
    (1L, "w1 w2 w3 w4 x1 x2 x3 x4"),        // both blocks unique-or-canonical
    (2L, "w1 w2 w3 w4 y1 y2"),              // block 1 duplicates doc 1's
    (3L, "z1 z2 z3 z4 z1 z2 z3 z4 tail"),   // within-doc repeat + short tail
    (4L, "t1 t2"),                          // short block, duplicated in 5
    (5L, "t1 t2"),                          // short blocks never dedup
    (6L, "")                                // empty doc passes through
  ).toDF("doc_id", "text")

  test("removeDuplicateSpans keeps canonical occurrence, rewrites the rest") {
    import graft.dedup.SpanDedup
    val got = SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text", blockTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 2L, "w1 w2 w3 w4 x1 x2 x3 x4")))
    assert(got(2L) === ((2L, 1L, "y1 y2")))
    assert(got(3L) === ((3L, 2L, "z1 z2 z3 z4 tail")))
    assert(got(4L) === ((1L, 1L, "t1 t2")))
    assert(got(5L) === ((1L, 1L, "t1 t2")))
    assert(got(6L) === ((1L, 1L, "")))
  }

  test("removeDuplicateSpans conserves content: kept text is a sub-sequence, every block content survives once") {
    import graft.dedup.SpanDedup
    // deterministic pseudo-random corpus with heavy block sharing
    val rnd = new scala.util.Random(42)
    val blocks = (0 until 6).map(_ => (0 until 4).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    val docs = (0L until 40L).map { i =>
      val nb = 1 + rnd.nextInt(4)
      (i, (0 until nb).map(_ => blocks(rnd.nextInt(blocks.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", blockTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, nb, nk, text) =>
      assert(nk <= nb)
      // kept text tokens appear in the original in order (sub-sequence)
      val kept = text.split(" ").filter(_.nonEmpty)
      val src = orig(id).split(" ").filter(_.nonEmpty)
      var j = 0
      kept.foreach { tok => j = src.indexOf(tok, j); assert(j >= 0, s"$tok lost order in doc $id"); j += 1 }
    }
    // every distinct full-block content survives exactly once corpus-wide
    val survivors = out.flatMap { case (_, _, _, text) =>
      text.split(" ").filter(_.nonEmpty).grouped(4).filter(_.size == 4).map(_.mkString(" ")) }
    // count occurrences of contents that were duplicated in the input
    val inputBlocks = orig.values.flatMap(t =>
      t.split(" ").filter(_.nonEmpty).grouped(4).filter(_.size == 4).map(_.mkString(" "))).toSeq
    val dupContents = inputBlocks.groupBy(identity).collect { case (k, v) if v.size > 1 => k }.toSet
    val survivorCounts = survivors.groupBy(identity).map { case (k, v) => k -> v.size }
    dupContents.foreach { c =>
      assert(survivorCounts.getOrElse(c, 0) >= 1, s"block '$c' vanished entirely")
    }
  }

  test("removeDuplicateSpans is invariant to input order and partitioning") {
    import graft.dedup.SpanDedup
    val a = SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = SpanDedup.removeDuplicateSpans(spanDocs.orderBy(rand(3)).repartition(7),
        "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a === b)
  }

  test("narrow (skew-safe) span dedup is equivalent to the carry variant") {
    import graft.dedup.SpanDedup
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(canon(SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text", 4, carryText = false))
      === canon(SpanDedup.removeDuplicateSpans(spanDocs, "doc_id", "text", 4)))
  }
}
