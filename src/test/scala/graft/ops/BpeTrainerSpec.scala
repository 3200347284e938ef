package graft.ops

import graft.SharedSpark
import graft.text.BpeTrainer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // the classic Sennrich et al. worked example: {low:5, lower:2,
  // newest:6, widest:3}. First merges are driven by "est</w>" pairs.
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromCounts reproduces the worked-example merge order") {
    val merges = BpeTrainer.trainFromCounts(sennrich, 4)
    // (e,s) count 9 → es; (es,t</w>) 9 → est</w>; (l,o) 7 → lo (the w</w>
    // of "low" is a DISTINCT symbol from "lower"'s w, so (lo,·) splits
    // 5/2); then a 6-count three-way tie broken lexicographically → (e,w)
    assert(merges == Seq(
      ("e", "s"), ("es", "t" + BpeTrainer.Eow), ("l", "o"), ("e", "w")))
  }

  test("merges exhaust gracefully when every word collapses to one symbol") {
    val merges = BpeTrainer.trainFromCounts(Seq(("ab", 3L)), 10)
    assert(merges == Seq(("a", "b" + BpeTrainer.Eow))) // then nothing left
  }

  test("train = distributed word counts + the bounded loop") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("id", "text")
    val merges = BpeTrainer.train(docs, "text", 4)
    assert(merges == BpeTrainer.trainFromCounts(sennrich, 4))
  }

  test("segmentWord applies merges in priority order") {
    val merges = BpeTrainer.trainFromCounts(sennrich, 4)
    assert(BpeTrainer.segmentWord("newest", merges) ==
      Seq("n", "ew", "est" + BpeTrainer.Eow))
    // "low"'s final w carries the marker: (l,o) applies, (e,w) cannot
    assert(BpeTrainer.segmentWord("low", merges) ==
      Seq("lo", "w" + BpeTrainer.Eow))
    assert(BpeTrainer.segmentWord("lowest", merges) ==
      Seq("lo", "w", "est" + BpeTrainer.Eow))
  }

  test("trainDetailed reports the winning pair counts alongside the merges") {
    val det = BpeTrainer.trainDetailed(sennrich, 4)
    assert(det.map { case (a, b, _) => (a, b) } ==
      BpeTrainer.trainFromCounts(sennrich, 4))
    assert(det.map(_._3) == Seq(9L, 9L, 7L, 6L))
  }

  test("astral-plane words segment identically through the dictionary and the OOV fallback") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A — two UTF-16 code units. The
    // dictionary path (driver-side toSymbols) and the SQL fallback
    // (split(word,'') = code points) must agree symbol-for-symbol.
    val w = new String(Character.toChars(0x1D400)) + "b" +
      new String(Character.toChars(0x1D401))
    val docs = Seq((1L, w)).toDF("id", "text")
    val viaDict = BpeTrainer.segmentWords(docs, "id", "text", Nil)
      .collect().head.getSeq[String](3).toList
    val viaFallback = BpeTrainer.segmentWords(docs, "id", "text", Nil,
      maxVocabWords = 1, dictionary = Some(Seq("unrelated")))
      .collect().head.getSeq[String](3).toList
    assert(viaDict == viaFallback, s"dict=$viaDict fallback=$viaFallback")
    assert(viaDict.length == 3, "three code points, three symbols")
    assert(viaDict.last.endsWith(BpeTrainer.Eow))
  }

  test("segmentWords: dictionary join ≡ segmentWord; cap overflow falls back to chars") {
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "widest low newest newest")).toDF("id", "text")
    val merges = BpeTrainer.train(docs, "text", 4)
    val out = BpeTrainer.segmentWords(docs, "id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[String](3).toList)).toSeq
    // every in-dictionary word matches the reference segmentation
    out.foreach { case (_, _, w, subs) =>
      assert(subs == BpeTrainer.segmentWord(w, merges).toList, s"word $w")
    }
    // word positions preserved per doc
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3) ==
      Seq("low", "lower", "newest"))
    // cap overflow: with a 1-word dictionary the rest are char-split
    val capped = BpeTrainer.segmentWords(docs, "id", "text", merges, maxVocabWords = 1)
      .collect().map(r => (r.getString(2), r.getSeq[String](3).toList)).toSet
    // "newest" (count 3) is the sole dictionary word
    assert(capped.contains(("newest", BpeTrainer.segmentWord("newest", merges).toList)))
    assert(capped.contains(("low", List("l", "o", "w" + BpeTrainer.Eow))))
  }
}
