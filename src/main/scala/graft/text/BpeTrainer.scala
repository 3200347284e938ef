package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a corpus — the merge-rule
  * learning step of a GPT-style tokenizer pipeline (Sennrich et al. 2016).
  *
  * Scale shape (100 TB corpus): classic BPE never iterates over the
  * corpus — it iterates over the WORD VOCABULARY weighted by word counts.
  * So the only corpus-scale work here is ONE tokenize → word-count
  * aggregation (one hash shuffle, map-side partials, the same exchange
  * `text_vocab` runs). The vocabulary is then capped to the top
  * `maxVocabWords` words by count (the long tail's counts cannot change
  * argmax merges materially — standard practice) and the merge loop runs
  * on that BOUNDED table driver-side: ~50k words × numMerges cheap array
  * scans, the same driver-bounded-state pattern as the k-means trainer
  * (k·dim centroids). No per-iteration Spark jobs, no corpus re-reads.
  *
  * Segmentation ([[segmentWords]]) is dictionary-driven: the learned
  * merges segment the DISTINCT word list once (bounded, driver-side), and
  * the corpus joins the broadcast word → subwords dictionary — corpus
  * rows are touched map-side only. Words outside the dictionary fall back
  * to character tokens (the exact result of applying zero merges), so the
  * output is total and deterministic at any corpus size.
  */
object BpeTrainer {

  /** End-of-word marker glued to a word's last character (standard BPE:
    * lets merges distinguish word-final from word-internal pairs).
    */
  val Eow = "</w>"

  /** Distributed word counts: lowercase whitespace tokenize (the corpus's
    * shared tokenizer) → one hash aggregation. The only corpus-scale job
    * in the trainer.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** A word as its current symbol sequence (CODE POINTS, last one carrying
    * the end-of-word marker), updated as merges apply. Code points — not
    * UTF-16 code units — so a supplementary-plane word segments the same
    * whether it reaches the driver-side dictionary or [[segmentWords]]'s
    * SQL fallback (Spark's `split(word, '')` is code-point-based).
    */
  private def toSymbols(word: String): Vector[String] = {
    val cs = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector
    if (cs.isEmpty) cs else cs.init :+ (cs.last + Eow)
  }

  /** UTF-8 byte order for merge tie-breaks — matches both Spark's
    * UTF8String ordering and DuckDB/parquet binary collation, so the
    * learned merge table is bit-identical across engines even for
    * supplementary-plane symbols (Java's UTF-16 compareTo diverges there —
    * the same lesson as the manifest ColBounds comparator).
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Learn `numMerges` merge rules, most-frequent pair first. Ties break
    * lexicographically (deterministic across runs and partitionings).
    * Returns the ordered merge list — pairs of adjacent symbols to fuse.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    trainFromCounts(topWords(docs, textCol, maxVocabWords), numMerges)
  }

  /** The capped training vocabulary, count-descending — collect it once
    * and feed BOTH [[trainFromCounts]] and [[segmentWords]]'s
    * `dictionary` so the corpus word-count exchange runs a single time
    * across the train-then-segment flow.
    */
  def topWords(docs: DataFrame, textCol: String,
               maxVocabWords: Int = 50000): Seq[(String, Long)] = {
    require(maxVocabWords > 0, "maxVocabWords must be positive")
    wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("word").asc).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The merge loop on a bounded (word, count) vocabulary — exposed for
    * differential testing against reference implementations.
    */
  def trainFromCounts(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] =
    trainDetailed(vocab, numMerges).map { case (a, b, _) => (a, b) }

  /** [[trainFromCounts]] that also reports each chosen merge's pair count
    * — the oracle-checkable surface: (left, right, count) per round in
    * merge order, every value deterministic (UTF-8 tie-breaks) and
    * integer-exact, so an external engine replaying N rounds must
    * reproduce the table bit-for-bit.
    */
  def trainDetailed(vocab: Seq[(String, Long)],
                    numMerges: Int): Seq[(String, String, Long)] = {
    var words = vocab.map { case (w, n) => (toSymbols(w), n) }.filter(_._1.length > 1)
    val merges = Vector.newBuilder[(String, String, Long)]
    val pairOrder: Ordering[((String, String), Long)] = Ordering.by[((String, String), Long), Long](-_._2)
      .orElse(Ordering.by[((String, String), Long), String](_._1._1)(utf8Order))
      .orElse(Ordering.by[((String, String), Long), String](_._1._2)(utf8Order))
    var i = 0
    while (i < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val ((a, b), n) = pairCounts.toSeq.min(pairOrder)
      merges += ((a, b, n))
      words = words.map { case (syms, cnt) => (applyMerge(syms, (a, b)), cnt) }
        .filter(_._1.length > 1)
      i += 1
    }
    merges.result()
  }

  private def applyMerge(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += (syms(j) + syms(j + 1)); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Segment ONE word with an ordered merge list (priority = list order,
    * the standard BPE application rule).
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = toSymbols(word)
    merges.foreach { m => if (syms.length > 1) syms = applyMerge(syms, m) }
    syms
  }

  /** Segment a corpus with learned merges: `textCol` explodes to words,
    * each word joins the BROADCAST dictionary of the top `maxVocabWords`
    * segmented words. Words past the dictionary cap fall back to
    * character tokens map-side — exact whenever the corpus's distinct
    * words fit the cap, and the standard approximation for the rare tail
    * beyond it (documented trade: rare-word segmentation quality for a
    * bounded broadcast). Output: one row per (row id, word position) with
    * the subword array — corpus-scale work is the tokenize and one
    * broadcast join, never an iteration.
    */
  def segmentWords(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)],
                   maxVocabWords: Int = 50000,
                   dictionary: Option[Seq[String]] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // `dictionary`: reuse a word list the caller already has (e.g. from
    // the training pass) instead of re-running the corpus-scale
    // word-count exchange — the train-then-segment flow then touches the
    // corpus once per phase, not twice
    val dictWords = dictionary.map(_.toArray).getOrElse {
      wordCounts(docs, textCol)
        .orderBy(col("n").desc, col("word").asc).limit(maxVocabWords)
        .select("word").as[String].collect()
    }
    val dict = dictWords.toSeq.map(w => (w, segmentWord(w, merges)))
      .toDF("word", "subwords")
    val words = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("word_pos", "word")))
    words.join(broadcast(dict), Seq("word"), "left")
      .withColumn("subwords", coalesce(col("subwords"),
        // OOV fallback: character split with the end-of-word marker —
        // array ops only, evaluated map-side
        concat(expr("slice(split(word, ''), 1, char_length(word) - 1)"),
          array(concat(substring(col("word"), -1, 1), lit(Eow))))))
      .select(idCol, "word_pos", "word", "subwords")
  }
}
