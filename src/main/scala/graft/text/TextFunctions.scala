package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  * All are pure native expressions (whole-stage codegen, no UDFs) and are
  * deliberately DuckDB-expressible so every operator can be oracle-checked.
  */
object TextFunctions {

  /** Unicode normalization ([[graft.functions.TextNormalize]]): `form` ∈
    * NFC | NFD | NFKC | NFKD | STRIP_ACCENTS. Canonicalize BEFORE hashing/
    * fingerprinting — byte-different encodings of the same text must
    * collapse to one dedup key.
    */
  def normalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.TextNormalize(
      GraftBridge.convertedExpression(text), form))
  }

  /** Thresholded edit distance ([[graft.functions.EditDistanceWithin]]):
    * exact `levenshtein(a, b)` when ≤ `threshold`, else -1 — so
    * `editDistanceWithin(a, b, k) >= 0` ≡ `levenshtein(a, b) <= k` at a
    * fraction of the cost (prefix/suffix strip + banded DP + early exit).
    * The ER comparator: run it INSIDE a blocked candidate join.
    */
  def editDistanceWithin(a: Column, b: Column, threshold: Int): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.EditDistanceWithin(
      GraftBridge.convertedExpression(a), GraftBridge.convertedExpression(b), threshold))
  }

  /** Whitespace tokenization; empty string → empty array (not [""]).
    * Semantics of `filter(split(lower(text), "\\s+"), t => length(t) > 0)`
    * as one native codegen pass ([[graft.functions.GraftTokens]]) — the
    * declarative form's interpreted `filter` lambda was the measured
    * dominant cost of the text family (differential spec:
    * TokenExprsSpec).
    */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.GraftTokens(
      GraftBridge.convertedExpression(text)))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish tokenization: letter runs, digit runs, single punctuation.
    * The class-based pattern parses identically under Java regex (Spark)
    * and RE2 (DuckDB).
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  def punctRatio(text: Column): Column = {
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  /** Small multilingual stopword markers used by both quality scoring and
    * language ID (n-gram/stopword heuristic — a real model would plug in
    * at the same column-function seam).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这")
  )

  /** Token-array variants: Catalyst does not common-subexpression-eliminate
    * higher-order functions, so anything that consults the token array more
    * than once (language scoring, quality scoring) should tokenize into a
    * column FIRST and use the `...FromTokens` form — otherwise every use
    * re-splits the document (measured 5s → 0.5s on text_langid at sf0.1).
    */
  def stopwordCountFromTokens(toks: Column, lang: String = "en"): Column = {
    val set = stopwords(lang)
    size(filter(toks, t => t.isInCollection(set)))
  }

  def stopwordCount(text: Column, lang: String = "en"): Column =
    stopwordCountFromTokens(tokens(text), lang)

  def stopwordRatioFromTokens(toks: Column, lang: String = "en"): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(stopwordCountFromTokens(toks, lang).cast("double") / size(toks))

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordRatioFromTokens(tokens(text), lang)

  def meanWordLengthFromTokens(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(toks))

  def meanWordLength(text: Column): Column = meanWordLengthFromTokens(tokens(text))

  /** Composite quality score in [0,1]: length band + stopword presence +
    * punctuation sanity + word-length sanity. Deterministic, documented,
    * and cheap — the shape of Gopher/C4-style quality filters.
    */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val lengthOk = when(size(toks).between(10, 5000), 0.25).otherwise(0.0)
    val stopOk = when(stopwordRatioFromTokens(toks) > 0.01, 0.25).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 0.25).otherwise(0.0)
    val wordOk = when(meanWordLengthFromTokens(toks).between(2.0, 12.0), 0.25).otherwise(0.0)
    round(lengthOk + stopOk + punctOk + wordOk, 2)
  }

  def qualityScore(text: Column): Column = qualityScoreFromTokens(text, tokens(text))

  /** Language ID: argmax of per-language stopword hits, left-fold tiebreak
    * (earlier language wins ties), 'und' when nothing matches.
    */
  def langIdFromTokens(toks: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, _) =>
      struct(stopwordCountFromTokens(toks, lang).as("hits"), lit(lang).as("lang"))
    }
    val best = scored.reduce { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    // null text → null hit counts → every comparison above is null: guard
    // explicitly so null documents classify as "und" (like langIdByJoin),
    // not as whichever language happened to be first in the reduce
    when(toks.isNull || best.getField("hits") === 0, "und")
      .otherwise(best.getField("lang"))
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** DataFrame-level language ID: explode tokens → broadcast-join the
    * (word, lang) stopword table → per-doc hit counts → argmax with the
    * same earlier-language tie-break as [[langIdFromTokens]]. Identical
    * output, but the work is codegen'd join/aggregate instead of per-token
    * interpreted set-membership lambdas (2.6 s → ~1 s at sf0.1), and the
    * stopword table can grow to real lexicon size without re-planning.
    */
  def langIdByJoin(df: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = stopwords.toSeq.sortBy(_._1)
    val sw = ordered.zipWithIndex
      .flatMap { case ((lang, ws), i) => ws.map(w => (w, lang, i)) }
      .toDF("w", "lang", "lang_idx")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val best = toks.join(broadcast(sw), "w")
      .groupBy(idCol, "lang", "lang_idx")
      .agg(count(lit(1)).as("hits"))
      .groupBy(idCol)
      // max hits; on ties the SMALLEST lang_idx (earlier language) wins
      .agg(max_by(col("lang"), struct(col("hits"), -col("lang_idx"))).as("lang_hit"))
    df.select(col(idCol)).distinct()
      .join(best, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lang_hit"), lit("und")).as("lang_pred"))
  }

  /** Word n-grams of a materialized token array, as separator-joined
    * strings (exact — no hashing, so duplicate-counting never collides).
    * Tokens are whitespace-split, so the space separator is unambiguous.
    * The `size < n` guard matters: Spark's `sequence(1, 0)` counts DOWN,
    * it is not empty.
    */
  def ngramStrings(toksAttr: Column, n: Int): Column =
    when(size(toksAttr) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toksAttr) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toksAttr, i + lit(j))): _*)))

  /** Gopher/C4-style repetition signal: the fraction of n-gram occurrences
    * that are repeats of an earlier n-gram in the same document
    * (1 − distinct/total). Pure per-row array math — map-only at any
    * scale, no shuffle, no state.
    *
    * Counts distinct n-grams over the 32-bit rolling token-hash combine
    * ([[graft.dedup.MinHashLSH.shingleHashes]]), not shingle strings:
    * `array_distinct` over primitive longs is the hash-set path, while
    * over strings it is O(k²) UTF8String compares on top of per-position
    * string building — the measured dominant cost (3.6 s → ~1 s at
    * sf0.1). Hash collisions (~k²/2³³ per doc) shift a fraction by
    * 1/k at worst and are replayed identically by the DuckDB oracle,
    * which mirrors the same combine.
    */
  def dupNgramFraction(toksAttr: Column, n: Int): Column = {
    val grams =
      if (n == 1) tokenHashes(toksAttr)
      else graft.dedup.MinHashLSH.shingleHashes(toksAttr, n)
    dupFraction(grams)
  }

  /** 32-bit hash per token — materialize this ONCE into a column when
    * computing several n-gram sizes, then use [[dupNgramFractionFromHashes]]:
    * the combine then indexes the pre-hashed attribute instead of
    * re-running md5 per (position, offset) for every n.
    */
  def tokenHashes(toksAttr: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.TokenHashes32(
      GraftBridge.convertedExpression(toksAttr)))
  }

  /** [[dupNgramFraction]] over a MATERIALIZED token-hash array attribute. */
  def dupNgramFractionFromHashes(thAttr: Column, n: Int): Column =
    dupFraction(
      if (n == 1) thAttr
      else {
        import org.apache.spark.sql.graftbridge.GraftBridge
        GraftBridge.column(graft.functions.RollingHashNgrams(
          GraftBridge.convertedExpression(thAttr), n,
          graft.dedup.MinHashLSH.CombineK, graft.dedup.MinHashLSH.CombineMod))
      })

  private def dupFraction(grams: Column): Column =
    when(size(grams) <= 0, 0.0)
      .otherwise(round(lit(1.0) -
        size(array_distinct(grams)).cast("double") / size(grams), 6))

  /** TF-IDF top-k terms per document — the classic corpus-statistics kernel
    * (keyword extraction, near-dup feature weighting, quality heuristics).
    *
    * Shape at scale: explode → two hash aggregations (term counts per doc,
    * then document frequency per term — both with map-side partials) → one
    * broadcast of the corpus size → per-doc top-k window. The widest
    * intermediate is (doc, term, tf), bounded by total token count; nothing
    * is ever per-corpus on a single node. Math is integer tf × ln(N/df) of
    * exact integers — bit-identical in any IEEE engine, so the result is
    * oracle-checkable after a fixed 6-dp round.
    */
  def tfIdfTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Tokenize exactly ONCE: document frequency is a window over the
    // already-aggregated (doc, term, tf) relation, not a second aggregation
    // of the exploded tokens — Catalyst does not reuse the explode subtree
    // across two groupBys (measured: the join formulation scanned the
    // corpus twice). The corpus size comes from a separate scan pruned to
    // the id column — O(rows), not O(tokens).
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("dfreq",
      count(lit(1)).over(Window.partitionBy("term")).cast("double"))
    val corpus = df.agg(count_distinct(col(idCol)).cast("double").as("n_docs"))
    val scored = withDf.crossJoin(broadcast(corpus))
      .select(col(idCol), col("term"),
        round(col("tf") * log(col("n_docs") / col("dfreq")), 6).as("tfidf"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** BM25 document ranking for a term query — the corpus-search kernel
    * (retrieval-based decontamination, targeted corpus slicing, nearest
    * exemplar lookup by keyword). Uses the Lucene-shaped positive IDF
    * `ln((N − df + 0.5)/(df + 0.5) + 1)`.
    *
    * Shape at scale: document length and per-(doc, query-term) tf come
    * from ONE tokenize pass with the term filter applied at the explode —
    * the corpus-wide term dictionary is never built, only the |q| query
    * terms survive the map side. df/N/avgdl reduce to a |q|-row and a
    * 1-row aggregate, broadcast back. Per-term contributions are rounded
    * to 6 dp and summed as exact DECIMAL — double-summation order across
    * terms can differ between engines/partitionings, decimal addition
    * cannot — so scores (and the top-k cut) are bit-deterministic.
    */
  def bm25Rank(df: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, query: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(query.nonEmpty, "BM25 needs at least one query term")
    val q = query.map(_.toLowerCase).distinct
    // null text reads as zero tokens (size(NULL) is -1, which would
    // poison avgdl and silently skew every score)
    val safeText = coalesce(col(textCol), lit(""))
    val toks = df.select(col(idCol), tokens(safeText).as("__tk"))
      .select(col(idCol), size(col("__tk")).as("__dl"),
        explode(filter(col("__tk"),
          t => q.map(t === lit(_)).reduce(_ || _))).as("term"))
    // tf is consumed TWICE (the dfreq aggregate's build side and the
    // contribution join's probe side) and Spark re-executes shared
    // subtrees per consumer — before round 11 that re-ran the whole
    // scan + tokenize + explode + aggregate a second time. Materialize
    // the post-aggregation tf instead (guide §1.2/§3.3: truncate the
    // plan at the small intermediate): tf is (matched docs × query
    // terms) rows — fingerprint-sized at any corpus scale — so the
    // checkpoint is cheap and the corpus is tokenized for tf exactly
    // once. dfreq stays a partial-aggregated groupBy + broadcast join
    // (skew-safe for hot terms, unlike a count-over-window by term).
    val tf = toks.groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dfreq"))
    val stats = df.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(tokenCount(safeText)).as("avgdl"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(
          log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("avgdl"))),
          6).cast("decimal(18,6)").as("__c"))
    val scored = contrib.groupBy(idCol)
      .agg(sum(col("__c")).cast("decimal(28,6)").as("score"))
    // top-k via orderBy+limit: Spark plans TakeOrderedAndProject — each
    // partition keeps its local k, the driver merges k·p rows — never a
    // single-partition global sort of the matching docs. The rank window
    // then runs over exactly k rows.
    val top = scored.orderBy(col("score").desc, col(idCol).asc).limit(topK)
    val w = Window.orderBy(col("score").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("score", col("score").cast("double"))
  }

  /** Sliding token chunks — the context-window chunker that precedes
    * embedding/pretraining ingestion: windows of `size` tokens starting
    * every `size − overlap` tokens, the last window short. Returns an
    * array of structs `(s, ctoks)` (1-based start, token slice) from a
    * MATERIALIZED token-array attribute; explode downstream. Map-only —
    * at 100 TB the chunker lives in the scan stage, and the output
    * relation carries (doc, chunk) rows whose total size is
    * input·(1 + overlap/step).
    */
  def tokenChunks(toksAttr: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"bad chunk geometry: size=$size overlap=$overlap")
    val step = size - overlap
    transform(sequence(lit(1), greatest(org.apache.spark.sql.functions.size(toksAttr), lit(1)), lit(step)),
      s => struct(s.as("s"), slice(toksAttr, s, lit(size)).as("ctoks")))
  }

  /** PII scrubbing — the redaction pass every corpus release runs before
    * training. Patterns are deliberately class-based (no lookaround, no
    * backreferences) so they parse identically under Java regex (Spark)
    * and RE2 (DuckDB), which keeps the operator oracle-checkable. A
    * production pipeline swaps richer patterns in at the same seam; the
    * plumbing (map-only projection, count-then-replace over one scan) is
    * what has to survive 100 TB, and it does — no shuffle, no state.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Replace emails, then IPv4s, then phone numbers with typed tags.
    * Email runs first: its local/domain parts may embed digit runs that
    * the later patterns would otherwise clip mid-address.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** HTML → text extraction — the crawl-to-corpus step (trafilatura-lite):
    * drop non-content subtrees (`script`/`style`/`head`/`noscript` with
    * their payloads, plus comments), turn the block-level boundaries the
    * layout implies (`</p>`, `</div>`, headings, `<br>`, list items, table
    * rows) into newlines, strip every remaining tag, decode the common
    * entities, and normalize whitespace (spaces collapse within lines,
    * ≥2 newlines collapse to a paragraph break, lines trim). Map-only —
    * one regexp_replace chain in the scan stage at any corpus size — and
    * every pattern is class-based (no lookaround/backreferences), so the
    * chain parses identically under Java regex and RE2: the operator
    * stays oracle-checkable, like the PII patterns above. A production
    * pipeline swaps a DOM parser in at the same seam; the plumbing is
    * what must survive 100 TB.
    */
  /** The extraction chain as (pattern, replacement) steps, applied in
    * order — public so the DuckDB oracle replays the IDENTICAL chain.
    * `&amp;` decodes LAST among entities: decoding it earlier would turn
    * double-encoded `&amp;lt;` into a spurious `<`.
    */
  val HtmlExtractSteps: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?is)<head\\b[^>]*>.*?</head\\s*>" -> " ",
    "(?is)<noscript\\b[^>]*>.*?</noscript\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?i)<(/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote|br\\s*/?|/br)\\s*>" -> "\n",
    "(?s)<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&",
    // within-line space runs → one space; trim around line breaks; ≥2
    // breaks → one paragraph break; outer trim (regex, not trim():
    // trailing NEWLINES must go too, identically in both engines)
    "[ \\t\\x0B\\f\\r]+" -> " ",
    " ?\\n ?" -> "\n",
    "\\n{2,}" -> "\n\n",
    "^\\s+|\\s+$" -> "")

  def htmlToText(html: Column): Column =
    HtmlExtractSteps.foldLeft(html) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Document fingerprint: md5 of the normalized text (cross-engine stable). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing-style shingle fingerprint: the minimum shingle hash over
    * the document's word n-shingles — robust to local edits (one edit
    * perturbs ≤ n shingles, the min usually survives), cross-engine
    * stable via the md5-based rolling token-hash combine. Null when the
    * text has fewer than n tokens.
    *
    * Takes a MATERIALIZED token-array attribute (tokenize into a column
    * first) — see [[graft.dedup.Shingles.combinedShingleHashes]] for why.
    */
  def minShingleFingerprintFromTokens(toksAttr: Column, n: Int = 5): Column =
    array_min(graft.dedup.MinHashLSH.shingleHashes(toksAttr, n))

  /** Add-k smoothed word-trigram language-model scorer — the CCNet-style
    * corpus-quality signal: score each document by its trigram
    * log-likelihood under a counts model built from a reference corpus (in
    * CCNet a clean Wikipedia slice; here any DataFrame with the same text
    * column). `P(w₃ | w₁w₂) = (C₃(g) + k) / (C₂(prefix) + k·V)` with `V`
    * the model's distinct-token vocabulary size; unseen trigrams and
    * prefixes fall back to the smoothing mass via `coalesce(count, 0)`.
    * Output: `(id, n_trigrams, log_prob, avg_logp)` — documents with
    * fewer than three tokens produce no trigrams and are absent, the
    * same contract as the shingle family.
    *
    * Shape at scale: the model reduces to trigram/bigram count tables and
    * a 1-row vocab aggregate whose sizes are bounded by the LANGUAGE
    * (observed n-gram vocabulary), not by corpus bytes — all three are
    * hash aggregations with map-side partials, then broadcast. Scoring is
    * one explode + two broadcast joins + one per-doc hash aggregation:
    * the scored corpus itself never shuffles.
    *
    * Engine-stable output contract: every emitted column is DECIMAL or
    * BIGINT, and every double that feeds them is bit-identical across
    * engines. The smoothing constant is the rational `kNum/kDen`
    * (default 1/2), so the smoothed ratio is a single IEEE division of
    * two exact integers `(kDen·C₃ + kNum) / (kDen·C₂ + kNum·V)` —
    * correctly rounded, hence bit-identical in any IEEE engine. Per-
    * trigram log-probs are rounded to 6 dp and summed as exact DECIMAL
    * (the BM25 treatment: double summation order differs across engines
    * and partitionings, decimal addition cannot). `avg_logp` is derived
    * from the exact `log_prob` by INTEGER micro-arithmetic (scale by 10⁶,
    * integral `div`, half-away-from-zero) and rebuilt into DECIMAL(18,6)
    * by multiplication only — no engine-specific decimal-division or
    * double-rounding semantics anywhere in the hashed surface.
    */
  /** Model-based quality scoring via a hashing-trick linear classifier —
    * the FineWeb-Edu / DCLM pattern: an offline-trained text classifier
    * reduces to a weight vector over hashed n-gram features, and scoring
    * a 100 TB corpus is then MAP-ONLY. Per document: tokenize, hash
    * unigram + bigram features (one md5 per feature — the shared
    * [[graft.functions.TokenHashes32]] codegen kernel), fold the
    * bucketed weights (`bucket = hash mod weights.length`), sigmoid. The
    * weight vector rides the plan as an array literal; no shuffle, no
    * join, no UDF.
    *
    * Output: `(id, n_feats, w_sum, score)` — `w_sum` is the raw weight
    * sum (engine-exact when the weights are integer-valued, which is how
    * the oracle configures it; real trained float weights sum in array
    * order), `score = sigmoid(bias + w_sum/n_feats)` rounded to 6 dp.
    * Documents with no tokens have no features: `n_feats = 0`,
    * `score` NULL.
    */
  def hashedClassifierScore(docs: org.apache.spark.sql.DataFrame,
                            idCol: String, textCol: String,
                            weights: Array[Double],
                            bias: Double = 0.0): org.apache.spark.sql.DataFrame = {
    import graft.dedup.Shingles
    val d = weights.length
    require(d > 0, "empty weight vector")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__tk"),
        Shingles.rawWordShingles(col(textCol), 2).as("__bg"))
      .select(col(idCol),
        concat(tokenHashes(col("__tk")), tokenHashes(col("__bg"))).as("__fh"))
      .select(col(idCol),
        size(col("__fh")).cast("long").as("n_feats"),
        aggregate(col("__fh"), lit(0.0), (acc, h) =>
          acc + element_at(lit(weights), pmod(h, lit(d.toLong)).cast("int") + 1))
          .as("w_sum"))
      .withColumn("score", when(col("n_feats") > 0,
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + col("w_sum") / col("n_feats")))), 6)
          .cast("decimal(9,6)")))
  }

  def trigramLmScore(model: org.apache.spark.sql.DataFrame,
                     scored: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String,
                     kNum: Long = 1L, kDen: Long = 2L): org.apache.spark.sql.DataFrame = {
    import graft.dedup.Shingles
    require(kNum > 0 && kDen > 0, "smoothing constant must be a positive rational")
    // ONE pass over the model half (round 11, guide §1.2): trigram
    // counts, bigram counts and the vocabulary all explode from the same
    // scan+tokenize — before, three separate aggregate branches each
    // re-read and re-tokenized the model corpus. The combined gram-count
    // table is checkpointed so its three consumers read the counts, not
    // the corpus; it is broadcast-small by this operator's own contract
    // (c3/c2 are broadcast into the scoring join below).
    val modelGrams = model.select(explode(concat(
        transform(Shingles.rawWordShingles(col(textCol), 3),
          g => struct(lit(3).as("n"), g.as("g"))),
        transform(Shingles.rawWordShingles(col(textCol), 2),
          g => struct(lit(2).as("n"), g.as("g"))),
        transform(tokens(col(textCol)),
          t => struct(lit(1).as("n"), t.as("g"))))).as("e"))
      .select(col("e.n").as("n"), col("e.g").as("g"))
      .groupBy("n", "g").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val c3 = modelGrams.where(col("n") === 3).select(col("g"), col("c").as("c3"))
    val c2 = modelGrams.where(col("n") === 2).select(col("g").as("p"), col("c").as("c2"))
    // distinct token count = the number of 1-gram groups (array elements
    // are non-null regex matches, so count(groups) ≡ count_distinct)
    val vocab = modelGrams.where(col("n") === 1).agg(count(lit(1)).as("__v"))
    val grams = scored
      .select(col(idCol), explode(Shingles.rawWordShingles(col(textCol), 3)).as("g"))
      // tokens contain no whitespace (split on \s+), so the trigram's
      // bigram prefix is exactly its first two space-joined parts
      .withColumn("p", substring_index(col("g"), " ", 2))
    // Exact-integer smoothing ratio per trigram: num = kDen·C₃ + kNum,
    // den = kDen·C₂ + kNum·V. The LONG forms are carried through to the
    // output (`sum_num`/`sum_den`) as the ENGINE-EXACT scoring surface —
    // `ln` is not correctly-rounded in any engine, so cross-engine
    // equality can only be asserted on the pre-transcendental integers;
    // `log_prob`/`avg_logp` are derived, informational columns.
    val numL = lit(kDen) * coalesce(col("c3"), lit(0L)) + lit(kNum)
    val denL = lit(kDen) * coalesce(col("c2"), lit(0L)) + lit(kNum) * col("__v")
    val lp = grams
      .join(broadcast(c3), Seq("g"), "left")
      .join(broadcast(c2), Seq("p"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        numL.cast("long").as("__num"), denL.cast("long").as("__den"),
        round(log(numL.cast("double") / denL.cast("double")), 6)
          .cast("decimal(18,6)").as("__lp"))
    lp.groupBy(idCol).agg(
      count(lit(1)).cast("long").as("n_trigrams"),
      sum(col("__num")).cast("long").as("sum_num"),
      sum(col("__den")).cast("long").as("sum_den"),
      sum(col("__lp")).cast("decimal(28,6)").as("log_prob"))
      // log_prob ≤ 0 (ratio ≤ 1 whenever V ≥ kDen·… — C₃ ≤ C₂ and kNum·V ≥ kNum),
      // so |micros| = -micros; `div` on non-negative operands floors.
      .withColumn("__L", (col("log_prob") * lit(1000000L)).cast("long"))
      .withColumn("__am", expr("(((-__L) * 2) + n_trigrams) div (2 * n_trigrams)"))
      .withColumn("avg_logp",
        expr("CAST(CAST(-__am AS DECIMAL(18,6)) * CAST(0.000001 AS DECIMAL(18,6)) AS DECIMAL(18,6))"))
      .drop("__L", "__am")
  }
}
