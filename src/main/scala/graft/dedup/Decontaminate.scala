package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set n-gram decontamination: flag (and drop) training documents that
  * share at least one word n-gram with a held-out evaluation corpus — the
  * standard benchmark-leakage guard a training-data pipeline runs before
  * every corpus release (GPT-3 appendix C / Llama-style 13-gram overlap,
  * shortened here to match the synthetic docs' length).
  *
  * Shape at scale: both sides tokenize map-only and explode to
  * (doc, gramHash); the eval side is deduplicated to a distinct-hash set
  * first. An eval corpus is benchmark-sized (thousands of docs — MBs of
  * hashes) while the train side is the 100 TB corpus, so the contaminated-id
  * set comes from a semi-join of exploded train grams against the eval set
  * — broadcast by AQE at real eval sizes, never a shuffle of the train
  * explode. The final flag is a second broadcast semi/anti-join on doc id.
  * Nothing is ever all-pairs, and no gram list leaves the executors.
  *
  * Gram hashing reuses the md5-based rolling combine
  * ([[MinHashLSH.shingleHashes]]) so the DuckDB oracle replays it exactly.
  */
object Decontaminate {

  /** Every `idCol` of `train` with a `contaminated` flag: true iff the doc
    * shares ≥1 word n-gram with any eval doc. Docs shorter than n grams are
    * never contaminated (no gram to match — same as the reference practice
    * of skipping sub-n documents).
    */
  def contaminationFlags(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 5): DataFrame =
    train.select(col(idCol))
      .join(contaminatedIds(train, eval, idCol, textCol, n)
        .withColumn("__hit", lit(true)), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__hit"), lit(false)).as("contaminated"))

  /** Per-doc contamination REPORT: how many distinct n-grams each train
    * doc shares with the eval set — the triage view behind the boolean
    * flag (threshold choices, worst-offender review). Same exploded-gram
    * equi-join as the flags; one extra distinct + count, still never
    * all-pairs. Only contaminated docs appear.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = gramHashes(eval, idCol, textCol, n)
      .select(col("__gram")).distinct()
    gramHashes(train, idCol, textCol, n)
      .select(col(idCol), col("__gram")).distinct()
      .join(evalGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** Keep only the rows of `train` that share no n-gram with `eval`. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame =
    train.join(contaminatedIds(train, eval, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** Distinct `idCol`s of train docs sharing ≥1 n-gram with the eval set. */
  private def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
                              textCol: String, n: Int): DataFrame = {
    val evalGrams = gramHashes(eval, idCol, textCol, n)
      .select(col("__gram")).distinct()
    gramHashes(train, idCol, textCol, n)
      .join(evalGrams, "__gram")
      .select(col(idCol)).distinct()
  }

  /** (idCol, __gram) — one row per n-gram occurrence; map-only + explode. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    df.select(col(idCol),
        graft.text.TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), graft.text.TextFunctions.tokenHashes(col("__tk")).as("__th"))
      .select(col(idCol), {
        import org.apache.spark.sql.graftbridge.GraftBridge
        explode(GraftBridge.column(graft.functions.RollingHashNgrams(
          GraftBridge.convertedExpression(col("__th")), n,
          MinHashLSH.CombineK, MinHashLSH.CombineMod))).as("__gram")
      })
}
