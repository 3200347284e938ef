package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate pairs with inverted-index blocking.
  *
  * Never all-pairs: docs are candidates only when they share at least one
  * shingle (inverted-index self-join on the shingle), and |A∩B| falls out
  * of the same join as `count(*)` per pair — so Jaccard costs one
  * aggregation over the join, not a second pass over documents:
  * J = |A∩B| / (|A| + |B| − |A∩B|).
  *
  * Scale notes: ultra-common shingles create hot join keys (every pair
  * sharing "the of and" meets there). For 100 TB runs, drop the top-p% most
  * frequent shingles before the join (`maxShingleFreq`) — standard df-cut —
  * which bounds per-key fan-out; near-dup pairs still meet on their rarer
  * shingles. MinHashLSH is the probabilistic alternative when even the
  * blocked join is too big.
  */
object NgramJaccard {

  def pairs(df: DataFrame, textCol: String, idCol: String,
            n: Int = 3, threshold: Double = 0.8,
            maxShingleFreq: Option[Long] = None): DataFrame = {
    // 64-bit hashed join key: same pair counts as joining on the string
    // (collision odds ~|shingles|²/2^65), half the shuffle bytes.
    val shingled = df
      .select(col(idCol).as("id"), Shingles.wordShingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("id"), col("n_sh"), xxhash64(col("shingle")).as("shingle"))

    val filtered = maxShingleFreq match {
      case Some(cap) =>
        val hot = shingled.groupBy("shingle").count().where(col("count") > cap)
          .select("shingle")
        shingled.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => shingled
    }

    val l = filtered.select(col("shingle"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val r = filtered.select(col("shingle"), col("id").as("id_b"), col("n_sh").as("n_b"))
    l.join(r, Seq("shingle")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
