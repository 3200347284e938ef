package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Hash family: h_k(shingle) = md5(k || ':' || shingle), minimized
  * lexicographically — md5 hex strings are identical across engines, which
  * keeps every stage (signatures, bands, candidate pairs) DuckDB-oracle
  * checkable with zero custom kernels. A k-index salt gives k independent
  * permutation approximations (standard minwise-hashing construction).
  *
  * Scale shape (the point of LSH): signatures are one groupBy over exploded
  * shingles with k `min` partial aggregates — map-side combine collapses
  * each input partition to one row per doc before the shuffle. Candidate
  * generation shuffles by (band_idx, band_hash) — identical docs all land
  * in the same band bucket, so hot buckets = true duplicate clusters; the
  * self-join is bounded per bucket, never all-pairs. Brute-force Jaccard
  * over 100 TB is O(n²) and impossible; this is O(n · k + candidate pairs).
  */
object MinHashLSH {

  /** Per-doc signature: columns (id, sig_0 .. sig_{k-1}). */
  def signatures(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 16, shingleSize: Int = 3): DataFrame = {
    val shingled = df.select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("shingle"))
    val aggs = (0 until k).map(i => min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"sig_$i"))
    shingled.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded candidate pairs (a < b), `bands` bands of k/bands rows each:
    * docs agreeing on any full band are candidates.
    */
  def candidatePairs(df: DataFrame, textCol: String, idCol: String,
                     k: Int = 16, bands: Int = 8, shingleSize: Int = 3): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    val sigs = signatures(df, textCol, idCol, k, shingleSize)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"sig_${b * rows + r}"))
      struct(lit(b).as("band_idx"), md5(concat_ws("|", parts: _*)).as("band_hash"))
    }
    val banded = sigs.select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
    val l = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }
}
