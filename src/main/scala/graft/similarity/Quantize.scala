package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) of embedding columns: per-vector affine
  * float→uint8 codes, the standard 4× storage/bandwidth cut for
  * 100 TB-scale vector corpora (FAISS SQ8 / Milvus SQ8 semantics —
  * per-vector min/max, 256 levels). Encode, decode, and the error metrics
  * are all map-only native expressions — no shuffle, no UDFs; the
  * quantized corpus feeds the same LSH/IVF candidate generation with
  * dequantized (approximate) scoring, or exact re-ranking on the float
  * originals of the shortlist.
  *
  * All math runs in double with one fixed operation order, so the DuckDB
  * oracle replays codes bit-for-bit: `round` ties cannot occur except at
  * the exact endpoints (which land on integers by construction).
  *
  * `mn`/`mx` must be MATERIALIZED min/max columns (select `array_min`/
  * `array_max` into attributes first): referencing `array_min(vec)`
  * inside the per-element lambda would re-reduce the whole vector once
  * per element — O(d²) per row.
  */
object Quantize {

  /** uint8 codes (0..255) for a double-array vector; constant vectors
    * (mx == mn) code to 0.
    */
  def sq8Encode(vec: Column, mn: Column, mx: Column): Column =
    transform(vec, x =>
      when(mx === mn, 0)
        .otherwise(round((x - mn) / (mx - mn) * 255).cast("int")))

  /** Dequantized (approximate) vector: mn + code·(mx−mn)/255. */
  def sq8Decode(codes: Column, mn: Column, mx: Column): Column =
    transform(codes, c => mn + (c.cast("double") * (mx - mn)) / lit(255.0))

  /** Largest per-dimension reconstruction error — order-independent
    * (unlike a summed MSE, a max is insensitive to float reduction
    * order, so it cross-checks exactly between engines). Bounded by
    * (mx−mn)/510 + ulp noise for a correct SQ8 round-trip.
    */
  def maxAbsError(vec: Column, deq: Column): Column =
    array_max(zip_with(vec, deq, (x, y) => abs(x - y)))
}
