package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4/RefinedWeb-style LINE-level boilerplate removal: drop every line
  * whose (trimmed) content appears in at least `minDocs` DISTINCT
  * documents — navigation menus, cookie banners, footers — while the
  * host documents survive with their remaining lines in order.
  *
  * Sits between whole-document dedup ([[ExactDedup]]) and token-block
  * span dedup ([[SpanDedup]]) in granularity, and differs from both in
  * POLICY: a boilerplate line is removed from EVERY document (no
  * canonical survivor — "© 2024 Example Corp" is noise everywhere),
  * whereas span dedup keeps one canonical occurrence of content that is
  * legitimate somewhere. A line repeated within ONE document only is
  * kept (document frequency counts distinct docs, not occurrences).
  *
  * Shape at scale: explode to (doc, pos, line) map-side; ONE hash
  * aggregation by line content with a distinct-doc count (two-level agg,
  * map-side partials — a hyper-common line concentrates COUNTS on its
  * reducer, never documents); the boilerplate set (bounded by distinct
  * lines crossing the threshold, tiny next to the corpus) joins back —
  * AQE broadcasts it — and documents re-assemble with one shuffle on
  * doc id. Empty/whitespace lines are structural, not content: never
  * counted, always kept.
  */
object LineDedup {

  /** Output: idCol, n_lines, n_kept, clean_text. */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__key", trim(col("__line")))
    val boiler = lines
      .filter(length(col("__key")) > 0)
      .groupBy("__key").agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__key")
    // empty keys never enter the boilerplate set, so the null-probe alone
    // decides; AQE broadcasts the (small) boilerplate side
    val flagged = lines.join(boiler.withColumn("__drop", lit(true)),
        Seq("__key"), "left")
      .withColumn("__keep", col("__drop").isNull)
    flagged.groupBy(col(idCol)).agg(
      count(lit(1)).cast("long").as("n_lines"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__line"))))),
          x => x.getField("__line")),
        "\n").as("clean_text"))
  }
}
