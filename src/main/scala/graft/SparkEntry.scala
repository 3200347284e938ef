package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the CDC upsert path (decode semantics + dedup + merge) over
    * the sf0.001 events changelog. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.cdcUpsertHard.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions). See [[Queries]] for definitions.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** DuckDB-runnable equivalents, column-name-aligned with the Spark side. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
