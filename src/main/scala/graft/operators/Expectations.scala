package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: named row constraints evaluated
  * in one pass, with the three consumption shapes a pipeline needs —
  * annotate (which rules failed, per row), split (valid vs quarantined),
  * and metrics (per-rule pass/fail counts). The quality-gate pattern of
  * managed-pipeline systems, expressed as plain Catalyst columns so every
  * constraint stays inside whole-stage codegen.
  *
  * Null semantics: a constraint evaluating to NULL is a FAILURE (the
  * check could not establish the property — e.g. `price > 0` over a null
  * price), matching SQL CHECK-constraint intuition inverted for safety:
  * quarantine on doubt, never pass on doubt.
  *
  * Scale shape: [[annotate]]/[[split]] are map-only (zero exchange, the
  * violation array folds into codegen); [[metrics]] is ONE aggregation
  * emitting every rule's counts in a single pass (conditional sums), then
  * a rule-count-sized unpivot — never one job per rule.
  */
object Expectations {

  final case class Rule(name: String, constraint: Column)

  /** Rule names that failed, per row, as `__violations` (empty = clean). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val flags = rules.map(r =>
      when(!coalesce(r.constraint, lit(false)), lit(r.name)))
    df.withColumn("__violations",
      filter(array(flags: _*), x => x.isNotNull))
  }

  /** (clean rows — original schema, quarantined rows + `__violations`). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.filter(size(col("__violations")) === 0).drop("__violations"),
      annotated.filter(size(col("__violations")) > 0))
  }

  /** One row per rule: (rule, n_pass, n_fail) — a single conditional-sum
    * aggregation over the input, then a rule-sized stack.
    */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(sum(when(coalesce(r.constraint, lit(false)), 1L).otherwise(0L)).as(s"p_$i"),
        sum(when(coalesce(r.constraint, lit(false)), 0L).otherwise(1L)).as(s"f_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // names bound as literal COLUMNS, never spliced into SQL text — any
    // rule name (quotes, backslashes) survives verbatim
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"p_$i").as("n_pass"),
        col(s"f_$i").as("n_fail"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
