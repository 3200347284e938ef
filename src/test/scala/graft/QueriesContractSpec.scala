package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself:
  *  - every query executes at sf0.001 (catches runtime regressions that
  *    compile fine — the DuckDB crosscheck is external to sbt test)
  *  - names are unique (a duplicate would silently shadow in the Map)
  *  - output column names are hash-compare-safe (lowercase identifiers,
  *    aliased on both sides — no Spark-generated `count(1)` names)
  *  - flagship entry returns rows
  */
class QueriesContractSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"
  private val colName = "^[a-z_][a-z0-9_]*$".r

  test("query names are unique and oracle keys are a subset") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString(","))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Queries.all) {
    test(s"runs + hygienic columns: ${q.name}") {
      val df = q.fn(spark, sf)
      df.columns.foreach { c =>
        assert(colName.findFirstIn(c).isDefined,
          s"${q.name} column '$c' is not a stable lowercase identifier")
      }
      val n = df.count()
      // pair/top-k queries may legitimately be small, but a query that
      // returns nothing at all on real data checks nothing
      assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
    }
  }
}
