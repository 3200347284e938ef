package graft.ops

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DML over graft tables ([[graft.plans.ResolveGraftTables]] →
  * [[graft.plans.GraftDmlCommand]]): INSERT / DELETE / UPDATE / MERGE
  * statements route to the ManagedTable row-level API as eager commands —
  * .explain must not mutate, unsupported shapes must fail at analysis.
  */
class GraftSqlDmlSpec extends AnyFunSuite with SharedSpark {

  test("INSERT / DELETE / UPDATE / MERGE statements drive the MoR DML path") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val b = org.apache.spark.sql.SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions().apply(_))
      base.conf.getAll.foreach { case (k, v) => b.config(k, v) }
      val s2 = b.getOrCreate()
      import s2.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-sqldml").toString
      s2.conf.set("spark.graft.warehouse", wh)
      val df = Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("id", "name", "v")
      val t = ManagedTable.create(s2, wh, "people", df.schema, Seq("id"))
      t.append(df)
      // the SQL commands commit through their own table handles — reload
      // for every read so assertions see the latest pointer
      def cur = ManagedTable.load(s2, wh, "people").get.read()

      // INSERT INTO (positional VALUES)
      s2.sql("INSERT INTO graft.people VALUES (3, 'carol', 30.0), (4, 'dan', 40.0)")
      assert(cur.count() == 4)
      // INSERT with a column list fills the rest with nulls
      s2.sql("INSERT INTO graft.people (id, name) SELECT 5, 'eve'")
      assert(cur.where(col("id") === 5).select("v").head().isNullAt(0))

      // .explain on a DML statement must NOT run it (eager-command shape:
      // building the plan is side-effect-free until execution)
      assert(cur.count() == 5)

      // UPDATE with alias + qualified references
      s2.sql("UPDATE graft.people AS p SET v = p.v * 2 WHERE p.name = 'bob'")
      assert(cur.where(col("id") === 2).select("v").head().getDouble(0) == 40.0)

      // DELETE
      s2.sql("DELETE FROM graft.people WHERE id >= 4")
      assert(cur.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))

      // MERGE: update + delete + insert through one statement
      Seq((1L, "alice2", 11.0), (2L, "bob", -1.0), (9L, "zoe", 90.0))
        .toDF("id", "name", "v").createOrReplaceTempView("changes")
      s2.sql("""MERGE INTO graft.people AS t USING changes AS s ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = cur.select("id", "name", "v").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == Set((1L, "alice2", 11.0), (3L, "carol", 30.0), (9L, "zoe", 90.0)))

      // first-match-wins holds when an earlier clause's condition is
      // UNKNOWN: a NULL s.v must fall through DELETE into UPDATE
      Seq((1L, "nullv", null.asInstanceOf[java.lang.Double]))
        .toDF("id", "name", "v").createOrReplaceTempView("nullchg")
      s2.sql("""MERGE INTO graft.people AS t USING nullchg AS s ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.name = s.name""".stripMargin)
      assert(cur.where(col("id") === 1).select("name").head().getString(0) == "nullv",
        "NULL delete-condition must fall through to UPDATE, not mask it")

      // alias names colliding with the fixed t/s qualifiers (or swapped)
      // must remap capture-free: target AS s, source AS t
      Seq((3L, "carol3", 33.0)).toDF("id", "name", "v")
        .createOrReplaceTempView("swapchg")
      s2.sql("""MERGE INTO graft.people AS s USING swapchg AS t ON s.id = t.id
        |WHEN MATCHED THEN UPDATE SET s.name = t.name""".stripMargin)
      assert(cur.where(col("id") === 3).select("name").head().getString(0) == "carol3",
        "swapped t/s aliases corrupted the remap")

      // a one-sided ON equality (t.id = t.id) is refused, not silently
      // executed as the identifier join
      val e0 = intercept[Exception] {
        s2.sql("""MERGE INTO graft.people AS t USING changes AS s ON t.id = t.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e0.getMessage.contains("references one side twice"), e0.getMessage)

      // unsupported MERGE shapes fail at analysis with clear messages
      val e1 = intercept[Exception] {
        s2.sql("""MERGE INTO graft.people AS t USING changes AS s ON t.v = s.v
          |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e1.getMessage.contains("identifier columns"))
      val e2 = intercept[Exception] {
        s2.sql("""MERGE INTO graft.people AS t USING changes AS s ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)""".stripMargin)
      }
      assert(e2.getMessage.contains("INSERT *"))

      // INSERT OVERWRITE honors Spark's partition-overwrite mode
      val pdf = Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "name", "g")
      val pt = ManagedTable.create(s2, wh, "pt", pdf.schema, Seq.empty, Seq("g"))
      pt.append(pdf)
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      s2.sql("INSERT OVERWRITE graft.pt VALUES (9, 'z', 2)")
      def curPt = ManagedTable.load(s2, wh, "pt").get.read()
      assert(curPt.where(col("g") === 1).count() == 1, "untouched partition lost")
      assert(curPt.where(col("g") === 2).select("name").head().getString(0) == "z")
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      s2.sql("INSERT OVERWRITE graft.pt VALUES (5, 'w', 3)")
      assert(curPt.count() == 1, "static mode must replace the whole table")

      // INSERT ... PARTITION (static spec): values become literal columns,
      // positional arity excludes the named partition columns
      s2.sql("INSERT INTO graft.pt PARTITION (g=7) VALUES (70, 'p70')")
      assert(curPt.where(col("g") === 7).select("id").head().getLong(0) == 70)
      // static OVERWRITE replaces exactly the named partition
      s2.sql("INSERT OVERWRITE graft.pt PARTITION (g=7) VALUES (71, 'p71')")
      assert(curPt.where(col("g") === 7).count() == 1)
      assert(curPt.where(col("g") === 7).select("name").head().getString(0) == "p71")
      assert(curPt.where(col("g") === 3).count() == 1, "other partitions untouched")
      // static OVERWRITE with an empty source TRUNCATES the named
      // partition (SQL static semantics — dynamic overwrite would no-op)
      s2.sql("INSERT OVERWRITE graft.pt PARTITION (g=7) SELECT id, name FROM graft.pt WHERE false")
      assert(curPt.where(col("g") === 7).count() == 0, "empty static overwrite must truncate")
      assert(curPt.where(col("g") === 3).count() == 1, "other partitions untouched")
      // dynamic PARTITION entries take their values from the query —
      // Spark's equivalence with omitting the clause
      s2.sql("INSERT INTO graft.pt PARTITION (g) VALUES (90, 'dyn', 9)")
      assert(curPt.where(col("g") === 9).select("id").head().getLong(0) == 90)
      // non-partition columns are refused precisely
      val eNp = intercept[Exception] {
        s2.sql("INSERT INTO graft.pt PARTITION (name='x') VALUES (1, 2)") }
      assert(eNp.getMessage.contains("identity partition source"), eNp.getMessage)
      // a query that ALSO provides the static column is refused in every
      // shape — its per-row values would silently vanish (column list,
      // BY NAME)
      val eClash1 = intercept[Exception] {
        s2.sql("INSERT INTO graft.pt PARTITION (g=7) (id, name, g) VALUES (1, 'x', 9)") }
      assert(eClash1.getMessage.contains("PARTITION column"), eClash1.getMessage)
      val eClash2 = intercept[Exception] {
        s2.sql("INSERT INTO graft.pt PARTITION (g=7) BY NAME SELECT 1L AS id, 'x' AS name, 9 AS g") }
      assert(eClash2.getMessage.contains("PARTITION column"), eClash2.getMessage)
      // case-insensitive resolution (Spark's default): an upper-cased
      // spec key resolves to the schema column, and an upper-cased query
      // column still trips the overlap guard — it would otherwise be
      // silently replaced by the static value
      val eClash3 = intercept[Exception] {
        s2.sql("INSERT INTO graft.pt PARTITION (g=7) BY NAME SELECT 1L AS id, 'x' AS name, 9 AS G") }
      assert(eClash3.getMessage.contains("PARTITION column"), eClash3.getMessage)
      s2.sql("INSERT INTO graft.pt PARTITION (G=6) VALUES (60, 'up')")
      assert(curPt.where(col("g") === 6 && col("id") === 60).count() == 1,
        "upper-cased PARTITION key must resolve case-insensitively")

      // mixed static+dynamic spec: the static prefix pins the region,
      // the dynamic column rides the query; partitionOverwriteMode
      // decides the replaced set (Spark semantics)
      val p2df = Seq((1L, "a", 1, 10), (2L, "b", 1, 20), (3L, "c", 2, 10))
        .toDF("id", "name", "g", "h")
      val pt2 = ManagedTable.create(s2, wh, "pt2", p2df.schema, Seq.empty, Seq("g", "h"))
      pt2.append(p2df)
      def curPt2 = ManagedTable.load(s2, wh, "pt2").get.read()
      // static mode: the WHOLE g=1 prefix region is replaced — including
      // h=20, a tuple the batch never writes
      s2.sql("INSERT OVERWRITE graft.pt2 PARTITION (g=1, h) VALUES (7, 'n', 10)")
      assert(curPt2.where(col("g") === 1).count() == 1)
      assert(curPt2.where(col("g") === 1 && col("h") === 20).count() == 0,
        "static mode must clear stale dynamic siblings of the prefix")
      assert(curPt2.where(col("g") === 2).count() == 1, "outside the static prefix untouched")
      // dynamic mode: only the tuples the batch writes are replaced
      ManagedTable.load(s2, wh, "pt2").get
        .append(Seq((8L, "x", 1, 20)).toDF("id", "name", "g", "h"))
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      s2.sql("INSERT OVERWRITE graft.pt2 PARTITION (g=1, h) VALUES (9, 'y', 10)")
      assert(curPt2.where(col("g") === 1 && col("h") === 10).select("id").head().getLong(0) == 9)
      assert(curPt2.where(col("g") === 1 && col("h") === 20).count() == 1,
        "dynamic mode must keep untouched tuples of the prefix")
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      // a dynamic column missing from an explicit column list is refused
      val eMiss = intercept[Exception] {
        s2.sql("INSERT INTO graft.pt2 PARTITION (g=1, h) (id, name) VALUES (1, 'x')") }
      assert(eMiss.getMessage.contains("must be provided"), eMiss.getMessage)
      // an identity column the spec OMITS is dynamic too (Spark's rule:
      // fully static only when every partition column is named) — so
      // dynamic mode keeps the prefix's untouched tuples
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      s2.sql("INSERT OVERWRITE graft.pt2 PARTITION (g=1) VALUES (11, 'o', 10)")
      assert(curPt2.where(col("g") === 1 && col("h") === 20).count() == 1,
        "omitted identity column must be treated as dynamic under dynamic mode")
      assert(curPt2.where(col("g") === 1 && col("h") === 10).select("id").head().getLong(0) == 11)
      s2.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

      // metadata suffixes are read-only — precise refusal, nothing mutated
      val e3 = intercept[Exception] {
        s2.sql("DELETE FROM graft.`people$files` WHERE 1=1")
      }
      assert(e3.getMessage.contains("read-only"), e3.getMessage)
      assert(cur.count() == 3)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: full-sync clauses, order folding, refusals") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val b = org.apache.spark.sql.SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions().apply(_))
      base.conf.getAll.foreach { case (k, v) => b.config(k, v) }
      val s2 = b.getOrCreate()
      import s2.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlmbs").toString
      s2.conf.set("spark.graft.warehouse", wh)
      def mk(name: String): ManagedTable = {
        val df = (1 to 20).map(i => (i.toLong, s"n$i", i * 10.0)).toDF("id", "name", "v")
        val t = ManagedTable.create(s2, wh, name, df.schema, Seq("id"))
        t.append(df); t
      }
      def cur(name: String) = ManagedTable.load(s2, wh, name).get.read()

      // all five clause kinds in one statement: source = ids 1..10 (keep)
      // + 31..33 (insert); targets 11..20 unmatched by source
      mk("sync")
      (1L to 10L).map(i => (i, s"s$i", i * 100.0))
        .union(Seq((31L, "new31", 1.0), (32L, "new32", 2.0), (33L, "new33", 3.0)))
        .toDF("id", "name", "v").createOrReplaceTempView("snap")
      s2.sql("""MERGE INTO graft.sync AS t USING snap AS s ON t.id = s.id
        |WHEN MATCHED AND s.v > 900 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED AND s.id < 33 THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.id >= 18 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.v > 140 THEN UPDATE SET t.name = 'stale'
        |""".stripMargin)
      val got = cur("sync").select("id", "name", "v").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      assert(!got.contains(10L), "matched s.v>900 deleted")
      assert(got(5L) == ("n5", 500.0), "matched updated v only")
      assert(got(31L) == ("new31", 1.0) && got(32L) == ("new32", 2.0))
      assert(!got.contains(33L), "insert condition filtered")
      assert(!got.contains(18L) && !got.contains(19L) && !got.contains(20L),
        "by-source delete fired on unmatched ids >= 18")
      assert(got(15L) == ("stale", 150.0) && got(17L) == ("stale", 170.0),
        "by-source update flagged v>140 survivors")
      assert(got(11L) == ("n11", 110.0), "unmatched row hit by no clause untouched")

      // clause order folds first-match-wins: UPDATE written BEFORE DELETE
      // with overlapping conditions — rows matching both must UPDATE
      mk("ordtest")
      Seq((1L, "x", 0.0)).toDF("id", "name", "v").createOrReplaceTempView("one")
      s2.sql("""MERGE INTO graft.ordtest AS t USING one AS s ON t.id = s.id
        |WHEN NOT MATCHED BY SOURCE AND t.v > 100 THEN UPDATE SET t.name = 'kept'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val ord = cur("ordtest").select("id", "name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ord.keySet == (Set(1L) ++ (11L to 20L)), "v<=100 unmatched rows deleted")
      assert((11L to 20L).forall(ord(_) == "kept"), "earlier UPDATE masks DELETE")
      assert(ord(1L) == "n1", "matched row untouched by by-source clauses")

      // a NULL earlier-clause condition must fall through (not mask):
      // DELETE cond UNKNOWN → row falls to UPDATE
      mk("nullbs")
      Seq((99L, "x", 0.0)).toDF("id", "name", "v").createOrReplaceTempView("none")
      s2.sql("""MERGE INTO graft.nullbs AS t USING none AS s ON t.id = s.id
        |WHEN NOT MATCHED BY SOURCE AND nullif(t.v, t.v) > 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.name = 'fell'""".stripMargin)
      assert(cur("nullbs").count() == 20, "UNKNOWN delete cond must not delete")
      assert(cur("nullbs").where(col("name") === "fell").count() == 20)

      // refusals: source reference in a BY SOURCE clause; duplicate clause
      val e1 = intercept[Exception] {
        s2.sql("""MERGE INTO graft.sync AS t USING snap AS s ON t.id = s.id
          |WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE""".stripMargin)
      }
      assert(e1.getMessage.contains("cannot reference the source"), e1.getMessage)
      val e2 = intercept[Exception] {
        s2.sql("""MERGE INTO graft.sync AS t USING snap AS s ON t.id = s.id
          |WHEN NOT MATCHED BY SOURCE AND t.v > 0 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      }
      assert(e2.getMessage.contains("at most one WHEN NOT MATCHED BY SOURCE DELETE"),
        e2.getMessage)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("DML predicates may carry subqueries over graft tables") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val b = org.apache.spark.sql.SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions().apply(_))
      base.conf.getAll.foreach { case (k, v) => b.config(k, v) }
      val s2 = b.getOrCreate()
      val wh = java.nio.file.Files.createTempDirectory("graft-sqsub").toString
      s2.conf.set("spark.graft.warehouse", wh)
      s2.sql("CREATE TABLE graft.tt (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.identifier-fields'='id')")
      s2.sql("INSERT INTO graft.tt VALUES (1,'a'),(2,'b'),(3,'c')")
      s2.sql("CREATE TABLE graft.flagged (id BIGINT)")
      s2.sql("INSERT INTO graft.flagged VALUES (2)")
      // IN-subquery DELETE: the condition's inner plan resolves through
      // the same extension rules as any query
      s2.sql("DELETE FROM graft.tt WHERE id IN (SELECT id FROM graft.flagged)")
      assert(s2.sql("SELECT id FROM graft.tt ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // scalar-subquery UPDATE
      s2.sql("UPDATE graft.tt SET v = 'top' WHERE id = (SELECT max(id) FROM graft.tt)")
      assert(s2.sql("SELECT v FROM graft.tt WHERE id = 3").head().getString(0) == "top")
      // a subquery over the PARTITION column of a keyless partitioned
      // table is NOT tuple-decidable per the metadata-delete rules — it
      // must fall through to the row-level path and still be correct
      s2.sql("CREATE TABLE graft.logs2 (id BIGINT, day STRING) PARTITIONED BY (day)")
      s2.sql("INSERT INTO graft.logs2 VALUES (1,'d1'),(2,'d2'),(3,'d1')")
      s2.sql("CREATE TABLE graft.dropdays (day STRING)")
      s2.sql("INSERT INTO graft.dropdays VALUES ('d1')")
      s2.sql("DELETE FROM graft.logs2 WHERE day IN (SELECT day FROM graft.dropdays)")
      assert(s2.sql("SELECT id FROM graft.logs2").collect().map(_.getLong(0)).toSeq == Seq(2L))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("SQL DELETE on a whole partition region is a metadata-only commit") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val b = org.apache.spark.sql.SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions().apply(_))
      base.conf.getAll.foreach { case (k, v) => b.config(k, v) }
      val s2 = b.getOrCreate()
      import s2.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-sqlmd").toString
      s2.conf.set("spark.graft.warehouse", wh)
      val df = (1 to 60).map(i => (i.toLong, s"d2024-01-${"%02d".format(i % 6 + 1)}", i * 1.0))
        .toDF("id", "day", "v")
      val t = ManagedTable.create(s2, wh, "events_md", df.schema, Seq.empty, Seq("day"))
      t.append(df)
      val before = t.filesMetadata().select("path").as[String].collect().toSet
      // the SQL retention shape: qualified alias + IN list over the region
      s2.sql("DELETE FROM graft.events_md AS e WHERE e.day IN ('d2024-01-01', 'd2024-01-02')")
      val t2 = ManagedTable.load(s2, wh, "events_md").get
      assert(t2.read().count() == 40)
      assert(t2.read().filter(col("day") < "d2024-01-03").count() == 0)
      val after = t2.filesMetadata().select("path").as[String].collect().toSet
      assert(after.subsetOf(before) && after.nonEmpty,
        "SQL region delete must drop manifest entries, not rewrite files")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
