package graft.ops

import graft.SharedSpark
import graft.functions.Conversions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecimalFromBytesSpec extends AnyFunSuite with SharedSpark {

  private def b64(unscaled: BigInt): String =
    java.util.Base64.getEncoder.encodeToString(unscaled.toByteArray)

  test("positive, negative, and >long unscaled values decode exactly") {
    import spark.implicits._
    val rows = Seq(
      (b64(BigInt(123456)), "1234.56"),
      (b64(BigInt(-987654)), "-9876.54"),
      (b64(BigInt("123456789012345678901234567890")),
        "1234567890123456789012345678.90"),
      (b64(BigInt(0)), "0.00"))
    val out = rows.toDF("b", "expect")
      .select(Conversions.decimalFromBase64(col("b"), 38, 2).cast("string").as("got"),
        col("expect"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("null input → null output (null-intolerant expression)") {
    import spark.implicits._
    val out = Seq(Option.empty[String]).toDF("b")
      .select(Conversions.decimalFromBase64(col("b"), 18, 2).as("d")).collect()
    assert(out.head.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(b64(BigInt(-1)), b64(BigInt(255)), b64(BigInt(-256))).toDF("b")
      .select(Conversions.decimalFromBase64(col("b"), 10, 3).cast("string").as("d"))
    val withCodegen = df.collect().map(_.getString(0)).toSeq
    // interpreted fallback
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect().map(_.getString(0)).toSeq
      assert(withCodegen == interp)
      assert(withCodegen == Seq("-0.001", "0.255", "-0.256"))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("float_vector_dot: null elements yield null (both codegen paths), matching zip_with") {
    import graft.similarity.Knn
    val df = spark.sql(
      """SELECT array(1.0F, CAST(NULL AS FLOAT), 2.0F) AS a,
        |       array(1.0F, 1.0F, 1.0F) AS b,
        |       array(3.0F, 4.0F) AS c""".stripMargin)
    def run() = df.select(
      Knn.dot(col("a"), col("b")).as("with_null"),
      Knn.dot(col("c"), col("c")).as("clean"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("builtin_null")).collect().head
    val r = run()
    assert(r.isNullAt(0), "null element must produce null, not 0-contribution")
    assert(r.isNullAt(2), "built-in formulation agrees")
    assert(r.getDouble(1) == 25.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val i = run()
      assert(i.isNullAt(0) && i.getDouble(1) == 25.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL surface via GraftExtensions: decimal_from_bytes") {
    // extensions apply at session construction — build a sibling session on
    // the same SparkContext rather than reusing the shared one
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // While this session exists it is the JVM's DEFAULT session: suites
      // running concurrently on threads with no active session resolve
      // SQLConf.get against it. Copy the shared session's runtime conf so
      // that fallback is behavior-identical (a bare builder here made
      // events.parquet's nanos ts infer as TIMESTAMP_NTZ mid-window and
      // failed every concurrently-running events-table suite).
      val b = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions().apply(_))
      base.conf.getAll.foreach { case (k, v) => b.config(k, v) }
      val s2 = b.getOrCreate()
      val r = s2.sql(
        s"SELECT CAST(decimal_from_bytes(unbase64('${b64(BigInt(314159))}'), 18, 5) AS STRING) AS d")
        .collect().head.getString(0)
      assert(r == "3.14159")
      val row = s2.sql(
        """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  graft_hamming(5L, 6L) AS h,
          |  graft_lang_id('the cat and the dog of the house') AS l""".stripMargin)
        .collect().head
      assert(row.getDouble(0) == 1.0 && row.getInt(1) == 2 && row.getString(2) == "en")
      val txt = s2.sql(
        """SELECT size(graft_tokens('a b c')) AS nt,
          |  graft_token_count('hello, world!') AS tc,
          |  graft_fingerprint('x') = graft_fingerprint('x') AS same""".stripMargin)
        .collect().head
      assert(txt.getInt(0) == 3 && txt.getInt(1) > 0 && txt.getBoolean(2))
      val sb = s2.sql(
        """SELECT graft_bucket('42') AS b,
          |  graft_dup_bigram_frac('a b a b a b') AS f""".stripMargin)
        .collect().head
      // md5('42') = a1d0c6e8... -> 0xa1d0c6e8 % 10000, stable forever
      assert(sb.getLong(0) == 2714814184L % 10000)
      // 5 bigrams, 2 distinct -> 0.6
      assert(sb.getDouble(1) == 0.6)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
