package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Driver-side parquet file writer for SMALL committed file groups.
  *
  * A trickle micro-batch's group is a few thousand rows; routing it
  * through `df.write` pays the whole distributed-write machinery —
  * job scheduling, the insert command's own planning pass, the commit
  * protocol's staging/rename dance — which at that size is pure fixed
  * cost (~100 ms against ~1 ms of actual encoding). This writes the rows
  * straight from the driver with Spark's OWN parquet row writer
  * ([[ParquetWriteSupport]], the exact WriteSupport a distributed write
  * uses), so the bytes on disk are the same kind of parquet a task would
  * have produced and the read path needs no changes.
  *
  * The reference's writers are likewise in-process appenders — its commit
  * unit is a few thousand events flushed by one JVM
  * (SINK/tableoperator/IcebergTableWriterFactory.java:42-46,
  * SINK/BatchConfig.java:16-19); a Spark JOB per 2048-row file is the
  * part of the rebuild that had no analogue.
  */
private[graft] object LocalCommit {

  /** Can every column type round-trip through the driver-side converter?
    * (Variant/UDTs stay on the distributed path — rare, and not worth a
    * bespoke converter here.)
    */
  def writableSchema(dt: DataType): Boolean = dt match {
    case s: StructType       => s.fields.forall(f => writableSchema(f.dataType))
    case a: ArrayType        => writableSchema(a.elementType)
    case m: MapType          => writableSchema(m.keyType) && writableSchema(m.valueType)
    case _: UserDefinedType[_] | _: VariantType => false
    case _: CalendarIntervalType => false
    case _                   => true
  }

  private class RowBuilder(out: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](out) {
    override def self(): RowBuilder = this
    override def getWriteSupport(conf: Configuration) = new ParquetWriteSupport
  }

  /** An [[InternalRow]] parquet writer over a PREPARED conf (schema
    * already stamped via [[prepareWriteConf]]) — runs anywhere a
    * Configuration travels, including executor tasks (the V2 delta
    * writers stage their per-task files through this).
    */
  def internalRowWriter(file: Path, conf: Configuration,
                        codec: CompressionCodecName): ParquetWriter[InternalRow] =
    new RowBuilder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf).withCompressionCodec(codec).build()

  /** Stamp `schema` + the session's parquet write options into a conf —
    * the exact keys a distributed write's tasks receive
    * (ParquetFileFormat.prepareWrite), so [[internalRowWriter]] bytes are
    * indistinguishable from a task's. Returns the session codec too.
    */
  def prepareWriteConf(spark: SparkSession, schema: StructType)
      : (Configuration, CompressionCodecName) = {
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    val sql = spark.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sql.getConf(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED).toString)
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sql.getConf(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set(SQLConf.CASE_SENSITIVE.key, sql.caseSensitiveAnalysis.toString)
    val codec =
      try CompressionCodecName.fromConf(
        sql.parquetCompressionCodec.toUpperCase(java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => CompressionCodecName.SNAPPY }
    (conf, codec)
  }

  /** Write `rows` (external Rows of `schema`) as one parquet file. */
  def writeParquet(spark: SparkSession, file: Path, schema: StructType,
                   rows: Iterable[Row]): Unit = {
    // newHadoopConf (inside prepareWriteConf) carries every set spark.sql.*
    // entry, the same channel a distributed write's tasks read parquet
    // options from; the keys ParquetFileFormat.prepareWrite stamps into the
    // task conf are set explicitly (ParquetWriteSupport.init and
    // SparkToParquetSchemaConverter read them back raw, with no defaults).
    val (conf, codec) = prepareWriteConf(spark, schema)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    val w = internalRowWriter(file, conf, codec)
    try rows.foreach(r => w.write(toCatalyst(r).asInstanceOf[InternalRow]))
    finally w.close()
  }

  /** Driver-side column bounds with the SAME orderings the distributed
    * write's observe aggregation produces: numeric domains numerically,
    * strings by UTF-8 unsigned-byte order (Spark's UTF8String min/max —
    * see [[ColBounds.intersects]] on why UTF-16 compare would misprune).
    */
  def bounds(rows: Iterable[Row], schema: StructType,
             statCols: Seq[(String, String)]): Map[String, ColBounds] = {
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    statCols.flatMap { case (c, tag) =>
      val idx = schema.fieldIndex(c)
      val vs = rows.iterator.map(_.get(idx)).filter(_ != null)
      if (vs.isEmpty) None
      else tag match {
        case "i" =>
          val longs = rows.iterator.map(_.get(idx)).collect {
            case n: java.lang.Number => n.longValue() }
          if (longs.isEmpty) None
          else { val l = longs.toSeq
                 Some(c -> ColBounds("i", l.min, l.max, rows.size - l.length,
                   l.distinct.length)) } // driver-local rows: exact NDV is free
        case "f" =>
          val ds = rows.iterator.map(_.get(idx)).collect {
            case n: java.lang.Number => n.doubleValue() }
          if (ds.isEmpty) None
          else { val d = ds.toSeq
                 Some(c -> ColBounds("f", d.min, d.max, rows.size - d.length,
                   d.distinct.length)) }
        case "s" =>
          val ss = rows.iterator.map(_.get(idx)).collect { case s: String => s }.toSeq
          if (ss.isEmpty) None
          else Some(c -> ColBounds("s",
            ss.reduce((a, b) => if (utf8Lt(a, b)) a else b),
            ss.reduce((a, b) => if (utf8Lt(a, b)) b else a),
            rows.size - ss.length, ss.distinct.length))
        case _ => None
      }
    }.toMap
  }
}
