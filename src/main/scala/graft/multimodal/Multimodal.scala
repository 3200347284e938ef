package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus the Spark-side plumbing (schema, batch shape, partition
  * strategy) for decode / feature-extraction stages.
  *
  * IMAGE kernels are REAL — [[ImageKernels]] decodes/resizes/encodes
  * through the JDK's own `javax.imageio` codecs (PNG/JPEG/BMP/GIF) inside
  * this plumbing. AUDIO kernels are REAL too — [[AudioKernels]] decodes
  * WAV/AIFF/AU PCM through `javax.sound.sampled.AudioSystem`, also
  * JDK-native and headless. VIDEO is real for the intra-frame family —
  * [[VideoKernels]] demuxes RIFF/AVI containers (pure byte walking) and
  * decodes MJPEG/PNG frames through the image codecs; only INTER-frame
  * codecs (H.264/VP9) stay behind the [[FrameSampler]] stub seam (the
  * JDK genuinely carries none, and this container has no external media
  * libraries): the deterministic fake keeps that pipeline testable end
  * to end, and a real implementation swaps the function, nothing else —
  * the `mapPartitions` boundary, the output schema, and the partitioning
  * contract stay identical.
  */
object Multimodal {

  /** Guarded id read for the kernel stages: a null id (or a non-numeric
    * string id nulled by the cast) would otherwise surface as an opaque
    * executor NPE deep inside mapPartitions.
    */
  private[multimodal] def requireId(r: org.apache.spark.sql.Row): Long = {
    require(!r.isNullAt(0),
      "null (or non-castable) asset id in multimodal stage — validate/filter ids upstream")
    r.getLong(0)
  }

  /** Canonical media-asset schema: content + typed metadata, the pattern
    * for storing images/audio/video alongside tabular columns.
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image/png, audio/wav, ...
    StructField("content", BinaryType),      // opaque payload
    StructField("width", IntegerType),       // media metadata (nullable)
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Media kernels are COMPUTE-bound, not byte-bound: Spark sizes scan
    * splits by input bytes, so a small asset list (or a compact id
    * column) plans to fewer splits than the session has cores and the
    * whole codec chain runs on a handful of tasks while the rest of the
    * box idles (guide §2.6/§6 — measured: the 500-asset video demux ran
    * as ONE task, 1/32 of the machine). Widen ONLY when the input is
    * narrower than the default parallelism: at corpus scale the scan is
    * already wider and this is a no-op — no shuffle, no plan change.
    * Round-robin repartition keeps Spark's sort-before-repartition
    * determinism; per-row kernels are order-independent.
    */
  private[multimodal] def widenForCompute(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Estimate the scan's split count from LOGICAL stats (bytes ÷ max
    // split size) instead of df.rdd.getNumPartitions — the latter forced
    // a full physical planning pass per call just to read a partition
    // count (ADVICE r11). Same decision at both ends of the scale: a
    // small synthetic asset list estimates to a handful of splits and
    // widens; a corpus-scale scan estimates wider than the session and
    // stays untouched (no shuffle, no plan change). A plan that ALREADY
    // repartitions at least this wide (a chained kernel: synthesize
    // widened the id list, extract widens its output) is left alone —
    // stats still look small there, and a second round-robin exchange
    // would shuffle the synthesized binary payloads, not id rows
    // (measured: pixel stats 0.25 → 0.34 s before this guard).
    val alreadyWide = df.queryExecution.analyzed.collectFirst {
      case r: Repartition if r.numPartitions >= target => r
      case r: RepartitionByExpression
        if r.optNumPartitions.exists(_ >= target) => r
    }.isDefined
    if (alreadyWide) return df
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val splits = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit + 1
    if (splits < target) df.repartition(target) else df
  }

  /** Cheap binary metadata (native expressions, no decode): size, digest,
    * magic-byte sniff. Works on any binary column at full scan speed.
    */
  def binaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_length", octet_length(col(binCol)))
      .withColumn("sha256", sha2(col(binCol), 256))
      .withColumn("magic", hex(substring(col(binCol), 1, 4)))

  /** The decode/feature kernel signature: bytes → fixed-width feature
    * vector. Runs inside executors, one invocation per asset.
    */
  type FeatureExtractor = Array[Byte] => Array[Float]

  /** STUB decode — deterministic fake standing in for a real decoder
    * (see [[ImageKernels]]/[[AudioKernels]] for the real ones). Produces
    * a stable 8-dim "feature" from content bytes so downstream stages
    * (ANN, dedup) are exercised with real plumbing.
    */
  val stubExtractor: FeatureExtractor = bytes => {
    if (bytes == null) Array.fill(8)(0f)
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { out(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      out
    }
  }

  /** Integer-exact stub variant: per-lane byte sums, no normalization.
    * Every output value is an integer exactly representable in Float, so an
    * external SQL oracle can reproduce it bit-for-bit — used by the
    * oracle-checked `multimodal_features` query. [[stubExtractor]] stays
    * the normalized variant for ANN-shaped tests.
    */
  val laneSumExtractor: FeatureExtractor = bytes => {
    if (bytes == null) Array.fill(8)(0f)
    else {
      val acc = new Array[Long](8)
      var i = 0
      while (i < bytes.length) { acc(i % 8) += (bytes(i) & 0xff); i += 1 }
      acc.map(_.toFloat)
    }
  }

  /** Feature extraction over binary assets via mapPartitions: batch-shaped
    * like a Pandas-UDF/mapInPandas stage (per-partition setup cost paid
    * once — a real decoder would initialize its codec here), repartitioned
    * first so decode work spreads evenly regardless of upstream file
    * layout (media blobs skew partition sizes badly otherwise).
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, binCol: String, idCol: String,
                      extractor: FeatureExtractor = stubExtractor,
                      partitions: Option[Int] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val prepared = partitions.map(df.repartition(_)).getOrElse(widenForCompute(df))
      .select(col(idCol).cast(LongType), col(binCol))
    prepared.mapPartitions { rows =>
      // per-partition init seam: real codecs open here, once
      rows.map { r =>
        val id = Multimodal.requireId(r)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, extractor(bytes).toSeq)
      }
    }(enc)
  }

  /** Content → content transform kernel (resize, transcode, re-encode):
    * bytes in, bytes + updated metadata out.
    */
  type MediaTransform = Array[Byte] => (Array[Byte], Int, Int)

  /** STUB resize — real impl decodes, scales to (w, h), re-encodes. The
    * stub truncates deterministically so size-reduction and metadata
    * update are observable in tests.
    */
  def stubResize(w: Int, h: Int): MediaTransform = bytes => {
    if (bytes == null) (null, w, h)
    else (bytes.take(math.max(4, bytes.length / 4)), w, h)
  }

  /** Resize stage: same mapPartitions shape as [[extractFeatures]] —
    * output keeps the asset id, replaces content, stamps new dimensions.
    */
  def transformContent(spark: SparkSession, df: DataFrame, binCol: String, idCol: String,
                       transform: MediaTransform,
                       partitions: Option[Int] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val prepared = partitions.map(df.repartition(_)).getOrElse(widenForCompute(df))
      .select(col(idCol).cast(LongType), col(binCol))
    prepared.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (out, w, h) = transform(bytes)
        Row(Multimodal.requireId(r), out, w, h)
      }
    }(enc)
  }

  /** Frame-sampling kernel: video bytes → sampled frames. */
  type FrameSampler = Array[Byte] => Seq[Array[Byte]]

  /** STUB sampler — real impl seeks keyframes; the stub chunks the payload
    * into `frameSize` slices and keeps every `everyN`-th.
    */
  def stubFrameSampler(frameSize: Int, everyN: Int): FrameSampler = bytes =>
    if (bytes == null) Seq.empty
    else bytes.grouped(frameSize).grandSampled(everyN)

  private implicit class SampleOps(private val it: Iterator[Array[Byte]]) extends AnyVal {
    def grandSampled(n: Int): Seq[Array[Byte]] =
      it.zipWithIndex.collect { case (f, i) if i % n == 0 => f }.toSeq
  }

  /** Frame-sample stage: one input asset fans out to (asset_id, frame_idx,
    * frame) rows — the explode-shaped media stage. Fan-out happens on the
    * executors (iterator flatMap), so a 1 GB video never materializes all
    * frames in one row.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, binCol: String, idCol: String,
                   sampler: FrameSampler,
                   partitions: Option[Int] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val prepared = partitions.map(df.repartition(_)).getOrElse(widenForCompute(df))
      .select(col(idCol).cast(LongType), col(binCol))
    prepared.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        sampler(bytes).iterator.zipWithIndex.map { case (f, i) => Row(Multimodal.requireId(r), i, f) }
      }
    }(enc)
  }
}
