package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image kernels over the [[Multimodal]] plumbing, built on the
  * JDK's own codecs (`javax.imageio` ships PNG/JPEG/BMP/GIF readers — no
  * external libraries): decode, pixel statistics, resize, PNG encode.
  * Audio has its own real kernels ([[AudioKernels]], `javax.sound
  * .sampled`); only video stays behind the stub seam ([[Multimodal]]) —
  * the JDK carries no video codec.
  *
  * Everything runs inside the [[Multimodal.extractFeatures]] /
  * [[Multimodal.transformContent]] mapPartitions boundary, so the
  * partitioning/batching contract is unchanged; only the kernels are
  * real now.
  */
object ImageKernels {

  // ImageIO defaults to a FILE-backed stream cache: every decode/encode
  // creates (and deletes) a temp file on local disk, which both costs a
  // disk round-trip per image and funnels parallel codec tasks through
  // the filesystem. Memory-cached streams produce bit-identical codec
  // output; these kernels only ever touch in-memory byte arrays. Round 12
  // (ADVICE r11): the kernels construct explicit MemoryCache image
  // streams below instead of flipping the PROCESS-GLOBAL
  // `ImageIO.setUseCache` default, which silently changed behavior for
  // every other ImageIO user in a consumer's JVM.

  /** Decode + per-band pixel statistics:
    * `[width, height, bands, sumBand0, sumBand1, sumBand2]` — sums are
    * exact integers (a 4096×4096 8-bit band sums below 2^32, and the
    * query layer keeps test images far smaller than Float's 2^24 exact
    * range), so an external oracle can reproduce them bit-for-bit for
    * analytically-constructed images. Returns all zeros for
    * undecodable/null payloads (the fail-soft contract of a corpus scan —
    * a corrupt blob must not kill the stage).
    */
  val pixelStatsExtractor: Multimodal.FeatureExtractor = bytes => {
    val img = decode(bytes)
    if (img == null) Array.fill(6)(0f)
    else {
      val raster = img.getRaster
      val bands = math.min(raster.getNumBands, 3)
      val sums = new Array[Long](3)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var b = 0
          while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      Array(img.getWidth.toFloat, img.getHeight.toFloat, raster.getNumBands.toFloat,
        sums(0).toFloat, sums(1).toFloat, sums(2).toFloat)
    }
  }

  /** Real resize through the JDK raster pipeline: decode → bilinear
    * `drawImage` into the target RGB raster → PNG re-encode. Undecodable
    * payloads pass through as null content with the requested dims (same
    * fail-soft contract as [[pixelStatsExtractor]]).
    */
  def resizePng(w: Int, h: Int): Multimodal.MediaTransform = bytes => {
    val img = decode(bytes)
    if (img == null) (null, w, h)
    else {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      (encodePng(out), w, h)
    }
  }

  private def decode(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else
      // the JDK decoders throw RUNTIME exceptions on malformed headers
      // (AIOOBE/NegativeArraySize/IAE), not just IOException — fail-soft
      // must cover them all or one corrupt blob kills the scan stage
      try
        // ImageIO.read(ImageInputStream) closes the stream itself — an
        // explicit close here would throw "closed" into the fail-soft
        // catch and turn every good image into null
        ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes)))
      catch { case _: Exception => null }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { ImageIO.write(img, "png", ios); ios.flush() } finally ios.close()
    bos.toByteArray
  }

  /** Deterministic test-image generator: for each id, a PNG of
    * id-derived dimensions split into two vertical halves of id-derived
    * RGB colors — every pixel statistic is a closed-form function of the
    * id, so a SQL oracle can check a REAL encode→decode→pixel-walk
    * round-trip value-for-value. Runs in the same mapPartitions shape as
    * the kernels (encode work happens on executors).
    */
  def synthesizePngs(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    Multimodal.widenForCompute(ids.select(col(idCol).cast(LongType))).mapPartitions { rows =>
      rows.map { r =>
        val id = Multimodal.requireId(r)
        Row(id, "image/png", encodePng(syntheticImage(id)))
      }
    }(enc)
  }

  /** The closed-form image for `id` — see [[synthesizePngs]]. Kept
    * separate so specs can pixel-check the generator itself.
    */
  def syntheticImage(id: Long): BufferedImage = {
    val w = 16 + (id % 16).toInt
    val h = 8 + (id % 8).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val left = rgb(id * 3 % 256, id * 5 % 256, id * 7 % 256)
    val right = rgb(id * 11 % 256, id * 13 % 256, id * 17 % 256)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) left else right)
        x += 1
      }
      y += 1
    }
    img
  }

  private def rgb(r: Long, g: Long, b: Long): Int =
    (r.toInt << 16) | (g.toInt << 8) | b.toInt
}
