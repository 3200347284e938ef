package graft.ops

import graft.SharedSpark
import graft.multimodal.{ImageKernels, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real JDK-codec image kernels ([[ImageKernels]]): encode→decode pixel
  * round-trips, resize through the raster pipeline, fail-soft decode, and
  * JPEG dims — the parts the `multimodal_pixel_stats` oracle can't see.
  */
class ImageKernelsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("PNG encode→decode→pixel-walk reproduces the closed-form sums") {
    for (id <- Seq(0L, 1L, 7L, 100L, 255L, 1234L)) {
      val png = ImageKernels.encodePng(ImageKernels.syntheticImage(id))
      // PNG magic
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val f = ImageKernels.pixelStatsExtractor(png)
      val w = 16 + (id % 16); val h = 8 + (id % 8)
      val lw = w / 2; val rw = w - lw
      assert(f(0) == w && f(1) == h && f(2) == 3f, s"dims for id=$id")
      assert(f(3) == h * (lw * (id * 3 % 256) + rw * (id * 11 % 256)), s"sum_r id=$id")
      assert(f(4) == h * (lw * (id * 5 % 256) + rw * (id * 13 % 256)), s"sum_g id=$id")
      assert(f(5) == h * (lw * (id * 7 % 256) + rw * (id * 17 % 256)), s"sum_b id=$id")
    }
  }

  test("resize: solid image keeps its color at the new dimensions") {
    val src = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = src.createGraphics()
    g.setColor(new java.awt.Color(40, 90, 200)); g.fillRect(0, 0, 64, 64); g.dispose()
    val (out, w, h) = ImageKernels.resizePng(16, 12)(ImageKernels.encodePng(src))
    assert(w == 16 && h == 12)
    val f = ImageKernels.pixelStatsExtractor(out)
    assert(f(0) == 16f && f(1) == 12f)
    // bilinear scaling of a constant field is constant
    assert(f(3) == 16 * 12 * 40f && f(4) == 16 * 12 * 90f && f(5) == 16 * 12 * 200f)
  }

  test("JPEG decodes with correct dimensions; corrupt bytes fail soft") {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ImageKernels.syntheticImage(42L), "jpg", bos)
    val f = ImageKernels.pixelStatsExtractor(bos.toByteArray)
    assert(f(0) == (16 + 42 % 16).toFloat && f(1) == (8 + 42 % 8).toFloat && f(2) == 3f)
    assert(ImageKernels.pixelStatsExtractor("not an image".getBytes).forall(_ == 0f))
    assert(ImageKernels.pixelStatsExtractor(null).forall(_ == 0f))
  }

  test("kernels run inside the Multimodal mapPartitions plumbing") {
    val ids = Seq(1L, 2L, 3L, 17L).toDF("doc_id")
    val assets = ImageKernels.synthesizePngs(spark, ids, "doc_id")
    assert(assets.select("media_type").distinct().as[String].collect().toSeq ==
      Seq("image/png"))
    val stats = Multimodal.extractFeatures(spark, assets, "content", "asset_id",
      ImageKernels.pixelStatsExtractor)
      .select(col("asset_id"), element_at(col("features"), 1).as("w"))
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toMap
    assert(stats == Map(1L -> 17f, 2L -> 18f, 3L -> 19f, 17L -> 17f))
    // resize stage over the same plumbing
    val resized = Multimodal.transformContent(spark, assets, "content", "asset_id",
      ImageKernels.resizePng(8, 8))
    val dims = resized.select("width", "height").distinct().collect()
    assert(dims.length == 1 && dims.head.getInt(0) == 8 && dims.head.getInt(1) == 8)
    val rf = ImageKernels.pixelStatsExtractor(
      resized.where(col("asset_id") === 1L).select("content").head().getAs[Array[Byte]](0))
    assert(rf(0) == 8f && rf(1) == 8f)
  }
}
