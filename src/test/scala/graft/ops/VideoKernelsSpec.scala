package graft.ops

import graft.SharedSpark
import graft.multimodal.{ImageKernels, Multimodal, VideoKernels}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real AVI container kernels ([[VideoKernels]]): the RIFF writer and
  * demuxer round-trip frame payloads byte-exactly (including odd-length
  * word-alignment), the frame sampler keeps every Nth real frame, the
  * stats kernel matches the per-frame image closed forms, and corrupt
  * containers fail soft.
  */
class VideoKernelsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("AVI encode → demux round-trips frame payloads byte-exactly (odd sizes too)") {
    val frames = Seq(
      Array[Byte](1, 2, 3),            // odd length → pad byte exercised
      Array[Byte](4, 5, 6, 7),
      Array.tabulate[Byte](255)(_.toByte)) // odd again
    val avi = VideoKernels.encodeAvi(frames, 16, 8)
    val back = VideoKernels.extractFrames(avi)
    assert(back.length == 3)
    assert(back.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq })
    // sampler: every 2nd frame
    val sampled = VideoKernels.aviFrameSampler(2)(avi)
    assert(sampled.length == 2 && sampled.head.toSeq == frames.head.toSeq &&
      sampled(1).toSeq == frames(2).toSeq)
  }

  test("PNG frames inside the container decode to the closed-form pixel sums") {
    val id = 9L
    val n = 2 + Math.floorMod(id, 4).toInt
    val frames = (0 until n).map(i =>
      ImageKernels.encodePng(ImageKernels.syntheticImage(id + i)))
    val avi = VideoKernels.encodeAvi(frames, 16, 8, fourccCodec = "png ")
    val f = VideoKernels.videoStatsExtractor(avi).map(_.toLong)
    def fr(i: Int) = {
      val fid = id + i
      val w = 16 + fid % 16; val h = 8 + fid % 8
      (w, h, h * ((w / 2) * (fid * 3 % 256) + (w - w / 2) * (fid * 11 % 256)))
    }
    assert(f(0) == n)
    assert(f(1) == (0 until n).map(fr(_)._1).sum)
    assert(f(2) == (0 until n).map(fr(_)._2).sum)
    assert(f(3) == (0 until n).map(fr(_)._3).sum)
    // corrupt / truncated / non-AVI payloads: zeros, never a throw
    assert(VideoKernels.videoStatsExtractor(null).forall(_ == 0f))
    assert(VideoKernels.videoStatsExtractor("RIFFxxxxWAVE".getBytes).forall(_ == 0f))
    assert(VideoKernels.videoStatsExtractor(avi.take(30)).forall(_ == 0f))
    // a corrupt FRAME inside a valid container contributes zeros, others count
    val mixed = VideoKernels.encodeAvi(Seq(frames.head, Array[Byte](9, 9, 9)), 16, 8)
    val mf = VideoKernels.videoStatsExtractor(mixed).map(_.toLong)
    assert(mf(0) == 2 && mf(1) == fr(0)._1 && mf(3) == fr(0)._3)
  }

  test("synthesizeAvis + sampleFrames: real demux through the mapPartitions fan-out") {
    val ids = Seq(4L, 5L).toDF("doc_id")
    val assets = VideoKernels.synthesizeAvis(spark, ids, "doc_id")
    assert(assets.select("media_type").distinct().head().getString(0) == "video/x-msvideo")
    val frames = Multimodal.sampleFrames(spark, assets, "content", "asset_id",
      VideoKernels.aviFrameSampler(1))
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 4 → 2 + 0 = 2 frames; id 5 → 2 + 1 = 3 frames
    assert(byAsset == Map(4L -> 2L, 5L -> 3L))
    // each extracted frame is a decodable PNG with the expected dims
    val first = frames.where(col("asset_id") === 4L && col("frame_idx") === 1)
      .select("frame").head().getAs[Array[Byte]](0)
    val st = ImageKernels.pixelStatsExtractor(first)
    assert(st(0).toInt == 16 + 5 % 16 && st(1).toInt == 8 + 5 % 8)
  }
}
