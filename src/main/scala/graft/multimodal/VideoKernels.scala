package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL video-container kernels over the [[Multimodal]] plumbing. The JDK
  * ships no inter-frame video CODEC (H.264/VP9 stay out of reach without
  * external libraries — that seam remains [[Multimodal.FrameSampler]]'s
  * stub), but the dominant intra-frame format needs none: MJPEG-family
  * AVI is a RIFF container of independently-encoded picture frames, and
  * RIFF demux is pure byte walking while the frame payloads decode
  * through the same `javax.imageio` codecs [[ImageKernels]] already uses
  * (JPEG, or PNG for the lossless variant used by the exact-value
  * fixtures). So: container parse (real), frame extraction (real), frame
  * decode (real), per-video statistics (real) — everything runs inside
  * the unchanged mapPartitions boundary.
  */
object VideoKernels {

  // --------------------------------------------------------- RIFF writer

  /** Minimal valid RIFF/AVI around independently-decodable frames: RIFF
    * ('AVI ') → LIST('hdrl'){avih, LIST('strl'){strh('vids'), strf}} →
    * LIST('movi'){'00dc' frame chunks} → 'idx1'. Word-aligned chunks;
    * little-endian throughout. `fourccCodec` labels the stream ('MJPG'
    * for JPEG frames, 'png ' for PNG frames — the demuxer is codec-
    * agnostic, the per-frame decoder sniffs the payload).
    */
  def encodeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                fps: Int = 10, fourccCodec: String = "MJPG"): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc.getBytes("US-ASCII")).putInt(body.length).put(body)
      if (pad == 1) b.put(0.toByte)
      b.array()
    }
    def list(subtype: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val body = subtype.getBytes("US-ASCII") ++ parts.flatten
      chunk("LIST", body)
    }
    val avih = { // MainAVIHeader (56 bytes)
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps)          // dwMicroSecPerFrame
        .putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, flags = AVIF_HASINDEX (idx1 IS written below)
        .putInt(frames.length)          // dwTotalFrames
        .putInt(0).putInt(1)            // initialFrames, streams
        .putInt(0)                      // suggestedBufferSize
        .putInt(width).putInt(height)
      b.array()
    }
    val strh = { // AVIStreamHeader (56 bytes)
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put(fourccCodec.getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps)          // scale, rate → fps
        .putInt(0).putInt(frames.length)
        .putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER (40 bytes)
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)
        .put(fourccCodec.getBytes("US-ASCII"))
        .putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f => chunk("00dc", f)))
    val idx1 = { // one entry per frame: (00dc, KEYFRAME, offset-into-movi, size)
      var off = 4 // after the 'movi' subtype fourcc
      val entries = frames.map { f =>
        val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("00dc".getBytes("US-ASCII")).putInt(0x10).putInt(off).putInt(f.length)
        off += 8 + f.length + (f.length % 2)
        b.array()
      }
      chunk("idx1", entries.flatten.toArray)
    }
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  // --------------------------------------------------------- RIFF demuxer

  /** Extract the video-frame payloads ('NNdb'/'NNdc' chunks inside
    * LIST('movi'), any stream number) from a RIFF/AVI byte array.
    * Codec-agnostic: returns raw payloads in container order. Empty for
    * null/undecodable input — the corpus-scan fail-soft contract.
    */
  def extractFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    try {
      if (bytes == null || bytes.length < 12) return Seq.empty
      def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
      def u32(off: Int): Long =
        java.nio.ByteBuffer.wrap(bytes, off, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Seq.empty
      val out = Seq.newBuilder[Array[Byte]]
      val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
      var pos = 12L
      while (pos + 8 <= riffEnd) {
        val id = fourcc(pos.toInt)
        val sz = u32(pos.toInt + 4)
        if (id == "LIST" && pos + 12 <= riffEnd &&
            fourcc(pos.toInt + 8) == "movi") {
          var p = pos + 12
          val end = math.min(riffEnd, pos + 8 + sz)
          while (p + 8 <= end) {
            val cid = fourcc(p.toInt)
            val csz = u32(p.toInt + 4)
            if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
                (cid.substring(2) == "db" || cid.substring(2) == "dc") &&
                p + 8 + csz <= end) {
              val f = new Array[Byte](csz.toInt)
              System.arraycopy(bytes, p.toInt + 8, f, 0, csz.toInt)
              out += f
            }
            p += 8 + csz + (csz % 2) // word alignment
          }
        }
        pos += 8 + sz + (sz % 2)
      }
      out.result()
    } catch { case _: Exception => Seq.empty }

  /** A REAL [[Multimodal.FrameSampler]]: demux the AVI and keep every
    * `everyN`-th frame — the keyframe-sampling stage of a video corpus
    * pipeline, on real container bytes.
    */
  def aviFrameSampler(everyN: Int): Multimodal.FrameSampler = {
    require(everyN > 0, s"everyN must be positive: $everyN")
    bytes =>
      extractFrames(bytes).zipWithIndex.collect {
        case (f, i) if i % everyN == 0 => f
      }
  }

  /** Demux + per-frame decode + aggregate pixel statistics:
    * `[n_frames, sum_w, sum_h, sum_r, sum_g, sum_b]` — widths/heights and
    * per-band pixel sums totalled across frames. The Float feature lanes
    * are exact only while a TOTAL stays below 2^24 (the fixtures do by
    * construction; a single 1080p frame's band sum already does not) —
    * for large real videos, run [[aviFrameSampler]] through
    * [[Multimodal.sampleFrames]] and apply
    * [[ImageKernels.pixelStatsExtractor]] PER FRAME instead of totalling
    * here. Frames that fail to decode contribute zeros; a non-AVI
    * payload yields all zeros.
    */
  val videoStatsExtractor: Multimodal.FeatureExtractor = bytes => {
    val frames = extractFrames(bytes)
    val acc = new Array[Long](5) // sumW, sumH, sumR, sumG, sumB
    frames.foreach { f =>
      val st = ImageKernels.pixelStatsExtractor(f)
      acc(0) += st(0).toLong; acc(1) += st(1).toLong
      acc(2) += st(3).toLong; acc(3) += st(4).toLong; acc(4) += st(5).toLong
    }
    Array(frames.length.toFloat, acc(0).toFloat, acc(1).toFloat,
      acc(2).toFloat, acc(3).toFloat, acc(4).toFloat)
  }

  /** One deterministic AVI per id: `2 + floorMod(id, 4)` PNG frames,
    * frame `i` = [[ImageKernels.syntheticImage]] of `id + i` — every
    * downstream statistic is closed-form in the id, the
    * [[AudioKernels.synthesizeWavs]] recipe lifted to containers. PNG
    * (lossless, bit-exact across decoders) rather than JPEG, which is
    * real-but-lossy and would make pixel sums codec-build-dependent.
    */
  def synthesizeAvis(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    Multimodal.widenForCompute(ids.select(col(idCol).cast(LongType))).mapPartitions { rows =>
      rows.map { r =>
        val id = Multimodal.requireId(r)
        val n = 2 + Math.floorMod(id, 4).toInt
        val frames = (0 until n).map(i =>
          ImageKernels.encodePng(ImageKernels.syntheticImage(id + i)))
        // header dims advertise frame 0 — closed-form, matching
        // syntheticImage (per-frame dims may differ; the demuxer never
        // trusts the header for them)
        Row(id, "video/x-msvideo",
          encodeAvi(frames, 16 + Math.floorMod(id, 16).toInt,
            8 + Math.floorMod(id, 8).toInt, fourccCodec = "png "))
      }
    }(enc)
  }
}
