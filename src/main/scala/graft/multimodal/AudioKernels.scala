package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio kernels over the [[Multimodal]] plumbing, built on the
  * JDK's own codec (`javax.sound.sampled.AudioSystem` ships a WAV/AIFF/AU
  * PCM reader — no external libraries, fully headless): decode, stream
  * statistics (duration, sample rate, per-channel sum/peak), WAV encode.
  * The reference treats media payloads as opaque bytes end to end; these
  * kernels are the training-data-pipeline extension — audio corpora need
  * at least duration/loudness screening before transcription. Video stays
  * behind the stub seam ([[Multimodal.FrameSampler]]): the JDK genuinely
  * carries no video codec.
  *
  * Everything runs inside the [[Multimodal.extractFeatures]]
  * mapPartitions boundary — same partitioning/batching contract as the
  * image kernels; only the kernel function differs.
  */
object AudioKernels {

  /** `AudioSystem.getAudioInputStream` re-runs a ServiceLoader provider
    * lookup on EVERY call — a full classpath/module scan for
    * `META-INF/services` entries, which profiled as the dominant cost of
    * the audio kernel under Spark's jar-heavy executor classloader
    * (ZipFile.getEntryPos ate the task time, not PCM decode). Resolve the
    * reader providers ONCE per JVM and replicate AudioSystem's own
    * dispatch: try each reader, first success wins, no-match raises
    * UnsupportedAudioFileException (the fail-soft catch treats it like
    * any malformed header). Readers are stateless; a fresh byte stream
    * per attempt replaces AudioSystem's mark/reset contract.
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  private def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** Decode + per-channel PCM statistics:
    * `[channels, sample_rate, n_frames, duration_ms, sum0, sum1, peak0,
    * peak1, bits]` — sums/peaks over the first two channels (mono leaves
    * channel 1 at zero). Decodes every linear-PCM shape the JDK reader
    * family produces — WAV/AIFF/AU at 8 (signed or unsigned — WAV's
    * 8-bit is unsigned, recentred to signed here), 16, and 24 bits,
    * either endianness; 24-bit takes the distinct sign-extension path a
    * 16-bit-only decoder never exercises. All fixture values are exact
    * integers within Float's 2^24 exact range; duration is integer
    * floor(n_frames·1000 / rate) so an external oracle reproduces it
    * bit-for-bit. Other encodings and undecodable/null payloads return
    * all zeros — the fail-soft contract of a corpus scan (a corrupt blob
    * must not kill the stage).
    */
  val audioStatsExtractor: Multimodal.FeatureExtractor = bytes => {
    val zero = Array.fill(9)(0f)
    if (bytes == null || bytes.isEmpty) zero
    else
      try {
        val ais = openAudio(bytes)
        try {
          val fmt = ais.getFormat
          val bits = fmt.getSampleSizeInBits
          val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
          val unsigned8 =
            fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
          if (!(signed || unsigned8) || (bits != 8 && bits != 16 && bits != 24)) zero
          else {
            val data = ais.readAllBytes()
            val ch = fmt.getChannels
            val be = fmt.isBigEndian
            val bps = bits / 8
            val nFrames = data.length / (bps * ch)
            val sums = new Array[Long](2)
            val peaks = new Array[Long](2)
            var i = 0
            while (i < nFrames) {
              var c = 0
              while (c < ch) {
                val off = (i * ch + c) * bps
                // leading byte kept SIGNED (Byte→Int sign-extends), tail
                // bytes masked — one rule covers every width/endianness
                val s: Int = bits match {
                  case 8 =>
                    if (unsigned8) (data(off) & 0xff) - 128 else data(off).toInt
                  case 16 =>
                    if (be) (data(off) << 8) | (data(off + 1) & 0xff)
                    else (data(off + 1) << 8) | (data(off) & 0xff)
                  case _ =>
                    if (be) (data(off) << 16) | ((data(off + 1) & 0xff) << 8) |
                      (data(off + 2) & 0xff)
                    else (data(off + 2) << 16) | ((data(off + 1) & 0xff) << 8) |
                      (data(off) & 0xff)
                }
                if (c < 2) {
                  sums(c) += s
                  val a = math.abs(s.toLong)
                  if (a > peaks(c)) peaks(c) = a
                }
                c += 1
              }
              i += 1
            }
            val rate = fmt.getSampleRate.toLong
            val durMs = if (rate > 0) nFrames.toLong * 1000L / rate else 0L
            Array(ch.toFloat, rate.toFloat, nFrames.toFloat, durMs.toFloat,
              sums(0).toFloat, sums(1).toFloat, peaks(0).toFloat, peaks(1).toFloat,
              bits.toFloat)
          }
        } finally ais.close()
      } catch { case _: Exception => zero } // malformed header → fail-soft
  }

  /** One deterministic PCM16 WAV per id — mono/stereo by id parity,
    * id-derived frame count, closed-form integer samples
    * `s(ch, i) = ((id·(3+2·ch) + 7·i) mod 4096) − 2048` — so an external
    * SQL oracle reproduces every sum/peak arithmetically from the id
    * alone. The same recipe as [[ImageKernels.synthesizePngs]].
    */
  def synthesizeWavs(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    Multimodal.widenForCompute(ids.select(col(idCol).cast(LongType))).mapPartitions { rows =>
      rows.map { r =>
        val id = Multimodal.requireId(r)
        Row(id, "audio/wav",
          encodeWav(syntheticPcm(id), 1 + Math.floorMod(id, 2).toInt, SynthRate))
      }
    }(enc)
  }

  val SynthRate = 8000

  /** One deterministic clip per id ACROSS the decoder matrix — format and
    * bit depth rotate on `id % 4` (WAV PCM16-LE, AU PCM24-BE, AU PCM8,
    * AIFF PCM16-BE) while channels/frames/samples stay the same closed
    * forms as [[synthesizeWavs]], with the sample range widened to the
    * bit depth (`R` = 4096 / 65536 / 256): an oracle reproduces every
    * stat from the id and the rotation, and a wrong container walk,
    * endianness, or 24-bit sign extension in ANY of the four paths shifts
    * a sum.
    */
  def synthesizeMixed(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    Multimodal.widenForCompute(ids.select(col(idCol).cast(LongType))).mapPartitions { rows =>
      rows.map { r =>
        val id = Multimodal.requireId(r)
        val ch = 1 + Math.floorMod(id, 2).toInt
        Math.floorMod(id, 4).toInt match {
          case 0 => Row(id, "audio/wav",
            encodeWav(syntheticPcm(id), ch, SynthRate))
          case 1 => Row(id, "audio/basic",
            encodeAu(syntheticSamples(id, 65536), ch, SynthRate, 24))
          case 2 => Row(id, "audio/basic",
            encodeAu(syntheticSamples(id, 256), ch, SynthRate, 8))
          case _ => Row(id, "audio/aiff",
            encodeAiff(syntheticSamples(id, 4096), ch, SynthRate))
        }
      }
    }(enc)
  }

  /** The closed-form interleaved samples for `id` over a symmetric range
    * `R` (values in `[-R/2, R/2)`): `s(ch, i) = floorMod(id·(3+2·ch) +
    * 7·i, R) − R/2`. Kept separate so specs can check the generator.
    */
  def syntheticSamples(id: Long, range: Int): Array[Int] = {
    // floorMod everywhere: Scala's sign-preserving % would make a negative
    // id produce 0 channels / <64 frames / shifted samples (the synthetic
    // tables only carry non-negative ids, where floorMod ≡ %, but the
    // generator must not silently degenerate on other inputs)
    val ch = 1 + Math.floorMod(id, 2).toInt
    val n = 64 + Math.floorMod(id, 64).toInt
    val out = new Array[Int](n * ch)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        out(i * ch + c) =
          (Math.floorMod(id * (3 + 2 * c) + 7L * i, range) - range / 2).toInt
        c += 1
      }
      i += 1
    }
    out
  }

  /** The PCM16 specialization ([[syntheticSamples]] at R=4096). */
  def syntheticPcm(id: Long): Array[Short] =
    syntheticSamples(id, 4096).map(_.toShort)

  /** Canonical 44-byte RIFF/WAVE PCM16-LE container around interleaved
    * samples — byte-deterministic (AudioSystem.write adds no metadata for
    * PCM WAV either, but hand-rolling pins the layout).
    */
  def encodeWav(samples: Array[Short], channels: Int, rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2)       // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Sun/NeXT `.au` container (the simplest audio container there is —
    * a 24-byte big-endian header, then big-endian linear PCM): encoding
    * code 2/3/4 = 8/16/24-bit signed linear. The JDK's AU reader maps
    * these straight to PCM_SIGNED big-endian at the stated width.
    */
  def encodeAu(samples: Array[Int], channels: Int, rate: Int, bits: Int): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24, s"unsupported AU depth $bits")
    val bps = bits / 8
    val dataLen = samples.length * bps
    val buf = java.nio.ByteBuffer.allocate(24 + dataLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(0x2e736e64)                 // ".snd"
      .putInt(24)                          // data offset
      .putInt(dataLen)
      .putInt(bits match { case 8 => 2; case 16 => 3; case _ => 4 })
      .putInt(rate)
      .putInt(channels)
    samples.foreach { s =>
      bits match {
        case 8  => buf.put(s.toByte)
        case 16 => buf.putShort(s.toShort)
        case _  => buf.put((s >> 16).toByte).put((s >> 8).toByte).put(s.toByte)
      }
    }
    buf.array()
  }

  /** AIFF container around big-endian PCM16: FORM/AIFF with a COMM chunk
    * (channel count, frame count, sample width, and the format's 80-bit
    * extended-float sample rate) and an SSND chunk. The extended-float
    * encoding is the one genuinely AIFF-specific bit: rate `r` as
    * exponent `16383 + floor(log2 r)` and the mantissa left-aligned with
    * an explicit integer bit.
    */
  def encodeAiff(samples: Array[Int], channels: Int, rate: Int): Array[Byte] = {
    require(rate > 0, "rate must be positive")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(12 + 26 + 16 + dataLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val exp = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong).toInt
    val mantissa = rate.toLong << (63 - exp)
    buf.put("FORM".getBytes("US-ASCII")).putInt(4 + 26 + 16 + dataLen)
      .put("AIFF".getBytes("US-ASCII"))
      .put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(channels.toShort)
      .putInt(samples.length / channels)
      .putShort(16)
      .putShort((16383 + exp).toShort)
      .putLong(mantissa)
      .put("SSND".getBytes("US-ASCII")).putInt(8 + dataLen)
      .putInt(0).putInt(0)                 // offset, block size
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }
}
