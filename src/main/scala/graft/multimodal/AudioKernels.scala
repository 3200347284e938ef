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

  /** Decode + per-channel PCM statistics:
    * `[channels, sample_rate, n_frames, duration_ms, sum0, sum1, peak0,
    * peak1]` — sums/peaks over the first two channels (mono leaves
    * channel 1 at zero). All values are exact integers far below Float's
    * 2^24 exact range for the synthetic fixtures (and real short clips);
    * duration is integer floor(n_frames·1000 / rate) so an external
    * oracle reproduces it bit-for-bit. Non-PCM16 encodings and
    * undecodable/null payloads return all zeros — the fail-soft contract
    * of a corpus scan (a corrupt blob must not kill the stage).
    */
  val audioStatsExtractor: Multimodal.FeatureExtractor = bytes => {
    val zero = Array.fill(8)(0f)
    if (bytes == null || bytes.isEmpty) zero
    else
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) zero
          else {
            val data = ais.readAllBytes()
            val ch = fmt.getChannels
            val be = fmt.isBigEndian
            val nFrames = data.length / (2 * ch)
            val sums = new Array[Long](2)
            val peaks = new Array[Long](2)
            var i = 0
            while (i < nFrames) {
              var c = 0
              while (c < ch) {
                val off = (i * ch + c) * 2
                val s =
                  if (be) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                  else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
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
              sums(0).toFloat, sums(1).toFloat, peaks(0).toFloat, peaks(1).toFloat)
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
    ids.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      rows.map { r =>
        val id = Multimodal.requireId(r)
        Row(id, "audio/wav",
          encodeWav(syntheticPcm(id), 1 + Math.floorMod(id, 2).toInt, SynthRate))
      }
    }(enc)
  }

  val SynthRate = 8000

  /** The closed-form interleaved PCM16 samples for `id` — kept separate
    * so specs can check the generator itself.
    */
  def syntheticPcm(id: Long): Array[Short] = {
    // floorMod everywhere: Scala's sign-preserving % would make a negative
    // id produce 0 channels / <64 frames / shifted samples (the synthetic
    // tables only carry non-negative ids, where floorMod ≡ %, but the
    // generator must not silently degenerate on other inputs)
    val ch = 1 + Math.floorMod(id, 2).toInt
    val n = 64 + Math.floorMod(id, 64).toInt
    val out = new Array[Short](n * ch)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        out(i * ch + c) =
          (Math.floorMod(id * (3 + 2 * c) + 7L * i, 4096) - 2048).toShort
        c += 1
      }
      i += 1
    }
    out
  }

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
}
