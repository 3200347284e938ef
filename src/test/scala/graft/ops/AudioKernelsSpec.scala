package graft.ops

import graft.SharedSpark
import graft.multimodal.{AudioKernels, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real WAV audio kernels ([[AudioKernels]], JDK `javax.sound.sampled`):
  * the synthetic generator round-trips through AudioSystem bit-exactly,
  * the stats kernel reproduces hand-computed sums/peaks for mono and
  * stereo, and corrupt payloads fail soft.
  */
class AudioKernelsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("WAV encode → AudioSystem decode round-trips the exact PCM samples") {
    for (id <- Seq(0L, 1L, 7L, 63L, 64L, -1L, -63L)) {
      val pcm = AudioKernels.syntheticPcm(id)
      val ch = 1 + Math.floorMod(id, 2).toInt
      val wav = AudioKernels.encodeWav(pcm, ch, AudioKernels.SynthRate)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      assert(fmt.getChannels == ch && fmt.getSampleRate == 8000f &&
        fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      val data = ais.readAllBytes()
      val decoded = Array.tabulate(data.length / 2)(i =>
        (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort))
      assert(decoded.toSeq == pcm.toSeq, s"PCM mismatch for id $id")
    }
  }

  test("stats kernel: hand-computed mono and stereo values; fail-soft on garbage") {
    // id=2 → mono, 66 frames; id=3 → stereo, 67 frames
    for (id <- Seq(2L, 3L)) {
      val ch = 1 + (id % 2).toInt
      val n = 64 + (id % 64).toInt
      val wav = AudioKernels.encodeWav(AudioKernels.syntheticPcm(id), ch, 8000)
      val f = AudioKernels.audioStatsExtractor(wav).map(_.toLong)
      def s(c: Int, i: Int): Long = (id * (3 + 2 * c) + 7L * i) % 4096 - 2048
      assert(f(0) == ch && f(1) == 8000 && f(2) == n)
      assert(f(3) == n * 1000L / 8000)
      assert(f(4) == (0 until n).map(s(0, _)).sum)
      assert(f(6) == (0 until n).map(i => math.abs(s(0, i))).max)
      if (ch == 2) {
        assert(f(5) == (0 until n).map(s(1, _)).sum)
        assert(f(7) == (0 until n).map(i => math.abs(s(1, i))).max)
      } else assert(f(5) == 0 && f(7) == 0)
    }
    // corrupt/null payloads return zeros, never throw
    assert(AudioKernels.audioStatsExtractor(null).forall(_ == 0f))
    assert(AudioKernels.audioStatsExtractor(Array[Byte](1, 2, 3)).forall(_ == 0f))
    assert(AudioKernels.audioStatsExtractor("RIFFxxxxWAVE".getBytes).forall(_ == 0f))
  }

  test("synthesizeWavs + extractFeatures: end-to-end over the mapPartitions plumbing") {
    val ids = Seq(10L, 11L, 12L).toDF("doc_id")
    val assets = AudioKernels.synthesizeWavs(spark, ids, "doc_id")
    assert(assets.select("media_type").distinct().head().getString(0) == "audio/wav")
    val stats = Multimodal.extractFeatures(spark, assets, "content", "asset_id",
      AudioKernels.audioStatsExtractor)
      .select(col("asset_id"), element_at(col("features"), 1).cast("int").as("ch"),
        element_at(col("features"), 3).cast("long").as("n"))
      .orderBy("asset_id").collect()
    assert(stats.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 74L), (2, 75L), (1, 76L)))
  }

  test("AU 8/24-bit and AIFF decode: hand-computed stats, 24-bit sign extension") {
    // id=5 → stereo, 69 frames; the 24-bit range produces negative samples
    // whose top byte is 0xFF — a decoder missing the sign extension turns
    // them into ~16M positives and every assertion below explodes
    for ((bits, range) <- Seq((8, 256), (24, 65536))) {
      val id = 5L
      val ch = 2; val n = 69
      val au = AudioKernels.encodeAu(AudioKernels.syntheticSamples(id, range), ch, 8000, bits)
      val f = AudioKernels.audioStatsExtractor(au).map(_.toLong)
      def s(c: Int, i: Int): Long = (id * (3 + 2 * c) + 7L * i) % range - range / 2
      assert(f(0) == ch && f(1) == 8000 && f(2) == n && f(8) == bits)
      assert(f(4) == (0 until n).map(s(0, _)).sum, s"$bits-bit sum0")
      assert(f(5) == (0 until n).map(s(1, _)).sum, s"$bits-bit sum1")
      assert(f(6) == (0 until n).map(i => math.abs(s(0, i))).max, s"$bits-bit peak0")
    }
    // AIFF PCM16-BE: same stats as the WAV encoding of the same samples
    val id = 7L
    val aiff = AudioKernels.encodeAiff(AudioKernels.syntheticSamples(id, 4096), 2, 8000)
    val wav = AudioKernels.encodeWav(AudioKernels.syntheticPcm(id), 2, 8000)
    val fa = AudioKernels.audioStatsExtractor(aiff)
    val fw = AudioKernels.audioStatsExtractor(wav)
    assert(fa.toSeq == fw.toSeq, s"AIFF ${fa.toSeq} != WAV ${fw.toSeq}")
    assert(fa(1) == 8000f, "extended-float sample rate decoded wrong")
  }

  test("8-bit WAV is PCM_UNSIGNED: recentred to signed, not read raw") {
    // hand-rolled 8-bit WAV (format tag 1, 8 bits/sample, unsigned bytes):
    // samples 0,64,128,192,255 centre to -128,-64,0,64,127
    val raw = Array(0, 64, 128, 192, 255).map(_.toByte)
    val buf = java.nio.ByteBuffer.allocate(44 + raw.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + raw.length).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes).putInt(raw.length).put(raw)
    val f = AudioKernels.audioStatsExtractor(buf.array()).map(_.toLong)
    assert(f(8) == 8 && f(2) == 5)
    assert(f(4) == -128L - 64 + 0 + 64 + 127, s"recentred sum wrong: ${f(4)}")
    assert(f(6) == 128, s"recentred peak wrong: ${f(6)}")
  }

  test("synthesizeMixed rotates container and depth on id % 4, all decode") {
    val ids = (20L to 27L).toDF("doc_id")
    val assets = AudioKernels.synthesizeMixed(spark, ids, "doc_id")
    assert(assets.select("media_type").distinct().collect().map(_.getString(0)).toSet ==
      Set("audio/wav", "audio/basic", "audio/aiff"))
    val stats = Multimodal.extractFeatures(spark, assets, "content", "asset_id",
      AudioKernels.audioStatsExtractor)
      .select(col("asset_id"), element_at(col("features"), 9).cast("int").as("bits"),
        element_at(col("features"), 3).cast("long").as("n"))
      .orderBy("asset_id").collect()
    assert(stats.map(_.getInt(1)).toSeq == Seq(16, 24, 8, 16, 16, 24, 8, 16))
    assert(stats.map(_.getLong(2)).toSeq == (20L to 27L).map(64L + _ % 64),
      "every container variant must decode (zeros would show here)")
  }
}
