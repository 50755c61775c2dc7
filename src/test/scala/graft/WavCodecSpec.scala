package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlob, WavCodec}

/** The REAL audio codec behind the multimodal seam (javax.sound.sampled):
  * decode / resample / frame-fingerprint of actual encoded WAV bytes,
  * driven through the IDENTICAL Dataset pipeline the oracle-pinned stub
  * queries use — the audio analogue of ImageIoCodecSpec. Constructed
  * waveforms have closed-form RMS, so assertions are tight (tolerances
  * only for 16-bit quantization, ~3e-5 per sample).
  */
class WavCodecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 16-bit PCM mono WAV from samples in [-1, 1]. */
  private def wav(samples: Array[Double], rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](2 * samples.length)
    samples.zipWithIndex.foreach { case (v, i) =>
      val s = math.max(-32768, math.min(32767, math.round(v * 32767.0))).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, 1, 2, rate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decode: per-window RMS of constructed waveforms is closed-form exact") {
    // constant amplitude 0.5 over 8000 frames: every window RMS == 0.5
    val flat = WavCodec.decode(wav(Array.fill(8000)(0.5)), "audio")
    assert(flat.length === WavCodec.featureDim)
    flat.foreach(v => assert(math.abs(v - 0.5) < 1e-4))
    // first half silence, second half amplitude 0.8: windows 0-3 == 0,
    // 4-7 == 0.8 (window boundaries align with the half split)
    val half = WavCodec.decode(
      wav(Array.tabulate(8000)(i => if (i < 4000) 0.0 else 0.8)), "audio")
    (0 until 4).foreach(j => assert(math.abs(half(j)) < 1e-4, s"window $j"))
    (4 until 8).foreach(j => assert(math.abs(half(j) - 0.8) < 1e-4, s"window $j"))
    // full-scale sine, whole periods per window: RMS == A/sqrt(2)
    val sine = WavCodec.decode(wav(Array.tabulate(8000)(i =>
      0.9 * math.sin(2 * math.Pi * i / 100.0))), "audio")
    sine.foreach(v => assert(math.abs(v - 0.9 / math.sqrt(2)) < 1e-3))
  }

  test("decode normalizes stereo/8-bit payloads through the JDK converter") {
    // 8-bit unsigned mono WAV, constant amplitude ~0.5
    val n = 4000
    val pcm8 = Array.fill(n)((128 + 64).toByte) // 0.5 above the 8-bit midline
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val f = WavCodec.decode(out.toByteArray, "audio")
    f.foreach(v => assert(math.abs(v - 0.5) < 0.01))
  }

  test("resize really resamples: frame budget hit, duration preserved, content kept") {
    val src = wav(Array.tabulate(8000)(i => if (i < 4000) 0.0 else 0.8))
    val out = WavCodec.resize(src, "audio", 40, 25) // budget: 1000 frames
    val (s, rate) = WavCodec.samples(out)
    assert(s.length === 1000)
    // original: 8000 frames @ 8000 Hz = 1.0 s; resampled rate keeps that
    assert(math.abs(s.length / rate - 1.0) < 1e-3)
    // the half/half shape survives the resample
    val f = WavCodec.decode(out, "audio")
    assert(f.head < 1e-3 && math.abs(f.last - 0.8) < 1e-3)
  }

  test("sampleFrames fingerprints each instant with its window's RMS") {
    // 2000 ms stated duration, silence then amplitude 1.0: instants in
    // the first second fingerprint ~0, in the second ~255
    val blob = wav(Array.tabulate(8000)(i => if (i < 4000) 0.0 else 1.0))
    val frames = WavCodec.sampleFrames(blob, "audio", 2000L, 500L)
    assert(frames.map(_._1) === Seq(0, 1, 2, 3))
    assert(frames.map(_._2) === Seq(0L, 500L, 1000L, 1500L))
    assert(frames(0)._3 === 0 && frames(1)._3 === 0)
    assert(frames(2)._3 >= 254 && frames(3)._3 >= 254)
  }

  test("real audio bytes flow through the SAME extractFeatures/resize/sampleFrames pipeline as the stub") {
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "audio", wav(Array.fill(8000)(0.5)), 40, 25, 2000L),
      MediaBlob(2L, "audio",
        wav(Array.tabulate(8000)(i => if (i < 4000) 0.0 else 0.8)), 40, 25, 2000L)
    ).toDS()
    val feats = Multimodal.extractFeatures(blobs, WavCodec)
      .collect().sortBy(_.media_id)
    assert(feats.length === 2)
    // flat 0.5: norm = sqrt(8 * 0.25); half/half 0.8: sqrt(4 * 0.64)
    assert(math.abs(feats(0).feature_norm - math.sqrt(2.0)) < 1e-3)
    assert(math.abs(feats(1).feature_norm - 1.6) < 1e-3)
    val resized = Multimodal.resize(blobs, 40, 25, WavCodec)
      .collect().sortBy(_.media_id)
    resized.foreach { b =>
      assert(WavCodec.samples(b.content)._1.length === 1000)
      assert(b.meta_width === 40 && b.meta_height === 25)
    }
    // sampleFrames filters kind == "video" in the stub pipeline; audio
    // fingerprinting drives the codec directly per partition — assert the
    // Dataset-side flatMap shape over a kind-retagged frame
    val fps = blobs.filter(_.media_id == 2L)
      .flatMap(b => WavCodec.sampleFrames(b.content, "audio",
        b.meta_duration_ms, 500L).map { case (i, t, fp) => (b.media_id, i, t, fp) })
      .collect().sortBy(_._2)
    assert(fps.length === 4 && fps(0)._4 === 0 && fps(3)._4 > 200)
  }

  test("the codec rejects what it cannot decode (honest failure, no fake output)") {
    intercept[Exception](WavCodec.decode("not audio".getBytes, "audio"))
    intercept[IllegalArgumentException](
      WavCodec.decode(wav(Array.fill(100)(0.1)), "image"))
    intercept[Exception](WavCodec.sampleFrames(
      Array.empty[Byte], "audio", 1000L, 100L))
  }
}
