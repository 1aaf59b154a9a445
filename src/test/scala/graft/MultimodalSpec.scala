package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val df = Multimodal.mediaTable(Tables(spark, sfDir))
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(df.count() == 500)
  }

  test("feature extraction aligns one output row per input, deterministic") {
    val t = Tables(spark, sfDir)
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(t))
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 500)
    // n_bytes equals payload length (= text UTF-8 length)
    val expected = t.documents.selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(rows.map(_.getLong(4)).sameElements(expected))
    // stable across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(t))
      .orderBy("doc_id").collect()
    assert(rows.sameElements(again))
  }

  test("batching covers partitions larger and smaller than BatchSize") {
    val t = Tables(spark, sfDir)
    val one = Multimodal.extractFeatures(Multimodal.mediaTable(t).repartition(1))
    val many = Multimodal.extractFeatures(Multimodal.mediaTable(t).repartition(97))
    assert(one.count() == 500 && many.count() == 500)
  }

  test("WAV header round-trips through synthesize → parse") {
    import graft.functions.AudioHeaders
    val b = AudioHeaders.syntheticHeader(channels = 2, sampleRate = 44100,
                                         bits = 16, nSamples = 44100L)
    assert(AudioHeaders.parse(b) === Some((2, 44100, 16, 1000L)))
    // corrupt magic and inconsistent byteRate both reject
    val bad = b.clone(); bad(0) = 'X'.toByte
    assert(AudioHeaders.parse(bad).isEmpty)
    val skew = b.clone(); skew(28) = (skew(28) ^ 0x01).toByte
    assert(AudioHeaders.parse(skew).isEmpty)
    assert(AudioHeaders.parse(Array.emptyByteArray).isEmpty)
  }

  test("m_audio_headers parses every synthesized payload with header_ok") {
    val df = SparkEntry.queries("m_audio_headers")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(5)), "some header_ok=false")
    // duration must reflect the declared sample count, not a constant
    assert(rows.map(_.getLong(4)).distinct.length > 100)
  }

  test("MP4 header round-trips through synthesize → parse") {
    import graft.functions.VideoHeaders
    val b = VideoHeaders.syntheticHeader("isom", timescale = 90000, durationTicks = 90000L * 61)
    assert(VideoHeaders.parse(b) === Some(("isom", 90000, 61000L)))
    // 64-bit duration path (mvhd v1) and rejections
    val bad = b.clone(); bad(4) = 'X'.toByte
    assert(VideoHeaders.parse(bad).isEmpty)
    assert(VideoHeaders.parse(b.take(20)).isEmpty) // ftyp but no moov
    assert(VideoHeaders.parse(Array.emptyByteArray).isEmpty)
  }

  test("m_video_headers parses every synthesized payload with header_ok") {
    val rows = SparkEntry.queries("m_video_headers")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(4)), "some header_ok=false")
    assert(rows.map(_.getLong(3)).distinct.length > 100)
  }

  test("BMP pixel decode round-trips exactly: solid color -> per-channel means") {
    import graft.functions.ImageHeaders
    val b = ImageHeaders.syntheticBmp(7, 5, r = 200, g = 100, bl = 50)
    assert(ImageHeaders.decodeBmpPixels(b) === Some((7, 5, 200.0, 100.0, 50.0)))
    // header-only fragments and non-24bpp payloads must decode to None,
    // not throw or return garbage
    assert(ImageHeaders.decodeBmpPixels(b.take(40)).isEmpty)
    assert(ImageHeaders.decodeBmpPixels(ImageHeaders.syntheticHeader("bmp", 7, 5)).isEmpty)
  }

  test("m_bmp_pixels: every payload's pixels decode to the declared color") {
    val rows = SparkEntry.queries("m_bmp_pixels")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(6)), "some pixels_ok=false")
  }

  test("PCM decode: square wave RMS equals the amplitude exactly") {
    import graft.functions.AudioHeaders
    val wav = AudioHeaders.syntheticSquareWav(channels = 2, sampleRate = 16000,
      amplitude = 1234, nFrames = 50)
    val Some((n, rms, peak)) = AudioHeaders.decodePcmSamples(wav)
    assert(n == 100L && rms == 1234.0 && peak == 1234)
    // truncated data chunk → None (a partial upload must not decode)
    assert(AudioHeaders.decodePcmSamples(wav.dropRight(3)).isEmpty)
  }

  test("m_pcm_samples: every waveform decodes with samples_ok") {
    val rows = SparkEntry.queries("m_pcm_samples")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(4)), "some samples_ok=false")
  }

  test("AVI frame sampling: step-2 decode visits exactly the even frames") {
    import graft.functions.AviFrames
    // 4 frames colored r=100+i: sampled {0,2} → mean red 101; a
    // decode-everything averages {0..3} → 101.5 — the differing mean
    // AND sample count prove the sampler skips frames
    val avi = AviFrames.synthetic(w = 4, h = 3, nFrames = 4, r = 100, g = 10, bl = 20)
    assert(AviFrames.decode(avi, frameStep = 2) ===
      Some((4, 3, 4, 2, 101.0, 11.0, 21.0)))
    assert(AviFrames.decode(avi, frameStep = 1) ===
      Some((4, 3, 4, 4, 101.5, 11.5, 21.5)))
    // truncated container rejects
    assert(AviFrames.decode(avi.dropRight(5), 1).isEmpty)
  }

  test("m_avi_frames: every synthesized video decodes with frames_ok") {
    val rows = SparkEntry.queries("m_avi_frames")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(6)), "some frames_ok=false")
  }
}
