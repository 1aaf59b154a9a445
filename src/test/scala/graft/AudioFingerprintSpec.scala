package graft.functions

import graft.SparkSpec

/** 64-bit audio fingerprint + the banded audio near-dup operator. The
  * independent semantic checks behind m_audio_neardup's SF-pinned
  * snapshot (the audio twin of PerceptualHashSpec): structural gain
  * invariance, Hamming sensitivity to a segment substitution,
  * separation of distinct melodies, spectrogram ground truth against
  * an independently-coded single-bin DFT, decode totality on crafted
  * hostile chunk lengths, and the operator's scene-clique structure.
  */
class AudioFingerprintSpec extends SparkSpec {

  private val Sr = 8000
  private val N = 2048

  /** The fixture melody shape: 32 tones from a 50-step scale. */
  private def melody(seed: Long): Seq[Double] =
    (0 until 32).map { s =>
      var x = seed * 0x9e3779b97f4a7c15L + s * 0xbf58476d1ce4e5b9L
      x ^= x >>> 31; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
      300.0 + 64.0 * java.lang.Long.remainderUnsigned(x, 50L)
    }

  private def fp(tones: Seq[Double], amp: Double = 2000.0): Long =
    AudioFingerprint.fingerprint64(
      AudioFingerprint.syntheticToneWav(Sr, amp, tones, N)).get

  test("EXACT gain scaling of the PCM is EXACTLY fingerprint-invariant (DC-only by construction)") {
    // a gain of c multiplies every band energy by c², shifting every
    // log-energy cell by the same 2·log c — a DC-only move under the
    // DCT, and hashGrid excludes DC from both the bit set and the
    // median. The claim is about the WAVEFORM scaling exactly, so test
    // it in the byte domain: double every int16 sample of the encoded
    // WAV (no clipping at amp 2000) and require Hamming 0. Re-encoding
    // a recording at a different volume is this transform.
    for (seed <- 0L to 4L) {
      val wav = AudioFingerprint.syntheticToneWav(Sr, 2000.0, melody(seed), N)
      val doubled = wav.clone()
      var i = 44
      while (i + 1 < doubled.length) {
        val v = ((doubled(i) & 0xff) | (doubled(i + 1) << 8)).toShort * 2
        doubled(i) = (v & 0xff).toByte; doubled(i + 1) = ((v >> 8) & 0xff).toByte
        i += 2
      }
      assert(AudioFingerprint.fingerprint64(wav).get ==
        AudioFingerprint.fingerprint64(doubled).get, s"seed=$seed")
    }
  }

  test("re-synthesis at any fixture amp stays within the pairing window (quantization-only drift)") {
    // tones SYNTHESIZED at different amps are not exact scalings — the
    // int16 rounding lands differently per amp — so invariance is
    // within quantization noise, not bit-exact (measured max 4 bits
    // over a 20-seed sweep; some seeds differ by 2 even inside the
    // fixture's 1×..5× amp range). The operator's guarantee is that
    // gain-only variants PAIR, i.e. stay within Hamming 6.
    for (seed <- 0L to 9L) {
      val tones = melody(seed)
      val base = fp(tones, amp = 2000.0)
      for (amp <- Seq(250.0, 4000.0, 6000.0, 8000.0, 10000.0, 31000.0)) {
        val d = PerceptualHash.hamming(base, fp(tones, amp))
        assert(d <= 6, s"seed=$seed amp=$amp drifted $d bits")
      }
    }
  }

  test("single-segment substitution is local: visible in aggregate, far below melody distance") {
    // the fixture's variant scheme: one of 32 segments shifted by
    // 150/300 Hz. One changed time-frame column perturbs the
    // low-frequency DCT locally — measured 0..14 bits over this sweep
    // (0 happens when the shifted tone stays inside the same log-spaced
    // band at high frequencies; 14 < the >6-bit floor distinct melodies
    // keep, and far below their typical ~32). The hash must be
    // SENSITIVE (some substitutions flip bits) but LOCAL (never the
    // distance of an unrelated melody).
    val ds = for (seed <- 0L to 9L; segIdx <- Seq(0, 5); shift <- Seq(150.0, 300.0)) yield {
      val base = melody(seed)
      val edited = base.updated(segIdx, base(segIdx) + shift)
      val d = PerceptualHash.hamming(fp(base), fp(edited))
      assert(d <= 20, s"seed=$seed seg=$segIdx shift=$shift: moved $d bits")
      d
    }
    assert(ds.count(_ >= 1) * 2 >= ds.size,
      s"substitutions mostly invisible: ${ds.mkString(",")}")
    assert(ds.max >= 4, s"max substitution distance only ${ds.max}")
  }

  test("distinct melodies are far apart for every tested pair") {
    val hashes = (0L to 9L).map(s => fp(melody(s)))
    for (i <- hashes.indices; j <- hashes.indices if i < j) {
      val d = PerceptualHash.hamming(hashes(i), hashes(j))
      assert(d > 6, s"melodies $i/$j only $d bits apart")
    }
  }

  test("spectrogram ground truth: energy concentrates in the played band; one cell re-derived independently") {
    // a pure tone at band 10's center frequency must make band 10 the
    // argmax of every time frame's energy column
    val bnd = 10
    val hz = AudioFingerprint.bandHz(bnd)
    val wav = AudioFingerprint.syntheticToneWav(Sr, 2000.0, Seq.fill(32)(hz), N)
    val (sr, mono) = AudioFingerprint.pcmMono(wav).get
    assert(sr == Sr && mono.length == N)
    val grid = AudioFingerprint.spectrogram(sr, mono)
    for (t <- 0 until 32) {
      val col = (0 until 32).map(b => grid(t * 32 + b))
      assert(col.indexOf(col.max) == bnd, s"frame $t peaks at band ${col.indexOf(col.max)}")
    }
    // re-derive cell (t=3, band=7) from first principles with
    // independently-written code: per-sample-trig single-bin DFT
    // energy, log-compressed. The production path advances the phasor
    // by rotation (re-seeded per frame), so agreement is within the
    // 64-step rotation-rounding drift, not bit-exact — 1e-6 on the log
    // is ~5 decimal digits of the energy, far tighter than any bit the
    // sign-vs-median hash can see.
    val (t, b) = (3, 7)
    val w = 2.0 * math.Pi * AudioFingerprint.bandHz(b) / sr
    val (s0, s1) = (t * N / 32, (t + 1) * N / 32)
    val re = (s0 until s1).map(i => mono(i) * StrictMath.cos(w * i)).sum
    val im = (s0 until s1).map(i => mono(i) * StrictMath.sin(w * i)).sum
    val expected = StrictMath.log((re * re + im * im) / (s1 - s0) + 1e-9)
    assert(math.abs(grid(t * 32 + b) - expected) < 1e-6)
  }

  test("totality: crafted chunk lengths, truncations, and wrong formats yield None, never throw") {
    assert(AudioFingerprint.fingerprint64(Array.empty[Byte]).isEmpty)
    assert(AudioFingerprint.fingerprint64("RIFFxxxxWAVE".getBytes).isEmpty)
    // the r8 advice payload: a fmt chunk declaring length 0x7FFFFFEF in
    // a ~44-byte blob — Int arithmetic would wrap pos negative and spin
    // or index out of bounds; the Long-space walk must return None
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val hostile = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(0x7FFFFFEFL) ++ new Array[Byte](16)
    assert(AudioFingerprint.pcmMono(hostile).isEmpty)
    // same wrap attempt on a chunk BEFORE fmt: the walk must still
    // terminate (a chunk running past the blob ends the walk)
    val hostile2 = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xFFFFFFF0L) ++ new Array[Byte](16)
    assert(AudioFingerprint.pcmMono(hostile2).isEmpty)
    // a valid WAV truncated mid-data: decodes what's there or rejects,
    // but the too-short guard (< Grid² frames) must say None
    val good = AudioFingerprint.syntheticToneWav(Sr, 2000.0, melody(1), N)
    assert(AudioFingerprint.fingerprint64(
      java.util.Arrays.copyOf(good, good.length / 4)).isEmpty)
    // non-PCM format code and 8-bit samples both fail the fmt gate
    val floatFmt = good.clone(); floatFmt(20) = 3 // IEEE float
    assert(AudioFingerprint.fingerprint64(floatFmt).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8
    assert(AudioFingerprint.fingerprint64(eightBit).isEmpty)
    // fixture builder guard: more tones than samples is a caller error
    // (seg would be 0 and divide by zero), rejected loudly
    intercept[IllegalArgumentException] {
      AudioFingerprint.syntheticToneWav(Sr, 2000.0, Seq.fill(33)(440.0), 32)
    }
  }

  test("stereo mixdown equals the mono average of the channels") {
    // hand-build a 2-channel WAV whose L/R differ; pcmMono must average
    val nFrames = 32 * 32
    val header = AudioHeaders.syntheticHeader(
      2, Sr, bits = 16, nSamples = nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header, 0, header.length)
    for (i <- 0 until nFrames) {
      val l = (i % 100) - 50
      val r = 2 * ((i % 100) - 50)
      out.write(l & 0xff); out.write((l >> 8) & 0xff)
      out.write(r & 0xff); out.write((r >> 8) & 0xff)
    }
    val (_, mono) = AudioFingerprint.pcmMono(out.toByteArray).get
    assert(mono.length == nFrames)
    for (i <- 0 until nFrames)
      assert(mono(i) == (((i % 100) - 50) + 2 * ((i % 100) - 50)) / 2.0)
  }

  test("m_audio_neardup pairs are exactly the in-scene cliques on the gate corpus") {
    val out = graft.SparkEntry.queries("m_audio_neardup")(spark, sfDir)
      .select("doc_a", "doc_b", "hamming").collect()
    assert(out.nonEmpty)
    // every pair is same-scene (scene = doc_id / 10) and within threshold
    out.foreach { r =>
      assert(r.getLong(0) / 10 == r.getLong(1) / 10,
        s"cross-scene pair ${r.getLong(0)}/${r.getLong(1)}")
      assert(r.getInt(2) <= 6)
    }
    // gain-only variants (variant % 3 == 0) must pair at Hamming 0, and
    // every scene with >=2 docs contributes at least one pair
    assert(out.exists(_.getInt(2) == 0))
    val docs = graft.Tables(spark, sfDir).documents.select("doc_id").collect().map(_.getLong(0))
    val scenesWithPairs = out.map(_.getLong(0) / 10).toSet
    val scenesWithDocs = docs.groupBy(_ / 10).filter(_._2.length >= 2).keySet
    assert(scenesWithPairs == scenesWithDocs)
  }
}
