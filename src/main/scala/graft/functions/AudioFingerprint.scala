package graft.functions

/** 64-bit audio fingerprint: PCM16 WAV → mono mixdown → 32 equal time
  * frames × 32 log-spaced frequency bands of log-energy (Goertzel-style
  * single-bin correlation per band) → the SAME DCT-sign hash the image
  * pHash uses ([[PerceptualHash.hashGrid]]). The Haitsma–Kalker insight
  * made band-compatible with the repo's 64-bit Hamming machinery: what
  * survives re-encoding/volume changes is the coarse time×frequency
  * energy SHAPE, so hash the shape, not the samples.
  *
  * Volume invariance is structural, like pHash's brightness claim: a
  * gain of c multiplies every band energy by c², shifting every
  * log-energy cell by the same 2·log c — a DC-only move under the DCT,
  * and hashGrid excludes DC from both the bit set and the median.
  *
  * Totality: None on anything that is not a complete PCM16 WAV with at
  * least [[Grid]]² samples, never throw.
  */
object AudioFingerprint {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  val Grid = 32 // time frames and frequency bands (PerceptualHash.N)
  private val FMin = 200.0
  private val FMax = 4000.0

  /** Mono mixdown + sample rate of a PCM16 RIFF/WAVE blob: walk the
    * chunk list for fmt (must be PCM, 16-bit) and data.
    */
  private[functions] def pcmMono(b: Array[Byte]): Option[(Int, Array[Double])] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var ok = false
    var dataOff = -1
    var dataLen = 0L
    while (pos + 8 <= b.length && (dataOff < 0 || !ok)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = le32(b, pos + 4)
      if (id == "fmt " && len >= 16 && pos + 8 + 16 <= b.length) {
        val format = le16(b, pos + 8)
        channels = le16(b, pos + 10)
        sampleRate = le32(b, pos + 12).toInt
        val bits = le16(b, pos + 22)
        ok = format == 1 && bits == 16 && channels >= 1 && sampleRate > 0
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = math.min(len, (b.length - dataOff).toLong)
      }
      // Advance in Long space: a crafted 32-bit length must never wrap
      // pos negative. A chunk running past the end of the blob ends the
      // walk (nothing can follow a truncated chunk).
      val next = pos.toLong + 8L + len + (len & 1L) // chunks are word-aligned
      pos = if (next > b.length) b.length else next.toInt
    }
    if (!ok || dataOff < 0) return None
    val nFrames = (dataLen / (2L * channels)).toInt
    if (nFrames < Grid * Grid) return None // too short to frame meaningfully
    val mono = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      var c = 0
      var s = 0.0
      val base = dataOff + f * 2 * channels
      while (c < channels) {
        s += (le16(b, base + 2 * c).toShort).toDouble
        c += 1
      }
      mono(f) = s / channels
      f += 1
    }
    Some((sampleRate, mono))
  }

  /** log-spaced band center frequencies in [FMin, FMax]. All trig/log
    * below is StrictMath (fdlibm, bit-identical on every JVM/CPU):
    * java.lang.Math is allowed 1-2.5 ulp platform variation, and the
    * m_audio_neardup oracle pins exact outputs — a sign-vs-median DCT
    * bit near threshold must not flip across platforms.
    */
  private[functions] def bandHz(i: Int): Double =
    FMin * StrictMath.pow(FMax / FMin, i.toDouble / (Grid - 1))

  /** Grid×Grid log-energy spectrogram: frame t covers the samples
    * [t·n/Grid, (t+1)·n/Grid); band energy is the squared correlation
    * with sin/cos at the band center (a single-bin DFT — the Goertzel
    * quantity), log-compressed with a floor so silent frames stay
    * finite.
    *
    * The correlation phasor e^{iw·i} advances by a complex rotation
    * per sample instead of calling trig per sample — that is the whole
    * cost of this function (2·Grid·n transcendental calls otherwise;
    * ~90 ms/doc measured at the 100× scale cell, 30× the image pHash).
    * Rotation is pure IEEE-754 multiply/add, bit-identical on every
    * JVM since strict FP became mandatory (Java 17), so the
    * platform-stability property the StrictMath seeds give us is
    * preserved. The phasor re-seeds from StrictMath at every frame
    * boundary, bounding rotation-rounding drift to one frame
    * (≲ frameLen·2⁻⁵² relative) regardless of total duration.
    */
  private[functions] def spectrogram(sampleRate: Int, mono: Array[Double]): Array[Double] = {
    val n = mono.length
    val out = new Array[Double](Grid * Grid)
    var bnd = 0
    while (bnd < Grid) {
      val w = 2.0 * math.Pi * bandHz(bnd) / sampleRate
      val cw = StrictMath.cos(w)
      val sw = StrictMath.sin(w)
      var t = 0
      while (t < Grid) {
        val s0 = t * n / Grid
        val s1 = (t + 1) * n / Grid
        var pr = StrictMath.cos(w * s0)
        var pi = StrictMath.sin(w * s0)
        var re = 0.0
        var im = 0.0
        var i = s0
        while (i < s1) {
          val m = mono(i)
          re += m * pr
          im += m * pi
          val nr = pr * cw - pi * sw
          pi = pr * sw + pi * cw
          pr = nr
          i += 1
        }
        out(t * Grid + bnd) = StrictMath.log((re * re + im * im) / (s1 - s0) + 1e-9)
        t += 1
      }
      bnd += 1
    }
    out
  }

  /** 64-bit fingerprint of a PCM16 WAV; None if undecodable/too short. */
  def fingerprint64(b: Array[Byte]): Option[Long] =
    pcmMono(b).map { case (sr, mono) => PerceptualHash.hashGrid(spectrogram(sr, mono)) }

  /** PCM16 WAV of a 32-segment tone sequence: segment s plays a sine at
    * `toneHz(s)` for `n/32` samples at `amp` peak. The fixture format
    * for the fingerprint operator — scene melodies with per-doc gain
    * and single-segment substitutions.
    */
  def syntheticToneWav(sampleRate: Int, amp: Double, toneHz: Seq[Double],
                       nSamples: Int): Array[Byte] = {
    // toneHz.length <= nSamples keeps seg >= 1: more tones than samples
    // would make `i / seg` divide by zero
    require(toneHz.nonEmpty && nSamples > 0 && amp > 0 && amp <= 32767 &&
      toneHz.length <= nSamples)
    val header = AudioHeaders.syntheticHeader(1, sampleRate, bits = 16,
      nSamples = nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream(header.length + nSamples * 2)
    out.write(header, 0, header.length)
    val seg = nSamples / toneHz.length
    var i = 0
    while (i < nSamples) {
      val hz = toneHz(math.min(i / seg, toneHz.length - 1))
      val v = (amp * StrictMath.sin(2.0 * math.Pi * hz * i / sampleRate)).toInt
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }
}
