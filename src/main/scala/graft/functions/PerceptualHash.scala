package graft.functions

/** 64-bit perceptual image hash (pHash): grayscale → 32×32 box
  * downsample → 2D DCT-II → sign-vs-median over the 8×8 low-frequency
  * block (DC excluded). Two images whose low-frequency structure
  * matches — resized, re-encoded, brightness-shifted, lightly noised
  * copies — land within a few bits of Hamming distance, which makes
  * near-dup image detection the SAME banded-join problem simhash
  * already solves for text (a pair within Hamming 3 of a 64-bit hash
  * shares one of its 4×16-bit bands exactly).
  *
  * Brightness invariance is structural, not approximate: adding a
  * constant to every pixel moves only the DCT's DC coefficient, and
  * both the bit set and the median EXCLUDE DC.
  *
  * Input is the repo's codec-free uncompressed 24bpp BMP (the same
  * contract as ImageHeaders.decodeBmpPixels; a production pipeline
  * feeds any decoded pixel grid). Totality: None on anything
  * malformed, never throw.
  */
object PerceptualHash {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val N = 32 // downsample grid
  private val K = 8  // low-frequency block

  /** Grayscale grid (Rec. 601 luma) of an uncompressed 24bpp BMP in
    * storage order — the same guards as decodeBmpPixels (dimension
    * caps keep every Int product safe).
    */
  private[functions] def bmpGray(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0 ||
        w > (1 << 20) || h > (1 << 20)) return None
    val rowBytes = ((w.toLong * 3 + 3) / 4 * 4).toInt
    if (off < 54 || off.toLong + rowBytes.toLong * h > b.length) return None
    val g = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      val row = off + y * rowBytes
      while (x < w) {
        val i = row + x * 3
        g(y * w + x) = 0.114 * u8(b, i) + 0.587 * u8(b, i + 1) + 0.299 * u8(b, i + 2)
        x += 1
      }
      y += 1
    }
    Some((w, h, g))
  }

  /** Box-average `src` (w×h) onto the N×N grid; cell boundaries are
    * floor(c·dim/N), widened to at least one source pixel so dims < N
    * degrade to nearest-sampling instead of empty cells.
    */
  private def boxDownsample(w: Int, h: Int, src: Array[Double]): Array[Double] = {
    val out = new Array[Double](N * N)
    var cy = 0
    while (cy < N) {
      val y0 = cy * h / N
      val y1 = math.max((cy + 1) * h / N, y0 + 1)
      var cx = 0
      while (cx < N) {
        val x0 = cx * w / N
        val x1 = math.max((cx + 1) * w / N, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += src(y * w + x); x += 1 }
          y += 1
        }
        out(cy * N + cx) = s / ((y1 - y0) * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    out
  }

  private val cosTable: Array[Double] = {
    // cos(π(2x+1)u / 2N) for x ∈ [0,N), u ∈ [0,K). StrictMath, not
    // Math: the snapshot oracles pin exact hash bits, and Math.cos may
    // vary by ulps across JVMs/CPUs — a coefficient sitting exactly on
    // the median would flip a pinned bit on another platform.
    val t = new Array[Double](N * K)
    var u = 0
    while (u < K) {
      var x = 0
      while (x < N) {
        t(u * N + x) = StrictMath.cos(math.Pi * (2 * x + 1) * u / (2.0 * N))
        x += 1
      }
      u += 1
    }
    t
  }

  /** The K×K low-frequency block of the 2D DCT-II of an N×N grid. */
  private def dctLowFreq(g: Array[Double]): Array[Double] = {
    // separable: rows first (N×K), then columns (K×K)
    val rows = new Array[Double](N * K)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var x = 0
        while (x < N) { s += g(y * N + x) * cosTable(u * N + x); x += 1 }
        rows(y * K + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rows(yy * K + u) * cosTable(v * N + yy); yy += 1 }
        out(v * K + u) = s
        u += 1
      }
      v += 1
    }
    out
  }

  /** DCT-sign hash of any N×N grid: bit (v·8+u) is set when DCT
    * coefficient (u,v) exceeds the median of the 63 non-DC
    * coefficients; the DC bit (0) is always clear. Shared by the image
    * pHash (grayscale grid) and the audio fingerprint (log-spectrogram
    * grid) — any input transform that shifts the whole grid by a
    * constant moves only DC, which both the bit set and the median
    * exclude.
    */
  private[functions] def hashGrid(g: Array[Double]): Long = {
    require(g.length == N * N, s"hashGrid wants ${N * N} cells, got ${g.length}")
    val c = dctLowFreq(g)
    val nonDc = java.util.Arrays.copyOfRange(c, 1, K * K)
    java.util.Arrays.sort(nonDc)
    val median = nonDc(nonDc.length / 2) // 63 values → element 31
    var hash = 0L
    var i = 1
    while (i < K * K) {
      if (c(i) > median) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** 64-bit pHash of an uncompressed 24bpp BMP; None if undecodable. */
  def phash64(b: Array[Byte]): Option[Long] =
    bmpGray(b).map { case (w, h, gray) => hashGrid(boxDownsample(w, h, gray)) }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
