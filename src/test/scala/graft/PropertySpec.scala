package graft

import graft.functions.{AudioHeaders, HeavyHitters, ImageHeaders, VideoHeaders}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (scalacheck) for the pure-JVM helpers on the
  * ingest hot path. These run per-ROW on a 100 TB scan, so the
  * properties that matter are totality (arbitrary bytes must never
  * throw — one corrupt blob must not kill an executor task) and the
  * sketch guarantees that downstream operators assume.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, tests: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(r.passed, r.status.toString)
  }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  // adversarial variant: valid magic numbers followed by garbage, so the
  // parsers' length/offset arithmetic (not just the signature check) is hit
  private val magics = Seq(
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    "GIF89a".getBytes, "BM".getBytes, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "RIFF".getBytes, "ftyp".getBytes,
    Array[Byte]('I', 'I', 42, 0), Array[Byte]('M', 'M', 0, 42))
  private val magicPrefixed: Gen[Array[Byte]] =
    for { m <- Gen.oneOf(magics); tail <- bytesGen } yield m ++ tail

  test("image/audio/video header parsers and decompress are total on arbitrary bytes") {
    check(Prop.forAllNoShrink(bytesGen) { b =>
      ImageHeaders.parse(b); AudioHeaders.parse(b); VideoHeaders.parse(b)
      ImageHeaders.decodeBmpPixels(b); AudioHeaders.decodePcmSamples(b)
      graft.functions.AviFrames.decode(b)
      graft.functions.JpegPixels.decode(b)
      graft.functions.PerceptualHash.phash64(b)
      graft.functions.AudioFingerprint.fingerprint64(b)
      graft.functions.FlacHeaders.parse(b)
      graft.functions.TiffPixels.decode(b)
      graft.sources.Extract.decompress(b)
      true
    })
    check(Prop.forAllNoShrink(magicPrefixed) { b =>
      ImageHeaders.parse(b); AudioHeaders.parse(b); VideoHeaders.parse(b)
      ImageHeaders.decodeBmpPixels(b); AudioHeaders.decodePcmSamples(b)
      graft.functions.AviFrames.decode(b)
      graft.functions.JpegPixels.decode(b)
      graft.functions.PerceptualHash.phash64(b)
      graft.functions.AudioFingerprint.fingerprint64(b)
      graft.functions.FlacHeaders.parse(b)
      graft.functions.TiffPixels.decode(b)
      true
    })
    check(Prop.forAllNoShrink(bytesGen) { tail =>
      graft.functions.FlacHeaders.parse("fLaC".getBytes ++ tail); true
    })
  }

  test("crafted adversarial payloads: overflow sizes and truncated headers reject, not throw") {
    import graft.functions.AviFrames
    def w32le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // chunk size near Int.MaxValue: Int arithmetic would wrap the
    // bounds check negative and index with a negative offset
    val overflowAvi = "RIFF".getBytes ++ w32le(100) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ w32le(0x7fffffff)
    assert(AviFrames.decode(overflowAvi).isEmpty)
    // truncated hdrl: avih tag present but its payload reads past the
    // buffer unless bounded by the ACTUAL enclosing LIST size
    val truncatedHdrl = "RIFF".getBytes ++ w32le(20) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ w32le(8) ++ "hdrl".getBytes ++ "avih".getBytes
    assert(AviFrames.decode(truncatedHdrl).isEmpty)
    // BMP declaring width 2^30: w*3 wraps negative in Int, defeating
    // the row-bytes bounds check
    val hugeBmp = new Array[Byte](54)
    hugeBmp(0) = 'B'; hugeBmp(1) = 'M'
    System.arraycopy(w32le(54), 0, hugeBmp, 10, 4)
    System.arraycopy(w32le(0x40000000), 0, hugeBmp, 18, 4)
    System.arraycopy(w32le(1), 0, hugeBmp, 22, 4)
    hugeBmp(28) = 24
    assert(graft.functions.ImageHeaders.decodeBmpPixels(hugeBmp).isEmpty)
  }

  test("image header round-trip: synthetic headers parse back to their dimensions") {
    // the three formats syntheticHeader generates (jpeg headers are
    // parsed from the reference repo's real screenshots instead —
    // ImageHeadersSpec)
    val dims = for {
      f <- Gen.oneOf("png", "gif", "bmp")
      w <- Gen.chooseNum(1, 65000)
      h <- Gen.chooseNum(1, 65000)
    } yield (f, w, h)
    check(Prop.forAllNoShrink(dims) { case (f, w, h) =>
      ImageHeaders.parse(ImageHeaders.syntheticHeader(f, w, h))
        .exists { case (fmt, pw, ph) => fmt == f && pw == w && ph == h }
    })
  }

  test("Misra-Gries: every term above n/(k+1) is reported, counts never overcount") {
    val streams: Gen[List[String]] =
      Gen.chooseNum(1, 400).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 20).map(i => s"t$i")))
    val k = 8
    check(Prop.forAllNoShrink(streams) { tokens =>
      val agg = new HeavyHitters(k)
      // split the stream and merge, exercising the mergeable-summary path
      val (a, b) = tokens.splitAt(tokens.length / 2)
      val summary = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val reported = agg.finish(summary).toMap
      val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val floor = tokens.size.toDouble / (k + 1)
      val allHeavyReported = exact.forall { case (t, c) =>
        c <= floor || reported.contains(t)
      }
      val neverOvercounts = reported.forall { case (t, c) =>
        c <= exact.getOrElse(t, 0L)
      }
      allHeavyReported && neverOvercounts
    })
  }
}
