package graft

import graft.functions.{GeoEnrichment, MaxMindDb}
import graft.sources.MmdbFixture
import org.scalatest.funsuite.AnyFunSuite

/** MaxMind-DB binary format: the fixture writer emits a spec-true v2.0
  * file and the reader decodes it through the same field path the
  * reference's geoip2 City() lookup takes. The two sides are held
  * together by value checks against the ORIGINAL fixture list (not by
  * comparing writer output to reader input structurally), plus
  * totality sweeps and format-boundary cases.
  */
class MaxMindDbSpec extends AnyFunSuite {

  private lazy val bytes = MmdbFixture.fromGeoFixture()
  private lazy val db = MaxMindDb.open(bytes)
    .fold(m => fail(s"fixture did not open: $m"), identity)

  test("every fixture /8 resolves to its country and synthesized city") {
    GeoEnrichment.Fixture.foreach { case (octet, country, zone) =>
      val got = db.lookupCity(s"$octet.12.34.56")
      assert(got.isDefined, s"octet $octet")
      assert(got.get.country == country, s"octet $octet")
      assert(got.get.city == s"$country-${zone.split("\\.")(0)}", s"octet $octet")
      assert(!got.get.isAnonymousProxy && !got.get.isSatelliteProvider)
    }
  }

  test("non-fixture octets and malformed IPs return None, never throw") {
    val covered = GeoEnrichment.Fixture.map(_._1).toSet
    (0 to 255).filterNot(covered).foreach { o =>
      assert(db.lookupCity(s"$o.1.2.3").isEmpty, s"octet $o")
    }
    Seq("", "1.2.3", "1.2.3.4.5", "256.1.1.1", "a.b.c.d", "1..2.3", "01x.2.3.4")
      .foreach(ip => assert(db.lookupCity(ip).isEmpty, ip))
  }

  test("repeated strings travel as pointers (interning shrinks the file)") {
    // a build WITHOUT shared strings must be measurably larger; the
    // reader decodes both identically — i.e. the pointer path is live
    val dup = MmdbFixture.build(Seq(
      1 -> MmdbFixture.CityRecord("US", "US-mail"),
      2 -> MmdbFixture.CityRecord("US", "US-edge"),
      3 -> MmdbFixture.CityRecord("FR", "FR-mail")))
    val d = MaxMindDb.open(dup).toOption.get
    assert(d.lookupCity("1.0.0.1").get.country == "US")
    assert(d.lookupCity("2.0.0.1").get.city == "US-edge")
    assert(d.lookupCity("3.255.255.255").get.country == "FR")
    // all three records share the key strings "country"/"names"/... —
    // with interning each literal appears in the file EXACTLY once
    // (later uses are pointers), which is also proof the reader's
    // pointer path was on the wire for every record after the first
    def occurrences(needle: String): Int = {
      val n = needle.getBytes("UTF-8")
      (0 to dup.length - n.length)
        .count(i => n.indices.forall(j => dup(i + j) == n(j)))
    }
    assert(occurrences("country") == 1)
    assert(occurrences("names") == 1)
    assert(occurrences("is_anonymous_proxy") == 1)
  }

  test("identical records are deduplicated to one data offset") {
    val same = MmdbFixture.CityRecord("US", "US-x")
    val two = MmdbFixture.build(Seq(10 -> same, 20 -> same))
    val one = MmdbFixture.build(Seq(10 -> same))
    val d = MaxMindDb.open(two).toOption.get
    assert(d.lookupCity("10.0.0.1") == d.lookupCity("20.0.0.1"))
    // the second leaf reuses the first record: well under 2× the size
    assert(two.length - one.length < 30, s"${two.length} vs ${one.length}")
  }

  test("traits flags follow the reference's anonymous-proxy/satellite read") {
    val b = MmdbFixture.build(Seq(
      5 -> MmdbFixture.CityRecord("US", "US-proxy", isAnonymousProxy = true),
      6 -> MmdbFixture.CityRecord("US", "US-sat", isSatelliteProvider = true)))
    val d = MaxMindDb.open(b).toOption.get
    assert(d.lookupCity("5.0.0.0").get.isAnonymousProxy)
    assert(d.lookupCity("6.0.0.0").get.isSatelliteProvider)
  }

  test("metadata round-trips: node_count/record_size/ip_version drive the reader") {
    assert(db.ipVersion == 4)
  }

  test("totality: every truncation fails to open or looks up to None, never throws") {
    for (len <- 0 until bytes.length by 7) {
      val t = java.util.Arrays.copyOf(bytes, len)
      MaxMindDb.open(t) match {
        case Right(d2) => GeoEnrichment.Fixture.take(3)
          .foreach { case (o, _, _) => d2.lookupCity(s"$o.1.2.3") } // may be None
        case Left(_) => () // refused — fine
      }
    }
  }

  test("totality: single-byte corruption never throws") {
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      MaxMindDb.open(m).foreach { d2 =>
        d2.lookupCity("12.1.2.3"); d2.lookupCity("99.1.2.3")
      }
    }
  }

  test("binary-reader lookups agree with the broadcast-join enrichment on the same fixture") {
    GeoEnrichment.Fixture.foreach { case (octet, country, _) =>
      assert(db.lookupCity(s"$octet.9.9.9").map(_.country).contains(country))
    }
  }

  test("ip_version=6 tree: IPv4 under ::/96 resolves (the real GeoLite2 layout)") {
    val v6 = MaxMindDb.open(MmdbFixture.build(
      GeoEnrichment.Fixture.map { case (octet, country, zone) =>
        octet -> MmdbFixture.CityRecord(country, s"$country-${zone.split("\\.")(0)}")
      }, ipVersion = 6)).toOption.get
    assert(v6.ipVersion == 6)
    GeoEnrichment.Fixture.foreach { case (octet, country, _) =>
      assert(v6.lookupCity(s"$octet.1.2.3").map(_.country).contains(country))
    }
    assert(v6.lookupCity("99.1.2.3").isEmpty) // non-fixture octet still misses
  }

}
