package graft

import graft.sources.{InMemoryKafka, KafkaWire}
import org.scalatest.funsuite.AnyFunSuite

/** Kafka wire protocol: zigzag varints, record-batch v2 layout (pinned
  * byte positions), CRC32C validation on the broker (a tampered batch
  * must get CORRUPT_MESSAGE, not a silent append), produce/fetch round
  * trips with advancing offsets, mid-log fetches, and the error
  * surface for unknown topics and unsupported api versions.
  */
class KafkaWireSpec extends AnyFunSuite {

  private def withBroker[A](f: InMemoryKafka => A): A = {
    val b = new InMemoryKafka()
    try f(b) finally b.close()
  }

  private def rec(s: String): (Array[Byte], Array[Byte]) =
    (s.getBytes("UTF-8"), s"value-$s".getBytes("UTF-8"))

  test("zigzag varints round-trip the protocol's edge values") {
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 300L, Int.MaxValue.toLong,
                  Int.MinValue.toLong, Long.MaxValue, Long.MinValue)) {
      val w = new KafkaWire.Writer
      w.varint(v)
      val r = new KafkaWire.Reader(w.toBytes)
      assert(r.varint() == v, s"varint $v")
    }
    // pinned encodings (protobuf sint64 zigzag): 0→00, -1→01, 1→02
    def enc(v: Long) = { val w = new KafkaWire.Writer; w.varint(v); w.toBytes.toSeq }
    assert(enc(0L) == Seq[Byte](0x00))
    assert(enc(-1L) == Seq[Byte](0x01))
    assert(enc(1L) == Seq[Byte](0x02))
    assert(enc(-2L) == Seq[Byte](0x03))
    assert(enc(300L) == Seq(0xd8.toByte, 0x04.toByte))
  }

  test("record batch v2: pinned header byte positions, round trip, null key") {
    val batch = KafkaWire.encodeBatch(7L, Seq((null, "v".getBytes("UTF-8"))), 1234L)
    // baseOffset at 0..7 big-endian
    assert(batch.take(8).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 7))
    // partitionLeaderEpoch -1 at 12..15, magic 2 at byte 16
    assert(batch.slice(12, 16).toSeq == Seq[Byte](-1, -1, -1, -1))
    assert(batch(16) == 2)
    val Right(out) = KafkaWire.decodeBatches(batch)
    assert(out.size == 1 && out.head.offset == 7L)
    assert(out.head.key == null)
    assert(new String(out.head.value, "UTF-8") == "v")
  }

  test("decode rejects a flipped bit anywhere in the batch body (CRC32C)") {
    val batch = KafkaWire.encodeBatch(0L, Seq(rec("a"), rec("b")), 0L)
    // flip one payload bit past the header (offset 25: inside the body)
    val bad = batch.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 1).toByte
    assert(KafkaWire.decodeBatches(bad).isLeft)
  }

  test("produce/fetch round trip; offsets advance across produces") {
    withBroker { b =>
      val base0 = KafkaWire.produce("127.0.0.1", b.port, "t", Seq(rec("a"), rec("b")))
      assert(base0 == 0L)
      val base1 = KafkaWire.produce("127.0.0.1", b.port, "t", Seq(rec("c")))
      assert(base1 == 2L)
      val all = KafkaWire.fetch("127.0.0.1", b.port, "t", 0L)
      assert(all.map(r => new String(r.value, "UTF-8")) ==
        Seq("value-a", "value-b", "value-c"))
      assert(all.map(_.offset) == Seq(0L, 1L, 2L))
      // mid-log fetch honors the requested offset
      val tail = KafkaWire.fetch("127.0.0.1", b.port, "t", 2L)
      assert(tail.map(_.offset) == Seq(2L))
      // fetch at the end offset returns an empty record set
      assert(KafkaWire.fetch("127.0.0.1", b.port, "t", 3L).isEmpty)
    }
  }

  test("broker rejects a corrupt batch with CORRUPT_MESSAGE, log unchanged") {
    withBroker { b =>
      KafkaWire.produce("127.0.0.1", b.port, "t", Seq(rec("ok")))
      // hand-frame a produce whose batch CRC is wrong
      val batch = KafkaWire.encodeBatch(0L, Seq(rec("bad")), 0L)
      batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x40).toByte
      val w = new KafkaWire.Writer
      w.i16(0); w.i16(3); w.i32(9); w.nullableString(Some("graft"))
      w.nullableString(None); w.i16(-1); w.i32(30000)
      w.i32(1); w.string("t"); w.i32(1); w.i32(0)
      w.i32(batch.length); w.bytes(batch)
      val sock = new java.net.Socket("127.0.0.1", b.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val payload = w.toBytes
        out.writeInt(payload.length); out.write(payload); out.flush()
        val in = new java.io.DataInputStream(sock.getInputStream)
        val resp = new Array[Byte](in.readInt())
        in.readFully(resp)
        val r = new KafkaWire.Reader(resp)
        r.i32(); r.i32(); r.string(); r.i32(); r.i32()
        assert(r.i16() == 2) // CORRUPT_MESSAGE
      } finally sock.close()
      assert(KafkaWire.fetch("127.0.0.1", b.port, "t", 0L).size == 1)
    }
  }

  test("unknown topic fetch and unsupported api version surface error codes") {
    withBroker { b =>
      val e = intercept[java.io.IOException] {
        KafkaWire.fetch("127.0.0.1", b.port, "missing", 0L)
      }
      assert(e.getMessage.contains("3")) // UNKNOWN_TOPIC_OR_PARTITION
    }
  }

  test("payload bytes are exactly what was produced (UTF-8 JSON survives)") {
    withBroker { b =>
      val json = """{"report_id":"a\"b","n":3,"näme":"ü"}"""
      KafkaWire.produce("127.0.0.1", b.port, "j",
        Seq(("k".getBytes("UTF-8"), json.getBytes("UTF-8"))))
      val back = KafkaWire.fetch("127.0.0.1", b.port, "j", 0L)
      assert(new String(back.head.value, "UTF-8") == json)
      assert(new String(back.head.key, "UTF-8") == "k")
    }
  }

  test("out-of-range fetch offsets answer OFFSET_OUT_OF_RANGE, not a replay") {
    val broker = new InMemoryKafka()
    try {
      KafkaWire.produce("127.0.0.1", broker.port, "t", Seq((null, "a".getBytes("UTF-8"))))
      // offset == log end: empty success (a real broker's long-poll shape)
      assert(KafkaWire.fetch("127.0.0.1", broker.port, "t", 1L).isEmpty)
      // negative (Fetch has no -1 sentinel; that is ListOffsets) and past-end
      for (off <- Seq(-1L, 2L, 1L << 33)) {
        val e = intercept[java.io.IOException] {
          KafkaWire.fetch("127.0.0.1", broker.port, "t", off)
        }
        assert(e.getMessage.contains("error code 1"), s"offset $off")
      }
    } finally broker.close()
  }

}
