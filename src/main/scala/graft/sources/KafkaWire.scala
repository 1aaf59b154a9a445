package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

/** Kafka over the REAL wire protocol — the transport twin of
  * internal/kafka/kafka.go (a segmentio/kafka-go producer JSON-
  * marshalling each report family to its topic). Dependency-free
  * implementation of the binary protocol subset a producer+verifier
  * needs: Produce v3 and Fetch v4 with record-batch v2 encoding —
  * zigzag varints, CRC32C over the post-crc batch bytes
  * (java.util.zip.CRC32C), size-framed requests with the standard
  * (api_key, api_version, correlation_id, client_id) header — spoken
  * over a plain TCP socket against [[InMemoryKafka]] (or any broker
  * that accepts these versions).
  */
object KafkaWire {

  final case class Record(offset: Long, key: Array[Byte], value: Array[Byte])

  // ------------------------------------------------------ primitives

  final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def i8(v: Int): Writer = { out.write(v & 0xff); this }
    def i16(v: Int): Writer = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
    def i32(v: Int): Writer = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Writer = { i32((v >> 32).toInt); i32(v.toInt); this }
    def bytes(b: Array[Byte]): Writer = { out.write(b, 0, b.length); this }
    def string(s: String): Writer = { val b = s.getBytes("UTF-8"); i16(b.length); bytes(b) }
    def nullableString(s: Option[String]): Writer =
      s.map(string).getOrElse(i16(-1))
    /** Zigzag varint (Kafka's varint form for record fields). */
    def varint(v: Long): Writer = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      out.write(z.toInt)
      this
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  final class Reader(b: Array[Byte]) {
    var pos = 0
    def i8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def i16(): Int = ((i8() << 8) | i8()).toShort.toInt
    def i32(): Int = (i8() << 24) | (i8() << 16) | (i8() << 8) | i8()
    def i64(): Long = (i32().toLong << 32) | (i32().toLong & 0xffffffffL)
    def bytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def string(): String = new String(bytes(i16()), "UTF-8")
    def nullableString(): Option[String] = {
      val n = i16()
      if (n < 0) None else Some(new String(bytes(n), "UTF-8"))
    }
    def varint(): Long = {
      var z = 0L
      var shift = 0
      var cur = 0
      do { cur = i8(); z |= (cur & 0x7fL) << shift; shift += 7 } while ((cur & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def remaining: Int = b.length - pos
  }

  // ------------------------------------------------ record batch v2

  /** Encode one record-batch v2 (magic 2): the layout every modern
    * broker and client exchange, CRC32C over everything after the crc
    * field.
    */
  def encodeBatch(
      baseOffset: Long, records: Seq[(Array[Byte], Array[Byte])],
      timestamp: Long): Array[Byte] = {
    val body = new Writer
    body.i16(0) // attributes: no compression, create-time
    body.i32(records.size - 1) // lastOffsetDelta
    body.i64(timestamp) // baseTimestamp
    body.i64(timestamp) // maxTimestamp
    body.i64(-1L) // producerId
    body.i16(-1) // producerEpoch
    body.i32(-1) // baseSequence
    body.i32(records.size)
    records.zipWithIndex.foreach { case ((key, value), i) =>
      val rec = new Writer
      rec.i8(0) // attributes
      rec.varint(0) // timestampDelta
      rec.varint(i.toLong) // offsetDelta
      if (key == null) rec.varint(-1) else { rec.varint(key.length.toLong); rec.bytes(key) }
      if (value == null) rec.varint(-1) else { rec.varint(value.length.toLong); rec.bytes(value) }
      rec.varint(0) // headers
      val recBytes = rec.toBytes
      body.varint(recBytes.length.toLong)
      body.bytes(recBytes)
    }
    val bodyBytes = body.toBytes
    val crc = new java.util.zip.CRC32C
    crc.update(bodyBytes)
    val out = new Writer
    out.i64(baseOffset)
    out.i32(4 + 1 + 4 + bodyBytes.length) // batchLength: after this field
    out.i32(-1) // partitionLeaderEpoch
    out.i8(2) // magic
    out.i32(crc.getValue.toInt)
    out.bytes(bodyBytes)
    out.toBytes
  }

  /** Decode a record set of v2 batches; validates each batch's CRC32C
    * (Left(reason) on corruption — the broker's CORRUPT_MESSAGE path).
    */
  def decodeBatches(b: Array[Byte]): Either[String, Seq[Record]] = {
    val out = Seq.newBuilder[Record]
    val r = new Reader(b)
    while (r.remaining > 12) {
      val baseOffset = r.i64()
      val batchLength = r.i32()
      if (batchLength < 9 || r.remaining < batchLength) return Left("truncated batch")
      val batchBytes = r.bytes(batchLength)
      val br = new Reader(batchBytes)
      br.i32() // partitionLeaderEpoch
      val magic = br.i8()
      if (magic != 2) return Left(s"unsupported magic $magic")
      val crcStored = br.i32()
      val crc = new java.util.zip.CRC32C
      crc.update(batchBytes, br.pos, batchBytes.length - br.pos)
      if (crc.getValue.toInt != crcStored) return Left("crc mismatch")
      br.i16() // attributes
      br.i32() // lastOffsetDelta
      br.i64(); br.i64() // timestamps
      br.i64(); br.i16(); br.i32() // producer id/epoch/sequence
      val n = br.i32()
      var i = 0
      while (i < n) {
        val len = br.varint().toInt
        val end = br.pos + len
        br.i8() // attributes
        br.varint() // timestampDelta
        val offsetDelta = br.varint()
        val keyLen = br.varint().toInt
        val key = if (keyLen < 0) null else br.bytes(keyLen)
        val valLen = br.varint().toInt
        val value = if (valLen < 0) null else br.bytes(valLen)
        val headers = br.varint().toInt
        (0 until headers).foreach { _ =>
          br.bytes(br.varint().toInt); br.bytes(br.varint().toInt)
        }
        if (br.pos != end) return Left("record length mismatch")
        out += Record(baseOffset + offsetDelta, key, value)
        i += 1
      }
    }
    Right(out.result())
  }

  // ------------------------------------------------------ framing

  private def call(host: String, port: Int, payload: Array[Byte]): Array[Byte] = {
    val sock = new Socket(host, port)
    try {
      sock.setSoTimeout(10000)
      val out = new DataOutputStream(sock.getOutputStream)
      out.writeInt(payload.length)
      out.write(payload)
      out.flush()
      val in = new DataInputStream(sock.getInputStream)
      val size = in.readInt()
      require(size >= 4 && size < (64 << 20), s"implausible response size $size")
      val resp = new Array[Byte](size)
      in.readFully(resp)
      resp
    } finally sock.close()
  }

  private def header(w: Writer, apiKey: Int, version: Int, correlationId: Int): Unit = {
    w.i16(apiKey); w.i16(version); w.i32(correlationId)
    w.nullableString(Some("graft"))
  }

  // ------------------------------------------------------- produce

  /** Produce v3 (apiKey 0): one batch to (topic, partition 0); returns
    * the assigned base offset. Throws on any broker error code.
    */
  def produce(
      host: String, port: Int, topic: String,
      records: Seq[(Array[Byte], Array[Byte])],
      timestamp: Long = 0L): Long = {
    require(records.nonEmpty)
    val batch = encodeBatch(0L, records, timestamp)
    val w = new Writer
    header(w, apiKey = 0, version = 3, correlationId = 1)
    w.nullableString(None) // transactional_id
    w.i16(-1) // acks: all
    w.i32(30000) // timeout
    w.i32(1) // topics
    w.string(topic)
    w.i32(1) // partitions
    w.i32(0) // partition
    w.i32(batch.length)
    w.bytes(batch)
    val r = new Reader(call(host, port, w.toBytes))
    r.i32() // correlationId
    val nTopics = r.i32()
    require(nTopics == 1, s"produce: $nTopics topics in response")
    r.string()
    val nParts = r.i32()
    require(nParts == 1)
    r.i32() // partition
    val err = r.i16()
    if (err != 0) throw new java.io.IOException(s"produce error code $err")
    val baseOffset = r.i64()
    r.i64() // log_append_time
    r.i32() // throttle_time_ms
    baseOffset
  }

  // --------------------------------------------------------- fetch

  /** Fetch v4 (apiKey 1) from (topic, partition 0) at `offset`. */
  def fetch(host: String, port: Int, topic: String, offset: Long): Seq[Record] = {
    val w = new Writer
    header(w, apiKey = 1, version = 4, correlationId = 2)
    w.i32(-1) // replica_id
    w.i32(500) // max_wait_ms
    w.i32(1) // min_bytes
    w.i32(32 << 20) // max_bytes
    w.i8(0) // isolation_level: read_uncommitted
    w.i32(1) // topics
    w.string(topic)
    w.i32(1) // partitions
    w.i32(0) // partition
    w.i64(offset)
    w.i32(32 << 20) // partition_max_bytes
    val r = new Reader(call(host, port, w.toBytes))
    r.i32() // correlationId
    r.i32() // throttle_time_ms
    val nTopics = r.i32()
    require(nTopics == 1)
    r.string()
    val nParts = r.i32()
    require(nParts == 1)
    r.i32() // partition
    val err = r.i16()
    if (err != 0) throw new java.io.IOException(s"fetch error code $err")
    r.i64() // high_watermark
    r.i64() // last_stable_offset
    val nAborted = r.i32()
    require(nAborted <= 0, "unexpected aborted transactions")
    val setSize = r.i32()
    val set = if (setSize <= 0) Array.emptyByteArray else r.bytes(setSize)
    decodeBatches(set).fold(m => throw new java.io.IOException(s"fetch: $m"), identity)
  }
}
