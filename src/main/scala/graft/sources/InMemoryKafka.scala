package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket}

import graft.sources.KafkaWire.{Reader, Writer}

/** In-process single-partition Kafka broker twin — the [[InMemoryImap]]
  * of the message-bus path: real size-framed Kafka protocol bytes on a
  * TCP socket so [[KafkaWire]] (the kafka.go producer twin) is
  * exercised wire-true offline. Accepts Produce v3 (validating each
  * record batch's CRC32C — a corrupted batch gets the broker's
  * CORRUPT_MESSAGE error code 2, not a silent append) and Fetch v4
  * (re-encoding the stored log from the requested offset). Topics are
  * auto-created on first produce, like a dev broker.
  */
final class InMemoryKafka extends AutoCloseable {

  private val logs =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[(Array[Byte], Array[Byte])]]
  private val lock = new Object

  private val serverSocket = new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1"))
  val port: Int = serverSocket.getLocalPort
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = serverSocket.accept()
        val t = new Thread(() => serve(sock), s"in-memory-kafka-conn-$port")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException if !running => ()
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }, s"in-memory-kafka-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: java.net.Socket): Unit = {
    try {
      sock.setSoTimeout(10000)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running) {
        val size = in.readInt()
        if (size < 8 || size > (64 << 20)) return
        val req = new Array[Byte](size)
        in.readFully(req)
        val resp = handle(req)
        out.writeInt(resp.length)
        out.write(resp)
        out.flush()
      }
    } catch {
      case _: java.io.EOFException => ()
      case scala.util.control.NonFatal(_) => ()
    } finally sock.close()
  }

  private def handle(req: Array[Byte]): Array[Byte] = {
    val r = new Reader(req)
    val apiKey = r.i16()
    val apiVersion = r.i16()
    val correlationId = r.i32()
    r.nullableString() // client_id
    (apiKey, apiVersion) match {
      case (0, 3) => produce(r, correlationId)
      case (1, 4) => fetch(r, correlationId)
      case _ =>
        // UNSUPPORTED_VERSION (35) in a produce-shaped response frame
        val w = new Writer
        w.i32(correlationId); w.i32(0); w.i32(35)
        w.toBytes
    }
  }

  private def produce(r: Reader, correlationId: Int): Array[Byte] = {
    r.nullableString() // transactional_id
    r.i16() // acks
    r.i32() // timeout
    val nTopics = r.i32()
    require(nTopics == 1, "single-topic produce only")
    val topic = r.string()
    val nParts = r.i32()
    require(nParts == 1, "single-partition produce only")
    r.i32() // partition
    val setSize = r.i32()
    val set = r.bytes(setSize)
    val (errCode, baseOffset) = KafkaWire.decodeBatches(set) match {
      case Left(_) => (2, -1L) // CORRUPT_MESSAGE
      case Right(records) =>
        lock.synchronized {
          val log = logs.getOrElseUpdate(topic,
            scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])])
          val base = log.size.toLong
          log ++= records.map(rec => (rec.key, rec.value))
          (0, base)
        }
    }
    val w = new Writer
    w.i32(correlationId)
    w.i32(1) // topics
    w.string(topic)
    w.i32(1) // partitions
    w.i32(0)
    w.i16(errCode)
    w.i64(baseOffset)
    w.i64(-1L) // log_append_time
    w.i32(0) // throttle_time_ms
    w.toBytes
  }

  private def fetch(r: Reader, correlationId: Int): Array[Byte] = {
    r.i32() // replica_id
    r.i32(); r.i32(); r.i32() // max_wait, min_bytes, max_bytes
    r.i8() // isolation
    val nTopics = r.i32()
    require(nTopics == 1, "single-topic fetch only")
    val topic = r.string()
    val nParts = r.i32()
    require(nParts == 1, "single-partition fetch only")
    r.i32() // partition
    val offset = r.i64()
    r.i32() // partition_max_bytes
    val (errCode, hw, set) = lock.synchronized {
      logs.get(topic) match {
        case None => (3, 0L, Array.emptyByteArray) // UNKNOWN_TOPIC_OR_PARTITION
        // out-of-range offsets (negative — Fetch has no -1 'latest'
        // sentinel, that's ListOffsets — or past the log end) answer
        // OFFSET_OUT_OF_RANGE like a real broker, instead of toInt
        // truncation silently replaying the log
        case Some(log) if offset < 0 || offset > log.size =>
          (1, log.size.toLong, Array.emptyByteArray) // OFFSET_OUT_OF_RANGE
        case Some(log) =>
          val slice = log.drop(offset.toInt).toSeq
          val bytes =
            if (slice.isEmpty) Array.emptyByteArray
            else KafkaWire.encodeBatch(offset, slice, timestamp = 0L)
          (0, log.size.toLong, bytes)
      }
    }
    val w = new Writer
    w.i32(correlationId)
    w.i32(0) // throttle_time_ms
    w.i32(1) // responses
    w.string(topic)
    w.i32(1) // partitions
    w.i32(0)
    w.i16(errCode)
    w.i64(hw) // high_watermark
    w.i64(hw) // last_stable_offset
    w.i32(0) // aborted_transactions: empty
    w.i32(set.length)
    w.bytes(set)
    w.toBytes
  }

  /** Test hook: topic names in creation order. */
  def topicNames: Seq[String] = lock.synchronized(logs.keys.toSeq)

  override def close(): Unit = {
    running = false
    serverSocket.close()
  }
}
