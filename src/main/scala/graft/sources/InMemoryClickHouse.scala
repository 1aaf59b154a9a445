package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** In-process twin of ClickHouse's HTTP interface — the [[InMemoryImap]]
  * of the storage layer. The production-side code
  * ([[ClickHouseHttp]]) speaks the REAL HTTP dialect ClickHouse serves
  * on :8123 (the reference's datasource.json points Grafana at exactly
  * this interface): `POST /` with SQL bodies for DDL,
  * `POST /?query=INSERT INTO t FORMAT JSONEachRow` with newline-
  * delimited JSON rows, `SELECT ... FORMAT JSONEachRow` readback, and
  * `GET /ping` → `Ok.`. The server stores rows as parsed JSON and
  * serves back exactly what was inserted, so specs and the
  * o_clickhouse_http entry verify the full wire round trip.
  *
  * Deliberately NOT a SQL engine: it accepts the reference's five
  * CREATE TABLEs (clickhouse.go:79-228) by parsing the table name,
  * rejects inserts into unknown tables (like the real server), and
  * supports the exact readback forms the client uses.
  */
final class InMemoryClickHouse extends AutoCloseable {

  private val tables =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[JValue]]
  private val lock = new Object

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  val port: Int = server.getAddress.getPort
  // daemon threads + explicit shutdown in close(): a leaked pool must
  // never keep the driver JVM alive after main returns
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, s"in-memory-clickhouse-$port")
    t.setDaemon(true)
    t
  })
  server.setExecutor(pool)

  server.createContext("/ping", (ex: HttpExchange) => respond(ex, 200, "Ok.\n"))
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch { case scala.util.control.NonFatal(e) => respond(ex, 500, s"error: $e\n") }
  })
  server.start()

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\(.*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\([^)]*\)\s*)?FORMAT\s+JSONEachRow\s*""".r
  private val SelectAllRe =
    """(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+FORMAT\s+JSONEachRow\s*""".r
  private val CountRe =
    """(?is)\s*SELECT\s+count\(\)\s+FROM\s+(\w+)\s*""".r

  private def handle(ex: HttpExchange): Unit = {
    val queryParam = Option(ex.getRequestURI.getRawQuery)
      .flatMap(_.split("&").find(_.startsWith("query=")))
      .map(q => java.net.URLDecoder.decode(q.drop(6), "UTF-8"))
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    // ClickHouse semantics: the statement is the `query` parameter if
    // present (body = data), else the body itself
    val sql = queryParam.getOrElse(body)
    sql match {
      case CreateRe(name) =>
        lock.synchronized {
          tables.getOrElseUpdate(name.toLowerCase,
            scala.collection.mutable.ArrayBuffer.empty[JValue])
        }
        respond(ex, 200, "")
      case InsertRe(name) =>
        val t = name.toLowerCase
        val data = if (queryParam.isDefined) body else "" // inline data unsupported
        val parsed = data.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
          .map(line => JsonMethods.parse(line)).toVector
        lock.synchronized {
          tables.get(t) match {
            case None => respond(ex, 404, s"Table $t does not exist\n")
            case Some(buf) => buf ++= parsed; respond(ex, 200, "")
          }
        }
      case SelectAllRe(name) =>
        val rows = lock.synchronized(tables.get(name.toLowerCase).map(_.toVector))
        rows match {
          case None => respond(ex, 404, s"Table ${name.toLowerCase} does not exist\n")
          case Some(rs) =>
            respond(ex, 200, rs.map(r => JsonMethods.compact(JsonMethods.render(r)))
              .mkString("", "\n", "\n"))
        }
      case CountRe(name) =>
        val n = lock.synchronized(tables.get(name.toLowerCase).map(_.size))
        n match {
          case None => respond(ex, 404, s"Table ${name.toLowerCase} does not exist\n")
          case Some(c) => respond(ex, 200, s"$c\n")
        }
      case other =>
        respond(ex, 400, s"unsupported statement: ${other.take(80)}\n")
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  /** Test hook: current table names (insertion order). */
  def tableNames: Seq[String] = lock.synchronized(tables.keys.toSeq)

  override def close(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }
}
