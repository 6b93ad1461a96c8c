package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/**
 * In-process deterministic twin of the reference's postcode HTTP API
 * (`python_scripts/write_data_to_land.py:31-40` fetches
 * api.postcodes.io/random/postcodes per row). This container has no
 * network egress, so the real endpoint is unreachable — the twin serves
 * the SAME md5-derived documents over REAL localhost HTTP (JDK
 * HttpServer), which keeps the whole connector path genuine: sockets,
 * paging, retries, JSON parse, result.* flatten. A production user points
 * `.option("url", ...)` at their actual service instead; nothing in the
 * connector knows the difference.
 *
 * Request contract: `GET /postcodes?start=<s>&count=<n>&cols=<c1,c2,...>`
 * → JSONL, one `{"index":i,"result":{...}}` envelope per line, only the
 * requested result fields present (column pruning ON THE WIRE).
 *
 * Test hooks: every request URI lands in [[requests]];
 * [[injectFailure]] makes the next request fail with a 503 once, to
 * prove the reader's bounded per-page retry.
 */
object PostcodeApiTwin {
  val requests = new ConcurrentLinkedQueue[String]()
  private val failNext = new AtomicBoolean(false)
  def injectFailure(): Unit = failNext.set(true)

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/postcodes", handler)
    // daemon threads: Verify/Bench mains must exit without an explicit stop
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "postcode-api-twin")
      t.setDaemon(true)
      t
    }))
    // start() spawns the HTTP-Dispatcher thread, which INHERITS the
    // creating thread's daemon flag — start from a daemon thread or the
    // dispatcher pins the JVM open after main returns (Verify/Bench under
    // `run / fork := true` would never exit)
    val starter = new Thread(() => s.start(), "postcode-api-twin-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s
  }

  /** Base URL, starting the server on first use (ephemeral port). */
  lazy val url: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/postcodes"

  private def handler: HttpHandler = (ex: HttpExchange) => {
    try {
      val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      requests.add(ex.getRequestURI.toString)
      if (failNext.compareAndSet(true, false)) {
        ex.sendResponseHeaders(503, -1)
      } else {
        val params = query.split('&').filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val start = params.getOrElse("start", "0").toLong
        val count = params.getOrElse("count", "0").toLong
        val cols = params.getOrElse("cols", "")
          .split(',').filter(_.nonEmpty).toSet
        val sb = new StringBuilder
        var i = start
        while (i < start + count) {
          val hex = PostcodeSource.md5Hex(i.toString)
          sb.append("{\"status\":200,\"index\":").append(i)
            .append(",\"result\":{")
          val fields = Seq(
            "postcode" -> (() => "\"" + PostcodeSource.postcodeOf(hex) + "\""),
            "quality" -> (() => PostcodeSource.qualityOf(hex).toString),
            "eastings" -> (() => PostcodeSource.eastingsOf(hex).toString),
            "northings" -> (() => PostcodeSource.northingsOf(hex).toString),
            "european_electoral_region" ->
              (() => "\"" + PostcodeSource.regionOf(hex) + "\""))
            .filter { case (n, _) => cols.contains(n) }
          sb.append(fields.map { case (n, v) => "\"" + n + "\":" + v() }
            .mkString(","))
          sb.append("}}\n")
          i += 1
        }
        val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/x-ndjson")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    } finally ex.close()
  }
}
