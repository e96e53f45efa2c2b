package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** The `/health` HTTP surface over a [[HealthMonitor]] — the ST6
  * counterpart of the reference's healthcheck server
  * (`cmd/dp-dimension-importer/main.go:227-243`, dp-healthcheck handler
  * semantics): one GET endpoint, a JSON body with overall + per-check
  * status, and the HTTP code carrying the verdict —
  *
  *  - 200 `OK`       — every tracked query is healthy or cleanly stopped;
  *  - 429 `WARNING`  — nothing failed, but some query is still `Starting`
  *                     (the reference starts WARNING until every checker
  *                     has completed once);
  *  - 500 `CRITICAL` — a query Failed, or went stale past `staleAfterMs`.
  *
  * Built on the JDK's `com.sun.net.httpserver` so the data plane takes no
  * HTTP-framework dependency. `port = 0` binds an ephemeral port (tests);
  * deployments pass the configured bind address. The handler reads one
  * volatile snapshot per request — no locks held while serializing, and a
  * request can never block the streaming listener bus.
  */
final class HealthEndpoint private (
    server: HttpServer,
    monitor: HealthMonitor,
    staleAfterMs: Long,
    startedAtMs: Long) {

  /** The actually-bound port (resolves an ephemeral bind). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  private def overall(now: Long): (Int, String) = {
    val hs = monitor.snapshot.values
    val critical = hs.exists {
      case h => h.status match {
        case Health.Failed(_) => true
        case Health.Stopped   => false
        case _                => !h.healthy(now, staleAfterMs)
      }
    }
    val warming = hs.exists(_.status == Health.Starting)
    if (critical) (500, "CRITICAL")
    else if (warming) (429, "WARNING")
    else (200, "OK")
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def body(now: Long, status: String): String = {
    val checks = monitor.snapshot.values.toSeq.sortBy(_.name).map { h =>
      val (st, msg) = h.status match {
        case Health.Failed(err) => ("CRITICAL", err)
        case Health.Stopped     => ("OK", "query stopped cleanly")
        case Health.Starting    => ("WARNING", "query starting, no progress yet")
        case Health.Ok =>
          if (h.healthy(now, staleAfterMs)) ("OK", "query progressing")
          else ("CRITICAL", s"no progress for ${now - h.lastEventMs} ms")
      }
      s"""{"name":${jstr(h.name)},"status":${jstr(st)},"message":${jstr(msg)},""" +
        s""""last_event_ms":${h.lastEventMs},"total_input_rows":${h.totalInputRows},""" +
        s""""progress_events":${h.numProgressEvents}}"""
    }
    s"""{"status":${jstr(status)},"uptime_ms":${now - startedAtMs},""" +
      s""""checks":[${checks.mkString(",")}]}"""
  }

  private[streaming] def handle(exchange: HttpExchange): Unit = {
    val now = System.currentTimeMillis()
    val (code, status) =
      if (exchange.getRequestMethod != "GET") (405, null)
      else if (exchange.getRequestURI.getPath != "/health") (404, null)
      else overall(now)
    val bytes =
      (if (status == null) s"""{"error":$code}""" else body(now, status))
        .getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(code, bytes.length.toLong)
    val os = exchange.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object HealthEndpoint {

  /** Start serving `/health` for `monitor`. `staleAfterMs` is the
    * progress-recency window that separates a slow query from a hung one —
    * size it to a few multiples of the expected trigger interval.
    */
  def start(monitor: HealthMonitor, port: Int = 0,
            staleAfterMs: Long = 60000L): HealthEndpoint = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val ep = new HealthEndpoint(server, monitor, staleAfterMs,
      System.currentTimeMillis())
    server.createContext("/", new HttpHandler {
      override def handle(exchange: HttpExchange): Unit = ep.handle(exchange)
    })
    server.setExecutor(null) // serve on the dispatch thread: one tiny JSON per request
    server.start()
    ep
  }
}
