package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

/** Production [[DimensionPageFetcher]]: one `GET
  * {host}/instances/{id}/dimensions?offset=N&limit=M` per page over
  * `java.net.http`, the wire shape of the reference's batched dimension
  * getter (`client/dimensions_api.go:84-97` — offset/limit pages with
  * `Authorization: Bearer` service auth; the page body is
  * `{"items":[{"dimension":…,"option":…,"links":{"code_list":{"id":…}}}]}`).
  *
  * Configuration rides OUTSIDE the serialized plan (the seam instantiates
  * the class by name on the executor): system property
  * `graft.dataset.api.url` (else env `GRAFT_DATASET_API_URL`) names the
  * host, optional `graft.dataset.api.token` / `GRAFT_DATASET_API_TOKEN`
  * the service token. On a cluster, ship them via
  * `spark.executor.extraJavaOptions=-Dgraft.dataset.api.url=…`.
  *
  * Transient failures (connect errors, 5xx, 429) retry with exponential
  * backoff; other non-200s fail the task loudly — Spark's task retry is
  * the outer loop, so a poisoned page surfaces instead of silently
  * shrinking the scan. The `HttpClient` is pooled per executor JVM in the
  * companion (connection reuse across the executor's page partitions).
  */
class HttpDimensionFetcher extends DimensionPageFetcher {
  import HttpDimensionFetcher._

  override def fetchPage(
      instanceId: String, start: Long, end: Long): Iterator[DimensionItem] = {
    val base = sys.props.get(UrlProp).orElse(sys.env.get(UrlEnv)).getOrElse(
      throw new IllegalStateException(
        s"HttpDimensionFetcher needs -D$UrlProp=<host> (or $$$UrlEnv)"))
    val token = sys.props.get(TokenProp).orElse(sys.env.get(TokenEnv))
    val uri = URI.create(
      s"${base.stripSuffix("/")}/instances/$instanceId/dimensions?offset=$start&limit=${end - start}")
    val builder = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(30)).GET()
    token.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val body = sendWithRetry(builder.build(), MaxAttempts)
    parseItems(instanceId, body).take((end - start).toInt)
  }

  private def sendWithRetry(req: HttpRequest, attemptsLeft: Int): String = {
    val outcome =
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 => Right(resp.body())
          case s if (s >= 500 || s == 429) && attemptsLeft > 1 =>
            Left(s"status $s") // transient: retry below
          case s =>
            throw new java.io.IOException(
              s"GET ${req.uri()} failed with status $s: ${resp.body().take(200)}")
        }
      } catch {
        case e: java.io.IOException if attemptsLeft > 1 => Left(e.toString)
        case e: InterruptedException => throw e
      }
    outcome match {
      case Right(body) => body
      case Left(_) =>
        Thread.sleep(BackoffMs << (MaxAttempts - attemptsLeft))
        sendWithRetry(req, attemptsLeft - 1)
    }
  }

  /** Page-body parse (Jackson rides on Spark's classpath): missing
    * `links.code_list` degrades to an empty id — the downstream
    * validators (P6) own that judgement, not the transport.
    */
  private def parseItems(instanceId: String, body: String): Iterator[DimensionItem] = {
    val root = mapper.readTree(body)
    val items = root.path("items")
    if (!items.isArray)
      throw new java.io.IOException(
        s"dimension page for $instanceId has no items array: ${body.take(200)}")
    items.elements().asScala.map { it =>
      DimensionItem(
        instanceId,
        // the reference scopes the wire `dimension` name by instance
        // (model/models.go DimensionID = "<instance>_<name>")
        s"${instanceId}_${it.path("dimension").asText()}",
        it.path("option").asText(),
        it.path("links").path("code_list").path("id").asText())
    }
  }
}

object HttpDimensionFetcher {
  val UrlProp = "graft.dataset.api.url"
  val UrlEnv = "GRAFT_DATASET_API_URL"
  val TokenProp = "graft.dataset.api.token"
  val TokenEnv = "GRAFT_DATASET_API_TOKEN"
  private val MaxAttempts = 3
  private val BackoffMs = 200L

  /** One pooled client per executor JVM — page partitions of the same
    * executor reuse connections instead of re-handshaking per page. */
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
