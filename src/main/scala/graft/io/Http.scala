package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.slf4j.LoggerFactory

/** HTTP core shared by the connectors: one JVM-wide client, retry with
  * exponential backoff (`backoffFactor · 2^attempt`), 2xx → body, non-2xx
  * and transport errors → retry (reference: rest_api.py:117-148,
  * sparql.py:156-212, qdrant reader.py:86-122).
  */
object Http {

  private val log = LoggerFactory.getLogger(getClass)

  /** One client per JVM (executor) — connection pooling across partitions. */
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  final case class Spec(
      method: String,
      url: String,
      headers: Map[String, String] = Map.empty,
      body: Option[String] = None,
      contentType: Option[String] = None,
      timeoutSeconds: Double = 30.0,
      maxRetries: Int = 3,
      backoffFactor: Double = 0.5)

  final case class Result(status: Int, body: String)

  def urlEncode(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Append query params to a URL (rest_api.py:39-43 `_merge_query_params`). */
  def mergeQueryParams(url: String, params: Map[String, Any]): String =
    if (params.isEmpty) url
    else {
      val qs = params.map { case (k, v) => s"${urlEncode(k)}=${urlEncode(String.valueOf(v))}" }
        .mkString("&")
      if (url.contains("?")) s"$url&$qs" else s"$url?$qs"
    }

  def formEncode(params: Map[String, Any]): String =
    params.map { case (k, v) => s"${urlEncode(k)}=${urlEncode(String.valueOf(v))}" }
      .mkString("&")

  private def buildRequest(spec: Spec): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(spec.url))
      .timeout(Duration.ofMillis((spec.timeoutSeconds * 1000).toLong))
    spec.headers.foreach { case (k, v) => b.header(k, v) }
    spec.contentType.foreach(ct => b.header("Content-Type", ct))
    val publisher = spec.body match {
      case Some(body) => HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)
      case None => HttpRequest.BodyPublishers.noBody()
    }
    b.method(spec.method.toUpperCase, publisher).build()
  }

  /** One attempt, no retry. */
  def requestOnce(spec: Spec): Result = {
    val resp = client.send(buildRequest(spec), HttpResponse.BodyHandlers.ofString())
    Result(resp.statusCode(), resp.body())
  }

  /** Client errors that cannot succeed on retry: 4xx except 408 (request
    * timeout) and 429 (rate limit). Retrying a bad api_key through full
    * exponential backoff — per page, per partition — just multiplies the
    * time to the same failure.
    */
  private def isRetryable(status: Int): Boolean =
    status < 400 || status >= 500 || status == 408 || status == 429

  /** Retrying request: 2xx → Some(body); retried on 5xx/408/429 and
    * transport errors; other 4xx fail fast; None after exhausting
    * `maxRetries + 1` attempts (or on the first non-retryable status).
    */
  def requestWithRetry(spec: Spec): Option[String] = {
    val attempts = math.max(spec.maxRetries, 0) + 1
    var attempt = 0
    while (attempt < attempts) {
      try {
        val r = requestOnce(spec)
        if (r.status >= 200 && r.status < 300) return Some(r.body)
        if (!isRetryable(r.status)) {
          log.error(s"Non-retryable HTTP ${r.status} from ${spec.url}; failing fast")
          return None
        }
        log.warn(s"Received HTTP ${r.status} from ${spec.url} " +
          s"(attempt ${attempt + 1}/$attempts)")
      } catch {
        case e: Exception =>
          log.warn(s"Request to ${spec.url} failed on attempt " +
            s"${attempt + 1}/$attempts: ${e.getMessage}")
      }
      if (attempt < attempts - 1) {
        val delayMs = (spec.backoffFactor * math.pow(2, attempt) * 1000).toLong
        if (delayMs > 0) Thread.sleep(delayMs)
      }
      attempt += 1
    }
    log.error(s"Exhausted retries fetching ${spec.url}")
    None
  }

  /** Strict variant: throws after exhausting retries (SPARQL/Qdrant
    * semantics).
    */
  def requestWithRetryOrThrow(spec: Spec): String =
    requestWithRetry(spec).getOrElse(
      throw new RuntimeException(
        s"Request to ${spec.url} failed after ${math.max(spec.maxRetries, 0) + 1} attempts"))

  /** Basic-auth header value. */
  def basicAuth(user: String, password: String): String =
    "Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$user:$password".getBytes(StandardCharsets.UTF_8))
}
