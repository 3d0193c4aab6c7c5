package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Driver-side HTTP boundary (reference `_base.py:73-93,132-175`).
  *
  * Error-tolerant by contract: any timeout/HTTP/connect error returns
  * None (the reference's read_csv returns None and the caller
  * skips-and-logs — S14). Injectable so every source is testable with
  * canned payloads and the engine itself never needs network in tests.
  */
trait Transport {
  def get(url: String, params: Map[String, String] = Map.empty): Option[String]
}

object Transport {
  def withQuery(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val q = params.toSeq.sortBy(_._1).map { case (k, v) =>
        URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      url + (if (url.contains('?')) "&" else "?") + q
    }
}

/** Real client on java.net.http — one client instance per source run,
  * reused across the pagination loop (the reference's shared-client
  * efficiency note, `_base.py:142-144`). */
final class JdkHttpTransport(timeoutSeconds: Int = 30) extends Transport {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds.toLong))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def get(url: String, params: Map[String, String]): Option[String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(Transport.withQuery(url, params)))
        .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 200 && resp.statusCode() < 300) Some(resp.body())
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** Canned transport for tests: exact-URL (with query) lookup. */
final case class CannedTransport(responses: Map[String, String]) extends Transport {
  var requests: List[String] = Nil
  override def get(url: String, params: Map[String, String]): Option[String] = {
    val full = Transport.withQuery(url, params)
    requests = full :: requests
    responses.get(full)
  }
}
