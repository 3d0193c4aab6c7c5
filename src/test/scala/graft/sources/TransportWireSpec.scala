package graft.sources

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level tests for the real HTTP boundary (S14, reference
  * `_base.py:132-175`): JdkHttpTransport against a live loopback
  * server — success, HTTP error, server error, timeout, refused
  * connection, redirect, and the pagination loop's skip-and-log
  * behavior over real sockets (no canned transport anywhere here). */
class TransportWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) =>
      respond(ex, 200, s"""{"echo":"${ex.getRequestURI.getQuery}"}"""))
    server.createContext("/missing", (ex: HttpExchange) => respond(ex, 404, "nope"))
    server.createContext("/boom", (ex: HttpExchange) => respond(ex, 500, "err"))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(3000)
      respond(ex, 200, "late")
    })
    server.createContext("/moved", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Location", s"$base/ok")
      respond(ex, 302, "")
    })
    // page/pages protocol: IND1 has two pages; BAD returns a
    // message-only payload; GONE 500s — the loop must isolate both
    server.createContext("/api/IND1", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").collectFirst { case s if s.startsWith("page=") => s.drop(5) }
        .getOrElse("1")
      val body =
        if (page == "1")
          """[{"page":1,"pages":2},[{"c":"AFG","v":1.0}]]"""
        else
          """[{"page":2,"pages":2},[{"c":"NAM","v":2.0},{"c":"KEN","v":3.0}]]"""
      respond(ex, 200, body)
    })
    server.createContext("/api/BAD", (ex: HttpExchange) =>
      respond(ex, 200, """[{"message":[{"id":120,"value":"no data"}]}]"""))
    server.createContext("/api/GONE", (ex: HttpExchange) => respond(ex, 500, ""))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  test("2xx returns the body with query params encoded on the wire") {
    val t = new JdkHttpTransport(timeoutSeconds = 5)
    val got = t.get(s"$base/ok", Map("a" -> "1", "b" -> "x y"))
    assert(got.contains("""{"echo":"a=1&b=x+y"}"""))
  }

  test("HTTP 404/500 return None (error-tolerant scan contract)") {
    val t = new JdkHttpTransport(timeoutSeconds = 5)
    assert(t.get(s"$base/missing").isEmpty)
    assert(t.get(s"$base/boom").isEmpty)
  }

  test("request timeout returns None instead of raising") {
    val t = new JdkHttpTransport(timeoutSeconds = 1)
    assert(t.get(s"$base/slow").isEmpty)
  }

  test("refused connection returns None") {
    val dead = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = dead.getAddress.getPort // bound then released: nothing listens
    dead.start(); dead.stop(0)
    val t = new JdkHttpTransport(timeoutSeconds = 2)
    assert(t.get(s"http://127.0.0.1:$port/ok").isEmpty)
  }

  test("redirects are followed (Redirect.NORMAL)") {
    val t = new JdkHttpTransport(timeoutSeconds = 5)
    assert(t.get(s"$base/moved").exists(_.contains("echo")))
  }

  test("pagination loop over live sockets: accumulates pages, isolates bad indicators") {
    val t = new JdkHttpTransport(timeoutSeconds = 5)
    val rows = JsonSources.fetchPagePages(t,
      (ind, p) => (s"$base/api/$ind", Map("page" -> p.toString)),
      Seq("IND1", "BAD", "GONE"))
    assert(rows.length == 3)
    assert(rows.mkString.contains("NAM"))
  }
}
