package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BuildkiteApi, BuildkiteApiClient}

/** Mirrors reference buildkite_api_test.go: param-validation messages,
  * header behavior against a local HTTP server, error statuses.
  */
class BuildkiteApiSpec extends AnyFunSuite {
  import TestSpark.spark

  test("validateParams reports every missing parameter") {
    assert(BuildkiteApi.validateParams("o", "p", "b", "j").isEmpty)
    assert(BuildkiteApi.validateParams("", "p", "b", "j")
      .contains("missing required API parameters: organization"))
    assert(BuildkiteApi.validateParams("", "", "", "")
      .contains("missing required API parameters: organization, pipeline, build, job"))
  }

  test("empty token rejected before any request") {
    val c = new BuildkiteApiClient("")
    val e = intercept[IllegalArgumentException](c.getJobLog("o", "p", "1", "j"))
    assert(e.getMessage == "API token is required")
  }

  test("fetches a log with auth/UA headers, parses it end-to-end") {
    val osc = "_bk;t=1745322209921"
    val logBody = s"$osc~~~ Group A\r\n${osc}line one\r\n"
    @volatile var seenAuth: String = null
    @volatile var seenAccept: String = null
    @volatile var seenUa: String = null

    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v2/organizations/my-org/pipelines/my-pipe/builds/42/jobs/j1/log",
      new HttpHandler {
        def handle(x: HttpExchange): Unit = {
          seenAuth = x.getRequestHeaders.getFirst("Authorization")
          seenAccept = x.getRequestHeaders.getFirst("Accept")
          seenUa = x.getRequestHeaders.getFirst("User-Agent")
          val bytes = logBody.getBytes("UTF-8")
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes)
          x.close()
        }
      })
    server.start()
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/v2"
      val client = new BuildkiteApiClient("tok-123", "test", base)
      val df = client.fetchAndParse(spark, "my-org", "my-pipe", "42", "j1")
      val rows = df.orderBy("line_no").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("group") == "~~~ Group A")
      assert(rows(1).getAs[String]("content") == "line one")
      assert(seenAuth == "Bearer tok-123")
      assert(seenAccept == "text/plain")
      assert(seenUa.startsWith("graft-buildkite-logs-spark/test"))
    } finally server.stop(0)
  }

  test("non-200 raises with status code") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(404, -1); x.close()
      }
    })
    server.start()
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/v2"
      val client = new BuildkiteApiClient("tok", "test", base)
      val e = intercept[RuntimeException](client.getJobLog("o", "p", "1", "j"))
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("fromEnv without token raises the reference's error") {
    if (!sys.env.contains("BUILDKITE_API_TOKEN")) {
      val e = intercept[IllegalArgumentException](BuildkiteApi.fromEnv())
      assert(e.getMessage.contains("BUILDKITE_API_TOKEN"))
    }
  }
}
