package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.LogParser

/** S4: Buildkite REST log source (reference buildkite_api.go).
  *
  * Driver-side fetch: one job log is one HTTP body; the distributed work
  * starts when the saved file enters [[LogParser.parse]]. (A DataSource V2
  * TableProvider for a single REST endpoint would be over-engineering —
  * SURVEY.md §2.1 S4.)
  */
class BuildkiteApiClient(
    apiToken: String,
    version: String = "dev",
    baseUrl: String = "https://api.buildkite.com/v2") {

  val userAgent: String =
    s"graft-buildkite-logs-spark/$version (JVM; ${sys.props("os.name")}; ${sys.props("os.arch")})"

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** Fetch a job log body (reference GetJobLog, buildkite_api.go:39-68). */
  def getJobLog(org: String, pipeline: String, build: String, job: String): String = {
    if (apiToken.isEmpty) throw new IllegalArgumentException("API token is required")
    val url = s"$baseUrl/organizations/$org/pipelines/$pipeline/builds/$build/jobs/$job/log"
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(30))
      .header("Authorization", s"Bearer $apiToken")
      .header("Accept", "text/plain")
      .header("User-Agent", userAgent)
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"API request failed with status ${resp.statusCode()}")
    resp.body()
  }

  /** Fetch → spool to a temp file → distributed parse. */
  def fetchAndParse(spark: SparkSession, org: String, pipeline: String,
      build: String, job: String): DataFrame = {
    val body = getJobLog(org, pipeline, build, job)
    val tmp = Files.createTempFile("bklog-", ".log")
    Files.writeString(tmp, body)
    LogParser.parse(spark, tmp.toString)
  }
}

object BuildkiteApi {

  /** Token from env, as the reference CLI does (cmd/bklog/main.go:221-232). */
  def fromEnv(version: String = "dev"): BuildkiteApiClient =
    sys.env.get("BUILDKITE_API_TOKEN") match {
      case Some(token) if token.nonEmpty => new BuildkiteApiClient(token, version)
      case _ => throw new IllegalArgumentException(
        "BUILDKITE_API_TOKEN environment variable is required for API access")
    }

  /** reference ValidateAPIParams (buildkite_api.go:71-92) — same message. */
  def validateParams(org: String, pipeline: String, build: String, job: String): Option[String] = {
    val missing = Seq(
      "organization" -> org, "pipeline" -> pipeline,
      "build" -> build, "job" -> job).collect { case (n, "") => n }
    if (missing.isEmpty) None
    else Some(s"missing required API parameters: ${missing.mkString(", ")}")
  }
}
