package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.Duration

/** Driver-side HTTP fetch with bounded retries — the engine twin of the
  * reference's dataset downloader (reference:
  * src/dbt_gdpr_anonymizer/scripts/download_data.py:40-77 and
  * config/settings.py:17-28).
  *
  * Semantics preserved from the reference:
  *   - configurable base API URL / dataset id / timeout (default 30 s) /
  *     retry count (default 3), overridable through `DATAGOUV_*` environment
  *     variables exactly as pydantic-settings reads them;
  *   - `fetch` retries on any HTTP error or non-2xx status, rethrowing after
  *     the last attempt (download_data.py:48-63);
  *   - the downloaded body is JSONL, handed to [[Ingest.readJsonl]] for the
  *     distributed parse (PERMISSIVE bad-record tolerance).
  *
  * This is deliberately a DRIVER-side single-request path: the dataset feed
  * is one file. Distributing the HTTP fetch would gain nothing and lose the
  * retry/backoff bookkeeping; scale enters at the parse step, which is
  * Spark-side.
  */
object HttpLoader {

  final case class Config(
      apiUrl: String = "https://www.data.gouv.fr/api/1",
      datasetId: String = "annuaire-des-services-publics-nationaux",
      timeoutSec: Int = 30,
      retries: Int = 3
  ) {
    def metadataUrl: String = s"$apiUrl/datasets/$datasetId/"
  }

  /** Environment overrides, same names pydantic-settings binds
    * (settings.py:9-28: prefix DATAGOUV_, case-insensitive).
    */
  def configFromEnv(env: Map[String, String] = sys.env): Config = {
    val e = env.map { case (k, v) => k.toUpperCase -> v }
    Config(
      apiUrl = e.getOrElse("DATAGOUV_API_URL", Config().apiUrl),
      datasetId = e.getOrElse("DATAGOUV_DATASET_ID", Config().datasetId),
      timeoutSec = e.get("DATAGOUV_HTTP_TIMEOUT").map(_.toInt).getOrElse(Config().timeoutSec),
      retries = e.get("DATAGOUV_HTTP_RETRIES").map(_.toInt).getOrElse(Config().retries)
    )
  }

  final class HttpFetchException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Shared GET-with-retries core: sends to `handler`, returns the first
    * 2xx body, throws [[HttpFetchException]] carrying the last failure once
    * `cfg.retries` attempts are exhausted.
    */
  private def fetchWith[T](
      url: String,
      cfg: Config,
      handler: HttpResponse.BodyHandler[T]
  ): T = {
    val client = HttpClient
      .newBuilder()
      .connectTimeout(Duration.ofSeconds(cfg.timeoutSec.toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val request = HttpRequest
      .newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(cfg.timeoutSec.toLong))
      .GET()
      .build()
    var last: Throwable = null
    var attempt = 0
    while (attempt < cfg.retries) {
      attempt += 1
      try {
        val resp = client.send(request, handler)
        if (resp.statusCode() / 100 == 2) return resp.body()
        last = new HttpFetchException(s"HTTP ${resp.statusCode()} from $url")
      } catch {
        case e: InterruptedException => throw e
        case e: Exception            => last = e
      }
      System.err.println(s"[http] attempt $attempt/${cfg.retries} failed for $url: ${last.getMessage}")
      // linear backoff between attempts (not after the last): back-to-back
      // retries would spend the whole budget before a transient recovers
      if (attempt < cfg.retries) Thread.sleep(200L * attempt)
    }
    throw new HttpFetchException(s"failed after ${cfg.retries} attempts: $url", last)
  }

  /** GET `url` as an in-memory string — for SMALL payloads (the metadata
    * document). Dataset bodies go through [[downloadTo]], which streams.
    */
  def fetch(url: String, cfg: Config = Config()): String =
    fetchWith(url, cfg, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  /** Dataset metadata (download_data.py:40-63); returns the raw JSON body. */
  def fetchDatasetInfo(cfg: Config = Config()): String = fetch(cfg.metadataUrl, cfg)

  /** First resource URL out of the metadata document — the reference picks
    * `resources[0].url` as the data file to download (download_data.py:171-178).
    * Jackson is already on Spark's classpath; no new dependency.
    */
  def firstResourceUrl(metadataJson: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(metadataJson)
    val res = root.path("resources")
    if (res.isArray && res.size() > 0 && res.get(0).hasNonNull("url"))
      Some(res.get(0).get("url").asText())
    else None
  }

  /** Download the JSONL body to a local staging file for the Spark read —
    * STREAMED to disk (`BodyHandlers.ofFile`), never buffered as a JVM
    * string: the reference downloader streams (download_data.py:66-70), and
    * a multi-GB feed must not hold 3-4x its size in driver heap.
    * TRUNCATE_EXISTING so a retried (shorter) body never leaves stale tail
    * bytes from a previous attempt.
    */
  def downloadTo(url: String, dest: Path, cfg: Config = Config()): Path = {
    Files.createDirectories(dest.getParent)
    import java.nio.file.StandardOpenOption._
    fetchWith(url, cfg,
      HttpResponse.BodyHandlers.ofFile(dest, CREATE, WRITE, TRUNCATE_EXISTING))
  }
}
