package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{HttpLoader, Ingest}

/** HTTP loader specs (reference download_data.py:40-77, settings.py:17-28):
  * retry-until-success, retry exhaustion, timeout enforcement, env-driven
  * config, metadata resource resolution, and the full fetch -> distributed
  * JSONL parse handoff — all against an in-JVM HTTP server (no egress).
  */
class HttpLoaderSpec extends AnyFunSuite {

  private val jsonl =
    """{"id":"S1","name":"Mairie","geo":{"latitude":48.85,"longitude":2.35,"commune":"Paris"}}""" +
      "\n" + """{"id":"S2","name":"Pref"}"""

  private def withServer(handler: HttpExchange => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  test("fetch retries failed attempts and succeeds within the budget") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() < 3) respond(ex, 500, "boom")
      else respond(ex, 200, jsonl)
    } { base =>
      val out = HttpLoader.fetch(s"$base/data", HttpLoader.Config(retries = 3))
      assert(out == jsonl)
      assert(calls.get() == 3)
    }
  }

  test("fetch throws after exhausting retries, carrying the attempt count") {
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); respond(ex, 503, "down") } { base =>
      val e = intercept[HttpLoader.HttpFetchException] {
        HttpLoader.fetch(s"$base/data", HttpLoader.Config(retries = 2))
      }
      assert(e.getMessage.contains("2 attempts"))
      assert(calls.get() == 2)
    }
  }

  test("fetch enforces the configured timeout per attempt") {
    withServer { ex =>
      Thread.sleep(1500); respond(ex, 200, "late")
    } { base =>
      val t0 = System.nanoTime()
      intercept[HttpLoader.HttpFetchException] {
        HttpLoader.fetch(s"$base/slow", HttpLoader.Config(timeoutSec = 1, retries = 1))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 10, s"timed out too slowly: $sec s")
    }
  }

  test("configFromEnv binds DATAGOUV_* overrides case-insensitively") {
    val cfg = HttpLoader.configFromEnv(
      Map(
        "datagouv_api_url" -> "http://localhost:9/api",
        "DATAGOUV_DATASET_ID" -> "my-ds",
        "DATAGOUV_HTTP_TIMEOUT" -> "7",
        "DATAGOUV_HTTP_RETRIES" -> "5"
      ))
    assert(cfg.apiUrl == "http://localhost:9/api")
    assert(cfg.metadataUrl == "http://localhost:9/api/datasets/my-ds/")
    assert(cfg.timeoutSec == 7 && cfg.retries == 5)
    val defaults = HttpLoader.configFromEnv(Map.empty)
    assert(defaults.timeoutSec == 30 && defaults.retries == 3)
    assert(defaults.apiUrl == "https://www.data.gouv.fr/api/1")
  }

  test("firstResourceUrl picks resources[0].url; None when absent") {
    val meta = """{"title":"t","resources":[{"url":"http://x/data.jsonl"},{"url":"http://y"}]}"""
    assert(HttpLoader.firstResourceUrl(meta).contains("http://x/data.jsonl"))
    assert(HttpLoader.firstResourceUrl("""{"resources":[]}""").isEmpty)
    assert(HttpLoader.firstResourceUrl("""{}""").isEmpty)
  }

  test("downloadTo stages the body; Ingest.readJsonl parses it distributed") {
    withServer { ex => respond(ex, 200, jsonl) } { base =>
      val dir = Files.createTempDirectory("graft-http")
      val staged =
        HttpLoader.downloadTo(s"$base/feed.jsonl", dir.resolve("raw/services.jsonl"))
      val (df, corrupt) = Ingest.readJsonl(SparkSpec.session, staged.toString)
      assert(corrupt == 0)
      val rows = df.orderBy("service_id").collect()
      assert(rows.map(_.getAs[String]("service_id")).toSeq == Seq("S1", "S2"))
      assert(rows(0).getAs[Double]("latitude") == 48.85)
    }
  }
}
