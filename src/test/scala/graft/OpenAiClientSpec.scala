package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline._

/** Exercises the HTTP chat-completions client against an in-process
  * stub server (the environment has no egress): request shaping,
  * length-stop retry resampling, transport retry, ping, and per-model
  * cache isolation. No SparkSession needed — the client is plain JVM.
  */
class OpenAiClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private val requests = new CopyOnWriteArrayList[(String, String)]() // (auth, body)
  // per-test response script: list of (finishReason | "#status:<code>")
  @volatile private var script: List[String] = Nil

  private var server: HttpServer = _
  private var base: String = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      requests.add((auth, body))
      val step = script match {
        case head :: tail => script = tail; head
        case Nil => "stop"
      }
      if (step.startsWith("#status:")) {
        val code = step.stripPrefix("#status:").toInt
        val err = """{"error":"transient"}"""
        ex.sendResponseHeaders(code, err.length.toLong)
        ex.getResponseBody.write(err.getBytes(StandardCharsets.UTF_8))
      } else {
        val model = mapper.readTree(body).path("model").asText("")
        val resp =
          s"""{"choices":[{"message":{"role":"assistant","content":"ok:$model"},
             |"finish_reason":"$step"}]}""".stripMargin.replace("\n", "")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp.getBytes(StandardCharsets.UTF_8))
      }
      ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
  }

  override def afterAll(): Unit = server.stop(0)

  private def freshClient(model: String = "m-a", key: String = "") =
    OpenAiChatClient(baseUrl = base, model = model, apiKey = key,
      maxTokens = 64, transportRetries = 2)

  test("request shaping: model, messages, temperature, auth header") {
    requests.clear(); script = Nil; LlmCache.clear()
    val out = freshClient(key = "sk-test")
      .run(Seq(ChatMessage("system", "S."), ChatMessage("user", "hello q1")))
    assert(out == "ok:m-a")
    val (auth, body) = requests.get(requests.size() - 1)
    assert(auth == "Bearer sk-test")
    val req = mapper.readTree(body)
    assert(req.path("model").asText() == "m-a")
    assert(req.path("temperature").asDouble() == 0.0)
    assert(req.path("max_tokens").asInt() == 64)
    assert(req.path("messages").path(0).path("role").asText() == "system")
    assert(req.path("messages").path(1).path("content").asText() == "hello q1")
    assert(!req.has("frequency_penalty"))
  }

  test("length-stop retry resamples with temperature 1.0 + frequency_penalty 0.2") {
    requests.clear(); script = List("length", "stop"); LlmCache.clear()
    freshClient().run(Seq(ChatMessage("user", "hello q2")))
    assert(requests.size() == 2)
    val retry = mapper.readTree(requests.get(1)._2)
    assert(retry.path("temperature").asDouble() == 1.0)
    assert(retry.path("frequency_penalty").asDouble() == 0.2)
  }

  test("transient 5xx is retried; response still parses") {
    requests.clear(); script = List("#status:503", "stop"); LlmCache.clear()
    val out = freshClient().run(Seq(ChatMessage("user", "hello q3")))
    assert(out == "ok:m-a")
    assert(requests.size() == 2)
  }

  test("ping sends a real request") {
    requests.clear(); script = Nil; LlmCache.clear()
    assert(freshClient().ping())
    assert(requests.size() == 1)
  }

  test("a persistently failing endpoint surfaces a clear error after bounded retries") {
    requests.clear(); LlmCache.clear()
    script = List("#status:503", "#status:503", "#status:503", "#status:503")
    val e = intercept[RuntimeException] {
      freshClient().run(Seq(ChatMessage("user", "hello q4b")))
    }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(requests.size() == 3, "transportRetries=2 bounds the attempts")
  }

  test("same-class clients with different models never share cache entries") {
    requests.clear(); script = Nil; LlmCache.clear()
    val msgs = Seq(ChatMessage("user", "hello q5"))
    assert(freshClient("m-a").run(msgs) == "ok:m-a")
    assert(freshClient("m-b").run(msgs) == "ok:m-b")
    assert(requests.size() == 2, "second model must miss the cache")
    // and the cache still hits for a repeated (model, conversation)
    assert(freshClient("m-a").run(msgs) == "ok:m-a")
    assert(requests.size() == 2)
    // the mocks inherit the same model-aware default
    assert(MockLlmClient("x").cacheId != MockLlmClient("y").cacheId)
    // same endpoint+model but different sampling params don't collide
    assert(freshClient("m-a").copy(temperature = 0.9).cacheId
      != freshClient("m-a").cacheId)
  }
}
