package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._
import graft.serving.GraftServer

/** S8 — the HTTP serving layer must expose the model registry and the
  * same CodeAct/chat functions the batch operators run, byte-identical
  * to calling them directly. Plain JVM, no SparkSession.
  */
class ServingSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String): (Int, String) = {
    val resp = http.send(
      HttpRequest.newBuilder().uri(URI.create(base + path))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("get_models, codeact, and chat endpoints serve the registry's clients") {
    val clients = Map[String, LlmClient](
      "coder" -> MockCodeActClient(), "chat" -> MockLlmClient("chat"))
    val srv = new GraftServer(clients, MockSandbox())
    val base = s"http://127.0.0.1:${srv.start().getPort}"
    try {
      val models = http.send(
        HttpRequest.newBuilder().uri(URI.create(s"$base/get_models")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      assert(mapper.readTree(models).toString == """["chat","coder"]""")

      val (code, body) = post(base, "/tableqa/codeact",
        """{"llm": "coder", "instruction": "sum the col", "in_text": "a,b\n1,2"}""")
      assert(code == 200)
      val got = mapper.readTree(body)
      // endpoint result must equal the batch per-row function exactly
      val (out, rounds, ok) = CodeAct.runLoop(MockCodeActClient(), MockSandbox(),
        "sum the col", "a,b\n1,2", 5)
      assert(got.path("output").asText() == out)
      assert(got.path("rounds").asInt() == rounds)
      assert(got.path("finished").asBoolean() == ok)

      val (c2, chatBody) = post(base, "/chat",
        """{"llm": "chat", "messages": [{"role": "user", "content": "hi there"}]}""")
      assert(c2 == 200)
      assert(mapper.readTree(chatBody).path("content").asText()
        == MockLlmClient("chat").run(Seq(ChatMessage("user", "hi there"))))

      val (c3, err) = post(base, "/tableqa/codeact", """{"llm": "nope"}""")
      assert(c3 == 400 && err.contains("unknown model"))

      // malformed request JSON is a client error, not a server fault
      val (c4, _) = post(base, "/chat", """{bad""")
      assert(c4 == 400)
    } finally srv.stop()
  }

  test("ann/topk serves the in-memory slice with batch-identical ranking") {
    val index = Seq(
      1L -> Array(1.0, 0.0), // cos 1.0 with the query
      2L -> Array(1.0, 1.0), // cos ~0.707107
      3L -> Array(0.0, 1.0), // cos 0.0
      4L -> Array(2.0, 0.0)) // cos 1.0 — ties with id 1, id breaks it
    val srv = new GraftServer(Map.empty, MockSandbox(), annIndex = index)
    val base = s"http://127.0.0.1:${srv.start().getPort}"
    try {
      val (code, body) = post(base, "/ann/topk",
        """{"vector": [1.0, 0.0], "k": 3}""")
      assert(code == 200)
      val hits = mapper.readTree(body)
      assert(hits.size() == 3)
      assert(hits.get(0).path("id").asLong() == 1L) // tie → lowest id first
      assert(hits.get(1).path("id").asLong() == 4L)
      assert(hits.get(0).path("cos").asDouble() == 1.0)
      assert(hits.get(2).path("id").asLong() == 2L)
      assert(hits.get(2).path("cos").asDouble() == 0.707107)

      val (c2, err) = post(base, "/ann/topk", """{"k": 3}""")
      assert(c2 == 400 && err.contains("vector required"))

      // dimension mismatch and zero-norm queries are client errors —
      // never a silently-truncated dot product or a NaN ranking
      val (c3, e3) = post(base, "/ann/topk", """{"vector": [1.0, 0.0, 5.0]}""")
      assert(c3 == 400 && e3.contains("dimension"))
      val (c4, e4) = post(base, "/ann/topk", """{"vector": [0.0, 0.0]}""")
      assert(c4 == 400 && e4.contains("zero-norm"))
    } finally srv.stop()
  }

  test("ann index with zero-norm or ragged vectors is rejected at construction") {
    intercept[IllegalArgumentException](new GraftServer(Map.empty, MockSandbox(),
      annIndex = Seq(1L -> Array(0.0, 0.0))))
    intercept[IllegalArgumentException](new GraftServer(Map.empty, MockSandbox(),
      annIndex = Seq(1L -> Array(1.0, 0.0), 2L -> Array(1.0))))
  }
}
