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
}
