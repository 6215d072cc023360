package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Config parity with the reference app entry point: "pipe" given as a
  * file path (inf.py:40-43), a model registry building one client per
  * entry (utils.py:12-17), and per-instruction dispatch through that
  * registry — verified end-to-end against an in-process HTTP stub so
  * routing to a real (openai-type) client is observable.
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  test("pipe-as-file-path parses to the same pipeline as inline") {
    val stagesJson =
      """{"pipe": [{"name": "map", "instructions": [
        |  {"name": "summ", "role": "R.", "task": "T.", "scope": ["text"], "model": "m1"}]}]}""".stripMargin
    val f = Files.createTempFile("pipe", ".json")
    Files.write(f, stagesJson.getBytes(StandardCharsets.UTF_8))

    val inline = ConfigReader.fromJson(stagesJson)
    val viaPath = ConfigReader.fromJson(s"""{"pipe": "${f.toString}"}""")
    assert(viaPath == inline)

    // bare-array file body is accepted too
    val bare = Files.createTempFile("pipe2", ".json")
    Files.write(bare,
      """[{"name": "map", "instructions": [
        |  {"name": "summ", "role": "R.", "task": "T.", "scope": ["text"], "model": "m1"}]}]""".stripMargin
        .getBytes(StandardCharsets.UTF_8))
    assert(ConfigReader.fromJson(s"""{"pipe": "${bare.toString}"}""") == inline)
  }

  test("model registry + dispatchByTask route each instruction to its model's client") {
    // stub chat-completions endpoint: replies ok:<model> so routing to
    // the openai-type client is observable in the result map
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val model = body.split("\"model\"\\s*:\\s*\"")(1).takeWhile(_ != '"')
      val resp =
        s"""{"choices":[{"message":{"content":"ok:$model"},"finish_reason":"stop"}]}"""
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp.getBytes(StandardCharsets.UTF_8))
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      val configJson =
        s"""{"pipe": [{"name": "map", "instructions": [
           |  {"name": "a", "role": "R.", "task": "T.", "scope": ["text"], "model": "remote"},
           |  {"name": "b", "role": "R.", "task": "T.", "scope": ["text"], "model": "local-mock"}]}],
           | "models": {"remote": {"type": "openai", "base_url": "$base", "max_tokens": 32}}}""".stripMargin
      val config = ConfigReader.fromJson(configJson)
      val registry = ConfigReader.clientsFromJson(configJson)
      assert(registry.keySet == Set("remote"))
      val clients = ConfigReader.clientsFor(config, registry)
      assert(clients("remote").isInstanceOf[OpenAiChatClient])
      assert(clients("local-mock") == MockLlmClient("local-mock"))

      LlmCache.clear()
      val df = InstructionRunner.stringifyKv(
        Seq((1L, "hello dispatch")).toDF("id", "text"), Seq("id", "text"), "s0")
      val out = InstructionRunner.dispatchByTask(
          df, config.stages.head, clients, "s0", "r")
        .select(element_at(col("r"), "a"), element_at(col("r"), "b"))
        .as[(String, String)].head()

      assert(out._1 == "ok:remote", "instruction a must hit the HTTP client")
      assert(out._2.startsWith("RE:"), "instruction b must hit the mock")
    } finally server.stop(0)
  }

  test("stringifyKv renders nested struct/array columns as JSON") {
    val df = Seq((1L, ("paracetamol", 500), Seq("a", "b")))
      .toDF("id", "med", "tags")
    val m = InstructionRunner.stringifyKv(df, Seq("id", "med", "tags"), "s0")
      .select(col("s0")).as[Map[String, String]].head()
    assert(m("id") == "1")
    assert(m("med") == """{"_1":"paracetamol","_2":500}""")
    assert(m("tags") == """["a","b"]""")
  }
}
