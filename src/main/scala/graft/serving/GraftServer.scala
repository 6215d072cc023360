package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.pipeline.{ChatMessage, CodeAct, LlmClient, Sandbox}

/** S8 — HTTP serving layer (reference main_serving_http,
  * apps/poc-codaact-tableqa/tableqa_codeact.py:300-341: a FastAPI app
  * exposing GET /get_models and POST /tableqa/codeact over a registry
  * of chat models).
  *
  * The served unit is the same per-sample function the batch operator
  * maps over rows (CodeAct.runLoop), so batch and serving cannot
  * drift — exactly the reference's layout, where tableqa_codeact_inf
  * backs both the offline scenario and the endpoint. Single-round chat
  * is exposed too (the serving face of L8).
  *
  * Built on the JDK's HttpServer + Spark's bundled Jackson: no new
  * dependencies, embeddable from the driver, sized for interactive QA
  * traffic (the bulk path is the batch operators; a production
  * deployment would front this with any standard HTTP stack).
  */
final class GraftServer(clients: Map[String, LlmClient], sandbox: Sandbox,
                        maxRounds: Int = 5) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  /** Start on `port` (0 = ephemeral); returns the bound address. */
  def start(port: Int = 0): InetSocketAddress = {
    server = HttpServer.create(new InetSocketAddress(port), 0)

    server.createContext("/get_models", (ex: HttpExchange) => handle(ex) { _ =>
      val arr = mapper.createArrayNode()
      clients.keys.toSeq.sorted.foreach(arr.add)
      arr
    })

    server.createContext("/tableqa/codeact", (ex: HttpExchange) => handle(ex) { body =>
      val req = mapper.readTree(body)
      val client = clientFor(req)
      val rounds = if (req.hasNonNull("max_rounds")) req.get("max_rounds").asInt
                   else maxRounds
      val (out, n, ok) = CodeAct.runLoop(client, sandbox,
        req.path("instruction").asText(""), req.path("in_text").asText(""), rounds)
      val resp = mapper.createObjectNode()
      resp.put("output", out)
      resp.put("rounds", n)
      resp.put("finished", ok)
      resp
    })

    server.createContext("/chat", (ex: HttpExchange) => handle(ex) { body =>
      val req = mapper.readTree(body)
      val client = clientFor(req)
      val it = req.path("messages").elements()
      val msgs = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map(m =>
        ChatMessage(m.path("role").asText("user"), m.path("content").asText(""))).toSeq
      val resp = mapper.createObjectNode()
      resp.put("content", client.run(msgs))
      resp
    })

    server.start()
    server.getAddress
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def clientFor(req: JsonNode): LlmClient = {
    val name = req.path("llm").asText("")
    clients.getOrElse(name,
      throw new IllegalArgumentException(s"unknown model '$name'"))
  }

  private def handle(ex: HttpExchange)(f: String => JsonNode): Unit = {
    val (status, payload) =
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        (200, mapper.writeValueAsString(f(body)))
      } catch {
        // malformed request JSON is the CLIENT's fault: Jackson parse
        // errors map to 400 like unknown-model errors, not 500
        case e @ (_: IllegalArgumentException |
                  _: com.fasterxml.jackson.core.JsonProcessingException) =>
          (400, s"""{"error":${mapper.writeValueAsString(
            mapper.getNodeFactory.textNode(String.valueOf(e.getMessage)))}}""")
        case e: Exception =>
          (500, s"""{"error":${mapper.writeValueAsString(
            mapper.getNodeFactory.textNode(String.valueOf(e)))}}""")
      }
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
