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
                        maxRounds: Int = 5,
                        annIndex: Seq[(Long, Array[Double])] = Nil) {

  // index-side validation happens once, at construction: a zero-norm
  // or ragged index vector would poison every /ann/topk cosine with
  // NaN, so fail the deployment, not the query
  require(annIndex.forall { case (_, v) => v.exists(_ != 0.0) },
    "annIndex contains a zero-norm vector")
  require(annIndex.map(_._2.length).distinct.sizeIs <= 1,
    "annIndex vectors have inconsistent dimensions")

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

    // the serving face of the ANN family: the BATCH operators build
    // and compress the corpus-scale index (ivfPqTopK etc.); what an
    // online endpoint holds is a broadcast-sized slice (a cell, a
    // centroid table, a candidate pool) scored exactly — same round-6
    // cosine and (cos desc, id) tie-break as every batch ANN query,
    // so online and offline rankings cannot disagree
    server.createContext("/ann/topk", (ex: HttpExchange) => handle(ex) { body =>
      val req = mapper.readTree(body)
      val it = req.path("vector").elements()
      val q = Iterator.continually(it).takeWhile(_.hasNext)
        .map(_.next().asDouble()).toArray
      if (q.isEmpty) throw new IllegalArgumentException("vector required")
      // validate instead of silently degrading: a dimension mismatch
      // would truncate the dot product and a zero-norm vector divides
      // to NaN — both would rank unpredictably, breaking the
      // batch-identical contract. IllegalArgumentException maps to 400.
      annIndex.headOption.foreach { case (_, v0) =>
        if (q.length != v0.length) throw new IllegalArgumentException(
          s"vector has dimension ${q.length}, index has ${v0.length}")
      }
      val k = if (req.hasNonNull("k")) req.get("k").asInt else 5
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { s += a(i) * b(i); i += 1 }; s
      }
      val qn = math.sqrt(dot(q, q))
      if (qn == 0.0) throw new IllegalArgumentException(
        "zero-norm query vector has no cosine ranking")
      val scored = annIndex.map { case (id, v) =>
        val c = dot(q, v) / (qn * math.sqrt(dot(v, v)))
        val rounded = BigDecimal(c)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, rounded)
      }.sortBy { case (id, c) => (-c, id) }.take(k)
      val arr = mapper.createArrayNode()
      scored.foreach { case (id, c) =>
        val o = mapper.createObjectNode()
        o.put("id", id); o.put("cos", c); arr.add(o)
      }
      arr
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
