package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Config-driven pipeline construction (reference: pipelines are JSON
  * configs — "pipe" as inline stage list or file path,
  * apps/instructions-mapreduce/inf.py:40-43; instruction fields per
  * instructions.py:18-48; one client per "models" entry,
  * utils.py:12-17). Parses the JSON shape:
  *
  * {
  *   "pipe": [            // or "pipe": "/path/to/stages.json"
  *     { "name": "map", "instructions": [
  *         { "name": "summarize", "role": "...", "task": "...",
  *           "requirements": ["..."], "knowledge": "...",
  *           "scope": ["text"], "model": "m1" } ] },
  *     { "name": "reduce", "instructions": [ ... ] }
  *   ],
  *   "models": {          // optional model registry
  *     "m1": { "type": "openai", "base_url": "http://...:8000/v1",
  *             "api_key": "...", "temperature": 0.0, "max_tokens": 2048 },
  *     "m2": { "type": "mock" }
  *   }
  * }
  *
  * Uses Spark's bundled Jackson — no extra dependency.
  */
object ConfigReader {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    PipelineConfig(stagesOf(root))
  }

  private def stagesOf(root: JsonNode): Seq[InstructionStage] = {
    val pipeNode = root.get("pipe")
    // "pipe" may be a path to a JSON file holding the stage list
    // (inf.py:40-43) — either a bare array or {"pipe": [...]}
    val resolved =
      if (pipeNode != null && pipeNode.isTextual) {
        val n = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(pipeNode.asText)), "UTF-8"))
        if (n.isArray) n else n.get("pipe")
      } else pipeNode
    arr(resolved).map { st =>
      InstructionStage(
        text(st, "name"),
        arr(st.get("instructions")).map(instruction))
    }
  }

  /** Model registry → one client per entry (reference utils.py:12-17:
    * `llm_clis = {m: LlmCli(**cfg) for m, cfg in config["models"]}`).
    * "openai" builds the HTTP client; anything else (or a missing
    * entry) is the deterministic mock, so configs written for
    * production run unchanged in the zero-egress test harness.
    */
  def clientsFromJson(json: String): Map[String, LlmClient] = {
    val models = mapper.readTree(json).get("models")
    if (models == null || !models.isObject) Map.empty
    else models.properties().asScala.map { e =>
      val (name, n) = (e.getKey, e.getValue)
      val client: LlmClient = text(n, "type") match {
        case "openai" => OpenAiChatClient(
          baseUrl = text(n, "base_url"),
          model = if (n.hasNonNull("model")) n.get("model").asText else name,
          apiKey = text(n, "api_key"),
          temperature = if (n.hasNonNull("temperature")) n.get("temperature").asDouble else 0.0,
          maxTokens = if (n.hasNonNull("max_tokens")) n.get("max_tokens").asInt else 2048)
        case _ => MockLlmClient(name)
      }
      name -> client
    }.toMap
  }

  /** Complete client map for a pipeline: every distinct
    * instruction.model resolved from the registry, defaulting missing
    * names to mocks — the map InstructionRunner.dispatchByTask needs.
    */
  def clientsFor(config: PipelineConfig,
                 registry: Map[String, LlmClient]): Map[String, LlmClient] =
    config.stages.flatMap(_.instructions).map(_.model).distinct
      .map(m => m -> registry.getOrElse(m, MockLlmClient(m))).toMap

  def fromFile(path: String): PipelineConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def instruction(n: JsonNode): Instruction =
    Instruction(
      name = text(n, "name"),
      role = text(n, "role"),
      task = text(n, "task"),
      requirements = strings(n, "requirements"),
      knowledge = text(n, "knowledge"),
      scope = strings(n, "scope"),
      model = if (n.hasNonNull("model")) n.get("model").asText else "mock")

  private def arr(n: JsonNode): Seq[JsonNode] =
    if (n == null || !n.isArray) Nil else n.elements().asScala.toSeq

  private def text(n: JsonNode, field: String): String =
    if (n.hasNonNull(field)) n.get(field).asText else ""

  private def strings(n: JsonNode, field: String): Seq[String] =
    arr(n.get(field)).map(_.asText)
}
