package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Config-driven pipeline construction (reference: pipelines are JSON
  * configs — "pipe" as inline stage list or file path,
  * apps/instructions-mapreduce/inf.py:40-43; instruction fields per
  * instructions.py:18-48). Parses the JSON shape:
  *
  * {
  *   "pipe": [
  *     { "name": "map", "instructions": [
  *         { "name": "summarize", "role": "...", "task": "...",
  *           "requirements": ["..."], "knowledge": "...",
  *           "scope": ["text"], "model": "mock" } ] },
  *     { "name": "reduce", "instructions": [ ... ] }
  *   ]
  * }
  *
  * Uses Spark's bundled Jackson — no extra dependency.
  */
object ConfigReader {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    val stages = arr(root.get("pipe")).map { st =>
      InstructionStage(
        text(st, "name"),
        arr(st.get("instructions")).map(instruction))
    }
    PipelineConfig(stages)
  }

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
