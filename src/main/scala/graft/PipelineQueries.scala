package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.pipeline._

/** Instruction-MapReduce pipeline queries — the reference's core flow
  * (§3.1) run end-to-end through the real engine (mapPartitions
  * runner, batching, Future fan-out, LRU cache, retry policy) with the
  * deterministic MockLlmClient. Because the mock is a pure function of
  * the conversation, every pipeline output has an exact ANSI-SQL
  * oracle: the SQL re-renders the same prompts and re-computes the
  * mock's sha256-derived response.
  */
object PipelineQueries {

  // ---- pipeline config (a representative 2-stage map→reduce summ
  // pipeline in the shape of demo_configs/mapreduce_summ/ehr.json) ----

  private val summarize = Instruction(
    name = "summarize",
    role = "You are a summarizer.",
    task = "Summarize the document.",
    scope = Seq("text"))

  private val classify = Instruction(
    name = "classify",
    role = "You are a classifier.",
    task = "Classify the document language and source.",
    scope = Seq("lang", "source"))

  private val rewrite = Instruction(
    name = "final",
    role = "You are an editor.",
    task = "Merge the sections into a final report.",
    scope = Seq("summarize", "classify"))

  private val mapStage = InstructionStage("map", Seq(summarize, classify))
  private val reduceStage = InstructionStage("reduce", Seq(rewrite))
  private val client = MockLlmClient()

  // ---- oracle SQL builders: re-render the same prompts in DuckDB ----

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  /** `# key\nvalue\n` section with the reference's invalid-value
    * semantics; NULL when invalid (section skipped).
    */
  private def sectionSql(key: String, valueSql: String): String =
    s"(CASE WHEN $valueSql IS NULL OR $valueSql IN " +
      s"('', ' ', '   ', chr(10), 'NA', 'N/A') THEN NULL" +
      s" ELSE ('# $key' || chr(10) || $valueSql || chr(10)) END)"

  /** User prompt = concatenated valid sections; NULL when all invalid
    * (instruction skipped).
    */
  private def userSql(sections: Seq[String]): String = {
    val allNull = sections.map(s => s"$s IS NULL").mkString(" AND ")
    val joined = sections.map(s => s"coalesce($s, '')").mkString(" || ")
    s"(CASE WHEN $allNull THEN NULL ELSE $joined END)"
  }

  /** User-prompt SQL for one instruction (NULL = skipped). */
  private def userPromptSql(ins: Instruction, values: Map[String, String]): String =
    userSql(ins.scope.map(k => sectionSql(k, values(k))))

  /** Mock response for one instruction given per-key value SQL. */
  private def responseSql(ins: Instruction, values: Map[String, String]): String =
    MockLlmClient.contentSql(sqlLit(Prompts.sysPrompt(ins)),
      userPromptSql(ins, values))

  /** Mock response for composition oracles in other registries (e.g.
    * pipe_cluster_summaries): same prompt render + mock arithmetic
    * over caller-supplied per-key value SQL.
    */
  private[graft] def mockResponseSql(ins: Instruction,
                                     values: Map[String, String]): String =
    responseSql(ins, values)

  private val summarizeSql = responseSql(summarize, Map("text" -> "text"))
  private val classifySql =
    responseSql(classify, Map("lang" -> "lang", "source" -> "source"))
  private val finalSql = responseSql(rewrite,
    Map("summarize" -> summarizeSql, "classify" -> classifySql))

  def defs: Seq[QueryDef] = Seq(

    // L1 — one map stage: per-row scope projection → prompt render →
    // concurrent instruction fan-out → result map.
    QueryDef("pipe_map_stage",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val st0 = InstructionRunner.stringifyKv(
          d, Seq("doc_id", "text", "lang", "source"), "stage0_result")
        InstructionRunner.runStage(st0, mapStage, client, "stage0_result", "map_result")
          .select(col("doc_id"),
            element_at(col("map_result"), "summarize").as("summarize"),
            element_at(col("map_result"), "classify").as("classify"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        | $summarizeSql AS summarize,
        | $classifySql AS classify
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // L2/L3 — full map→reduce pipeline with markdown render (S6): the
    // reduce stage consumes the map stage's result map.
    QueryDef("pipe_mapreduce",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        InstructionRunner.runPipeline(d,
            PipelineConfig(Seq(mapStage, reduceStage)), client,
            Seq("doc_id", "text", "lang", "source"))
          .select(col("doc_id"), col("result_md"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        | ('# final' || chr(10) || $finalSql || chr(10)) AS result_md
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // S7 — ChatML audit trace: one row per (doc × instruction) with
    // deterministic session ids.
    QueryDef("pipe_trace_audit",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val st0 = InstructionRunner.stringifyKv(
          d, Seq("doc_id", "text", "lang", "source"), "stage0_result")
        InstructionRunner.traceStage(st0, mapStage, client, "stage0_result", "doc_id")
          .select(col("session_id"), col("stage"), col("name"),
            col("result"), col("finished"), size(col("msgs")).as("n_msgs"))
          .orderBy(col("session_id"), col("name"))
      },
      // finished/n_msgs mirror the invalid-skip: an instruction whose
      // every scoped field is invalid never calls the client — its
      // trace row carries finished=false and an empty msgs list
      // (fuzz class: the reference INVALID_VALS docs)
      Some(s"""WITH t AS (
        |  SELECT substring(sha256(doc_id::VARCHAR), 1, 32) AS session_id,
        |    'map' AS stage, 'summarize' AS name, $summarizeSql AS result,
        |    (${userPromptSql(summarize, Map("text" -> "text"))} IS NOT NULL)
        |      AS finished,
        |    CASE WHEN ${userPromptSql(summarize, Map("text" -> "text"))}
        |      IS NULL THEN 0 ELSE 3 END AS n_msgs
        |  FROM documents
        |  UNION ALL
        |  SELECT substring(sha256(doc_id::VARCHAR), 1, 32) AS session_id,
        |    'map' AS stage, 'classify' AS name, $classifySql AS result,
        |    (${userPromptSql(classify, Map("lang" -> "lang", "source" -> "source"))}
        |      IS NOT NULL) AS finished,
        |    CASE WHEN ${userPromptSql(classify, Map("lang" -> "lang", "source" -> "source"))}
        |      IS NULL THEN 0 ELSE 3 END AS n_msgs
        |  FROM documents)
        |SELECT * FROM t ORDER BY session_id, name""".stripMargin)),

    // F6/F7/F8 — ChatML build → role normalization (no-system-role
    // models) → tagged-text render, all as pure expressions.
    QueryDef("pipe_chatml_text",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val msgs = chatml(
          "system" -> lit("You are a helpful assistant."),
          "user" -> col("text"))
        d.select(col("doc_id"),
            chatmlToText(normalizeRoles(msgs)).as("chat_text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        | ('<user>You are a helpful assistant.</user>'
        |  || '<assistant>Ok.</assistant>'
        |  || '<user>' || text || '</user>') AS chat_text
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
