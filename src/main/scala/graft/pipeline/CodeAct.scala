package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** CodeAct table-QA loop (reference agent_codeact + sandbox_run,
  * apps/poc-codaact-tableqa/tableqa_codeact.py:143-235): the LLM emits
  * code inside tags, the code runs in a sandbox, a "Traceback" in the
  * output is fed back for repair, up to `maxRounds` (reference: 5).
  *
  * Sandbox policy at scale: executors must NOT fork arbitrary
  * generated code — a Sandbox implementation is either the
  * deterministic mock (tests/offline) or a driver-side/bounded
  * external service. The operator itself is executor-safe: it only
  * calls the pluggable trait.
  */
trait Sandbox extends Serializable {
  def run(code: String): String
}

/** Deterministic sandbox stand-in: fails with a Traceback when the
  * first hex digit of sha256(code) < '4', else returns OK:<hash8>.
  * SQL mirror in CodeAct.sandboxSql.
  */
final case class MockSandbox() extends Sandbox {
  override def run(code: String): String = {
    val h = LlmClient.sha256Hex(code)
    if (h.charAt(0) < '4') s"Traceback: err ${h.substring(1, 9)}"
    else s"OK:${h.substring(1, 9)}"
  }
}

/** Deterministic code-emitting client: always answers with a single
  * `<code>run(<hash16>)</code>` block derived from the conversation's
  * system prompt and last user message. SQL mirror in
  * CodeAct.contentSql.
  */
final case class MockCodeActClient() extends LlmClient {
  override def complete(msgs: Seq[ChatMessage], attempt: Int): LlmResponse = {
    val sys = msgs.find(_.role == "system").map(_.content).getOrElse("")
    val user = msgs.reverse.find(_.role == "user").map(_.content).getOrElse("")
    val h = LlmClient.sha256Hex(sys + "\n" + user)
    LlmResponse(s"<code>run(${h.take(16)})</code>", "stop")
  }
}

object CodeAct {

  /** F3 — first span between any of the tag pairs, tried in order
    * (reference tag_extract, tableqa_codeact.py:117-134).
    */
  val TagPairs: Seq[(String, String)] = Seq(
    "<code>" -> "</code>",
    "```python" -> "```",
    "<answer>" -> "</answer>")

  def tagExtract(text: String): Option[String] =
    TagPairs.iterator.flatMap { case (open, close) =>
      val i = text.indexOf(open)
      if (i < 0) None
      else {
        val j = text.indexOf(close, i + open.length)
        if (j < 0) None else Some(text.substring(i + open.length, j).trim)
      }
    }.nextOption()

  /** P7 — sandbox failure predicate (tableqa_codeact.py:137-140). */
  def isExecError(out: String): Boolean = out.contains("Traceback")

  val SysPrompt = "Write code in <code></code> tags to answer the question."
  val RepairPrefix = "Fix this error:\n"

  /** Run the bounded repair loop for one (instruction, input) pair.
    * Returns (finalOutput, rounds, finished).
    */
  def runLoop(client: LlmClient, sandbox: Sandbox, instruction: String,
              input: String, maxRounds: Int): (String, Int, Boolean) = {
    var msgs = Seq(
      ChatMessage("system", SysPrompt),
      ChatMessage("user", s"$instruction\n$input"))
    var round = 0
    var out = ""
    var ok = false
    while (round < maxRounds && !ok) {
      round += 1
      val content = client.run(msgs)
      val code = tagExtract(content).getOrElse("")
      out = sandbox.run(code)
      if (isExecError(out) && round < maxRounds)
        msgs = msgs :+ ChatMessage("assistant", content) :+
          ChatMessage("user", RepairPrefix + out)
      else ok = !isExecError(out)
    }
    (out, round, ok)
  }

  /** DataFrame operator: run the CodeAct loop per row. Adds
    * `<outCol>` (sandbox output), `<outCol>_rounds`, `<outCol>_ok`.
    */
  def codeAct(df: DataFrame, instructionCol: String, inputCol: String,
              client: LlmClient, sandbox: Sandbox, maxRounds: Int,
              outCol: String): DataFrame = {
    val schema = df.schema
    val insIdx = schema.fieldIndex(instructionCol)
    val inIdx = schema.fieldIndex(inputCol)
    val outSchema = schema
      .add(outCol, StringType).add(s"${outCol}_rounds", IntegerType)
      .add(s"${outCol}_ok", org.apache.spark.sql.types.BooleanType)
    df.mapPartitions { it: Iterator[Row] =>
      it.map { row =>
        val (out, rounds, ok) = runLoop(client, sandbox,
          row.getString(insIdx), row.getString(inIdx), maxRounds)
        Row.fromSeq(row.toSeq :+ out :+ rounds :+ ok)
      }
    }(Encoders.row(outSchema))
  }

  // ---- DuckDB mirrors (used by the oracle harness) ----

  /** Mock client content for (sysSql literal handled by caller). */
  def contentSql(userSql: String): String =
    s"('<code>run(' || substring(sha256('$SysPrompt' || chr(10) || $userSql), 1, 16) || ')</code>')"

  /** Extracted code for the mock's content shape. */
  def codeSql(userSql: String): String =
    s"('run(' || substring(sha256('$SysPrompt' || chr(10) || $userSql), 1, 16) || ')')"

  def sandboxSql(codeSql: String): String =
    s"""(CASE WHEN substring(sha256($codeSql), 1, 1) < '4'
       | THEN 'Traceback: err ' || substring(sha256($codeSql), 2, 8)
       | ELSE 'OK:' || substring(sha256($codeSql), 2, 8) END)""".stripMargin
}
