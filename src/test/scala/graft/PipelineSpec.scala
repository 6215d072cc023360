package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val ins = Instruction(
    name = "summ", role = "R.", task = "T.", scope = Seq("text"))
  private val stage = InstructionStage("map", Seq(ins))
  private val client = MockLlmClient()

  private def docs = Seq((1L, "hello world"), (2L, "NA")).toDF("doc_id", "text")

  test("runStage produces the mock's deterministic output and skips invalid scopes") {
    val st0 = InstructionRunner.stringifyKv(docs, Seq("doc_id", "text"), "s0")
    val out = InstructionRunner.runStage(st0, stage, client, "s0", "r")
      .select(col("doc_id"), element_at(col("r"), "summ").as("v"))
      .as[(Long, String)].collect().toMap

    val sys = Prompts.sysPrompt(ins)
    val user = "# text\nhello world\n"
    val expected =
      s"RE:${LlmClient.sha256Hex(sys + "\n" + user).take(16)}:${user.take(40)}"
    assert(out(1L) == expected)
    assert(out(2L) == null, "all-invalid scope must skip the instruction")
  }

  test("prompt rendering: section order, skipped empties, invalid filtering") {
    assert(Prompts.sysPrompt(ins) == "## Your Role\nR.\n\n## Task\nT.")
    val full = Instruction("n", role = "r", task = "t",
      requirements = Seq("a", "b"), knowledge = "k")
    assert(Prompts.sysPrompt(full).contains("## Requirements\na\nb"))
    val got = Prompts.userPrompt(Instruction("n", scope = Seq("x", "y")),
      Map("x" -> "1", "y" -> "N/A"))
    assert(got.contains("# x\n1\n"))
    // invalid = EXACT membership in the reference's INVALID_VALS
    // (constants.py:9-20): one and three spaces are invalid, TWO
    // spaces and "\t" are valid — the reference does `v in SET`, not
    // a trim, and r12's fuzz run showed trim variants diverge
    // between engines (FUZZ.md #4)
    assert(Prompts.userPrompt(Instruction("n", scope = Seq("y")),
      Map("y" -> " ")).isEmpty)
    assert(Prompts.userPrompt(Instruction("n", scope = Seq("y")),
      Map("y" -> "   ")).isEmpty)
    assert(Prompts.userPrompt(Instruction("n", scope = Seq("y")),
      Map("y" -> "\n")).isEmpty)
    assert(Prompts.userPrompt(Instruction("n", scope = Seq("y")),
      Map("y" -> "  ")).contains("# y\n  \n"))
    assert(Prompts.userPrompt(Instruction("n", scope = Seq("y")),
      Map("y" -> "\t")).contains("# y\n\t\n"))
  }

  test("LRU cache: repeated conversations hit the cache; clients do not collide") {
    LlmCache.clear()
    val msgs = Seq(ChatMessage("user", "same question"))
    val a = MockJudgeClient("a").run(msgs)
    val b = MockJudgeClient("b").run(msgs)
    val a2 = MockJudgeClient("a").run(msgs)
    assert(a == a2)
    assert(LlmCache.size == 2, "two clients, same prompt → two entries")
  }

  test("length-stop retry: retries up to 3 then returns the last response") {
    var calls = 0
    val flaky = new LlmClient {
      override def cacheId = s"flaky-${System.nanoTime()}"
      override def complete(msgs: Seq[ChatMessage], attempt: Int) = {
        calls += 1
        LlmResponse(s"c$attempt", if (attempt < 2) "length" else "stop")
      }
    }
    assert(flaky.run(Seq(ChatMessage("user", "q"))) == "c2")
    assert(calls == 3)
    assert(flaky.ping())
  }

  test("runPipeline chains stages: reduce consumes the map result map") {
    val reduce = InstructionStage("reduce",
      Seq(Instruction("final", role = "E.", task = "M.", scope = Seq("summ"))))
    val out = InstructionRunner.runPipeline(
        docs.where(col("doc_id") === 1), PipelineConfig(Seq(stage, reduce)),
        client, Seq("doc_id", "text"))
      .select("result_md").as[String].head()
    assert(out.startsWith("# final\nRE:"))
  }

  test("config reader parses the reference pipe shape") {
    val cfg = ConfigReader.fromJson(
      """{"pipe": [
        |  {"name": "map", "instructions": [
        |    {"name": "a", "role": "R", "task": "T",
        |     "requirements": ["x"], "scope": ["text"], "model": "m1"}]},
        |  {"name": "reduce", "instructions": [
        |    {"name": "b", "task": "T2", "scope": ["a"]}]}
        |]}""".stripMargin)
    assert(cfg.stages.map(_.name) == Seq("map", "reduce"))
    val a = cfg.stages.head.instructions.head
    assert(a == Instruction("a", role = "R", task = "T",
      requirements = Seq("x"), scope = Seq("text"), model = "m1"))
    assert(cfg.stages(1).instructions.head.model == "mock")
  }

  test("eligibility rubric scoring") {
    assert(Judge.eligibilityScore(Some("eligible")) == 1.0)
    assert(Judge.eligibilityScore(Some("partially_eligible")) == 0.25)
    assert(Judge.eligibilityScore(Some("ineligible")) == 0.0)
    assert(Judge.eligibilityScore(None) == 0.5)
  }

  test("saltedAgg matches plain aggregation") {
    val d = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", 1L))
      .toDF("k", "v")
    val salted = graft.ops.Relational.saltedAgg(
        d, Seq("k"), col("v"), sum, sum, salts = 8)
      .as[(String, Long)].collect().toMap
    val plain = d.groupBy("k").agg(sum(col("v")))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("markdownExpr skips missing entries") {
    val d = Seq(Map("a" -> "1")).toDF("m")
    val md = d.select(InstructionRunner.markdownExpr(Seq("a", "b"), col("m")))
      .as[String].head()
    assert(md == "# a\n1\n")
  }
}
