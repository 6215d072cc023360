package graft

import graft.pipeline._

class JudgeCodeActSpec extends SparkSpec {

  test("judge label parsing: clean, fenced, think-tagged, garbage") {
    assert(Judge.parseLabel("""{"label": "supported"}""").contains("supported"))
    assert(Judge.parseLabel("```json\n{\"label\": \"unsupported\"}\n```")
      .contains("unsupported"))
    assert(Judge.parseLabel("<think>hmm</think>{\"label\": \"supported\"}")
      .contains("supported"))
    assert(Judge.parseLabel("no json here").isEmpty)
  }

  test("judge scoring: supported 1.0, other 0.0, unparseable 0.5") {
    assert(Judge.score(Some("supported")) == 1.0)
    assert(Judge.score(Some("unsupported")) == 0.0)
    assert(Judge.score(None) == 0.5)
  }

  test("template fill replaces all placeholders") {
    val t = Judge.fillTemplate("__A__ and __B__ and __A__",
      Map("__A__" -> "x", "__B__" -> "y"))
    assert(t == "x and y and x")
  }

  test("tagExtract: primary tags, fenced fallback, missing close") {
    assert(CodeAct.tagExtract("a <code>x=1</code> b").contains("x=1"))
    assert(CodeAct.tagExtract("```python\nprint(1)\n```").contains("print(1)"))
    assert(CodeAct.tagExtract("<answer>42</answer>").contains("42"))
    assert(CodeAct.tagExtract("<code>unclosed").isEmpty)
  }

  test("codeact loop repairs after Traceback and stops at maxRounds") {
    // scripted client/sandbox: first code fails, repaired code succeeds
    val client = new LlmClient {
      override def cacheId = s"scripted-${System.nanoTime()}"
      override def complete(msgs: Seq[ChatMessage], attempt: Int) = {
        val repaired = msgs.exists(_.content.startsWith(CodeAct.RepairPrefix))
        LlmResponse(if (repaired) "<code>good</code>" else "<code>bad</code>", "stop")
      }
    }
    val sandbox = new Sandbox {
      override def run(code: String) =
        if (code == "bad") "Traceback: boom" else "OK:done"
    }
    val (out, rounds, ok) = CodeAct.runLoop(client, sandbox, "q", "in", 5)
    assert(ok && out == "OK:done" && rounds == 2)

    val alwaysBad = new Sandbox {
      override def run(code: String) = "Traceback: always"
    }
    val (out2, rounds2, ok2) = CodeAct.runLoop(client, alwaysBad, "q", "in", 3)
    assert(!ok2 && rounds2 == 3 && out2.contains("Traceback"))
  }
}
