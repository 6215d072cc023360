package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** End-to-end run of the canonical map→reduce summarization pipeline
  * over an EHR-shaped fixture (the shape of demo_configs/
  * mapreduce_summ/ehr.json over demo_data/ehr/faked_0.jsonl — nested
  * patient/visits records, per-section map instructions scoped to
  * individual fields, one rewriting reducer over the map outputs; see
  * /root/repo/FIXTURES.md).
  */
class EhrPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val ehrRows = Seq(
    (1L, """{"age": 61, "gender": "F"}""",
      "2024-05-01: chest pain, ECG normal; 2024-05-03: follow-up, stable",
      "lisinopril 10mg daily; aspirin 81mg daily"),
    (2L, """{"age": 45, "gender": "M"}""",
      "2024-02-11: ankle sprain, x-ray negative",
      "NA"), // invalid meds → meds instruction must be skipped
    (3L, """{"age": 70, "gender": "F"}""",
      "2023-12-20: pneumonia admission; 2024-01-05: resolved",
      "azithromycin course completed"))
    .toDF("patient_id", "patient", "encounters", "medications")

  private val mapStage = InstructionStage("map", Seq(
    Instruction("demographics", role = "You are a clinical summarizer.",
      task = "Summarize patient demographics.", scope = Seq("patient")),
    Instruction("course", role = "You are a clinical summarizer.",
      task = "Summarize the clinical course.", scope = Seq("encounters")),
    Instruction("meds", role = "You are a clinical summarizer.",
      task = "Summarize active medications.", scope = Seq("medications"))))

  private val reduceStage = InstructionStage("reduce", Seq(
    Instruction("summary", role = "You are an editor.",
      task = "Write the final clinical summary.",
      scope = Seq("demographics", "course", "meds"))))

  test("EHR map-reduce pipeline: per-section map, rewriting reduce, audit traces") {
    val out = InstructionRunner.runPipeline(ehrRows,
      PipelineConfig(Seq(mapStage, reduceStage)), MockLlmClient(),
      Seq("patient_id", "patient", "encounters", "medications"))

    val rows = out.select("patient_id", "map_result", "reduce_result", "result_md")
      .orderBy("patient_id").collect()
    assert(rows.length == 3)

    // patient 2's meds are invalid → map skips that instruction
    val map2 = rows(1).getMap[String, String](1)
    assert(map2.contains("demographics") && map2.contains("course"))
    assert(!map2.contains("meds"))

    // reduce consumed the map outputs and produced the final markdown
    val md1 = rows(0).getString(3)
    assert(md1.startsWith("# summary\nRE:"))

    // every map output is the mock's deterministic function of its
    // scoped section only — recompute one independently
    val ins = mapStage.instructions.head
    val expectedUser = "# patient\n" + ehrRows.collect()(0).getString(1) + "\n"
    val expected = "RE:" + LlmClient.sha256Hex(
      Prompts.sysPrompt(ins) + "\n" + expectedUser).take(16) +
      ":" + expectedUser.take(40)
    assert(rows(0).getMap[String, String](1)("demographics") == expected)

    // audit traces: one per (row × instruction), all finished except
    // the skipped meds instruction of patient 2
    val st0 = InstructionRunner.stringifyKv(ehrRows,
      Seq("patient_id", "patient", "encounters", "medications"), "s0")
    val traces = InstructionRunner.traceStage(st0, mapStage, MockLlmClient(),
      "s0", "patient_id")
    assert(traces.count() == 9)
    assert(traces.where(!col("finished")).count() == 1)
  }

  test("nested patient struct renders as JSON through stage 0 and the map stage") {
    // a genuinely nested record (struct + array), not a pre-serialized
    // JSON string: stage 0 must render it via to_json so the prompt
    // carries parseable JSON, matching the reference's json.dumps branch
    val nested = ehrRows
      .withColumn("patient",
        struct(lit(61).as("age"), lit("F").as("gender"),
          array(lit("hypertension"), lit("cad")).as("conditions")))
      .where(col("patient_id") === 1L)
    val expectedJson =
      """{"age":61,"gender":"F","conditions":["hypertension","cad"]}"""

    val st0 = InstructionRunner.stringifyKv(nested,
      Seq("patient_id", "patient", "encounters", "medications"), "s0")
    val rendered = st0.select(element_at(col("s0"), "patient"))
      .as[String].head()
    assert(rendered == expectedJson)

    // and the map stage consumes the JSON rendering in its prompt
    val out = InstructionRunner.runStage(st0, mapStage, MockLlmClient(), "s0", "r")
      .select(element_at(col("r"), "demographics")).as[String].head()
    val ins = mapStage.instructions.head
    val user = s"# patient\n$expectedJson\n"
    val expected = "RE:" + LlmClient.sha256Hex(
      Prompts.sysPrompt(ins) + "\n" + user).take(16) + ":" + user.take(40)
    assert(out == expected)
  }

  test("EHR flow end-to-end through JSONL source and sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ehr").toString
    graft.sources.Jsonl.write(ehrRows, s"$dir/in")
    val rows = graft.sources.Jsonl.read(spark, s"$dir/in")

    val out = InstructionRunner.runPipeline(rows,
      PipelineConfig(Seq(mapStage, reduceStage)), MockLlmClient(),
      Seq("patient_id", "patient", "encounters", "medications"))
    graft.sources.Jsonl.guardedWrite(
      out.select("patient_id", "result_md"), s"$dir/results", append = false)

    val st0 = InstructionRunner.stringifyKv(rows,
      Seq("patient_id", "patient", "encounters", "medications"), "s0")
    val traces = InstructionRunner.traceStage(st0, mapStage, MockLlmClient(),
      "s0", "patient_id")
    graft.sources.Jsonl.writeTraces(traces, s"$dir/audit")

    val results = graft.sources.Jsonl.read(spark, s"$dir/results")
    assert(results.count() == 3)
    assert(results.columns.toSet == Set("patient_id", "result_md"))
    val meta = graft.sources.Jsonl.read(spark, s"$dir/audit/meta")
    assert(meta.count() == 9)
    assert(meta.columns.toSet == Set("session_id", "stage", "name"))
  }
}
