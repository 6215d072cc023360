package graft

import java.math.RoundingMode
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.streaming.{ConformalGateStream, PageHinkleyStream, SemDedupStream}
import graft.streaming.ConformalGateStream.GateObs
import graft.streaming.PageHinkleyStream.SeriesObs
import graft.streaming.SemDedupStream.VecIn

/** Checkpointed-restart coverage for the round-9 stateful twins
  * (VERDICT r9 #10): ConformalGateStream's sketch + audit counters,
  * PageHinkleyStream's 4-number recursion state, and SemDedupStream's
  * per-cell representative lists must all survive stop + restart from
  * the same checkpoint. Same file-source discipline as
  * StreamRestartSpec — offsets are file names, so a fresh reader
  * resumes exactly where the stopped one committed, and the
  * post-restart verdicts are only reachable through restored state.
  */
class StreamRestartR9Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
      lines.mkString("", "\n", "\n"))

  test("conformal gate: sketch + audit counters survive restart") {
    val src = tmp("graft-cg-src")
    val ckpt = tmp("graft-cg-ckpt")
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("side", IntegerType), StructField("reward", DoubleType)))
    val out = tmp("graft-cg-out")
    // memory sink cannot recover from a checkpoint (Append mode) —
    // restart coverage needs a durable sink, so results land as json
    def start() = ConformalGateStream.conformalGateStream(
        spark.readStream.schema(schema).json(src).as[GateObs], 64, 0.1)
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // phase 1: 20 calibration rewards 0.05..1.00 — threshold ≈ 0.1
    writeLines(src, "a.json", (1 to 20).map(i =>
      s"""{"g": "g", "side": 0, "reward": ${i * 0.05}}"""))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: test traffic only. A fresh query that LOST the sketch
    // would see n_calib = 0 and (per the cold-start contract) skip the
    // audit entirely — so n_calib = 20 and n_test = 2 with the 0.01
    // reward failing the ≈0.1 threshold proves restoration.
    writeLines(src, "b.json", Seq(
      """{"g": "g", "side": 1, "reward": 0.9}""",
      """{"g": "g", "side": 1, "reward": 0.01}"""))
    val q2 = start()
    q2.processAllAvailable()
    val outSchema = StructType(Seq(StructField("g", StringType),
      StructField("version", LongType), StructField("n_calib", LongType),
      StructField("threshold", DoubleType), StructField("err_rank", LongType),
      StructField("n_test", LongType), StructField("n_pass", LongType)))
    val last = spark.read.schema(outSchema).json(out)
      .orderBy("version")
      .selectExpr("n_calib", "threshold", "n_test", "n_pass")
      .as[(Long, Double, Long, Long)].collect().last
    q2.stop()
    assert(last._1 == 20L, s"calibration sketch lost: $last")
    assert(last._2 > Double.NegativeInfinity && last._2 <= 0.15, s"thr: $last")
    assert(last._3 == 2L && last._4 == 1L,
      s"audit counters wrong after restart: $last")
  }

  test("page-hinkley: the 4-number recursion state survives restart") {
    val src = tmp("graft-ph-src")
    val ckpt = tmp("graft-ph-ckpt")
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("orderK", LongType), StructField("micros", LongType)))
    val lambda = 0.5
    val out = tmp("graft-ph-out")
    def start() = PageHinkleyStream.pageHinkleyStream(
        spark.readStream.schema(schema).json(src).as[SeriesObs], lambda)
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // micros series: stable 1.0 then a level shift to 3.0
    val phase1 = (1 to 5).map(k => (k.toLong, 1000000L))
    val phase2 = (6 to 10).map(k => (k.toLong, 3000000L))
    writeLines(src, "a.json", phase1.map { case (k, m) =>
      s"""{"g": "g", "orderK": $k, "micros": $m}""" })
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    writeLines(src, "b.json", phase2.map { case (k, m) =>
      s"""{"g": "g", "orderK": $k, "micros": $m}""" })
    val q2 = start()
    q2.processAllAvailable()
    val outSchema = StructType(Seq(StructField("g", StringType),
      StructField("orderK", LongType), StructField("i", LongType),
      StructField("ph", DoubleType), StructField("alarm", BooleanType)))
    val rows = spark.read.schema(outSchema).json(out)
      .orderBy("orderK").selectExpr("orderK", "i", "ph", "alarm")
      .as[(Long, Long, Double, Boolean)].collect()
    q2.stop()

    assert(rows.map(_._2).toSeq == (1L to 10L),
      s"row counter i must continue across the restart: ${rows.toSeq}")
    // driver replica of the operator's exact micro-quantized recursion
    // over the SAME series — bit-exact parity proves the whole
    // (n, sum, m, min) state vector was restored, not just the counter
    def r6Micros(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(8, RoundingMode.HALF_UP).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
    def toD(m: Long): Double =
      java.math.BigDecimal.valueOf(m).movePointLeft(6).doubleValue()
    var (n, s, m, minM) = (0L, 0L, 0L, 0L)
    val expected = (phase1 ++ phase2).map { case (_, micros) =>
      n += 1; s += micros
      m += r6Micros(toD(micros) - toD(s) / n.toDouble)
      minM = if (n == 1L) m else math.min(minM, m)
      toD(m - minM)
    }
    assert(rows.map(_._3).toSeq == expected,
      s"ph trajectory diverged after restart: ${rows.map(_._3).toSeq} vs $expected")
    assert(rows.last._4, "the level shift must alarm")
  }

  test("pack stream: the per-(class, shard) rank counter survives restart") {
    import graft.streaming.PackStream
    val src = tmp("graft-pk-src")
    val ckpt = tmp("graft-pk-ckpt")
    val out = tmp("graft-pk-out")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_tokens", LongType)))
    def start() = PackStream.packStream(
        spark.readStream.schema(schema).json(src).as[PackStream.DocIn],
        capacity = 100, shards = 1)
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // class 2 (45 tokens): 3 docs before the restart fill bin 0 and
    // half of bin 1; 3 docs after must CONTINUE at ranks 4-6 (bins
    // 1, 2, 2) — a lost counter would restart at bin 0
    writeLines(src, "a.json", (0 until 3).map(i =>
      s"""{"doc_id": $i, "n_tokens": 45}"""))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    writeLines(src, "b.json", (3 until 6).map(i =>
      s"""{"doc_id": $i, "n_tokens": 45}"""))
    val q2 = start()
    q2.processAllAvailable()
    val outSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("k", LongType), StructField("shard", LongType),
      StructField("bin", LongType)))
    val bins = spark.read.schema(outSchema).json(out)
      .select("bin").as[Long].collect().sorted.toSeq
    q2.stop()
    assert(bins == Seq(0L, 0L, 1L, 1L, 2L, 2L),
      s"rank counter did not survive the restart: $bins")
  }

  test("semantic dedup: per-cell representative lists survive restart") {
    val src = tmp("graft-sd-src")
    val ckpt = tmp("graft-sd-ckpt")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("emb", ArrayType(DoubleType))))
    val centroids = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val out = tmp("graft-sd-out")
    def start() = SemDedupStream.semDedupStream(
        spark.readStream.schema(schema).json(src).as[VecIn],
        centroids, minCos = 0.95)
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // phase 1: vec 1 becomes cell 0's representative
    writeLines(src, "a.json",
      Seq("""{"vec_id": 1, "emb": [1.0, 0.01]}"""))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: vec 2 is a near-duplicate of vec 1 (same cell), vec 3
    // is novel in the other cell — 2 is removed ONLY if the phase-1
    // representative survived the restart
    writeLines(src, "b.json", Seq(
      """{"vec_id": 2, "emb": [0.999, 0.012]}""",
      """{"vec_id": 3, "emb": [0.01, 1.0]}"""))
    val q2 = start()
    q2.processAllAvailable()
    val outSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cell", IntegerType), StructField("removed", IntegerType)))
    val verdicts = spark.read.schema(outSchema).json(out)
      .selectExpr("vec_id", "removed").as[(Long, Int)].collect().toMap
    q2.stop()
    assert(verdicts == Map(1L -> 0, 2L -> 1, 3L -> 0),
      s"representative state did not survive restart: $verdicts")
  }
}
