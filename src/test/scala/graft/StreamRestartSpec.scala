package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.streaming.MinHashStream
import graft.streaming.MinHashStream.DocIn

/** Checkpointed restart resilience: a stateful streaming operator's
  * state store must survive stop + restart from the same checkpoint —
  * the property that makes any of the streaming dedup/sketch
  * operators deployable (executors die; the claim state must not).
  * Uses a file source (offsets are file names, so a fresh reader
  * resumes exactly where the stopped one committed).
  */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val textA = "the quick brown fox jumps over the lazy dog " +
    "while the other animals watch from the shade of an old oak tree"
  private val textB = "completely different content about ships and " +
    "harbors where the morning fog rolls in across the quiet water"

  test("minhash dedup bucket claims survive a checkpointed restart") {
    val src = Files.createTempDirectory("graft-restart-src").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    def writeDoc(name: String, id: Long, text: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$src/$name"),
        s"""{"doc_id": $id, "text": "$text"}\n""")

    def startQuery() = MinHashStream.minhashDedupStream(
        spark.readStream.schema(schema).json(src).as[DocIn])
      .writeStream.format("memory").queryName("restart_dd")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()

    // phase 1: doc 1 claims its buckets, then the query dies
    writeDoc("a.json", 1L, textA)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: a fresh query on the same checkpoint sees a duplicate
    // of doc 1 and a novel doc — the verdicts prove the restored
    // state: 2 drops ONLY if the pre-restart claim survived
    writeDoc("b.json", 2L, textA)
    writeDoc("c.json", 3L, textB)
    val q2 = startQuery()
    q2.processAllAvailable()
    val verdicts = spark.sql("SELECT doc_id, dropped FROM restart_dd")
      .as[(Long, Boolean)].collect().toMap
    q2.stop()

    assert(verdicts == Map(1L -> false, 2L -> true, 3L -> false),
      s"state did not survive restart: $verdicts")
  }
}
