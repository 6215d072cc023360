package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for image/audio/video payloads carried
  * as opaque binary columns with typed metadata (reference S9:
  * PDF → page images → base64 → multimodal LLM,
  * apps/poc-instruction-gen/run_example2template.py:77-169).
  *
  * The decode/feature-extract step is a STUB in this environment (no
  * image/audio libraries in the container): `decodeStub` derives a
  * deterministic fake feature vector from the payload digest. The
  * Spark-side plumbing is real and tested — binary schema,
  * partition-level batching through mapPartitions, fixed-width
  * feature output, scan-time metadata extraction — so swapping the
  * stub for a real decoder (JNI/ONNX/Pandas-UDF service) changes one
  * function, not the pipeline.
  */
object Multimodal {

  val FeatureDim = 4

  /** Deterministic frame sampling over a binary payload: every
    * `everyNth`-th `frameBytes`-sized frame, as an array of binary
    * slices — the video/audio "sample k frames before decoding" step
    * as a pure scan-time expression (no shuffle, codegen'd, works on
    * any container where frames are fixed-stride; variable-stride
    * containers need the mapPartitions decoder bridge below instead).
    * Payloads shorter than one frame yield an empty array.
    */
  def frameSample(bin: org.apache.spark.sql.Column, frameBytes: Int,
                  everyNth: Int): org.apache.spark.sql.Column = {
    val stride = frameBytes * everyNth
    // (len - frame) / stride: non-negative double division cast to int
    // truncates toward zero = floor, giving the last full-frame index
    when(length(bin) >= frameBytes,
      transform(
        sequence(lit(0),
          ((length(bin) - lit(frameBytes)) / lit(stride)).cast("int")),
        i => bin.substr(i * stride + lit(1), lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("digest", StringType),
    StructField("features", ArrayType(DoubleType))))

  /** STUB decoder: payload → fixed-width feature vector. Replace with
    * a real decoder at deployment; everything else is production
    * plumbing. Deterministic: features[i] = byte i of sha256(payload)
    * scaled to [0,1] (two hex chars → 0..255 → /255).
    */
  def decodeStub(bytes: Array[Byte]): (String, Array[Double]) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    val feats = (0 until FeatureDim).map { i =>
      Integer.parseInt(digest.substring(2 * i, 2 * i + 2), 16) / 255.0
    }.toArray
    (digest, feats)
  }

  /** Feature-extraction operator: binary payload column → (n_bytes,
    * digest, features). Runs per-partition so a real decoder can batch
    * (model inference wants batched input; the iterator shape here is
    * exactly what a vectorized bridge consumes).
    */
  def extractFeatures(df: DataFrame, bytesCol: String): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(bytesCol)
    val outSchema = schema
      .add("n_bytes", LongType).add("digest", StringType)
      .add("features", ArrayType(DoubleType))
    df.mapPartitions { it: Iterator[Row] =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (digest, feats) = decodeStub(bytes)
        Row.fromSeq(row.toSeq :+ bytes.length.toLong :+ digest :+ feats.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Chunk manifest for a binary payload: fixed-size chunks (the last
    * one partial), each with its byte offset, actual size, and md5 —
    * the multipart-upload / content-addressed-store manifest a
    * multimodal ingest pipeline writes next to each blob so transfers
    * can resume per-chunk and dedup can hit at sub-object granularity.
    *
    * Pure scan-time expression: an array of ceil(len/chunk) slices
    * built with `sequence`+`transform` (codegen'd, no shuffle) —
    * `substr` truncates the final slice at end-of-payload, which IS
    * the partial-last-chunk contract. Empty/short payloads yield one
    * chunk row when non-empty, zero when empty (guarded: `sequence`
    * would otherwise count down on a negative stop).
    */
  def chunkSlices(bin: org.apache.spark.sql.Column, chunkBytes: Int)
      : org.apache.spark.sql.Column = {
    require(chunkBytes > 0, s"chunkBytes must be positive: $chunkBytes")
    when(length(bin) > 0,
      transform(
        sequence(lit(0), ((length(bin) - 1) / lit(chunkBytes)).cast("int")),
        i => bin.substr(i * chunkBytes + lit(1), lit(chunkBytes))))
      .otherwise(array().cast("array<binary>"))
  }
}
