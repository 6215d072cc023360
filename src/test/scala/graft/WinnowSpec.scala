package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Winnowing fingerprint selection (Text.winnowPacked/winnowHashes):
  * the Column pipeline is matched against an independent plain-Scala
  * reimplementation of the Schleimer/Wilkerson/Aiken selection rule
  * on real corpus docs, plus the two paper guarantees (shared-run
  * detection, density) and the truncated-window edge cases.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 8
  private val HashMod = 1L << 43
  private val PosMod = 1L << 20

  /** Plain-Scala md5-60bit (the GraftFunctions.md5Long contract). */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Independent reference winnow: grams → packed → window minima. */
  private def refWinnow(text: String): Seq[Long] = {
    val ws = text.toLowerCase.split(" ", -1)
    val grams =
      if (ws.length >= K) (0 to ws.length - K).map(i => ws.slice(i, i + K).mkString(" "))
      else Seq.empty
    val packed = grams.zipWithIndex.map { case (g, i) =>
      (md5Long(g) % HashMod) * PosMod + (PosMod - 1 - i)
    }
    if (packed.isEmpty) Seq.empty
    else (0 to math.max(packed.length - W, 0))
      .map(i => packed.slice(i, math.min(i + W, packed.length)).min)
      .distinct
  }

  test("winnowPacked matches the plain-Scala reference on real corpus docs") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
      .as[(Long, String)].collect()
    val got = Tables.load(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), Text.winnowPacked(col("text"), K, W).as("sel"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      assert(got(id).sorted == refWinnow(text).sorted, s"doc $id")
    }
  }

  test("shared-run guarantee: a shared w+k-1-word run yields a shared fingerprint hash") {
    // 11 = W + K - 1 — the paper's detection threshold t
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val docs = Seq(
      (0L, s"one two three four five six seven $run red blue green yellow"),
      (1L, s"purple orange cyan magenta lime teal $run north south east west"))
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), Text.winnowHashes(col("text"), K, W).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(0L).toSet.intersect(fps(1L).toSet).nonEmpty,
      "shared 11-word run produced no shared fingerprint")
  }

  test("density is near the expected 2/(w+1) on the corpus") {
    val d = Tables.load(spark, sfDir, "documents")
    val row = d.select(
        size(Text.winnowPacked(col("text"), K, W)).cast("long").as("nsel"),
        greatest(size(split(lower(col("text")), " ")) - lit(K - 1), lit(0))
          .cast("long").as("m"))
      .where(col("m") > lit(W))
      .agg(sum(col("nsel")).as("s"),
        sum(col("m") - lit(W) + lit(1)).as("w"))
      .as[(Long, Long)].head()
    val density = row._1.toDouble / row._2
    // expectation 2/(W+1) ≈ 0.222; generous band for a finite corpus
    assert(density > 0.12 && density < 0.40, s"density $density")
  }

  test("short docs: < k words selects nothing, < w grams selects exactly one") {
    val docs = Seq(
      (0L, "one two three"), // 3 words < K → 0 grams
      (1L, "one two three four five six")) // 3 grams < W → 1 truncated window
      .toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), Text.winnowPacked(col("text"), K, W).as("sel"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(0L).isEmpty)
    assert(out(1L).length == 1)
    // the single selection is the global (hash asc, pos desc) min
    assert(out(1L).head == refWinnow("one two three four five six").head)
  }

  test("winnowPacked runs under CODEGEN_ONLY and matches interpreted eval") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFall = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val docs = Tables.load(spark, sfDir, "documents").limit(20)
        .select(col("doc_id"), Text.winnowPacked(col("text"), K, W).as("sel"))
        .as[(Long, Seq[Long])].collect()
      assert(docs.length == 20)
      val texts = Tables.load(spark, sfDir, "documents").limit(20)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
      docs.foreach { case (id, sel) =>
        assert(sel.sorted == refWinnow(texts(id)).sorted, s"doc $id")
      }
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFall.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("position packing clamps at 2^20 grams: hash recovery stays exact on mega-docs") {
    // a doc with > 2^20 grams used to underflow (PosMod - 1 - i) into
    // the hash bits (ADVICE r11). Build the positional hash array
    // directly (cheaper than a 1M-word string): a known globally-min
    // hash planted BEYOND the clamp point must be recovered exactly.
    val m = (1 << 20) + 4096
    val hashes = Array.tabulate(m)(i => 1000000L + (i % 9973L) * 37L)
    val minHash = 7L
    hashes(m - 100) = minHash // beyond position 2^20 - 1
    val sel = graft.expressions.WinnowOps.select(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(hashes), W)
    val recovered = (0 until sel.numElements()).map(sel.getLong(_) >>> 20)
    assert(recovered.contains(minHash),
      "planted min hash past the clamp point was not recovered")
    // every recovered hash must be one of the input hashes (no
    // borrow corruption anywhere in the tail)
    val inSet = hashes.toSet
    recovered.foreach(h => assert(inSet.contains(h), s"corrupted hash $h"))
    // and every packed value is non-negative with position bits < 2^20
    (0 until sel.numElements()).foreach { i =>
      assert(sel.getLong(i) >= 0L)
    }
  }

  test("selectHashes is null-safe and lowercases like the batch lower()") {
    import graft.expressions.WinnowOps
    assert(WinnowOps.selectHashes(null, K, W, xx = false).isEmpty)
    // non-ASCII text: the stream kernel must match the batch column
    // (Spark lower() path) bit-for-bit — Turkish İ and German ß are
    // the classic locale/width divergences
    val text = ("İSTANBUL STRASSE ÉCOLE ÊTRE ÇOK GÜZEL İyi Größe Ñandú " +
      "ЖУРНАЛ ΕΛΛΑΣ ü ö ä ß µ İ I ı i ÀÈÌÒÙ àèìòù " +
      (1 to 20).map(i => s"W$i").mkString(" "))
    val streamFps = WinnowOps.selectHashes(text, K, W, xx = false).toSeq.sorted
    val batchFps = Seq(text).toDF("text")
      .select(Text.winnowHashes(col("text"), K, W).as("h"))
      .as[Seq[Long]].head().sorted
    assert(streamFps == batchFps,
      s"stream/batch fingerprint divergence on non-ASCII text")
  }

  test("a long shared run is detected by the gated pairs query shape") {
    // 30-word shared run ⇒ 20 fully-interior windows ⇒ comfortably ≥ 2
    // distinct shared fingerprints for the MinShared = 2 bar
    val run = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, s"aa bb cc dd ee ff gg hh $run zz yy xx wv"),
      (20L, s"mm nn oo pp qq rr ss tt $run uu vv ww kk"))
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"),
        explode(Text.winnowHashes(col("text"), K, W)).as("h"))
    val shared = fps.as("a").join(fps.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id", $"b.doc_id").count()
      .as[(Long, Long, Long)].collect()
    assert(shared.length == 1 && shared.head._3 >= 2L,
      s"expected >= 2 shared fingerprints, got ${shared.toSeq}")
  }
}
