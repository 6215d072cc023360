package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.PartitionedSnapshot

/** Partition-overwrite ingest: dynamic overwrite replaces exactly the
  * batch's partitions, leaves other partitions' FILES untouched, and
  * is idempotent under redelivery — asserted at the file level, not
  * just row counts.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(root: String, part: String): Map[String, Long] = {
    val dir = new File(s"$root/$part")
    assert(dir.isDirectory, s"missing partition dir $dir")
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }

  private def contentHash(root: String, part: String): Seq[String] =
    new File(s"$root/$part").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(Paths.get(f.getPath))))).toSeq

  test("dynamic overwrite replaces one partition, leaves others' files byte-identical, retries are no-ops") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val root = Files.createTempDirectory("graft-snapshot-spec").toString
    PartitionedSnapshot.write(d, root, "lang")

    val langs = d.select("lang").distinct().as[String].collect().sorted
    assert(langs.length >= 3, s"corpus has too few langs: ${langs.toSeq}")
    val untouched = langs.filter(_ != "en")
    val before = untouched.map(l => l -> partFiles(root, s"lang=$l")).toMap
    val beforeHash = untouched.map(l => l -> contentHash(root, s"lang=$l")).toMap

    // re-delivered batch: half of en, transformed
    val batch = d.where(col("lang") === "en" && col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), upper(col("text")).as("text"))
    val batchRows = batch.count()
    assert(batchRows > 0)
    PartitionedSnapshot.overwritePartitions(batch, root, "lang")
    PartitionedSnapshot.overwritePartitions(batch, root, "lang") // retry

    // row accounting: en == exactly the batch; others unchanged
    val after = PartitionedSnapshot.read(spark, root)
    assert(after.where(col("lang") === "en").count() == batchRows)
    assert(after.where(col("lang") === "en" &&
      col("doc_id") % 2 === 1).count() == 0)
    for (l <- untouched)
      assert(after.where(col("lang") === l).count() ==
        d.where(col("lang") === l).count(), s"partition $l changed size")

    // file-level: untouched partitions keep their exact files — the
    // write cost is the replaced partition, not the table
    for (l <- untouched) {
      assert(partFiles(root, s"lang=$l") == before(l),
        s"partition $l files were rewritten")
      assert(contentHash(root, s"lang=$l") == beforeHash(l),
        s"partition $l content changed")
    }

    // content correctness of the replaced partition
    val en = after.where(col("lang") === "en")
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val expected = batch.select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(en.sameElements(expected))
  }
}
