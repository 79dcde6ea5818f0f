package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** ops.Compaction: file-count bin-packing, multiset content
  * preservation, and the fail-safe swap contract. */
class CompactionSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-compact").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/t"
  }

  private def sortedRows(path: String): Seq[String] =
    spark.read.parquet(path)
      .select(concat_ws("|", col("id"), col("v")).as("r"))
      .collect().map(_.getString(0)).toSeq.sorted

  test("compaction shrinks a fragmented directory and preserves content") {
    val path = freshDir()
    spark.range(0, 10000)
      .select(col("id"), (col("id") % 97).cast("string").as("v"))
      .repartition(32)
      .write.parquet(path)
    val beforeRows = sortedRows(path)
    val (nBefore, nAfter) = ops.Compaction.compact(spark, path, 1L << 30)
    assert(nBefore == 32, s"fixture should fragment into 32 files, got $nBefore")
    assert(nAfter == 1, s"1 GiB target must pack everything into 1 file, got $nAfter")
    assert(sortedRows(path) == beforeRows, "content changed across compaction")
  }

  test("target sizing: ceil(bytes/target) output files, content intact") {
    val path = freshDir()
    spark.range(0, 20000)
      .select(col("id"), md5(col("id").cast("string")).as("v"))
      .repartition(16)
      .write.parquet(path)
    val beforeRows = sortedRows(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
      .map(_.getLen).sum
    val target = total / 3 + 1 // should yield ceil(total/target) = 3 files
    val (_, nAfter) = ops.Compaction.compact(spark, path, target)
    assert(nAfter == 3, s"expected 3 output files, got $nAfter")
    assert(sortedRows(path) == beforeRows)
  }

  test("zero/negative target is rejected") {
    intercept[IllegalArgumentException] {
      ops.Compaction.compact(spark, freshDir(), 0L)
    }
  }
}
