package graft

import graft.ops.CopyOnWrite
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[CopyOnWrite.merge]] — partition-scoped rewrite, upsert semantics,
  * and untouched-partition immutability. */
class LakeCowSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft-cow-spec").toString
    Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0))
      .toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    dir
  }

  private def listing(dir: String, part: String): Seq[(String, Long, Long)] = {
    val p = new Path(dir, s"p=$part")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(f =>
      (f.getPath.getName, f.getLen, f.getModificationTime)).toSeq.sorted
  }

  test("merge rewrites only the touched partitions; upsert replaces matched keys") {
    val dir = freshTable()
    val before = Map("a" -> listing(dir, "a"), "b" -> listing(dir, "b"),
      "c" -> listing(dir, "c"))
    // update k=3 (partition b), insert k=9 (partition b), new partition d
    val delta = Seq((3L, "b", 99.0), (9L, "b", 90.0), (7L, "d", 70.0))
      .toDF("k", "p", "v")
    val touched = CopyOnWrite.merge(spark, dir, "p", "k", delta)
    assert(touched == Seq("b", "d"))
    // untouched partitions byte-identical on disk
    assert(listing(dir, "a") == before("a"))
    assert(listing(dir, "c") == before("c"))
    // touched partition rewritten
    assert(listing(dir, "b") != before("b"))
    val out = CopyOnWrite.read(spark, dir)
      .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 99.0), (4L, "b", 40.0),
      (5L, "c", 50.0), (7L, "d", 70.0), (9L, "b", 90.0)))
  }

  test("schema-evolving delta adds a column; prior rows read it as null") {
    val dir = freshTable()
    // delta carries a new column w: k=3 updated with w, k=9 inserted with w
    val delta = Seq((3L, "b", 99.0, 7.5), (9L, "b", 90.0, 8.5))
      .toDF("k", "p", "v", "w")
    CopyOnWrite.merge(spark, dir, "p", "k", delta)
    val out = CopyOnWrite.read(spark, dir)
      .select(col("k"), col("v"), col("w"))
      .as[(Long, Double, Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 10.0, None),        // untouched partition: old file schema, null w
      (2L, 20.0, None),
      (3L, 99.0, Some(7.5)),   // updated row carries the new column
      (4L, 40.0, None),        // survivor in the rewritten partition
      (5L, 50.0, None),
      (9L, 90.0, Some(8.5))))  // insert carries the new column
  }

  test("merging an empty delta touches nothing") {
    val dir = freshTable()
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "p", "v")
    assert(CopyOnWrite.merge(spark, dir, "p", "k", empty).isEmpty)
  }
}
