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

  test("merging an empty delta touches nothing") {
    val dir = freshTable()
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "p", "v")
    assert(CopyOnWrite.merge(spark, dir, "p", "k", empty).isEmpty)
  }
}
