package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Footer-metadata invariants that have no row-level oracle (the
  * row-recomputable half of the audit is gated by `meta_parquet_stats`):
  * value counts, null counts on a nullable column, and byte accounting
  * against the physical file. */
class ParquetMetaSpec extends SparkSpec {

  import spark.implicits._

  private def footerColumns(file: String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala).map(c =>
      (c.getPath.toDotString, c.getValueCount, c.getStatistics.getNumNulls,
        c.getTotalSize, c.getTotalUncompressedSize)).toList
    finally r.close()
  }

  test("footer value/null counts match written data, bytes bounded by file size") {
    val dir = Files.createTempDirectory("graft-meta-spec").toString
    Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None), (5L, None))
      .toDF("k", "s").coalesce(1).write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).head
    val cols = footerColumns(file.getPath.toString)
    val byName = cols.groupBy(_._1)
    // parquet value counts INCLUDE nulls; null counts isolate them
    assert(byName("k").map(_._2).sum == 5L)
    assert(byName("k").map(_._3).sum == 0L)
    assert(byName("s").map(_._2).sum == 5L)
    assert(byName("s").map(_._3).sum == 3L)
    // column chunks are a subset of the physical file
    cols.foreach { c => assert(c._4 > 0, c) }
    assert(cols.map(_._4).sum <= file.getLen)
  }
}
