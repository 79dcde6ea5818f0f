package graft

import graft.queries.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** `ann_ivf_incremental` physical claims the oracle can't see: the
  * frozen-quantizer lifecycle splits the index into a base segment and
  * a delta segment, the delta build never touches the base layout, and
  * each segment holds exactly its own vectors, cell-partitioned. The
  * answer itself is hash-proven by the DuckDB oracle (which replays
  * base-only training and frozen-cell assignment of the full corpus).
  */
class IvfIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def files(dir: String): Map[String, Long] = {
    val it = fs.listFiles(new Path(dir), true)
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile) b += s.getPath.toString -> s.getModificationTime
    }
    b.result()
  }

  test("segments split the corpus by batch; delta build leaves base byte-stable") {
    assume(new java.io.File(sf).isDirectory)
    val (base, delta) = Similarity.ivfIncrementalSegments(spark, sf)
    val baseStamps = files(base)

    // the delta append is REBUILT from scratch: still no base rewrite
    fs.delete(new Path(delta), true)
    val (base2, delta2) = Similarity.ivfIncrementalSegments(spark, sf)
    assert(base2 == base)
    assert(files(base) == baseStamps,
      "delta (re)build modified the base segment")

    // each segment carries exactly its own batch, cell-partitioned
    val baseIds = spark.read.parquet(base).select(col("vec_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    val deltaIds = spark.read.parquet(delta2).select(col("vec_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    assert(baseIds.forall(_ % 10 != 3) && baseIds.nonEmpty)
    assert(deltaIds.forall(_ % 10 == 3) && deltaIds.nonEmpty)
    val n = graft.T.embeddings(spark, sf).count()
    assert(baseIds.length + deltaIds.length == n)
    // the layout is the index: both segments are cell-partitioned dirs
    assert(fs.listStatus(new Path(base)).exists(s =>
      s.getPath.getName.startsWith("cell=")))
    assert(fs.listStatus(new Path(delta2)).exists(s =>
      s.getPath.getName.startsWith("cell=")))
  }

  test("serving reads prune to the probes' cells on both segments") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("ann_ivf_incremental")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // both segment scans sit under the same cell-key join; the probe
    // side is broadcast (no corpus-sized shuffle to serve 10 probes)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }
}
