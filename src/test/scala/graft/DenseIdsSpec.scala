package graft

import graft.ops.DenseIds
import org.apache.spark.sql.functions._

/** [[DenseIds.assign]] — dense 0-based global ids via the two-pass
  * partition-offset scheme (no single-partition window). */
class DenseIdsSpec extends SparkSpec {

  import spark.implicits._

  test("ids are dense, 0-based, and follow global key order") {
    val df = Seq(42L, 7L, 99L, 1L, 500L, 3L).toDF("k").repartition(3)
    val out = DenseIds.assign(df, "k", "id")
      .orderBy("id").select("k", "id").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq == (0L to 5L))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 7L, 42L, 99L, 500L))
  }

  test("assignment is invariant to the input's partitioning") {
    val base = spark.range(0, 1000).select((col("id") * 37 % 1009).as("k"))
    val a = DenseIds.assign(base.repartition(2), "k", "id")
      .select("k", "id").as[(Long, Long)].collect().sortBy(_._2)
    val b = DenseIds.assign(base.repartition(13), "k", "id")
      .select("k", "id").as[(Long, Long)].collect().sortBy(_._2)
    assert(a.toSeq == b.toSeq)
    // dense and contiguous over the full range
    assert(a.map(_._2).toSeq == (0L until 1000L))
  }
}
