package graft

import graft.ops.PrefixSums
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[PrefixSums.cumsum]] — distributed running totals via the two-pass
  * partition-offset scheme; spec is `SUM(w) OVER (ORDER BY key)`. */
class PrefixSumsSpec extends SparkSpec {

  import spark.implicits._

  test("cumsum matches the single-partition window specification") {
    val df = Seq((7L, 3L), (1L, 10L), (42L, 5L), (3L, 0L), (99L, 2L))
      .toDF("k", "w").repartition(3)
    val got = PrefixSums.cumsum(df, "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("cum", sum("w").over(Window.orderBy("k")))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("result is invariant to the input's partitioning") {
    val base = spark.range(0, 2000)
      .select((col("id") * 37 % 2003).as("k"), (col("id") % 17).as("w"))
    val a = PrefixSums.cumsum(base.repartition(2), "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val b = PrefixSums.cumsum(base.repartition(13), "k", "w", "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // final cum equals the global total
    assert(a.map(_._2).max == base.agg(sum("w")).as[Long].head())
  }

  test("non-bigint weight is rejected") {
    val df = Seq((1L, 1)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      PrefixSums.cumsum(df, "k", "w", "cum")
    }
  }
}
