package graft

import graft.sources.GraftGen
import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector's planner contracts: partition
  * planning, filter pushdown that narrows generation, column pruning,
  * and deterministic row content. */
class GraftGenSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int = 8) =
    spark.read.format("graftgen")
      .option("rows", rows).option("partitions", parts).load()

  test("full scan generates exactly `rows` rows across `partitions` splits") {
    val df = gen(1000, 4)
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("id-range conjuncts are consumed: the scan's pushedRange narrows") {
    val df = gen(60000).filter(col("id") >= 10000L && col("id") < 50000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedRange=[10000,50000)"), plan)
    assert(df.count() == 40000L)
  }

  test("residual predicates stay post-scan (not claimed by the source)") {
    val df = gen(1000).filter(col("id") < 100L && col("k") % 2 === 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedRange=[0,100)"), plan)
    // the parity filter must still appear as a Catalyst Filter node
    assert(plan.contains("Filter"), plan)
    val expected = (0L until 100L).count(GraftGen.kOf(_) % 2 == 0)
    assert(df.count() == expected.toLong)
  }

  test("column pruning reaches the reader") {
    val df = gen(1000).select("grp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=grp"), plan)
  }

  test("row content is the documented deterministic derivation") {
    val r = gen(10).orderBy("id").collect()
    assert(r.length == 10)
    for (row <- r) {
      val id = row.getLong(0)
      assert(row.getInt(1) == GraftGen.kOf(id))
      assert(row.getString(2) == GraftGen.grpOf(id))
      assert(row.getDouble(3) == GraftGen.valOf(id))
    }
  }

  test("empty range after pushdown yields zero partitions, zero rows") {
    val df = gen(1000).filter(col("id") >= 5000L)
    assert(df.count() == 0L)
  }
}
