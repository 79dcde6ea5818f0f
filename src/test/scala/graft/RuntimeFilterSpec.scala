package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — Spark's InjectRuntimeFilter rule
  * builds a bloom filter from the selective (creation) side of a
  * shuffle join and applies `might_contain` on the large (application)
  * side BEFORE its shuffle, so rows that cannot match never cross the
  * wire. This is the engine-native version of the semi-join prefilter a
  * 100 TB fact⋈filtered-dim join wants; at local test scale every scan
  * is below the default 10 GB application-side threshold, so the test
  * scopes the thresholds down to force the injection and restores them.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("selective dim join injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // keep the join a shuffle join: broadcast joins take the DPP path
      // instead and the bloom rewrite does not apply
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), p)
      // and the filtered plan returns the same rows as the unfiltered one
      val n = joined.collect().map(_.getLong(1)).sum
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
      assert(n == plain)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
