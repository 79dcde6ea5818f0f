package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SCALE.md's "next 10×" claim, proven: two tables bucketed+sorted on the
  * join key join WITHOUT a shuffle exchange — the co-located join layout
  * that removes the per-query fact shuffle at 100 TB. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    val warehouse = Files.createTempDirectory("graft-bucketed").toString
    val facts = (1 to 1000).map(i => (i % 100, s"f$i", i * 1.5))
      .toDF("k", "tag", "v")
    val dims = (0 until 100).map(i => (i, s"d$i")).toDF("k", "name")

    facts.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$warehouse/facts").saveAsTable("graft_facts_b")
    dims.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$warehouse/dims").saveAsTable("graft_dims_b")
    try {
      // disable auto-broadcast so the planner must pick the shuffle-free
      // sort-merge join the bucket layout enables (a broadcast would hide
      // exactly the shuffle this test is about)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() == 1000)
      val one = joined.filter(col("tag") === "f42").select("name")
        .collect().head.getString(0)
      assert(one == "d42")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
