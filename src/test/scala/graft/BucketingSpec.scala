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

  test("mirror re-registers over existing files in a fresh catalog — no rewrite") {
    // the cross-SESSION steady state: a new JVM finds the bucketed files
    // on disk and re-attaches with metadata-only DDL instead of paying
    // the bucketing shuffle again — and the re-registered table still
    // carries the bucket layout the planner needs for shuffle-free joins
    val sf = "/root/testdata/sf0.001"
    val t = ops.Bucketing.ensure(spark, sf, "supplier", "s_suppkey")
    def fileStates(): Seq[(String, Long)] = {
      val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      spark.table(t).inputFiles.toSeq.sorted.map { f =>
        val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
        (f, st.getModificationTime)
      }
    }
    val before = fileStates()
    assert(before.nonEmpty)
    // dropping the EXTERNAL table entry simulates a fresh session:
    // catalog gone, files untouched
    spark.sql(s"DROP TABLE `$t`")
    assert(!spark.catalog.tableExists(t))
    val t2 = ops.Bucketing.ensure(spark, sf, "supplier", "s_suppkey")
    assert(t2 == t)
    assert(fileStates() == before, "re-registration must not rewrite files")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = spark.table(t).select(col("s_suppkey"), col("s_name"))
      val r = spark.table(t).select(col("s_suppkey").as("k2"), col("s_acctbal"))
      val j = l.join(r, col("s_suppkey") === col("k2"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"re-registered bucketed join should not shuffle:\n$plan")
      assert(j.count() == spark.table(t).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }
}
