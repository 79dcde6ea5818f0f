package graft

import java.nio.file.Files

import graft.ops.{CatalogStats, ManifestLake}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

/** [[graft.ops.CatalogStats]] — manifest numbers injected as CATALOG
  * statistics drive VANILLA Spark planning: a plain
  * `spark.table(...)` star with a selective dim filter broadcasts the
  * dim under CBO's filter estimation (NDV from the KMV sidecars, row
  * and byte totals from the manifest entries), with NO graft optimizer
  * rule in the loop — both graft registries are cleared, and they only
  * ever act on registered paths anyway. */
class CatalogStatsSpec extends SparkSpec {

  import spark.implicits._

  private def initialPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def hasBroadcast(df: DataFrame): Boolean =
    initialPlan(df).collect {
      case b: BroadcastExchangeExec => b
    }.nonEmpty

  test("plain spark.table join broadcasts from injected manifest stats, no graft rule") {
    graft.plans.StatsBroadcast.clear()
    graft.plans.StatsJoinReorder.clear()
    val dimDir = Files.createTempDirectory("graft-catstats-dim").toString
    val factDir = Files.createTempDirectory("graft-catstats-fact").toString
    // dim: 40k rows, category NDV 50, padded so its parquet bytes sit
    // comfortably above the threshold the test pins below
    ManifestLake.appendCommit(spark, dimDir, "pd", "kd",
      spark.range(40000).select(col("id").as("kd"),
        (col("id") % 50).as("category"),
        sha2(col("id").cast("string"), 256).as("pad"),
        lit("x").as("pd")), "load")
    ManifestLake.appendCommit(spark, factDir, "pf", "kf",
      spark.range(80000).select(col("id").as("kf"),
        (col("id") % 40000).as("fk"), (col("id") * 3).as("vf"),
        lit("y").as("pf")), "load")
    val dimStats = CatalogStats.publish(spark, "cat_dim", dimDir,
      columns = Seq("category"))
    CatalogStats.publish(spark, "cat_fact", factDir)
    assert(dimStats.rowCount.contains(BigInt(40000)))
    val ndv = dimStats.colStats("category").distinctCount.get.toLong
    assert(ndv >= 40 && ndv <= 60, s"category NDV estimate off: $ndv")
    val dimBytes = dimStats.sizeInBytes.toLong
    // threshold between the dim's full size and its 1/50-filtered size:
    // only a planner that KNOWS the filter keeps ~2% may broadcast
    val threshold = dimBytes / 5
    def q(): DataFrame =
      spark.table("cat_fact")
        .join(spark.table("cat_dim").filter(col("category") === 7L),
          col("fk") === col("kd"))
        .groupBy(col("category")).agg(count(lit(1)).as("n"),
          sum(col("vf")).as("s"))
    val prev = (spark.conf.get("spark.sql.cbo.enabled", "false"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      // without CBO the filter keeps the dim at full size — over the
      // threshold, no broadcast: the CONTROL leg
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val control = q()
      val controlRows = control.collect().toSeq
      assert(!hasBroadcast(control),
        "control (no CBO row/col stats in play) must not broadcast")
      // with CBO, FilterEstimation consumes the injected NDV: estimated
      // dim size shrinks ~50x, under the threshold — vanilla Spark
      // broadcasts, no graft rule registered anywhere
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val planned = q()
      assert(hasBroadcast(planned),
        "injected catalog stats must let vanilla CBO broadcast the dim")
      assert(planned.collect().toSeq == controlRows,
        "stats changed the plan, never the answer")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._2)
      spark.sql("DROP TABLE IF EXISTS cat_dim")
      spark.sql("DROP TABLE IF EXISTS cat_fact")
    }
  }

  test("histogram stats flip a long-tailed range predicate's broadcast (VERDICT r11 #5)") {
    // 95% of dim rows hold v in the hot head [0,9]; 5% spread over the
    // long tail (11..100009]. `v > 10` keeps 5% of the MASS but ~100%
    // of the VALUE RANGE — rows/NDV/min-max leave FilterEstimation on
    // the uniform-span model (est ≈ full size, no broadcast); the
    // HistStats-derived equal-height histogram knows the real mass, so
    // the SAME vanilla plan flips to broadcast. No graft rule anywhere.
    graft.plans.StatsBroadcast.clear()
    graft.plans.StatsJoinReorder.clear()
    val dimDir = Files.createTempDirectory("graft-catstats-hdim").toString
    val factDir = Files.createTempDirectory("graft-catstats-hfact").toString
    ManifestLake.appendCommit(spark, dimDir, "pd", "kd",
      spark.range(40000).select(col("id").as("kd"),
        when(col("id") % 20 =!= 0, col("id") % 10)
          .otherwise(lit(11) + (col("id") * 37) % 99999).as("v"),
        sha2(col("id").cast("string"), 256).as("pad"),
        lit("x").as("pd")), "load")
    ManifestLake.appendCommit(spark, factDir, "pf", "kf",
      spark.range(80000).select(col("id").as("kf"),
        (col("id") % 40000).as("fk"), (col("id") * 3).as("vf"),
        lit("y").as("pf")), "load")
    // control stats: rows/NDV/min-max only
    CatalogStats.publish(spark, "cath_dim", dimDir, columns = Seq("v"))
    CatalogStats.publish(spark, "cath_fact", factDir)
    // threshold between the LOGICAL estimates the planner will compare:
    // uniform-span leaves the filtered dim at ~full logical size, the
    // histogram shrinks it ~16x — a quarter of full leaves 4x margin
    // on both sides (manifest parquet bytes are compressed and ~20x
    // smaller than the logical row-size estimate; they are the wrong
    // unit for this threshold)
    val threshold = {
      val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try spark.table("cath_dim").queryExecution
        .optimizedPlan.stats.sizeInBytes.toLong / 4
      finally spark.conf.set("spark.sql.cbo.enabled", prev)
    }
    def q(): DataFrame =
      spark.table("cath_fact")
        .join(spark.table("cath_dim").filter(col("v") > 10L),
          col("fk") === col("kd"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"), sum(col("vf")).as("s"))
    val prev = (spark.conf.get("spark.sql.cbo.enabled", "false"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val control = q()
      val controlRows = control.collect().toSeq.sortBy(_.getLong(0))
      assert(!hasBroadcast(control),
        "uniform-span estimate must keep the long-tail filter over the threshold")
      CatalogStats.publishHistogram(spark, "cath_dim", dimDir, "v")
      val planned = q()
      assert(hasBroadcast(planned),
        "histogram mass estimate must let vanilla CBO broadcast the filtered dim")
      assert(planned.collect().toSeq.sortBy(_.getLong(0)) == controlRows,
        "histogram changed the plan, never the answer")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._2)
      spark.sql("DROP TABLE IF EXISTS cath_dim")
      spark.sql("DROP TABLE IF EXISTS cath_fact")
    }
  }
}
