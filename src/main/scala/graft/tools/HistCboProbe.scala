package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: does a histogram column stat change vanilla
  * FilterEstimation's row estimate for a long-tail range predicate? */
object HistCboProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.cbo.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dimDir = java.nio.file.Files.createTempDirectory("hist-probe-dim").toString
    graft.ops.ManifestLake.appendCommit(spark, dimDir, "pd", "kd",
      spark.range(40000).select(col("id").as("kd"),
        when(col("id") % 20 =!= 0, col("id") % 10)
          .otherwise(lit(11) + (col("id") * 37) % 99999).as("v"),
        sha2(col("id").cast("string"), 256).as("pad"),
        lit("x").as("pd")), "load")
    graft.ops.CatalogStats.publish(spark, "hp_dim", dimDir, columns = Seq("v"))
    def est(): Unit = {
      val f = spark.table("hp_dim").filter(col("v") > 10L)
      val st = f.queryExecution.optimizedPlan.stats
      println(s"EST rows=${st.rowCount} size=${st.sizeInBytes}")
      val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("hp_dim")).stats
      println(s"CATALOG colStats=${cs.map(_.colStats.view.mapValues(c =>
        (c.distinctCount, c.min, c.max, c.histogram.map(_.bins.take(4).toSeq))).toMap)}")
    }
    println("-- no histogram --"); est()
    graft.ops.CatalogStats.publishHistogram(spark, "hp_dim", dimDir, "v")
    println("-- with histogram --"); est()
    val factDir = java.nio.file.Files.createTempDirectory("hist-probe-fact").toString
    graft.ops.ManifestLake.appendCommit(spark, factDir, "pf", "kf",
      spark.range(80000).select(col("id").as("kf"),
        (col("id") % 40000).as("fk"), (col("id") * 3).as("vf"),
        lit("y").as("pf")), "load")
    val dimStats = graft.ops.CatalogStats.publish(spark, "hp_fact", factDir)
    val dimBytes = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("hp_dim"))
      .stats.get.sizeInBytes.toLong
    println(s"dim manifest bytes=$dimBytes threshold=${dimBytes / 5}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (dimBytes / 5).toString)
    val j = spark.table("hp_fact")
      .join(spark.table("hp_dim").filter(col("v") > 10L),
        col("fk") === col("kd"))
      .groupBy(col("v")).agg(count(lit(1)).as("n"), sum(col("vf")).as("s"))
    val ip = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    println("JOIN initialPlan:\n" + ip.toString.take(2500))
    spark.stop()
  }
}
