package graft

import java.nio.file.Files

import graft.ops.ManifestLake
import graft.plans.StatsBroadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.StatsBroadcast]] — manifest row accounting consumed by
  * the planner. The gate (`lake_cbo_broadcast`) proves the hinted plan
  * is semantics-preserving against the oracle; this spec pins the
  * decision itself under a -1 size threshold (so Spark's own byte
  * estimator can never broadcast): registered manifest stats flip the
  * join to BroadcastHashJoin, an empty registry leaves SortMergeJoin,
  * and every refusal path refuses (file unknown to the registry,
  * row-multiplying subtree, bound over the cap, explicit user hint). */
class StatsBroadcastSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.VecExprs.register(spark)

  /** Lake table of `n` rows with a MOR delete leaving `live` rows. */
  private def mkTable(n: Int, deleteMod: Int = 0): String = {
    val dir = Files.createTempDirectory("graft-cbo").toString
    val rows = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      i * 1.5)).toDF("k", "p", "v")
    ManifestLake.appendCommit(spark, dir, "p", "k", rows, "load")
    if (deleteMod > 0)
      ManifestLake.deleteWhere(spark, dir, col("k") % deleteMod =!= 0, "dv")
    dir
  }

  /** Big probe side — NOT a lake table, so it never gets a bound. */
  private def probe(n: Int): DataFrame =
    spark.range(n).select((col("id") % 97).as("k2"),
      (col("id") * 7).as("w"))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Run `body` with size-based broadcast disabled, restore after. */
  private def noSizeBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prior)
  }

  private def joined(dir: String): DataFrame =
    probe(5000).join(ManifestLake.read(spark, dir), col("k2") === col("k"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .orderBy(col("p"))

  test("registered manifest stats flip SMJ to broadcast; answers equal") {
    val dir = mkTable(200, deleteMod = 5)
    noSizeBroadcast {
      StatsBroadcast.clear()
      val cold = joined(dir)
      val coldPlan = planOf(cold)
      assert(coldPlan.contains("SortMergeJoin"),
        s"expected SMJ with no stats, got:\n$coldPlan")
      val coldRows = cold.collect().toSeq
      val total = StatsBroadcast.register(spark, dir)
      try {
        // registered rows = data rows + delete-vector entries
        assert(total == 200 + 160, s"registered $total")
        val hot = joined(dir)
        val hotPlan = planOf(hot)
        assert(hotPlan.contains("BroadcastHashJoin"),
          s"expected broadcast from manifest stats, got:\n$hotPlan")
        assert(hot.collect().toSeq == coldRows)
      } finally StatsBroadcast.clear()
    }
  }

  test("manifest-pruned readWhere (file subset) still bounds and fires") {
    val dir = mkTable(200)
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      try {
        val df = probe(5000).join(
          ManifestLake.readWhere(spark, dir, 0L, 49L)
            .filter(col("k") <= 49), col("k2") === col("k"))
          .groupBy(col("p")).agg(count(lit(1)).as("n")).orderBy(col("p"))
        assert(planOf(df).contains("BroadcastHashJoin"))
      } finally StatsBroadcast.clear()
    }
  }

  test("bound over the cap refuses") {
    val dir = mkTable(200)
    val key = "graft.statsbroadcast.maxRows"
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      spark.conf.set(key, "100")
      try {
        val p = planOf(joined(dir))
        assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          s"200-row bound must refuse a 100-row cap:\n$p")
      } finally { spark.conf.unset(key); StatsBroadcast.clear() }
    }
  }

  test("files the registry has never seen refuse (post-register compaction)") {
    val dir = Files.createTempDirectory("graft-cbo").toString
    (0 until 4).foreach { i =>
      ManifestLake.appendCommit(spark, dir, "p", "k",
        Seq((i.toLong, "a", 1.0)).toDF("k", "p", "v"), s"c$i")
    }
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      try {
        // compaction rewrites paths AFTER registration: stale stats
        // must refuse, not guess
        ManifestLake.compactSmall(spark, dir, "k", 1L << 30, "opt")
        val p = planOf(joined(dir))
        assert(!p.contains("BroadcastHashJoin"),
          s"stale registration must not hint:\n$p")
      } finally StatsBroadcast.clear()
    }
  }

  test("row-multiplying subtree (lake-lake inner join) refuses") {
    val dir = mkTable(50)
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      try {
        val a = ManifestLake.read(spark, dir).select(col("k"), col("p"))
        val b = ManifestLake.read(spark, dir)
          .select(col("k").as("k3"), col("v"))
        val inner = a.join(b, col("k") === col("k3")) // bounded leaves, but
        val df = probe(5000).join(inner, col("k2") === col("k"))
          .groupBy(col("p")).agg(count(lit(1)).as("n"))
        val plan = planOf(df)
        // the INNER subtree joins two registered sides — each is itself
        // bounded (50 ≤ cap) so the inner join MAY broadcast one of its
        // own sides; but the probe⋈inner join must NOT broadcast the
        // inner side (its bound is void: inner joins multiply)
        val smjTop = plan.contains("SortMergeJoin")
        assert(smjTop, s"probe join must stay SMJ over a multiplying subtree:\n$plan")
      } finally StatsBroadcast.clear()
    }
  }

  test("an explicit user hint wins") {
    val dir = mkTable(60)
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      try {
        val df = probe(5000).join(
          ManifestLake.read(spark, dir).hint("merge"),
          col("k2") === col("k"))
          .groupBy(col("p")).agg(count(lit(1)).as("n"))
        val p = planOf(df)
        assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          s"user merge hint must not be overridden:\n$p")
      } finally StatsBroadcast.clear()
    }
  }

  test("directory-level scan (files unregistered as a set) refuses") {
    val dir = mkTable(40)
    noSizeBroadcast {
      StatsBroadcast.register(spark, dir)
      try {
        // raw directory read sees parquet part files under graft_p=…
        // directories — paths exist in the registry only as exact data
        // files; the DIRECTORY rootPath does not, so no bound
        val raw = spark.read.parquet(s"$dir/data/load")
        val df = probe(5000).join(raw, col("k2") === col("k"))
          .groupBy(col("p")).agg(count(lit(1)).as("n"))
        val p = planOf(df)
        assert(!p.contains("BroadcastHashJoin"),
          s"directory scan must refuse:\n$p")
      } finally StatsBroadcast.clear()
    }
  }
}
