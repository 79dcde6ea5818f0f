package graft

import java.nio.file.Files
import graft.streaming.LakeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[LakeStream]] — streaming copy-on-write upsert: batches merge by
  * key, replays converge, untouched partitions stay untouched. */
class LakeStreamSpec extends SparkSpec {

  import spark.implicits._

  case class Rec(k: Long, p: String, v: Double)
  case class KV(k: Long, v: Long)
  import LakeStreamSpec.Ev

  test("streaming merges upsert into the partitioned table and converge on replay") {
    val dir = Files.createTempDirectory("graft-lakestream").toString
    val ckpt = Files.createTempDirectory("graft-lakestream-ckpt").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)

    val mem = MemoryStream[Rec](spark)
    val q = LakeStream.start(mem.toDF(), dir, "p", "k", ckpt)
    try {
      // batch 1: update k=2, insert k=3 into a NEW partition
      mem.addData(Rec(2L, "b", 99.0), Rec(3L, "c", 30.0))
      q.processAllAvailable()
      def table(): Seq[(Long, String, Double)] =
        graft.ops.CopyOnWrite.read(spark, dir)
          .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
          .collect().sortBy(_._1).toSeq
      assert(table() == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
      // batch 2 replays batch 1's rows (at-least-once) plus one new row:
      // the keyed merge absorbs the duplicates
      mem.addData(Rec(2L, "b", 99.0), Rec(3L, "c", 30.0), Rec(4L, "a", 40.0))
      q.processAllAvailable()
      assert(table() == Seq(
        (1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0), (4L, "a", 40.0)))

      // --- the manifest chain: one committed version per micro-batch,
      // each a complete consistent snapshot of its batch boundary
      import graft.ops.Manifest
      assert(Manifest.versions(spark, dir) == Seq(0, 1))
      def snapshot(v: Int): Seq[(Long, Double)] =
        spark.read.parquet(Manifest.read(spark, dir, v).map(_.path): _*)
          .select(col("k"), col("v")).as[(Long, Double)]
          .collect().sortBy(_._1).toSeq
      // v1 = current table state
      assert(snapshot(1) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
      // v0 = the state at batch 1's boundary — batch 2 later rewrote
      // partitions a/b/c, but archive mode + manifest pointer remap
      // keep the old snapshot fully readable (streaming time travel)
      assert(snapshot(0) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
      // a third batch extends the chain
      mem.addData(Rec(5L, "c", 50.0))
      q.processAllAvailable()
      assert(Manifest.versions(spark, dir) == Seq(0, 1, 2))
      assert(snapshot(2) == Seq(
        (1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
      assert(snapshot(0) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
    } finally q.stop()
  }

  test("streaming write-audit-publish: batches stage on a branch, main moves only on publish") {
    import graft.ops.Manifest
    val dir = Files.createTempDirectory("graft-wapstream").toString
    val ckpt = Files.createTempDirectory("graft-wapstream-ckpt").toString
    // base table + refs: main serves, staging takes the stream
    spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    Manifest.createBranch(spark, dir, "main", Manifest.collectStats(
      spark, Manifest.dataFiles(spark, s"$dir/data"), "k"))
    Manifest.branchFrom(spark, dir, "staging", from = "main")

    def refCount(name: String): Long = spark.read
      .parquet(Manifest.readRef(spark, dir, name).map(_.path): _*).count()

    val mem = MemoryStream[KV](spark)
    val q = LakeStream.startStagedAppend(mem.toDF(), dir, "k", ckpt)
    try {
      mem.addData(KV(100L, 200L), KV(101L, 202L))
      q.processAllAvailable()
      mem.addData(KV(102L, 204L))
      q.processAllAvailable()
      // every batch advanced staging; main never moved
      assert(refCount("staging") == 103L)
      assert(refCount("main") == 100L)
      assert(Manifest.refHead(spark, dir, "staging").get._1 == 2)
      assert(Manifest.refHead(spark, dir, "main").get._1 == 0)

      // audit the staging read, then publish: one CAS pointer move
      // sharing the audited snapshot by name
      val audited = Manifest.refHead(spark, dir, "staging").get._2
      assert(spark.read
        .parquet(Manifest.readRef(spark, dir, "staging").map(_.path): _*)
        .filter(col("v") =!= col("k") * 2).count() == 0L)
      assert(Manifest.fastForward(spark, dir, "main", from = "staging").isRight)
      assert(refCount("main") == 103L)
      assert(Manifest.refHead(spark, dir, "main").get._2 == audited)
    } finally q.stop()
  }

  test("streaming summary maintenance: per-batch refresh ≡ flat rebuild, routes, replays") {
    import graft.ops.CopyOnWrite
    import graft.plans.SummaryRewrite
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("graft-sumstream").toString
    val ckpt = Files.createTempDirectory("graft-sumstream-ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // pre-stream history in the table: the first batch must BOOTSTRAP the
    // summary from the table, not just its own rows
    Seq(
      Ev(1L, "2024-01-01", ts("2024-01-01 08:10:00"), "view", 5.0, 100L),
      Ev(2L, "2024-01-01", ts("2024-01-01 09:20:00"), "click", 3.0, 101L),
      Ev(3L, "2024-01-02", ts("2024-01-02 10:00:00"), "view", 9.0, 100L))
      .toDF().write.mode("overwrite").partitionBy("day").parquet(dir)

    def rebuild(grain: String): Seq[String] = SummaryRewrite.withBypass {
      CopyOnWrite.read(spark, dir)
        .groupBy(date_trunc(grain, col("ts")).as(grain), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast(DecimalType(28, 2)).as("sum_value_dec"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .collect().map(_.toString).sorted.toSeq
    }
    def latestSummary(grain: String): String = {
      val g = new java.io.File(s"$dir/_summary/$grain")
      val vs = g.listFiles().map(_.getName).filter(_.startsWith("v"))
        .map(_.drop(1).toLong).sorted
      s"$dir/_summary/$grain/v${vs.last}"
    }
    // uhll is a binary sketch (toString is identity-hashed) — row
    // equality covers the exact partials; the sketch is asserted via
    // its estimate below
    def stored(grain: String): Seq[String] =
      spark.read.parquet(latestSummary(grain)).drop("uhll")
        .collect().map(_.toString).sorted.toSeq

    val mem = MemoryStream[Ev](spark)
    val q = LakeStream.startWithSummary(mem.toDF(), dir, "day", "event_id", ckpt)
    try {
      // batch 0: append-only into existing + new partitions (bootstrap)
      mem.addData(
        Ev(4L, "2024-01-02", ts("2024-01-02 10:30:00"), "click", 2.0, 102L),
        Ev(5L, "2024-01-03", ts("2024-01-03 11:00:00"), "view", 7.0, 100L))
      q.processAllAvailable()
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g),
        s"bootstrap summary != rebuild at grain $g"))

      // batch 1: UPSERT — event 1 changes value AND hour (retraction
      // path: its old and new buckets both need the scoped rebuild; the
      // old 08:00 hour bucket must drop to zero rows, not linger)
      mem.addData(
        Ev(1L, "2024-01-01", ts("2024-01-01 12:45:00"), "view", 50.0, 103L),
        Ev(6L, "2024-01-03", ts("2024-01-03 11:15:00"), "click", 4.0, 101L))
      q.processAllAvailable()
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g),
        s"post-upsert summary != rebuild at grain $g"))
      assert(!stored("hour").exists(_.contains("2024-01-01 08:")),
        "retracted hour bucket must disappear from the summary")

      // batch 2: plain append — merge-law path on top of the upsert
      mem.addData(Ev(7L, "2024-01-01", ts("2024-01-01 12:50:00"), "purchase", 1.0, 100L))
      q.processAllAvailable()
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g),
        s"post-append summary != rebuild at grain $g"))

      // summary versions pair with manifest versions (same batch ids),
      // and retention keeps exactly {previous, current}
      assert(graft.ops.Manifest.versions(spark, dir) == Seq(0, 1, 2))
      val kept = new java.io.File(s"$dir/_summary/day").listFiles()
        .map(_.getName).filter(_.startsWith("v")).sorted.toSeq
      assert(kept == Seq("v1", "v2"), s"retention kept $kept")

      // replay idempotence: re-running batch 2's refresh (at-least-once
      // delivery) is a no-op — the completed v2 short-circuits, even
      // with a decoy batch frame attached
      val before = stored("day")
      val decoy = Seq(Ev(99L, "2024-01-09", ts("2024-01-09 00:00:00"),
        "view", 1000.0, 999L)).toDF()
      LakeStream.refreshSummaries(spark, dir, decoy, None, 2L)
      assert(stored("day") == before, "replayed refresh must be a no-op")

      // the navigator serves raw-spelling aggregates over the TABLE from
      // the maintained summary — registered by the stream itself
      def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toString)
              case _ => Nil
            }
        }.flatten
      // the stream installs the rule on ITS (cloned) session; a reader
      // session opts in the usual way
      graft.functions.VecExprs.register(spark)
      // def, not val: a DataFrame memoizes its QueryExecution, so the
      // bypassed comparison below must build a FRESH frame
      def dash = CopyOnWrite.read(spark, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      val routedDf = dash
      val paths = scanPaths(routedDf)
      assert(paths.exists(_.contains("_summary/day/v")),
        s"dashboard aggregate did not route onto the streamed summary: $paths")
      val routed = routedDf.collect().map(_.toString).sorted
      val raw = SummaryRewrite.withBypass {
        dash.collect().map(_.toString).sorted
      }
      assert(routed.sameElements(raw), "routed answer drifted from raw")

      // the maintained HLL partial answers distinct-users at summary
      // cost: per-day estimate ≡ exact (sketch is in exact coupon mode
      // at this cardinality)
      val est = spark.read.parquet(latestSummary("day"))
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("uhll"))).as("est"))
      val exactU = CopyOnWrite.read(spark, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("n"))
      val mismatch = exactU.join(est, Seq("day"))
        .filter(col("est") =!= col("n")).count()
      assert(mismatch == 0L, "summary sketch distinct != exact distinct")
    } finally {
      q.stop()
      SummaryRewrite.deregister(dir)
    }
  }
  test("torn two-commit window: death between manifest CAS and summary refresh heals on replay") {
    import graft.ops.{CopyOnWrite, Manifest}
    import graft.plans.SummaryRewrite
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("graft-torn").toString
    val ckpt = Files.createTempDirectory("graft-torn-ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      Ev(1L, "2024-01-01", ts("2024-01-01 08:10:00"), "view", 5.0, 100L),
      Ev(2L, "2024-01-01", ts("2024-01-01 09:20:00"), "click", 3.0, 101L))
      .toDF().write.mode("overwrite").partitionBy("day").parquet(dir)

    def rebuild(grain: String): Seq[String] = SummaryRewrite.withBypass {
      CopyOnWrite.read(spark, dir)
        .groupBy(date_trunc(grain, col("ts")).as(grain), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast(DecimalType(28, 2)).as("sum_value_dec"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .collect().map(_.toString).sorted.toSeq
    }
    def stored(grain: String): Seq[String] = {
      val g = new java.io.File(s"$dir/_summary/$grain")
      val vs = g.listFiles().map(_.getName).filter(_.startsWith("v"))
        .map(_.drop(1).toLong).sorted
      spark.read.parquet(s"$dir/_summary/$grain/v${vs.last}").drop("uhll")
        .collect().map(_.toString).sorted.toSeq
    }
    def restartAndDrain(mem: MemoryStream[Ev]): Unit = {
      val q = LakeStream.startWithSummary(mem.toDF(), dir, "day", "event_id", ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    val mem = MemoryStream[Ev](spark)
    try {
      // batch 0: clean bootstrap
      mem.addData(Ev(3L, "2024-01-02", ts("2024-01-02 10:00:00"), "view", 9.0, 100L))
      restartAndDrain(mem)
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g)))

      // batch 1 — THE hard case: event 1 moves hour 08 → 12, so the
      // first attempt RETRACTS the 08:00 bucket. Die right after its
      // manifest CAS, before any summary write.
      LakeStream.afterManifestCommit = id =>
        if (id == 1L) throw new RuntimeException("injected: died in the torn window")
      mem.addData(Ev(1L, "2024-01-01", ts("2024-01-01 12:45:00"), "view", 50.0, 103L))
      val q1 = LakeStream.startWithSummary(mem.toDF(), dir, "day", "event_id", ckpt)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
      } finally {
        q1.stop()
        LakeStream.afterManifestCommit = _ => ()
      }
      // torn state is REAL: data committed past v0, summary still at v0
      assert(Manifest.currentVersion(spark, dir) >= 1)
      assert(!new java.io.File(s"$dir/_summary/hour/v1/_SUCCESS").exists(),
        "summary must not have committed v1 before the injected death")

      // restart from the same checkpoint: batch 1 replays and heals —
      // including the retraction the replay's own archive set no longer
      // witnesses (it comes from attempt 1's archive dirs)
      restartAndDrain(mem)
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g),
        s"post-recovery summary != rebuild at grain $g"))
      assert(!stored("hour").exists(_.contains("2024-01-01 08:")),
        "bucket retracted by the crashed attempt must not linger")

      // batch 2 — death BETWEEN grains: day's v2 lands, hour's never
      // starts; event 2 moves hour 09 → 13 so the hour grain has a
      // retraction pending at restart
      LakeStream.afterGrainRefresh = (grain, id) =>
        if (grain == "day" && id == 2L)
          throw new RuntimeException("injected: died between grains")
      mem.addData(Ev(2L, "2024-01-01", ts("2024-01-01 13:05:00"), "click", 30.0, 104L))
      val q2 = LakeStream.startWithSummary(mem.toDF(), dir, "day", "event_id", ckpt)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
      } finally {
        q2.stop()
        LakeStream.afterGrainRefresh = (_, _) => ()
      }
      assert(new java.io.File(s"$dir/_summary/day/v2/_SUCCESS").exists(),
        "day grain committed before the injected death")
      assert(!new java.io.File(s"$dir/_summary/hour/v2/_SUCCESS").exists())

      restartAndDrain(mem)
      Seq("day", "hour").foreach(g => assert(stored(g) == rebuild(g),
        s"post-between-grains recovery != rebuild at grain $g"))
      assert(!stored("hour").exists(_.contains("2024-01-01 09:")),
        "hour bucket retracted across the tear must not linger")

      // at-least-once left no duplicate keys in the table itself
      val keys = CopyOnWrite.read(spark, dir).groupBy(col("event_id"))
        .count().filter(col("count") > 1).count()
      assert(keys == 0L, "replayed merges must not duplicate rows")
      // manifest chain stayed monotone (replays may add content-equal
      // versions — at-least-once — but never lose or reorder one)
      val vs = Manifest.versions(spark, dir)
      assert(vs == vs.sorted && vs.distinct == vs, s"versions: $vs")
    } finally {
      LakeStream.afterManifestCommit = _ => ()
      LakeStream.afterGrainRefresh = (_, _) => ()
      SummaryRewrite.deregister(dir)
    }
  }
}

object LakeStreamSpec {
  /** Top-level so Spark can build an Encoder without an outer scope. */
  case class Ev(event_id: Long, day: String, ts: java.sql.Timestamp,
      event_type: String, value: Double, user_id: Long)
}
