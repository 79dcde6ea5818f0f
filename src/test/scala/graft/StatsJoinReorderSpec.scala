package graft

import java.nio.file.Files

import graft.ops.ManifestLake
import graft.plans.{StatsBroadcast, StatsJoinReorder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._

/** [[graft.plans.StatsJoinReorder]] — manifest rows + NDV sketches
  * deciding JOIN ORDER. The gate (`lake_cbo_reorder`) proves bit-parity
  * with the oracle; this spec pins the decision itself: on a
  * deliberately worst-first (fact ⋈ fact) ⋈ dim input the innermost
  * join after optimization is fact⋈DIM (the order CHANGED), results are
  * bit-equal either way, and every refusal path refuses (disabled flag,
  * unregistered side, explicit user hint, outer join). */
class StatsJoinReorderSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.VecExprs.register(spark)

  private def mkLake(df: DataFrame, part: String, key: String): String = {
    val dir = Files.createTempDirectory("graft-reorder").toString
    ManifestLake.appendCommit(spark, dir, part, key, df, "load")
    dir
  }

  // fact A: 1000 rows, join key j (ndv 100), dim key t (ndv 5)
  private lazy val aDir = mkLake(
    spark.range(1000).select(col("id").as("ka"), (col("id") % 100).as("j"),
      (col("id") % 5).as("t"), (col("id") * 3).as("va"),
      lit("x").as("pa")), "pa", "ka")
  // fact B: 800 rows, join key j
  private lazy val bDir = mkLake(
    spark.range(800).select(col("id").as("kb"), (col("id") % 100).as("jb"),
      (col("id") * 7).as("vb"), lit("y").as("pb")), "pb", "kb")
  // dim D: 5 rows on t
  private lazy val dDir = mkLake(
    spark.range(5).select(col("id").as("td"), concat(lit("type_"),
      col("id")).as("tname"), lit("z").as("pd")), "pd", "td")

  private def registerAll(): Unit = {
    StatsBroadcast.register(spark, aDir)
    StatsBroadcast.register(spark, bDir)
    StatsBroadcast.register(spark, dDir)
    StatsJoinReorder.registerNdv(spark, aDir, "j")
    StatsJoinReorder.registerNdv(spark, aDir, "t")
    StatsJoinReorder.registerNdv(spark, bDir, "jb")
    StatsJoinReorder.registerNdv(spark, dDir, "td")
  }

  private def cleanup(): Unit = { StatsBroadcast.clear(); StatsJoinReorder.clear() }

  /** worst-first: (A ⋈ B on j) ⋈ D on t — the dim join should move first */
  private def badOrdered(joinType: String = "inner",
      hintDim: Boolean = false): DataFrame = {
    val a = ManifestLake.read(spark, aDir)
    val b = ManifestLake.read(spark, bDir)
    val d0 = ManifestLake.read(spark, dDir)
    val d = if (hintDim) d0.hint("merge") else d0
    a.join(b, col("j") === col("jb"), joinType)
      .join(d, col("t") === col("td"))
      .groupBy(col("tname"))
      .agg(count(lit(1)).as("n"), sum(col("va") + col("vb")).as("s"))
      .orderBy(col("tname"))
  }

  /** Root dirs scanned under the INNERMOST join of the optimized plan. */
  private def innermostJoinDirsOf(df: DataFrame,
      dirs: Seq[String]): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val innermost = joins.filter(j => j.children.forall(c =>
      c.collect { case x: Join => x }.isEmpty))
    innermost.flatMap(_.collectLeaves()).collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(_.toUri.getPath).toSeq
        case _ => Seq.empty
      }
    }.flatten.flatMap(p => dirs.filter(d =>
      p.startsWith(new org.apache.hadoop.fs.Path(d).toUri.getPath))).toSet
  }

  private def innermostJoinDirs(df: DataFrame): Set[String] =
    innermostJoinDirsOf(df, Seq(aDir, bDir, dDir))

  test("stats re-order a worst-first star: dim join moves innermost; bit-parity") {
    cleanup()
    val before = badOrdered()
    val beforeDirs = innermostJoinDirs(before)
    assert(beforeDirs == Set(aDir, bDir),
      s"unregistered: written order must survive, got $beforeDirs")
    val rows = before.collect().toSeq
    registerAll()
    try {
      val after = badOrdered()
      val afterDirs = innermostJoinDirs(after)
      assert(afterDirs == Set(aDir, dDir),
        s"expected the dim join innermost after reorder, got $afterDirs")
      assert(after.collect().toSeq == rows, "reorder changed the answer")
    } finally cleanup()
  }

  test("bit-parity net: reorder changes no answer across join shapes") {
    cleanup()
    // a 4th table joined on a second A key, with DUPLICATE join keys on
    // both sides of the j-join (multiplicities must survive reordering)
    val dDir = mkLake(
      spark.range(40).select(col("id").as("kd"), (col("id") % 5).as("td"),
        concat(lit("u"), col("id") % 7).as("uname"), lit("w").as("pd2")),
      "pd2", "kd")
    val shapes: Seq[() => DataFrame] = {
      def a = ManifestLake.read(spark, aDir)
      def b = ManifestLake.read(spark, bDir)
      def d0 = ManifestLake.read(spark, this.dDir)
      def d4 = ManifestLake.read(spark, dDir)
        .select(col("td").as("td4"), col("uname"))
      Seq(
        // worst-first star
        () => a.join(b, col("j") === col("jb"))
          .join(d0, col("t") === col("td"))
          .groupBy(col("tname")).agg(sum(col("va") + col("vb")).as("s")),
        // already-good order — the rule must be a no-op that still answers
        () => a.join(d0, col("t") === col("td"))
          .join(b, col("j") === col("jb"))
          .groupBy(col("tname")).agg(count(lit(1)).as("n")),
        // 4-table chain with a DUPLICATING dim (8 rows per td4 value)
        () => a.join(b, col("j") === col("jb"))
          .join(d0, col("t") === col("td"))
          .join(d4, col("t") === col("td4"))
          .groupBy(col("tname"), col("uname"))
          .agg(count(lit(1)).as("n"), sum(col("va")).as("s")),
        // filters above and between the joins
        () => a.filter(col("va") > 30)
          .join(b, col("j") === col("jb"))
          .join(d0, col("t") === col("td"))
          .filter(col("tname") =!= "type_0")
          .groupBy(col("tname")).agg(count(lit(1)).as("n")),
        // non-equi conjunct riding the equi key
        () => a.join(b, col("j") === col("jb") && col("va") < col("vb"))
          .join(d0, col("t") === col("td"))
          .groupBy(col("tname")).agg(count(lit(1)).as("n")))
    }
    val plain = shapes.map(s => s().collect().map(_.toString).sorted.toSeq)
    registerAll()
    StatsBroadcast.register(spark, dDir)
    StatsJoinReorder.registerNdv(spark, dDir, "td")
    try {
      shapes.zip(plain).zipWithIndex.foreach { case ((s, want), i) =>
        val got = s().collect().map(_.toString).sorted.toSeq
        assert(got == want, s"shape $i diverged under reordering")
      }
    } finally cleanup()
  }

  test("filter selectivity: the 1%-filtered fact joins before the written dim join") {
    cleanup()
    // mid-size dim M (100 rows) on the j key domain: FK-PK with B, so
    // est(B⋈M) = |B| = 800. Fact A filtered to ka ≤ 9 — 1% of its
    // manifest span [0, 999] — so with the span registered
    // est(A_filt⋈B) = (1000·0.01)·800/ndv(j)=100 → 80 < 800 and the
    // filtered fact moves innermost; ndv-only costs A at its full
    // 1000-row bound (est 8000) and the written dim-first order wins.
    val mDir = mkLake(
      spark.range(100).select(col("id").as("jm"),
        concat(lit("m"), col("id")).as("mname"), lit("q").as("pm")),
      "pm", "jm")
    def q(): DataFrame = {
      val a = ManifestLake.read(spark, aDir).filter(col("ka") <= 9)
      val b = ManifestLake.read(spark, bDir)
      val m = ManifestLake.read(spark, mDir)
      b.join(m, col("jb") === col("jm"))
        .join(a, col("j") === col("jb"))
        .groupBy(col("mname"))
        .agg(count(lit(1)).as("n"), sum(col("va")).as("s"))
        .orderBy(col("mname"))
    }
    val dirs = Seq(aDir, bDir, mDir)
    val rows = q().collect().toSeq
    registerAll()
    StatsBroadcast.register(spark, mDir)
    StatsJoinReorder.registerNdv(spark, mDir, "jm")
    try {
      // ndv-only: the filtered fact is still costed at its full row
      // bound — the written order survives (this was VERDICT r9 #3)
      assert(innermostJoinDirsOf(q(), dirs) == Set(bDir, mDir),
        "ndv-only estimate should keep the written order")
      // the manifest span of the filter column flips the decision
      val span = StatsJoinReorder.registerSpan(spark, aDir, "ka")
      assert(span == (0L, 999L), s"footer span harvested wrong: $span")
      assert(innermostJoinDirsOf(q(), dirs) == Set(aDir, bDir),
        "span-scaled estimate must join the filtered fact first")
      assert(q().collect().toSeq == rows,
        "selectivity reorder changed the answer")
      // IN-list selectivity rides the NDV instead of the span: 2 of j's
      // 100 distinct values ⇒ 2% — the same flip without any span
      def qIn(): DataFrame = {
        val a = ManifestLake.read(spark, aDir)
          .filter(col("j").isin(3L, 7L))
        val b = ManifestLake.read(spark, bDir)
        val m = ManifestLake.read(spark, mDir)
        b.join(m, col("jb") === col("jm"))
          .join(a, col("j") === col("jb"))
          .groupBy(col("mname"))
          .agg(count(lit(1)).as("n"), sum(col("va")).as("s"))
          .orderBy(col("mname"))
      }
      val rowsIn = {
        spark.conf.set("graft.statsjoinreorder.enabled", "false")
        try qIn().collect().toSeq
        finally spark.conf.unset("graft.statsjoinreorder.enabled")
      }
      assert(innermostJoinDirsOf(qIn(), dirs) == Set(aDir, bDir),
        "IN-list ndv estimate must join the filtered fact first")
      assert(qIn().collect().toSeq == rowsIn,
        "IN-list selectivity reorder changed the answer")
    } finally cleanup()
  }

  test("histogram selectivity: skewed range predicate flips the order the uniform span gets wrong") {
    cleanup()
    // skewed fact S: 950 rows with ks ∈ [0,99], 50 rows in a
    // [100000, 982000] tail — span [0, 982000]. Predicate ks ≥ 100000
    // keeps 5%; the uniform-span model says it keeps ~90% (est ≈ 898),
    // so est(S⋈B) ≈ 8·898 > est(B⋈M) = 800 and the WRITTEN dim-first
    // order wrongly survives; the equi-depth histogram interpolates the
    // real 5% (est 50 → est(S⋈B) = 400 < 800) and flips the filtered
    // fact innermost.
    val sDir = mkLake(
      spark.range(1000).select(col("id").as("ks_pk"),
        (col("id") % 100).as("js"),
        when(col("id") < 950, col("id") % 100)
          .otherwise(lit(100000L) + (col("id") - 950) * 18000L).as("ks"),
        (col("id") * 3).as("vs"), lit("s").as("ps")), "ps", "ks_pk")
    val mDir = mkLake(
      spark.range(100).select(col("id").as("jm"),
        concat(lit("m"), col("id")).as("mname"), lit("q").as("pm")),
      "pm", "jm")
    def q(): DataFrame = {
      val s = ManifestLake.read(spark, sDir).filter(col("ks") >= 100000L)
      val b = ManifestLake.read(spark, bDir)
      val m = ManifestLake.read(spark, mDir)
      b.join(m, col("jb") === col("jm"))
        .join(s, col("js") === col("jb"))
        .groupBy(col("mname"))
        .agg(count(lit(1)).as("n"), sum(col("vs")).as("s"))
        .orderBy(col("mname"))
    }
    val dirs = Seq(sDir, bDir, mDir)
    val rows = q().collect().toSeq
    StatsBroadcast.register(spark, sDir)
    StatsBroadcast.register(spark, bDir)
    StatsBroadcast.register(spark, mDir)
    StatsJoinReorder.registerNdv(spark, sDir, "js")
    StatsJoinReorder.registerNdv(spark, bDir, "jb")
    StatsJoinReorder.registerNdv(spark, mDir, "jm")
    try {
      // span registered: the uniform model KEEPS the written order —
      // this is the wrong call the histogram exists to correct
      StatsJoinReorder.registerSpan(spark, sDir, "ks")
      assert(innermostJoinDirsOf(q(), dirs) == Set(bDir, mDir),
        "uniform span must (wrongly) keep the written order on the skew")
      // histogram registered: real mass flips the filtered fact first
      StatsJoinReorder.registerHistogram(spark, sDir, "ks")
      assert(innermostJoinDirsOf(q(), dirs) == Set(sDir, bDir),
        "histogram mass must join the tail-filtered fact first")
      assert(q().collect().toSeq == rows,
        "histogram reorder changed the answer")
    } finally cleanup()
  }

  test("hot-key equality: observed share stops the 1/ndv mis-flip") {
    cleanup()
    // hot fact H: 70% of rows carry hot_key = 7; EqualTo(hot_key, 7)
    // keeps 700 rows. The 1/ndv model estimates ~1000/44 ≈ 23 rows —
    // wrongly moving the barely-filtered fact innermost; the hot-key
    // share (0.7 → est 700, est(H⋈B) = 5600 > 800) keeps the written
    // dim-first order, which is the right plan.
    val hDir = mkLake(
      spark.range(1000).select(col("id").as("kh"),
        (col("id") % 100).as("jh"),
        when(col("id") % 10 < 7, lit(7L)).otherwise(col("id") % 50)
          .as("hot_key"),
        (col("id") * 5).as("vh"), lit("h").as("ph")), "ph", "kh")
    val mDir = mkLake(
      spark.range(100).select(col("id").as("jm"),
        concat(lit("m"), col("id")).as("mname"), lit("q").as("pm")),
      "pm", "jm")
    def q(): DataFrame = {
      val h = ManifestLake.read(spark, hDir).filter(col("hot_key") === 7L)
      val b = ManifestLake.read(spark, bDir)
      val m = ManifestLake.read(spark, mDir)
      b.join(m, col("jb") === col("jm"))
        .join(h, col("jh") === col("jb"))
        .groupBy(col("mname"))
        .agg(count(lit(1)).as("n"), sum(col("vh")).as("s"))
        .orderBy(col("mname"))
    }
    val dirs = Seq(hDir, bDir, mDir)
    val rows = q().collect().toSeq
    StatsBroadcast.register(spark, hDir)
    StatsBroadcast.register(spark, bDir)
    StatsBroadcast.register(spark, mDir)
    StatsJoinReorder.registerNdv(spark, hDir, "jh")
    StatsJoinReorder.registerNdv(spark, hDir, "hot_key")
    StatsJoinReorder.registerNdv(spark, bDir, "jb")
    StatsJoinReorder.registerNdv(spark, mDir, "jm")
    try {
      // ndv-only: uniform equality estimate mis-routes the hot-filtered
      // fact innermost
      assert(innermostJoinDirsOf(q(), dirs) == Set(hDir, bDir),
        "1/ndv must (wrongly) move the hot-filtered fact first")
      // hot shares registered: the observed 70% share restores the
      // written order
      val shares = StatsJoinReorder.registerHotShares(spark, hDir, "hot_key")
      assert(shares.contains(7L) && shares(7L) > 0.6,
        s"hot key 7 must register with its real share, got $shares")
      assert(innermostJoinDirsOf(q(), dirs) == Set(bDir, mDir),
        "hot-key share must keep the written order")
      assert(q().collect().toSeq == rows,
        "hot-share estimate changed the answer")
    } finally cleanup()
  }

  test("refusals: disabled flag, unregistered side, user hint, outer join") {
    cleanup()
    registerAll()
    try {
      // disabled flag
      spark.conf.set("graft.statsjoinreorder.enabled", "false")
      try assert(innermostJoinDirs(badOrdered()) == Set(aDir, bDir))
      finally spark.conf.unset("graft.statsjoinreorder.enabled")
      // user hint on the dim side: explicit strategy is never moved
      assert(innermostJoinDirs(badOrdered(hintDim = true)) == Set(aDir, bDir))
      // outer join in the chain: not freely reorderable, flatten stops
      assert(innermostJoinDirs(badOrdered(joinType = "left")) == Set(aDir, bDir))
      // a side the stats can't see refuses the whole chain
      StatsBroadcast.unregister(bDir)
      assert(innermostJoinDirs(badOrdered()) == Set(aDir, bDir))
    } finally cleanup()
  }
}
