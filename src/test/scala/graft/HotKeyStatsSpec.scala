package graft

import java.nio.file.Files

import graft.ops.{HotKeyStats, Manifest, ManifestLake, Skew}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[HotKeyStats]] (per-file SpaceSaving sidecars merged at metadata
  * grain) + [[Skew.splitSaltedJoin]] (the hot-list-driven skew join).
  * The gate (`lake_hotkey_salted`) proves the decision + salted join
  * against the DuckDB oracle in the exact (under-capacity) regime;
  * this spec pins the parts the oracle can't see: O(delta) sketch
  * reuse across commits, the eviction-path error bounds on a
  * high-cardinality key, the no-false-positive decision rule, and the
  * salted plan's shape + bit-equality with the plain join. */
class HotKeyStatsSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.VecExprs.register(spark)

  /** `n` rows: ~`share` of them on hot key "H", the rest unique keys. */
  private def skewed(n: Int, share: Double) =
    (0 until n).map { i =>
      val k = if (i % 100 < (share * 100).toInt) "H" else s"k$i"
      (i.toLong, if (i % 2 == 0) "a" else "b", k)
    }.toDF("id", "p", "k")

  test("O(delta): prior files' sketches reused verbatim across commits") {
    val dir = Files.createTempDirectory("graft-hot").toString
    ManifestLake.appendCommit(spark, dir, "p", "id", skewed(200, 0.4), "c0")
    val s0 = HotKeyStats.ensure(spark, dir, "k", 8, 0)
      .collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
    ManifestLake.appendCommit(spark, dir, "p", "id",
      skewed(100, 0.4).withColumn("id", col("id") + 1000), "c1")
    val s1 = HotKeyStats.ensure(spark, dir, "k", 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
    assert(s0.keySet.subsetOf(s1.keySet))
    // the old files' summaries ride into the new sidecar BY VALUE —
    // never recomputed (same rows either way, but reuse is the O(delta)
    // contract; the path-keyed copy is what makes ANALYZE incremental)
    s0.foreach { case (f, es) => assert(s1(f) == es, s"sketch for $f changed") }
    assert(s1.size > s0.size, "new commit's files must be sketched")
  }

  test("under capacity the merged summary is exact (err = 0)") {
    val dir = Files.createTempDirectory("graft-hot").toString
    val df = (0 until 300).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      s"k${i % 10}")).toDF("id", "p", "k")
    ManifestLake.appendCommit(spark, dir, "p", "id", df, "c0")
    val merged = HotKeyStats.mergedHot(spark, dir, "k", 64)
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.size == truth.size)
    merged.foreach { case (v, c, e) =>
      assert(e == 0L, s"$v err=$e in under-capacity regime")
      assert(c == truth(v), s"$v cnt=$c truth=${truth(v)}")
    }
  }

  test("eviction path keeps both SpaceSaving guarantees through the merge") {
    val dir = Files.createTempDirectory("graft-hot").toString
    val df = skewed(1000, 0.4) // ~400 rows on "H", 600 unique keys
    ManifestLake.appendCommit(spark, dir, "p", "id", df, "c0")
    val m = 8
    val merged = HotKeyStats.mergedHot(spark, dir, "k", m)
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    assert(merged.size <= m)
    // guarantee 1: freq > N/m must be reported
    truth.filter(_._2 > n / m).keys.foreach { v =>
      assert(merged.exists(_._1 == v), s"heavy $v missing from summary")
    }
    // guarantee 2: cnt − err ≤ true ≤ cnt for every reported value
    merged.foreach { case (v, c, e) =>
      val t = truth.getOrElse(v, 0L)
      assert(c - e <= t && t <= c, s"$v: bounds [${c - e}, $c] miss true $t")
    }
  }

  test("hotKeys has no false positives and finds the dominant key") {
    val dir = Files.createTempDirectory("graft-hot").toString
    val df = skewed(1000, 0.4)
    ManifestLake.appendCommit(spark, dir, "p", "id", df, "c0")
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val hot = HotKeyStats.hotKeys(spark, dir, "k", 8, 0.3)
    assert(hot == Seq("H"), s"expected exactly the dominant key, got $hot")
    // no false positive by construction: the lower bound cleared 0.3·N
    hot.foreach(v => assert(truth(v) >= (0.3 * n).toLong))
  }

  test("splitSaltedJoin ≡ plain inner join; salt only on the hot branch") {
    val left = (0 until 500).map { i =>
      val k: java.lang.Long = if (i % 3 == 0) null
        else if (i % 5 < 3) 7L else (i % 20).toLong
      (i.toLong, k)
    }.toDF("id", "k")
    val right = ((0 until 20).map(i => (i.toLong, s"g${i % 4}")) :+
      (7L, "hot")).toDF("k", "tag") // key 7 duplicated on the right
    val plain = left.join(right, Seq("k"), "inner")
      .orderBy("k", "id", "tag").collect().toSeq
    val salted = Skew.splitSaltedJoin(left, right, "k", Seq(7L), 4)
      .orderBy("k", "id", "tag").collect().toSeq
    assert(salted == plain)
    val empty = Skew.splitSaltedJoin(left, right, "k", Seq.empty, 4)
      .orderBy("k", "id", "tag").collect().toSeq
    assert(empty == plain)
    val df = Skew.splitSaltedJoin(left, right, "k", Seq(7L), 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("__graft_salt"), s"salt column missing:\n$plan")
    assert(plan.toLowerCase.contains("explode"),
      s"right-side replication missing:\n$plan")
  }
}
