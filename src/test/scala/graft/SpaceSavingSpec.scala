package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.SpaceSavingTopK]] — the textbook SpaceSaving
  * guarantees, checked across partitionings (every repartition is a
  * different partial/merge tree, so these pins cover the mergeable-
  * summaries compensation too). */
class SpaceSavingSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(data: Seq[String], parts: Int,
      cap: Int): Map[String, (Long, Long)] = {
    graft.functions.VecExprs.register(spark)
    spark.sparkContext.parallelize(data, parts).toDF("k")
      .agg(expr(s"space_saving(k, $cap)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"), col("e.err"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("under capacity: exact, deterministic, zero error at any partitioning") {
    val data = (0 until 1100).map(i => s"v${i % 7}")
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 4, 13).foreach { parts =>
      val out = sketch(data, parts, cap = 16)
      assert(out.values.forall(_._2 == 0L), s"err != 0 at parts=$parts")
      assert(out.view.mapValues(_._1).toMap == exact,
        s"not exact at parts=$parts")
    }
  }

  test("over capacity: heavy hitters always reported, bounds always valid") {
    val rnd = new scala.util.Random(42)
    // half the stream on 5 hot keys, half spread over 400 cold keys —
    // well past the 64-counter capacity, so eviction and merge
    // compensation both run
    val data = Seq.fill(20000) {
      if (rnd.nextBoolean()) s"hot${rnd.nextInt(5)}"
      else s"cold${rnd.nextInt(400)}"
    }
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 64
    val n = data.size.toLong
    Seq(1, 3, 8).foreach { parts =>
      val out = sketch(data, parts, cap)
      assert(out.size <= cap)
      // guarantee: frequency > N/capacity ⇒ present
      exact.filter(_._2 * cap > n).keys.foreach(k =>
        assert(out.contains(k), s"heavy $k missing at parts=$parts"))
      // bounds: count − err ≤ true ≤ count for EVERY reported value
      out.foreach { case (k, (cnt, err)) =>
        val t = exact.getOrElse(k, 0L)
        assert(cnt - err <= t && t <= cnt,
          s"bounds broken for $k at parts=$parts: cnt=$cnt err=$err true=$t")
      }
    }
  }

  test("merge compensation: single-occurrence flood cannot fake a heavy hitter's absence") {
    // adversarial shape for the merge: each partition ends with distinct
    // singletons that force evictions right before the partial is merged
    val hot = Seq.fill(5000)("hot")
    val noise = (0 until 15000).map(i => s"one$i")
    val data = new scala.util.Random(7).shuffle(hot ++ noise)
    Seq(2, 6).foreach { parts =>
      val out = sketch(data, parts, cap = 32)
      assert(out.contains("hot"), s"hot lost at parts=$parts")
      val (cnt, err) = out("hot")
      assert(cnt - err <= 5000L && 5000L <= cnt,
        s"hot bounds broken at parts=$parts: cnt=$cnt err=$err")
    }
  }
}
