package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** dedup_semantic_incremental — the tick-rule contract on constructed
  * geometry (base = vec_id % 10 ≠ 3, delta ≡ 3):
  *
  *  - rule 1 (first-writer-wins vs corpus): delta 13 ≡ base direction
  *    e0 {1,2}            → rejected, dup_of = 1 (min matching base id)
  *  - rule 2 (min id within batch): delta 23 ≡ 33 ≡ e2, no base nearby
  *                        → 23 survives, 33 dup_of 23
  *  - mediation (the DedupStream rule-2 stance): delta 43 at 55° from
  *    base 4 (cos .574 ≥ .45 → rejected) and delta 53 at 55° from 43
  *    but 71° from base 4 (cos .329 < .45). The (43,53) verified edge
  *    EXISTS (asserted against [[queries.Similarity.semIncVerifiedEdges]],
  *    so the case can't pass vacuously) yet 43's rejection removes it
  *    from the batch graph — 53 is accepted, not chained out.
  *  - singleton: delta 3 on its own axis → accepted, dup_of = itself.
  *
  * Geometry makes the cell assignments safe by construction: each test
  * direction's highest-cosine centroid dominates every alternative
  * (~0 elsewhere), so near pairs always share their probed cell.
  */
class SemanticIncrementalSpec extends SparkSpec {

  private def axis(i: Int, scale: Double = 1.0): Array[Float] = {
    val v = Array.fill(64)(0.0f); v(i) = scale.toFloat; v
  }
  private def mix(a: Int, ca: Double, b: Int, cb: Double): Array[Float] = {
    val v = Array.fill(64)(0.0f); v(a) = ca.toFloat; v(b) = cb.toFloat; v
  }
  private def mix3(a: Int, ca: Double, b: Int, cb: Double,
      c: Int, cc: Double): Array[Float] = {
    val v = Array.fill(64)(0.0f)
    v(a) = ca.toFloat; v(b) = cb.toFloat; v(c) = cc.toFloat; v
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("seminc").toString
    import spark.implicits._
    val c55 = math.cos(math.toRadians(55)) // .574
    val s55 = math.sin(math.toRadians(55)) // .819
    val rows = (0L to 59L).flatMap { id =>
      if (id % 10 == 3) None // delta rows added explicitly below
      else if (id == 1 || id == 2) Some((id, axis(0)))      // cluster A
      else if (id == 4) Some((id, axis(1)))                 // chain base
      else if (id % 2 == 0) Some((id, axis(4)))             // filler
      else Some((id, axis(5)))                              // filler
    } ++ Seq(
      (3L, axis(7)),                                        // singleton
      (13L, axis(0)),                                       // ≡ cluster A
      (23L, axis(2)), (33L, axis(2)),                       // batch pair
      (43L, mix(1, c55, 3, s55)),                           // 55° from e1
      (53L, mix3(1, c55 * c55, 3, c55 * s55, 6, s55)))      // 55° from 43
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val out =
    queries.Similarity.dedupSemanticIncremental(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap

  test("rule 1: delta matching the corpus is rejected with min base id") {
    assert(out(13L) === ((0, 1L)))
  }

  test("rule 2: min id survives its within-batch component") {
    assert(out(23L) === ((1, 23L)))
    assert(out(33L) === ((0, 23L)))
  }

  test("chain: 43 rejected vs base, 53 below the base threshold") {
    assert(out(43L) === ((0, 4L)))
    assert(out(53L) === ((1, 53L)))
  }

  test("a corpus-rejected doc's batch edge exists but does not mediate") {
    // non-vacuity: the (43,53) verified edge is real — 53 stays accepted
    // only because rule 2 excludes corpus-rejected docs from the graph
    val edges = queries.Similarity.semIncVerifiedEdges(spark, dir)
      .select(least(col("query_id"), col("nb_id")),
        greatest(col("query_id"), col("nb_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((43L, 53L)))
    assert(edges.contains((4L, 43L)))
    assert(out(53L) === ((1, 53L)))
  }

  test("delta singleton mints itself; output covers exactly the delta") {
    assert(out(3L) === ((1, 3L)))
    assert(out.keySet === Set(3L, 13L, 23L, 33L, 43L, 53L))
  }
}
