package graft

import org.apache.spark.sql.functions._

/** `ann_ivfpq_topk` (IVFADC) — pins the claims the DuckDB oracle can't
  * see: the candidate set really is cell-restricted (every returned
  * neighbor sits in one of the probe's nprobe=2 coarse cells), the
  * quantized ADC fold is sane (non-negative, order-independent ⇒
  * bit-stable across runs), and the serving plan broadcasts the tiny
  * ADC table instead of shuffling the encoded corpus. */
class IvfPqSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("neighbors come from at most nprobe cells; adist quantized non-negative") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("ann_ivfpq_topk")(spark, sf).collect()
    assert(rows.length == 30) // 10 probes x top-3
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length <= 2,
        s"query $q drew neighbors from more than nprobe=2 cells")
      assert(rs.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3))
    }
    assert(rows.forall(_.getDouble(3) >= 0.0), "squared ADC distance < 0")
  }

  test("ADC search is broadcast-driven: no shuffle of the encoded corpus for the probe join") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("ann_ivfpq_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"ADC table join is not broadcast: ${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("ann_knn_join: every vector gets top-3; wide vectors never sort-merged") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("ann_knn_join")(spark, sf)
    val rows = df.collect()
    val n = SparkEntry.queries("ann_cosine_topk")(spark, sf)
      .select("query_id").distinct().count() // probes exist ⇒ corpus nonempty
    assert(n > 0)
    // top-3 for EVERY corpus vector (500 at this SF), ranks complete
    assert(rows.length % 3 == 0)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3), s"query $q")
    }
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ShuffledHashJoin"),
      s"cell join should be shuffle-hash: ${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"wide vector payloads are being sort-merged: ${p.take(1500)}")
  }

  test("bit-stable across runs (exact int64 ADC fold)") {
    assume(new java.io.File(sf).isDirectory)
    val a = SparkEntry.queries("ann_ivfpq_topk")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("ann_ivfpq_topk")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
