package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic Lloyd's k-means over cosine similarity — the coarse
  * quantizer trainer behind `ann_ivf_topk`. Every nondeterminism knob is
  * pinned so an EXTERNAL engine can replay training bit-exactly (the
  * DuckDB oracle re-derives the same centroids from the same parquet):
  *
  *  - init: the k lowest-id corpus vectors (a fixed "seed");
  *  - FIXED iteration count — no data-dependent convergence test;
  *  - assignment ties broken by lowest cent_id;
  *  - component means fold through exact DECIMAL(28,12) sums (order-
  *    independent) and divide as double — same two roundings both sides.
  *
  * Shape at scale (same driver-looped pattern as
  * [[Graph.connectedComponents]]): per round, assignment is a map-side
  * pass over the corpus against k broadcast centroids (N·k codegen'd
  * vec_dot calls, no shuffle), and the update is one posexplode +
  * (cell, component) hash aggregate — shuffle volume N·dim scalars,
  * partial-aggregated map-side. Centroid state is k·dim values — never
  * collected to the driver, and localCheckpointed ONCE after the final
  * round (the fixed, small iteration count keeps the whole training a
  * single chain DAG, so no per-round checkpoint is needed — see the
  * in-loop note). Cells that lose all members drop out (k shrinks) —
  * deterministic, and the oracle mirrors it.
  *
  * @param e     corpus: (vec_id, v: array<double>, nrm) — vec_dot must
  *              be registered on the session (VecExprs.register)
  * @param k     cell count (init takes vec_id < k)
  * @param iters Lloyd rounds, fixed
  * @param init  optional explicit seed frame (vec_id, v, …) — the
  *              sample-trained quantizer passes the FULL corpus's k
  *              lowest ids while `e` is a hash-sample, so the seed stays
  *              deterministic whatever the sample keeps; default is the
  *              k lowest-id vectors of `e` itself. Lloyd's convergence
  *              doesn't require seeds to be members of the training set.
  * @return (cent_id, cv: array<double>, cn: L2 norm)
  */
object KMeans {

  def train(e: DataFrame, k: Int, iters: Int,
      init: Option[DataFrame] = None): DataFrame = {
    var cent = init.getOrElse(e.filter(col("vec_id") < k))
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val withNorm = cent.withColumn("cn", expr("sqrt(vec_dot(cv, cv))"))
      // argmax cell per vector as a max_by AGGREGATE, not a window: the
      // ordering key struct(ccos, -cent_id) reproduces "highest cosine,
      // ties to lowest cent_id" exactly, and partial aggregation folds
      // the N·k scored rows to N map-side — the window spelling shuffled
      // and sorted all N·k rows per round.
      val assigned = e.crossJoin(broadcast(withNorm))
        .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cn")))
        .groupBy(col("vec_id"))
        .agg(
          max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
            .as("cent_id"),
          first(col("v")).as("v")) // v is functionally determined by vec_id
      val comp = assigned.selectExpr("cent_id", "posexplode(v) AS (pos, x)")
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).as("m"))
      cent = comp.groupBy(col("cent_id"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
          .as("cv"))
      // No per-round checkpoint: iters is a small fixed constant and each
      // round consumes the previous exactly once, so the whole training
      // is one chain DAG — one query execution, no nested-lineage blowup
      // (contrast Graph.connectedComponents, where rounds are unbounded).
    }
    cent.withColumn("cn", expr("sqrt(vec_dot(cv, cv))"))
      // one tiny (k-row) materialization so every downstream broadcast
      // of the centroids reuses the trained result instead of re-running
      // the loop per exchange
      .localCheckpoint(true)
  }
}
