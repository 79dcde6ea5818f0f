package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for the cases AQE's runtime splitting can't
  * reach (SCALE.md "where the next 10× goes"): a hot GROUP BY key whose
  * partial aggregate still lands on one reducer, and a shuffle join where
  * one key dominates a side.
  *
  * Both transforms are semantics-preserving rewrites of the unsalted
  * plan — verified by equivalence property in SkewSpec.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Two-phase salted aggregation. Phase 1 groups on (keys, salt) so a hot
    * key spreads over `buckets` reducers; phase 2 merges the partials on
    * the true keys. The caller supplies both phases because they differ
    * per aggregate (count → sum of counts, sum → sum of sums, min → min
    * of mins…).
    *
    * The salt is `pmod(hash(entire row), buckets)` — deterministic (no
    * task-retry nondeterminism like rand()), uniform enough to spread
    * identical-key rows, and free of any column assumptions.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = df.withColumn(SaltCol,
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: the right (smaller, but too
    * big or too volatile to broadcast) side is replicated `buckets` times;
    * the left side gets a deterministic row salt; the join key becomes
    * (key, salt), so one hot key's rows spread over `buckets` tasks.
    * Inner joins only (replication would duplicate unmatched outer rows).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val leftS = left.withColumn(SaltCol,
      pmod(hash(left.columns.map(col): _*), lit(buckets)))
    val rightS = right.withColumn(SaltCol,
      explode(array((0 until buckets).map(lit): _*)))
    leftS.join(rightS, Seq(key, SaltCol), "inner").drop(SaltCol)
  }
}
