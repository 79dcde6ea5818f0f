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

  /** Split salted equi-join driven by a HOT-KEY LIST (the production
    * skew-join shape, fed by [[HotKeyStats.hotKeys]]'s guaranteed
    * bounds): rows carrying a hot key take the salted path — left side
    * row-salted, right side replicated `buckets` ways but ONLY for its
    * hot-key rows — while everything else joins plain. Against
    * [[saltedJoin]] this stops paying replication on the entire right
    * side: at 100 TB the right side may be millions of rows of which a
    * handful of keys are hot, and replicating the cold millions
    * `buckets`× is its own regression. Inner joins only (null keys
    * drop from both branches, matching inner-join semantics). */
  def splitSaltedJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any], buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    if (hotKeys.isEmpty) return left.join(right, Seq(key), "inner")
    val isHot = col(key).isInCollection(hotKeys)
    val hotL = left.filter(isHot).withColumn(SaltCol,
      pmod(hash(left.columns.map(col): _*), lit(buckets)))
    val hotR = right.filter(isHot).withColumn(SaltCol,
      explode(array((0 until buckets).map(lit): _*)))
    val hot = hotL.join(hotR, Seq(key, SaltCol), "inner").drop(SaltCol)
    val cold = left.filter(!isHot).join(right.filter(!isHot), Seq(key), "inner")
    hot.unionByName(cold)
  }
}
