package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, ExistenceJoin, Inner,
  LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Cost-based broadcast selection fed by MANIFEST row accounting — the
  * statistics layer ([[graft.ops.Manifest]] per-file row counts, the
  * same numbers `lake_stats_profile` publishes) actually CONSUMED by
  * the planner, instead of Spark's file-size estimate.
  *
  * Why file sizes are the wrong estimator for a lake table at 100 TB:
  *  - merge-on-read delete vectors leave data files untouched, so
  *    bytes-on-disk say "big" long after most rows are logically
  *    deleted — the manifest knows the live row count at zero IO;
  *  - compression ratios vary 2–20× across columns and encodings, so
  *    `sizeInBytes` is a noisy proxy for the row count a hash relation
  *    actually holds;
  *  - a manifest-pruned read ([[graft.ops.ManifestLake.readWhere]])
  *    scans a file SUBSET whose row total the manifest states exactly.
  *
  * The rule walks each join side down to its parquet leaves and sums
  * the registered per-file row counts (an upper bound: Filter /
  * left-anti delete subtraction / Aggregate only shrink it). A side
  * whose bound is ≤ `graft.statsbroadcast.maxRows` (default 1e6) gets
  * a BROADCAST join hint — exactly what a user would write by hand if
  * they knew what the manifest knows. Everything about the decision is
  * conservative and refuses rather than guesses:
  *  - only EXACT file paths registered from a manifest version count —
  *    a directory-level scan (which would read superseded files the
  *    manifest no longer names) or a file the registry has never seen
  *    (e.g. written by a compaction AFTER registration) returns no
  *    bound and the side is left alone;
  *  - interior nodes must be row-non-increasing (Project / Filter /
  *    Limit / Aggregate / Distinct / left-semi / left-anti; Union sums
  *    its children) — an inner join or explode in the subtree voids
  *    the bound;
  *  - an existing user hint on the side wins — the rule never
  *    overrides an explicit strategy.
  *
  * The rule is a no-op until [[register]] names a table, so sessions
  * that never opt in keep byte-identical plans. Registered via
  * `spark.experimental.extraOptimizations` alongside [[SummaryRewrite]]
  * (see [[graft.functions.VecExprs.register]]); idempotent under the
  * fixed-point batch because a side it already hinted is skipped.
  */
object StatsBroadcast extends Rule[LogicalPlan] {

  /** table path (raw URI path) -> per-file rows, file keyed on the raw
    * URI path component (the manifest's own path domain — see the
    * [[graft.ops.ManifestLake]] path-domain note). */
  private val registry = new ConcurrentHashMap[String, Map[String, Long]]()

  private def rawKey(p: String): String = new Path(p).toUri.getPath

  /** Publish the manifest's per-file row accounting for `tablePath` at
    * `version` (default head) to the planner. Metadata-only: reads the
    * manifest lists, never a data file. Returns the total registered
    * rows (data + delete sidecar entries — each file bounds only reads
    * that name it, so over-inclusion is harmless). */
  // version-keyed memo (r15): the per-file row map is a pure function
  // of the manifest version; lake_cbo builders re-register per call and
  // paid the manifest list read each time (see StatsJoinReorder's memos)
  private val regMemo = new ConcurrentHashMap[(String, Int), Map[String, Long]]()

  def register(spark: SparkSession, tablePath: String,
      version: Int = -1): Long = {
    val v = if (version >= 0) version
      else graft.ops.Manifest.currentListVersion(spark, tablePath)
    require(v >= 0, s"no committed list versions at $tablePath")
    val m = regMemo.computeIfAbsent((rawKey(tablePath), v), _ =>
      graft.ops.Manifest.readAll(spark, tablePath, v)
        .map(e => rawKey(e.path) -> e.rows).toMap)
    registry.put(rawKey(tablePath), m)
    m.values.sum
  }

  def unregister(tablePath: String): Unit = {
    registry.remove(rawKey(tablePath))
    regMemo.keySet.removeIf(_._1 == rawKey(tablePath))
  }

  def clear(): Unit = { registry.clear(); regMemo.clear() }

  private def maxRows: Long =
    conf.getConfString("graft.statsbroadcast.maxRows", "1000000").toLong

  /** The registered table (registry key = raw table path) whose file
    * set covers every root path of `h`, if any — how a scan is traced
    * back to the lake table it reads ([[StatsJoinReorder]] uses this to
    * key NDV lookups). */
  private[plans] def leafTable(h: HadoopFsRelation): Option[String] = {
    val roots = h.location.rootPaths
    if (roots.isEmpty) return None
    val keys = roots.map(p => p.toUri.getPath)
    import scala.jdk.CollectionConverters._
    registry.asScala.collectFirst {
      case (tp, files) if keys.forall(files.contains) => tp
    }
  }

  /** Manifest row bound of a leaf: every root path must be an exact
    * registered file of ONE table (a directory scan or an unknown file
    * refuses — see the scaladoc). */
  private def leafBound(h: HadoopFsRelation): Option[Long] = {
    val roots = h.location.rootPaths
    if (roots.isEmpty) return None
    val keys = roots.map(p => p.toUri.getPath)
    import scala.jdk.CollectionConverters._
    registry.asScala.collectFirst {
      case (tp, files) if keys.forall(files.contains) =>
        keys.map(files).sum
    }
  }

  private[plans] def registryEmpty: Boolean = registry.isEmpty

  /** Row upper bound of a join side from manifest accounting, None when
    * any node could grow the row count past its leaves' total. Shared
    * with [[StatsJoinReorder]] — the same refusal discipline governs
    * both the broadcast and the ordering decision. */
  private[plans] def bound(p: LogicalPlan): Option[Long] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => leafBound(h)
      case _ => None
    }
    case Project(pl, c) if !pl.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Generator])) =>
      bound(c)
    case f: Filter => bound(f.child)
    case s: Sort => bound(s.child)
    case l: GlobalLimit => bound(l.child)
    case l: LocalLimit => bound(l.child)
    case a: Aggregate => bound(a.child)
    case d: Deduplicate => bound(d.child)
    case r: RepartitionOperation => bound(r.child)
    case u: Union =>
      val bs = u.children.map(bound)
      if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
    case j: Join if j.joinType == LeftSemi || j.joinType == LeftAnti =>
      bound(j.left)
    case _ => None
  }

  private def canBuildLeft(j: Join): Boolean = j.joinType match {
    case Inner | Cross | RightOuter => true
    case _ => false
  }

  private def canBuildRight(j: Join): Boolean = j.joinType match {
    case Inner | Cross | LeftOuter | LeftSemi | LeftAnti |
        _: ExistenceJoin => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    if (!conf.getConfString("graft.statsbroadcast.enabled", "true").toBoolean)
      return plan
    val cap = maxRows
    plan.transformUp {
      case j: Join
          if j.hint.leftHint.forall(_.strategy.isEmpty) &&
            j.hint.rightHint.forall(_.strategy.isEmpty) =>
        val lb = if (canBuildLeft(j)) bound(j.left).filter(_ <= cap) else None
        val rb = if (canBuildRight(j)) bound(j.right).filter(_ <= cap) else None
        (lb, rb) match {
          case (None, None) => j
          // both qualify: broadcast the smaller bound (ties go right,
          // Spark's own preference)
          case (Some(l), Some(r)) if l < r =>
            j.copy(hint = j.hint.copy(leftHint =
              Some(j.hint.leftHint.getOrElse(HintInfo())
                .copy(strategy = Some(BROADCAST)))))
          case (_, Some(_)) =>
            j.copy(hint = j.hint.copy(rightHint =
              Some(j.hint.rightHint.getOrElse(HintInfo())
                .copy(strategy = Some(BROADCAST)))))
          case (Some(_), None) =>
            j.copy(hint = j.hint.copy(leftHint =
              Some(j.hint.leftHint.getOrElse(HintInfo())
                .copy(strategy = Some(BROADCAST)))))
        }
    }
  }
}
