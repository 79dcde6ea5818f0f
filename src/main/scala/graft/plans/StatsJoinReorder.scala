package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Stats-driven JOIN ORDERING — the step past [[StatsBroadcast]]'s
  * broadcast decision: manifest row accounting plus the NDV sidecars
  * ([[graft.ops.NdvStats]], the numbers `lake_stats_profile` publishes)
  * re-order a 3+-table inner-join tree smallest-estimated-intermediate
  * first, Selinger-style. This is the decision a warehouse user hits on
  * every star query: written join order follows the prose of the
  * question, not the data — at 100 TB a fact⋈fact intermediate that a
  * dim join would have cut first is the difference between a bounded
  * shuffle and a spilled one, and ONLY the statistics layer can know,
  * because file sizes lie under merge-on-read deletes and compression
  * skew (see the StatsBroadcast scaladoc).
  *
  * Estimator (textbook, independence-assuming):
  *   |A ⋈ B on a.x = b.y| = |A|·|B| / max(ndv(x), ndv(y))
  * with per-conjunct factors multiplied. Base cardinalities come from
  * the manifest row bounds; ndv(col) comes from the registered KMV
  * estimate when [[registerNdv]] published one, else falls back to the
  * owning side's row bound (the key-is-unique / FK-PK assumption —
  * conservative for dims, and the fallback the classic optimizers use).
  *
  * Refusal discipline (same stance as StatsBroadcast — never guess):
  *  - only INNER joins with no user hints anywhere in the flattened
  *    chain (a hinted join is an explicit user decision: it both stops
  *    the flatten and is never moved);
  *  - every flattened side must have a manifest row bound;
  *  - every join conjunct must be deterministic and reference exactly
  *    two sides; the greedy build only ever joins predicate-connected
  *    sides (never manufactures a cross join) — any leftover side or
  *    conjunct aborts to the original plan;
  *  - output column order is restored with a Project, so downstream
  *    operators (and the user's schema) see byte-identical output.
  *
  * Idempotent under the fixed-point batch: a chain already in greedy
  * order returns the ORIGINAL node unchanged. Registered BEFORE
  * StatsBroadcast in `extraOptimizations` so ordering decides first and
  * the broadcast hint then lands on the re-ordered tree.
  */
object StatsJoinReorder extends Rule[LogicalPlan] with PredicateHelper {

  /** (raw table path, column name) -> NDV estimate. */
  private val ndvReg = new ConcurrentHashMap[(String, String), Double]()

  private def rawKey(p: String): String = new Path(p).toUri.getPath

  /** Publish the KMV NDV estimate for `tablePath`.`column` to the
    * ordering estimator. Metadata-only after the sidecar exists:
    * [[graft.ops.NdvStats.ensure]] sketches only files it has never
    * seen (O(delta) per commit), and the merge is k hashes. Returns the
    * estimate. */
  def registerNdv(spark: SparkSession, tablePath: String, column: String,
      k: Int = 256): Double = {
    val ks = graft.ops.NdvStats.mergedSketch(spark, tablePath, column, k)
      .collect()(0).getSeq[String](0)
    // same estimator as lake_ndv_manifest: k-1 over the k-th smallest
    // hash mapped into [0,1) via its first 60 bits; exact below k
    val est =
      if (ks.size < k) ks.size.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 /
        java.lang.Long.parseLong(ks.max.substring(0, 15), 16).toDouble
    ndvReg.put((rawKey(tablePath), column), est)
    est
  }

  def unregisterNdv(tablePath: String): Unit = {
    val tk = rawKey(tablePath)
    ndvReg.keySet.removeIf(_._1 == tk)
  }

  def clear(): Unit = ndvReg.clear()

  /** NDV of the table column `a` resolves to in `side`, if the attr
    * traces to a registered table's scan and a registered sketch. The
    * trace is by exprId through the side's own subtree, so aliases and
    * projections don't fool it — only a genuine leaf column matches. */
  private def ndvOf(side: LogicalPlan, a: Attribute): Option[Double] =
    side.collectFirst {
      case lr: LogicalRelation if lr.outputSet.contains(a) =>
        lr.relation match {
          case h: HadoopFsRelation =>
            StatsBroadcast.leafTable(h)
              .flatMap(tp => Option(ndvReg.get((tp, a.name))))
          case _ => None
        }
    }.flatten

  private case class Item(plan: LogicalPlan, rows: Long)

  /** Flatten a no-hint inner-join chain; a hinted or non-inner join is
    * an opaque leaf. Attribute-only pruning Projects (column pruning
    * inserts one between stacked joins) are transparent: dropping them
    * widens an intermediate by the pruned key columns, which the final
    * output Project restores — a computed alias is NOT transparent (a
    * parent condition could reference it), so it stays a leaf. */
  private def flatten(p: LogicalPlan):
      (Seq[LogicalPlan], Seq[Expression]) = p match {
    case Join(l, r, Inner, cond, JoinHint.NONE) =>
      val (li, lc) = flatten(l)
      val (ri, rc) = flatten(r)
      (li ++ ri, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
    case Project(pl, child: Join)
        if pl.forall(_.isInstanceOf[Attribute]) &&
          child.joinType == Inner && child.hint == JoinHint.NONE =>
      flatten(child)
    case other => (Seq(other), Nil)
  }

  /** Cardinality of joining `acc` (estimated rows `cur`) with item `j`
    * over `conjs`: one ndv divisor per conjunct, each the max of the
    * two sides' key NDVs (registered sketch, else that side's rows). */
  private def joinEst(cur: Double, items: Seq[Item], inSet: Set[Int],
      j: Int, conjs: Seq[(Expression, Int, Int)]): Double = {
    val linking = conjs.filter { case (_, a, b) =>
      (inSet.contains(a) && b == j) || (inSet.contains(b) && a == j)
    }
    linking.foldLeft(cur * items(j).rows.toDouble) { case (c, (e, a, b)) =>
      val div = Seq(a, b).map { i =>
        val side = items(i).plan
        val attrs = e.references.toSeq.filter(side.outputSet.contains)
        attrs.flatMap(at => ndvOf(side, at)).reduceOption(_ min _)
          .getOrElse(items(i).rows.toDouble)
      }.max
      c / math.max(div, 1.0)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (StatsBroadcast.registryEmpty) return plan
    if (!conf.getConfString("graft.statsjoinreorder.enabled", "true").toBoolean)
      return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, _, JoinHint.NONE) =>
        reorder(j).getOrElse(j)
    }
  }

  private def reorder(j: Join): Option[LogicalPlan] = {
    val (sides, conjuncts) = flatten(j)
    if (sides.size < 3) return None
    val bounds = sides.map(StatsBroadcast.bound)
    if (bounds.exists(_.isEmpty)) return None // a side the stats can't see
    val items = sides.zip(bounds).map { case (p, b) => Item(p, b.get) }
    // attribute each conjunct to exactly two sides, by exprId
    val attributed = conjuncts.map { e =>
      if (!e.deterministic) return None
      val refs = e.references
      val owning = items.indices.filter(i =>
        refs.exists(items(i).plan.outputSet.contains))
      if (owning.size != 2 ||
          !refs.forall(a => owning.exists(i =>
            items(i).plan.outputSet.contains(a)))) return None
      (e, owning(0), owning(1))
    }
    // greedy: best connected pair, then best connected next side
    val n = items.size
    val pairs = for {
      a <- 0 until n; b <- (a + 1) until n
      if attributed.exists { case (_, x, y) =>
        (x == a && y == b) || (x == b && y == a) }
    } yield (a, b)
    if (pairs.isEmpty) return None
    val (s0, s1) = pairs.minBy { case (a, b) =>
      joinEst(items(a).rows.toDouble, items, Set(a), b, attributed)
    }
    var order = Vector(s0, s1)
    var cur = joinEst(items(s0).rows.toDouble, items, Set(s0), s1, attributed)
    while (order.size < n) {
      val inSet = order.toSet
      val candidates = (0 until n).filter(i => !inSet.contains(i) &&
        attributed.exists { case (_, a, b) =>
          (inSet.contains(a) && b == i) || (inSet.contains(b) && a == i) })
      if (candidates.isEmpty) return None // disconnected: refuse
      val next = candidates.minBy(joinEst(cur, items, inSet, _, attributed))
      cur = joinEst(cur, items, inSet, next, attributed)
      order = order :+ next
    }
    if (order == items.indices.toVector) return None // already optimal
    // rebuild left-deep, attaching each conjunct at the first join
    // where both its sides are present
    var used = Set.empty[Int]
    var placed = Set.empty[Int] // conjunct indices
    def condsFor(inSet: Set[Int]): Option[Expression] = {
      val here = attributed.zipWithIndex.filter { case ((_, a, b), ci) =>
        !placed.contains(ci) && inSet.contains(a) && inSet.contains(b)
      }
      placed = placed ++ here.map(_._2)
      here.map(_._1._1).reduceOption(
        org.apache.spark.sql.catalyst.expressions.And(_, _))
    }
    used = Set(order(0), order(1))
    var built: LogicalPlan = Join(items(order(0)).plan, items(order(1)).plan,
      Inner, condsFor(used), JoinHint.NONE)
    order.drop(2).foreach { i =>
      used = used + i
      built = Join(built, items(i).plan, Inner, condsFor(used), JoinHint.NONE)
    }
    if (placed.size != attributed.size) return None // leftover conjunct
    Some(Project(j.output, built))
  }
}
