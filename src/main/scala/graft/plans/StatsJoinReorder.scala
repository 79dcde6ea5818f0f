package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
  Expression, Generator, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
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
  * — the NDV divisor applies to EQUALITY conjuncts only; a non-equality
  * conjunct that references both sides (a.x < b.y) contributes the
  * classic fixed 1/3 factor instead (System R's inequality default —
  * dividing a range conjunct by a key NDV underestimates by orders of
  * magnitude and can reorder INTO a worse plan). Per-conjunct factors
  * multiply. Base cardinalities come from the manifest row bounds
  * scaled by FILTER SELECTIVITY: an equality to a literal contributes
  * 1/ndv(col) when a KMV sketch is registered, a range predicate
  * against an integer literal contributes its overlap fraction with
  * the column's manifest [min,max] span when [[registerSpan]]
  * published one, and any predicate the stats can't see contributes
  * 1.0 — the estimate degrades to the row BOUND, never below the
  * truth's order of magnitude by guesswork. This is what routes a
  * 0.1%-filtered fact EARLY: its effective cardinality is now smaller
  * than an unfiltered mid-size dim's, which is the plan a warehouse
  * CBO would pick. ndv(col) comes from the registered KMV estimate
  * when [[registerNdv]] published one, else falls back to the owning
  * side's row estimate (the key-is-unique / FK-PK assumption —
  * conservative for dims, and the fallback the classic optimizers
  * use).
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

  /** Manifest-version-keyed memo of published estimates (r15): every
    * lake_cbo builder re-registers the same sketches on every call, and
    * each registration pays a collect() job (NDV merge), a manifest
    * read, or a footer pass. The estimate for (table, column) is a pure
    * function of the manifest VERSION, so it is computed once per
    * version per session-independent registry — the readCached stance
    * applied to the stats plane. A new commit mints a new version and
    * recomputes; unregister/clear drop the memo with the registry so
    * tests stay hermetic. */
  private val ndvMemo =
    new ConcurrentHashMap[(String, String, Int, Int), java.lang.Double]()

  /** Publish the KMV NDV estimate for `tablePath`.`column` to the
    * ordering estimator. Metadata-only after the sidecar exists:
    * [[graft.ops.NdvStats.ensure]] sketches only files it has never
    * seen (O(delta) per commit), and the merge is k hashes. Returns the
    * estimate. */
  def registerNdv(spark: SparkSession, tablePath: String, column: String,
      k: Int = 256): Double = {
    val tk = rawKey(tablePath)
    def compute(): Double = {
      val ks = graft.ops.NdvStats.mergedSketch(spark, tablePath, column, k)
        .collect()(0).getSeq[String](0)
      // same estimator as lake_ndv_manifest: k-1 over the k-th smallest
      // hash mapped into [0,1) via its first 60 bits; exact below k
      if (ks.size < k) ks.size.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 /
        java.lang.Long.parseLong(ks.max.substring(0, 15), 16).toDouble
    }
    val v = graft.ops.Manifest.currentListVersion(spark, tablePath)
    val est =
      if (v < 0) compute() // unversioned path — never memoized
      else ndvMemo.computeIfAbsent((tk, column, v, k), _ => compute())
        .doubleValue()
    ndvReg.put((tk, column), est)
    est
  }

  def unregisterNdv(tablePath: String): Unit = {
    val tk = rawKey(tablePath)
    ndvReg.keySet.removeIf(_._1 == tk)
    spanReg.keySet.removeIf(_._1 == tk)
    histReg.keySet.removeIf(_._1 == tk)
    hotReg.keySet.removeIf(_._1 == tk)
    ndvMemo.keySet.removeIf(_._1 == tk)
    spanMemo.keySet.removeIf(_._1 == tk)
    histMemo.keySet.removeIf(_._1 == tk)
    hotMemo.keySet.removeIf(_._1 == tk)
  }

  def clear(): Unit = {
    ndvReg.clear(); spanReg.clear(); histReg.clear(); hotReg.clear()
    ndvMemo.clear(); spanMemo.clear(); histMemo.clear(); hotMemo.clear()
  }

  /** (raw table path, column name) -> global [lo, hi] value span. */
  private val spanReg = new ConcurrentHashMap[(String, String), (Long, Long)]()

  /** Publish the manifest-version file set's [min, max] span of an int64
    * `column` to the selectivity estimator. Metadata-only: one parquet
    * FOOTER pass over the version's file list (the same
    * [[graft.ops.Manifest.collectStats]] harvest the pruning manifests
    * use) — no data pages. Refuses (throws) when any file lacks
    * harvestable stats for the column: a sentinel full-domain span
    * would silently neutralize every range estimate. Returns the span. */
  private val spanMemo =
    new ConcurrentHashMap[(String, String, Int), (Long, Long)]()

  def registerSpan(spark: SparkSession, tablePath: String, column: String,
      version: Int = -1): (Long, Long) = {
    val v = if (version >= 0) version
      else graft.ops.Manifest.currentListVersion(spark, tablePath)
    require(v >= 0, s"no committed list versions at $tablePath")
    val span = spanMemo.computeIfAbsent((rawKey(tablePath), column, v), _ => {
      val files = graft.ops.Manifest.readAll(spark, tablePath, v).map(_.path)
      val stats = graft.ops.Manifest.collectStats(spark, files, column)
      require(stats.nonEmpty, s"no files at $tablePath v$v")
      require(stats.forall(e =>
        !(e.minKey == Long.MinValue && e.maxKey == Long.MaxValue)),
        s"$tablePath.$column: some files carry no footer stats — refusing " +
          "to register a span that does not bound the data")
      (stats.map(_.minKey).min, stats.map(_.maxKey).max)
    })
    spanReg.put((rawKey(tablePath), column), span)
    span
  }

  /** (raw table path, column) -> merged table CDF (support xs, cum rows
    * ≤ x) from the per-file equi-depth sidecars. */
  private val histReg =
    new ConcurrentHashMap[(String, String), (Array[Double], Array[Double])]()

  /** Publish the [[graft.ops.HistStats]] merged histogram CDF for
    * `tablePath`.`column` — range selectivity then interpolates real
    * MASS instead of the uniform-span assumption [[registerSpan]] buys
    * (a long-tailed column under uniform span mis-costs a tail range
    * predicate by orders of magnitude, reordering INTO the bad plan).
    * Metadata-only after the sidecar exists ([[graft.ops.HistStats
    * .ensure]] profiles only files it has never seen). Returns the
    * number of CDF support points. */
  private val histMemo = new ConcurrentHashMap[(String, String, Int, Int),
    (Array[Double], Array[Double])]()

  def registerHistogram(spark: SparkSession, tablePath: String,
      column: String, buckets: Int = 32): Int = {
    val v = graft.ops.Manifest.currentListVersion(spark, tablePath)
    val cdf =
      if (v < 0) graft.ops.HistStats.mergedCdf(spark, tablePath, column, buckets)
      else histMemo.computeIfAbsent((rawKey(tablePath), column, v, buckets),
        _ => graft.ops.HistStats.mergedCdf(spark, tablePath, column, buckets))
    histReg.put((rawKey(tablePath), column), cdf)
    cdf._1.length
  }

  /** (raw table path, column) -> (hot value -> estimated row share). */
  private val hotReg =
    new ConcurrentHashMap[(String, String), Map[Long, Double]]()

  /** Publish the [[graft.ops.HotKeyStats]] heavy hitters for
    * `tablePath`.`column` to the EQUALITY estimator: a literal that
    * matches a hot key costs its OBSERVED share instead of the uniform
    * 1/ndv — the difference between salting-grade skew (one key owning
    * 70% of rows) estimated at 70% vs at 1/50. Only keys whose
    * GUARANTEED share (cnt − err) clears `minShare` register: the
    * no-false-positive rule, so a miss falls back to 1/ndv rather than
    * a sketch artifact. Returns the registered map. */
  private val hotMemo =
    new ConcurrentHashMap[(String, String, Int, Int, Double), Map[Long, Double]]()

  def registerHotShares(spark: SparkSession, tablePath: String,
      column: String, m: Int = 64,
      minShare: Double = 0.01): Map[Long, Double] = {
    val v = graft.ops.Manifest.currentListVersion(spark, tablePath)
    require(v >= 0, s"no committed list versions at $tablePath")
    val shares = hotMemo.computeIfAbsent(
      (rawKey(tablePath), column, v, m, minShare), _ => {
        val totalRows = graft.ops.Manifest.readAll(spark, tablePath, v)
          .filterNot(_.path.contains("/deletes/")).map(_.rows).sum.toDouble
        require(totalRows > 0, s"$tablePath: zero-row manifest")
        graft.ops.HotKeyStats
          .mergedHot(spark, tablePath, column, m, v)
          .filter { case (_, c, e) => (c - e).toDouble >= minShare * totalRows }
          .flatMap { case (value, c, _) =>
            scala.util.Try(value.toLong).toOption.map(_ -> c.toDouble / totalRows)
          }.toMap
      })
    hotReg.put((rawKey(tablePath), column), shares)
    shares
  }

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

  /** Span of the table column `a` resolves to in `side`, if registered —
    * same exprId-trace discipline as [[ndvOf]]. */
  private def spanOf(side: LogicalPlan, a: Attribute): Option[(Long, Long)] =
    side.collectFirst {
      case lr: LogicalRelation if lr.outputSet.contains(a) =>
        lr.relation match {
          case h: HadoopFsRelation =>
            StatsBroadcast.leafTable(h)
              .flatMap(tp => Option(spanReg.get((tp, a.name))))
          case _ => None
        }
    }.flatten

  /** Merged CDF of the table column `a` resolves to in `side`, if
    * registered — same exprId-trace discipline as [[ndvOf]]. */
  private def histOf(side: LogicalPlan,
      a: Attribute): Option[(Array[Double], Array[Double])] =
    side.collectFirst {
      case lr: LogicalRelation if lr.outputSet.contains(a) =>
        lr.relation match {
          case h: HadoopFsRelation =>
            StatsBroadcast.leafTable(h)
              .flatMap(tp => Option(histReg.get((tp, a.name))))
          case _ => None
        }
    }.flatten

  /** Hot-key share map for the table column `a`, if registered. */
  private def hotOf(side: LogicalPlan,
      a: Attribute): Option[Map[Long, Double]] =
    side.collectFirst {
      case lr: LogicalRelation if lr.outputSet.contains(a) =>
        lr.relation match {
          case h: HadoopFsRelation =>
            StatsBroadcast.leafTable(h)
              .flatMap(tp => Option(hotReg.get((tp, a.name))))
          case _ => None
        }
    }.flatten

  /** Fraction of rows with value ≤ x under the merged piecewise-linear
    * CDF (exact at every per-file boundary). */
  private def cdfFrac(cdf: (Array[Double], Array[Double]), x: Double): Double = {
    val (xs, cum) = cdf
    val total = cum.last
    if (x < xs.head) return 0.0
    if (x >= xs.last) return 1.0
    var k = java.util.Arrays.binarySearch(xs, x)
    if (k >= 0) return cum(k) / total
    k = -k - 2
    val frac = (x - xs(k)) / (xs(k + 1) - xs(k))
    (cum(k) + frac * (cum(k + 1) - cum(k))) / total
  }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long    => Some(i)
    case i: java.lang.Short   => Some(i.longValue)
    case _                    => None
  }

  /** Selectivity of one filter conjunct against the stats the estimator
    * can see; 1.0 (no reduction — the bound survives) for anything it
    * can't. Range fractions interpolate the registered [lo, hi] span
    * under a uniform assumption; equality uses the KMV NDV. */
  private def selOf(e: Expression, child: LogicalPlan): Double = {
    def clamp(x: Double) = math.min(1.0, math.max(0.0, x))
    // range selectivity, best stats first: a registered HISTOGRAM
    // interpolates real mass (integer semantics: `≤ c` is CDF(c),
    // `< c` is CDF(c−1), complements for the keep-above side); the
    // [min,max] SPAN's uniform assumption is the fallback; no stats
    // contribute 1.0 (the bound survives).
    def range(a: Attribute, keepBelow: Boolean, c: Long,
        inclusive: Boolean): Double =
      histOf(child, a).map { cdf =>
        val below =
          if (inclusive == keepBelow) cdfFrac(cdf, c.toDouble)
          else cdfFrac(cdf, c.toDouble - 1.0)
        clamp(if (keepBelow) below else 1.0 - below)
      }.orElse(spanOf(child, a).map { case (lo, hi) =>
        val width = hi.toDouble - lo.toDouble + 1.0
        val kept =
          if (keepBelow) c.toDouble - lo.toDouble + (if (inclusive) 1.0 else 0.0)
          else hi.toDouble - c.toDouble + (if (inclusive) 1.0 else 0.0)
        clamp(kept / width)
      }).getOrElse(1.0)
    // equality: a literal matching a registered HOT KEY costs its
    // observed share (the skew the uniform 1/ndv can't see); otherwise
    // 1/ndv when a KMV sketch is registered.
    def equal(a: Attribute, l: Literal): Double = {
      val hot = for {
        shares <- hotOf(child, a)
        v <- litLong(l)
        s <- shares.get(v)
      } yield s
      hot.orElse(ndvOf(child, a).map(n => 1.0 / math.max(n, 1.0)))
        .getOrElse(1.0)
    }
    e match {
      case EqualTo(a: Attribute, l: Literal) => equal(a, l)
      case EqualTo(l: Literal, a: Attribute) => equal(a, l)
      // IN-list: |list| / ndv under the same uniformity assumption (the
      // optimizer rewrites large lists to InSet — both shapes covered)
      case org.apache.spark.sql.catalyst.expressions.In(a: Attribute, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        ndvOf(child, a).map(n =>
          clamp(vs.size.toDouble / math.max(n, 1.0))).getOrElse(1.0)
      case is: org.apache.spark.sql.catalyst.expressions.InSet =>
        is.child match {
          case a: Attribute =>
            ndvOf(child, a).map(n =>
              clamp(is.hset.size.toDouble / math.max(n, 1.0))).getOrElse(1.0)
          case _ => 1.0
        }
      case LessThan(a: Attribute, l: Literal) =>
        litLong(l).map(range(a, keepBelow = true, _, inclusive = false))
          .getOrElse(1.0)
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        litLong(l).map(range(a, keepBelow = true, _, inclusive = true))
          .getOrElse(1.0)
      case GreaterThan(a: Attribute, l: Literal) =>
        litLong(l).map(range(a, keepBelow = false, _, inclusive = false))
          .getOrElse(1.0)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        litLong(l).map(range(a, keepBelow = false, _, inclusive = true))
          .getOrElse(1.0)
      case LessThan(l: Literal, a: Attribute) =>
        litLong(l).map(range(a, keepBelow = false, _, inclusive = false))
          .getOrElse(1.0)
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        litLong(l).map(range(a, keepBelow = false, _, inclusive = true))
          .getOrElse(1.0)
      case GreaterThan(l: Literal, a: Attribute) =>
        litLong(l).map(range(a, keepBelow = true, _, inclusive = false))
          .getOrElse(1.0)
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        litLong(l).map(range(a, keepBelow = true, _, inclusive = true))
          .getOrElse(1.0)
      case _ => 1.0
    }
  }

  /** Filter-aware cardinality ESTIMATE of a join side: the manifest row
    * bound ([[StatsBroadcast.bound]]'s refusal discipline, mirrored
    * node-for-node) scaled by the selectivity of every Filter crossed
    * on the way down. Still an estimate that never grows past the
    * bound — unknown predicates contribute 1.0, known ones only
    * shrink. */
  private def estRows(p: LogicalPlan): Option[Double] = p match {
    case f: Filter =>
      estRows(f.child).map(r => splitConjunctivePredicates(f.condition)
        .map(selOf(_, f.child)).product * r)
    case Project(pl, c) if !pl.exists(_.exists(_.isInstanceOf[Generator])) =>
      estRows(c)
    case s: Sort => estRows(s.child)
    case l: GlobalLimit => estRows(l.child)
    case l: LocalLimit => estRows(l.child)
    case a: Aggregate => estRows(a.child)
    case d: Deduplicate => estRows(d.child)
    case r: RepartitionOperation => estRows(r.child)
    case u: Union =>
      val bs = u.children.map(estRows)
      if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
    case jn: Join if jn.joinType == LeftSemi || jn.joinType == LeftAnti =>
      estRows(jn.left)
    case other => StatsBroadcast.bound(other).map(_.toDouble)
  }

  private case class Item(plan: LogicalPlan, rows: Double)

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
    * over `conjs`: an ndv divisor per EQUALITY conjunct (the max of the
    * two sides' key NDVs — registered sketch, else that side's row
    * estimate); a non-equality two-sided conjunct contributes the fixed
    * 1/3 inequality factor (ADVICE r9: dividing a range conjunct by a
    * key NDV underestimates by orders of magnitude). */
  private def joinEst(cur: Double, items: Seq[Item], inSet: Set[Int],
      j: Int, conjs: Seq[(Expression, Int, Int)]): Double = {
    val linking = conjs.filter { case (_, a, b) =>
      (inSet.contains(a) && b == j) || (inSet.contains(b) && a == j)
    }
    linking.foldLeft(cur * items(j).rows) { case (c, (e, a, b)) =>
      e match {
        case _: EqualTo =>
          val div = Seq(a, b).map { i =>
            val side = items(i).plan
            val attrs = e.references.toSeq.filter(side.outputSet.contains)
            attrs.flatMap(at => ndvOf(side, at)).reduceOption(_ min _)
              .getOrElse(items(i).rows)
          }.max
          c / math.max(div, 1.0)
        case _ => c / 3.0
      }
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
    val bounds = sides.map(estRows)
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
      joinEst(items(a).rows, items, Set(a), b, attributed)
    }
    var order = Vector(s0, s1)
    var cur = joinEst(items(s0).rows, items, Set(s0), s1, attributed)
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
