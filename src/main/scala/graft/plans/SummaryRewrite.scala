package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, TimestampType}

/** Materialized-view ROUTING: rewrite an aggregate over the raw events
  * scan onto its registered day-grain summary table — the classic OLAP
  * "aggregate navigator" (Gray et al., Data Cube, ICDE'96; every serious
  * warehouse ships one), done the Spark way: a `Rule[LogicalPlan]` that
  * fires after the main optimizer batches, so users (and SQL text) keep
  * writing the portable raw-table spelling and the plan quietly reads
  * the summary instead.
  *
  * At 100 TB this is the difference between a dashboard query scanning
  * the event firehose and scanning a |days|×|types|-row rollup: the
  * summary is maintained at ingest (here: fingerprint-memoized build,
  * the same economics as the bucketed mirrors), and every matching
  * aggregate gets O(summary) cost. Correctness is the re-aggregation
  * law: count → Σn, sum → Σ(partial decimal sums) — exact because the
  * partials are DECIMAL, min/max → min/max of partials. The gate query
  * `mv_rewrite_daily` is oracle-checked against DuckDB computing from
  * RAW rows, so the routing is proven semantics-preserving on real data.
  *
  * Fire conditions (all must hold — anything else is left untouched):
  *  - the Aggregate's child is the registered events relation (optionally
  *    under alias-only Projects — the loader's ntz→ltz cast projection
  *    and column pruning both peel);
  *  - every grouping expression is `date_trunc('day', ts)` (any cast
  *    chain over the stored ts column) or the bare `event_type` column;
  *  - every aggregate call is count(1|*), sum(cast(value as
  *    decimal(18,2))), min(value) or max(value) — the four functions the
  *    summary can answer exactly. avg/distinct/filtered aggregates and
  *    any other column do NOT match (no silent wrong answers: avg must
  *    be derived as sum/count by the USER so the re-aggregation stays
  *    visible; distinct is not decomposable over the rollup).
  *
  * Output exprIds and dataTypes are preserved (aliases keep their ids;
  * re-aggregated sums cast back to the original decimal type), so
  * everything above the Aggregate — sorts, projections, filters — is
  * untouched by the swap.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** (source-path suffix, grain) → summary parquet path. Registered by
    * the query builder after ensuring the summary exists; fingerprint-
    * keyed summary paths make stale routing impossible. Grains "day" and
    * "hour"; the navigator prefers the summary at the QUERY's grain and
    * falls back to a finer registered one (a day query re-aggregates 24
    * hour rows — the classic finer-view-answers-coarser-query case). */
  private val registry = new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  def register(srcPathSuffix: String, grain: String, summaryPath: String): Unit =
    registry.put((srcPathSuffix, grain.toLowerCase), summaryPath)

  /** Back-compat single-grain registration (day). */
  def register(srcPathSuffix: String, summaryPath: String): Unit =
    register(srcPathSuffix, "day", summaryPath)

  /** Test hook: forget all routes (no-fire behavior without rebuilding). */
  def clear(): Unit = registry.clear()

  private val D182 = DecimalType(18, 2)

  def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // ---- peel alias-only Projects, collecting substitutions ----------
    var child = agg.child
    var subst = Map.empty[ExprId, Expression]
    var peeling = true
    while (peeling) child match {
      case Project(pl, c)
          if pl.forall {
            case _: AttributeReference => true
            case _: Alias => true
            case _ => false
          } =>
        pl.foreach {
          case a: Alias => subst += a.exprId -> a.child
          case _ => ()
        }
        child = c
      case _ => peeling = false
    }
    val rel = child match {
      case lr: LogicalRelation => lr
      case _ => return None
    }
    val srcPath = rel.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption.map(_.toString).getOrElse(return None)
      case _ => return None
    }
    val routes: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      registry.asScala.collect {
        case ((suffix, grain), sp) if srcPath.endsWith(suffix) => grain -> sp
      }.toMap
    }
    if (routes.isEmpty) return None

    val tsAttr = rel.output.find(_.name == "ts").getOrElse(return None)
    val typeAttr = rel.output.find(_.name == "event_type").getOrElse(return None)
    val valueAttr = rel.output.find(_.name == "value").getOrElse(return None)

    // chase project aliases down to relation-attribute expressions
    def resolve(e: Expression): Expression = {
      var cur = e
      var i = 0
      while (i < 8) { // alias chains are shallow; bounded for safety
        val next = cur.transformUp {
          case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
        }
        if (next.fastEquals(cur)) return cur
        cur = next
        i += 1
      }
      cur
    }

    def isTs(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == tsAttr.exprId
      case Cast(c, TimestampType, _, _) => isTs(c)
      case _ => false
    }
    def isValue(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == valueAttr.exprId
      case _ => false
    }
    /** grain of a time-trunc grouping over the stored ts, if any */
    def truncGrain(e: Expression): Option[String] = e match {
      case TruncTimestamp(Literal(fmt, StringType), t, _)
          if fmt != null && isTs(t) =>
        val g = fmt.toString.toLowerCase
        if (g == "day" || g == "hour") Some(g) else None
      case _ => None
    }

    // ---- classify grouping expressions -------------------------------
    sealed trait GKind
    case object GTime extends GKind
    case object GType extends GKind
    var qGrain: Option[String] = None
    var qTrunc: Option[TruncTimestamp] = None // original node, for re-trunc
    val gkinds: Seq[GKind] = agg.groupingExpressions.map { g0 =>
      resolve(g0) match {
        case g @ TruncTimestamp(_, _, _) if truncGrain(g).isDefined =>
          val gr = truncGrain(g).get
          if (qGrain.exists(_ != gr)) return None // mixed grains: no route
          qGrain = Some(gr)
          qTrunc = Some(g.asInstanceOf[TruncTimestamp])
          GTime
        case a: Attribute if a.exprId == typeAttr.exprId => GType
        case _ => return None
      }
    }

    // ---- pick the summary: query grain first, finer grain fallback ---
    val (sumGrain, summaryPath) = qGrain match {
      case Some(g) if routes.contains(g) => (g, routes(g))
      case Some("day") if routes.contains("hour") => ("hour", routes("hour"))
      case Some(_) => return None
      case None => // no time grouping: any grain re-aggregates; prefer coarse
        routes.get("day").map(("day", _))
          .orElse(routes.get("hour").map(("hour", _)))
          .getOrElse(return None)
    }

    // ---- summary relation (fresh analyzed scan; attrs by name) -------
    val spark = SparkSession.active
    val sumRel = spark.read.parquet(summaryPath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }.getOrElse(return None)
    val sumAttrs = Seq(sumGrain, "event_type", "n", "sum_value_dec",
      "min_value", "max_value").map(n => sumRel.output.find(_.name == n))
    if (sumAttrs.exists(_.isEmpty)) return None
    val Seq(timeA, typeA2, nA, sumDecA, minA, maxA) = sumAttrs.map(_.get)
    val typeA = typeA2
    // the time expression in the REWRITTEN plan: the summary's bucket
    // column at matching grain, or the original trunc re-applied to the
    // finer bucket (day of the hour bucket ≡ day of ts — trunc composes)
    val timeRepr: Expression =
      if (qGrain.contains(sumGrain) || qGrain.isEmpty) timeA
      else qTrunc.get.copy(timestamp = timeA)

    // ---- rewrite one expression tree ---------------------------------
    // returns None if any aggregate call or leaf is outside the grammar
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae @ AggregateExpression(fn, _, false, None, _) =>
        fn match {
          case Count(Seq(Literal(_, _))) =>
            Some(Sum(nA).toAggregateExpression()) // LongType, matches count
          case s @ Sum(se, _) =>
            resolve(se) match {
              case Cast(v, dt: DecimalType, _, _) if dt == D182 && isValue(v) =>
                // Σ of decimal partials widens (38,2); cast back to the
                // original (28,2) — exact, the partials bound the value.
                // evalMode copied from the matched sum, not re-derived.
                Some(Cast(s.copy(child = sumDecA).toAggregateExpression(),
                  s.dataType))
              case _ => None
            }
          case Min(se) if isValue(resolve(se)) =>
            Some(Min(minA).toAggregateExpression())
          case Max(se) if isValue(resolve(se)) =>
            Some(Max(maxA).toAggregateExpression())
          case _ => None
        }
      case _: AggregateExpression => None // distinct / filtered: no route
      case g if truncGrain(resolve(g)) == qGrain && qGrain.isDefined =>
        Some(timeRepr)
      case a: Attribute if (resolve(a) match {
            case r: Attribute => r.exprId == typeAttr.exprId
            case _ => false
          }) => Some(typeA)
      case _: Attribute => None // any other source column: no route
      case other =>
        // non-aggregate scaffolding (casts, arithmetic over results):
        // rewrite children, fail if any child fails
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newGroups: Seq[Expression] = gkinds.map {
      case GTime => timeRepr
      case GType => typeA
    }
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(expr, name) =>
        val ne = rewriteExpr(expr).getOrElse(return None)
        Alias(ne, name)(al.exprId, al.qualifier, al.explicitMetadata)
      case ar: AttributeReference =>
        // bare grouping-attribute passthrough (groupBy(col) output)
        val ne = rewriteExpr(ar).getOrElse(return None)
        Alias(ne, ar.name)(ar.exprId, ar.qualifier)
      case _ => return None
    }
    Some(Aggregate(newGroups, newAggs, sumRel))
  }
}
