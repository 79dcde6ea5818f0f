package graft.ops

/** Greedy materialized-view selection over an aggregation lattice —
  * Harinarayan/Rajaraman/Ullman, "Implementing Data Cubes Efficiently"
  * (SIGMOD'96). The navigator ([[graft.plans.SummaryRewrite]]) answers
  * "which summary serves this query"; the advisor answers the question
  * above it: "which summaries should exist at all", given the lattice
  * and the (estimated) row count of every view.
  *
  * The model is HRU's: answering a query at lattice node `w` from a
  * materialized view `v` costs `rows(v)` (a scan of the view), and is
  * possible iff `v` covers `w` (every grouping attribute of `w` is
  * derivable from `v` — here, coordinatewise ≤ on lattice keys, which
  * encodes both the time-grain chain hour→day→month→total and dim-set
  * containment). Starting from S = {root} (the finest view — or the raw
  * table itself), each round materializes the view with the largest
  * BENEFIT: Σ over covered nodes of the cost reduction it buys,
  *   benefit(v, S) = Σ_{w ⪯ v} max(0, cost(w, S) − rows(v)),
  * where cost(w, S) = min rows among views in S covering w. HRU prove
  * this greedy is within (1 − 1/e) ≈ 63% of the optimal benefit for any
  * k — the classic submodular-maximization bound — so a handful of
  * picks captures most of what ANY k summaries could save.
  *
  * Scale: `rows` estimation is the only data-touching step (one pass
  * over the corpus — the caller supplies counts, see the
  * `mv_advisor_lattice` gate which derives every coarser size from one
  * finest-grain pass; at 100 TB you would feed `approx_count_distinct`
  * sketches instead, the algorithm is agnostic). The greedy itself is
  * O(k · |lattice|²) driver arithmetic on a lattice of dozens of nodes —
  * metadata-scale, like every other planning decision in this engine.
  */
object MvAdvisor {

  /** A lattice node: `key` are its coordinates, one per dimension
    * hierarchy, where LARGER means FINER (more derivable). `w` is
    * answerable from `v` iff `w.key(i) <= v.key(i)` for every i. */
  final case class View(name: String, rows: Long, key: Seq[Int]) {
    require(rows >= 1, s"view $name has rows=$rows (every view has >=1 row)")
  }

  final case class Pick(view: View, benefit: Long, step: Int)

  /** Does `v` cover `w` (can a query at w be answered from v)? */
  def covers(v: View, w: View): Boolean = {
    require(v.key.size == w.key.size,
      s"lattice keys disagree in arity: ${v.name} vs ${w.name}")
    v.key.lazyZip(w.key).forall((a, b) => b <= a)
  }

  /** benefit(v, S) per HRU: total cost reduction over every node v
    * covers, against the current best cost under S. Includes v itself
    * (materializing v makes v's own query cost rows(v)). `weight` is
    * HRU §4's workload extension — node w's term scales by how often
    * the workload asks w's query (uniform weights = the paper's base
    * model); a lattice node nobody queries contributes benefit only as
    * a stepping stone through nodes below it, which is exactly 0 here
    * because covers() is transitive (anything v answers for w's
    * descendants it answers directly). */
  def benefit(v: View, s: Seq[View], all: Seq[View],
      weight: View => Long = _ => 1L): Long = {
    require(s.nonEmpty, "benefit needs a non-empty materialized set")
    all.iterator.filter(w => covers(v, w)).map { w =>
      val cost = s.iterator.filter(u => covers(u, w)).map(_.rows).min
      math.max(0L, cost - v.rows) * weight(w)
    }.sum
  }

  /** The HRU greedy: starting from S = {root}, pick up to `k` views by
    * max benefit; stops early when no candidate improves anything
    * (benefit 0 — materializing it would be pure storage). Every node
    * must be covered by `root` (the finest view). Deterministic
    * tiebreak: benefit desc, rows asc, name asc. Pass `weight` to run
    * the workload-frequency variant. */
  def greedy(views: Seq[View], root: View, k: Int,
      weight: View => Long = _ => 1L): Seq[Pick] = {
    require(views.contains(root), "root must be one of the views")
    views.foreach(w => require(covers(root, w),
      s"root ${root.name} does not cover ${w.name} — not a rooted lattice"))
    views.foreach(w => require(weight(w) >= 0, s"negative weight on ${w.name}"))
    var s = Vector(root)
    val picks = Vector.newBuilder[Pick]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val best = views.filterNot(s.contains)
        .map(v => (v, benefit(v, s, views, weight)))
        .sortBy { case (v, b) => (-b, v.rows, v.name) }
        .headOption
      best match {
        case Some((v, b)) if b > 0 =>
          picks += Pick(v, b, step)
          s :+= v
          step += 1
        case _ => done = true
      }
    }
    picks.result()
  }

  /** Workload weights from the repo's own measured query history
    * (`BENCH_FULL_HISTORY.jsonl`, one run per line) — VERDICT r8 #6:
    * the advisor's weights should come from what the workload actually
    * runs, not supplied constants. Each line's `"queries":{...}` map
    * is parsed, the per-query MEDIAN seconds across runs is the
    * query's cost, `nodeOf` maps query names onto lattice nodes (None
    * = the query doesn't aggregate this lattice), and a node's weight
    * is the summed medians in integer milliseconds — HRU frequencies
    * generalized to observed cost mass. Pure line parsing, no JSON
    * library: the writer is [[graft.Bench]] whose format is pinned.
    *
    * `sfFilter` restricts the history to runs whose `"sf"` tag equals
    * the given dir (VERDICT r12 #7): view selection should be priced at
    * the scale where the firehose scan term dominates — an sf0.1 log's
    * sub-second medians weight the lattice by timer noise, while the
    * sf100 medians weight it by what the queries actually cost at
    * scale. None = every run (the historic behavior). */
  def workloadFromHistory(lines: Seq[String],
      nodeOf: String => Option[String],
      sfFilter: Option[String] = None): Map[String, Long] = {
    val entry = """"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)""".r
    val perQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    val scoped = sfFilter match {
      case Some(sf) => lines.filter(_.contains(s""""sf":"$sf""""))
      case None => lines
    }
    scoped.foreach { ln =>
      val i = ln.indexOf("\"queries\":{")
      val j = if (i >= 0) ln.indexOf('}', i) else -1
      if (i >= 0 && j > i) {
        entry.findAllMatchIn(ln.substring(i + 11, j)).foreach { m =>
          perQuery(m.group(1)) =
            m.group(2).toDouble :: perQuery.getOrElse(m.group(1), Nil)
        }
      }
    }
    perQuery.toSeq.flatMap { case (name, ts) =>
      nodeOf(name).map { node =>
        val sorted = ts.sorted
        node -> math.round(sorted(sorted.size / 2) * 1000.0)
      }
    }.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
  }

  /** Drop recommendations: views whose COVERED workload weight is zero
    * — no query the workload ever runs can route to them, so an
    * existing materialization is pure storage (and a candidate one is
    * pure cost). covers() is transitive, so zero covered weight is
    * exactly "nothing would ever touch it". */
  def dropHints(views: Seq[View], weight: View => Long): Seq[View] =
    views.filter(v => views.filter(covers(v, _)).map(weight).sum == 0L)
}
