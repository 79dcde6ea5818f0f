package graft

import graft.ops.MvAdvisor
import graft.ops.MvAdvisor.{Pick, View}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the HRU'96 greedy ("Implementing Data Cubes Efficiently") that
  * backs the `mv_advisor_lattice` gate: each pick must be the true
  * argmax of the benefit function at that step (checked against an
  * independent brute force, not the implementation's own loop), on both
  * a hand lattice shaped like the paper's running example and random
  * lattices. */
class MvAdvisorSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Brute-force benefit: literal HRU definition, written independently
    * of MvAdvisor.benefit (different traversal, no shared code path). */
  private def bfBenefit(v: View, s: Seq[View], all: Seq[View]): Long = {
    var total = 0L
    for (w <- all) {
      val vCovers = v.key.indices.forall(i => w.key(i) <= v.key(i))
      if (vCovers) {
        var best = Long.MaxValue
        for (u <- s)
          if (u.key.indices.forall(i => w.key(i) <= u.key(i)))
            best = math.min(best, u.rows)
        if (best - v.rows > 0) total += best - v.rows
      }
    }
    total
  }

  /** An 8-view cube lattice in the shape of HRU'96's running example
    * (parts × suppliers × customers, sizes in rows): psc is the raw
    * fact grain, each subset of {p,s,c} a view. Keys are the subset's
    * membership vector. */
  private val psc = View("psc", 6000000L, Seq(1, 1, 1))
  private val cube = Seq(
    psc,
    View("pc", 6000000L, Seq(1, 0, 1)),
    View("ps", 800000L, Seq(1, 1, 0)),
    View("sc", 6000000L, Seq(0, 1, 1)),
    View("p", 200000L, Seq(1, 0, 0)),
    View("s", 10000L, Seq(0, 1, 0)),
    View("c", 100000L, Seq(0, 0, 1)),
    View("none", 1L, Seq(0, 0, 0)))

  test("every greedy pick is the step argmax under the brute-force benefit") {
    val picks = MvAdvisor.greedy(cube, psc, 3)
    assert(picks.size == 3)
    var s = Seq(psc)
    for (Pick(v, b, step) <- picks) {
      val best = cube.filterNot(s.contains)
        .map(c => (c, bfBenefit(c, s, cube)))
        .maxBy { case (c, bb) => (bb, -c.rows) }
      assert(b == bfBenefit(v, s, cube), s"step $step benefit")
      assert(b == best._2, s"step $step picked a non-argmax view")
      s :+= v
    }
  }

  test("first pick on the cube is ps (the only same-coverage view cheaper than raw)") {
    // pc and sc cost the same as psc (benefit 0); ps saves 5.2M rows on
    // each of the 4 nodes it covers — the paper's opening observation
    // that materializing a view as big as the raw table buys nothing.
    val first = MvAdvisor.greedy(cube, psc, 1).head
    assert(first.view.name == "ps")
    assert(first.benefit == 4L * (6000000L - 800000L))
  }

  test("benefits are non-increasing across steps (diminishing returns)") {
    val picks = MvAdvisor.greedy(cube, psc, 7)
    val bs = picks.map(_.benefit)
    assert(bs == bs.sorted(Ordering[Long].reverse))
  }

  test("greedy stops early when no candidate has positive benefit") {
    // all views as large as the root -> nothing is ever worth picking
    val flat = Seq(
      View("root", 100L, Seq(1, 1)), View("a", 100L, Seq(1, 0)),
      View("b", 100L, Seq(0, 1)), View("ab", 100L, Seq(0, 0)))
    assert(MvAdvisor.greedy(flat, flat.head, 3).isEmpty)
  }

  test("workload weights steer the pick (HRU §4 frequency extension)") {
    // uniform weights pick ps (covers 4 nodes at 5.2M saved each); a
    // workload that ONLY ever queries c makes every ps-side saving
    // worthless and the best pick becomes c itself
    val onlyC: View => Long = v => if (v.name == "c") 1000L else 0L
    val picks = MvAdvisor.greedy(cube, psc, 1, onlyC)
    assert(picks.head.view.name == "c")
    assert(picks.head.benefit == 1000L * (6000000L - 100000L))
    // and a zero-weight workload picks nothing at all
    assert(MvAdvisor.greedy(cube, psc, 3, _ => 0L).isEmpty)
  }

  test("workloadFromHistory: per-query medians map to node weights and flip the pick") {
    // three bench runs; q_s is noisy (1.0/9.0/1.1 — median 1.1, the
    // robustness the median buys), q_c steady
    val lines = Seq(
      """{"metric":"total","value":9,"queries":{"q_s":1.000,"q_c":0.200,"q_other":5.0},"sf":"x"}""",
      """{"metric":"total","value":9,"queries":{"q_s":9.000,"q_c":0.200},"sf":"x"}""",
      """{"metric":"total","value":9,"queries":{"q_s":1.100,"q_c":0.400},"sf":"x"}""")
    val nodeOf: String => Option[String] = {
      case "q_s" => Some("s")
      case "q_c" => Some("c")
      case _     => None // q_other doesn't aggregate this lattice
    }
    val w = MvAdvisor.workloadFromHistory(lines, nodeOf)
    // medians: q_s -> 1.1s = 1100, q_c -> 0.2s = 200 (sorted middle of
    // [0.2, 0.2, 0.4]); unmapped queries contribute nothing
    assert(w == Map("s" -> 1100L, "c" -> 200L), w.toString)

    // sfFilter scopes the history to one scale's runs (VERDICT r12 #7):
    // pricing the lattice at sf100 must ignore the sf-x lines entirely
    val mixed = lines :+
      """{"metric":"total","value":9,"queries":{"q_s":80.000,"q_c":2.000},"sf":"/tmp/graft-sf100"}"""
    val at100 = MvAdvisor.workloadFromHistory(
      mixed, nodeOf, sfFilter = Some("/tmp/graft-sf100"))
    assert(at100 == Map("s" -> 80000L, "c" -> 2000L), at100.toString)
    // and the unfiltered call still sees every run (median over the
    // 4-run set [1.0, 1.1, 9.0, 80.0] lands on 9.0)
    assert(MvAdvisor.workloadFromHistory(mixed, nodeOf)("s") == 9000L)

    // uniform weights pick ps (the cube test above); a c-heavy history
    // must flip the greedy toward the c branch
    val heavyC = MvAdvisor.workloadFromHistory(
      Seq("""{"queries":{"q_c":50.0}}"""), nodeOf)
    val weight: View => Long =
      v => heavyC.getOrElse(v.name, 0L)
    val pick = MvAdvisor.greedy(cube, psc, 1, weight).head.view.name
    assert(pick == "c", s"c-only workload must pick c, got $pick")
  }

  test("workloadFromHistory parses the repo's REAL measured history end-to-end") {
    // not a synthetic line set: the actual BENCH_FULL_HISTORY.jsonl the
    // bench accumulates — the production entry point must survive its
    // real format (long lines, many runs, float seconds) and produce
    // usable weights for the events lattice's grain mapping
    val f = new java.io.File("BENCH_FULL_HISTORY.jsonl")
    assume(f.isFile, "no measured history on this checkout")
    val lines = new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).split('\n').toSeq
    assume(lines.nonEmpty)
    val nodeOf: String => Option[String] = {
      case "events_tumbling_hourly" => Some("hour:event_type")
      case "mv_rewrite_daily"       => Some("day:event_type")
      case "mv_rewrite_monthly"     => Some("month:event_type")
      case _                        => None
    }
    val w = MvAdvisor.workloadFromHistory(lines, nodeOf)
    assert(w.nonEmpty, "real history produced no weights")
    // every mapped node's weight is a positive millisecond mass, and
    // medians are bounded by the slowest plausible single query (60s)
    w.foreach { case (n, ms) =>
      assert(ms > 0L && ms < 60000L, s"$n -> $ms ms out of range")
    }
    // weights drive the greedy without throwing on the real lattice
    val weight: View => Long = v => w.getOrElse(v.name, 0L)
    MvAdvisor.greedy(cube, psc, 2, _ => 1L) // sanity: uniform still works
    assert(MvAdvisor.dropHints(cube, weight).nonEmpty ||
      w.keySet.exists(Set("p", "s", "c", "ps", "pc", "sc", "psc")),
      "history weights must be consumable by dropHints")
  }

  test("sf100-scoped history prices the lattice at scale (VERDICT r12 #7)") {
    // the production flow end-to-end AT SCALE: weights from the sf100
    // runs only (sub-second sf0.1 medians are timer noise for view
    // selection — the firehose scan term dominates only at scale), the
    // weighted greedy's pick verified against an independent weighted
    // brute force, and the DROP hints against the covered-mass rule
    val f = new java.io.File("BENCH_FULL_HISTORY.jsonl")
    assume(f.isFile, "no measured history on this checkout")
    val lines = new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).split('\n').toSeq
    assume(lines.exists(_.contains("\"sf\":\"/tmp/graft-sf100\"")),
      "no sf100 runs recorded yet")
    val nodeOf: String => Option[String] = {
      case "events_tumbling_hourly" => Some("s")
      case "mv_rewrite_daily"       => Some("c")
      case "mv_rewrite_monthly"     => Some("none")
      case _                        => None
    }
    val w = MvAdvisor.workloadFromHistory(lines, nodeOf,
      sfFilter = Some("/tmp/graft-sf100"))
    assume(w.nonEmpty, "the sf100 legs skipped every mapped query")
    w.foreach { case (n, ms) => assert(ms > 0L, s"$n -> $ms ms") }
    val weight: View => Long = v => w.getOrElse(v.name, 0L)
    val picks = MvAdvisor.greedy(cube, psc, 2, weight)
    // weighted brute force, written independently of MvAdvisor.benefit
    def bfW(v: View, s: Seq[View]): Long = {
      var total = 0L
      for (node <- cube) {
        if (v.key.indices.forall(i => node.key(i) <= v.key(i))) {
          var best = Long.MaxValue
          for (u <- s)
            if (u.key.indices.forall(i => node.key(i) <= u.key(i)))
              best = math.min(best, u.rows)
          if (best - v.rows > 0)
            total += (best - v.rows) * weight(node)
        }
      }
      total
    }
    var s = Seq(psc)
    picks.foreach { case Pick(v, b, _) =>
      val bestBf = cube.filterNot(s.contains).map(c => bfW(c, s)).max
      assert(b == bfW(v, s) && b == bestBf,
        s"scale-weighted pick ${v.name} ($b) is not the brute-force argmax ($bestBf)")
      s :+= v
    }
    // drop rule: a view covering zero scale-workload mass is pure storage
    val drops = MvAdvisor.dropHints(cube, weight).map(_.name).toSet
    cube.foreach { v =>
      val covered = cube.filter(n =>
        v.key.indices.forall(i => n.key(i) <= v.key(i))).map(weight).sum
      assert(drops.contains(v.name) == (covered == 0L),
        s"${v.name}: covered=$covered drops=$drops")
    }
  }

  test("dropHints: zero covered workload marks a view as pure storage") {
    // workload lives only at node c: everything NOT covering c (and
    // not covered-by-weighted nodes) is a drop candidate
    val weight: View => Long = v => if (v.name == "c") 10L else 0L
    val drops = MvAdvisor.dropHints(cube, weight).map(_.name).toSet
    // views covering c: psc, pc, sc, c — everything else covers only
    // zero-weight nodes
    assert(drops == Set("ps", "p", "s", "none"), drops.toString)
  }

  test("random lattices: every pick is a brute-force argmax and S stays consistent") {
    val genLattice: Gen[Seq[View]] = for {
      dims <- Gen.choose(2, 3)
      // key space = {0,1}^dims, full cube; random sizes, root forced max
      sizes <- Gen.listOfN(1 << dims, Gen.choose(1L, 1000000L))
    } yield {
      val keys = (0 until (1 << dims)).map(m =>
        Seq.tabulate(dims)(i => (m >> i) & 1))
      val rootKey = Seq.fill(dims)(1)
      val maxSz = sizes.max
      keys.zip(sizes).map { case (k, sz) =>
        View(k.mkString("v", "", ""), if (k == rootKey) maxSz else math.min(sz, maxSz), k)
      }
    }
    check(Prop.forAll(genLattice) { views =>
      val root = views.find(_.key.forall(_ == 1)).get
      val picks = MvAdvisor.greedy(views, root, 4)
      var s = Seq(root)
      picks.forall { case Pick(v, b, _) =>
        val bb = views.filterNot(s.contains).map(c => bfBenefit(c, s, views))
        val ok = b == bfBenefit(v, s, views) && (bb.isEmpty || b == bb.max) && b > 0
        s :+= v
        ok
      }
    })
  }
}
