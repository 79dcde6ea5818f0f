package graft

import org.apache.spark.sql.functions._

/** Semantic + plan pins for the round-8 session-6 curation additions.
  *
  * curate_token_budget: the histogram-threshold selection must (a) never
  * exceed the 40% budget, (b) waste at most one boundary document of
  * headroom (greedy strict fill), and (c) pay its doc-level window
  * PARTITIONED BY bucket — the corpus never flows through a global
  * ordering (the bucket sweep's unpartitioned window sees ≤1001
  * aggregate rows by construction, which is the allowed shape).
  *
  * curate_mix_temperature: T=2 sampling must flatten the mix — every
  * source's share of the temperature budget sits between its raw share
  * and the uniform share (sqrt is order-preserving + concave), totals
  * redistribute (Σ target ≤ budget with only integer-floor loss), and
  * the doc draw joins via a broadcast of the |sources|-row weight table.
  */
class TokenBudgetSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("curate_token_budget: kept mass fits the 40% budget, boundary-tight") {
    assume(new java.io.File(sf).isDirectory)
    val out = SparkEntry.queries("curate_token_budget")(spark, sf)
    val kept = out.agg(sum("tokens_kept")).head.getLong(0)
    val total = T.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    val budget = total * 2 / 5
    assert(kept <= budget, s"kept=$kept > budget=$budget")
    // Greedy strict fill leaves less than one max-doc of headroom.
    val maxDoc = T.documents(spark, sf)
      .agg(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(budget - kept < maxDoc,
      s"headroom ${budget - kept} ≥ max doc $maxDoc — fill not greedy")
  }

  test("curate_token_budget: doc-level window is bucket-partitioned; dim broadcasts") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("curate_token_budget")
    // the boundary-bucket running sum partitions by qb — a corpus-wide
    // empty-partition window over doc rows would print 'windowspecdefinition(doc'
    assert(p.contains("windowspecdefinition(qb"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("curate_mix_temperature: ratio compression + order preservation; budget conserved") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("curate_mix_temperature")(spark, sf).collect()
    val budget = rows.map(_.getAs[Long]("src_tokens")).sum
    val targets = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(targets <= budget && budget - targets < rows.length * 2L,
      s"Σtarget=$targets vs budget=$budget — integer-floor loss only")
    // sqrt preserves the mass ORDER but compresses the spread: the
    // target max/min ratio must be ≈ sqrt of the raw max/min ratio
    // (never the raw ratio itself). NOTE a middle source's normalized
    // share CAN exceed both its raw share and uniform — the naive
    // "between raw and uniform" bound is false; ratio compression is
    // the property that actually holds.
    val byMass = rows.sortBy(_.getAs[Long]("src_tokens"))
    assert(byMass.map(_.getAs[Long]("target_tokens")).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true
    }, "temperature sampling must preserve the mass order")
    val rawRatio = byMass.last.getAs[Long]("src_tokens").toDouble /
      byMass.head.getAs[Long]("src_tokens")
    val tempRatio = byMass.last.getAs[Long]("target_tokens").toDouble /
      byMass.head.getAs[Long]("target_tokens")
    assert(tempRatio <= math.sqrt(rawRatio) * 1.01 && tempRatio >= 1.0,
      s"temp ratio $tempRatio vs sqrt(raw) ${math.sqrt(rawRatio)}")
  }

  test("curate_mix_temperature: weight table broadcasts, no shuffle join") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("curate_mix_temperature")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("curate_dsir_resample: exact 25% selection; broadcast weights; source-partitioned rank") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("curate_dsir_resample")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs") / 4,
        s"${r.getAs[String]("source")}: Gumbel-top-k must keep exactly " +
          s"cnt div 4 docs, got ${r.getAs[Long]("n_kept")}")
    }
    val p = executedPlan("curate_dsir_resample")
    // the 1024-bucket weight table rides a broadcast onto the bigram
    // stream; the rank window partitions by source (no global ordering)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("windowspecdefinition(source"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the selection key is an integer table lookup (VERDICT r9 #7) —
    // a regression back to the per-row double-log Gumbel would put
    // libm back in the rank cut
    assert(p.contains("element_at"), "integer Gumbel table lookup missing")
    assert(!p.toUpperCase.matches("(?s).*LOG\\(+-?\\(*-?LOG.*"),
      "per-row nested log reappeared in the selection key path")
  }

  test("curate_pack_sizeclass: bins provably fit, ceil arithmetic, no window/shuffle-heavy plan") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("curate_pack_sizeclass")(spark, sf).collect()
    val B = 2048L
    rows.foreach { r =>
      val (c, n, bins, toks) = (r.getAs[Long]("size_class"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_bins"), r.getAs[Long]("tokens"))
      if (c == 0) {
        assert(bins == n, "oversize docs stand alone")
        assert(r.getAs[Long]("waste_tokens") < 0, "class 0 reports overflow")
      } else {
        assert(bins == (n + c - 1) / c, s"class $c: ceil bins")
        // the REAL harmonic-fit invariant (ADVICE r8 — the old
        // `waste ≤ bins·B − toks + 1` was waste's own definition):
        // class-c membership means len ∈ (B div (c+1), B div c]
        // (lower bound only for c < K=8, where the class is uncapped),
        // so the class token mass is bracketed by n·those bounds —
        // a misclassified doc on either side fails this.
        assert(toks <= n * (B / c),
          s"class $c: mass $toks exceeds n·(B div c) = ${n * (B / c)} — " +
            "some doc is longer than its class bound")
        if (c < 8)
          assert(toks > n * (B / (c + 1)),
            s"class $c: mass $toks under n·(B div (c+1)) — some doc " +
              "belongs to a denser class")
        // fit follows: n ≤ bins·c and len ≤ B div c ⇒ toks ≤ bins·B,
        // i.e. waste (= bins·B − toks) is provably non-negative
        assert(r.getAs[Long]("waste_tokens") >= 0, s"class $c: negative waste")
        assert(toks <= bins * B, "packed mass cannot exceed capacity")
      }
    }
    // the zero-coordination claim: a scan + ONE hash aggregate, no window
    val p = executedPlan("curate_pack_sizeclass")
    assert(!p.contains("Window"), p.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("curate_ccnet_buckets: balanced terciles, quality-monotone boundaries") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("curate_ccnet_buckets")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, bs) =>
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1,
        s"$lang: integer terciles must balance within 1 doc, got ${sizes.toSeq}")
      // ranked qb-desc: head's worst doc is never worse than middle's best
      val byB = bs.sortBy(_.getAs[Long]("bucket"))
      byB.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Int]("qb_min") >= lo.getAs[Int]("qb_max"),
            s"$lang: bucket boundary not quality-monotone")
        case _ =>
      }
    }
  }

  test("text_novelty_ref: ppm bounds and ref-join plan sanity") {
    assume(new java.io.File(sf).isDirectory)
    val rows = SparkEntry.queries("text_novelty_ref")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, ppm) = (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))
      assert(novel >= 0 && novel <= n)
      assert(ppm == novel * 1000000L / n)
    }
    val p = executedPlan("text_novelty_ref")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("er_golden_record: banded-MinHash edge source — no cartesian, no BNLJ") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("er_golden_record")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // the linear-regime pin, on the EDGE BUILD (the final plan only shows
    // post-CC survivorship — altStar materializes edges inside its loop):
    // edges must come from the band-signature aggregate (min
    // md5('0:'||shingle) per band) with the levenshtein verify applied to
    // candidates, not from the exhaustive length-band blocked join
    // text_fuzzy_pairs keeps by contract
    val edges = graft.queries.TextOps.erEdges(spark, sf)
    edges.collect()
    val ep = edges.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // warm sessions read the persisted signature mirror; a cold build
    // shows the band-signature aggregate inline — either is the banded
    // generator, anything else is a regression to the blocked join
    assert(ep.contains("concat(0:") || ep.contains("bandsigs"),
      "ER edge source is not the banded-MinHash generator:\n" +
        ep.take(1500))
    assert(ep.toLowerCase.contains("levenshtein"),
      "ER edges lost the thresholded-DP verify:\n" + ep.take(1500))
    assert(!ep.contains("CartesianProduct") &&
      !ep.contains("BroadcastNestedLoopJoin"), ep.take(1500))
  }
}
