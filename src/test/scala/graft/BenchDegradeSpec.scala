package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r11 #3: scratch exhaustion must degrade to a recorded SKIP
  * (the row-ceiling stance), never a dead ENOSPC run that loses the
  * bench artifacts. The floor probe is pure (dir, floor) → decision,
  * so both branches pin without filling a disk; the integration shape
  * (every query skipping with the reason in `skipped`, artifacts
  * still written) is exercised by running Bench with
  * SPARK_GRAFT_MIN_FREE_GB above the volume size — see
  * BENCH_FULL_HISTORY.jsonl entries with n_scratch_skips > 0.
  */
class BenchDegradeSpec extends AnyFunSuite {

  private val tmp = new java.io.File(sys.props("java.io.tmpdir"))

  test("below the floor: Some(reason) naming the dir, the gap, and the override") {
    val r = Bench.scratchShortfall(tmp, Long.MaxValue)
    assert(r.isDefined)
    assert(r.get.contains(tmp.getPath))
    assert(r.get.contains("SPARK_GRAFT_MIN_FREE_GB"))
  }

  test("at or above the floor: None (queries run)") {
    assert(Bench.scratchShortfall(tmp, 0L).isEmpty)
    // a real small floor on a live volume must also pass
    assert(Bench.scratchShortfall(tmp, 1L).isEmpty)
  }

  test("multi-dir probe: the FULLEST configured dir decides (ADVICE r12)") {
    // one healthy dir + one below-floor dir → shortfall, naming the bad one
    val r = graft.ops.Scratch.shortfall(Seq(tmp, tmp), Long.MaxValue)
    assert(r.isDefined)
    assert(graft.ops.Scratch.shortfall(Seq(tmp), 0L).isEmpty)
    // the override hint says SET (=0 lowers the floor), not RAISE
    assert(r.get.contains("set SPARK_GRAFT_MIN_FREE_GB=0"))
  }

  test("floorBytes: malformed env falls back to the 2 GiB default") {
    // the env var isn't set in the test JVM — the default branch is the
    // Try fallback's output; a malformed value takes the same path
    assert(graft.ops.Scratch.floorBytes == (2L << 30) ||
      sys.env.contains("SPARK_GRAFT_MIN_FREE_GB"))
  }

  test("spillFlagged: >2x input AND >256MB noise floor, sorted") {
    val gb = 1L << 30
    val flagged = Bench.spillFlagged(
      Map("wide" -> 5 * gb, "ok" -> gb, "tiny" -> (100L << 20), "noinput" -> gb),
      Map("wide" -> gb, "ok" -> gb, "tiny" -> 1L))
    // wide: 5x input → flagged; ok: 1x → not; tiny: 100MB < floor → not;
    // noinput: no recorded input, 1GB spill → flagged
    assert(flagged == Seq("noinput", "wide"))
  }

  test("spillFlagged: shuffle-read bytes count toward the denominator (ADVICE r13)") {
    val gb = 1L << 30
    // a shuffle-fed query reads ~0 file input — its consumed volume is
    // shuffle-read; counting only inputMetrics false-flagged it
    val flagged = Bench.spillFlagged(
      Map("shuffled" -> gb, "stillwide" -> (5 * gb)),
      Map("shuffled" -> 0L, "stillwide" -> 0L),
      Map("shuffled" -> gb, "stillwide" -> gb))
    assert(flagged == Seq("stillwide"))
  }

  test("a refused mirror build carries the artifact name in the typed exception") {
    val e = new graft.ops.Scratch.ScratchFloorException("mirror build X refused: why")
    assert(e.getMessage.contains("X"))
  }

  test("causeChain: the root cause survives the opaque INTERNAL_ERROR wrapper (r14)") {
    // Spark 4 wraps execution failures as "[INTERNAL_ERROR] The collect
    // action failed..." — the old e.toString.take(200) log line carried
    // ONLY that wrapper; the chain must reach the root
    val root = new java.io.IOException("No space left on device")
    val mid = new RuntimeException("Exception thrown in awaitResult:", root)
    val top = new RuntimeException(
      "[INTERNAL_ERROR] The \"collect\" action failed. You hit a bug in " +
        "Spark or the Spark plugins you use.", mid)
    val c = Bench.causeChain(top)
    assert(c.contains("INTERNAL_ERROR"))
    assert(c.contains("No space left on device"))
    assert(c.contains(" <- "))
  }

  test("causeChain: self-referential and deep chains terminate") {
    val e = new RuntimeException("self")
    // initCause(self) is illegal; simulate depth instead
    var deep: Throwable = new RuntimeException("leaf")
    (1 to 20).foreach(i => deep = new RuntimeException(s"level$i", deep))
    val c = Bench.causeChain(deep)
    assert(c.split(" <- ").length <= 6)
    assert(Bench.causeChain(e).contains("self"))
  }
}
