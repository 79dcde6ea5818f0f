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
}
