package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for curate_dsir_resample's INTEGER Gumbel noise
  * (VERDICT r9 #7, replacing GumbelBoundarySpec's full-domain float
  * scan): the selection key is score_mu + table[idx] where the table is
  * 1024 int64 constants authored once and embedded verbatim in both
  * engines' query texts — no per-row libm call exists for a rounding
  * wobble to flip, on ANY corpus, so there is no boundary distance left
  * to certify. What remains pinnable is the table itself. */
class GumbelTableSpec extends AnyFunSuite {

  private val gq = graft.queries.Curation.GumbelQ

  test("quantile table: 1024 entries, strictly increasing, Gumbel-shaped") {
    assert(gq.size == 1024)
    // the Gumbel quantile −ln(−ln(p)) is strictly increasing in p
    gq.sliding(2).foreach { case Seq(a, b) =>
      assert(a < b, s"table not strictly increasing at $a >= $b")
    }
    // shape anchors (millionths): G(1/2048) ≈ −1.932, G(1/2) ≈ 0.3665,
    // G(2047/2048) ≈ 7.625 — a regenerated table that drifted from the
    // Gumbel quantile (wrong scale, wrong sign, off-by-one index) trips
    assert(gq.head == math.floor(
      -math.log(-math.log(0.5 / 1024.0)) * 1e6).toLong)
    assert(math.abs(gq(512) - 380729L) < 20000L, gq(512).toString)
    assert(gq.last > 7000000L && gq.last < 8000000L, gq.last.toString)
    // median-p sanity: G(0.5) = −ln(ln 2) ≈ 0.3665
    val mid = -math.log(math.log(2.0)) * 1e6
    assert(math.abs(gq(511) - mid) < 3000 || math.abs(gq(512) - mid) < 3000)
  }
}
