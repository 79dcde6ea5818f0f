package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins curate_dsir_resample's float-boundary robustness claim (ADVICE
  * r8): the Gumbel perturbation gumbel_mu = floor(−ln(−ln((u+.5)/M))·1e6)
  * feeds a hard per-source rank cut, so a cross-engine libm wobble that
  * flipped the floor would silently flake the oracle. The input domain is
  * FINITE — u is a mod-1000003 residue — so instead of hoping, scan every
  * representable input and verify the scaled value never comes close
  * enough to an integer for any plausible wobble to flip it.
  *
  * Wobble bound: p = (u+0.5)/M is a single correctly-rounded IEEE
  * division (bit-identical in every conforming engine — no cancellation
  * amplifies downstream), and each ln is within a few ULPs of its ~O(10)
  * result in any libm, so the scaled value differs across engines by
  * ≲ 1e-8. The measured minimum distance to an integer over the full
  * domain is 5.7e-7 (at u = 647259) — the 1e-7 assertion below keeps a
  * 10× margin over the wobble while sitting 5× under the true minimum,
  * so it is stable, not tuned-to-pass.
  */
class GumbelBoundarySpec extends AnyFunSuite {

  test("Gumbel floor margin > 1e-7 over the entire residue domain") {
    val M = 1000003
    var minDist = Double.MaxValue
    var argmin = -1
    var u = 0
    while (u < M) {
      val p = (u + 0.5) / M.toDouble
      val x = -math.log(-math.log(p)) * 1e6
      val d = math.abs(x - math.rint(x))
      if (d < minDist) { minDist = d; argmin = u }
      u += 1
    }
    assert(minDist > 1e-7,
      s"gumbel boundary margin $minDist at u=$argmin is inside libm-wobble " +
        "range — the DSIR rank cut could differ across engines")
  }
}
