package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The recall guarantees the near-dup designs rest on, as checked
  * properties (pure math — no Spark session needed):
  *  - SimHash: 60-bit fingerprints banded 4×15 — hamming ≤ 3 ⇒ at least
  *    one band identical (pigeonhole: 4 differing bits can't hit 4 bands
  *    with only 3 of them set). This is why the banded equi-join has
  *    EXACT recall for the hamming ≤ 3 predicate.
  *  - Jaccard prefix filter: with prefix length |X| − ⌈0.8·|X|⌉ + 1 under
  *    a shared total order, two sets with J ≥ 0.8 share a prefix element
  *    (AllPairs/PPJoin bound) — the inverted index misses nothing.
  */
class BandingSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def bands(x: Long): Seq[Long] =
    (0 until 4).map(b => (x >>> (15 * b)) & 32767L)

  test("property: hamming <= 3 on 60 bits implies a shared 15-bit band") {
    val genFp = Gen.choose(0L, (1L << 60) - 1)
    val genFlips = for {
      k <- Gen.choose(0, 3)
      bits <- Gen.pick(k, 0 until 60)
    } yield bits.toSeq
    val prop = Prop.forAll(genFp, genFlips) { (x, flips) =>
      val y = flips.foldLeft(x)((acc, b) => acc ^ (1L << b))
      val shared = bands(x).zip(bands(y)).exists { case (a, b) => a == b }
      shared && java.lang.Long.bitCount(x ^ y) <= 3
    }
    check(prop)
  }

  test("hamming = 4 can defeat the bands (the bound is tight)") {
    // one flipped bit in each band → no shared band; documents why the
    // query's predicate is hamming <= 3 and not 4
    val x = 0L
    val y = (1L << 0) | (1L << 15) | (1L << 30) | (1L << 45)
    assert(!bands(x).zip(bands(y)).exists { case (a, b) => a == b })
  }

  test("property: J >= 0.8 sets share an element within the PPJoin prefix") {
    // universe small enough to force overlaps; sets as sorted vectors
    val genSet = Gen.chooseNum(5, 40).flatMap(n =>
      Gen.pick(n, 0 until 60).map(_.toVector.sorted))
    def prefixLen(size: Int): Int = size - ((4 * size + 4) / 5) + 1
    val prop = Prop.forAll(genSet, genSet) { (a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val jac = inter.toDouble / (a.size + b.size - inter)
      val pa = a.take(prefixLen(a.size)).toSet
      val pb = b.take(prefixLen(b.size)).toSet
      // prefix-PREFIX intersection — exactly what the query's inverted
      // index joins (both sides prefix-exploded). Safe because the
      // ⌈t·|X|⌉ prefix is ≥ the PPJoin α-bound prefix when J ≥ t forces
      // |B| ≥ t·|A|.
      jac < 0.8 || pa.intersect(pb).nonEmpty
    }
    check(prop)
  }
}
