package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2b B17): custom aggregates as
  * `Aggregator[IN, BUF, OUT]`, registered with `functions.udaf` so they
  * run as real Catalyst aggregates — partial (reduce) on the map side,
  * merge on the reduce side, one shuffle of small buffers. That is the
  * 100 TB contract: buffer size is O(1) for WeightedAvg and O(group
  * cardinality) only for ExactMedian, whose scale path is
  * `percentile_approx` (documented at the query site).
  */
object Udafs {

  final case class WIn(value: Double, weight: Double)
  final case class WBuf(num: BigDecimal, den: BigDecimal)

  /** Exact weighted mean: inputs snapped to DECIMAL(18,2) (matching the
    * oracle's casts), folded as exact BigDecimal sums — associative and
    * commutative, so partition order can't perturb the result — divided
    * as double only at the end.
    */
  object WeightedAvg extends Aggregator[WIn, WBuf, Double] {
    private def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
    def reduce(b: WBuf, in: WIn): WBuf =
      WBuf(b.num + d2(in.value) * d2(in.weight), b.den + d2(in.weight))
    def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.num + b.num, a.den + b.den)
    def finish(b: WBuf): Double =
      if (b.den.signum == 0) Double.NaN else b.num.toDouble / b.den.toDouble
    def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class MBuf(values: List[Double])

  /** Exact median with DuckDB's interpolation rule: odd n → middle
    * element, even n → arithmetic mean of the two middles. The buffer
    * holds the group's values, so this is for bounded-cardinality groups;
    * at raw scale use percentile_approx (t-digest, bounded memory).
    */
  object ExactMedian extends Aggregator[Double, MBuf, Double] {
    def zero: MBuf = MBuf(Nil)
    def reduce(b: MBuf, in: Double): MBuf = MBuf(in :: b.values)
    def merge(a: MBuf, b: MBuf): MBuf = MBuf(a.values ::: b.values)
    def finish(b: MBuf): Double = {
      if (b.values.isEmpty) return Double.NaN
      val s = b.values.sorted.toArray
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def bufferEncoder: Encoder[MBuf] = Encoders.product[MBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
