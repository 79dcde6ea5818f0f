package graft

import graft.functions.Udafs
import org.apache.spark.sql.functions._

/** Aggregator semantics: exactness, order-independence, and the
  * approx-percentile scale path staying close to the exact median. */
class UdafSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedAvg: exact decimal folds, repartition-invariant") {
    val wavg = udaf(Udafs.WeightedAvg)
    val df = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 6.0)).toDF("v", "w")
    val expected = (10.0 * 1 + 20.0 * 3 + 30.0 * 6) / 10.0
    assert(df.agg(wavg($"v", $"w")).head().getDouble(0) == expected)
    assert(df.repartition(7).agg(wavg($"v", $"w")).head().getDouble(0) == expected)
  }

  test("WeightedAvg: zero total weight yields NaN, not a crash") {
    val wavg = udaf(Udafs.WeightedAvg)
    val df = Seq((10.0, 0.0)).toDF("v", "w")
    assert(df.agg(wavg($"v", $"w")).head().getDouble(0).isNaN)
  }

  test("ExactMedian: odd count → middle, even count → mean of middles") {
    val med = udaf(Udafs.ExactMedian)
    assert(Seq(3.0, 1.0, 2.0).toDF("v").agg(med($"v")).head().getDouble(0) == 2.0)
    assert(Seq(4.0, 1.0, 2.0, 3.0).toDF("v")
      .agg(med($"v")).head().getDouble(0) == 2.5)
  }

  test("percentile_approx (the raw-scale path) tracks the exact median") {
    val med = udaf(Udafs.ExactMedian)
    val df = (1 to 1001).map(_.toDouble).toDF("v").repartition(8)
    val exact = df.agg(med($"v")).head().getDouble(0)
    val approx = df.agg(percentile_approx($"v", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(exact == 501.0)
    assert(math.abs(approx - exact) <= 1.0)
  }
}
