package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running totals in total key order — the WEIGHTED
  * analogue of [[DenseIds]]: `SUM(w) OVER (ORDER BY key)` is the
  * specification, but a global-order window funnels the whole input
  * through one task. Same two-pass offset scheme instead:
  *   1. range-partition + sort within partitions on the key;
  *   2. one O(#partitions) job — per-partition weight totals;
  *   3. driver-side prefix-sum into per-partition start offsets
  *      (#partitions longs, not data-sized state);
  *   4. map-side pass emits offset(p) + partition-local running sum.
  * Weights stay int64 end to end, so the running total is EXACT and
  * engine-replayable (no float accumulation order to disagree on).
  * Determinism: ranges are disjoint and sorted, so for a UNIQUE key the
  * running total is the global one regardless of sampled boundaries.
  */
object PrefixSums {

  /** Append `cumName` = running total of `weight` (inclusive of the
    * current row) in ascending `key` order. `weight` must be LongType
    * and `key` unique. */
  def cumsum(df: DataFrame, key: String, weight: String,
      cumName: String): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(weight).dataType == LongType,
      s"cumsum weight '$weight' must be bigint, got " +
        df.schema(weight).dataType.simpleString)
    val sorted = df.repartitionByRange(col(key)).sortWithinPartitions(key)
    val wIdx = sorted.schema.fieldIndex(weight)
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(wIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(p) = sum before p
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(cumName, LongType, nullable = false))
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r => run += r.getLong(wIdx); Row.fromSeq(r.toSeq :+ run) }
    }
    spark.createDataFrame(out, schema)
  }
}
