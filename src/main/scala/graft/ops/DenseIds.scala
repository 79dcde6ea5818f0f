package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Globally dense, contiguous, 0-based id assignment in total key order
  * — WITHOUT the single-partition window.
  *
  * `ROW_NUMBER() OVER (ORDER BY key)` is the correct *specification*,
  * but its Spark physical plan funnels the entire input through ONE
  * task (a global-order window has a single unbounded partition) — the
  * canonical scale-killer when stamping ids onto a 100 TB corpus for
  * shard packing or embedding-matrix row addressing.
  *
  * The scalable idiom is the classic two-pass offset scheme:
  *   1. range-partition + sort within partitions on the key
  *      (one shuffle, the same work a global sort does);
  *   2. one O(#partitions) count job — per-partition row counts;
  *   3. prefix-sum those counts into per-partition start offsets
  *      (driver-side, #partitions longs — NOT data-sized state);
  *   4. map-side pass adds `offset(p) + local index`.
  * Steps 2–4 are exactly `RDD.zipWithIndex` (public Spark API since
  * 1.0), so we use it rather than hand-rolling the offset bookkeeping.
  *
  * Determinism: range partitions are boundary-sampled, but ranges are
  * DISJOINT and each partition is sorted, so for a UNIQUE key the
  * (row → id) mapping is the global rank regardless of where the
  * sampled boundaries fall. Callers must pass a unique key (ties would
  * make the id assignment within the tie group partition-dependent).
  *
  * The reference engine never needs this — single-process pandas gets
  * `df.reset_index()` for free; distributing that tiny operation is
  * exactly the kind of re-think the Spark port exists for.
  */
object DenseIds {

  /** Append `idName` (long, 0-based, dense in ascending `key` order). */
  def assign(df: DataFrame, key: String, idName: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(key)).sortWithinPartitions(key)
    val schema = StructType(sorted.schema.fields :+
      StructField(idName, LongType, nullable = false))
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(withId, schema)
  }
}
