package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters state: value → (count, err) plus an
  * eviction index ordered by (count, value) so the minimum-count victim
  * is O(log m). `err` is the classic overestimation bound: the evicted
  * counter's count the value inherited when it entered a full summary —
  * true frequency ∈ [count − err, count]. */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Array[Long]]() // (count, err)
  // (count, value) — ascending order gives the minimum counter first
  val byCount = new java.util.TreeMap[(Long, String), Unit](
    Ordering.Tuple2(Ordering.Long, Ordering.String))

  private def reindex(v: String, from: Long, to: Long): Unit = {
    byCount.remove((from, v))
    byCount.put((to, v), ())
  }

  def offer(v: String, add: Long, addErr: Long): Unit = {
    val cur = counts.get(v)
    if (cur != null) {
      reindex(v, cur(0), cur(0) + add)
      cur(0) += add
      cur(1) += addErr
    } else if (counts.size < capacity) {
      counts.put(v, Array(add, addErr))
      byCount.put((add, v), ())
    } else {
      // evict the minimum counter; the newcomer inherits its count as
      // guaranteed overestimate (Metwally et al., ICDT'05)
      val minKey = byCount.firstKey()
      val (minCount, minVal) = minKey
      byCount.remove(minKey)
      counts.remove(minVal)
      counts.put(v, Array(minCount + add, minCount + addErr))
      byCount.put((minCount + add, v), ())
    }
  }

  /** A full summary proves nothing about absent values beyond "their
    * frequency is at most my minimum counter"; an under-capacity summary
    * proves absent ⇒ zero. This is the compensation a merge must add to
    * values the other side dropped. */
  def minOffset: Long =
    if (counts.size < capacity) 0L else byCount.firstKey()._1

  /** Merged-summary combine (Agarwal et al., Mergeable Summaries,
    * PODS'12 §3): values in only ONE summary take the OTHER's
    * [[minOffset]] as both count and error compensation — the other
    * side may have evicted up to that many occurrences, and without the
    * compensation the merged count could UNDERCOUNT, breaking the
    * `true ≤ count` overestimate invariant. Shared values add counts
    * and errors; then keep the top `capacity` counters. Both guarantees
    * (count − err ≤ true ≤ count; frequency > N/capacity ⇒ reported)
    * survive, which is what makes the planner free to combine partials
    * in any order. */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val selfOffset = minOffset // for values only in `other`
    val otherOffset = other.minOffset // for values only in `this`
    if (otherOffset > 0) counts.forEach { (v, ce) =>
      if (!other.counts.containsKey(v)) {
        reindex(v, ce(0), ce(0) + otherOffset)
        ce(0) += otherOffset
        ce(1) += otherOffset
      }
    }
    other.counts.forEach { (v, ce) =>
      val cur = counts.get(v)
      if (cur != null) {
        reindex(v, cur(0), cur(0) + ce(0))
        cur(0) += ce(0)
        cur(1) += ce(1)
      } else {
        counts.put(v, Array(ce(0) + selfOffset, ce(1) + selfOffset))
        byCount.put((ce(0) + selfOffset, v), ())
      }
    }
    while (counts.size > capacity) {
      val minKey = byCount.firstKey()
      byCount.remove(minKey)
      counts.remove(minKey._2)
    }
  }
}

/** SpaceSaving top-k (heavy hitters) as a native imperative aggregate:
  * per group, a bounded `capacity`-counter summary of the most frequent
  * values of a string column, returned as an array of
  * (value, count, err) structs ordered by (count desc, value asc).
  *
  * Guarantees (the textbook ones, spec-pinned in SpaceSavingSpec):
  *  - any value with true frequency > N/capacity is IN the summary;
  *  - for every reported value, count − err ≤ true frequency ≤ count;
  *  - under capacity (distinct values ≤ m) the summary is EXACT and
  *    deterministic (err = 0) — which is what lets a DuckDB oracle
  *    hash-check the per-day event-type gate, while the guarantee gate
  *    exercises the genuine eviction path on a skewed key.
  *
  * Why imperative and not `count(*) group-by + rank`: the exact top-k
  * needs a full shuffle of every distinct key; this buffer is O(m)
  * state that partial-aggregates map-side and merges associatively —
  * at 100 TB the difference between shuffling the key universe and
  * shuffling `capacity` counters per partition. The merge rule follows
  * the mergeable-summaries result, so partials combine in any order
  * the planner picks without weakening the error bound.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"space_saving needs capacity >= 1, got $capacity")

  override def prettyName: String = "space_saving"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer,
      input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer,
      other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    import scala.jdk.CollectionConverters._
    val rows = buf.counts.asScala.toSeq
      .sortBy { case (v, ce) => (-ce(0), v) }
      .map { case (v, ce) =>
        InternalRow(UTF8String.fromString(v), ce(0), ce(1))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (v, ce) =>
      out.writeUTF(v); out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val v = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.counts.put(v, Array(c, e))
      buf.byCount.put((c, v), ())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
