package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch as a native imperative
  * aggregate: per group, keep the k LEXICOGRAPHICALLY SMALLEST distinct
  * values of the input string column (callers feed it `md5(x)`, making
  * "smallest k hashes" a uniform sample of the distinct values and the
  * k-th minimum a distinct-cardinality estimator — Bar-Yossef et al.,
  * RANDOM'02). Returned as the ascending array.
  *
  * Why an imperative aggregate and not `sort_array(collect_set(...))`:
  * collect_set's state is the WHOLE distinct set — group-cardinality
  * memory and shuffle — while this buffer is a bounded k-entry tree
  * that partial-aggregates map-side and merges associatively, the only
  * state shape a sketch is allowed at 100 TB. And unlike most sketches
  * the result is DETERMINISTIC (bottom-k of a fixed hash is a pure
  * function of the value set, whatever the partitioning/merge order),
  * so the DuckDB oracle replays it hash-exactly with a plain
  * `ROW_NUMBER() OVER (ORDER BY hash) <= k` — the per-engine
  * error-contract gate of the other sketches (B19) is not needed here
  * for the sketch itself, only for the estimate it implies.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k >= 1, s"kmv_bottomk needs k >= 1, got $k")

  override def prettyName: String = "kmv_bottomk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], s: String): Unit = {
    // reject early when already full and past the cutoff — the common
    // case on big groups; TreeSet dedups re-adds of a kept value
    if (buf.size < k || s.compareTo(buf.last()) < 0) {
      buf.add(s)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    other.forEach(s => add(buf, s))
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator() // ascending
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(s => out.writeUTF(s))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}
