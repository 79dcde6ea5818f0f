package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter of a group's long keys as a native imperative
  * aggregate, returned as the filter's serialized bytes — the building
  * block of the per-file bloom INDEX ([[graft.ops.BloomIndex]]): group
  * by `_metadata.file_path`, aggregate the key column, and each file
  * gets a membership sketch a driver can consult before scheduling any
  * scan. Spark ships the sketch type (`org.apache.spark.util.sketch
  * .BloomFilter` — public, mergeable, stable serialization) but exposes
  * it only as the driver-collected `DataFrameStatFunctions.bloomFilter`
  * and the internal runtime-filter aggregate; this wrapper makes it a
  * grouped, map-side-combining SQL aggregate.
  *
  * State is O(bits) regardless of group size — the only state shape an
  * index build is allowed at 100 TB — and the result is DETERMINISTIC:
  * the bit set is the OR of each key's bit pattern, independent of row
  * order, partitioning, and merge order (same reason the index is
  * rebuilt reproducibly). `expectedN`/`fpp` size the filter; merge
  * requires both sides born with the same parameters, which holds by
  * construction (one aggregate call = one parameterization).
  */
case class BloomAgg(
    child: Expression,
    expectedN: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(expectedN >= 1, s"bloom_agg needs expectedN >= 1, got $expectedN")
  require(fpp > 0 && fpp < 1, s"bloom_agg needs 0 < fpp < 1, got $fpp")

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedN, fpp)

  // Keys enter the filter by their NATIVE type: integral keys by value
  // (probe with mightContainLong), string/binary keys by raw UTF-8/raw
  // bytes (probe with mightContainString/mightContainBinary — Spark's
  // BloomFilter hashes a string via its UTF-8 bytes, so the two probes
  // agree). The long cast the index used to apply turned a uuid-ish
  // string id into NULL and blinded the filter.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType |
           StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_agg supports integral, string and binary keys, got $other")
    }

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buf.putBinary(v.asInstanceOf[Array[Byte]])
      case _          => buf.putLong(v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
