package graft.dedup

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Catalyst-native mergeable Bloom aggregate (SURVEY.md §4.3: "custom
  * Aggregator: mergeable, persistable Bloom filter for the URL-seen set").
  *
  * A `TypedImperativeAggregate[BloomFilter]` — the same machinery Spark's
  * own `stat.bloomFilter` uses internally — so the build gets map-side
  * partial aggregation for free: each task inserts into a partition-local
  * filter, partials OR-merge on the reducer, one serialized filter comes
  * out. This replaces the engine's last RDD usage (a mapPartitions+fold)
  * with a first-class expression usable from the DataFrame API.
  *
  * Fixed `capacity` keeps every produced filter bit-compatible so per-tick
  * sketches persist and merge across runs (see [[BloomSeen]]).
  */
case class BloomAggregate(
    child: Expression,
    capacity: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(capacity, 1L), fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)
}

object BloomAggregate {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry: `df.agg(bloomAgg($"url", cap, fpp))` → binary. */
  def bloomAgg(c: Column, capacity: Long, fpp: Double): Column =
    ColumnBridge.column(
      new BloomAggregate(ColumnBridge.expression(c), capacity, fpp)
        .toAggregateExpression(isDistinct = false))
}
