package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Buffer mechanics shared by the KMV family ([[KmvDistinct]],
  * [[KmvState]], [[KmvMerge]]): a bounded TreeSet of the k smallest
  * 64-bit hashes. Merging two KMV sketches is LOSSLESS with respect to
  * the union's k minima — the property that makes stored states
  * re-aggregatable: merge(state(A), state(B)) ≡ state(A ∪ B) exactly,
  * not approximately.
  */
private[functions] object KmvSketch {
  type Buf = java.util.TreeSet[java.lang.Long]

  def empty(): Buf = new java.util.TreeSet[java.lang.Long]()

  def add(buf: Buf, h: Long, k: Int): Unit = {
    buf.add(h)
    if (buf.size > k) { val _ = buf.pollLast() } // drop the largest — keep k minima
  }

  def mergeInto(buf: Buf, other: Buf, k: Int): Buf = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next().longValue(), k)
    buf
  }

  def estimate(buf: Buf, k: Int): Long =
    if (buf.size < k) buf.size.toLong
    else {
      // normalize the k-th minimum from [Long.Min, Long.Max] to (0, 1)
      val kth = buf.last().longValue()
      val uK = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      math.round((k - 1).toDouble / uK)
    }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = empty()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

/** K-Minimum-Values distinct-count sketch as a
  * `TypedImperativeAggregate` — the extension tier SURVEY.md §2.B
  * reserves for heavy sketches (an `Aggregator`/udaf would box the
  * buffer per row; this keeps one mutable sketch per partition and
  * ships it as bytes between partial and final aggregation).
  *
  * Sketch: keep the k smallest 64-bit hashes of the inputs. With u_k =
  * the k-th smallest hash normalized to (0,1), estimate = (k-1)/u_k.
  * Constant memory (k longs) per group regardless of cardinality — the
  * 100 TB story — and exact below k distinct values. The child is
  * expected to be a 64-bit hash (the `kmv_distinct` SQL builder in
  * [[GraftExtensions]] wraps arbitrary input in xxhash64).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KmvSketch.Buf = KmvSketch.empty()

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null) KmvSketch.add(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf =
    KmvSketch.mergeInto(buf, other, k)

  override def eval(buf: KmvSketch.Buf): Any = KmvSketch.estimate(buf, k)

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = KmvSketch.serialize(buf)

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

/** Emits the SERIALIZED sketch instead of the estimate — the
  * pre-aggregation half of the incremental-rollup pattern: a daily job
  * stores one small binary state per (group, day); later readers merge
  * states with [[KmvMerge]] instead of rescanning raw data. At 100 TB
  * this is the difference between an O(day) incremental pipeline and
  * an O(history) daily rescan. Input contract matches [[KmvDistinct]]
  * (a 64-bit hash; the SQL builder wraps inputs in xxhash64).
  */
case class KmvState(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_state"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KmvSketch.Buf = KmvSketch.empty()

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null) KmvSketch.add(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf =
    KmvSketch.mergeInto(buf, other, k)

  override def eval(buf: KmvSketch.Buf): Any = KmvSketch.serialize(buf)

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = KmvSketch.serialize(buf)

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvState =
    copy(child = newChildren.head)
}

/** Merges serialized [[KmvState]] sketches and evaluates the distinct
  * estimate — the read half of the incremental-rollup pattern. Because
  * KMV merge is lossless for the union's k minima,
  * `kmv_merge(kmv_state(x) per part)` equals `kmv_distinct(x)` over
  * the whole input EXACTLY (asserted in KmvDistinctSpec), so stored
  * daily states never drift from a full recompute.
  */
case class KmvMerge(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY kmv_state input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KmvSketch.Buf = KmvSketch.empty()

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null)
      KmvSketch.mergeInto(buf, KmvSketch.deserialize(v.asInstanceOf[Array[Byte]]), k)
    buf
  }

  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf =
    KmvSketch.mergeInto(buf, other, k)

  override def eval(buf: KmvSketch.Buf): Any = KmvSketch.estimate(buf, k)

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = KmvSketch.serialize(buf)

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge =
    copy(child = newChildren.head)
}
