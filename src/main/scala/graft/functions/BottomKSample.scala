package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Buffer mechanics shared by the bottom-k sample family ([[BksState]],
  * [[BksQuantile]], [[BksQuantileMerge]]): the k (priority, value)
  * pairs with the smallest priorities — a DETERMINISTIC uniform row
  * sample when the priority is a uniform hash of a unique row key
  * (bottom-k / coordinated sampling: Cohen & Kaplan, "Summarizing data
  * using bottom-k sketches", 2007). Two properties carry the design:
  *
  *  - LOSSLESS MERGE: the bottom-k of a union equals the bottom-k of
  *    the parts' bottom-ks, so stored per-day states re-aggregate to
  *    exactly the state a full rescan would build (the KMV property,
  *    reused for row sampling instead of distinct counting);
  *  - DETERMINISM: priorities come from the DATA (md5 of the row key
  *    on the caller side), not an RNG, so the sample — and any
  *    statistic computed from it — is reproducible and
  *    cross-engine-checkable exactly, not just within tolerance.
  *
  * Quantiles from the sample: sort the k sampled VALUES and pick the
  * lower-quantile element at index `(n-1)·p div 1000` (permille p,
  * pure integer arithmetic — `quantile_disc` semantics on the
  * sample). Exact whenever the group has ≤ k rows; a √(p(1-p)/k)
  * binomial-order error otherwise. Priority ties (two distinct rows
  * hashing equal) keep the smaller value — an arbitrary but
  * DETERMINISTIC rule mirrored in the oracle, so the gate stays exact
  * even on an adversarial fixture.
  *
  * At 100 TB: per (group, partition) the state is ≤ k pairs of longs,
  * map-side combined; the shuffle carries O(k · groups), never O(rows)
  * — the same contract as the KMV rollup, now for order statistics.
  */
private[functions] object BkSample {
  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  def empty(): Buf = new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  def add(buf: Buf, priority: Long, value: Long, k: Int): Unit = {
    val prev = buf.get(priority)
    if (prev == null || prev.longValue() > value) buf.put(priority, value)
    if (buf.size > k) { val _ = buf.pollLastEntry() }
  }

  def mergeInto(buf: Buf, other: Buf, k: Int): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey.longValue(), e.getValue.longValue(), k)
    }
    buf
  }

  /** Lower quantile of the sampled values at permille p (0..1000). */
  def quantile(buf: Buf, pPermille: Int): Any =
    if (buf.isEmpty) null
    else {
      val values = new Array[Long](buf.size)
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { values(i) = it.next().longValue(); i += 1 }
      java.util.Arrays.sort(values)
      values(((values.length - 1).toLong * pPermille / 1000L).toInt)
    }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = empty()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

/** Shared TypedImperativeAggregate plumbing for the family. */
private[functions] trait BksAgg extends TypedImperativeAggregate[BkSample.Buf] {
  def k: Int
  override def nullable: Boolean = true
  override def createAggregationBuffer(): BkSample.Buf = BkSample.empty()
  override def merge(buf: BkSample.Buf, other: BkSample.Buf): BkSample.Buf =
    BkSample.mergeInto(buf, other, k)
  override def serialize(buf: BkSample.Buf): Array[Byte] = BkSample.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BkSample.Buf =
    BkSample.deserialize(bytes)
}

/** `bks_quantile(priority, value, p_permille[, k])` — single-shot:
  * sample bottom-k rows by priority, return the sample's lower
  * quantile at p. */
case class BksQuantile(
    priority: Expression,
    value: Expression,
    pPermille: Int,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BksAgg {

  require(pPermille >= 0 && pPermille <= 1000,
    s"bks_quantile: p_permille must be in [0, 1000], got $pPermille")

  override def children: Seq[Expression] = Seq(priority, value)
  override def dataType: DataType = LongType
  override def prettyName: String = "bks_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (priority.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT priority, BIGINT value)")

  override def update(buf: BkSample.Buf, input: InternalRow): BkSample.Buf = {
    val p = priority.eval(input)
    val v = value.eval(input)
    if (p != null && v != null)
      BkSample.add(buf, p.asInstanceOf[Long], v.asInstanceOf[Long], k)
    buf
  }

  override def eval(buf: BkSample.Buf): Any = BkSample.quantile(buf, pPermille)

  override def withNewMutableAggBufferOffset(newOffset: Int): BksQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BksQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BksQuantile =
    copy(priority = newChildren.head, value = newChildren(1))
}

/** `bks_state(priority, value[, k])` — emits the SERIALIZED sample:
  * the write half of the incremental rollup (one small binary per
  * (group, day); later readers merge states instead of rescanning). */
case class BksState(
    priority: Expression,
    value: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BksAgg {

  override def children: Seq[Expression] = Seq(priority, value)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bks_state"

  override def checkInputDataTypes(): TypeCheckResult =
    if (priority.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT priority, BIGINT value)")

  override def update(buf: BkSample.Buf, input: InternalRow): BkSample.Buf = {
    val p = priority.eval(input)
    val v = value.eval(input)
    if (p != null && v != null)
      BkSample.add(buf, p.asInstanceOf[Long], v.asInstanceOf[Long], k)
    buf
  }

  override def eval(buf: BkSample.Buf): Any = BkSample.serialize(buf)

  override def withNewMutableAggBufferOffset(newOffset: Int): BksState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BksState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BksState =
    copy(priority = newChildren.head, value = newChildren(1))
}

/** `bks_quantile_merge(state, p_permille[, k])` — merges serialized
  * [[BksState]] samples and evaluates the quantile. Because bottom-k
  * merge is lossless, `bks_quantile_merge(bks_state(...) per part)`
  * equals `bks_quantile(...)` over the whole input EXACTLY (asserted
  * in BkSampleSpec), so stored daily states never drift from a full
  * recompute. */
case class BksQuantileMerge(
    child: Expression,
    pPermille: Int,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BksAgg {

  require(pPermille >= 0 && pPermille <= 1000,
    s"bks_quantile_merge: p_permille must be in [0, 1000], got $pPermille")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "bks_quantile_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY bks_state input, got ${child.dataType.simpleString}")

  override def update(buf: BkSample.Buf, input: InternalRow): BkSample.Buf = {
    val v = child.eval(input)
    if (v != null)
      BkSample.mergeInto(buf, BkSample.deserialize(v.asInstanceOf[Array[Byte]]), k)
    buf
  }

  override def eval(buf: BkSample.Buf): Any = BkSample.quantile(buf, pPermille)

  override def withNewMutableAggBufferOffset(newOffset: Int): BksQuantileMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BksQuantileMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BksQuantileMerge =
    copy(child = newChildren.head)
}
