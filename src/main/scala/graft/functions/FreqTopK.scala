package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary shared by [[FreqTopK]]: a bounded
  * map item → counter with the classic decrement-all eviction, plus the
  * Agarwal-et-al. mergeable-summaries combine (sum counts, then subtract
  * the (capacity+1)-th largest count and drop non-positive counters).
  * Guarantees: each counter underestimates the true count by at most
  * N/(capacity+1) (N = total stream length INCLUDING merged inputs),
  * and any item with true frequency > N/(capacity+1) is present. When
  * the distinct-item count never exceeds the capacity — the regime the
  * correctness gate pins — no eviction or subtraction ever fires and
  * every counter is EXACT, distributed merge included.
  */
private[functions] object MgSummary {
  type Buf = java.util.HashMap[String, Long]

  def empty(): Buf = new java.util.HashMap[String, Long]()

  def add(buf: Buf, item: String, capacity: Int): Unit = {
    val c = buf.get(item)
    if (c != 0L || buf.containsKey(item)) buf.put(item, c + 1)
    else if (buf.size < capacity) buf.put(item, 1L)
    else {
      // full and item unseen: decrement every counter, dropping zeros —
      // the textbook O(capacity) eviction, amortized O(1) per stream item
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
  }

  def mergeInto(buf: Buf, other: Buf, capacity: Int): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = buf.get(e.getKey)
      buf.put(e.getKey, (if (buf.containsKey(e.getKey)) c else 0L) + e.getValue)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop ≤ 0 —
      // keeps the summary at ≤ capacity counters with the MG error bound
      val counts = new Array[Long](buf.size)
      var i = 0
      val vt = buf.values().iterator()
      while (vt.hasNext) { counts(i) = vt.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val jt = buf.entrySet().iterator()
      while (jt.hasNext) {
        val e = jt.next()
        if (e.getValue <= cut) jt.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  /** Top-k by (count desc, item asc), serialized `item:count` joined by
    * a single space — a STRING so gate outputs stay hashable (the
    * driver's pandas compare cannot sort array cells).
    */
  // item asc by UTF-8 BYTES, not String.compareTo: the DuckDB oracles
  // break count ties in UTF-8 binary collation, and UTF-16 code-unit
  // order inverts U+E000..U+FFFF vs supplementary-plane items
  private def utf8Compare(a: String, b: String): Int = {
    val ab = a.getBytes(StandardCharsets.UTF_8)
    val bb = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val c = java.lang.Integer.compare(ab(i) & 0xff, bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(ab.length, bb.length)
  }

  def topK(buf: Buf, k: Int): String = {
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Long]](buf.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Long]] {
        def compare(a: java.util.Map.Entry[String, Long],
            b: java.util.Map.Entry[String, Long]): Int = {
          val byCount = java.lang.Long.compare(b.getValue, a.getValue)
          if (byCount != 0) byCount else utf8Compare(a.getKey, b.getKey)
        }
      })
    val sb = new StringBuilder
    var i = 0
    while (i < entries.size && i < k) {
      if (i > 0) sb.append(' ')
      sb.append(entries.get(i).getKey).append(':').append(entries.get(i).getValue)
      i += 1
    }
    sb.toString
  }

  def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = empty()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }
}

/** Heavy-hitters aggregate `freq_topk(item, k, capacity)` — the
  * frequent-items counterpart of [[KmvDistinct]] in the sketch tier:
  * constant memory (≤ capacity counters) per group regardless of
  * cardinality, partial-aggregated map-side so a hot group never
  * concentrates raw rows on one task, and EXACT whenever the group's
  * distinct-item count stays within capacity (the gate regime; the
  * approximate regime's N/(capacity+1) error bound is FreqTopKSpec's
  * job). Emits the top k as an `item:count` string ordered by
  * (count desc, item asc). The 100 TB use: per-language / per-domain
  * vocabulary heads over token streams where an exact GROUP BY token
  * would shuffle the full corpus — this ships one bounded summary per
  * group instead.
  */
case class FreqTopK(
    child: Expression,
    k: Int = 10,
    capacity: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "freq_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MgSummary.Buf = MgSummary.empty()

  override def update(buf: MgSummary.Buf, input: InternalRow): MgSummary.Buf = {
    val v = child.eval(input)
    if (v != null) MgSummary.add(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(buf: MgSummary.Buf, other: MgSummary.Buf): MgSummary.Buf =
    MgSummary.mergeInto(buf, other, capacity)

  override def eval(buf: MgSummary.Buf): Any =
    UTF8String.fromString(MgSummary.topK(buf, k))

  override def serialize(buf: MgSummary.Buf): Array[Byte] = MgSummary.serialize(buf)

  override def deserialize(bytes: Array[Byte]): MgSummary.Buf =
    MgSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqTopK =
    copy(child = newChildren.head)
}
