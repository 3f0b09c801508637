package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch (SURVEY.md §2 #91): tracks up to
  * `capacity` candidate keys with O(capacity) state per group per
  * task, merged associatively map-side — the mergeable-summaries
  * form (sum counts item-wise, then subtract the (capacity+1)-th
  * largest count and drop non-positives), so a 1000-executor
  * aggregation is one shuffle of bounded sketches, never a
  * groupBy over the full key domain.
  *
  * Guarantees (the MG bounds, with batched decrements): counts are
  * never over-estimated (`est ≤ true`), the total undercount is
  * bounded by the TRACKED decrement total (`true - est ≤ max_err`,
  * where max_err is reported in the result, not just bounded a
  * priori), and every decrement unit removes ≥ capacity units of
  * count mass, so `max_err ≤ n / capacity` — every key with true
  * frequency above n/capacity is PRESENT in the sketch (no
  * false-negative heavy hitters). When the observed key domain never
  * exceeds
  * `capacity` (no decrement ever fires), `max_err = 0` and every
  * count is EXACT — the regime the DuckDB oracle checks; the
  * approximate regime is property-tested in FrequencySpec.
  *
  * Result: struct<items array<struct<item bigint, est bigint>>
  * (item-ascending), max_err bigint>.
  */
case class FreqSketchAgg(keyExpr: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketchAgg.Sketch] {
  require(capacity > 0, "capacity must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (keyExpr.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"freq_sketch requires a bigint key, got " +
      keyExpr.dataType.simpleString)
  }

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", LongType), StructField("est", LongType))),
      containsNull = false)),
    StructField("max_err", LongType)))

  override def createAggregationBuffer(): FreqSketchAgg.Sketch =
    new FreqSketchAgg.Sketch(capacity)

  override def update(buf: FreqSketchAgg.Sketch,
      input: InternalRow): FreqSketchAgg.Sketch = {
    val k = keyExpr.eval(input)
    if (k != null) buf.offer(k.asInstanceOf[Long])
    buf
  }

  override def merge(a: FreqSketchAgg.Sketch,
      b: FreqSketchAgg.Sketch): FreqSketchAgg.Sketch = {
    a.absorb(b)
    a
  }

  override def eval(buf: FreqSketchAgg.Sketch): Any = {
    val items = buf.sortedItems
    new GenericInternalRow(Array[Any](
      new GenericArrayData(items.map { case (k, c) =>
        new GenericInternalRow(Array[Any](k, c))
      }),
      buf.decrements))
  }

  override def serialize(buf: FreqSketchAgg.Sketch): Array[Byte] = {
    val items = buf.sortedItems
    val bb = ByteBuffer.allocate(4 + 8 + items.length * 16)
    bb.putInt(items.length)
    bb.putLong(buf.decrements)
    items.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchAgg.Sketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new FreqSketchAgg.Sketch(capacity)
    s.decrements = bb.getLong
    (0 until n).foreach(_ => s.put(bb.getLong, bb.getLong))
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keyExpr = newChildren(0))
}

object FreqSketchAgg {
  /** The MG candidate table. Decrements are batched: on overflow the
    * MINIMUM retained count is subtracted from every entry (instead
    * of the textbook -1), which drops at least one entry per
    * eviction pass while preserving the invariant that a key's
    * undercount never exceeds the running `decrements` total. */
  final class Sketch(capacity: Int) {
    private val counts = new java.util.HashMap[Long, Long](capacity * 2)
    /** Total count mass subtracted per surviving key (the max_err). */
    var decrements: Long = 0L

    def put(k: Long, c: Long): Unit = counts.put(k, c)

    def offer(k: Long): Unit = {
      val cur = counts.get(k)
      if (cur != 0L || counts.containsKey(k)) counts.put(k, cur + 1L)
      else if (counts.size < capacity) counts.put(k, 1L)
      else {
        // batched decrement: subtract the min count m. Every retained
        // count is ≥ 1, so m ≥ 1 and the incoming key's virtual count
        // of 1 is always fully absorbed by the decrement — it never
        // survives an eviction pass (its mass is accounted in
        // `decrements` like any other evicted key's).
        var m = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) m = math.min(m, it0.next())
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nc = e.getValue - m
          if (nc <= 0L) it.remove() else e.setValue(nc)
        }
        decrements += m
      }
    }

    /** Mergeable-summaries combine: add counts item-wise, then if
      * over capacity subtract the (capacity+1)-th largest count. */
    def absorb(other: Sketch): Unit = {
      decrements += other.decrements
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > capacity) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        // keep the capacity largest: subtract the largest EVICTED count
        val cut = vals(vals.length - capacity - 1)
        val ei = counts.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          val nc = e.getValue - cut
          if (nc <= 0L) ei.remove() else e.setValue(nc)
        }
        decrements += cut
      }
    }

    def sortedItems: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](counts.size)
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
      java.util.Arrays.sort(out, Ordering.by((p: (Long, Long)) => p._1))
      out
    }
  }
}
