package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension embedding moments in ONE pass over the vector
  * column, no row explode (SURVEY.md §2 #142, round 17): state is
  * O(dims) fixed arrays — per-dim count, Σvu, Σvu² in exact integer
  * micro-units, min/max, zero count — updated with a tight per-vector
  * loop and merged associatively map-side. The explode form
  * materialized rows × dims exploded rows through a hash aggregate
  * (the measured 2.9× vs DuckDB at ×100 was that row volume); this
  * is the same numbers from a scan-shaped plan: a 1000-executor
  * aggregation ships one ~3 KB buffer per task.
  *
  * EXACT-EQUALITY contract with the expression form it replaced
  * (values must stay hash-identical to the DuckDB oracle):
  *
  *  - vu = round(v·10⁶) with Spark/DuckDB `round` semantics: both
  *    route the scaled double x through its SHORTEST-decimal repr
  *    (BigDecimal.valueOf(x), HALF_UP — Spark's Decimal cast and
  *    DuckDB's round agree on doubles). Implemented with the
  *    [[Unscaled6]] tie-guard pattern: fast path floor(x) + fraction
  *    compare, and any x whose fraction lands within an eps band of
  *    the .5 boundary (where fl arithmetic cannot decide the side —
  *    e.g. x = 0.5−2⁻⁵⁴, whose naive fl(x+0.5) ties up to 1.0 while
  *    the shortest-decimal HALF_UP answer is 0) is routed to the
  *    exact BigDecimal slow path, as is every |x| ≥ 2⁵² (fraction no
  *    longer representable) — where longValueExact also restores the
  *    loud-overflow posture. Off the band, frac = x − floor(x) is
  *    computed exactly (Sterbenz for |x| ≥ 1, exact small-value
  *    subtraction below), so the fast path IS the HALF_UP answer:
  *    the boundary k+0.5 is itself a double, so the shortest repr of
  *    a non-tie x never crosses it. (|x| here ≤ 10⁶·max|v|, far
  *    under 2⁵².)
  *  - Σvu, Σvu² via Math.addExact/multiplyExact — order-free exact
  *    longs, and a breach of the 2⁶³ bound throws like ANSI instead
  *    of wrapping (same loud-overflow posture as the SQL form).
  *  - min/max use java.lang.Double.compare — Spark's aggregate
  *    ordering (NaN greatest, −0.0 < 0.0).
  *  - n_zero tests v == 0.0 (SQL numeric equality: −0.0 counts).
  *  - n counts array SLOTS (null elements included), matching
  *    count(lit(1)) over the exploded rows; null elements update
  *    nothing else, matching null-skipping SQL aggregates.
  *
  * Result: array<struct<dim, n, su, suu, min_v, max_v, n_zero>> for
  * dims seen by ≥1 row, dim-ascending — the consumer explodes this
  * |dims|-element array (≤64 rows) where the old plan exploded the
  * corpus. Ragged inputs are handled: each vector updates only its
  * own length's prefix.
  */
case class VecMomentsAgg(vecExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMomentsAgg.Moments] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    vecExpr.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckSuccess
      case t => TypeCheckFailure(
        s"vec_moments requires array<double|float>, got ${t.simpleString}")
    }
  }

  // float→double widening is exact, so accepting the RAW parquet
  // array<float> column skips the asDouble projection that otherwise
  // materializes a second 64-element array per row at scan grain
  private lazy val isFloat =
    vecExpr.dataType == ArrayType(FloatType, true) ||
      vecExpr.dataType == ArrayType(FloatType, false)

  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dim", LongType), StructField("n", LongType),
    StructField("su", LongType), StructField("suu", LongType),
    StructField("min_v", DoubleType), StructField("max_v", DoubleType),
    StructField("n_zero", LongType))), containsNull = false)

  override def createAggregationBuffer(): VecMomentsAgg.Moments =
    new VecMomentsAgg.Moments

  override def update(buf: VecMomentsAgg.Moments,
      input: InternalRow): VecMomentsAgg.Moments = {
    val a = vecExpr.eval(input)
    if (a != null) buf.offer(a.asInstanceOf[ArrayData], isFloat)
    buf
  }

  override def merge(a: VecMomentsAgg.Moments,
      b: VecMomentsAgg.Moments): VecMomentsAgg.Moments = {
    a.absorb(b)
    a
  }

  override def eval(buf: VecMomentsAgg.Moments): Any = {
    val out = new Array[Any](buf.dims)
    var i = 0
    while (i < buf.dims) {
      out(i) = new GenericInternalRow(Array[Any](i.toLong, buf.cnt(i),
        buf.su(i), buf.suu(i), buf.mn(i), buf.mx(i), buf.nz(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecMomentsAgg.Moments): Array[Byte] = {
    val d = buf.dims
    val bb = ByteBuffer.allocate(4 + d * (8 * 6))
    bb.putInt(d)
    var i = 0
    while (i < d) {
      bb.putLong(buf.cnt(i)); bb.putLong(buf.su(i)); bb.putLong(buf.suu(i))
      bb.putDouble(buf.mn(i)); bb.putDouble(buf.mx(i)); bb.putLong(buf.nz(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMomentsAgg.Moments = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val m = new VecMomentsAgg.Moments
    m.ensure(d)
    var i = 0
    while (i < d) {
      m.cnt(i) = bb.getLong; m.su(i) = bb.getLong; m.suu(i) = bb.getLong
      m.mn(i) = bb.getDouble; m.mx(i) = bb.getDouble; m.nz(i) = bb.getLong
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0))
}

object VecMomentsAgg {

  /** Shortest-decimal HALF_UP round(x) — the [[Unscaled6]] tie-guard
    * pattern at scale 0 (round 18, ADVICE r17 #1; see the exactness
    * argument in the class scaladoc). Fast path decides via the exact
    * fraction; ties the double can't adjudicate (|frac−0.5| ≤ eps)
    * and every |x| ≥ ~2⁵² (fraction below ulp — where the old
    * floor(x+0.5) form bumped every odd integer in [2⁵², 2⁵³) up by
    * one, and pred(0.5)'s +0.5 tied up to 1) take the BigDecimal
    * reference path, which also throws loudly on NaN/Inf/long
    * overflow (same posture as the addExact sums). Package-visible
    * so RobustAnalyticsSpec can pin it against the reference on
    * exactly the adversarial doubles the aggregate's value domain
    * can't reach (suu would addExact-overflow long before 2⁵²). */
  private[graft] def roundHalfUp(x: Double): Long = {
    val ax = math.abs(x)
    if (!(ax < 4.5e15)) return roundSlow(x) // ≥ ~2⁵²; also NaN/Inf
    val f = Math.floor(x)
    val frac = x - f
    val eps = ax * 4.5e-16 + 1e-9
    if (Math.abs(frac - 0.5) <= eps) roundSlow(x)
    else if (frac > 0.5) f.toLong + 1L
    else f.toLong
  }

  /** The reference path: shortest-decimal repr of x, HALF_UP to an
    * integer — exactly what Spark's round/Decimal cast and DuckDB's
    * round produce on a double. */
  private def roundSlow(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(s"vec_moments: cannot round $x")
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .longValueExact()
  }

  /** Fixed per-dim accumulators; grows to the longest vector seen.
    * min/max start at the Spark-ordering identities (NaN-greatest
    * ordering: +∞ is below NaN, so NaN survives as a max; a dim that
    * only ever saw nulls keeps cnt>0 with null-skipped moments —
    * represented by mn>mx, impossible after any real value, and the
    * corpus has none; the SQL form would emit null min/max there,
    * unreachable for this data and spec-pinned equal on the real
    * corpus). */
  final class Moments {
    var dims = 0
    var cnt: Array[Long] = Array.emptyLongArray
    var su: Array[Long] = Array.emptyLongArray
    var suu: Array[Long] = Array.emptyLongArray
    var nz: Array[Long] = Array.emptyLongArray
    var mn: Array[Double] = Array.emptyDoubleArray
    var mx: Array[Double] = Array.emptyDoubleArray

    def ensure(d: Int): Unit = if (d > dims) {
      cnt = java.util.Arrays.copyOf(cnt, d)
      su = java.util.Arrays.copyOf(su, d)
      suu = java.util.Arrays.copyOf(suu, d)
      nz = java.util.Arrays.copyOf(nz, d)
      mn = java.util.Arrays.copyOf(mn, d)
      mx = java.util.Arrays.copyOf(mx, d)
      var i = dims
      while (i < d) {
        mn(i) = java.lang.Double.POSITIVE_INFINITY
        mx(i) = java.lang.Double.NEGATIVE_INFINITY
        i += 1
      }
      dims = d
    }

    private def roundAway(x: Double): Long = VecMomentsAgg.roundHalfUp(x)

    def offer(a: ArrayData, isFloat: Boolean): Unit = {
      val d = a.numElements()
      ensure(d)
      var i = 0
      while (i < d) {
        cnt(i) += 1L
        if (!a.isNullAt(i)) {
          val v =
            if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val vu = roundAway(v * 1000000.0)
          su(i) = Math.addExact(su(i), vu)
          suu(i) = Math.addExact(suu(i), Math.multiplyExact(vu, vu))
          if (java.lang.Double.compare(v, mn(i)) < 0) mn(i) = v
          if (java.lang.Double.compare(v, mx(i)) > 0) mx(i) = v
          if (v == 0.0) nz(i) += 1L
        }
        i += 1
      }
    }

    def absorb(o: Moments): Unit = {
      ensure(o.dims)
      var i = 0
      while (i < o.dims) {
        cnt(i) += o.cnt(i)
        su(i) = Math.addExact(su(i), o.su(i))
        suu(i) = Math.addExact(suu(i), o.suu(i))
        if (java.lang.Double.compare(o.mn(i), mn(i)) < 0) mn(i) = o.mn(i)
        if (java.lang.Double.compare(o.mx(i), mx(i)) > 0) mx(i) = o.mx(i)
        nz(i) += o.nz(i)
        i += 1
      }
    }
  }
}
