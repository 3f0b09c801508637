package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RuntimeReplaceable, UnaryExpression, UnscaledValue}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Alloc-free 6-dp unscaled-long conversion: the per-row front half of
  * every exact sum (`Num.dsum` pipes doubles through
  * `UnscaledValue(Cast(x AS DECIMAL(18,6)))` into [[DecimalSum128]]).
  * The Cast constructs a `BigDecimal` per row — ×4 aggregates in a
  * Q1-shaped pack, that allocation IS the aggregate's hot cost at the
  * ×50 corpus (profiled round 10: the scan-stage partial agg dominates
  * q1_agg, and the decimal casts dominate the partial agg).
  *
  * Semantics are BIT-IDENTICAL to the Cast path by construction:
  * `BigDecimal.valueOf(x)` takes the SHORTEST-decimal representation
  * of the double, then `setScale(6, HALF_UP)`. The kernel computes
  * `round(x·10⁶)` in double arithmetic — exact for every input whose
  * 6-dp fraction lands measurably away from a .5 tie — and detects
  * the ties it cannot decide in binary (|frac−0.5| within the
  * accumulated 2-ulp error bound of the scaled product) plus every
  * |x| ≥ 2⁵²/10⁶ (where doubles stop resolving 6 dp at all), routing
  * ONLY those rows through the exact BigDecimal path. The tie band
  * has measure ~10⁻¹⁵ of the domain, so the slow path is a per-task
  * rarity, not a per-row cost; correctness does not depend on its
  * rarity. ANSI contract preserved: |x| ≥ 10¹² (decimal(18,6)
  * overflow) throws, NaN/Inf throw — same fail-loudly behavior as
  * the Cast, asserted in Unscaled6Spec alongside randomized and
  * tie-crafted equality vs the reference. */
case class Unscaled6(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case DoubleType => TypeCheckSuccess
      case t => TypeCheckFailure(
        s"unscaled6 requires double, got ${t.simpleString}")
    }
  }

  override def nullSafeEval(v: Any): Any =
    Unscaled6.compute(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Unscaled6.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Type-routing front for [[Unscaled6]]: doubles take the alloc-free
  * kernel; ANY other numeric keeps the long-backed
  * `UnscaledValue(Cast(x AS DECIMAL(18,6)))` reference path. The
  * route is picked at analysis time from the RESOLVED child type —
  * a blanket cast-to-double here would silently round a long or
  * decimal carrying more than ~15-17 significant digits before the
  * 6-dp scaling ever saw it. */
case class Unscaled6Any(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case DoubleType => Unscaled6(child)
    case _ => UnscaledValue(Cast(child, DecimalType(18, 6)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Unscaled6 {
  /** Above this, a double's ulp exceeds 10⁻⁶ of its value — every
    * row must take the exact path (and will overflow-check there). */
  private val FastMax = 4.5e9 // < 2^52/1e6 with margin

  def compute(x: Double): Long = {
    val ax = math.abs(x)
    if (!(ax < FastMax)) return slow(x) // also routes NaN/Inf/huge
    val y = x * 1e6
    val f = Math.floor(y)
    val frac = y - f
    // 2-ulp error of the scaled product + repr slack; constant floor
    // covers tiny |y| where relative terms vanish
    val eps = Math.abs(y) * 4.5e-16 + 1e-9
    if (Math.abs(frac - 0.5) <= eps) slow(x)
    else if (frac > 0.5) f.toLong + 1L
    else f.toLong
  }

  /** The reference path: exactly what `Cast(x AS DECIMAL(18,6))` +
    * `UnscaledValue` produce (shortest-decimal repr, HALF_UP),
    * failing loudly on overflow like the ANSI cast. */
  def slow(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(s"unscaled6: cannot cast $x to decimal(18,6)")
    val u = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (u.precision > 18)
      throw new ArithmeticException(
        s"unscaled6: $x overflows decimal(18,6)")
    u.unscaledValue().longValueExact()
  }
}
