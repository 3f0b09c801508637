package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.Unscaled6

/** The alloc-free 6-dp conversion must be BIT-IDENTICAL to the
  * `UnscaledValue(Cast(x AS DECIMAL(18,6)))` reference on every
  * representable input — including the half-up tie band the fast
  * path routes to the exact branch. */
class Unscaled6Spec extends SparkTestBase {
  import spark.implicits._

  private def ref(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("randomized equality vs the BigDecimal reference") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(200000) {
      rnd.nextInt(6) match {
        case 0 => rnd.nextDouble()                       // [0,1)
        case 1 => (rnd.nextDouble() - 0.5) * 2e4         // price-ish
        case 2 => (rnd.nextDouble() - 0.5) * 2e11        // near the bound
        case 3 => rnd.nextInt(100000) / 100.0            // 2-dp money
        case 4 => rnd.nextInt(2000000) * 5e-7            // exact .5 ties
        case _ => java.lang.Double.longBitsToDouble(     // adversarial bits
          (rnd.nextLong() & 0x3fffffffffffffffL) | 0x3ff0000000000000L)
      }
    }
    xs.foreach { x =>
      assert(Unscaled6.compute(x) === ref(x), s"mismatch at $x")
    }
  }

  test("crafted ties and boundaries round HALF_UP both ways") {
    // exact k + 0.5·10⁻⁶ values are representable only approximately
    // in binary, but their SHORTEST repr can still read '...5': e.g.
    // 0.0000005 parses to a double whose shortest repr IS 0.0000005,
    // so HALF_UP must round it UP; same for the negative (away from 0)
    assert(Unscaled6.compute(0.0000005) === ref(0.0000005))
    assert(Unscaled6.compute(-0.0000005) === ref(-0.0000005))
    assert(ref(0.0000005) === 1L)
    assert(ref(-0.0000005) === -1L)
    for (k <- 0 to 2000) {
      val x = k + 0.5e-6
      assert(Unscaled6.compute(x) === ref(x), s"tie at $x")
      assert(Unscaled6.compute(-x) === ref(-x), s"tie at -$x")
      val y = k + 1.5e-6
      assert(Unscaled6.compute(y) === ref(y), s"tie at $y")
    }
    // integer boundaries (frac ≈ 0/1) and denormal-small values
    // (999999999999.999999 is NOT a boundary case: ulp at 1e12 is
    // ~1.2e-4, so that literal parses to exactly 1.0e12 — overflow,
    // covered in the overflow test)
    for (x <- Seq(1.0, 2.9999999999, 3.0000000001, 1e-12, -1e-12, 0.0,
        4.4e9, -4.4e9, 4.6e9, 999999999999.9998, -999999999999.4)) {
      assert(Unscaled6.compute(x) === ref(x), s"boundary at $x")
    }
  }

  test("overflow and non-finite fail loudly like the ANSI cast") {
    intercept[ArithmeticException](Unscaled6.compute(Double.NaN))
    intercept[ArithmeticException](Unscaled6.compute(Double.PositiveInfinity))
    intercept[ArithmeticException](Unscaled6.compute(1e12))
    intercept[ArithmeticException](Unscaled6.compute(-1e12))
    // just inside the bound is fine
    assert(Unscaled6.compute(999999999999.9999) === ref(999999999999.9999))
  }

  test("non-double inputs keep the exact decimal cast path (no double round-trip)") {
    // 0.9999995 - 1e-18 (scale 18, exact under the default
    // decimal(38,18) encoder): HALF_UP at 6 dp rounds DOWN (digits
    // past the 6th are 4999…), but the nearest double is
    // shortest-repr "0.9999995", which the double path would round
    // UP. The analysis-time route must pick
    // UnscaledValue(Cast(decimal(18,6))) for decimal children so no
    // digit is lost to a double round-trip.
    val x = new java.math.BigDecimal("0.999999499999999999")
    assert(x.setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact() === 999999L)
    assert(java.math.BigDecimal.valueOf(x.doubleValue())
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact() === 1000000L,
      "double round-trip crosses the tie — the case the route avoids")
    val got = Seq(x).toDF("x")
      .select(graft.operators.Num.unscaled6(col("x")).as("u"))
      .as[Long].head()
    assert(got === 999999L,
      "decimal input must not round through double")
    // doubles still take the kernel (same answer as the reference)
    val d = Seq(1.2345675).toDF("x")
      .select(graft.operators.Num.unscaled6(col("x")).as("u"))
      .as[Long].head()
    assert(d === ref(1.2345675))
  }

  test("dsum over the kernel equals the decimal-cast SQL form on real data") {
    val got = graft.sources.Tables.load(spark, SfDir, "events")
      .agg(graft.operators.Num.dsum(col("value")).as("s"))
      .as[Double].head()
    val want = graft.sources.Tables.load(spark, SfDir, "events")
      .selectExpr("cast(sum(cast(value as decimal(28,6))) as double) AS s")
      .as[Double].head()
    assert(got === want, "kernel dsum must equal the decimal-cast sum")
  }
}
