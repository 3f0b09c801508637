package graft

import graft.operators.Num
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 128-bit exact-sum aggregate behind Num.dsum must be
  * bit-identical to the decimal(28,6) built-in Sum it replaced —
  * including the carry across the 2^64 low-word boundary, negative
  * inputs (sign-extended high word), nulls, and the distributed
  * merge path.
  */
class DecimalSum128Spec extends SparkTestBase {
  import spark.implicits._

  /** The pre-kernel form: exact, BigDecimal-backed. */
  private def dsumWide(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  private def bothSums(xs: Seq[Option[Double]], parts: Int): (Any, Any) = {
    val df = xs.map(_.map(java.lang.Double.valueOf).orNull)
      .toDF("x").repartition(parts)
    val r = df.agg(Num.dsum(col("x")).as("fast"),
      dsumWide(col("x")).as("wide")).head()
    (r.get(0), r.get(1))
  }

  test("parity with decimal(28,6) sum on random signed doubles, merged across partitions") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(10000)(Some(
      (rnd.nextDouble() - 0.5) * 2e6 * math.pow(10, rnd.nextInt(6) - 3)))
    val (fast, wide) = bothSums(xs, parts = 7)
    assert(fast === wide)
  }

  test("carry across the 2^64 boundary: many near-max inputs") {
    // scaled values ~1e18 each; 40 of them ⇒ |sum| ~4e19 > 2^63-1,
    // so the low word wraps and the high word must carry correctly
    val xs = Seq.fill(40)(Some(9.99999e11)) ++ Seq.fill(5)(Some(-9.99999e11))
    val (fast, wide) = bothSums(xs, parts = 5)
    assert(fast === wide)
    assert(math.abs(fast.asInstanceOf[Double] - 35 * 9.99999e11) < 1e6)
  }

  test("negative-dominated sums (high word stays -1 territory)") {
    val xs = Seq(Some(-0.000001), Some(-123456789.123456), Some(0.25),
      Some(-1e-6), Some(-999999999999.99))
    val (fast, wide) = bothSums(xs, parts = 3)
    assert(fast === wide)
  }

  test("nulls are skipped; all-null and empty groups yield null") {
    val (fast, wide) = bothSums(Seq(Some(1.5), None, Some(2.25), None), 2)
    assert(fast === 3.75 && wide === 3.75)
    val (fNull, wNull) = bothSums(Seq(None, None), 2)
    assert(fNull == null && wNull == null)
    val (fEmpty, wEmpty) = bothSums(Seq.empty, 1)
    assert(fEmpty == null && wEmpty == null)
  }

  test("per-group results under groupBy match the wide form") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i % 13, (rnd.nextDouble() - 0.5) * 1e7))
      .toDF("k", "x").repartition(6)
    val joined = df.groupBy("k").agg(Num.dsum(col("x")).as("fast"))
      .join(df.groupBy("k").agg(dsumWide(col("x")).as("wide")), "k")
    assert(joined.filter(col("fast") =!= col("wide")).count() === 0)
    assert(joined.count() === 13)
  }

  test("q1 aggregate stays a two-phase codegen'd HashAggregate") {
    val plan = planOf(
      graft.operators.Analytics.q1Agg(spark, SfDir))
    assert(plan.contains("partial_decimal_sum128"), plan.take(2000))
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(!plan.toLowerCase.contains("objecthashaggregate"), plan.take(2000))
  }
}
