package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic numeric aggregation helpers.
  *
  * Double sums are order-dependent, and Spark's partitioned partial
  * aggregation sums in nondeterministic order — so a plain
  * `sum(double)` can differ run-to-run AND from the DuckDB oracle in
  * the last ulp. Casting to decimal first makes the sum exact and
  * therefore independent of partitioning (any cluster size gives the
  * bit-identical answer). `decimal(28,6)` cannot hit a rounding tie:
  * no double is exactly k+0.5 × 10⁻⁶ (the denominator has a factor
  * 5⁶, which is not dyadic), so Spark's HALF_UP and DuckDB's
  * round-to-nearest agree on every representable input.
  */
object Num {
  val Dec = "decimal(28,6)"

  /** Exact, order-independent sum of a double column → double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact mean: decimal sum / count, divided in double (deterministic
    * given identical operands). */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")
}
