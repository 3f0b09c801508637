package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Components}
import graft.sources.Tables

/** Graph/revenue report operators (SURVEY §2 #166-168): structural
  * invariants beyond the value-level DuckDB oracles. */
class GraphRevenueSpec extends SparkTestBase {

  test("triangle_count: participation sums to 3x total, ranks dense") {
    val out = Components.triangleCount(spark, SfDir).collect()
    assert(out.nonEmpty)
    val total = out.head.getAs[Long]("total_tri")
    assert(total > 0L, "co-purchase graph has no triangles — vacuous")
    assert(out.map(_.getAs[Long]("rnk")).toSeq === (1L to out.length))
    // top participants exist and are bounded by total (each triangle
    // contributes one count to each of its three corners)
    out.foreach(r => assert(r.getAs[Long]("n_tri") <= total))
  }

  test("abc_analysis: classes partition the catalog, shares ordered") {
    val out = Analytics.abcAnalysis(spark, SfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val nParts = Tables.load(spark, SfDir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(out.values.map(_._1).sum === nParts)
    // share semantics: A <= 0.8 cumulative by construction, and the
    // three shares sum to ~1 (terminal rounding only)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-4)
    assert(out("A")._3 <= 0.8 + 1e-6)
    // the Pareto shape: the A class carries the dominant share
    assert(out("A")._3 > out.getOrElse("B", (0L, 0.0, 0.0))._3)
    assert(out("A")._3 > out.getOrElse("C", (0L, 0.0, 0.0))._3)
  }

  test("ship_lag: percentiles within min/max, counts cover the join") {
    val out = Analytics.shipLag(spark, SfDir).collect()
    val li = Tables.load(spark, SfDir, "lineitem").count()
    assert(out.map(_.getAs[Long]("n")).sum === li)
    out.foreach { r =>
      val mn = r.getAs[Long]("min_days").toDouble
      val mx = r.getAs[Long]("max_days").toDouble
      val p50 = r.getAs[Double]("p50_days")
      val p90 = r.getAs[Double]("p90_days")
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
      val avg = r.getAs[Double]("avg_days")
      assert(avg >= mn && avg <= mx)
    }
  }
}
