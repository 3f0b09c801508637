package graft

import graft.operators.{Analytics, Dimensional, Olap}
import graft.sources.Tables

/** Warehouse/report operators (SURVEY §2 #157-160): conservation and
  * bound invariants the value-level DuckDB oracles can't express. */
class WarehouseOpsSpec extends SparkTestBase {

  test("snapshot_diff conserves rows across its classes") {
    val m = Dimensional.snapshotDiff(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // overlap counted two ways must agree
    assert(m("rows_a") - m("removed") === m("changed") + m("unchanged"))
    assert(m("rows_b") - m("added") === m("changed") + m("unchanged"))
    // per-column change counts bound the changed class
    assert(m("chg_totalprice") <= m("changed"))
    assert(m("chg_orderstatus") <= m("changed"))
    // the derived snapshots actually differ in all classes
    Seq("added", "removed", "changed").foreach(k => assert(m(k) > 0, k))
  }

  test("scd2_lookup accounts for every click exactly once") {
    val out = Dimensional.scd2Lookup(spark, SfDir).collect()
    val clicks = Tables.load(spark, SfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .count()
    assert(out.map(_.getAs[Long]("n_clicks")).sum === clicks)
    out.foreach { r =>
      val v = r.getAs[Long]("version")
      if (v > 0) assert(!r.isNullAt(r.fieldIndex("price")))
      else assert(r.isNullAt(r.fieldIndex("price")))
    }
  }

  test("ols_brand covers lineitem, r2 within bounds") {
    val out = Analytics.olsBrand(spark, SfDir).collect()
    val li = Tables.load(spark, SfDir, "lineitem").count()
    assert(out.map(_.getAs[Long]("n")).sum === li)
    out.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"${r.getString(0)} r2=$r2")
    }
  }

  test("column_profile: totals, modal bound, max-entropy bound") {
    val out = Olap.columnProfile(spark, SfDir).collect()
    val orders = Tables.load(spark, SfDir, "orders").count()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === orders)
      val nd = r.getAs[Long]("n_distinct")
      val topN = r.getAs[Long]("top_n")
      assert(topN >= orders / nd && topN <= orders)
      // Shannon bound: H <= ln(k) (+1e-6 for the 9 dp term rounding)
      assert(r.getAs[Double]("entropy") <= math.log(nd.toDouble) + 1e-6)
    }
  }
}
