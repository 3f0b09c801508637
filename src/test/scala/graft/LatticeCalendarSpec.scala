package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dimensional, Olap}

/** Round-15 batch F (SURVEY.md §2 #197-200): mutual information,
  * CUBE, the cohort LTV curve and the date dimension. */
class LatticeCalendarSpec extends SparkTestBase {
  import spark.implicits._

  test("mutual info: non-negative-ish total, cells partition N, MI consistent with chi2 independence call") {
    val rows = Analytics.mutualInfo(spark, SfDir).collect()
    val n = spark.read.parquet(s"$SfDir/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    val mi = rows.head.getAs[Double]("mi_nats")
    rows.foreach(r => assert(r.getAs[Double]("mi_nats") === mi))
    // MI of a contingency table is >= 0 up to the 9dp term rounding
    assert(mi >= -1e-6)
    // and bounded by min(ln|X|, ln|Y|)
    val nx = rows.map(_.getAs[String]("seg")).distinct.length
    val ny = rows.map(_.getAs[String]("prio")).distinct.length
    assert(mi <= math.log(math.min(nx, ny)) + 1e-6)
  }

  test("cube contains rollup's levels plus the status-only marginal") {
    val cube = Olap.cubeAgg(spark, SfDir).collect()
      .map(r => (Option(r.getAs[String]("o_orderpriority")),
        Option(r.getAs[String]("o_orderstatus")), r.getAs[Long]("grp_id"))
        -> (r.getAs[Double]("sum_price"), r.getAs[Long]("n_orders")))
      .toMap
    val rollup = Olap.rollupAgg(spark, SfDir).collect()
    rollup.foreach { r =>
      val k = (Option(r.getAs[String]("o_orderpriority")),
        Option(r.getAs[String]("o_orderstatus")), r.getAs[Long]("grp_id"))
      assert(cube(k) ===
        ((r.getAs[Double]("sum_price"), r.getAs[Long]("n_orders"))), k)
    }
    // the level rollup cannot express: (status) marginal, grp_id = 2
    val statusOnly = cube.keys.filter(_._3 == 2L)
    assert(statusOnly.nonEmpty)
    assert(statusOnly.forall(k => k._1.isEmpty && k._2.isDefined))
    // grand total appears once and matches the sum of the full cross
    val grand = cube.filter(_._1._3 == 3L)
    assert(grand.size === 1)
    assert(grand.head._2._2 ===
      cube.filter(_._1._3 == 0L).values.map(_._2).sum)
  }

  test("ltv curve: cumulative is monotone and conserves total purchase revenue") {
    val rows = Dimensional.ltvCurve(spark, SfDir).collect()
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (cw, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age_week"))
      val ltv = sorted.map(_.getAs[Double]("ltv_per_user"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"cohort $cw not monotone")
    }
    val total = rows.map(r =>
      BigDecimal(r.getAs[Double]("week_revenue"))).sum.toDouble
    val expected = spark.read.parquet(s"$SfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(value as decimal(18,6))")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(total - expected) < 1e-3)
  }

  test("date dim: contiguous spine, correct dow anchor, month ends real") {
    val rows = Olap.dateDim(spark, SfDir).collect()
    val eds = rows.map(_.getAs[Long]("epoch_day"))
    assert(eds.sameElements(eds.min to eds.max))
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("d").toLocalDate
      val expDow = (d.getDayOfWeek.getValue % 7).toLong // SQL 0=Sunday
      assert(r.getAs[Long]("dow") === expDow, d)
      assert(r.getAs[Long]("y") === d.getYear.toLong)
      assert(r.getAs[Long]("m") === d.getMonthValue.toLong)
      assert(r.getAs[Long]("dom") === d.getDayOfMonth.toLong)
      assert((r.getAs[Long]("is_month_end") == 1L) ===
        (d.getDayOfMonth == d.lengthOfMonth), d)
    }
    // Monday-aligned week index changes exactly on Mondays
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val bump = b.getAs[Long]("week_idx") - a.getAs[Long]("week_idx")
        assert(bump === (if (b.getAs[Long]("dow") == 1L) 1L else 0L))
      case _ => ()
    }
  }
}
