package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TrainExport}

/** Round-15 batch J (SURVEY.md §2 #210-211): frequent 3-itemsets and
  * the user feature-store export. */
class ItemsetFeatureSpec extends SparkTestBase {
  import spark.implicits._

  test("3-itemset support matches an in-memory basket enumeration") {
    val lines = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val expected = lines.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length;
        k <- (j + 1) until ps.length) yield (ps(i), ps(j), ps(k))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(20)
    val got = Analytics.itemset3(spark, SfDir).collect()
      .map(r => ((r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("pc")), r.getAs[Long]("support")))
    assert(got.toSeq === expected)
    // triple support can never exceed any pairwise support
    val pairs = Analytics.coOccurrence(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"))
        -> r.getAs[Long]("support")).toMap
    got.foreach { case ((a, b, _), s) =>
      pairs.get((a, b)).foreach(ps => assert(s <= ps))
    }
  }

  test("user features: conservation and algebraic consistency per user") {
    val rows = TrainExport.userFeatures(spark, SfDir).collect()
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
    assert(rows.map(_.getAs[Long]("n_events")).sum === ev.count())
    rows.foreach { r =>
      val typed = Seq("n_click", "n_view", "n_purchase", "n_signup",
        "n_error").map(r.getAs[Long]).sum
      assert(typed === r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("active_days")
        <= r.getAs[Long]("lifetime_days"))
      assert(r.getAs[Long]("activity_ppm") ===
        r.getAs[Long]("active_days") * 1000000L
          / r.getAs[Long]("lifetime_days"))
      assert(r.getAs[Long]("recency_days") >= 0L)
      if (r.getAs[Long]("n_purchase") == 0L)
        assert(r.isNullAt(r.fieldIndex("purchase_revenue")))
    }
  }

  test("backlog aging: open orders really have a post-snapshot line, value positive") {
    val rows = graft.operators.Analytics.backlogAging(spark, SfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("age_bucket") >= 0L)
      assert(r.getAs[Long]("open_lines") >= r.getAs[Long]("n_orders"))
      assert(r.getAs[Double]("open_value") > 0.0)
    }
    // conservation against a direct recompute of the snapshot instant
    val o = spark.read.parquet(s"$SfDir/orders.parquet")
      .select(col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("oday"))
    val mm = o.agg(min(col("oday")), max(col("oday"))).head()
    val d = (mm.getLong(0) + mm.getLong(1)) / 2
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").as("sday"))
    val expectedOpen = o.filter(col("oday") <= d)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("sday") > d)
      .select("o_orderkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === expectedOpen)
  }
}
