package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dimensional, StockOps}
import graft.sources.Tables

/** Batch-7 market-profile operators (SURVEY §2 #173-174). */
class MarketProfileSpec extends SparkTestBase {

  test("purchase_gaps: gap conservation and bucket arithmetic") {
    val out = StockOps.purchaseGaps(spark, SfDir).collect()
    val purchases = Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "purchase")
    val nGaps = purchases.count() -
      purchases.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === nGaps)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("from_hours") === b * StockOps.GapBucketHours)
      val avg = r.getAs[Double]("avg_gap_hours")
      // the bucket mean lies inside the bucket's hour range
      assert(avg >= b * StockOps.GapBucketHours - 1e-6 &&
        avg < (b + 1) * StockOps.GapBucketHours + 1e-6, s"bucket $b")
    }
  }

  test("band_migration: transitions conserve to versions minus tickers") {
    val out = StockOps.bandMigration(spark, SfDir).collect()
    val dim = Dimensional.scd2Dim(spark, SfDir)
    val nTrans = dim.count() -
      dim.select("ticker_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === nTrans)
    // a price change within the same band is still a transition row
    // (diagonal cells exist) and bands are non-negative
    out.foreach { r =>
      assert(r.getAs[Long]("from_band") >= 0L &&
        r.getAs[Long]("to_band") >= 0L)
    }
  }

  test("dedup_curve: monotone non-increasing, docs bounded by 2x pairs") {
    val out = graft.operators.Similarity.dedupCurve(spark, SfDir)
      .collect()
    assert(out.length ===
      graft.operators.Similarity.CurveThresholds.length)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_pairs") >= b.getAs[Long]("n_pairs"))
        assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs"))
      case _ => ()
    }
    out.foreach { r =>
      val p = r.getAs[Long]("n_pairs"); val d = r.getAs[Long]("n_docs")
      assert(d <= 2 * p)
      assert(p == 0L || d >= 2L)
    }
    // the curve discriminates on this corpus
    assert(out.head.getAs[Long]("n_pairs") >
      out.last.getAs[Long]("n_pairs"))
  }
}
