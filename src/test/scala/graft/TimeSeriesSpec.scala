package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dimensional, Packing, TimeSeries}
import graft.sources.Tables

/** Round-9 time-series / warehouse / packing operators
  * (SURVEY.md §2 #84-91): grid resampling, rolling z-scores,
  * correlation matrix, SCD2, funnel, sequence packing,
  * grouping sets. */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def purchases =
    Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "purchase")

  test("resample_ffill: dense hourly grid, ffill preserves last obs") {
    val got = TimeSeries.resampleFfill(spark, SfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // dense grid: per ticker, hours are consecutive (count == span+1)
    val byTicker = rows.groupBy(_.getAs[Long]("ticker_id"))
    byTicker.foreach { case (t, rs) =>
      val hours = rs.map(_.getAs[java.sql.Timestamp]("hour").getTime / 1000)
      val span = (hours.max - hours.min) / 3600 + 1
      assert(hours.length.toLong === span, s"ticker $t grid has holes")
      assert(hours.distinct.length === hours.length)
    }
    // every ticker ends at the same global last hour
    val lastHours = byTicker.values
      .map(_.map(_.getAs[java.sql.Timestamp]("hour").getTime).max)
    assert(lastHours.toSet.size === 1)
    // price is never null (first grid hour is an observation) and a
    // non-observed hour repeats the previous hour's price
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("price"))))
    byTicker.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("hour").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getAs[Long]("is_observed") == 0L =>
          assert(b.getAs[Double]("price") === a.getAs[Double]("price"))
        case _ =>
      }
    }
  }

  test("anomaly_zscore: z matches a recomputed window, flags need |z|>3") {
    val got = TimeSeries.anomalyZscore(spark, SfDir).collect()
    assert(got.nonEmpty)
    // recompute one ticker's stream in plain Scala
    val t0 = got.head.getAs[Long]("ticker_id")
    val stream = purchases.filter(col("user_id") === t0)
      .select("ts", "event_id", "value")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts"), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1.getTime * 1000000L + x._1.getNanos / 1000 % 1000000, x._2))
    val gotT = got.filter(_.getAs[Long]("ticker_id") == t0)
      .sortBy(_.getAs[Long]("event_id"))
    val byEid = stream.zipWithIndex.map { case ((_, eid, _), i) => eid -> i }.toMap
    gotT.foreach { r =>
      val i = byEid(r.getAs[Long]("event_id"))
      val win = stream.slice(math.max(0, i - TimeSeries.ZWindow), i).map(_._3)
      assert(r.getAs[Long]("n_win") === win.length.toLong)
      if (win.length >= TimeSeries.ZMinWin) {
        val mean = win.sum / win.length
        assert(math.abs(r.getAs[Double]("mean_prev") - mean) < 1e-4)
      } else assert(r.isNullAt(r.fieldIndex("z")))
      if (!r.isNullAt(r.fieldIndex("z")))
        assert((math.abs(r.getAs[Double]("z")) > 3.0) ===
          (r.getAs[Long]("is_anomaly") == 1L))
      else assert(r.getAs[Long]("is_anomaly") === 0L)
    }
  }

  test("corr_matrix: bounded pairs, |r| <= 1, self-consistent vs corr()") {
    val got = TimeSeries.corrMatrix(spark, SfDir).collect()
    val k = TimeSeries.CorrWatchlist
    assert(got.length <= k * (k - 1) / 2)
    got.foreach { r =>
      assert(r.getAs[Long]("ticker_a") < r.getAs[Long]("ticker_b"))
      if (!r.isNullAt(r.fieldIndex("corr")))
        assert(math.abs(r.getAs[Double]("corr")) <= 1.0 + 1e-9)
    }
    // spot-check one pair against Spark's built-in corr (float-loose)
    val daily = purchases.filter(col("user_id") < k)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(graft.operators.Num.davg(col("value")).as("p"))
    val a = daily.select(col("user_id").as("ta"), col("day"), col("p").as("pa"))
    val b = daily.select(col("user_id").as("tb"), col("day"), col("p").as("pb"))
    val ref = a.join(b, Seq("day")).filter(col("ta") === 0L && col("tb") === 1L)
      .agg(corr(col("pa"), col("pb"))).collect()(0)
    val mine = got.find(r => r.getAs[Long]("ticker_a") == 0L &&
      r.getAs[Long]("ticker_b") == 1L)
    if (!ref.isNullAt(0) && mine.isDefined)
      assert(math.abs(mine.get.getAs[Double]("corr") - ref.getDouble(0)) < 1e-5)
  }

  test("drawdown: bounded in [-1, 0], zero iff the peak never recedes") {
    val got = TimeSeries.drawdown(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val dd = r.getAs[Double]("max_drawdown")
      assert(dd <= 0.0 && dd >= -1.0)
      assert(r.getAs[Double]("last_price") <= r.getAs[Double]("peak_price"))
    }
    // recompute one ticker in plain Scala
    val t0 = got.head.getAs[Long]("ticker_id")
    val stream = purchases.filter(col("user_id") === t0)
      .select("ts", "event_id", "value").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).map(_._3)
    var peak = Double.MinValue; var worst = 0.0
    stream.foreach { v =>
      peak = math.max(peak, v)
      worst = math.min(worst, (v - peak) / peak)
    }
    val mine = got.find(_.getAs[Long]("ticker_id") == t0).get
    assert(math.abs(mine.getAs[Double]("max_drawdown") - worst) < 1e-5)
    assert(mine.getAs[Double]("last_price") === stream.last)
  }

  test("ewma: converges to a constant series, weights recent trades") {
    val got = TimeSeries.ewmaSmooth(spark, SfDir).collect()
    assert(got.nonEmpty)
    // recompute a row deep in one ticker's stream
    val t0 = got.head.getAs[Long]("ticker_id")
    val stream = purchases.filter(col("user_id") === t0)
      .select("ts", "event_id", "value").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2))
    if (stream.length > TimeSeries.EwmaLags) {
      val i = stream.length - 1
      val ws = (0 until TimeSeries.EwmaLags)
        .map(k => math.pow(TimeSeries.EwmaAlpha, k))
      val vals = (0 until TimeSeries.EwmaLags).map(k => stream(i - k)._3)
      val want = vals.zip(ws).map { case (v, w) => v * w }.sum / ws.sum
      val mine = got.find(_.getAs[Long]("event_id") == stream(i)._2).get
      assert(math.abs(mine.getAs[Double]("ewma") - want) < 1e-4)
    }
  }

  test("scd2_dim: ranges tile each ticker's history, change-compressed") {
    val got = Dimensional.scd2Dim(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[Long]("ticker_id")).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ===
        (1L to sorted.length))
      // exactly one open row, and it is the last version
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) === 1)
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("effective_to")))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          // contiguous validity and genuine change
          assert(x.getAs[java.sql.Timestamp]("effective_to") ===
            y.getAs[java.sql.Timestamp]("effective_from"), s"ticker $t gap")
          assert(x.getAs[Double]("price") !== y.getAs[Double]("price"))
        case _ =>
      }
    }
  }

  test("funnel_stages: monotone reach, stage times ordered") {
    val got = Dimensional.funnelStages(spark, SfDir)
      .collect().sortBy(_.getString(0))
    assert(got.map(_.getString(0)).toSeq ===
      Seq("1_signup", "2_click", "3_purchase"))
    val reach = got.map(_.getAs[Long]("n_users"))
    assert(reach(0) >= reach(1) && reach(1) >= reach(2))
    // stage times are non-negative offsets from signup; stage 1 is 0
    // by construction (cross-stage avg inequalities do NOT hold — the
    // cohorts shrink, so only per-user ordering is guaranteed)
    val hrs = got.map(_.getAs[Double]("avg_hours_from_signup"))
    assert(hrs(0) === 0.0)
    assert(hrs(1) >= 0.0 && hrs(2) >= 0.0)
    // per-user ordering: every stage-3 user's t3 >= t2 >= t1
    val ev = Tables.load(spark, SfDir, "events")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val perUser = ev
      .withColumn("t1", min(when(col("event_type") === "signup",
        col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") >= col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") >= col("t2"), col("ts"))).over(w))
      .select("user_id", "t1", "t2", "t3").distinct()
      .filter(col("t3").isNotNull).collect()
    perUser.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("t3")
        .before(r.getAs[java.sql.Timestamp]("t2")))
      assert(!r.getAs[java.sql.Timestamp]("t2")
        .before(r.getAs[java.sql.Timestamp]("t1")))
    }
  }

  test("pack_sequences: offsets are exact prefix sums, budget respected") {
    val got = Packing.packSequences(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var run = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_offset") === run)
        run += r.getAs[Long]("n_tok")
        val b = Packing.SeqBudget
        assert(r.getAs[Long]("seq_id") === r.getAs[Long]("tok_offset") / b)
        val endTok = r.getAs[Long]("tok_offset") +
          math.max(r.getAs[Long]("n_tok"), 1L) - 1L
        assert(r.getAs[Long]("seq_end") === endTok / b)
      }
    }
  }

  test("grouping_sets: marginals match independent aggregates") {
    val got = graft.operators.Olap.groupingSetsAgg(spark, SfDir)
    val orders = Tables.load(spark, SfDir, "orders")
    // (status)-only marginal (grp_id=2) — the level rollup can't express
    val statusLevel = got.filter(col("grp_id") === 2)
      .select("o_orderstatus", "n_orders").as[(String, Long)].collect().toMap
    val direct = orders.groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(statusLevel === direct)
    // grand total present exactly once
    assert(got.filter(col("grp_id") === 3).count() === 1)
  }

  test("gap_report: dark-run arithmetic matches a plain-Scala " +
    "reference on the collected minute sets") {
    val got = TimeSeries.gapReport(spark, SfDir).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    val minutes = Tables.load(spark, SfDir, "events")
      .select(col("user_id"),
        to_date(col("ts")).cast("string").as("day"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("mi"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet === minutes.keySet)
    minutes.foreach { case (k, ms) =>
      val (nEvents, nMinutes, maxGap) = got(k)
      assert(nEvents === ms.size.toLong)
      val distinct = ms.distinct.sorted
      assert(nMinutes === distinct.size.toLong)
      val internal = distinct.sliding(2)
        .collect { case Seq(a, b) => b - a - 1 }.foldLeft(0L)(math.max)
      val expected = math.max(internal,
        math.max(distinct.head, 1439L - distinct.last))
      assert(maxGap === expected, s"key $k")
    }
  }
}
