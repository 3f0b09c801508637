package graft

import org.apache.spark.sql.functions._
import graft.operators.{Olap, Sampling, Sessions, TextOps}

/** Round-3 operator pack tests (SURVEY.md §2 #37-45): rollup/pivot/
  * percentile/sketch aggregates, sessionization and sequence windows,
  * deterministic splits, PII scrubbing. */
class OlapSessionsSpec extends SparkTestBase {
  import spark.implicits._

  test("rollup grand total equals the flat aggregate") {
    val got = Olap.rollupAgg(spark, SfDir)
    val grand = got.filter(col("grp_id") === 3).collect()
    assert(grand.length === 1)
    val flat = graft.sources.Tables.load(spark, SfDir, "orders")
      .agg(graft.operators.Num.dsum(col("o_totalprice")).as("s"),
        count(lit(1)).as("n")).collect()(0)
    assert(grand(0).getAs[Double]("sum_price") === flat.getDouble(0))
    assert(grand(0).getAs[Long]("n_orders") === flat.getLong(1))
    // level counts: detail rows have grp_id 0, per-priority rollups 1
    assert(got.filter(col("grp_id") === 1).count() ===
      graft.sources.Tables.load(spark, SfDir, "orders")
        .select("o_orderpriority").distinct().count())
  }

  test("pivot_wide is one row per user and cells match filtered sums") {
    val ev = graft.sources.Tables.load(spark, SfDir, "events")
    val got = Olap.pivotWide(spark, SfDir)
    assert(got.count() === ev.select("user_id").distinct().count())
    val u0 = got.orderBy("user_id").limit(1).collect()(0)
    val direct = ev.filter(col("user_id") === u0.getLong(0) &&
        col("event_type") === "click")
      .agg(graft.operators.Num.dsum(col("value"))).collect()(0)
    assert(Option(u0.getAs[java.lang.Double]("click")).map(_.doubleValue)
      === Option(direct.getAs[java.lang.Double](0)).map(_.doubleValue))
  }

  test("percentiles are monotone and bounded by the group min/max") {
    val got = Olap.percentiles(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val Seq(p25, p50, p90, p99) =
        Seq("p25", "p50", "p90", "p99").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99, r.toString)
    }
  }

  test("portable HLL estimate is within 5% of exact per event type") {
    val got = Olap.approxDistinct(spark, SfDir)
      .select("event_type", "approx_users")
      .as[(String, Double)].collect().toMap
    val exact = graft.sources.Tables.load(spark, SfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = got(k)
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: $ap vs $ex")
    }
  }

  test("sessionize covers every event once and respects the gap rule") {
    val ev = graft.sources.Tables.load(spark, SfDir, "events")
    val got = Sessions.sessionize(spark, SfDir)
    assert(got.agg(sum("n_events")).collect()(0).getLong(0) === ev.count())
    // sessions of one user are disjoint in time and ordered
    val one = got.filter(col("user_id") === 7).orderBy("sess_id").collect()
    one.sliding(2).foreach {
      case Array(a, b) =>
        val gapUs = b.getAs[java.sql.Timestamp]("sess_start").getTime * 1000 -
          a.getAs[java.sql.Timestamp]("sess_end").getTime * 1000
        assert(gapUs > Sessions.SessionGapMinutes * 60L * 1000000L ||
          gapUs > 0, s"sessions overlap: $a / $b")
      case _ =>
    }
  }

  test("window_lag: first purchase per ticker has null prev, ma3 bounded") {
    val got = Sessions.windowLag(spark, SfDir)
    assert(got.filter(col("prev_price").isNull).count() ===
      got.select("ticker_id").distinct().count())
    val bad = got.filter(col("ma3") >
      greatest(col("price"), col("prev_price")) + 1e6)
    assert(bad.count() === 0)
  }

  test("range_join keeps every click and only preceding-hour purchases") {
    val clicks = graft.sources.Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "click")
    val got = Sessions.rangeJoin(spark, SfDir)
    assert(got.count() === clicks.count())
    assert(got.filter(col("n_purch") === 0 && col("sum_purch").isNotNull)
      .count() === 0)
  }

  test("hash split is total, disjoint, and ~80/10/10") {
    val got = Sampling.hashSplit(spark, SfDir)
    val total = got.agg(sum("n_events")).collect()(0).getLong(0)
    val ev = graft.sources.Tables.load(spark, SfDir, "events")
    assert(total === ev.count())
    val bySplit = got.groupBy("split").agg(sum("n_events").as("n"))
      .as[(String, Long)].collect().toMap
    val frac = bySplit("train").toDouble / total
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // determinism: same id always lands in the same split
    val s1 = Sampling.splitLabel(lit(12345L))
    val got1 = spark.range(1).select(s1.as("s")).collect()(0).getString(0)
    val got2 = spark.range(1).select(s1.as("s")).collect()(0).getString(0)
    assert(got1 === got2)
  }

  test("json_extract parses every props payload (schema'd, no inference)") {
    val got = graft.operators.StockOps.jsonExtract(spark, SfDir)
    val total = got.agg(sum("n_with_k")).collect()(0).getLong(0)
    // every event's props is a {"k": int} document → no parse losses
    assert(total === graft.sources.Tables.load(spark, SfDir, "events").count())
  }

  test("merge_upsert statuses partition the key space correctly") {
    val got = graft.operators.StockOps.mergeUpsert(spark, SfDir)
    val byStatus = got.groupBy("merge_status").count()
      .as[(String, Long)].collect().toMap
    // one output row per distinct user across both sides
    val ev = graft.sources.Tables.load(spark, SfDir, "events")
      .filter(col("ts") < lit("2024-01-05 00:00:00"))
    assert(byStatus.values.sum === ev.select("user_id").distinct().count())
    // an 'updated' user's latest_ts must come from the update window
    val bad = got.filter(col("merge_status") === "updated" &&
      col("latest_ts") < lit("2024-01-04 00:00:00"))
    assert(bad.count() === 0)
  }

  test("multimodal_chunks reassembles to the original byte counts") {
    val got = graft.operators.Multimodal.multimodalChunks(spark, SfDir)
    val sums = got.groupBy("doc_id").agg(sum("chunk_len").as("n"))
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long")
        .as("expect"))
    val mismatch = sums.join(docs, "doc_id")
      .filter(col("n") =!= col("expect"))
    assert(mismatch.count() === 0)
    assert(got.filter(col("chunk_len") <= 0 ||
      col("chunk_len") > graft.operators.Multimodal.ChunkBytes).count() === 0)
  }

  test("TopKAgg equals the window row_number form at any partitioning") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowForm = graft.sources.Tables.load(spark, SfDir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey").as("cust_id"), col("rnk"),
        col("o_orderkey").as("order_id"), col("o_totalprice").as("price"))
    for (parts <- Seq(1, 7)) {
      val aggForm = graft.sources.Tables.load(spark, SfDir, "orders")
        .repartition(parts)
        .groupBy(col("o_custkey").as("cust_id"))
        .agg(graft.functions.AggFunctions.topK(
          col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("cust_id"), posexplode(col("top")))
        .select(col("cust_id"), (col("pos") + 1L).as("rnk"),
          col("col.id").as("order_id"), col("col.value").as("price"))
      assert(aggForm.exceptAll(windowForm).count() === 0)
      assert(windowForm.exceptAll(aggForm).count() === 0)
    }
  }

  test("group_cap keeps at most N per source, deterministically") {
    val got = graft.operators.Sampling.groupCap(spark, SfDir)
    val over = got.groupBy("source").count()
      .filter(col("count") > graft.operators.Sampling.GroupCapN)
    assert(over.count() === 0)
    val again = graft.operators.Sampling.groupCap(spark, SfDir)
    assert(got.exceptAll(again).count() === 0)
    // kept ids are a subset of the source's docs
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
      .select("source", "doc_id")
    assert(got.select("source", "doc_id").exceptAll(docs).count() === 0)
  }

  test("topk_per_group keeps at most 3 ranked orders per customer") {
    val got = graft.operators.Olap.topkPerGroup(spark, SfDir)
    val over = got.groupBy("cust_id").count().filter(col("count") > 3)
    assert(over.count() === 0)
    // rank 1 is each customer's max order price
    val r1 = got.filter(col("rnk") === 1)
      .select(col("cust_id"), col("price"))
    val mx = graft.sources.Tables.load(spark, SfDir, "orders")
      .groupBy(col("o_custkey").as("cust_id"))
      .agg(max("o_totalprice").as("mx"))
    assert(r1.join(mx, "cust_id").filter(col("price") =!= col("mx"))
      .count() === 0)
  }

  test("histogram bins partition all events") {
    val got = graft.operators.Olap.histogram(spark, SfDir)
    assert(got.agg(sum("n")).collect()(0).getLong(0) ===
      graft.sources.Tables.load(spark, SfDir, "events").count())
  }

  test("stratified sample keeps whole strata at rate 1000 and downsamples views") {
    val got = graft.operators.Sampling.stratifiedSample(spark, SfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val totals = graft.sources.Tables.load(spark, SfDir, "events")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(got("purchase") === totals("purchase"), "rate-1000 stratum lost rows")
    val viewFrac = got("view").toDouble / totals("view")
    assert(viewFrac > 0.02 && viewFrac < 0.09, s"view fraction $viewFrac")
  }

  test("ohlc bars: low <= open/close <= high, vwap within [low, high]") {
    val ohlc = graft.operators.StockOps.ohlcBars(spark, SfDir)
    val bad = ohlc.filter(col("low") > col("high") ||
      col("open") < col("low") || col("open") > col("high") ||
      col("close") < col("low") || col("close") > col("high"))
    assert(bad.count() === 0)
    val v = graft.operators.StockOps.vwap(spark, SfDir)
    val j = v.join(ohlc, Seq("ticker_id", "day"))
      .filter(col("vwap") < col("low") - 1e-9 ||
        col("vwap") > col("high") + 1e-9)
    assert(j.count() === 0, "vwap outside the bar's [low, high]")
    assert(v.count() === ohlc.count())
  }

  test("purchase-filtered queries push the event_type predicate to the scan") {
    for (df <- Seq(graft.operators.StockOps.vwap(spark, SfDir),
        graft.operators.StockOps.ohlcBars(spark, SfDir),
        graft.operators.Sessions.windowLag(spark, SfDir))) {
      val plan = planOf(df)
      assert(plan.contains("EqualTo(event_type,purchase)"),
        "filter not pushed: " + plan.take(600))
    }
  }

  test("dq_checks reports zero violations on clean data, counts planted ones") {
    val clean = graft.operators.StockOps.dqChecks(spark, SfDir)
      .as[(String, Long)].collect().toMap
    assert(clean.values.forall(_ === 0L), s"clean data flagged: $clean")
    assert(clean.keySet === Set("bad_ts", "bad_type", "bad_value",
      "dup_id", "null_id", "null_user"))
  }

  test("pii_scrub removes planted emails and phone numbers") {
    val docs = Seq(
      (1L, "contact me at alice.smith+x@example.org for details"),
      (2L, "call 555-123-4567 or mail bob@corp.io"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextOps.piiScrubOn(docs).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_emails") === 1)
    assert(got(0).getAs[String]("clean_text")
      === "contact me at <EMAIL> for details")
    assert(got(1).getAs[Long]("n_emails") === 1)
    assert(got(1).getAs[Long]("n_phones") === 1)
    assert(got(1).getAs[String]("clean_text") === "call <PHONE> or mail <EMAIL>")
    assert(got(2).getAs[String]("clean_text") === "no pii here at all")
  }
}
