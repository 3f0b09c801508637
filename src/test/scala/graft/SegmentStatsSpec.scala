package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Components, Dimensional, Olap, Rank, TimeSeries}

/** Round-15 batch A (SURVEY.md §2 #176-178, #186): RFM segmentation,
  * the revenue ACF, k-hop BFS reachability and winsorization — each
  * checked against an independent reference computation (plain Scala
  * over collected bounded slices, or the single-window form the
  * two-level rank must equal). The sf0.01 DuckDB oracle covers the
  * full arithmetic; this spec pins the invariants that survive
  * refactors. */
class SegmentStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("rfm: two-level rank ≡ single-window rank on every metric") {
    val users = graft.sources.Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"))
    val two = Rank.twoLevelRank(users, Seq.empty,
      floor(log(2.0, col("freq"))).cast("long"), blkAscending = false,
      Seq(col("freq").desc, col("user_id").asc), "rnk", "n")
      .select("user_id", "rnk").as[(Long, Long)].collect().toMap
    val one = users.withColumn("rnk", row_number().over(
        Window.orderBy(col("freq").desc, col("user_id").asc)).cast("long"))
      .select("user_id", "rnk").as[(Long, Long)].collect().toMap
    assert(two === one)
  }

  test("rfm: segment populations conserve the purchaser count, scores in 1..5") {
    val seg = Dimensional.rfmSegments(spark, SfDir).collect()
    val nPurchasers = spark.read.parquet(s"$SfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(seg.map(_.getAs[Long]("n_users")).sum === nPurchasers)
    seg.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c)
        assert(s >= 1L && s <= 5L, s"$c out of range: $s")
      }
    }
  }

  test("autocorr matches a plain-Scala ACF over the collected day series") {
    val dayUs = 86400L * 1000000L
    val series = graft.sources.Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(sum(expr("cast(value as decimal(18,6))")).as("rev"))
      .orderBy("day")
      .select(col("rev"))
      .as[java.math.BigDecimal].collect()
      .map(d => d.movePointRight(6).toBigIntegerExact
        .divide(java.math.BigInteger.valueOf(1000000L)).longValueExact())
    val n = series.length
    val s = series.sum
    val c = series.map(x => BigInt(n) * BigInt(x) - BigInt(s))
    val den = c.map(v => v * v).sum
    val acf = TimeSeries.autocorr(spark, SfDir).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    (1 to TimeSeries.AcfMaxLag).foreach { l =>
      val num = (0 until n - l).map(t => c(t) * c(t + l)).sum
      // the query's exact arithmetic: one terminal double division,
      // then round(…, 6)
      val expected = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(acf(l.toLong)._1 === (n - l).toLong, s"lag $l pairs")
      assert(math.abs(acf(l.toLong)._2 - expected) < 1e-9, s"lag $l")
    }
  }

  test("khop: BFS frontier algebra matches a plain-Scala BFS, partition conserved") {
    val rows = Components.khopReach(spark, SfDir).collect()
      .map(r => r.getAs[Long]("hop") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("sum_key"))).toMap
    // reference BFS over the collected (bounded at sf0.001) graph
    val lines = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    byOrder.values.foreach { ps =>
      for (a <- ps; b <- ps if a != b) adj(a) = adj(a) + b
    }
    val parts = spark.read.parquet(s"$SfDir/part.parquet")
      .select("p_partkey").as[Long].collect().toSet
    var dist = parts.filter(_ % 97 == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1L to Components.KhopMaxHops.toLong) {
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    val expected = dist.groupBy(_._2).map { case (h, m) =>
      h -> (m.size.toLong, m.keys.sum)
    }
    val unreached = parts.diff(dist.keySet)
    expected.foreach { case (h, v) => assert(rows(h) === v, s"hop $h") }
    assert(rows(-1L) === ((unreached.size.toLong, unreached.sum)))
    assert(rows.values.map(_._1).sum === parts.size.toLong)
  }

  test("winsorize: clamp counts + means match a plain-Scala recompute") {
    val out = Olap.winsorize(spark, SfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val vals = spark.read.parquet(s"$SfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("value").as[Double].collect()
    val r = out("purchase")
    val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
    assert(lo < hi)
    assert(r.getAs[Long]("n_lo") === vals.count(_ < lo).toLong)
    assert(r.getAs[Long]("n_hi") === vals.count(_ > hi).toLong)
    val clamped = vals.map(v => math.min(math.max(v, lo), hi))
    def mean6(xs: Array[Double]): Double = {
      val s = xs.map(x => BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      BigDecimal((s / xs.length).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(r.getAs[Double]("mean_winsor") - mean6(clamped)) < 2e-6)
    // winsorized mean pulled toward the center, never outside cuts
    assert(r.getAs[Double]("mean_winsor") >= lo
      && r.getAs[Double]("mean_winsor") <= hi)
  }
}
