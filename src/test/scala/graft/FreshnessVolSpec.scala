package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, StockOps}
import graft.sources.Tables

/** #128 bounded-staleness as-of + #129 realized volatility. */
class FreshnessVolSpec extends SparkTestBase {

  test("asof_tolerance: fresh matches bound the age, stale rows are " +
    "exactly the plain as-of matches older than the bound") {
    val fresh = AsOfJoin.clicksAsOfFresh(spark, SfDir).cache()
    val plain = AsOfJoin.clicksAsOfPurchases(spark, SfDir)
    // age bounded on every non-null row; value and age null together
    assert(fresh.filter(col("asof_value").isNotNull &&
      (col("age_s") < 0L || col("age_s") > AsOfJoin.ToleranceS))
      .count() === 0L)
    assert(fresh.filter(col("asof_value").isNotNull =!=
      col("age_s").isNotNull).count() === 0L)
    // consistency with the unbounded join: same probe rows, and a
    // probe is nulled here iff the plain join found nothing OR its
    // match is stale — so the fresh non-null set must be a subset of
    // the plain non-null set, with equal values where both are set
    val j = fresh.select(col("event_id"), col("asof_value").as("fv"))
      .join(plain.select(col("event_id"), col("asof_value").as("pv")),
        "event_id")
    assert(j.count() === plain.count())
    assert(j.filter(col("fv").isNotNull && col("pv").isNull)
      .count() === 0L)
    assert(j.filter(col("fv").isNotNull && col("fv") =!= col("pv"))
      .count() === 0L)
    // non-vacuous both ways: some fresh hits, some stale nulls
    assert(fresh.filter(col("asof_value").isNotNull).count() > 0L)
    assert(j.filter(col("fv").isNull && col("pv").isNotNull)
      .count() > 0L)
    fresh.unpersist()
  }

  test("realized_vol: matches a plain-Scala reference on collected " +
    "minute bars") {
    val got = StockOps.realizedVol(spark, SfDir).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    val bars = Tables.load(spark, SfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(col("ts")).cast("string").as("day"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("mi"),
        unix_micros(col("ts")).as("tsl"), col("event_id"), col("value"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet === bars.keySet)
    bars.foreach { case (key, rows) =>
      // close per minute = last by (ts, event_id)
      val closes = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (_, grp) => grp.maxBy(t => (t._2, t._3))._4
      }
      val ks = closes.sliding(2).collect { case Seq(a, b) if a != 0.0 =>
        math.round((b - a) / a * 1000000.0)
      }.toSeq
      val (nRets, rv) = got(key)
      assert(nRets === ks.size.toLong, s"key $key")
      if (ks.isEmpty) assert(rv.isEmpty)
      else {
        val expected = BigDecimal(
          math.sqrt(ks.map(k => BigInt(k) * BigInt(k)).sum.toDouble)
            / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rv.contains(expected), s"key $key")
      }
    }
  }
}
