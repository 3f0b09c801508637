package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dimensional, Olap, TextOps}

/** Round-15 batch E (SURVEY.md §2 #193-196): Benford screen, target
  * encoding, novelty score, Wilson funnel — recomputes + the
  * statistical properties each operator exists to provide. */
class FeatureStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("benford: digits partition each group; chi2 matches a recompute") {
    val rows = Olap.benfordScreen(spark, SfDir).collect()
    val byGrp = rows.groupBy(_.getAs[String]("grp"))
    byGrp.foreach { case (g, rs) =>
      val n = rs.map(_.getAs[Long]("n")).sum
      // every price has exactly one leading digit
      val prices = spark.read.parquet(s"$SfDir/lineitem.parquet")
        .filter(col("l_returnflag") === g).count()
      assert(n === prices, g)
      // chi2: recompute from the row counts with the same arithmetic
      val chi = rs.map { r =>
        val (nd, e) = (r.getAs[Long]("n"), r.getAs[Long]("exp_ppm"))
        val dev = BigInt(nd) * 1000000 - BigInt(n) * e
        BigDecimal((dev * dev).toDouble / (BigInt(n) * e * 1000000).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expected = BigDecimal(chi.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      rs.foreach(r => assert(r.getAs[Double]("chi2") === expected, g))
    }
    assert(Olap.BenfordPpm.sum === 999999L ||
      Olap.BenfordPpm.sum === 1000000L)
  }

  test("target encoding shrinks every brand toward the global mean") {
    val rows = Analytics.targetEncode(spark, SfDir).collect()
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_partkey", "l_extendedprice")
      .as[(Long, Double)].collect()
    val brandOf = spark.read.parquet(s"$SfDir/part.parquet")
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    def u6(x: Double): Long = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()
    val ys = li.map { case (pk, y) => brandOf(pk) -> BigInt(u6(y)) }
    val tot = ys.map(_._2).sum
    val nTot = ys.length
    val globalMean = tot.toDouble / nTot / 1e6
    rows.foreach { r =>
      val b = r.getAs[String]("p_brand")
      val mine = ys.filter(_._1 == b).map(_._2)
      val enc = BigDecimal(
        (BigInt(nTot) * mine.sum + BigInt(Analytics.EncodeSmoothM) * tot)
          .toDouble
          / (BigInt(nTot) * (mine.length + Analytics.EncodeSmoothM)
            * 1000000).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("encoding") === enc, b)
      // shrinkage: encoding strictly between raw mean and the prior
      val raw = r.getAs[Double]("mean_raw")
      val (lo, hi) = (math.min(raw, globalMean), math.max(raw, globalMean))
      assert(r.getAs[Double]("encoding") >= lo - 1e-6
        && r.getAs[Double]("encoding") <= hi + 1e-6, b)
    }
  }

  test("novelty: ppm algebra holds and common shingles really are common") {
    val rows = TextOps.noveltyScore(spark, SfDir).collect()
    rows.foreach { r =>
      val (ns, nc) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_common"))
      assert(nc <= ns)
      assert(r.getAs[Long]("boilerplate_ppm") === nc * 1000000L / ns)
    }
    // corpus-level sanity: boilerplate exists but is not everything
    val ppms = rows.map(_.getAs[Long]("boilerplate_ppm"))
    assert(ppms.exists(_ > 0L) && ppms.exists(_ < 1000000L))
  }

  test("wilson: bounds bracket the rate and tighten with n") {
    val rows = Dimensional.wilsonFunnel(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_conv"))
      val p = k.toDouble / n
      val lo = r.getAs[Double]("wilson_lo")
      val hi = r.getAs[Double]("wilson_hi")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9,
        s"${r.getAs[String]("channel")}: $lo $p $hi")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
      // recompute with the same formula shape
      val z = 1.96
      val mid = p + z * z / (2.0 * n)
      val rad = math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
      val den = 1.0 + z * z / n
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lo === r6((mid - z * rad) / den))
      assert(hi === r6((mid + z * rad) / den))
    }
  }
}
