package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dimensional, Olap, Sampling, Search}
import graft.sources.Tables

/** Round-9 batch-2 operators (SURVEY.md §2 #94-97): cohort
  * retention, PPS sampling with HT totals, quantile binning, TF-IDF
  * document similarity. */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  test("retention_cohorts: offset-0 cells cover each whole cohort") {
    val got = Dimensional.retentionCohorts(spark, SfDir).collect()
    assert(got.nonEmpty)
    // day 0: every cohort member is active on their first day
    got.filter(_.getAs[Long]("day_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
    // rates bounded and consistent
    got.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") <= 1.0)
      assert(r.getAs[Long]("day_offset") >= 0L)
    }
    // cohort sizes sum to the distinct user count
    val sizes = got.groupBy(_.getAs[java.sql.Date]("cohort_day").toString)
      .map(_._2.head.getAs[Long]("cohort_size")).sum
    val users = Tables.load(spark, SfDir, "events")
      .select("user_id").distinct().count()
    assert(sizes === users)
  }

  test("pps_sample: membership is deterministic, HT estimates the total") {
    val a = Sampling.ppsSample(spark, SfDir).collect()
    val b = Sampling.ppsSample(spark, SfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val htSum = a.map(_.getAs[Double]("ht_total")).sum
    val exactSum = a.map(_.getAs[Double]("exact_total")).sum
    val nKept = a.map(_.getAs[Long]("n_kept")).sum
    // expected sample size k=500 (Poisson: generous tolerance), and
    // the HT estimator is unbiased — demand the realized estimate
    // lands within 25% of the exact total
    assert(nKept > Sampling.PpsK / 2 && nKept < Sampling.PpsK * 2,
      s"n_kept $nKept far from k=${Sampling.PpsK}")
    assert(math.abs(htSum - exactSum) / exactSum < 0.25,
      s"HT $htSum vs exact $exactSum")
    // per stratum the kept mass never exceeds the exact mass
    a.foreach(r => assert(r.getAs[Double]("sum_kept") <=
      r.getAs[Double]("exact_total") + 1e-6))
  }

  test("quantile_bins: 4 near-equal buckets, ordered boundaries") {
    val got = Olap.quantileBins(spark, SfDir).collect()
    got.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      assert(sorted.map(_.getAs[Long]("bin")).toSeq === (1L to 4L), et)
      // NTILE: bucket sizes differ by at most 1
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"$et sizes ${ns.toSeq}")
      // boundaries are monotone across buckets
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Double]("hi") <= y.getAs[Double]("lo") + 1e-9)
        case _ =>
      }
    }
  }

  test("quantile_bins: distributed fallback above the block cap is " +
      "hash-identical to the collect path") {
    // blockCap=1 forces the Rank.twoLevelRank route (VERDICT r13 #4
    // — the unbounded-value-domain escape from the driver collect);
    // both routes must produce the same rows bit-for-bit
    val viaCollect = Olap
      .quantileBinsWith(spark, SfDir, Long.MaxValue).collect().toSeq
    val viaRank = Olap.quantileBinsWith(spark, SfDir, 1L).collect().toSeq
    assert(viaRank === viaCollect)
  }

  test("tfidf_docsim: scores in (0,1], pairs share a rare term") {
    val got = Search.tfidfDocsim(spark, SfDir).collect()
    assert(got.nonEmpty)
    val sims = got.map(_.getAs[Double]("tfidf_sim"))
    assert(sims.forall(s => s > 0.0 && s <= 1.0 + 1e-9))
    // output is the top slice, sorted desc with deterministic ties
    assert(sims.toSeq === sims.sortBy(-_).toSeq)
    got.foreach(r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    // top pair genuinely shares at least one token
    val top = got.head
    val texts = Tables.load(spark, SfDir, "documents")
      .filter(col("doc_id").isin(top.getAs[Long]("doc_a"),
        top.getAs[Long]("doc_b")))
      .select("text").as[String].collect()
      .map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet)
    assert(texts(0).intersect(texts(1)).nonEmpty)
  }
}
