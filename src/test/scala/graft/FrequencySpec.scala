package graft

import org.apache.spark.sql.functions._
import graft.functions.AggFunctions
import graft.operators.Frequency

/** Misra-Gries heavy-hitters sketch (SURVEY.md §2 #92): exact-regime
  * equivalence plus the MG bounds in the forced-approximate regime. */
class FrequencySpec extends SparkTestBase {
  import spark.implicits._

  test("heavy_hitters: exact regime matches groupBy-count exactly") {
    val got = Frequency.heavyHitters(spark, SfDir).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Long]("max_err") == 0L))
    val ev = graft.sources.Tables.load(spark, SfDir, "events")
    val n = ev.count()
    val exact = ev.groupBy("user_id").count()
      .filter(col("count") >= n / Frequency.HitFraction)
      .as[(Long, Long)].collect().toMap
    assert(got.map(r => r.getAs[Long]("item") -> r.getAs[Long]("est_count"))
      .toMap === exact)
  }

  test("approximate regime: MG bounds hold under capacity pressure") {
    // skewed synthetic stream: keys 0..4 hot (1000 each), 200 cold
    // singletons competing for a 16-slot sketch
    val rows = (0L until 5L).flatMap(k => Seq.fill(1000)(k)) ++
      (100L until 300L)
    val df = rows.toDF("k")
    val r = df.agg(AggFunctions.freqSketch(col("k"), 16).as("sk"))
      .select(col("sk.items").as("items"), col("sk.max_err").as("err"))
      .collect()(0)
    val err = r.getAs[Long]("err")
    val items = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => x.getAs[Long]("item") -> x.getAs[Long]("est")).toMap
    val n = rows.length.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // every estimate is an under-estimate within the tracked error
    items.foreach { case (k, est) =>
      assert(est <= truth(k), s"overestimated $k")
      assert(truth(k) - est <= err, s"undercount of $k exceeds max_err")
    }
    // the decrement total respects the n/capacity bound
    assert(err <= n / 16L)
    // no heavy key lost: anything with true count > max_err survives
    truth.filter(_._2 > err).keys.foreach(k =>
      assert(items.contains(k), s"heavy key $k missing"))
  }

  test("MG bounds hold across random streams and partitionings (seeded)") {
    val caps = Seq(8, 32)
    for (seed <- 1 to 3; cap <- caps) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: key k with weight ~ 1/k over a domain ≫ capacity
      val rows = Seq.fill(4000)(
        math.min(400L, (1.0 / math.max(rnd.nextDouble(), 1e-9)).toLong))
      val nPart = 1 + rnd.nextInt(16)
      val df = rows.toDF("k").repartition(nPart)
      val r = df.agg(AggFunctions.freqSketch(col("k"), cap).as("sk"))
        .select(col("sk.items").as("items"), col("sk.max_err").as("err"))
        .collect()(0)
      val err = r.getAs[Long]("err")
      val items = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => x.getAs[Long]("item") -> x.getAs[Long]("est")).toMap
      val truth = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(items.size <= cap, s"seed=$seed cap=$cap overflow")
      assert(err <= rows.length.toLong / cap, s"seed=$seed cap=$cap err=$err")
      items.foreach { case (k, est) =>
        assert(est <= truth(k), s"seed=$seed cap=$cap overestimated $k")
        assert(truth(k) - est <= err, s"seed=$seed cap=$cap undercount $k")
      }
      truth.filter(_._2 > err).keys.foreach(k =>
        assert(items.contains(k), s"seed=$seed cap=$cap lost heavy key $k"))
    }
  }

  test("sketch merge across many partitions stays exact under capacity") {
    // 64 partitions each seeing a slice: merge must reassemble counts
    val df = spark.range(0, 20000).repartition(64)
      .select((col("id") % 50L).as("k"))
    val r = df.agg(AggFunctions.freqSketch(col("k"), 8192).as("sk"))
      .select(col("sk.items").as("items"), col("sk.max_err").as("err"))
      .collect()(0)
    assert(r.getAs[Long]("err") === 0L)
    val items = r.getSeq[org.apache.spark.sql.Row](0)
    assert(items.length === 50)
    assert(items.forall(_.getAs[Long]("est") == 400L))
  }
}
