package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity, TrainExport}

/** Round-15 batch C (SURVEY.md §2 #179, #183-184, #187): random
  * projection, systematic PPS sampling, stable ordinal assignment
  * and the embedding-outlier screen — design-property checks the
  * DuckDB oracle can't express (fixed-size draw, JL distance
  * preservation, append stability). */
class ProjectionSampleSpec extends SparkTestBase {
  import spark.implicits._

  test("systematic sample: exactly k hits, multi-hits only for oversize weights") {
    val rows = Sampling.systematicSample(spark, SfDir).collect()
    val k = Sampling.SysK
    assert(rows.map(_.getAs[Long]("n_hits")).sum === k)
    val wtot = spark.read.parquet(s"$SfDir/documents.parquet")
      .agg(sum(col("n_chars"))).head().getLong(0)
    rows.foreach { r =>
      val w = r.getAs[Long]("n_chars")
      val h = r.getAs[Long]("n_hits")
      // a doc can only be hit >1x when its weight exceeds a stride
      assert(h === 1L || w * k > wtot,
        s"doc ${r.getAs[Long]("doc_id")}: $h hits, w=$w")
    }
  }

  test("systematic sample is seeded-deterministic and weight-monotone-ish") {
    val a = Sampling.systematicSample(spark, SfDir).collect()
      .map(_.getAs[Long]("doc_id"))
    val b = Sampling.systematicSample(spark, SfDir).collect()
      .map(_.getAs[Long]("doc_id"))
    assert(a.sameElements(b))
  }

  test("assign_ids: dense 1..N, base ordinals unchanged by the new cohort") {
    val out = TrainExport.assignIds(spark, SfDir).collect()
    val ords = out.map(_.getAs[Long]("ordinal")).sorted
    assert(ords.sameElements(1L to out.length.toLong))
    // base rows occupy exactly 1..n_base: recompute their ranks from
    // the same key order over base rows ALONE — append must not have
    // disturbed them
    val base = out.filter(_.getAs[Long]("is_new") == 0L)
    val nBase = base.length.toLong
    assert(base.map(_.getAs[Long]("ordinal")).sorted
      .sameElements(1L to nBase))
    assert(out.filter(_.getAs[Long]("is_new") == 1L)
      .forall(_.getAs[Long]("ordinal") > nBase))
  }

  test("random projection: exact coords match a per-vector recompute, cosines roughly preserved") {
    val vecs = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val out = Similarity.randomProjection(spark, SfDir).collect()
      .groupBy(_.getAs[Long]("vec_id")).view
      .mapValues(_.sortBy(_.getAs[Long]("proj_dim"))
        .map(_.getAs[Long]("coord")).toSeq).toMap
    assert(out.keySet === vecs.keySet)
    def q6(x: Double): Long = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()
    def sgn(d: Int, j: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${d}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(md.substring(24, 32), 16) % 2 == 0) 1L
      else -1L
    }
    val sample = vecs.keys.toSeq.sorted.take(20)
    sample.foreach { id =>
      val v = vecs(id)
      val expect = (0 until Similarity.RpDims.toInt).map { j =>
        v.indices.map(d => q6(v(d)) * sgn(d, j)).sum
      }
      assert(out(id) === expect, s"vec $id")
    }
    // JL sanity: projected cosine correlates with true cosine over
    // random pairs (sign-projection at 8 dims is coarse — require
    // positive rank correlation, not accuracy)
    val ids = vecs.keys.toSeq.sorted.take(40)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val pairs = for (i <- ids.indices; k <- (i + 1) until ids.length
      if (i + k) % 7 == 0) yield (ids(i), ids(k))
    val tc = pairs.map { case (a, b) => cos(vecs(a), vecs(b)) }
    val pc = pairs.map { case (a, b) =>
      cos(out(a).map(_.toDouble), out(b).map(_.toDouble)) }
    val n = tc.length
    val (mt, mp) = (tc.sum / n, pc.sum / n)
    val corr = tc.zip(pc).map { case (x, y) => (x - mt) * (y - mp) }.sum /
      math.sqrt(tc.map(x => math.pow(x - mt, 2)).sum *
        pc.map(y => math.pow(y - mp, 2)).sum)
    assert(corr > 0.3, s"projection lost all geometry: corr=$corr over $n pairs")
  }

  test("embed outliers: flags agree with a direct own-centroid cosine recompute") {
    val e = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect()
    val cents = e.groupBy(_._3).view.mapValues { vs =>
      val dim = vs.head._2.length
      (0 until dim).map { d =>
        val s = vs.map(v => BigDecimal(v._2(d))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        (s / vs.length).toDouble
      }
    }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val expected = e.groupBy(_._3).view.mapValues { vs =>
      val cs = vs.map(v => BigDecimal(cos(v._2, cents(v._3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (vs.length.toLong, cs.count(_ < Similarity.OutlierCosMax).toLong)
    }.toMap
    Similarity.embedOutliers(spark, SfDir).collect().foreach { r =>
      val (n, out) = expected(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vecs") === n)
      // ±1 slack: the recompute's dot/sqrt(na*nb) can differ from the
      // kernel's dot/(sqrt(na)·sqrt(nb)) in the last ulp at a 6dp
      // rounding boundary; the DuckDB oracle pins the exact counts
      assert(math.abs(r.getAs[Long]("n_outliers") - out) <= 1,
        s"label ${r.getAs[Int]("label")}")
    }
  }
}
