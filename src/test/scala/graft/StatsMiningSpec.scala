package graft

import graft.operators.{Analytics, Dimensional, LmFilter, Multimodal}

/** Batch-6 operators (SURVEY §2 #169-172): structural invariants
  * beyond the value-level DuckDB oracles. */
class StatsMiningSpec extends SparkTestBase {

  test("pmi_collocations: gated counts, dense ranks, ordered scores") {
    val out = LmFilter.pmiCollocations(spark, SfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSeq === (1L to out.length))
    out.foreach(r => assert(r.getLong(3) >= LmFilter.PmiMinCount))
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4))
      case _ => ()
    }
  }

  test("growth_accounting: actives decompose, news match user_growth") {
    val out = Dimensional.growthAccounting(spark, SfDir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"),
        s"day ${r.get(0)}")
    }
    // churned on day d <= actives on day d-1
    out.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Long]("n_churned") <= prev.getAs[Long]("n_active"))
      case _ => ()
    }
    val growthNews = Dimensional.userGrowth(spark, SfDir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("n_new")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_new") === growthNews(r.getDate(0).toString))
    }
  }

  test("chi_square: dof arithmetic, non-negative statistic") {
    val r = Analytics.chiSquare(spark, SfDir).collect().head
    assert(r.getAs[Long]("dof") ===
      (r.getAs[Long]("n_segments") - 1) *
        (r.getAs[Long]("n_priorities") - 1))
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("n_segments") > 1 &&
      r.getAs[Long]("n_priorities") > 1)
  }

  test("frame_sample: k rows per video, instants within duration") {
    val out = Multimodal.frameSample(spark, SfDir).collect()
    val vids = Multimodal.multimodalVideo(spark, SfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("duration_ms"))
      .toMap
    assert(out.length === vids.size * Multimodal.FramesPerVideo)
    out.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("frame_idx"))
      assert(sorted.length === Multimodal.FramesPerVideo)
      var prev = -1L
      sorted.foreach { r =>
        val s = r.getAs[Long]("sample_ms")
        assert(s >= prev && s < math.max(vids(id), 1L) ||
          (vids(id) == 0L && s == 0L), s"doc $id")
        prev = s
        assert(r.getAs[Long]("duration_ms") === vids(id))
      }
    }
  }
}
