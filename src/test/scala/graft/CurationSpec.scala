package graft

import graft.operators.{Curation, Dedup, Olap, Sampling}

/** Round-8 composition tests: the curation pipeline against a
  * plain-Scala reference implementation, incremental dedup against
  * the full pair set, and the quantile sketch against exact
  * percentiles. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def loadDocs() =
    graft.sources.Tables.load(spark, SfDir, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()

  test("curation_pipeline equals a plain-Scala reference run") {
    val docs = loadDocs()
    val zh = java.util.regex.Pattern.compile("[一-鿿]")
    val en = java.util.regex.Pattern.compile(
      "(^|\\s)(the|a|and|of|to|in|is)(\\s|$)")
    val es = java.util.regex.Pattern.compile(
      "(^|\\s)(el|la|los|de|que|y|en)(\\s|$)")
    def lang(t: String): String = {
      val l = t.toLowerCase
      if (zh.matcher(l).find()) "zh"
      else if (en.matcher(l).find()) "en"
      else if (es.matcher(l).find()) "es"
      else "und"
    }
    def nTok(t: String): Long = t.trim.toLowerCase.split("\\s+").length.toLong
    def hashKey(id: Long): Long = (id % 1000000007L) * 2654435761L % 1000000007L
    def split(id: Long): String = {
      val b = (id % 1000000007L) * 2654435761L % 1000L
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val gated = docs.filter { case (id, _, t) =>
      nTok(t) >= Curation.MinTokens && Curation.Langs.contains(lang(t)) }
    val keep = gated.groupBy(_._3).map(_._2.map(_._1).min).toSet
    val deduped = gated.filter(d => keep(d._1))
    val capped = deduped.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (hashKey(d._1), d._1)).take(Sampling.GroupCapN)
    }
    val want = capped.groupBy(d => (d._2, split(d._1))).map { case (k, ds) =>
      (k._1, k._2, ds.size.toLong, ds.map(x => nTok(x._3)).sum)
    }.toSet
    val got = Curation.curationPipeline(spark, SfDir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("incremental_dedup covers the batch exactly once and flags planted dups") {
    val out = Dedup.incrementalDedup(spark, SfDir)
      .as[(Long, Option[Long], Double, String)].collect()
    val batchIds = loadDocs().map(_._1).filter(_ % Dedup.IncrBatchMod == 0)
    assert(out.map(_._1).toSeq.sorted == batchIds.toSeq.sorted,
      "every batch doc appears exactly once")
    out.foreach { case (id, dupOf, _, verdict) =>
      assert((verdict == "drop") == dupOf.isDefined,
        s"verdict/dup_of consistent for $id")
      dupOf.foreach(d => assert(d % Dedup.IncrBatchMod != 0 || d < id,
        s"dup_of $d must be an existing doc or an EARLIER batch doc"))
    }
    assert(out.exists(_._4 == "drop"),
      "the planted dup families must surface at least one batch dup")
  }

  test("bucketed gram index: identical verdicts, no exchange on the index side") {
    val direct = Dedup.incrementalDedup(spark, SfDir)
      .as[(Long, Option[Long], Double, String)].collect().toSeq
    val bucketed = Dedup.incrementalDedupBucketed(spark, SfDir)
    val got = bucketed.as[(Long, Option[Long], Double, String)].collect().toSeq
    assert(got == direct, "bucketed index must be row-identical")
    // small-batch regime: planner broadcasts the probe; the bucketed
    // index streams with no exchange anywhere near it
    val plan = planOf(bucketed)
    assert(plan.contains("Bucketed: true"),
      s"index scan must read buckets:\n${plan.take(2000)}")
    // big-batch regime (broadcast disallowed): the SMJ shuffles ONLY
    // the probe side — exactly one hashpartitioning exchange carries
    // the join keys, and the index side reads its buckets in place
    val smjPlan = planOf(
      Dedup.incrementalDedupBucketed(spark, SfDir, forceSortMerge = true))
    assert(smjPlan.contains("SortMergeJoin"), "merge hint must hold")
    // formatted mode lists each Exchange's keys on an Arguments line
    val joinKeyExchanges = smjPlan.linesIterator.count(l =>
      l.contains("hashpartitioning") && l.contains("jblk"))
    assert(joinKeyExchanges == 1,
      s"expected exactly the probe-side shuffle, got $joinKeyExchanges")
  }

  test("approx_percentiles_exact: the ceil(p*n)-th order statistic " +
    "of the gated slice, every corpus group emitted") {
    import org.apache.spark.sql.functions._
    // the oracled twin runs the GK sketch below accuracy/2 rows per
    // group, where it is provably lossless and query(p) is exactly
    // the ceil(p*n)-th smallest value — assert that closed form (and
    // the regime precondition) directly. The keySet must be the FULL
    // corpus group set, not the sliced one (ADVICE r15 #1: an
    // empty-slice group must surface with NULL percentiles, not
    // vanish).
    val allTypes = graft.sources.Tables.load(spark, SfDir, "events")
      .select("event_type").distinct().as[String].collect().toSet
    val sliced = graft.sources.Tables.load(spark, SfDir, "events")
      .filter(conv(substring(md5(concat(lit("apx|"),
          col("event_id").cast("string"))), 25, 8), 16, 10)
        .cast("long") % 97 === 0)
      .filter(col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Olap.approxPercentilesExact(spark, SfDir)
      .as[(String, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect()
      .map(r => r._1 -> Seq(0.25 -> r._2, 0.5 -> r._3, 0.9 -> r._4,
        0.99 -> r._5)).toMap
    assert(approx.keySet == allTypes,
      "every corpus group must be emitted, slice empty or not")
    approx.foreach { case (k, ps) =>
      sliced.get(k) match {
        case None =>
          assert(ps.forall(_._2.isEmpty),
            s"$k: empty slice must carry NULL percentiles")
        case Some(xs) =>
          val n = xs.length
          assert(n < Olap.SketchAccuracy / 2,
            s"$k: slice of $n rows left the exact regime")
          ps.foreach { case (p, a) =>
            val want = xs(math.ceil(p * n).toInt - 1)
            // query output is rounded to 6dp — compare with epsilon
            assert(a.nonEmpty && math.abs(want - a.get) < 5e-7,
              s"$k p$p: got $a, want order statistic $want (n=$n)")
          }
      }
    }
  }

  test("GK sketch rank error at FULL corpus size stays within " +
    "n/accuracy") {
    import org.apache.spark.sql.functions._
    // the SHIPPED query (full-corpus sketch since round 16, ADVICE
    // r15 #1 — this rank-bound property IS its rows-only gate):
    // assert the documented bound vs exact order statistics. Output
    // is rounded to 6dp, so element membership is epsilon-matched
    // (with slack past 5e-7: a value landing exactly on a rounding
    // midpoint differs from its rounded form by exactly 5e-7).
    val vals = graft.sources.Tables.load(spark, SfDir, "events")
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Olap.approxPercentiles(spark, SfDir)
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(0.25 -> r._2, 0.5 -> r._3, 0.9 -> r._4,
        0.99 -> r._5))
      .toMap
    approx.foreach { case (k, ps) =>
      val xs = vals(k); val n = xs.length
      val tol = n.toDouble / Olap.SketchAccuracy + 1.0
      ps.foreach { case (p, a) =>
        val idx = xs.indexWhere(x => math.abs(x - a) <= 5.1e-7)
        assert(idx >= 0, s"$k p$p: $a is not an element of the group")
        val lastIdx = xs.lastIndexWhere(x => math.abs(x - a) <= 5.1e-7)
        val target = p * n
        assert(target >= idx - tol && target <= lastIdx + 1 + tol,
          s"$k p$p: rank of $a is [$idx,$lastIdx], target $target")
      }
    }
  }
}
