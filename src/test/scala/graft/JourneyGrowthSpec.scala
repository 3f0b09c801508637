package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Dimensional, Sessions}
import graft.sources.Tables

/** Journey/growth/canonical operators (SURVEY §2 #161-163):
  * conservation identities beyond the value-level DuckDB oracles. */
class JourneyGrowthSpec extends SparkTestBase {

  test("session_paths: top-20, deterministic ranks, journeys conserved") {
    val out = Sessions.sessionPaths(spark, SfDir).collect()
    assert(out.length <= 20)
    assert(out.map(_.getLong(0)).toSeq === (1L to out.length))
    // counts non-increasing in rank; ties broken by path ascending
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) > b.getLong(2) ||
        (a.getLong(2) == b.getLong(2) &&
          a.getString(1) < b.getString(1)))
    case _ => ()
    }
    // every path is a '>'-joined sequence of known event types, <= 8
    val types = Set("click", "view", "signup", "purchase", "error")
    out.foreach { r =>
      val parts = r.getString(1).split(">")
      assert(parts.length <= 8 && parts.forall(types))
    }
  }

  test("user_growth: actives bounded, news conserve to the user total") {
    val out = Dimensional.userGrowth(spark, SfDir).collect()
    val users = Tables.load(spark, SfDir, "events")
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_new")).sum === users)
    assert(out.last.getAs[Long]("cum_users") === users)
    var cum = 0L
    out.foreach { r =>
      cum += r.getAs[Long]("n_new")
      assert(r.getAs[Long]("cum_users") === cum)
      // you can't be active before existing
      assert(r.getAs[Long]("n_active") <= cum)
    }
  }

  test("funnel per-user chain: skew-immune grouped-min route is " +
      "bit-identical to the window chain") {
    // the adaptive gate routes a hot-user feed (per-user rows >
    // Rank.SingleTaskMax) to the three-aggregate form; both routes
    // must agree on every (user, t1, t2, t3) row exactly
    val viaWindow = graft.operators.Dimensional
      .funnelPerUserVia(spark, SfDir, aggForm = false)
      .orderBy("user_id").collect().toSeq
    val viaAgg = graft.operators.Dimensional
      .funnelPerUserVia(spark, SfDir, aggForm = true)
      .orderBy("user_id").collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaWindow.exists(r => !r.isNullAt(1)), "corpus has signups")
  }

  test("canonical_docs: every doc in one cluster, winner is a member") {
    val out = Components.canonicalDocs(spark, SfDir).collect()
    val docs = Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_.getAs[Long]("n_members")).sum === docs.size.toLong)
    out.foreach { r =>
      val kept = r.getAs[Long]("kept_id")
      assert(docs.contains(kept))
      assert(docs(kept) === r.getAs[Long]("kept_chars"))
      assert(r.getAs[Long]("dropped_chars") >= 0L)
      // singleton clusters drop nothing
      if (r.getAs[Long]("n_members") == 1L)
        assert(r.getAs[Long]("dropped_chars") === 0L)
    }
  }
}
