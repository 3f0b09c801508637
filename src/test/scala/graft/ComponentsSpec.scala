package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup}

/** Connected-components dedup clustering tests (SURVEY.md §2 #75):
  * the label-propagation fixed point must equal a plain union-find
  * over the same edges, and the end-to-end clustering must be a
  * partition of the corpus with min-id canonicals. */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("a", "b")
    Components.connectedComponents(n, e)
      .as[(Long, Long)].collect().toMap
  }

  test("chain components merge transitively (a~b, b~c, no a~c edge)") {
    // the exact case a one-shot pair policy cannot express
    val got = cc(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("min label crosses a high-id bridge node") {
    // path 1 - 10 - 5: the minimum must propagate THROUGH 10 to 5
    val got = cc(Seq(1L, 5L, 10L), Seq((1L, 10L), (5L, 10L)))
    assert(got == Map(1L -> 1L, 5L -> 1L, 10L -> 1L))
  }

  test("deep chain needs multiple propagation rounds and still converges") {
    val ids = (0L to 40L)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = cc(ids, edges)
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("label propagation equals union-find on the real edge set") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val edges = Dedup.ngramJaccardPairs(docs)
      .filter(col("jac") >= Components.EdgeThreshold)
      .select("a", "b").as[(Long, Long)].collect()
    val nodes = docs.select("doc_id").as[Long].collect()
    // reference union-find
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = nodes.map(n => n -> find(n)).toMap
    val got = cc(nodes.toSeq, edges.toSeq)
    assert(got == want)
  }

  test("dedupComponents is a partition with min-id canonicals") {
    val out = Components.dedupComponents(spark, SfDir)
      .select("doc_id", "comp_id", "comp_size", "is_canonical")
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = graft.sources.Tables.load(spark, SfDir, "documents").count()
    assert(out.length == nDocs, "every doc appears exactly once")
    val byComp = out.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp, s"comp $comp labeled by min id")
      assert(members.forall(_._3 == members.length),
        s"comp $comp sizes consistent")
      assert(members.count(_._4 == 1L) == 1 &&
        members.find(_._4 == 1L).get._1 == comp,
        s"comp $comp has exactly one canonical = min id")
    }
    // the planted dup families must actually cluster: at least one
    // multi-doc component exists at every SF
    assert(byComp.exists(_._2.length >= 2), "found a non-trivial cluster")
  }
}
