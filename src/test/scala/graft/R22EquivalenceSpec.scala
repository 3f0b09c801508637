package graft

import org.apache.spark.sql.functions._

/** Round-22 operator-rewrite equivalence pins, on the real sf0.001
  * corpus: each rewritten query must equal its round-21 form
  * row-for-row (the value gate is the DuckDB oracle; these pin the
  * two FORMS to each other so the rewrite can never change what the
  * query computes). */
class R22EquivalenceSpec extends SparkTestBase {

  test("keyword_extract: bounded aggregate equals the window form") {
    val a = graft.operators.Search
      .keywordExtractImpl(spark, SfDir, bounded = true).collect().toSeq
    val b = graft.operators.Search
      .keywordExtractImpl(spark, SfDir, bounded = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("keyword_extract: aggregate tie-break matches the window on a crafted tie") {
    // two tokens with identical (tf, df) in one doc → identical
    // decimal scores; the window breaks on tok asc, the aggregate on
    // the UTF8String binary order — craft docs where that matters,
    // including multi-byte tokens
    import spark.implicits._
    val docs = Seq(
      (1L, "zeta alpha zeta alpha beta"),
      (2L, "beta beta alpha alpha zeta zeta gamma gamma delta"),
      (3L, "öre zz öre zz aa aa")
    ).toDF("doc_id", "text")
    val tf = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val n = docs.count().toDouble
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .withColumn("idf9",
        round(log(lit(n) / col("df").cast("double")), 9)
          .cast("decimal(28,9)"))
    val scored = tf.join(dfT, "tok")
      .withColumn("score", col("tf").cast("decimal(10,0)") * col("idf9"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
    val win = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"),
        col("df"), round(col("score").cast("double"), 6).as("score"))
      .orderBy("doc_id", "rnk").collect().toSeq
    val agg = scored
      .withColumn("score_l",
        col("tf") * (col("idf9") * lit(1000000000L)).cast("long"))
      .groupBy("doc_id")
      .agg(graft.functions.AggFunctions.keywordTopK(col("score_l"),
        col("tok"), col("tf"), col("df"),
        round(col("score").cast("double"), 6), 3).as("ks"))
      .select(col("doc_id"), posexplode(col("ks")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.tok").as("tok"), col("col.tf").as("tf"),
        col("col.df").as("df"), col("col.score").as("score"))
      .orderBy("doc_id", "rnk").collect().toSeq
    assert(agg === win)
    assert(win.size === 9)
  }

  test("dedup_curve: hoisted-norm cosine equals the kernel form") {
    val a = graft.operators.Similarity
      .dedupCurveImpl(spark, SfDir, hoist = true).collect().toSeq
    val b = graft.operators.Similarity
      .dedupCurveImpl(spark, SfDir, hoist = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("triangle_count closing plan carries the merge-intersect kernel, not array_intersect") {
    // the tally checkpoint truncates triangleCount's own explain, so
    // assert on the extracted pre-checkpoint triple stream — both
    // gate branches
    val adjO = graft.operators.Components.orientedAdjacency(spark, SfDir)
    Seq(0L, Long.MaxValue).foreach { gate =>
      val tris = graft.operators.Components.triangleTriples(adjO,
        mEdges = gate)
      val plan = tris.queryExecution.analyzed.toString()
      assert(plan.toLowerCase.contains("sortedlongintersect"))
      assert(!plan.toLowerCase.contains("array_intersect"))
    }
    // and the two branches agree with each other on the real corpus
    val bc = graft.operators.Components.triangleTriples(adjO, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val sh = graft.operators.Components
      .triangleTriples(adjO, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(bc === sh)
    assert(bc.nonEmpty)
  }

  test("itemset_3: combinations form equals the triple self-join") {
    val now = graft.operators.Analytics.itemset3(spark, SfDir)
      .collect().toSeq
    // round-21 reference form, inline
    val lines = graft.operators.Components.basketLines(spark, SfDir)
    val a = lines.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = lines.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val c = lines.select(col("l_orderkey"), col("l_partkey").as("pc"))
    val ref = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .join(c, "l_orderkey").filter(col("pb") < col("pc"))
      .groupBy("pa", "pb", "pc")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pa").asc, col("pb").asc,
        col("pc").asc)
      .limit(20).collect().toSeq
    assert(now === ref)
    assert(now.nonEmpty)
  }
}
