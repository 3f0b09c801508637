package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling}

/** #125 curation audit + #126 quality-percentile gate. */
class CurationGateSpec extends SparkTestBase {

  test("curation_audit: verdicts respect stage precedence and the " +
    "kept set reproduces curation_pipeline's release accounting") {
    val audit = Curation.curationAudit(spark, SfDir).cache()
    // one verdict per doc, total coverage
    val n = graft.sources.Tables.load(spark, SfDir, "documents").count()
    assert(audit.count() === n)
    assert(audit.filter(!col("verdict").isin(
      "quality", "language", "duplicate", "source_cap", "kept"))
      .count() === 0L)
    // precedence: a doc failing the token gate can carry no later
    // verdict, whatever its language or dup status
    assert(audit.filter(col("n_tok") < Curation.MinTokens &&
      col("verdict") =!= "quality").count() === 0L)
    // the audit's kept rows ARE the pipeline's release: re-aggregate
    // them with the pipeline's own grouping and compare exactly
    val fromAudit = audit.filter(col("verdict") === "kept")
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy("source", "split").collect().toSeq
    val fromPipeline =
      Curation.curationPipeline(spark, SfDir).collect().toSeq
    assert(fromAudit === fromPipeline)
    audit.unpersist()
  }

  test("quality_filter: the two-level rank equals the single-window " +
    "global rank, and keep counts hit ceil(0.6n) per language") {
    val out = Curation.qualityFilter(spark, SfDir).cache()
    // the naive global-window form (fine at spec scale) — must agree
    // row for row with the skew-immune two-level decomposition
    val w = Window.partitionBy("lang")
      .orderBy(col("score").desc, col("doc_id").asc)
    val naive = out.select("doc_id", "lang", "score")
      .withColumn("rnk", row_number().over(w).cast("long"))
    val joined = out.select(col("doc_id"), col("rnk").as("r2"))
      .join(naive.select(col("doc_id"), col("rnk").as("r1")), "doc_id")
    assert(joined.filter(col("r1") =!= col("r2")).count() === 0L)
    // keep budget: per lang, kept == ceil(3n/5), and the kept set is
    // exactly ranks 1..ceil(3n/5)
    val perLang = out.groupBy("lang").agg(
      count(lit(1)).as("n"), sum(col("kept")).as("k"),
      max(when(col("kept") === 1L, col("rnk"))).as("maxKeptRnk"))
      .collect()
    perLang.foreach { r =>
      val (n, k, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k === (3 * n + 4) / 5, s"lang ${r.getString(0)}")
      assert(mx === k)
    }
    out.unpersist()
  }
}
