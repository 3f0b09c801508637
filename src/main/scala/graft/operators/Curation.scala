package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions

/** End-to-end corpus curation (SURVEY.md §2 #81): the composed
  * pipeline a training-data team actually ships — quality gate →
  * language filter → exact dedup → per-source cap → split assignment
  * → release accounting — built entirely from the already-verified
  * stage operators, demonstrating that the pieces compose into one
  * Catalyst plan (single job, no intermediate materialization).
  *
  * Scale shape (§5): ONE corpus scan computes the per-doc quality,
  * language, and content-hash columns (codegen'd kernels + sha2) and
  * reduces each doc to a scalars-only metadata row (~40 B/doc),
  * materialized via localCheckpoint — every later stage (dedup
  * keep-set, cap, split, accounting) runs off that table, so the
  * lazy-plan alternative of re-scanning and re-tokenizing the corpus
  * once per consuming branch (8 scans in the composed plan) never
  * happens. The cap rides the bounded-heap TopKAgg (O(cap) state per
  * source); split assignment is a pure per-row projection; the final
  * accounting is one map-side-combined aggregate. Nothing in the
  * composition adds state proportional to a hot group.
  */
object Curation {

  /** Quality gate: minimum whitespace-token count (the short-doc
    * filter every mix applies). */
  val MinTokens = 20
  /** Languages admitted to the mix. */
  val Langs: Seq[String] = Seq("en", "es")

  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        TextFunctions.tokenCounts(col("text")).getField("ws")
          .cast("long").as("n_tok"),
        TextFunctions.langId(col("text")).as("pred_lang"))
    // stage 1+2: quality + language gates, then reduce every
    // surviving doc to scalars (text itself is not needed past the
    // content hash) and materialize — the single corpus scan
    val meta = docs
      .filter(col("n_tok") >= MinTokens && col("pred_lang").isin(Langs: _*))
      .select(col("doc_id"), col("source"), col("n_tok"),
        sha2(col("text"), 256).as("h"))
      .localCheckpoint()
    // stage 3: exact dedup — keep the min doc_id per content hash
    val keeps = meta
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = meta.join(keeps, "doc_id")
    // stage 4: per-source cap, same deterministic hash order as #65
    val capped = deduped
      .groupBy(col("source"))
      .agg(graft.functions.AggFunctions.topK(
        -Sampling.hashKey(col("doc_id")).cast("double"), col("doc_id"),
        Sampling.GroupCapN).as("top"))
      .select(col("source"), explode(col("top")).as("t"))
      .select(col("source"), col("t.id").as("doc_id"))
      .join(deduped.select("doc_id", "n_tok"), "doc_id")
    // stage 5+6: split assignment + release accounting
    capped
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy("source", "split")
  }
}
