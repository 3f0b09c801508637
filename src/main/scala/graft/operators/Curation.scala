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
  * Scale shape (§5): one corpus scan computes the per-doc quality and
  * language columns (codegen'd kernels); the dedup keep-set is a
  * content-hash aggregate (shuffles 40 B/doc); the cap rides the
  * bounded-heap TopKAgg (O(cap) state per source); split assignment
  * is a pure per-row projection; the final accounting is one
  * map-side-combined aggregate. Nothing in the composition adds
  * state proportional to a hot group.
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
    // stage 1+2: quality + language gates (pushed into the scan's
    // projection; the kernels run once per doc)
    val gated = docs
      .filter(col("n_tok") >= MinTokens && col("pred_lang").isin(Langs: _*))
    // stage 3: exact dedup — keep the min doc_id per content hash
    val keeps = gated
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = gated.join(keeps, "doc_id")
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
