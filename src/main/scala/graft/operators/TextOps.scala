package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.fnv64

/** Text-analysis queries over `documents` (SURVEY.md §2 #27-30) —
  * the reference's "text analyzed data" surface
  * (/root/reference/README.md:3) plus the brief's training-data
  * quality operators. All built-ins/codegen'd expressions; each runs
  * as a single scan + (at most) one aggregate shuffle.
  */
object TextOps {

  /** #27 Language ID: per predicted language, doc count and agreement
    * with the (random) corpus labels. */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("pred_lang", langId(col("text")))
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
          .as("n_label_match"))
      .orderBy("pred_lang")

  /** #28 Quality scoring: per-doc metrics (exact int arithmetic /
    * double divisions → engine-agnostic). */
  def qualityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id") +: qualityColumns(col("text")): _*)
      .orderBy("doc_id")

  /** #29 Token counting: whitespace and BPE-ish subword counts,
    * rolled up per source. */
  def tokenCountQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"), wsTokenCount(col("text")).as("ws"),
        bpeTokenCount(col("text")).as("bpe"))
      .groupBy("source")
      .agg(sum(col("ws")).as("ws_tokens"), sum(col("bpe")).as("bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** #30 Document fingerprint via the codegen'd FNV-1a 64 kernel.
    * Not SQL-expressible in DuckDB → rows-only gate; exact test
    * vectors in Fnv64Spec. */
  def fingerprintQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), fnv64(col("text")).as("fingerprint"))
      .orderBy("doc_id")
}
