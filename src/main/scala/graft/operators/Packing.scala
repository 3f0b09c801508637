package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions

/** Training-sequence packing (SURVEY.md §2 #89): GPT-style
  * concat-and-cut — per source, document token streams are laid
  * end-to-end in doc_id order and cut into fixed
  * [[SeqBudget]]-token sequences; each doc reports the sequence
  * range it lands in. The packing offset is a PREFIX SUM, which a
  * naive window (`partitionBy(source)`) would compute by sorting an
  * entire source's documents into ONE task — the exact shape that
  * dies on a 10^9-doc source. Instead the offset is a two-level
  * distributed scan:
  *
  *   1. block subtotals: docs group into [[BlockDocs]]-doc blocks by
  *      doc_id; one tiny aggregate row per (source, block);
  *   2. block bases: a running sum over the per-source BLOCK table
  *      (rows/BlockDocs rows — at 100 TB this is the small table);
  *   3. in-block offsets: a window keyed by (source, block), whose
  *      partitions are bounded at BlockDocs rows by construction.
  *
  * No task ever holds more than max(BlockDocs, blocks-per-source)
  * rows of window state, and the result is independent of physical
  * partitioning. Token counts use the same whitespace kernel as the
  * curation gate, so the DuckDB twin is exact.
  */
object Packing {

  val SeqBudget = 512L
  val BlockDocs = 256L

  /** #89 Pack documents into fixed-token training sequences. Output
    * per doc: its token count, global token offset within its
    * source's stream, and the [seq_id, seq_end] sequence range it
    * spans (empty docs occupy their boundary sequence). */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesBy(spark, dir,
      TextFunctions.tokenCounts(col("text")).getField("ws").cast("long"))

  /** [[packSequences]] under any token metric: `nTok` is evaluated
    * over the documents scan (whitespace kernel for the oracled
    * query; the learned-BPE kernel via [[Bpe.bpeTokens]] for real
    * budget metering — BpeSpec pins that path's prefix sums). The
    * two-level scan shape is metric-independent. */
  def packSequencesBy(spark: SparkSession, dir: String,
      nTok: org.apache.spark.sql.Column): DataFrame = {
    // ONE explicit exchange on (source, blk) feeds both the block
    // subtotals and the per-doc offsets: without it, the groupBy's
    // map-side partial agg makes the two subtrees' exchanges differ,
    // so the text scan and the token kernel run TWICE — the token
    // counting over the full text dominates everything else here, and
    // the 3-narrow-column shuffle that buys its reuse is far cheaper
    // at any scale.
    // Reuse only happens if both consumers' subtrees canonicalize
    // identically, so (a) the non-null filters the JOIN infers on its
    // keys are declared explicitly here (both copies then carry the
    // same conjuncts), and (b) blk is derived ABOVE the exchange —
    // deriving it below would let the subtotal branch prune doc_id
    // out of its copy and the two exchanges would no longer match.
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), nTok.as("n_tok"))
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        expr(s"(doc_id DIV $BlockDocs) IS NOT NULL"))
      .repartition(col("source"), expr(s"doc_id DIV $BlockDocs"))
      .withColumn("blk", expr(s"doc_id DIV $BlockDocs"))
    // (1) one subtotal row per (source, block)
    val blocks = d.groupBy("source", "blk")
      .agg(sum(col("n_tok")).as("blk_tok"))
    // (2) exclusive running sum over the tiny per-source block table
    val byBlk = Window.partitionBy("source").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = blocks
      .withColumn("base", sum(col("blk_tok")).over(byBlk) - col("blk_tok"))
      .select("source", "blk", "base")
    // (3) exclusive in-block scan — ≤ BlockDocs rows of state per task
    val inBlk = Window.partitionBy("source", "blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(bases, Seq("source", "blk"))
      .withColumn("tok_offset",
        col("base") + sum(col("n_tok")).over(inBlk) - col("n_tok"))
      .withColumn("seq_id", expr(s"tok_offset DIV $SeqBudget"))
      .withColumn("seq_end",
        expr(s"(tok_offset + greatest(n_tok, 1L) - 1L) DIV $SeqBudget"))
      .select(col("source"), col("doc_id"), col("n_tok"), col("tok_offset"),
        col("seq_id"), col("seq_end"),
        (col("seq_end") - col("seq_id") + 1L).as("n_seqs"))
      .orderBy("source", "doc_id")
  }
}
