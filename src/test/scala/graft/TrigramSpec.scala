package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Parity tests for the fused TrigramStats kernel (SURVEY.md §2
  * #70/#74): it must equal the composed built-in form it replaced —
  * token count, trigram count, and duplicate count via actual trigram
  * STRINGS — on edge inputs and on the real corpus (where any 64-bit
  * trigram-hash collision would show up as an n_dup mismatch).
  */
class TrigramSpec extends SparkTestBase {
  import spark.implicits._

  private val edgeTexts = Seq(
    "a b c", "a b", "a", "", " ", "\t\n", "a  b \t c  d",
    "x y x y x y x y", "the the the the the",
    "one two three one two three one two four",
    "É b c é b c", "中文 token 中文 token 中文 token",
    "A B C a b c A B C", "  leading ws trigram here  ",
    "p q r s t u v w x y z")

  private def composed(c: org.apache.spark.sql.Column) = {
    val toks = filter(split(lower(trim(c)), "\\s+"), t => t =!= lit(""))
    val tg = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))
    struct(size(toks).as("n_tok"), size(tg).as("n_tg"),
      (size(tg) - size(array_distinct(tg))).as("n_dup"))
  }

  test("kernel equals the composed string form on edge inputs") {
    val rows = edgeTexts.toDF("text")
      .select(col("text"), TextFunctions.trigramStats(col("text")).as("k"),
        composed(col("text")).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(1) === r.getStruct(2),
        s"kernel vs composed mismatch for '${r.getString(0).take(40)}'")
    }
  }

  test("kernel equals the composed string form on the corpus") {
    val bad = graft.sources.Tables.load(spark, SfDir, "documents")
      .select(TextFunctions.trigramStats(col("text")).as("k"),
        composed(col("text")).as("c"))
      .filter(col("k") =!= col("c"))
      .count()
    assert(bad === 0L)
  }

  test("repetition query runs the kernel once per row, no array ops") {
    val plan = planOf(graft.operators.TextOps.repetitionScore(spark, SfDir))
    assert("trigramstats\\(".r.findAllIn(plan.toLowerCase).size === 1,
      plan.take(3000))
    assert(!plan.contains("array_distinct"), plan.take(3000))
  }

  test("corpus_stats runs trigram and sentiment kernels once per row") {
    val plan = planOf(graft.operators.TextOps.corpusStats(spark, SfDir))
    assert("trigramstats\\(".r.findAllIn(plan.toLowerCase).size === 1,
      plan.take(3000))
    assert("sentimentcounts\\(".r.findAllIn(plan.toLowerCase).size === 1,
      plan.take(3000))
  }
}
