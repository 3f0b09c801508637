package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Parity tests for the fused QualityStats kernel (SURVEY.md §2 #28):
  * the kernel must equal the composed built-in form (two splits +
  * interpreted array-filter + regexp_replace) it replaced — including
  * the split-with-boundary-empties token count — on edge inputs and
  * on the real corpus.
  */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private val edgeTexts = Seq(
    "the quick brown fox", "el perro y la casa", "",
    " ", "   ", "\t", "\tleading tab", "trailing tab\t",
    "a  b   c", "dots. and, punct! all; over: here?",
    "THE Upper IS folded", "multi\nline\ntext", "\n\n",
    "unicode é ü 中文 tokens", "is is is", "x")

  private def composed(c: org.apache.spark.sql.Column) = {
    val toks = split(lower(trim(c)), "\\s+")
    val stops = TextFunctions.EnStop ++ TextFunctions.EsStop
    struct(
      length(c).cast("long").as("n_chars"),
      size(toks).as("n_tok"),
      (length(c) - length(regexp_replace(c, TextFunctions.PunctClass, "")))
        .as("n_punct"),
      size(filter(toks, t => t.isInCollection(stops))).as("n_stop"))
  }

  test("kernel equals the composed built-in form on edge inputs") {
    val rows = edgeTexts.toDF("text")
      .select(col("text"), TextFunctions.qualityStruct(col("text")).as("k"),
        composed(col("text")).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(1) === r.getStruct(2),
        s"kernel vs composed mismatch for ${r.getString(0).take(40)}")
    }
  }

  test("kernel equals the composed built-in form on the corpus") {
    val bad = graft.sources.Tables.load(spark, SfDir, "documents")
      .select(TextFunctions.qualityStruct(col("text")).as("k"),
        composed(col("text")).as("c"))
      .filter(col("k") =!= col("c"))
      .count()
    assert(bad === 0L)
  }

  test("quality query runs the kernel once per row") {
    val plan = planOf(graft.operators.TextOps.qualityQuery(spark, SfDir))
    assert("qualitystats\\(".r.findAllIn(plan.toLowerCase).size === 1,
      plan.take(3000))
  }
}
