package graft

import graft.functions.expressions.SentimentCounts
import org.apache.spark.sql.Row
import org.apache.spark.unsafe.types.UTF8String

/** Kernel test vectors for the SentimentCounts expression (SURVEY.md
  * §2 #66/#67): lexicon hits, case folding, blank/whitespace edges,
  * interpreted vs codegen parity, and the hash-collision-freedom
  * claim the kernel doc makes about the pre-hashed lexicons.
  */
class SentimentSpec extends SparkTestBase {

  private def counts(s: String): (Int, Int, Int) = {
    val r = SentimentCounts.compute(UTF8String.fromString(s))
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("kernel vectors: lexicon hits and token totals") {
    assert(counts("good gain on big purchase") === ((4, 0, 5)))
    assert(counts("bad loss, slow error") === ((0, 3, 4)))
    // "loss," is a distinct token (whitespace tokenizer, no
    // punctuation stripping) — must NOT match the 'loss' lexicon entry
    assert(counts("up down up down") === ((2, 2, 4)))
    assert(counts("the quick brown fox") === ((0, 0, 4)))
    // repeated hits count each occurrence
    assert(counts("up up up") === ((3, 0, 3)))
  }

  test("kernel vectors: case folding is ASCII lowercase") {
    assert(counts("GOOD Gain uP") === ((3, 0, 3)))
    assert(counts("BAD Poor LOSS") === ((0, 3, 3)))
    // non-ASCII letters are not folded (byte-level kernel): a token
    // differing by a non-ASCII char is a different token
    assert(counts("goodé") === ((0, 0, 1)))
  }

  test("kernel vectors: blank and edge-whitespace inputs") {
    assert(counts("") === ((0, 0, 0)))
    assert(counts("   ") === ((0, 0, 0)))
    assert(counts("\t\n\r\f") === ((0, 0, 0)))
    // leading/trailing/internal runs of any whitespace kind collapse
    assert(counts("\t good\n\nbad  ") === ((1, 1, 2)))
    assert(counts(" up") === ((1, 0, 1)))
  }

  test("interpreted eval matches the static kernel") {
    val expr = SentimentCounts(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("Good day, bad LOSS up"),
        org.apache.spark.sql.types.StringType))
    val r = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((2, 2, 5)))
  }

  test("codegen path (DataFrame) matches kernel vectors, null-safe") {
    import spark.implicits._
    val df = Seq(
      Some("good gain on big purchase"),
      Some(""),
      Some("\t bad\n"),
      None: Option[String]
    ).toDF("text")
      .withColumn("s", graft.functions.TextFunctions.sentimentCounts(
        org.apache.spark.sql.functions.col("text")))
      .selectExpr("s.n_pos", "s.n_neg", "s.n_tok")
    val rows = df.collect()
    assert(rows(0) === Row(4, 0, 5))
    assert(rows(1) === Row(0, 0, 0))
    assert(rows(2) === Row(0, 1, 1))
    assert(rows(3) === Row(null, null, null))
    // single-pass claim: the kernel is evaluated once per row in the
    // operator plan (not re-tokenized per derived column — the HOF
    // recompute trap this expression exists to avoid)
    val plan = planOf(graft.operators.TextOps.sentimentDocs(spark, SfDir))
    assert("sentimentcounts\\(".r.findAllIn(plan).size === 1, plan.take(3000))
  }

  test("pre-hashed lexicons are collision-free (doc claim)") {
    val words = SentimentCounts.PosWords ++ SentimentCounts.NegWords
    assert(words.distinct.size === words.size)
    val hashes = words.map { w =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0)
    }
    assert(hashes.distinct.size === words.size,
      "XXH64 collision within the lexicons would break hash-equality")
    // and no lexicon word collides with common non-lexicon tokens
    val others = Seq("the", "a", "on", "day,", "loss,", "ups", "gains")
    val otherH = others.map { w =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0)
    }
    assert(otherH.toSet.intersect(hashes.toSet).isEmpty)
  }
}
