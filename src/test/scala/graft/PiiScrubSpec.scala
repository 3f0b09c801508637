package graft

import graft.functions.expressions.PiiScrub
import org.apache.spark.sql.Row
import org.apache.spark.unsafe.types.UTF8String

/** Kernel test vectors for the fused PiiScrub expression (SURVEY.md
  * §2 #44): fast-path (no '@') byte scanning, the email-regex
  * fallback, oracle-nesting semantics (counts over the original text,
  * phone replace over the email-replaced text), and parity with the
  * nested-regexp form the DuckDB oracle runs.
  */
class PiiScrubSpec extends SparkTestBase {

  private def scrub(s: String): (Long, Long, String) = {
    val r = PiiScrub.compute(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
  }

  test("no-PII fast path returns the input untouched") {
    val in = UTF8String.fromString("no pii here at all")
    val r = PiiScrub.compute(in)
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
    // zero-allocation contract: the very same UTF8String comes back
    assert(r.getUTF8String(2) eq in)
  }

  test("phone scanner matches regex find semantics") {
    assert(scrub("call 555-123-4567 now") ===
      ((0L, 1L, "call <PHONE> now")))
    // leftmost non-overlapping: a leading digit shifts the match start
    assert(scrub("1234-567-8901") === ((0L, 1L, "1<PHONE>")))
    // trailing extra digit stays (exactly 12 chars consumed)
    assert(scrub("123-456-78901") === ((0L, 1L, "<PHONE>1")))
    // adjacent matches
    assert(scrub("111-222-3333444-555-6666") === ((0L, 2L, "<PHONE><PHONE>")))
    // near-misses: wrong group widths never match
    assert(scrub("12-345-6789 1234-56-789") === ((0L, 0L, "12-345-6789 1234-56-789")))
    // multi-byte UTF-8 neighbours do not confuse the byte scanner
    assert(scrub("täl 555-123-4567 über") === ((0L, 1L, "täl <PHONE> über")))
  }

  test("email fallback and nested-replace semantics") {
    assert(scrub("mail alice.smith+x@example.org please") ===
      ((1L, 0L, "mail <EMAIL> please")))
    assert(scrub("a@b.co.uk end") === ((1L, 0L, "<EMAIL> end")))
    // '@' present but no email match: fallback path, text unchanged
    assert(scrub("just an @ sign") === ((0L, 0L, "just an @ sign")))
    // both kinds in one text
    assert(scrub("call 555-123-4567 or mail bob@corp.io") ===
      ((1L, 1L, "call <PHONE> or mail <EMAIL>")))
    // phone digits adjacent to an email: the email match ends after
    // the dot+letters run ("a@b.com"), so the trailing phone is still
    // matched — same as the built-in nested regexp_replace form
    assert(scrub("a@b.com555-123-4567") === ((1L, 1L, "<EMAIL><PHONE>")))
  }

  test("kernel equals the nested regexp built-in form (oracle twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emailRe = PiiScrub.EmailRe
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val texts = Seq(
      "contact me at alice.smith+x@example.org for details",
      "call 555-123-4567 or mail bob@corp.io",
      "no pii here at all", "", "   ",
      "x@y.zz 111-222-3333 x@y.zz 111-222-3333",
      "a@b.com555-123-4567", "1234-567-89012", "just an @ sign",
      "täl 555-123-4567 über ünïcode@dömain.com")
    val df = texts.toDF("text")
      .withColumn("p", graft.functions.TextFunctions.piiScrubStruct(col("text")))
      .select(
        col("p.n_emails"), col("p.n_phones"), col("p.clean_text"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("e2"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("p2"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("c2"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(3), s"email count: $r")
      assert(r.getLong(1) === r.getLong(4), s"phone count: $r")
      assert(r.getString(2) === r.getString(5), s"clean text: $r")
    }
  }

  test("codegen path (DataFrame) is null-safe and single-pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(Some("call 555-123-4567"), None: Option[String])
      .toDF("text")
      .withColumn("p", graft.functions.TextFunctions.piiScrubStruct(col("text")))
      .selectExpr("p.n_emails", "p.n_phones", "p.clean_text")
      .collect()
    assert(rows(0) === Row(0L, 1L, "call <PHONE>"))
    assert(rows(1) === Row(null, null, null))
    // the kernel appears once in the operator plan (not re-run per
    // derived column — the recompute trap the fused struct avoids)
    val plan = planOf(graft.operators.TextOps.piiScrub(spark, SfDir))
    assert("piiscrub\\(".r.findAllIn(plan.toLowerCase).size === 1,
      plan.take(3000))
  }
}
