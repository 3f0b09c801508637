package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII-scrub kernel (SURVEY.md §2 #44) — one call per row
  * returning `struct(n_emails, n_phones, clean_text)`.
  *
  * The composed built-in form (`regexp_count`×2 + nested
  * `regexp_replace`×2) runs four regex automata over the full text
  * and converts UTF8String⇄String for each — the dominant cost of
  * the redaction pass over a 100 TB corpus. This kernel:
  *
  *  - pre-scans the raw UTF-8 bytes once; if no '@' byte exists (the
  *    overwhelmingly common case for already-clean text) the email
  *    regex never runs at all;
  *  - matches phone numbers with an exact hand scanner for
  *    `[0-9]{3}-[0-9]{3}-[0-9]{4}` — byte-level, allocation-free,
  *    and match-for-match identical to `Pattern.find` semantics
  *    (leftmost, non-overlapping, advance past each match);
  *  - only when an '@' is present falls back to the statically
  *    compiled `java.util.regex` email pattern — the same engine
  *    Spark's `regexp_replace` uses, so redaction semantics are
  *    bit-identical to the built-in form (and to the DuckDB/RE2
  *    oracle, with which that form has been hash-green);
  *  - returns the original UTF8String unchanged (zero allocation)
  *    when nothing matched.
  *
  * Counting semantics mirror the oracle exactly: both counts are
  * taken over the ORIGINAL text, while `clean_text` applies the
  * phone replacement to the email-replaced text (nested-replace
  * order), so even pathological overlaps agree with
  * `regexp_replace(regexp_replace(text, email,'<EMAIL>','g'),
  * phone,'<PHONE>','g')`.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScrub.Schema
  override def nullSafeEval(v: Any): Any =
    PiiScrub.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PiiScrub.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScrub {
  val Schema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  /** Kept in exact sync with `TextOps.EmailRe` / the oracle SQL. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val EmailPat = Pattern.compile(EmailRe)

  private val EmailTag = "<EMAIL>"
  private val PhoneTagBytes =
    "<PHONE>".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    var hasAt = false
    var i = 0
    while (i < bytes.length && !hasAt) {
      if (bytes(i) == '@') hasAt = true
      i += 1
    }
    if (!hasAt) computeNoEmail(text, bytes)
    else computeWithEmail(text)
  }

  /** Fast path: no '@' byte → zero email matches possible (the email
    * pattern requires a literal '@'). Phones are scanned byte-wise —
    * safe in UTF-8 because every non-ASCII code point encodes to
    * bytes ≥ 0x80, so ASCII digit/hyphen bytes only ever appear as
    * themselves. */
  private def computeNoEmail(text: UTF8String, bytes: Array[Byte]): InternalRow = {
    var n = 0
    var i = 0
    // First pass: count only (so the no-match case allocates nothing).
    while (i + 12 <= bytes.length) {
      if (phoneAt(bytes, i)) { n += 1; i += 12 } else i += 1
    }
    if (n == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, text))
    val out = new Array[Byte](bytes.length + n * (PhoneTagBytes.length - 12))
    var src = 0
    var dst = 0
    while (src < bytes.length) {
      if (src + 12 <= bytes.length && phoneAt(bytes, src)) {
        System.arraycopy(PhoneTagBytes, 0, out, dst, PhoneTagBytes.length)
        dst += PhoneTagBytes.length
        src += 12
      } else {
        out(dst) = bytes(src); dst += 1; src += 1
      }
    }
    new GenericInternalRow(Array[Any](0L, n.toLong, UTF8String.fromBytes(out)))
  }

  /** Exact recognizer for `[0-9]{3}-[0-9]{3}-[0-9]{4}` at offset i. */
  private def phoneAt(b: Array[Byte], i: Int): Boolean = {
    var j = 0
    while (j < 12) {
      val c = b(i + j)
      val ok =
        if (j == 3 || j == 7) c == '-'
        else c >= '0' && c <= '9'
      if (!ok) return false
      j += 1
    }
    true
  }

  /** Slow path ('@' present): email count+replace via the compiled
    * Java pattern, then phone count over the ORIGINAL chars and phone
    * replace over the email-replaced chars (= the oracle's nesting). */
  private def computeWithEmail(text: UTF8String): InternalRow = {
    val s = text.toString
    var nEmails = 0L
    val m = EmailPat.matcher(s)
    val r1 =
      if (!m.find()) s
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var last = 0
        do {
          nEmails += 1
          sb.append(s, last, m.start()).append(EmailTag)
          last = m.end()
        } while (m.find())
        sb.append(s, last, s.length).toString
      }
    val nPhones = countPhonesChars(s)
    val clean = replacePhonesChars(r1)
    new GenericInternalRow(Array[Any](nEmails, nPhones,
      if (clean eq s) text else UTF8String.fromString(clean)))
  }

  private def phoneAtChars(s: String, i: Int): Boolean = {
    var j = 0
    while (j < 12) {
      val c = s.charAt(i + j)
      val ok =
        if (j == 3 || j == 7) c == '-'
        else c >= '0' && c <= '9'
      if (!ok) return false
      j += 1
    }
    true
  }

  private def countPhonesChars(s: String): Long = {
    var n = 0L
    var i = 0
    while (i + 12 <= s.length) {
      if (phoneAtChars(s, i)) { n += 1; i += 12 } else i += 1
    }
    n
  }

  private def replacePhonesChars(s: String): String = {
    var i = 0
    var first = -1
    while (first < 0 && i + 12 <= s.length) {
      if (phoneAtChars(s, i)) first = i else i += 1
    }
    if (first < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, first)
    i = first
    while (i < s.length) {
      if (i + 12 <= s.length && phoneAtChars(s, i)) {
        sb.append("<PHONE>"); i += 12
      } else {
        sb.append(s.charAt(i)); i += 1
      }
    }
    sb.toString
  }
}
