package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused quality-scoring kernel (SURVEY.md §2 #28): one byte pass per
  * document computing every ingredient of the quality columns —
  * `struct(n_chars, n_tok, n_punct, n_stop)`.
  *
  * The composed form tokenized the text twice (`size(split(...))` +
  * `size(filter(split(...), isInCollection))`) and ran a
  * `regexp_replace` for the punctuation count; the array-filter
  * higher-order function is CodegenFallback (interpreted per row,
  * re-evaluating its captured split — the HOF recompute trap). This
  * kernel is one codegen'd static call.
  *
  * Semantics are byte-for-byte those of the SQL twin
  * (`string_split_regex(lower(trim(text)), '\s+')` in the oracle):
  *  - `n_chars`: code-point count of the raw text (= Spark/DuckDB
  *    `length`);
  *  - `n_tok`: segment count of the SPACE-trimmed text split on
  *    `\s+` runs INCLUDING boundary empties (split keeps a leading/
  *    trailing empty segment when the trimmed text starts/ends with
  *    non-space whitespace; a blank text has exactly one empty
  *    segment) — the `len(toks)` the ratios divide by, verified
  *    against the built-in form in QualitySpec;
  *  - `n_punct`: occurrences of `[.,!?;:]` over the raw text;
  *  - `n_stop`: tokens equal to an EN/ES stopword after ASCII case
  *    folding. Folding parity with full-Unicode `lower()` holds for
  *    ANY input on this stopword list: the only Unicode mappings
  *    into ASCII (e.g. KELVIN SIGN → k) cannot produce these words,
  *    and a token containing any non-ASCII byte can never equal one.
  */
case class QualityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QualityStats.Schema
  override def nullSafeEval(v: Any): Any =
    QualityStats.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.QualityStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** EN + ES stopwords — keep in sync with TextFunctions.EnStop/EsStop
    * and the quality_score oracle SQL. */
  private val Stopwords: Array[Array[Byte]] =
    Array("the", "a", "and", "of", "to", "in", "is",
      "el", "la", "los", "de", "que", "y", "en")
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':'

  /** ASCII-folded equality of bytes[from, until) against a stopword. */
  private def eqStop(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    val n = until - from
    var k = 0
    while (k < Stopwords.length) {
      val w = Stopwords(k)
      if (w.length == n) {
        var i = 0
        var ok = true
        while (ok && i < n) {
          var c = bytes(from + i)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          if (c != w(i)) ok = false
          i += 1
        }
        if (ok) return true
      }
      k += 1
    }
    false
  }

  def compute(text: UTF8String): InternalRow = {
    val nChars = text.numChars().toLong
    val bytes = text.getBytes
    // punctuation over the RAW text (ASCII bytes only appear as
    // themselves in UTF-8, so a byte scan is exact)
    var nPunct = 0
    var i = 0
    while (i < bytes.length) {
      if (isPunct(bytes(i))) nPunct += 1
      i += 1
    }
    // space-only trim (Spark/DuckDB trim), then \s+ segment walk:
    // n_tok = (number of whitespace runs strictly inside) + 1, which
    // reproduces split-keeping-boundary-empties exactly
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var nTok = 1
    var nStop = 0
    var segStart = lo
    i = lo
    while (i <= hi) {
      if (i == hi || isWs(bytes(i))) {
        if (i > segStart && eqStop(bytes, segStart, i)) nStop += 1
        if (i < hi) {
          nTok += 1
          i += 1
          while (i < hi && isWs(bytes(i))) i += 1
          segStart = i
        } else i += 1
      } else i += 1
    }
    new GenericInternalRow(Array[Any](nChars, nTok, nPunct, nStop))
  }
}
