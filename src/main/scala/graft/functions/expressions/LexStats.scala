package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused lexical-diversity kernel (SURVEY.md §2 #181, round 17):
  * `struct(n_tok, n_types, hapax, tf2)` per document in one pass —
  * the term-frequency table of the doc's own tokens is built in a
  * per-row hash map, so the corpus-wide (doc, token) explode +
  * two-level aggregate (one shuffle of rows × tokens — the
  * explode-kernel band's cost) disappears entirely, and so does the
  * interpreted per-token struct allocation of the HOF-fold attempt
  * this replaced (8.6 s at ×200 vs the kernel's sub-second pass).
  *
  * Semantics are exactly those of
  * `explode(filter(split(lower(trim(text)), '\\s+'), t -> t != ''))`
  * grouped per (doc, token):
  *  - trim = ASCII-space trim (Spark `trim`);
  *  - lower = full-Unicode lowercase (Spark `lower` IS
  *    UTF8String.toLowerCase);
  *  - tokens = Java regex `\s+` split with limit -1 (Spark's
  *    StringSplit), empties dropped like the filter;
  *  - n_tok = token count (= Σtf), n_types = distinct tokens,
  *    hapax = tokens with tf 1, tf2 = Σtf² (long arithmetic —
  *    a tf can never overflow a long's square short of 3·10⁹
  *    occurrences of one token in one document).
  * Zero tokens → all-zero struct; the operator filters those rows
  * out, matching the explode form's absent-doc behavior. Verified
  * against a plain-Scala recompute in TextSeqStatsSpec and the
  * unchanged grouped-form DuckDB oracle.
  */
case class LexStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LexStats.Schema
  override def nullSafeEval(v: Any): Any =
    LexStats.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.LexStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LexStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("hapax", LongType, nullable = false),
    StructField("tf2", LongType, nullable = false)))

  /** Java regex `\s` without flags is exactly these six ASCII bytes
    * — and none of them can appear inside a UTF-8 multibyte
    * sequence, so tokenizing by byte scan is identical to the
    * Pattern split (proven vs the built-in form in TextSeqStatsSpec,
    * and the regex machinery + String[] it replaces was ~2× the
    * kernel's cost). */
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  def compute(text: UTF8String): GenericInternalRow = {
    val bytes = text.trim().toLowerCase.getBytes
    val n = bytes.length
    val tf = new java.util.HashMap[UTF8String, Long](64)
    var nTok = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        nTok += 1L
        tf.merge(UTF8String.fromBytes(bytes, start, i - start), 1L,
          (a, b) => a + b)
      }
    }
    var types = 0L
    var hapax = 0L
    var tf2 = 0L
    val it = tf.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      types += 1L
      if (c == 1L) hapax += 1L
      tf2 += c * c
    }
    new GenericInternalRow(Array[Any](nTok, types, hapax, tf2))
  }
}
