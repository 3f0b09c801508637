package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-counting kernel (SURVEY.md §2 #29):
  * `struct(ws, bpe)` in one pass per document.
  *
  *  - `ws`: `size(split(lower(trim(text)), '\s+'))` — the
  *    boundary-empties-kept convention, identical to QualityStats'
  *    n_tok walk (case mapping never creates or removes whitespace,
  *    so the count is taken on the raw bytes);
  *  - `bpe`: `regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')`
  *    — maximal ASCII letter runs + maximal digit runs + one per
  *    remaining non-whitespace CODEPOINT. The walk runs over
  *    `UTF8String.toLowerCase` bytes (the same call Spark's `lower()`
  *    makes, so locale-sensitive expansions like U+0130 → i +
  *    combining dot count identically), counting a multi-byte
  *    codepoint once by skipping its continuation bytes.
  *
  * Replaces a per-document `java.util.regex` scan (the single
  * hottest cost of token_count) plus a split-array materialization.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenCounts.Schema
  override def nullSafeEval(v: Any): Any =
    TokenCounts.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TokenCounts.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  val Schema: StructType = StructType(Seq(
    StructField("ws", IntegerType, nullable = false),
    StructField("bpe", IntegerType, nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String): InternalRow = {
    // ws: space-only trim, then (whitespace runs strictly inside) + 1
    // — split keeping boundary empties, as in QualityStats
    val raw = text.getBytes
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == ' ') lo += 1
    while (hi > lo && raw(hi - 1) == ' ') hi -= 1
    var ws = 1
    var i = lo
    while (i < hi) {
      if (isWs(raw(i))) {
        ws += 1
        while (i < hi && isWs(raw(i))) i += 1
      } else i += 1
    }

    // bpe: over the lowercased bytes
    val b = text.toLowerCase.getBytes
    val n = b.length
    var bpe = 0
    i = 0
    while (i < n) {
      val c = b(i)
      if (isWs(c)) i += 1
      else if (c >= 'a' && c <= 'z') {
        bpe += 1
        while (i < n && b(i) >= 'a' && b(i) <= 'z') i += 1
      } else if (c >= '0' && c <= '9') {
        bpe += 1
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      } else {
        bpe += 1
        i += 1
        if ((c & 0x80) != 0) // multi-byte lead: skip continuations
          while (i < n && (b(i) & 0xC0) == 0x80) i += 1
      }
    }
    new GenericInternalRow(Array[Any](ws, bpe))
  }
}
