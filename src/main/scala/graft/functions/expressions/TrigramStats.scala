package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused trigram-duplication kernel behind repetition_score and
  * corpus_stats (SURVEY.md §2 #70/#74):
  * `struct(n_tok, n_tg, n_dup)` in one pass per document, where
  * `n_tok` = count of the repo-wide tokens
  * (`list_filter(string_split_regex(lower(trim(text)),'\s+'),
  * x -> x <> '')` in the oracles), `n_tg` = max(n_tok-2, 0) adjacent
  * token trigrams, and `n_dup` = n_tg − count of DISTINCT trigrams.
  *
  * The composed form it replaces materialized every trigram string
  * (`transform(sequence(...))` + `concat_ws` — an interpreted
  * CodegenFallback HOF re-evaluating its captured `split` per
  * element) and then `array_distinct` over those strings. This
  * kernel never builds a trigram: tokens are byte-ranges of the
  * full-Unicode-lowercased text, each trigram is an FNV-1a hash of
  * `tok·' '·tok·' '·tok` bytes, and distinctness is an
  * open-addressed long set.
  *
  * Parity with the string-comparing oracle:
  *  - case folding is `UTF8String.toLowerCase` — the SAME call
  *    Spark's `lower()` makes, so full-Unicode parity with the
  *    previous composed form (unlike the ASCII-folding signature
  *    kernels, whose corpora-wide fold is a documented semantic);
  *  - `trim` strips spaces only and cannot change maximal
  *    non-whitespace runs, so it is skipped;
  *  - tokens are maximal runs of non-`\s` bytes (Java regex `\s` is
  *    ASCII-only; UTF-8 continuation bytes are ≥ 0x80 and never
  *    match, so a byte walk is exact);
  *  - two distinct trigram strings produce distinct hashed byte
  *    sequences (tokens cannot contain the 0x20 separator), so
  *    `n_dup` differs from the string form only on a 64-bit
  *    collision — ~C(n_tg,2)·2⁻⁶⁴ per doc, the same accepted bound
  *    as the contamination kernel (SignatureExpressions.scala).
  */
case class TrigramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TrigramStats.Schema
  override def nullSafeEval(v: Any): Any =
    TrigramStats.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TrigramStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_tg", IntegerType, nullable = false),
    StructField("n_dup", IntegerType, nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.toLowerCase.getBytes
    // token boundaries: starts(i)/ends(i) of maximal non-ws runs
    var nTok = 0
    var i = 0
    val n = bytes.length
    // first pass: count tokens (cheap; avoids growable arrays)
    while (i < n) {
      if (!isWs(bytes(i))) {
        nTok += 1
        while (i < n && !isWs(bytes(i))) i += 1
      } else i += 1
    }
    if (nTok < 3)
      return new GenericInternalRow(Array[Any](nTok, 0, 0))

    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        starts(t) = i
        while (i < n && !isWs(bytes(i))) i += 1
        ends(t) = i
        t += 1
      } else i += 1
    }

    // each trigram: FNV-1a over tok(i)·' '·tok(i+1)·' '·tok(i+2)
    // (each token's bytes hashed ≤3×; no trigram string ever built)
    val nTg = nTok - 2
    // capacity in Long: nTg*2-1 overflows Int past 2^30 tokens (a >1 GB
    // document); clamp to 1<<30 — the open-addressing probe still
    // terminates, it just runs denser than 50% past that point
    val cap = math.min(1L << 30,
      java.lang.Long.highestOneBit(math.max(4L, nTg.toLong * 2 - 1)) << 1).toInt
    val table = new Array[Long](cap)
    val mask = cap - 1
    var distinct = 0
    var g = 0
    while (g < nTg) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var w = g
      while (w < g + 3) {
        var j = starts(w)
        while (j < ends(w)) {
          h = (h ^ (bytes(j) & 0xffL)) * 0x100000001b3L
          j += 1
        }
        if (w < g + 2) h = (h ^ 0x20L) * 0x100000001b3L
        w += 1
      }
      if (h == 0L) h = 1L // 0 is the empty-slot sentinel
      var slot = (h.toInt ^ (h >>> 32).toInt) & mask
      var seenIt = false
      // distinct < cap keeps the probe terminating even at the clamped
      // capacity (a saturated table counts further new trigrams as dups
      // — only reachable past 2^29 tokens in one document)
      while (!seenIt && table(slot) != 0L && distinct < cap) {
        if (table(slot) == h) seenIt = true
        else slot = (slot + 1) & mask
      }
      if (!seenIt && table(slot) == 0L) { table(slot) = h; distinct += 1 }
      g += 1
    }
    new GenericInternalRow(Array[Any](nTok, nTg, nTg - distinct))
  }
}
