package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 embedding-quantization kernels (SURVEY.md §2 #77).
  *
  * At 100 TB an embedding corpus is memory-bound: 64-dim float32 is
  * 256 B/vector, int8 is 64 B — a 4× cut in scan bytes, shuffle bytes
  * and cache footprint, which is why production ANN systems
  * (FAISS-style SQ8) quantize before indexing. Cosine over symmetric
  * per-vector scaling is scale-invariant — the two scale factors
  * cancel in dot/(|a||b|) — so quantized cosine needs only the int8
  * codes, never the scales, and the whole rank path runs on integer
  * arithmetic (exact, engine-portable: the DuckDB oracle reproduces
  * it bit for bit, unlike float accumulation).
  */

/** Symmetric int8 quantization of an array<double> vector:
  * scale s = max(|v_i|)/127, q_i = floor(v_i/s + 0.5). All-zero
  * vectors quantize to all-zero codes. Output range is [-127, 127]
  * by construction (|v_i|/s ≤ 127, so the rounded value cannot
  * exceed 127 in magnitude); elements are int for cheap exact
  * integer dot products downstream. Domain: finite values only —
  * a NaN element quantizes to 0 here (Java (int)NaN), while SQL
  * twins of this kernel error or null on floor(NaN), so NaN-bearing
  * embeddings must be filtered upstream (the loaders' schemas carry
  * no NaN source). */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    QuantizeI8.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.QuantizeI8.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI8 {
  def compute(vec: ArrayData): GenericArrayData = {
    val n = vec.numElements()
    val out = new Array[Int](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs > 0.0) {
      val s = maxAbs / 127.0
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getDouble(i) / s + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Cosine similarity of two int8-code vectors (array<int>): exact
  * 64-bit integer dot product and norms in one pass, one double
  * division at the end. Null when either norm is zero (mirrors
  * CosineSim). Integer accumulation makes the result independent of
  * summation order — bit-identical across engines and partitionings. */
case class IntCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val x = a.getInt(i).toLong; val y = b.getInt(i).toLong
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val den = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (den == 0.0) null else java.lang.Double.valueOf(dot.toDouble / den)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = (long) $a.getInt($i); long $y = (long) $b.getInt($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $den = java.lang.Math.sqrt((double) $na)
         |  * java.lang.Math.sqrt((double) $nb);
         |if ($den == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((double) $dot) / $den; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
