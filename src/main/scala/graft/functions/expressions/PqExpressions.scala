package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization ADC (asymmetric distance computation) kernel
  * (SURVEY.md §2 #92): given a candidate's M sub-codebook codes and a
  * query's precomputed lookup table (lut[m*K + c] = q_m · centroid_{m,c}),
  * the approximate inner product ⟨q, recon(v)⟩ is M table reads — the
  * FAISS-style scan that scores a candidate WITHOUT touching any
  * float vector. At 100 TB this is the point: the rank pass streams
  * M bytes per vector (here M ints) instead of the full embedding,
  * and the per-candidate cost is M adds.
  *
  * The LUT layout is flat row-major (m-major, code-minor), K codes
  * per sub-codebook. Out-of-range codes make the whole result null
  * (a malformed code must fail loudly at the scorer, not read a
  * neighboring sub-table). */
case class PqAdc(codes: Expression, lut: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, "codebook size must be positive")
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (codes.dataType, lut.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckSuccess
      case (c, l) => TypeCheckFailure(
        s"pq_adc requires (array<int>, array<double>), got " +
          s"(${c.simpleString}, ${l.simpleString})")
    }
  }

  override def nullSafeEval(c: Any, l: Any): Any = {
    val out = PqAdc.compute(c.asInstanceOf[ArrayData],
      l.asInstanceOf[ArrayData], k)
    if (out.isNaN) null else java.lang.Double.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val v = ctx.freshName("adc")
      s"""
         |double $v = graft.functions.expressions.PqAdc.compute($c, $l, $k);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)
}

object PqAdc {
  /** Σ_m lut[m*k + codes[m]]; NaN signals a malformed code. A null
    * element in either array is malformed too — ArrayData.getInt on a
    * null slot silently yields 0, which would score lut[m*k+0] instead
    * of failing loudly, so null slots are checked explicitly. */
  def compute(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    val n = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return Double.NaN
      val c = codes.getInt(i)
      val idx = i * k + c
      if (c < 0 || c >= k || idx >= n || lut.isNullAt(idx)) return Double.NaN
      s += lut.getDouble(idx)
      i += 1
    }
    s
  }
}
