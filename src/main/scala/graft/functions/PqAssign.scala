package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native PQ assignment kernel: given a 64-dim vector and a FLAT
  * p-major codebook (`cb[(p*16 + j)*8 + i]`, 8 subspaces × 16 codes ×
  * 8 dims), return the interleaved per-subspace argmin as
  * `[d0, j0, d1, j1, …]` (16 doubles).
  *
  * Same contract as the declarative HOF pipeline in ann_pq: candidate
  * distances are HALF_UP-rounded to 4dp BEFORE comparison, and a
  * strict `<` keeps the lowest code id on ties — so the native and
  * interpreted paths are bit-identical, and both match the DuckDB
  * oracle. The (b)-tier extension point (SURVEY §4): the 128-candidate
  * loop runs as one fused primitive kernel inside WholeStageCodegen
  * instead of ~128 interpreted lambda dispatches per row.
  */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_assign expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "pq_assign"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    new GenericArrayData(PqAssign.assign(v, cb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out")
      s"""
        double[] $out = graft.functions.PqAssign.assign($a, $b);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  val M = 8 // subspaces
  val K = 16 // codes per subspace
  val D = 8 // dims per subspace

  /** Shared by eval and codegen — one definition of the kernel. */
  def assign(v: ArrayData, cb: ArrayData): Array[Double] = {
    val out = new Array[Double](2 * M)
    var p = 0
    while (p < M) {
      var bestD = java.lang.Double.MAX_VALUE
      var bestJ = -1
      var j = 0
      while (j < K) {
        var s = 0.0
        var i = 0
        val vOff = p * D
        val cOff = (p * K + j) * D
        while (i < D) {
          val diff = v.getDouble(vOff + i) - cb.getDouble(cOff + i)
          s += diff * diff
          i += 1
        }
        // Spark round() semantics: BigDecimal HALF_UP at scale 4
        val r = java.math.BigDecimal.valueOf(s)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (r < bestD) { bestD = r; bestJ = j }
        j += 1
      }
      out(2 * p) = bestD
      out(2 * p + 1) = bestJ.toDouble
      p += 1
    }
    out
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => PqAssign(a, b)
    case other => throw new IllegalArgumentException(
      s"pq_assign expects 2 arguments, got ${other.size}")
  }
}
