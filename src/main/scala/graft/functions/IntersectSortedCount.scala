package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |a ∩ b| of two SORTED distinct
  * array<bigint> sets via a linear merge — the integer-count sibling
  * of [[JaccardSorted]]. Containment C(A,B) = |A∩B|/|A| (Broder'97)
  * needs the raw intersection COUNT so the ratio can be taken in
  * exact int64 downstream; deriving it from the double Jaccard would
  * put an IEEE division on an exactness boundary. O(|a|+|b|), no
  * per-row allocation, whole-stage codegen.
  *
  * CONTRACT (shared with jaccard_sorted, not enforced in the hot
  * loop): inputs must be null-free, duplicate-free and ascending —
  * the merge undercounts or overcounts otherwise, and a null slot
  * reads as 0 through ArrayData. Every in-repo producer satisfies
  * this by construction (`array_sort(collect_list(...))` over
  * distinct hashes); ad-hoc SQL callers must `array_sort` + distinct
  * their inputs themselves.
  */
case class IntersectSortedCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_sorted_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_sorted_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
        int $nx = $a.numElements(); int $ny = $b.numElements();
        int $i = 0; int $j = 0; long $inter = 0L;
        while ($i < $nx && $j < $ny) {
          long $xi = $a.getLong($i); long $yj = $b.getLong($j);
          if ($xi == $yj) { $inter++; $i++; $j++; }
          else if ($xi < $yj) { $i++; } else { $j++; }
        }
        ${ev.value} = $inter;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSortedCount {
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => IntersectSortedCount(a, b)
    case other => throw new IllegalArgumentException(
      s"intersect_sorted_count expects 2 arguments, got ${other.size}")
  }
}
