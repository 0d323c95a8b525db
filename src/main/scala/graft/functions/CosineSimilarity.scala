package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * array<double> vectors, with whole-stage codegen (`doGenCode` emits
  * a primitive fused dot/norm loop — no boxing, no lambda dispatch).
  *
  * This is the (b)-tier extension point from SURVEY.md §4: a scalar
  * kernel Spark lacks, expressed as an Expression so it composes with
  * any join/filter/window and stays inside WholeStageCodegen — unlike
  * a Scala UDF (serialization boundary) or nested higher-order
  * functions (interpreted).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val cosineSimBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects 2 arguments, got ${other.size}")
  }

  val jaccardSortedBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => JaccardSorted(a, b)
    case other => throw new IllegalArgumentException(
      s"jaccard_sorted expects 2 arguments, got ${other.size}")
  }

  /** Column-level entry for Md5PrefixLong — built directly from the
    * expression (no registry lookup), so call sites need no session
    * registration. Bit-identical to
    * `conv(substring(md5(c), 1, n), 16, 10).cast("long")`.
    */
  def md5PrefixLong(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(Md5PrefixLong(
      org.apache.spark.sql.GraftSqlBridge.expr(c),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Spark's native runtime-filter Bloom expressions, surfaced as SQL
    * functions (they ship in catalyst for join runtime filters but are
    * not in the public registry): `bloom_filter_agg(longCol[, nItems
    * [, nBits]])` builds a Bloom filter binary, `might_contain(bloom,
    * longCol)` probes it. The bloom argument must be a constant or a
    * scalar subquery (the expression's own contract) — exactly the
    * broadcast-scalar shape the C58 decontamination pipeline uses.
    */
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(c) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
    case Seq(c, n) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
    case Seq(c, n, m) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, m)
    case other => throw new IllegalArgumentException(
      s"bloom_filter_agg expects 1-3 arguments, got ${other.size}")
  }

  val mightContainBuilder: Seq[Expression] => Expression = {
    case Seq(b, v) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(b, v)
    case other => throw new IllegalArgumentException(
      s"might_contain expects 2 arguments, got ${other.size}")
  }

  /** Imperative registration for sessions not built with the
    * extensions config.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineSimBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", jaccardSortedBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch", FreqSketch.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch_w", FreqSketch.weightedBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_assign", PqAssign.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collect_capped", CollectLongCapped.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collect_capped2", CollectLongPairCapped.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "intersect_sorted_count", IntersectSortedCount.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles", KllQuantiles.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", bloomAggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", mightContainBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix_long", Md5PrefixLong.builder, "built-in")
  }
}

/** SparkSessionExtensions injector — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      GraftFunctions.cosineSimBuilder))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      GraftFunctions.jaccardSortedBuilder))
    ext.injectFunction((
      FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      FreqSketch.builder))
    ext.injectFunction((
      FunctionIdentifier("pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "pq_assign"),
      PqAssign.builder))
    ext.injectFunction((
      FunctionIdentifier("collect_capped"),
      new ExpressionInfo(classOf[CollectLongCapped].getName, "collect_capped"),
      CollectLongCapped.builder))
    ext.injectFunction((
      FunctionIdentifier("intersect_sorted_count"),
      new ExpressionInfo(classOf[IntersectSortedCount].getName, "intersect_sorted_count"),
      IntersectSortedCount.builder))
    ext.injectFunction((
      FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "kll_quantiles"),
      KllQuantiles.builder))
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      GraftFunctions.bloomAggBuilder))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      GraftFunctions.mightContainBuilder))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankFilterToTopK)
  }
}
