package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §4 tier (c)): exact top-k rows
  * per key as a first-class plan node.
  *
  * The DataFrame idiom — window row_number + filter — shuffles EVERY
  * scored row to its key's partition before ranking (WindowGroupLimit
  * trims within partitions but the exchange still moves the trimmed
  * per-partition sets). This operator keeps a bounded heap per key
  * inside each input partition (partial), moves only
  * ≤ partitions·keys·k candidate rows, and re-heaps once (final) —
  * the 100 TB shape for "top-k neighbors per probe" where the scored
  * set is |corpus|·|probes| but the answer is |probes|·k.
  *
  * Wiring: logical `TopKPerKey` node → `TopKPerKeyStrategy` (injected
  * via SparkSessionExtensions.injectPlannerStrategy, or implicitly by
  * the `TopKPerKeyOps.topK` helper) → partial+final exec pair;
  * EnsureRequirements inserts the tiny all-tuples exchange between
  * them.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKHeap {
  /** Partition kernel: bounded heap per key, head = worst of the
    * current top-k. Pure function of serializable expressions — the
    * generated ordering/projection are (re)compiled per partition on
    * the executor.
    */
  def heapPartition(
      keys: Seq[Expression],
      boundOrder: Seq[SortOrder],
      k: Int,
      output: Seq[Attribute])(it: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val ordering = GenerateOrdering.generate(boundOrder)
    val rev = ordering.reversed()
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    it.foreach { row =>
      val key = keyProj(row).copy()
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, rev)
        heaps.put(key, heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ordering.compare(row, heap.peek()) < 0) { // ranks better
        heap.poll(); heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
  }
}

private[plans] abstract class TopKHeapExec extends UnaryExecNode {
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // bind on the driver; capture ONLY serializable expressions
    val boundOrder = order.map(BindReferences.bindReference(_, child.output))
    val localKeys = keys
    val localK = k
    val localOutput = output
    child.execute().mapPartitions(
      TopKHeap.heapPartition(localKeys, boundOrder, localK, localOutput))
  }
}

final case class TopKPerKeyPartialExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKHeapExec {
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

final case class TopKPerKeyFinalExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKHeapExec {
  // the partial output is ≤ partitions·keys·k CANDIDATE rows; the
  // final merge only needs same-key co-location, so it clusters by
  // key — at billions of distinct keys the merge stays as parallel as
  // the shuffle, never a single-node fan-in. (Keyless = global top-k
  // degenerates to the one-partition merge.)
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) AllTuples else ClusteredDistribution(keys)) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyOps {

  private def ensureStrategy(spark: org.apache.spark.sql.classic.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }

  /** Register the RankFilterToTopK optimizer rule (plus the strategy
    * that plans its output) on an already-built session — the
    * imperative analog of the GraftExtensions injection. Idempotent.
    */
  def enableRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ensureStrategy(cs)
    if (!cs.experimental.extraOptimizations.contains(RankFilterToTopK)) {
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ RankFilterToTopK
    }
  }

  /** Exact top-k rows per key. `order` are ranking columns (e.g.
    * `col("cos").desc, col("neighbor").asc`) — ties must be broken to
    * a total order for determinism.
    */
  def topK(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ensureStrategy(spark)
    // resolve the sort columns through an analyzed Sort node — this
    // yields catalyst SortOrders bound to df's attributes
    val analyzedSort = df.orderBy(order: _*).queryExecution.analyzed.asInstanceOf[Sort]
    val keyExprs = keyCols.map(c => GraftSqlBridge.expr(df(c)))
    GraftSqlBridge.ofRows(spark,
      TopKPerKey(keyExprs, analyzedSort.order, k, analyzedSort.child))
  }
}
