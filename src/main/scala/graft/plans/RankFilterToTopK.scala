package graft.plans

import graft.GraftConf
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4 tier (c), §9 item): rewrites the
  * ubiquitous rank-filter idiom
  *
  *   df.withColumn("rk", row_number().over(Window.partitionBy(K).orderBy(O)))
  *     .filter($"rk" <= k)
  *
  * to run over the `TopKPerKey` bounded-heap node:
  *
  *   Filter(rk <= k, Window([rk], K, O, TopKPerKey(K, O, k, child)))
  *
  * TopKPerKey trims each input partition to its per-key top-k with
  * O(n log k) heaps and moves ONLY ≤ partitions·keys·k candidate rows
  * (clustered by key — parallel at any key cardinality); the original
  * Window then recomputes the rank over that trimmed set, so the
  * schema and every surviving row/value are identical to the
  * un-rewritten plan. Versus Spark's own InferWindowGroupLimit (which
  * this subsumes and strips), the heap pass replaces the full
  * partition SORT the window otherwise needs — the win on a 100 TB
  * scored set is sorting keys·k candidate rows instead of n.
  *
  * Only `row_number` qualifies: `rank`/`dense_rank` keep >k rows on
  * ties, which a k-bounded heap cannot reproduce. Ties in O beyond the
  * total order are nondeterministic in BOTH forms.
  *
  * Kill-switch: spark.graft.topk.rewrite=false; k capped by
  * spark.graft.topk.rewrite.maxK (default 1000) — a rank filter with a
  * huge k is a different workload (bulk trim, not top-k) and the
  * window sort is fine there.
  */
object RankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def limitOf(e: Expression, rank: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(GraftConf.TopKRewrite.key,
      GraftConf.TopKRewrite.default).toBoolean) return plan
    val maxK = conf.getConfString(GraftConf.TopKRewriteMaxK.key,
      GraftConf.TopKRewriteMaxK.default).toInt
    plan.transformUp {
      case f @ Filter(cond,
            w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(ps, os,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
              _, _, child, _))
          if os.nonEmpty && (ps ++ os).forall(_.deterministic) &&
            !child.isInstanceOf[TopKPerKey] =>
        val rank = alias.toAttribute
        val ks = splitConjunctivePredicates(cond).flatMap(limitOf(_, rank))
        if (ks.isEmpty || ks.min <= 0 || ks.min > maxK) f
        else {
          // Spark's InferWindowGroupLimit may already have inserted its
          // partial-trim node below the window; the heap subsumes it.
          val inner = child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          Filter(cond, w.withNewChildren(Seq(TopKPerKey(ps, os, ks.min, inner))))
        }
    }
  }
}
