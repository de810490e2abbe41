package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Expression, LessThan, LessThanOrEqual, Literal, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number() OVER (...) <= k` filter
  * pattern into the custom [[TopKPerKey]] operator, so EXISTING queries
  * written with the standard window idiom get the bounded-heap physical
  * plan (no per-key sort) without being rewritten by hand. This is the
  * `Rule[LogicalPlan]` tier of the extension story (SURVEY.md §7.3);
  * [[graft.GraftExtensions]] injects it together with [[TopKStrategy]].
  *
  * Fires only on the exact safe shape: a Filter directly over a Window
  * whose single expression is `row_number()`, with a `rank <= k` /
  * `rank < k` conjunct. Spark's own inferred `WindowGroupLimit` below the
  * window is subsumed (TopKPerKey re-derives the limit from the raw
  * child). Other conjuncts stay in a Filter above the rewrite.
  *
  * `spark.graft.topkRewrite.maxK` (default 1000) bounds the rewrite: the
  * heap plan's memory is O(distinct keys × k) per partition and does not
  * spill, so very large k keeps the sort-based window plan, which does.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The rank attribute, possibly behind the widening cast type coercion
    * inserts when the literal side was a LONG (`rank <= 3L` analyzes to
    * `cast(rank as bigint) <= 3L`). ONLY the lossless int→long widening
    * matches: a narrowing cast (e.g. `rank.cast("byte") <= 3`) changes
    * values, so treating it as a plain rank bound would drop rows.
    */
  private object RankRef {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, org.apache.spark.sql.types.LongType, _, _) => Some(a)
      case _ => None
    }
  }

  /** An integer-valued literal bound of any integral width. A long bound
    * past Int.MaxValue doesn't match — such a k would never pass the maxK
    * guard anyway, so the window plan (which spills) keeps it.
    */
  private object IntBound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) if v <= Int.MaxValue && v >= Int.MinValue => Some(v.toInt)
      case Literal(v: Short, _) => Some(v.toInt)
      case Literal(v: Byte, _) => Some(v.toInt)
      case _ => None
    }
  }

  /** (k, leftover conjuncts) when cond contains a usable rank bound. */
  private def rankLimit(cond: Expression, rank: Attribute): Option[(Int, Seq[Expression])] = {
    val cs = conjuncts(cond)
    val ks = cs.collect {
      case LessThanOrEqual(RankRef(a), IntBound(v)) if a.semanticEquals(rank) => v
      case LessThan(RankRef(a), IntBound(v)) if a.semanticEquals(rank) => v - 1
    }
    if (ks.isEmpty) None
    else {
      val rest = cs.filterNot {
        case LessThanOrEqual(RankRef(a), IntBound(_)) => a.semanticEquals(rank)
        case LessThan(RankRef(a), IntBound(_)) => a.semanticEquals(rank)
        case _ => false
      }
      Some((ks.min, rest))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // partitionSpec must be non-empty: TopKPerKeyExec declares
    // ClusteredDistribution(keys), which rejects an empty clustering —
    // a global (un-partitioned) top-k keeps the window plan
    case f @ Filter(cond, w: Window) if w.partitionSpec.nonEmpty =>
      val maxK = conf.getConfString("spark.graft.topkRewrite.maxK", "1000").toInt
      w.windowExpressions match {
        case Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)) =>
          val rank = al.toAttribute
          rankLimit(cond, rank) match {
            case Some((k, rest)) if k > 0 && k <= maxK =>
              val inner = w.child match {
                case wgl: WindowGroupLimit => wgl.child
                case c => c
              }
              val topk = TopKPerKey(k, w.partitionSpec, w.orderSpec,
                rank.asInstanceOf[AttributeReference], inner)
              if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            case _ => f
          }
        case _ => f
      }
  }
}
