package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{TopKPerKey => LogicalTopK}

/** Custom whole-operator tier (SURVEY.md §7.3 row "Rule/SparkStrategy"):
  * top-k rows per key, with rank — the `row_number() OVER (PARTITION BY k
  * ORDER BY o) <= n` pattern, executed with bounded per-key heaps instead
  * of a full per-key sort.
  *
  * Why a custom operator: Spark's window physical plan sorts every key
  * partition completely (O(n log n) per key, sort-spill for large keys)
  * to produce row numbers it then throws away past k. The heap keeps at
  * most k rows per key (O(n log k), no sort, no spill proportional to
  * input), which is the shape that survives a 100×-skewed key at 100 TB.
  *
  * MEMORY BOUND (the operator's one sizing rule): the per-partition heap
  * map is O(distinct keys in the partition × k) rows and does NOT spill.
  * That is exactly the regime the operator targets — low/medium key
  * cardinality with arbitrarily many rows per key (segments, tenants,
  * categories), where the window plan wastes a full sort. With D distinct
  * keys per partition the resident set is ~D × k × rowSize; at k=3 and
  * 1 KiB rows, 1M keys/partition ≈ 3 GiB — size executors accordingly, or
  * use the `row_number().over(window)` formulation instead when keys are
  * high-cardinality (it sort-spills gracefully). The output side streams
  * (no buffering beyond one key's k rows).
  *
  * Pieces: logical node ([[TopKPerKey]]) → strategy ([[TopKStrategy]],
  * injectable via `spark.experimental.extraStrategies` at runtime or
  * `SparkSessionExtensions.injectPlannerStrategy` at session build) →
  * physical node ([[TopKPerKeyExec]]) that declares
  * `ClusteredDistribution(keys)` so Catalyst plans the single hash
  * exchange. API: [[TopKPerKey.topKPerKey]].
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: AttributeReference, // constructor param: copy() during
    child: LogicalPlan)           // analysis must NOT mint a new exprId
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is generated here, not consumed from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: LogicalTopK =>
      TopKPerKeyExec(t.k, t.keys, t.order, t.rankAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** One hash exchange on the keys; no sort requirement — the heap does
    * the (bounded) ordering work.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val outAttrs = output        // local copies: the closure must not
    val rankAttrLocal = rankAttr // capture `this` (child plan isn't serializable)
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      // per-key bounded heap: worst row (per sort order) at the head so
      // it can be evicted in O(log k)
      val heapOrd = rowOrdering.reverse
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, heapOrd)
          heaps.put(key, heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      // stream the output: sort one key's ≤k rows at a time instead of
      // materializing every partition result in an ArrayBuffer (that
      // buffer doubled the resident set and is pure waste — downstream
      // operators copy if they buffer, same contract as ProjectExec)
      val joiner = UnsafeProjection.create(outAttrs, childOutput :+ rankAttrLocal)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val heapIt = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: java.util.ArrayList[InternalRow] = _
        private var i = 0
        private def advance(): Unit =
          while ((cur == null || i >= cur.size()) && heapIt.hasNext) {
            cur = new java.util.ArrayList[InternalRow](heapIt.next())
            cur.sort(rowOrdering)
            i = 0
          }
        override def hasNext: Boolean = { advance(); cur != null && i < cur.size() }
        override def next(): InternalRow = {
          advance()
          rankRow.update(0, i + 1)
          val r = joiner(joined(cur.get(i), rankRow))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** `topKPerKey(df, Seq("seg"), Seq("score" -> false, "id" -> true), 3)`
    * — child rows plus a 1-based `rank` column, top-k per key. Order cols
    * are (name, ascending) pairs (catalyst SortOrder is built directly —
    * Column `.desc` nodes are a different, non-catalyst SortOrder class).
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)],
                 k: Int, rankName: String = "rank"): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = Bridge.logicalPlan(df)
    val resolver = child.output.map(a => a.name -> a).toMap
    def ref(n: String): Expression = resolver.getOrElse(n, UnresolvedAttribute(n))
    val keyExprs = keyCols.map(ref)
    val order = orderCols.map { case (n, asc) =>
      SortOrder(ref(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    Bridge.ofRows(spark, TopKPerKey(k, keyExprs, order, rankAttr, child))
  }
}
