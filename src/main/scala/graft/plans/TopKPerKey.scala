package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Bounded top-k per key as a first-class operator.
  *
  * The DataFrame idiom — `row_number() OVER (PARTITION BY k ORDER BY o)
  * <= K` — plans as WindowExec: shuffle by key, then FULL SORT of every
  * partition, then rank + filter. Spark 3.5+ softens this with
  * InferWindowGroupLimit (per-group limits before/after the shuffle),
  * but both sides of that plan still SORT their partitions. This
  * operator keeps an O(K) binary heap per key instead — memory bounded
  * by K × distinct-keys-per-partition, no sort at all, same rows out.
  * [[TopKRewriteRule]] applies it automatically to the window idiom
  * when the rank column is dropped.
  *
  * Pieces (the full custom-operator stack, SURVEY §3(c)):
  *  - [[TopKPerKey]]: logical node (keys, order, k)
  *  - [[TopKPerKeyStrategy]]: planner strategy → [[TopKPerKeyExec]]
  *  - [[TopKPerKeyExec]]: physical heap-based exec; declares
  *    `ClusteredDistribution(keys)` so the planner inserts the shuffle
  *  - `GraftExtensions` injects the strategy; `graft.operators.TopK`
  *    is the user API.
  *
  * Determinism contract: ties beyond `order` are broken by whichever
  * rows the heap retains — callers wanting byte-stable output include a
  * unique column last in `order` (same requirement row_number has).
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Key-clustered input: the planner adds the Exchange. Rows for one
    * key meet in one partition; the heap state is per-key O(k). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rank order a<b ⇒ a outranks b; heap head = currently-worst kept
      val rankOrd = GenerateOrdering.generate(
        sortOrder.map(BindReferences.bindReference(_, childOutput)))
      val heapOrd = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rankOrd.compare(b, a)
      }
      val heaps = new java.util.HashMap[InternalRow, JPriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[InternalRow](limit, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rankOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      val hIt = heaps.values().iterator()
      while (hIt.hasNext) {
        val rows = hIt.next().toArray(Array.empty[InternalRow])
        java.util.Arrays.sort(rows, rankOrd)
        out ++= rows
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
