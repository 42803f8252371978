package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator (SURVEY §4.2's
  * "pre-aggregated top-k strategy" candidate — the word-cloud /
  * trending read path's core shape, W1).
  *
  * The stock formulation — row_number() over (PARTITION BY g ORDER BY
  * v DESC) ≤ k — SORTS every group (O(n log n) per partition and a
  * full-width sort buffer). This operator keeps a k-bounded heap per
  * group instead: O(n log k) with memory k·groups, the same
  * asymptotics TakeOrderedAndProject gets for the global case.
  *
  * The heap orders by a native SEQUENCE of Catalyst [[SortOrder]] keys
  * (compared via the codegen'd [[RowOrdering]], any orderable type, no
  * numeric cast) — so composite orderings like (sim DESC, vec_id ASC)
  * are expressed directly. Earlier revisions exposed one numeric key
  * and callers packed (primary, id) into a single long, which bounded
  * ids to 2³³ and the packed key to 2⁵³ (the Double-cast exactness
  * ceiling); native multi-key ordering removes both contracts — ids are
  * full 64-bit.
  *
  * Pieces: logical node → planner strategy → physical exec that
  * declares ClusteredDistribution(group) so the planner inserts the
  * one required hash exchange. Registered via GraftExtensions or
  * per-session through experimental.extraStrategies (GraftOps does
  * this automatically).
  */
case class TopKPerGroupPlan(group: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) AllTuples :: Nil else ClusteredDistribution(group) :: Nil

  // MEMORY BOUND: each task holds one k-row heap per DISTINCT group in
  // its partition (≈ groups/partition × k × row bytes), with no spill.
  // The input is hash-clustered on the group keys, so that is the
  // global group cardinality divided by shuffle partitions — at the
  // target scale size shuffle partitions so groups/partition × k rows
  // fit comfortably in a task (e.g. 1e6 groups × k=3 × 100 B ≈ 300 MB
  // per partition is the ceiling to stay under). For group
  // cardinalities beyond that, prefer the row_number() formulation,
  // which sorts and therefore spills (GraftOps.topKPerGroup documents
  // the same trade-off at the API level).
  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val orderExprs = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      // RowOrdering binds the SortOrder refs to the child layout and
      // codegens a comparator (interpreted fallback); created per
      // partition because the generated class is not serializable.
      val cmp = RowOrdering.create(orderExprs, childOutput)
      // max-heap by the sort order: head = the row that sorts LAST
      // among the kept k → cheapest eviction candidate. compare(a,b)<0
      // means a sorts before b (a outranks b).
      implicit val byOrder: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => cmp.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow])
        val u = row.asInstanceOf[UnsafeRow]
        if (heap.size < limit) {
          heap.enqueue(u.copy())
        } else if (cmp.compare(u, heap.head) < 0) {
          // strict: ties at the boundary keep the incumbent (stable
          // w.r.t. arrival, matching the single-key revision)
          heap.dequeue()
          heap.enqueue(u.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll pops the max (sorts-last) first → reverse for
        // rank-1-first output order
        val drained: Seq[UnsafeRow] = heap.dequeueAll
        drained.reverseIterator.map(e => e: InternalRow)
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GraftOps {
  /** Top `k` rows per group by `orderCol` descending (any orderable
    * column). Output keeps the child's schema, rows descending within
    * each group. Shorthand for [[topKPerGroupOrdered]] with one
    * descending key. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int): DataFrame =
    topKPerGroupOrdered(df, groupCols, Seq(orderCol -> false), k)

  /** Top `k` rows per group under a composite ordering. `order` is
    * (columnName, ascending) pairs, most-significant first; each
    * group emits its first `k` rows in that order (rank 1 first).
    * Null ordering follows Spark's defaults (ASC → nulls first,
    * DESC → nulls last).
    *
    * Memory trade-off: the heap operator holds groups-per-partition ×
    * k rows in task memory with no spill (see TopKPerGroupExec). Use it
    * when group cardinality ÷ shuffle partitions is modest; for
    * extreme group cardinality prefer a row_number() window, which
    * sorts (and spills) instead. */
  def topKPerGroupOrdered(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(order.nonEmpty, "topKPerGroupOrdered needs at least one order key")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), sortOrders, k, analyzed))
  }
}
