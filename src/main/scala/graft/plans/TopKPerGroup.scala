package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Grouped top-k as a first-class operator (SURVEY §4.2's
  * "pre-aggregated top-k strategy" candidate — the word-cloud /
  * trending read path's core shape, W1).
  *
  * The stock formulation — row_number() over (PARTITION BY g ORDER BY
  * v DESC) ≤ k — SORTS every group (O(n log n) per partition and a
  * full-width sort buffer). This operator keeps a k-bounded min-heap
  * per group instead: O(n log k) with memory k·groups, the same
  * asymptotics TakeOrderedAndProject gets for the global case.
  *
  * Pieces: logical node → planner strategy → physical exec that
  * declares ClusteredDistribution(group) so the planner inserts the
  * one required hash exchange. Registered via GraftExtensions or
  * per-session through experimental.extraStrategies (GraftOps does
  * this automatically).
  */
case class TopKPerGroupPlan(group: Seq[Expression], order: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(group: Seq[Expression], order: Expression, k: Int,
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
    val limit = k
    val childOutput = child.output
    // bind attribute references to ordinals of the child's row layout —
    // interpreted eval on raw AttributeReferences is illegal
    val boundOrder = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(Cast(order, DoubleType), childOutput)
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val orderExpr = boundOrder
      // min-heap at head → cheap eviction of the smallest of the top-k
      implicit val byScore: Ordering[(Double, UnsafeRow)] =
        Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, UnsafeRow)]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[(Double, UnsafeRow)])
        val v = orderExpr.eval(row) match {
          case null => Double.NegativeInfinity
          case d: Double => d
        }
        if (heap.size < limit) {
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        } else if (v > heap.head._1) {
          heap.dequeue()
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll pops ascending (min-heap) → reverse for descending
        val drained: Seq[(Double, UnsafeRow)] = heap.dequeueAll
        drained.reverseIterator.map(e => e._2: InternalRow)
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
  /** Top `k` rows per group by `orderCol` descending (numeric order
    * column). Output keeps the child's schema, rows descending within
    * each group.
    *
    * Memory trade-off: the heap operator holds groups-per-partition ×
    * k rows in task memory with no spill (see TopKPerGroupExec). Use it
    * when group cardinality ÷ shuffle partitions is modest; for
    * extreme group cardinality prefer a row_number() window, which
    * sorts (and spills) instead. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), attr(orderCol), k, analyzed))
  }
}
