package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4.2): rewrite exact COUNT(DISTINCT x) into
  * HyperLogLog++ when `spark.graft.approxDistinct=true`.
  *
  * Why: at 100 TB an exact distinct forces a full shuffle of the
  * distinct keys; HLL++ aggregates a fixed-size sketch with map-side
  * combine — same answer within relativeSD. The flag keeps the choice
  * a deployment decision, not a query rewrite: the same query text is
  * exact in tests and approximate in production.
  *
  * Only single-argument COUNT(DISTINCT x) rewrites; multi-arg distinct
  * counts and DISTINCT in other aggregates are left untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val FLAG = "spark.graft.approxDistinct"
  val SD_FLAG = "spark.graft.approxDistinct.relativeSD"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FLAG, "false").toBoolean) plan
    else {
      val sd = conf.getConfString(SD_FLAG, "0.05").toDouble
      plan.transformAllExpressions {
        case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(child, sd),
            isDistinct = false)
      }
    }
}

/** Optimizer rule: rewrite exact `percentile(x, p)` into
  * `approx_percentile(x, p, accuracy)` when
  * `spark.graft.approxPercentile=true` — the quantile twin of
  * [[ApproxDistinctRewrite]].
  *
  * Why: exact Percentile accumulates a per-group value-counts map —
  * memory ∝ distinct values per group, which an unbounded double
  * column makes O(group size). ApproximatePercentile maintains a
  * FIXED-SIZE QuantileSummaries sketch (Greenwald-Khanna) with
  * map-side combine — rank error ≤ 1/accuracy. The flag keeps one
  * query text exact under the oracle gate and sketch-bounded at
  * 100 TB.
  *
  * Only the default shape rewrites — frequency = literal 1 (a
  * weighted percentile has no approx counterpart) and reverse = false
  * (a descending percentile rewritten ascending would silently return
  * ≈ the mirrored quantile). The child is CAST TO DOUBLE inside the
  * sketch: exact Percentile always RETURNS double, while
  * ApproximatePercentile returns its child's type — rewriting a
  * long column without the cast would re-type the aggregate slot
  * POST-ANALYSIS and upstream projections would read garbage. */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {
  val FLAG = "spark.graft.approxPercentile"
  val ACC_FLAG = "spark.graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FLAG, "false").toBoolean) plan
    else {
      val acc = conf.getConfString(ACC_FLAG, "10000").toInt
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
      import org.apache.spark.sql.types.DoubleType
      plan.transformAllExpressions {
        case ae @ AggregateExpression(
            p @ Percentile(_, _, Literal(1L, _), _, _, false), _, false, None, _) =>
          ae.copy(aggregateFunction = new ApproximatePercentile(
            Cast(p.child, DoubleType), p.percentageExpression, Literal(acc)))
      }
    }
}

/** Session extensions entry point:
  * SparkSession.builder().withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.plans.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
    e.injectOptimizerRule(_ => ApproxPercentileRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
