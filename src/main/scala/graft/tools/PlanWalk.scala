package graft.tools

import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Exhaustive physical-plan walker for the anti-pattern sweeps.
  *
  * With AQE enabled (the engine default), `queryExecution.executedPlan` is
  * an [[AdaptiveSparkPlanExec]] — a LEAF node wrapping the real tree, so
  * `TreeNode.collect` visits only the wrapper and a naive sweep passes
  * vacuously for every exchange-containing query (ADVICE r15 #1). This
  * walker descends through:
  *
  *   - the AQE wrapper, via its pre-execution `inputPlan` (the initial
  *     physical plan — join/window/expression choices are all made by
  *     then; `finalPhysicalPlan` is NOT touched because reading it would
  *     trigger execution),
  *   - materialized [[QueryStageExec]] stages (present when a plan is
  *     walked after execution),
  *   - subquery expression trees ([[PlanExpression]] plans, which under
  *     AQE are themselves AdaptiveSparkPlanExec-wrapped).
  */
object PlanWalk {

  /** Every SparkPlan node reachable from `plan`, wrappers unwrapped. */
  def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val here = plan.collect { case n => n }
    val wrapped = here.flatMap {
      case a: AdaptiveSparkPlanExec => allNodes(a.inputPlan)
      case q: QueryStageExec        => allNodes(q.plan)
      case _                        => Nil
    }
    val subqueries = here
      .flatMap(_.expressions.flatMap(_.collect {
        case pe: PlanExpression[_] => pe.plan
      }))
      .collect { case sp: SparkPlan => sp }
      .flatMap(allNodes)
    here ++ wrapped ++ subqueries
  }
}
