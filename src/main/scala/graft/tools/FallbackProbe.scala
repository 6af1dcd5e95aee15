package graft.tools

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan

/** Dev probe: walk every registered query's physical plan and report each
  * expression that is a [[CodegenFallback]] — the class of node that embeds
  * an interpreted eval call inside a generated stage (and the class the
  * PlanQualitySpec fallback sweep pins to zero). Usage:
  * `runMain graft.tools.FallbackProbe [sfDir]`. */
object FallbackProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session("fallback-probe", cpus = 8)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        // walk subquery plans too (PlanExpression trees) — the same sweep
        // PlanQualitySpec pins
        def fallbacks(plan: SparkPlan): Seq[String] = {
          val exprs = plan.collect { case node => node.expressions }.flatten
          val direct = exprs.flatMap(_.collect {
            case e: Expression with CodegenFallback => e.getClass.getSimpleName
          })
          val subPlans = exprs.flatMap(_.collect {
            case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
              pe.plan
          }).collect { case sp: SparkPlan => sp }
          direct ++ subPlans.flatMap(fallbacks)
        }
        val hits = fallbacks(graft.SparkEntry.queries(n)(spark, dir)
          .queryExecution.executedPlan).distinct.sorted
        if (hits.nonEmpty) println(s"[fallback] $n -> ${hits.mkString(",")}")
      } catch {
        case ex: Throwable =>
          println(s"[fallback] $n BUILD-ERROR ${ex.getClass.getSimpleName}: " +
            ex.getMessage.linesIterator.take(1).mkString)
      }
    }
    println("[fallback] sweep done")
    spark.stop()
  }
}
