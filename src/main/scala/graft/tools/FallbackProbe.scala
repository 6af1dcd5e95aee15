package graft.tools

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Dev probe: walk every registered query's physical plan and report each
  * expression that is a [[CodegenFallback]] — the class of node that embeds
  * an interpreted eval call inside a generated stage (and the class the
  * PlanQualitySpec fallback sweep pins to zero). Walks through the AQE
  * wrapper and subquery plans via [[PlanWalk]] (ADVICE r15 #1 — a naive
  * `collect` over an AdaptiveSparkPlanExec sees only the wrapper). Usage:
  * `runMain graft.tools.FallbackProbe [sfDir]`. */
object FallbackProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session("fallback-probe", cpus = 8)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val nodes = PlanWalk.allNodes(
          graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan)
        val hits = nodes
          .flatMap(_.expressions.flatMap(_.collect {
            case e: CodegenFallback => e.getClass.getSimpleName
          }))
          .distinct.sorted
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
