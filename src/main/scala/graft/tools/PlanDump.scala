package graft.tools

/** Dev probe: dump the executed plan of a registry query (post-execution,
  * AQE-final) and count exchange/reuse nodes.
  * `runMain graft.tools.PlanDump <sfDir> <queryName>` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("plan-dump")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    println(p.take(12000))
    Seq("Exchange hashpartitioning", "ReusedExchange", "Sort ", "Window",
      "WholeStageCodegen").foreach { k =>
      println(s"COUNT[$k] = ${k.r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
