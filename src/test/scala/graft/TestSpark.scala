package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (SURVEY §5). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("graft-test", cpus = 4)

  /** Run `body` with whole-stage-codegen fallback temporarily re-enabled.
    *
    * The engine session is strict (`spark.sql.codegen.fallback=false`, see
    * [[graft.Engine.session]]) so a janino compile failure on a REGISTERED
    * query throws instead of silently de-vectorizing. A few specs execute
    * deliberately-interpreted REFERENCE compositions (per-bit HOF simhash
    * twins) whose generated stage is allowed to exceed janino's limits —
    * they opt back in through this helper, which restores strictness even
    * on failure. Suites share one forked JVM and run sequentially, so the
    * temporary override cannot leak into a concurrently running suite. */
  def withCodegenFallback[A](body: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try body finally spark.conf.set(key, prev)
  }
}
