package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (SURVEY §5). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("graft-test", cpus = 4)
}
