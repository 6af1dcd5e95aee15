package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: every declared query runs on sf0.001 and returns
  * rows; every oracle key refers to a declared query. (Value-level parity is
  * the driver's DuckDB gate, mirrored by tools/oracle_check.py.) */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }
}
