package graft

import graft.sources.Sources
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The text-format ingest edge: CSV/JSONL round-trips preserve values and
  * schema, malformed rows land in quarantine (not in the clean frame, not in
  * a job abort), and the empty-input write guard holds for both formats.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val tmp = "target/tmp/sources-spec"

  private val schema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  private def nation = Tables.load(spark, sf, "nation")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("CSV round-trip preserves rows and declared schema") {
    assert(Sources.writeCsv(nation, s"$tmp/nation_csv"))
    val back = Sources.csv(spark, s"$tmp/nation_csv", schema)
    val (clean, bad) = Sources.splitCorrupt(back)
    assert(bad.count() == 0)
    assert(clean.schema == schema)
    assert(clean.collect().toSet == nation.collect().toSet)
  }

  test("JSONL round-trip preserves rows and declared schema") {
    assert(Sources.writeJsonl(nation, s"$tmp/nation_jsonl"))
    val back = Sources.jsonl(spark, s"$tmp/nation_jsonl", schema)
    val (clean, bad) = Sources.splitCorrupt(back)
    assert(bad.count() == 0)
    assert(clean.schema == schema)
    assert(clean.collect().toSet == nation.collect().toSet)
  }

  test("malformed CSV rows are quarantined, not dropped and not fatal") {
    val dir = s"$tmp/bad_csv"
    import spark.implicits._
    Seq("n_nationkey,n_name,n_regionkey",
      "1,ALGERIA,0",
      "oops,BROKEN,xyz",   // unparsable ints
      "2,BRAZIL,1")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (clean, bad) = Sources.splitCorrupt(Sources.csv(spark, dir, schema))
    assert(clean.count() == 2)
    assert(clean.select("n_name").collect().map(_.getString(0)).toSet ==
      Set("ALGERIA", "BRAZIL"))
    val quarantined = bad.collect()
    assert(quarantined.length == 1)
    assert(quarantined.head.getString(0).contains("oops"))
  }

  test("malformed JSONL rows are quarantined with the raw line intact") {
    val dir = s"$tmp/bad_jsonl"
    import spark.implicits._
    Seq("""{"n_nationkey":1,"n_name":"ALGERIA","n_regionkey":0}""",
      """{"n_nationkey": not json at all""",
      """{"n_nationkey":2,"n_name":"BRAZIL","n_regionkey":1}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (clean, bad) = Sources.splitCorrupt(Sources.jsonl(spark, dir, schema))
    assert(clean.count() == 2)
    val quarantined = bad.collect()
    assert(quarantined.length == 1)
    assert(quarantined.head.getString(0).contains("not json"))
  }

  test("empty input writes nothing for both text sinks") {
    val empty = nation.filter(lit(false))
    assert(!Sources.writeCsv(empty, s"$tmp/never_csv"))
    assert(!Sources.writeJsonl(empty, s"$tmp/never_jsonl"))
  }
}
