package graft

object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("judge-probe")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    time("q29_warm")(graft.queries.Extensions.q29(spark, dir).count())
    time("q29_run1")(graft.queries.Extensions.q29(spark, dir).count())
    time("q29_run2")(graft.queries.Extensions.q29(spark, dir).count())
    graft.queries.Extensions.q29(spark, dir).explain()
    spark.stop()
  }
}
