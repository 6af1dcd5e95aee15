package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage probe for the q267 HITS pipeline. `runMain
  * graft.tools.HitsProbe <sfDir>`. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Engine.session("hits-probe")
    graft.Engine.quietSweepLogging()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"))
    val nxt = Window.partitionBy("okey").orderBy(col("ln"), col("pk"))
    val rawEdges = li.withColumn("dst", lead("pk", 1).over(nxt))
      .filter(col("dst").isNotNull && col("dst") =!= col("pk"))
      .groupBy(col("pk").as("src"), col("dst"))
      .agg(count(lit(1)).as("wt"))
    val eBase = t("eBase")(graft.operators.Checkpoints.scratch(rawEdges))
    println(s"PROBE |E|=${eBase.count()}")
    val nodes = t("nodes")(graft.operators.Checkpoints.scratch(
      eBase.select(col("src").as("node"))
        .union(eBase.select(col("dst").as("node"))).distinct()))
    println(s"PROBE |V|=${nodes.count()}")
    var hub = nodes.withColumn("h", lit(1000000L))
    for (i <- 1 to 3) {
      val aRaw = t(s"aRaw$i")(graft.operators.Checkpoints.scratch(
        eBase.join(broadcast(hub.select(col("node").as("src"), col("h"))), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(expr("wt * h")).as("v"))))
      val mx = t(s"amax$i")(
        aRaw.agg(greatest(max(col("v")), lit(1L)).as("mx")))
      val auth = aRaw.crossJoin(broadcast(mx))
        .select(col("node"), expr("v * 1000000 div mx").as("a"))
      val hRaw = t(s"hRaw$i")(graft.operators.Checkpoints.scratch(
        eBase.join(broadcast(auth.select(col("node").as("dst"), col("a"))), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(expr("wt * a")).as("v"))))
      hub = hRaw.crossJoin(broadcast(
          hRaw.agg(greatest(max(col("v")), lit(1L)).as("mx"))))
        .select(col("node"), expr("v * 1000000 div mx").as("h"))
    }
    t("final")(hub.count())
    spark.stop()
  }
}
