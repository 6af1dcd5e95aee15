package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage probe for the q257 SemDeDup pipeline: times member-frame
  * build, pair generation, and the CC pass separately so a slow aggregate
  * number can be attributed before optimizing. `runMain graft.tools.SemProbe
  * <sfDir>`. */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Engine.session("sem-probe")
    graft.Engine.quietSweepLogging()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val embs = graft.Tables.load(spark, dir, "embeddings")
    val k = graft.queries.Semantic.tierK(embs.count())
    println(s"PROBE k=$k")
    val q = graft.ann.PortableAnn.quantized(embs)
    val cents = t("train")(
      graft.queries.Semantic.ivfTrainIntJoin(spark, q, k))
    val cf = graft.queries.Semantic.centFrame(spark, cents)
    val m = t("assign")(graft.queries.Semantic.assignCid(
        q, cf, carry = Seq("nrm", "qv"))
      .withColumn("cscore",
        graft.ann.PortableAnn.cosPpmScore("cdot", "nrm", "cnrm"))
      .select("vec_id", "cid", "nrm", "qv", "cscore").persist())
    println(s"PROBE members=${m.count()}")
    val a = m.select(col("cid"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("nrm").as("na"))
    val b = m.select(col("cid"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("cid")).filter(col("id_a") < col("id_b"))
      .withColumn("dot", call_function("dot_i64", col("qa"), col("qb")))
      .withColumn("s", graft.ann.PortableAnn.cosPpmScore("dot", "na", "nb"))
      .filter(col("s") >= 150000L)
      .select("cid", "id_a", "id_b").persist()
    val np = t("pairs")(pairs.count())
    println(s"PROBE pairs=$np")
    val cc = t("cc")(graft.operators.ConnectedComponents.run(
      m.select(col("vec_id").as("id")),
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))))
    println(s"PROBE comps=${cc.count()}")
    t("full-q257")(graft.queries.Semantic.q257(spark, dir).count())
    t("full-q257-rep2")(graft.queries.Semantic.q257(spark, dir).count())
    spark.stop()
  }
}
