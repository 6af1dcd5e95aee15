package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev A/B: the q124/q256/q267/q272/q305 transition-edge build.
  * A = the shipped shape (per-order sort window + lead).
  * B = per-order array aggregate (collect_list → array_sort → adjacent
  *     pairs via transform → explode) — no WindowExec, no per-partition
  *     sort; the sort happens per 4-row order array inside codegen.
  * Prints wall times and whether the (src, dst, wt) frames are identical.
  * `runMain graft.tools.EdgeAbProbe [sfDir] [reps]` */
object EdgeAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Engine.session("edge-ab")
    graft.Engine.quietSweepLogging()
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"))

    def edgesA = {
      val nxt = Window.partitionBy("okey").orderBy(col("ln"), col("pk"))
      li.withColumn("dst", lead("pk", 1).over(nxt))
        .filter(col("dst").isNotNull && col("dst") =!= col("pk"))
        .groupBy(col("pk").as("src"), col("dst"))
        .agg(count(lit(1)).as("wt"))
    }
    def edgesB =
      li.groupBy("okey")
        .agg(array_sort(collect_list(struct(col("ln"), col("pk")))).as("xs"))
        .select(explode(expr(
          "filter(transform(slice(xs, 1, size(xs) - 1), (x, i) -> " +
            "struct(x.pk as src, xs[i + 1].pk as dst)), " +
            "p -> p.src != p.dst)")).as("e"))
        .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
        .agg(count(lit(1)).as("wt"))

    for (r <- 0 to reps) {
      val t0 = System.nanoTime(); val na = edgesA.count()
      val tA = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val nb = edgesB.count()
      val tB = (System.nanoTime() - t1) / 1e9
      println(f"EDGEAB rep=$r A=$tA%.2fs ($na rows)  B=$tB%.2fs ($nb rows)")
    }
    val diff = edgesA.union(edgesB).groupBy("src", "dst", "wt")
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"EDGEAB diff_rows=$diff (0 = identical multisets)")
    spark.stop()
  }
}
