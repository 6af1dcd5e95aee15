package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Dev probe: compound-key bucket census for the q28 pipeline at a given
  * fixture — prints total exploded rows, dense-bucket count (> cap), and
  * the candidate-pair mass Σ C(bucket,2) with and without the cutoff, so
  * the cutoff's value is measured, not assumed.
  * `runMain graft.tools.BucketProbe <sfDir> [cap]` */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 256
    val spark = graft.Engine.session("bucket-probe")
    val docs = graft.Tables.load(spark, dir, "documents")
    val hashed = Dedup.simHashesPortable(docs)
    val n = hashed.count()
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    val j = math.min(4, math.max(1, (bitlen - 5) / 5))
    val bands = (0 until 10).combinations(j).toArray.zipWithIndex
      .map { case (bs, s) =>
        val kv = bs.zipWithIndex.map { case (b, i) =>
          shiftleft(
            shiftright(col("simhash"), b * 6).bitwiseAND(lit(0x3fL)), 6 * i)
        }.reduce((a, c) => a.bitwiseOR(c))
        struct(lit(s).as("band"), kv.as("bkey"))
      }.toIndexedSeq
    val census = hashed
      .select(explode(array(bands: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .groupBy("band", "bkey").agg(count(lit(1)).as("c"))
      .select(col("c"), expr("c * (c - 1) div 2").as("pairs"))
    val agg = census.agg(
      count(lit(1)).as("buckets"),
      sum("c").as("rows"),
      max("c").as("max_bucket"),
      sum("pairs").as("pairs_all"),
      sum(when(col("c") > cap, col("pairs")).otherwise(0L)).as("pairs_dense"),
      sum(when(col("c") > cap, 1L).otherwise(0L)).as("dense_buckets")
    ).head()
    println(s"PROBE n=$n j=$j buckets=${agg.getLong(0)} rows=${agg.getLong(1)} " +
      s"max_bucket=${agg.getLong(2)} pairs_all=${agg.getLong(3)} " +
      s"pairs_dense=${agg.getLong(4)} dense_buckets=${agg.getLong(5)}")
    spark.stop()
  }
}
