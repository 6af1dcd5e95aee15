package graft.ann

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an `ArrayType(FloatType)`
  * embedding column (SURVEY §2.11 X2).
  *
  * Scale shape:
  *  - bruteForce: one narrow map (cosine vs a literal query vector — no
  *    shuffle, no join) followed by TakeOrderedAndProject. O(N·d) work,
  *    O(k) result; the right baseline even at 100 TB because the scan
  *    parallelizes perfectly and nothing is collected but k rows.
  *  - lshTopK: the scale path — a seeded hyperplane signature assigns every
  *    vector to a bucket; the query probes its own bucket plus the
  *    `probes` nearest buckets by signature Hamming distance, so the
  *    candidate set (and hence work) is corpus-size-independent per bucket.
  */
object Knn {

  /** Fetch one stored embedding to use as the query point (parameter fetch,
    * not a data-path collect). */
  def queryVector(embs: DataFrame, vecId: Long): Array[Float] =
    embs.filter(col("vec_id") === vecId).select("embedding")
      .head().getSeq[Float](0).toArray

  /** Exact cosine top-k against the query vector; excludes the query row. */
  def bruteForce(embs: DataFrame, q: Array[Float], excludeId: Long, k: Int): DataFrame = {
    val qLit = typedlit(q.map(_.toDouble).toSeq)
    graft.Tables.parallelized(embs).filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        floor(V.cosine(col("embedding"), qLit) * 10000.0).as("cos_x10k"))
      .orderBy(desc("cos_x10k"), col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: compare only against vectors whose
    * signature is within `maxHamming` of the query's (multi-probe). */
  def lshTopK(embs: DataFrame, q: Array[Float], excludeId: Long, k: Int,
      dim: Int, bits: Int = 8, seed: Long = 42L, maxHamming: Int = 2): DataFrame = {
    val spark = embs.sparkSession
    val qDf = spark.range(1).select(
      typedlit(q.toSeq).cast(ArrayType(FloatType)).as("embedding"))
    val qSig = qDf.select(
      V.hyperplaneSignature(col("embedding"), dim, bits, seed).as("s"))
      .head().getLong(0)

    val qLit = typedlit(q.map(_.toDouble).toSeq)
    graft.Tables.parallelized(embs).filter(col("vec_id") =!= excludeId)
      .withColumn("bucket",
        V.hyperplaneSignature(col("embedding"), dim, bits, seed))
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qSig))) <= maxHamming)
      .select(col("vec_id"),
        floor(V.cosine(col("embedding"), qLit) * 10000.0).as("cos_x10k"))
      .orderBy(desc("cos_x10k"), col("vec_id"))
      .limit(k)
  }
}
