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

  // ----------------------------------------------------------------- IVF

  /** Train IVF coarse centroids with Lloyd iterations over a deterministic
    * hash-sample of the corpus (training never scans the full table — the
    * sample is a narrow pushed-down filter). Assignment maximizes cosine, so
    * centroids partition the sphere like an IVF-flat index. Returns
    * (cid, cvec) with `nClusters` rows — always driver/broadcast sized.
    *
    * Shuffle shape per iteration: the broadcast crossJoin against nClusters
    * rows is a narrow map (no shuffle of the corpus); `max_by` partial
    * aggregation reduces the k×sample intermediate map-side; the centroid
    * update shuffles only sample×dim (pos, sum) pairs. */
  def ivfTrain(embs: DataFrame, nClusters: Int, iters: Int = 2,
      sampleMod: Int = 10): DataFrame = {
    // the sample is re-consumed every Lloyd iteration (assignment + update)
    // — persist it for training and release before returning
    val base = graft.Tables.parallelized(embs)
      .filter(pmod(xxhash64(col("vec_id")), lit(sampleMod)) === 0 ||
        col("vec_id") < nClusters) // guarantee ≥ nClusters training rows
      .select(col("vec_id"), col("embedding"))
      .persist()
    // deterministic init: the nClusters lowest vec_ids
    var centroids = base.orderBy("vec_id").limit(nClusters)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    for (_ <- 0 until iters) {
      val assigned = base.crossJoin(broadcast(centroids))
        .withColumn("cos", V.cosine(col("embedding"), col("cvec")))
        .groupBy(col("vec_id"), col("embedding"))
        .agg(max_by(col("cid"), col("cos")).as("cid"))
      // element-wise mean per cluster: posexplode → (cid, pos) avg →
      // rebuild ordered by pos (sort_array on (pos, v) structs)
      centroids = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg("v").as("m"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), x => x.getField("m").cast(FloatType)).as("cvec"))
    }
    // materialize the nClusters rows (driver-sized by construction) so the
    // returned table has no lineage into the training cache
    val spark = embs.sparkSession
    val rows = centroids.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    base.unpersist(blocking = false)
    spark.createDataFrame(rows.toSeq).toDF("cid", "cvec")
  }

  /** IVF-flat approximate top-k: assign the corpus to its nearest centroid
    * (one narrow broadcast pass), rank centroids against the query on the
    * driver (nClusters rows — a parameter fetch), then brute-force cosine
    * ONLY inside the `nProbe` best inverted lists. Work per query scales
    * with corpus/nClusters×nProbe, not corpus; at 100 TB the assignment is
    * computed once and the table is written partitioned/bucketed by `cid`,
    * making the probe a partition-pruned scan. */
  def ivfTopK(embs: DataFrame, q: Array[Float], excludeId: Long, k: Int,
      nClusters: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val centroids = ivfTrain(embs, nClusters, iters)
    val qLit = typedlit(q.map(_.toDouble).toSeq)
    val probeCids = centroids
      .select(col("cid"), V.cosine(col("cvec"), qLit).as("cos"))
      .orderBy(desc("cos"), col("cid")).limit(nProbe)
      .collect().map(_.getLong(0)) // nClusters rows: parameter fetch, not data
    val assigned = graft.Tables.parallelized(embs)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", V.cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(max_by(col("cid"), col("ccos")).as("cid"))
    assigned
      .filter(col("cid").isin(probeCids: _*) && col("vec_id") =!= excludeId)
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
