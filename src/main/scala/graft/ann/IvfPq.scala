package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-PQ: the composed ANN index production systems run at 100 TB (Jégou
  * et al. §VI, "IVFADC") — a coarse quantizer routes every vector to an
  * inverted list, and product quantization encodes the RESIDUAL
  * (vector − list centroid), which is far more compressible than the raw
  * vector because the coarse step has already removed most of its energy.
  * A query probes only `nProbe` lists and scores only those lists' codes.
  *
  * Spark shape: both trainings sample (never full scans); assignment,
  * residual, and encoding are narrow maps with all model parameters as
  * literals; the query path is nProbe filtered code scans + one exact
  * re-rank of topK×refine rows. Zero shuffles, zero joins at any corpus
  * size. At warehouse scale (cid, codes) is written once, partitioned by
  * cid, making each probe a partition-pruned scan of m bytes/row — the
  * persisted form of exactly that layout is [[IvfPqIndex]].
  *
  * The per-list ADC tables are built from the query's residual against THAT
  * list's centroid (the residual trick requires it), so the candidate scan
  * is a union of nProbe narrow maps — each list's table stays a foldable
  * literal for the native `adc_dist` expression.
  */
object IvfPq {

  /** The trained model: coarse centroids + residual PQ codebooks. Small
    * (nClusters·dim + m·k·(dim/m) floats) — travels as literals at query
    * time and as two tiny parquet tables when persisted. */
  final case class Model(centroids: Array[(Long, Array[Float])],
      codebooks: Array[Array[Array[Float]]]) {
    def cmap: Map[Long, Seq[Double]] =
      centroids.map { case (cid, v) => cid -> v.map(_.toDouble).toSeq }.toMap
  }

  /** Train the coarse quantizer and the residual codebooks (both over
    * deterministic hash-samples — never a full scan). */
  def train(embs: DataFrame, dim: Int, nClusters: Int = 16, m: Int = 16,
      k: Int = 16, iters: Int = 2): Model = {
    val centroids = Knn.ivfTrain(embs, nClusters, iters)
    val codebooks = Pq.pqTrain(
      assignResiduals(embs, centroids).select(col("vec_id"),
        col("resid").as("embedding")),
      dim, m, k, iters)
    Model(centroids, codebooks)
  }

  /** cid + residual per vector: narrow, model-as-literal (no join, no
    * shuffle). */
  private def assignResiduals(embs: DataFrame,
      centroids: Array[(Long, Array[Float])]): DataFrame = {
    val cmapLit = typedlit(
      centroids.map { case (cid, v) => cid -> v.map(_.toDouble).toSeq }.toMap)
    graft.Tables.parallelized(embs)
      .withColumn("cid", Knn.nearestCid(centroids))
      .withColumn("resid",
        zip_with(col("embedding"), element_at(cmapLit, col("cid")),
          (a, b) => a - b).cast(ArrayType(FloatType)))
  }

  /** (vec_id, cid, codes): the m-bytes-per-row compressed corpus — the
    * write-once table of a deployed index. */
  def encode(embs: DataFrame, model: Model): DataFrame =
    assignResiduals(embs, model.centroids)
      .select(col("vec_id"), col("cid"),
        Pq.encodeCol(col("resid"), model.codebooks).as("codes"))

  /** Query a code table: probe the nProbe nearest lists (per-list ADC
    * tables from the query's residual), take topK×refine candidates, exact
    * re-rank against the original vectors. `encoded` may be the in-flight
    * frame or a persisted cid-partitioned table — the `cid === c` filters
    * become partition pruning in the latter case. */
  def queryEncoded(encoded: DataFrame, embs: DataFrame, model: Model,
      q: Array[Float], excludeId: Long, topK: Int, dim: Int,
      nProbe: Int = 4, m: Int = 16, refine: Int = 5): DataFrame = {
    val cmap = model.cmap
    val qd = q.map(_.toDouble)
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    // probe-list choice mirrors Knn.ivfTopK (same cosine + tie-break rule,
    // so duplicate centroids route probes to the lists rows actually occupy)
    val probeCids = model.centroids
      .map { case (cid, _) => (cos(qd, cmap(cid)), cid) }
      .sortBy { case (c, cid) => (-c, -cid) }.take(nProbe).map(_._2)

    // per-list ADC: distance tables from the query's residual vs THAT list's
    // centroid; each list's table is a foldable literal child of adc_dist
    val w = dim / m
    val clean = encoded.filter(col("vec_id") =!= excludeId)
    val candScans = probeCids.toSeq.map { c =>
      val qres = qd.zip(cmap(c)).map { case (x, cv) => x - cv }
      val dt: Seq[Seq[Double]] = (0 until m).map { s =>
        model.codebooks(s).map { cvec =>
          var d = 0.0; var i = 0
          while (i < w) { val x = qres(s * w + i) - cvec(i); d += x * x; i += 1 }
          d
        }.toSeq
      }
      clean.filter(col("cid") === c)
        .select(col("vec_id"),
          floor(call_function("adc_dist", col("codes"), typedlit(dt)) * 1e6)
            .cast(LongType).as("adist_x1e6"))
    }
    val candidates = candScans.reduce(_ union _)
      .orderBy(col("adist_x1e6"), col("vec_id"))
      .limit(topK * refine)
      .select("vec_id").collect().map(_.getLong(0))

    // exact L2 re-rank of candidate rows only (the Pq.pqTopK tail): the id
    // list is a parameter (≤ topK×refine longs), pushed down as an IN filter
    val qLit = typedlit(qd.toSeq)
    graft.Tables.parallelized(embs)
      .filter(col("vec_id").isInCollection(candidates))
      .select(col("vec_id"),
        floor(Pq.l2sq(col("embedding"), qLit) * 1e6).cast(LongType)
          .as("dist_x1e6"))
      .orderBy(col("dist_x1e6"), col("vec_id"))
      .limit(topK)
  }

  def ivfPqTopK(embs: DataFrame, q: Array[Float], excludeId: Long, topK: Int,
      dim: Int, nClusters: Int = 16, nProbe: Int = 4, m: Int = 16, k: Int = 16,
      iters: Int = 2, refine: Int = 5): DataFrame = {
    val model = train(embs, dim, nClusters, m, k, iters)
    queryEncoded(encode(embs, model), embs, model, q, excludeId, topK, dim,
      nProbe, m, refine)
  }
}

/** Persistence for the IVF-PQ index — the deployment shape: train once,
  * write the model (two tiny parquet tables) plus the compressed corpus
  * partitioned by cid, then serve queries that scan ONLY the probed
  * partitions (`PartitionFilters` on cid — asserted in AnnSpec) and re-rank
  * against the full-precision vectors by id. Rebuilding the index is a
  * corpus rewrite; queries never retrain. */
object IvfPqIndex {

  def save(spark: SparkSession, model: IvfPq.Model, encoded: DataFrame,
      path: String): Unit = {
    import spark.implicits._
    // model tables FIRST, codes LAST: the codes table's _SUCCESS is the
    // build-complete marker (IndexPaths.isBuilt), so it must be the final
    // write — a crash mid-save must never leave a "built" index missing
    // its centroids/codebooks
    model.centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    model.codebooks.zipWithIndex.toSeq
      .flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (cvec, code) => (s, code, cvec.toSeq) } }
      .toDF("s", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.write.mode("overwrite").partitionBy("cid").parquet(s"$path/codes")
  }

  /** In-process model cache keyed by index path. Safe because an index path
    * embeds the corpus fingerprint ([[ensureBuilt]]) — a rewritten corpus
    * gets a new path, so a cached model can never serve stale centroids.
    * This is the serving shape: the model (a few KB) lives in memory, only
    * code partitions and the re-rank rows are read per query. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfPq.Model]()

  def loadModelCached(spark: SparkSession, path: String): IvfPq.Model =
    modelCache.computeIfAbsent(path, _ => loadModel(spark, path))

  def loadModel(spark: SparkSession, path: String): IvfPq.Model = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val m = cbRows.map(_._1).max + 1
    val k = cbRows.map(_._2).max + 1
    val codebooks = Array.ofDim[Array[Float]](m, k)
    cbRows.foreach { case (s, code, vec) => codebooks(s)(code) = vec }
    IvfPq.Model(centroids, codebooks)
  }

  def codes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes")

  /** Build + persist in one step; returns the model for immediate querying. */
  def build(spark: SparkSession, embs: DataFrame, path: String, dim: Int,
      nClusters: Int = 16, m: Int = 16, k: Int = 16, iters: Int = 2): IvfPq.Model = {
    val model = IvfPq.train(embs, dim, nClusters, m, k, iters)
    save(spark, model, IvfPq.encode(embs, model), path)
    model
  }

  /** Serve a query from the persisted index: probed partitions only, then
    * the exact re-rank against `embs`. */
  def query(spark: SparkSession, path: String, embs: DataFrame,
      q: Array[Float], excludeId: Long, topK: Int, dim: Int,
      nProbe: Int = 4, m: Int = 16, refine: Int = 5): DataFrame =
    IvfPq.queryEncoded(codes(spark, path), embs, loadModelCached(spark, path),
      q, excludeId, topK, dim, nProbe, m, refine)

  /** Build-once gate for a served index: the index lives at a path derived
    * from the corpus location AND a fingerprint of its files (sizes +
    * modification times), so a rewritten corpus gets a fresh index
    * automatically and an unchanged one is never retrained — queries pay
    * only the partition-pruned probe scans. This is the deployment contract
    * (rebuild = corpus rewrite; queries never retrain) made executable:
    * q103 serves through it, so the bench measures the serve path, not a
    * per-invocation training run. Returns the index path. */
  def ensureBuilt(spark: SparkSession, embs: DataFrame, corpusDir: String,
      dim: Int, nClusters: Int = 16, m: Int = 16, k: Int = 16,
      iters: Int = 2): String = synchronized {
    val path = IndexPaths.indexPath(spark, corpusDir, "graft-ivfpq")
    if (!IndexPaths.isBuilt(spark, path)) {
      build(spark, embs, path, dim, nClusters, m, k, iters)
      // the rewritten corpus's stamp change orphaned any prior index —
      // reap it (disk twin of Models.cachedLatest eviction)
      IndexPaths.pruneSuperseded(spark, corpusDir, "graft-ivfpq", path)
    }
    path
  }
}
