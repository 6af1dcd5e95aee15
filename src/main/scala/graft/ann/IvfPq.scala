package graft.ann

import org.apache.spark.sql.DataFrame
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
  * cid, making each probe a partition-pruned scan of m bytes/row.
  *
  * The per-list ADC tables are built from the query's residual against THAT
  * list's centroid (the residual trick requires it), so the candidate scan
  * is a union of nProbe narrow maps — each list's table stays a foldable
  * literal for the native `adc_dist` expression.
  */
object IvfPq {

  def ivfPqTopK(embs: DataFrame, q: Array[Float], excludeId: Long, topK: Int,
      dim: Int, nClusters: Int = 16, nProbe: Int = 4, m: Int = 16, k: Int = 16,
      iters: Int = 2, refine: Int = 5): DataFrame = {
    val centroids = Knn.ivfTrain(embs, nClusters, iters)
    val cmap: Map[Long, Seq[Double]] =
      centroids.map { case (cid, v) => cid -> v.map(_.toDouble).toSeq }.toMap
    val cmapLit = typedlit(cmap)

    // assignment + residual: narrow, model-as-literal (no join, no shuffle)
    val assigned = graft.Tables.parallelized(embs)
      .withColumn("cid", Knn.nearestCid(centroids))
      .withColumn("resid",
        zip_with(col("embedding"), element_at(cmapLit, col("cid")),
          (a, b) => a - b).cast(ArrayType(FloatType)))

    // PQ codebooks over residuals (hash-sampled Lloyd — see Pq.pqTrain)
    val codebooks = Pq.pqTrain(
      assigned.select(col("vec_id"), col("resid").as("embedding")),
      dim, m, k, iters)
    val encoded = assigned
      .select(col("vec_id"), col("cid"),
        Pq.encodeCol(col("resid"), codebooks).as("codes"))
      .filter(col("vec_id") =!= excludeId)

    // probe-list choice mirrors Knn.ivfTopK (same cosine + tie-break rule,
    // so duplicate centroids route probes to the lists rows actually occupy)
    val qd = q.map(_.toDouble)
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeCids = centroids
      .map { case (cid, _) => (cos(qd, cmap(cid)), cid) }
      .sortBy { case (c, cid) => (-c, -cid) }.take(nProbe).map(_._2)

    // per-list ADC: distance tables from the query's residual vs THAT list's
    // centroid; each list's table is a foldable literal child of adc_dist
    val w = dim / m
    val candScans = probeCids.toSeq.map { c =>
      val qres = qd.zip(cmap(c)).map { case (x, cv) => x - cv }
      val dt: Seq[Seq[Double]] = (0 until m).map { s =>
        codebooks(s).map { cvec =>
          var d = 0.0; var i = 0
          while (i < w) { val x = qres(s * w + i) - cvec(i); d += x * x; i += 1 }
          d
        }.toSeq
      }
      encoded.filter(col("cid") === c)
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
}
