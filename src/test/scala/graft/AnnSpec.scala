package graft

import graft.ann.Knn
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the approximate paths must return k rows and substantially
  * agree with the exact brute-force ranking (recall), since their outputs are
  * seeded/float-order dependent and not hash-checkable against DuckDB. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  lazy val embs = Tables.load(spark, sf, "embeddings")
  lazy val q = Knn.queryVector(embs, 0L)
  lazy val exact = topIds(Knn.bruteForce(embs, q, excludeId = 0L, k = 10))

  test("IVF top-10: k rows, recall vs brute force >= 0.5") {
    val ivf = topIds(Knn.ivfTopK(embs, q, excludeId = 0L, k = 10,
      nClusters = 8, nProbe = 3))
    assert(ivf.size == 10)
    val recall = (ivf & exact).size
    assert(recall >= 5, s"IVF recall too low: $recall/10 (ivf=$ivf exact=$exact)")
  }

  test("IVF centroids: nClusters entries of the right dimensionality") {
    val cents = Knn.ivfTrain(embs, nClusters = 8, iters = 2)
    assert(cents.length == 8)
    assert(cents.forall(_._2.length == 64))
  }

  test("IVF centroids: duplicate init vectors (empty clusters) still yield nClusters") {
    import spark.implicits._
    // vec 0..3 identical → cosine ties starve all but one of those clusters;
    // the starved clusters must keep their previous vector, not vanish
    val dup = (0L until 16L).map { i =>
      val v = if (i < 4) Array(1.0f, 0f, 0f) else
        Array(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat, 0.1f * i)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Knn.ivfTrain(dup, nClusters = 6, iters = 3, sampleMod = 1)
    assert(cents.length == 6, s"got ${cents.length} centroids")
    assert(cents.forall(_._2.length == 3))
  }

  test("IVF query path is a narrow map: zero shuffles in the plan") {
    val df = Knn.ivfTopK(embs, q, excludeId = 0L, k = 10,
      nClusters = 8, nProbe = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"IVF probe must not shuffle the corpus:\n$p")
  }

  test("LSH top-10: k rows and overlap with brute force") {
    val lsh = topIds(Knn.lshTopK(embs, q, excludeId = 0L, k = 10, dim = 64))
    assert(lsh.size == 10)
    assert((lsh & exact).nonEmpty)
  }
}
