package graft

import graft.ann.PortableAnn
import graft.queries.Semantic
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embedding-space curation family (q257–q259): the join-based k-means
  * must be bit-identical to the literal-expression portable Lloyd (the hash
  * gate sees results, not physical plans — this spec pins the physical twin
  * directly), the SemDeDup survivorship must keep the group member least
  * similar to its centroid through TRANSITIVE closure, and the assignment
  * fan must stay broadcast + pre-shuffle-collapsed. */
class SemanticSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("tierK follows the corpus through every boundary") {
    assert(Semantic.tierK(1L) == 8)
    assert(Semantic.tierK(16384L) == 8)
    assert(Semantic.tierK(16385L) == 32)
    assert(Semantic.tierK(32768L) == 32)
    assert(Semantic.tierK(32769L) == 128)
    assert(Semantic.tierK(65536L) == 128)
    assert(Semantic.tierK(65537L) == 512)
    assert(Semantic.tierK(100000000L) == 512)
  }

  test("join-based Lloyd == literal-expression Lloyd on the same corpus") {
    val q = PortableAnn.quantized(Tables.load(spark, sf, "embeddings"))
    val lit8 = PortableAnn.ivfTrainInt(q, nClusters = 8, iters = 2)
    val join8 = Semantic.ivfTrainIntJoin(spark, q, nClusters = 8, iters = 2)
    assert(lit8.map(_._1).toSeq == join8.map(_._1).toSeq)
    lit8.zip(join8).foreach { case ((cidA, cvA), (cidB, cvB)) =>
      assert(cidA == cidB)
      assert(cvA.toSeq == cvB.toSeq, s"centroid $cidA diverged")
    }
  }

  test("broadcast-frame assignment == literal-expression assignment") {
    val q = PortableAnn.quantized(Tables.load(spark, sf, "embeddings"))
    val cents = PortableAnn.ivfTrainInt(q, nClusters = 8, iters = 2)
    val viaLiteral = q.withColumn("cid", PortableAnn.nearestCidInt(cents))
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = Semantic.assignCid(q, Semantic.centFrame(spark, cents))
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLiteral == viaJoin)
  }

  test("assignment fan is broadcast and the exchange is corpus-narrow") {
    val q = PortableAnn.quantized(Tables.load(spark, sf, "embeddings"))
    val cents = PortableAnn.ivfTrainInt(q, nClusters = 8, iters = 2)
    val plan = Semantic.assignCid(q, Semantic.centFrame(spark, cents))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid frame must broadcast, not shuffle:\n$plan")
    // partial aggregation must collapse the k-fan before the exchange —
    // a plan that shuffles the fan itself would carry k rows per vec_id.
    // (min over a STRUCT buffer plans as SortAggregate, so the marker is
    // the partial_min below the exchange, not HashAggregate.)
    assert(plan.contains("partial_min"),
      s"expected a partial aggregate below the exchange:\n$plan")
  }

  test("SemDeDup survivorship: transitive groups keep the least-central member") {
    import spark.implicits._
    // planted member frame: cluster 0 holds a transitive chain a–b, b–c
    // (a·c below threshold) plus an isolated singleton; cluster 7 holds an
    // exact pair. qv chosen so pair scores cross 150000 exactly as planted.
    val base = Seq(1L, 0L, 0L, 0L)
    def vecScaled(s: Long) = base.map(_ * s)
    // chain: v1=(100,0,0,0), v2=(80,60,0,0), v3=(0,100,0,0):
    // cos(v1,v2)=0.8, cos(v2,v3)=0.6 -> both >= 150000 ppm as cos² ppm
    // (640000 and 360000); cos(v1,v3)=0 -> not a pair. v4 orthogonal-ish.
    val rows = Seq(
      (1L, 0L, Seq(100L, 0L, 0L, 0L)),
      (2L, 0L, Seq(80L, 60L, 0L, 0L)),
      (3L, 0L, Seq(0L, 100L, 0L, 0L)),
      (4L, 0L, Seq(0L, 0L, 100L, 0L)),
      (10L, 7L, Seq(0L, 0L, 0L, 50L)),
      (11L, 7L, Seq(0L, 0L, 0L, 50L)))
    // cscore: make vec 2 the LEAST centroid-similar of the chain (keeper),
    // and tie the cluster-7 pair so the smaller id (10) survives
    val cs = Map(1L -> 900000L, 2L -> 100000L, 3L -> 500000L,
      4L -> 400000L, 10L -> 700000L, 11L -> 700000L)
    val m = rows.toDF("vec_id", "cid", "qv")
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
      .withColumn("cscore",
        element_at(typedlit(cs), col("vec_id")))
    val out = Semantic.semdedupRollup(m, thresholdPpm = 150000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // cluster 0: 4 members, pairs (1,2) and (2,3), ONE transitive group of 3
    // -> 2 dropped, kept = v2 (least central) + singleton v4 = 6
    // cluster 7: 2 members, 1 pair, 1 group, 1 dropped, kept = 10 (id tie)
    assert(out.toSeq == Seq(
      (0L, 4L, 2L, 1L, 2L, 6L),
      (7L, 2L, 1L, 1L, 1L, 10L)), out.toSeq.toString)
  }

  test("drift monitor reports every centroid row, zero-mass clusters included") {
    val out = Semantic.q259(spark, sf)
    val rows = out.collect()
    val k = Semantic.tierK(500L)
    assert(rows.length == k, s"expected all $k cluster rows")
    // ppm columns are exact integer shares of their own snapshot totals
    val sumA = rows.map(_.getLong(1)).sum
    val sumB = rows.map(_.getLong(2)).sum
    assert(sumA > 0 && sumB > 0)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 1000000L / sumA)
      assert(r.getLong(4) == r.getLong(2) * 1000000L / sumB)
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
    }
  }
}
