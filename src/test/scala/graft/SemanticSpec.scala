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

  test("q280 k-center equals a driver-side Gonzalez replay; radii shrink") {
    val m = PortableAnn.quantized(Tables.load(spark, sf, "embeddings"))
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Long]]("qv").toArray,
        r.getAs[Long]("nrm")))
      .sortBy(_._1)
    def d2(a: (Long, Array[Long], Long), b: (Long, Array[Long], Long)): Long = {
      var dot = 0L; var i = 0
      while (i < a._2.length) { dot += a._2(i) * b._2(i); i += 1 }
      a._3 + b._3 - 2L * dot
    }
    var chosen = Vector((m.head, 0L))
    while (chosen.length < 8) {
      val cand = m.filter(v => !chosen.exists(_._1._1 == v._1))
        .map(v => (v, chosen.map(c => d2(v, c._1)).min))
      val best = cand.maxBy { case (v, d) => (d, -v._1) }
      chosen = chosen :+ best
    }
    val expected = chosen.zipWithIndex
      .map { case ((v, d), i) => (i + 1L, v._1, d) }
    val got = Semantic.q280(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"engine $got vs replay $expected")
    // farthest-point selection values are non-increasing from round 2 on
    got.drop(1).map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"radius grew: $a -> $b")
      case _ =>
    }
  }

  test("tierK follows the corpus through every boundary") {
    assert(Semantic.tierK(1L) == 8)
    assert(Semantic.tierK(16384L) == 8)
    assert(Semantic.tierK(16385L) == 32)
    assert(Semantic.tierK(32768L) == 32)
    assert(Semantic.tierK(32769L) == 128)
    assert(Semantic.tierK(65536L) == 128)
    assert(Semantic.tierK(65537L) == 512)
    // open-ended above 2^16 (r13 VERDICT #2): k doubles per corpus doubling
    assert(Semantic.tierK(131072L) == 512)
    assert(Semantic.tierK(131073L) == 1024)
    assert(Semantic.tierK(100000000L) == 524288)
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

  test("mega-cluster cap: an all-near-identical corpus sub-splits, no closure block exceeds the cap, rollup == sub-rule replay") {
    import spark.implicits._
    // r13 VERDICT #1: the degenerate corpus SemDeDup actually meets — mass
    // near-duplicate embeddings collapsing into ONE cell. Uncapped, this
    // frame built a single aggregation row holding C(3000,2) ≈ 4.5M pair
    // structs; under the cap it must split into ⌈n/cap⌉ md5 sub-blocks,
    // each closing independently (per-block survivors — the declared
    // conservative recall tradeoff, never a wrong-side drop).
    val cap = Semantic.ClosureMemberCap
    val n = 3000
    val rows = (0 until n).map(i =>
      (i.toLong, 0L, Seq(7L, 3L, 0L, 1L), (i % 1000).toLong))
    val m = rows.toDF("vec_id", "cid", "qv", "cscore")
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
    val out = Semantic.semdedupRollup(m, thresholdPpm = 150000L).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L)
    // driver replay of the sub rule (the exact md5 algebra of hashBucket)
    val nsub = (n + cap - 1) / cap
    assert(nsub == 3, s"fixture must exceed the cap: nsub=$nsub")
    def sub(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % nsub
    }
    val blocks = (0 until n).map(_.toLong).groupBy(sub)
    assert(blocks.size == nsub)
    // md5 balance: every closure block is cap-scale, nowhere near C(m,2)
    assert(blocks.values.map(_.size).max <= 2 * cap,
      s"block sizes ${blocks.values.map(_.size)}")
    // identical vectors: each block is ONE transitive group keeping the
    // argmin-(cscore, id) member
    val cs = rows.map(r => r._1 -> r._4).toMap
    val expPairs = blocks.values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val expKept = blocks.values.map(g => g.map(i => (cs(i), i)).min._2).sum
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) ==
      ((n.toLong, expPairs, blocks.size.toLong, (n - blocks.size).toLong,
        expKept)),
      s"got ${r}")
  }

  test("kNN label eval: counts consistent, ppm exact, rank planned as WindowGroupLimit") {
    val df = queries.Semantic.q260(spark, sf)
    val rows = df.collect()
    assert(rows.length == 10) // ten labels in the fixture
    rows.foreach { r =>
      val (nTotal, nEval, nCorrect, acc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nEval <= nTotal && nCorrect <= nEval)
      assert(acc == nCorrect * 1000000L / math.max(nEval, 1L))
    }
    // the rk <= 5 filter must prune map-side, not sort whole cells and drop
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the 5-NN rank to plan as WindowGroupLimit:\n$plan")
  }

  test("medoid coreset matches a driver-side brute-force replay") {
    val q = graft.ann.PortableAnn.quantized(Tables.load(spark, sf, "embeddings"))
    val cents = graft.ann.PortableAnn.ivfTrainInt(q, nClusters = 8, iters = 2)
    val members = queries.Semantic.assignCid(
        q, queries.Semantic.centFrame(spark, cents), carry = Seq("nrm", "qv"))
      .select("cid", "vec_id", "qv", "nrm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val expected = members.groupBy(_._1).map { case (cid, ms) =>
      val best = ms.map { case (_, id, qa, na) =>
        val ssd = ms.filter(_._2 != id).map { case (_, _, qb, nb) =>
          na + nb - 2L * qa.zip(qb).map { case (x, y) => x * y }.sum
        }.sum
        (ssd, id)
      }.min
      cid -> (ms.length.toLong, best._2, best._1)
    }
    val got = queries.Semantic.q261(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
  }

  test("oracle tier arms: exactly one gate fires at every boundary and its k == tierK") {
    // the k=8/k=32 arms are proven by actual DuckDB replays (sf0.001/sf0.01/
    // ×10); what remains falsifiable without a large-corpus oracle run is
    // gate/tier agreement — a desync here would pass the fixture-scale hash
    // gate and only surface at 33k+ vectors (the r12 ADVICE #3 class).
    // Coverage: every boundary of every GENERATED arm (r13 VERDICT #2 made
    // the list programmatic to 2^24 vectors), both sides of each edge.
    val bounds = Semantic.tiers.flatMap { case (_, _, lo, hi) =>
      lo.toSeq.flatMap(l => Seq(l, l + 1)) ++ hi.toSeq.flatMap(h => Seq(h, h + 1))
    }.filter(_ <= 16777216L).distinct
    for (t <- (Seq(1L, 500L, 100000L, 1000000L, 16777216L) ++ bounds)) {
      val firing = Semantic.tiers.filter { case (_, _, lo, hi) =>
        lo.forall(t > _) && hi.forall(t <= _)
      }
      assert(firing.size == 1, s"t=$t fires ${firing.size} arms")
      assert(firing.head._2 == Semantic.tierK(t),
        s"t=$t: arm k=${firing.head._2} != tierK=${Semantic.tierK(t)}")
    }
  }

  test("tierK is open-ended past the oracle arm coverage: k doubles per corpus doubling, expected cluster size pinned at <= 256") {
    // the engine rule has NO cap (r13 VERDICT #2) — beyond the generated
    // arms only the DuckDB replay stops following; the rule itself keeps
    // the within-cluster expectation n/k in (128, 256] forever, which is
    // what bounds the SemDeDup pair fan at n²/k = 256·n (linear) at any
    // corpus size, 10⁹ vectors included
    // loop to 2^38 vectors — the last tier before the (declared) k
    // saturation at 512·2^21 = 2^30 clusters; beyond it a corpus is far
    // outside Int-addressable cluster ids and a different engine regime
    var t = 65536L
    while (t <= (1L << 37)) {
      val kLo = Semantic.tierK(t + 1) // just past a boundary: n/k minimal
      val kHi = Semantic.tierK(2 * t) // at the next boundary: n/k maximal
      assert(kLo == kHi, s"t in (${t}, ${2 * t}] must be one tier")
      assert(Semantic.tierK(2 * t + 1) == 2L * kHi || kHi == (512 << 21),
        s"k must double at t=${2 * t + 1}")
      val expectedMembers = (2 * t) / kHi
      assert(expectedMembers <= 256, s"t=${2 * t}: n/k=$expectedMembers")
      t *= 2
    }
    assert(Semantic.tierK(1000000000L) == (512 << 13), // 10⁹ → k ≈ 4.2M
      s"10⁹ vectors: ${Semantic.tierK(1000000000L)}")
  }

  test("streaming drift mass == batch q259 candidate-snapshot mass") {
    import org.apache.spark.sql.types._
    val embs = Tables.load(spark, sf, "embeddings")
    // frozen model: trained on the reference snapshot (even ids), exactly
    // as batch q259 trains it
    val cents = Semantic.ivfTrainIntJoin(spark,
      PortableAnn.quantized(embs.filter(col("vec_id") % 2 === 0)),
      nClusters = Semantic.tierK(embs.filter(col("vec_id") % 2 === 0).count()))
    // candidate snapshot (odd ids) arrives as 3 file micro-batches
    val odd = PortableAnn.quantized(embs.filter(col("vec_id") % 2 === 1))
    val landing = java.nio.file.Files.createTempDirectory("drift_landing").toString
    odd.withColumn("g", col("vec_id") % 3).repartition(3, col("g")).drop("g")
      .write.mode("overwrite").parquet(landing)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("qv", ArrayType(LongType)), StructField("nrm", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val q = Semantic.driftMassStream(stream, cents).writeStream
      .format("memory").queryName("drift_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("drift_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Semantic.q259(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // (cid, n_b)
      .filter(_._2 > 0L)
    assert(streamed == batch,
      s"stream=$streamed\nbatch=$batch")
  }

  test("recall audit: histogram covers the whole anchor panel in exact fifths") {
    val rows = queries.Semantic.q262(spark, sf).collect()
    val nAnchors = rows.map(_.getLong(1)).sum
    // the fixture has all 64 panel ids present and norm-positive
    assert(nAnchors == 64L, s"expected 64 anchors, got $nAnchors")
    rows.foreach { r =>
      assert(r.getLong(0) % 200000L == 0 && r.getLong(0) <= 1000000L,
        s"recall must be an exact fifth: ${r.getLong(0)}")
    }
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

  test("semdedup_closure kernel: hand-computed closure on the SQL surface; null pairs") {
    // the native replacement for q257's former udf (r16): 5 members where
    // pairs {(1,2),(2,3)} close transitively into {1,2,3} (keep = lowest
    // cscore -> 3, ties impossible here) and {4,5} stays two singletons
    // when the pair list is NULL. Exercised through spark.sql so the
    // extension registration AND the expression (not just the q257 plan)
    // are pinned; the interpreted eval path is checked via the same call
    // under codegen fallback.
    val sqlQ =
      """SELECT r._1 AS groups, r._2 AS dropped, r._3 AS kept FROM (
        |  SELECT semdedup_closure(
        |    array(struct(1L, 90L), struct(2L, 50L), struct(3L, 10L),
        |          struct(4L, 5L), struct(5L, 7L)),
        |    array(struct(1L, 2L), struct(2L, 3L))) AS r)""".stripMargin
    val got = spark.sql(sqlQ).collect().head
    // group {1,2,3}: keep 3 (cscore 10 < 50 < 90), dropped 2; singletons
    // 4 and 5 keep themselves -> kept sum = 3 + 4 + 5
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((1L, 2L, 12L)))
    val nullEs = spark.sql(
      """SELECT r._1, r._2, r._3 FROM (SELECT semdedup_closure(
        |  array(struct(4L, 5L), struct(5L, 7L)),
        |  CAST(NULL AS ARRAY<STRUCT<a: BIGINT, b: BIGINT>>)) AS r)""".stripMargin)
      .collect().head
    assert((nullEs.getLong(0), nullEs.getLong(1), nullEs.getLong(2))
      == ((0L, 0L, 9L)),
      "a null pair array is a block with no edges: all singletons")
  }
}
