package graft

import graft.queries.{Graph, Valuation}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the r16 valuation/distribution family beyond the oracle
  * hash gates: the KNN-Shapley recurrence agrees with BRUTE-FORCE
  * subset-enumeration Shapley on a planted corpus (the definition itself,
  * not a second copy of the recurrence); Wasserstein reproduces
  * hand-computed transports and vanishes on identical distributions;
  * modularity reproduces the hand-computed two-clique value; the conformal
  * rank formula is exactly ⌈0.9·(n+1)⌉; q306's influence replays
  * independently from the raw fixture.
  */
class ValuationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def score(qa: Array[Long], qb: Array[Long]): Long = {
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < qa.length) {
      dot += qa(i) * qb(i); na += qa(i) * qa(i); nb += qb(i) * qb(i); i += 1
    }
    val m = (BigInt(dot) * dot * 1000000 / (BigInt(na) * nb)).toLong
    if (dot >= 0) m else -m
  }

  test("q302 kernel == brute-force subset-enumeration Shapley (planted, ±N ppm)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1 anchor (vec_id 0) + 6 train points, 2-dim integer vectors chosen
    // so no two scores tie; K = 2. The reference value is the DEFINITION:
    // phi_i = sum over subsets S of T\{i} of |S|!(|T|-|S|-1)!/|T|! *
    // (v(S+i) - v(S)), with v(S) = (1/K) * sum of ind over the top-K of S
    // under the SAME (score desc, id asc) order the kernel ranks by.
    val pts = Seq( // (vec_id, label, qv)
      (0L, 1L, Array(100L, 5L)),
      (1L, 1L, Array(95L, 10L)),   // near, right label
      (2L, 2L, Array(90L, 20L)),   // near, wrong label
      (3L, 1L, Array(60L, 80L)),   // far, right label
      (4L, 2L, Array(-40L, 90L)),  // negative side
      (5L, 1L, Array(30L, -95L)),
      (6L, 2L, Array(-100L, -10L)))
    val df = pts.toDF("vec_id", "label", "qv")
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
    val got = Valuation.knnShapley(df, panelMax = 1L, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    val anchor = pts.head
    val train = pts.tail
    // rank train ids by (score desc, id asc) once — subset utilities read
    // prefixes of this order restricted to the subset
    val ranked = train
      .map(p => (p._1, p._2, score(anchor._3, p._3)))
      .sortBy(t => (-t._3, t._1))
    def v(subset: Set[Long]): Double = {
      val top = ranked.filter(t => subset.contains(t._1)).take(2)
      top.count(_._2 == anchor._2).toDouble / 2.0
    }
    def fact(n: Int): Double = (1 to n).product.toDouble
    val ids = train.map(_._1)
    ids.foreach { i =>
      val others = ids.filterNot(_ == i)
      var phi = 0.0
      (0 to others.length).foreach { sz =>
        others.combinations(sz).foreach { s =>
          val w = fact(sz) * fact(ids.length - sz - 1) / fact(ids.length)
          phi += w * (v(s.toSet + i) - v(s.toSet))
        }
      }
      val expect = math.round(phi * 1e6)
      assert(math.abs(got(i) - expect) <= ids.length + 2,
        s"train $i: kernel ${got(i)} vs enumerated $expect " +
          s"(ranking ${ranked.map(_._1).mkString(",")})")
    }
  }

  test("q302 on fixture: panel excluded, train rows complete") {
    val rows = Valuation.q302(spark, sf).collect()
    val nTrain = rows.map(_.getLong(1)).sum
    val nz = graft.ann.PortableAnn.quantized(
      Tables.load(spark, sf, "embeddings")).count()
    val panel = graft.ann.PortableAnn.quantized(
        Tables.load(spark, sf, "embeddings"))
      .filter(org.apache.spark.sql.functions.col("vec_id") < 32).count()
    assert(nTrain == nz - panel,
      "every non-panel nonzero vector must carry a Shapley value")
    rows.foreach(r => assert(r.getLong(5) <= r.getLong(1),
      "negative-valued count cannot exceed the label's train count"))
  }

  test("q307 kernel: one-cell corpus is bit-identical to exact knnShapley") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // with every point in ONE cell the restricted game IS the full game —
    // cellShapley must reproduce knnShapley exactly, not approximately
    val pts = Seq(
      (0L, 1L, Array(100L, 5L)), (1L, 1L, Array(95L, 10L)),
      (2L, 2L, Array(90L, 20L)), (3L, 1L, Array(60L, 80L)),
      (4L, 2L, Array(-40L, 90L)), (5L, 1L, Array(30L, -95L)),
      (6L, 2L, Array(-100L, -10L)))
    val df = pts.toDF("vec_id", "label", "qv")
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
    val exact = Valuation.knnShapley(df, panelMax = 1L, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cell = Valuation.cellShapley(df.withColumn("cid", lit(0L)),
        panelMax = 1L, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cell == exact, s"cell $cell vs exact $exact")
    // two separated cells: a train point in a DIFFERENT cell than the
    // anchor is absent from the candidate frame (q307 reports it as 0)
    val twoCell = Valuation.cellShapley(
        df.withColumn("cid", when(col("vec_id") <= 3, 0L).otherwise(9L)),
        panelMax = 1L, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(twoCell.keySet == Set(1L, 2L, 3L),
      s"only same-cell candidates may carry values: ${twoCell.keySet}")
  }

  test("q302/q307 recurrence: under-K candidate sets match enumeration (review r16)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // N < K makes the game ADDITIVE: every phi_i = ind_i/K exactly. The
    // old last-rank term ind_N/N over-valued the tail K/N-fold here —
    // reachable through q307's cell blocking with a sparse cell.
    val pts = Seq(
      (0L, 1L, Array(100L, 5L)),
      (1L, 1L, Array(95L, 10L)),  // same label: phi = 1/5
      (2L, 2L, Array(90L, 20L)))  // other label: phi = 0
    val df = pts.toDF("vec_id", "label", "qv")
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
    val got = Valuation.knnShapley(df, panelMax = 1L, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 200000L, 2L -> 0L),
      s"N=2 < K=5 must value additively at ind/K: $got")
  }

  test("q307 on fixture: train totality matches q302 row-for-row") {
    val exact = Valuation.q302(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellR = Valuation.q307(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellR == exact,
      "q307's anchorless-cell zero-fill must keep n_train per label " +
        "identical to q302 — the two reports must be directly comparable")
  }

  test("q303 kernel: hand-computed two-point transport; identical dist -> 0") {
    import spark.implicits._
    // A = {0,0}, B = {10,10}; corpus = half at 0, half at 10. Each
    // source's W1 vs the corpus mix is exactly 5 chars = 5_000_000 micro.
    val w = Valuation.wassersteinBySource(
        Seq(("A", 0L), ("A", 0L), ("B", 10L), ("B", 10L)).toDF("source", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w == Map("A" -> 5000000L, "B" -> 5000000L), s"got $w")
    // a source that IS the corpus sits at distance zero
    val z = Valuation.wassersteinBySource(
        Seq(("S", 3L), ("S", 7L), ("S", 7L), ("S", 40L)).toDF("source", "v"))
      .collect()
    assert(z.length == 1 && z.head.getLong(2) == 0L,
      "W1(corpus, corpus) must be exactly 0")
  }

  test("q303 metric laws: translation invariance, scale equivariance, symmetry of mass") {
    import spark.implicits._
    // W1 is a transport COST: shifting every value by a constant changes
    // nothing (the coupling moves with the grid), and scaling the axis by
    // c scales the cost by exactly c (Δx terms scale; counts don't).
    // One planted two-source corpus, three transformed replays.
    def w1(of: Seq[(String, Long)]): Map[String, Long] =
      Valuation.wassersteinBySource(of.toDF("source", "v"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val base = Seq(("A", 3L), ("A", 9L), ("A", 9L), ("B", 12L), ("B", 30L),
      ("B", 3L), ("A", 30L), ("B", 9L), ("B", 9L))
    val w0 = w1(base)
    assert(w1(base.map { case (s, v) => (s, v + 1000L) }) == w0,
      "translation must not change the transport cost")
    val w7 = w1(base.map { case (s, v) => (s, v * 7L) })
    w0.foreach { case (s, x) =>
      // floor(7Y) lands in [7*floor(Y), 7*floor(Y)+6] — the single final
      // floor is the only source of slack in the fixed point
      assert(w7(s) >= 7L * x && w7(s) <= 7L * x + 6L,
        s"scaling the axis by 7 must scale W1 by 7 up to the final " +
          s"floor: source $s got ${w7(s)} vs base $x")
    }
    // two sources that are value-wise mirror images of each other around
    // the corpus mix sit at the SAME distance from it
    val sym = Seq(("L", 0L), ("L", 0L), ("R", 10L), ("R", 10L))
    val ws = w1(sym)
    assert(ws("L") == ws("R"), s"mirror sources must be equidistant: $ws")
  }

  test("q304 conformal rank formula is ceil(0.9*(n+1)); fixture coverage sane") {
    (1 to 200).foreach { n =>
      val k = (Valuation.ConfNum * (n + 1) + Valuation.ConfDen - 1) /
        Valuation.ConfDen
      assert(k == math.ceil(0.9 * (n + 1)).toInt, s"n=$n")
    }
    val rows = Valuation.q304(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getLong(5)
      assert(cov >= 500000L && cov <= 1000000L,
        s"${r.getString(0)}: coverage $cov outside sanity band — split " +
          "conformal guarantees >=90% in expectation; far below means the " +
          "residual/threshold algebra broke")
      assert(r.getLong(4) <= r.getLong(3), "covered cannot exceed tested")
    }
  }

  test("q305 kernel: hand-computed two-clique modularity") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4, unit weights.
    // m2 = 14; per clique: intra2 = 6, d_c = 7 =>
    // Q = 2*(floor(6e6/14) - floor(49e6/196)) = 2*(428571 - 250000) = 357142.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
        (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
      .withColumn("wt", org.apache.spark.sql.functions.lit(1L))
    val und = edges.select("src", "dst", "wt").toDF("node", "nbr", "wt")
      .union(edges.select("dst", "src", "wt").toDF("node", "nbr", "wt"))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "lbl")
    val r = Graph.modularityRollup(und, labels).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((6L, 2L, 14L, 357142L, 3L)),
      s"got $r")
    // degenerate partition: everything in ONE community -> Q = 1e6*intra/m2
    // - 1e6 exactly (= 0 in ppm up to the two declared floors)
    val one = Graph.modularityRollup(und,
      labels.select(org.apache.spark.sql.functions.col("node"),
        org.apache.spark.sql.functions.lit(0L).as("lbl")))
      .collect().head
    assert(one.getLong(3) == 0L,
      "the all-in-one partition has modularity exactly 0")
  }

  test("q306 replays independently from the raw fixture") {
    val emb = Tables.load(spark, sf, "embeddings").collect()
      .map(r => (r.getAs[Int]("label").toLong,
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1000).toLong).toArray))
    val dims = emb.head._2.length
    val byLabel = emb.groupBy(_._1)
    val sG = Array.tabulate(dims)(d => emb.map(_._2(d)).sum)
    val nG = emb.length.toLong
    val expect = byLabel.map { case (l, vs) =>
      val sL = Array.tabulate(dims)(d => vs.map(_._2(d)).sum)
      val nL = vs.length.toLong
      val inf = (0 until dims).map { d =>
        val dd = sG(d) / nG - (sG(d) - sL(d)) / (nG - nL)
        dd * dd
      }.sum
      l -> (nL, inf)
    }
    val got = Valuation.q306(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"got $got\nexpect $expect")
  }
}
