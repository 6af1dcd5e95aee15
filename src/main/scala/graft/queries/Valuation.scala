package graft.queries

import graft.Tables
import graft.ann.PortableAnn
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Data valuation & distributional audit — the round-16 family: which
  * training points, labels, and sources HELP, and whether the corpus a
  * model sees matches the corpus it was promised. The reference's audit
  * stage (`Project Plan6.md:154-163` — row-count reconciliation after
  * load) asks "did everything arrive?"; these ask the training-data
  * version of the question: "is what arrived worth training on?".
  *
  *   - q302 exact KNN-Shapley data valuation (Jia et al., PVLDB 2019) —
  *     the per-training-point contribution to a KNN proxy model, the
  *     principled "which rows should I drop" signal.
  *   - q303 1-D Wasserstein (earth-mover) drift per source — the
  *     integral-of-CDF-gap companion to q142's sup-norm KS and q190's
  *     vocabulary TV: detects mass shifted a long way, which a sup norm
  *     underweights.
  *   - q304 split-conformal coverage (Vovk's conformal prediction;
  *     Lei et al., JASA 2018) — distribution-free interval calibration of
  *     an in-engine regression, per source (Mondrian groups).
  *   - q306 leave-one-label-out centroid influence — the group-level
  *     valuation twin of q302 (which label's mass pulls the global
  *     embedding mean hardest), the jackknife (q156) pointed at the
  *     representation instead of accuracy.
  *
  * All algebra is the portable integer discipline: md5 splits, ×100/×1000
  * quantization, floor-division ppm fixed points — every query hash-gated
  * against the DuckDB oracle.
  */
object Valuation {

  /** Shapley K: neighbors the KNN proxy model votes with (the q235/q125
    * family's k=5). */
  private[graft] val ShapK = 5

  /** Test-panel bound: `vec_id < 32` is the probe set valued against (the
    * q243/q262 anchor-panel pattern — present at every fixture scale,
    * parameter-sized so the fan stays panel × corpus, never corpus²). */
  private[graft] val ShapPanel = 32

  /** The exact-KNN-Shapley kernel over a quantized labeled frame
    * (`vec_id`, `label`, `qv`, `nrm`), factored for the spec's planted
    * replay. Per test point (the `vec_id < panelMax` panel), train points
    * (the rest) are ranked by the signed cos²-ppm kernel (nearest first,
    * ties → smaller id), and each gets the Jia et al. 2019 closed-form
    * Shapley value of the K-NN utility v(S) = (1/K)·Σ_{j∈topK(S)} 1[y_j =
    * y_test], evaluated by the O(N) recurrence
    *
    *   s_N = ind_N / max(K, N),   s_i = s_{i+1} + (ind_i − ind_{i+1}) / max(K, i)
    *
    * in ppm fixed point: every term is (±1|0)·⌊10⁶ / max(K,i)⌋ (the
    * positive quotient computed first, sign applied after — the q218
    * discipline), and s_i is the suffix sum of terms — one descending-rank
    * running window, no recursion. Floors inside the sum are the declared
    * algebra (both engines replay them); a term at rank i > 10⁶ is
    * EXACTLY zero in this fixed point, so values naturally vanish beyond
    * the first million neighbors.
    *
    * Returns one row per (train point valued over the whole panel):
    * `id_b`, `label`, `v` (Σ over panel of s_i, ppm). */
  private[graft] def knnShapley(labeled: DataFrame, panelMax: Long,
      k: Int): DataFrame = {
    val anch = labeled.filter(col("vec_id") < panelMax)
      .select(col("vec_id").as("id_a"), col("label").as("la"),
        col("qv").as("qa"), col("nrm").as("na"))
    val trn = labeled.filter(col("vec_id") >= panelMax)
      .select(col("vec_id").as("id_b"), col("label").as("lb"),
        col("qv").as("qb"), col("nrm").as("nb"))
    // panel × corpus fan: the panel side is parameter-sized BY CONSTRUCTION
    // — broadcast it explicitly so the plan is a BroadcastNestedLoopJoin,
    // never a shuffled cartesian (the r16 sweep contract)
    shapleyFromScored(trn.crossJoin(broadcast(anch))
      .withColumn("dot", call_function("dot_i64", col("qa"), col("qb")))
      .withColumn("s", PortableAnn.cosPpmScore("dot", "na", "nb"))
      .select("id_a", "la", "id_b", "lb", "s"), k)
  }

  /** The shared recurrence stage over a scored candidate frame (`id_a`,
    * `la`, `id_b`, `lb`, `s`): rank per test (s DESC, id_b), ppm-floored
    * terms, one descending-rank suffix-sum window, per-point value summed
    * over the panel. N is each test point's OWN candidate count — the
    * full corpus under [[knnShapley]], the test point's cell under
    * [[cellShapley]] (the restricted game's recurrence is identical). */
  private def shapleyFromScored(scored: DataFrame, k: Int): DataFrame = {
    val byTest = Window.partitionBy("id_a")
    scored
      .withColumn("rk", row_number().over(byTest.orderBy(desc("s"), col("id_b"))))
      .withColumn("n", count(lit(1)).over(byTest))
      .withColumn("ind", when(col("lb") === col("la"), 1L).otherwise(0L))
      .withColumn("ind_next", lead("ind", 1).over(byTest.orderBy("rk")))
      // the last-rank base term divides by max(K, N), not N (review
      // finding r16): for N < K the utility still divides by K — the game
      // is additive and every φ_i = ind_i/K; s_N = ind_N/N over-values the
      // tail point K/N-fold in an under-K cell (reachable via q307's cell
      // blocking; invisible to the hash gate since both engines replay the
      // algebra). max(K,N) unifies both regimes — for N ≥ K it IS Jia et
      // al.'s ind_N/N.
      .withColumn("term", when(col("ind_next").isNull,
          col("ind") *
            expr(s"1000000 div (CASE WHEN n < $k THEN $k ELSE n END)"))
        .otherwise((col("ind") - col("ind_next")) *
          expr(s"1000000 div (CASE WHEN rk < $k THEN $k ELSE rk END)")))
      .withColumn("shap_ppm", sum("term").over(byTest.orderBy(desc("rk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id_b"), col("lb").as("label"))
      .agg(sum("shap_ppm").as("v"))
  }

  /** The CELL-BLOCKED Shapley kernel over a cid-carrying quantized labeled
    * frame (`vec_id`, `cid`, `label`, `qv`, `nrm`): candidates join on the
    * cluster id instead of fanning the whole corpus, and the recurrence
    * runs over each test point's CELL ranking — the Shapley values of the
    * RESTRICTED game whose utility sees only same-cell neighbors. On a
    * one-cell corpus this is bit-identical to [[knnShapley]]
    * (spec-pinned); across cells it is the declared approximation whose
    * candidate-recall q262 prices for the same tiered model. */
  private[graft] def cellShapley(withCid: DataFrame, panelMax: Long,
      k: Int): DataFrame = {
    val anch = withCid.filter(col("vec_id") < panelMax)
      .select(col("cid"), col("vec_id").as("id_a"), col("label").as("la"),
        col("qv").as("qa"), col("nrm").as("na"))
    val trn = withCid.filter(col("vec_id") >= panelMax)
      .select(col("cid"), col("vec_id").as("id_b"), col("label").as("lb"),
        col("qv").as("qb"), col("nrm").as("nb"))
    shapleyFromScored(trn.join(broadcast(anch), Seq("cid"))
      .withColumn("dot", call_function("dot_i64", col("qa"), col("qb")))
      .withColumn("s", PortableAnn.cosPpmScore("dot", "na", "nb"))
      .select("id_a", "la", "id_b", "lb", "s"), k)
  }

  /** q307 cell-blocked KNN-Shapley — q302's measured-flat scale path (the
    * q110 → ANN-family structure applied to valuation): train points are
    * valued within their tiered-k-means cell only (the q257/q262/q266
    * frozen corpus model — engine reuses [[Semantic.assignCid]], oracle
    * replays the identical tiered training CTEs), so each test point
    * ranks an expected-n/k cell instead of the corpus, and train points
    * in anchorless cells carry value 0 EXPLICITLY (reported, not
    * dropped — the rollup's n_train stays the whole train corpus, so
    * q307 and q302 rows are directly comparable). The restriction is the
    * declared trade: values beyond the cell boundary are truncated to 0,
    * exactly the mass whose smallness the q262 cell-recall histogram
    * measures for the same model.
    *
    * Scale shape — the trade MEASURED, not assumed (SCALING_r16): one
    * broadcast-model assignment fan (n·k compares, shuffle corpus-narrow
    * — the [[Semantic.assignCid]] contract), candidates cell-equi-joined
    * (∝ n·panel/k), ranking windows over CELL-BOUNDED partitions. Two
    * things get cheaper than q302: the sort (no corpus-sized window
    * partition anywhere — q302's per-anchor full ranking is the
    * single-partition-shaped cost that breaks first at 100 TB) and the
    * panel dependence (the n·k assignment is panel-free and shared with
    * the whole q257/q258/q266 tiered-model family, where q302 scales
    * ×panel). One thing gets MORE expensive: at the fixture's panel=32
    * with tierK > 32, the n·k fan exceeds q302's 32·n fan — at ×64 q307
    * measures 4.4 s vs q302's 3.0 s. Cell blocking wins when the panel
    * outgrows k or the model is already paid for; the honest crossover is
    * recorded in SCALING_r16.json. */
  def q307(spark: SparkSession, dir: String): DataFrame = {
    val cents = Semantic.corpusModel(spark, dir)
    // the n·k assignment fan is the dominant term (see scale note below) —
    // scratch it so the cellShapley leg and the zero-fill base read ONE
    // materialization instead of fanning twice (review finding r16)
    val asg = graft.operators.Checkpoints.scratch(
      Semantic.assignCid(labeledQuantized(spark, dir),
          Semantic.centFrame(spark, cents), carry = Seq("label", "qv", "nrm"))
        .select("vec_id", "cid", "label", "qv", "nrm"))
    val vals = cellShapley(asg, ShapPanel, ShapK)
    asg.filter(col("vec_id") >= ShapPanel)
      .select(col("vec_id").as("id_b"), col("label"))
      .join(vals.select("id_b", "v"), Seq("id_b"), "left")
      .na.fill(0L, Seq("v"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_train"),
        sum("v").as("sum_shap_ppm"),
        min("v").as("min_shap_ppm"),
        max("v").as("max_shap_ppm"),
        sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_negative"))
      .orderBy("label")
  }

  val q307Sql: String =
    s"""WITH ${Extensions.portableQuantCte},
      |${Semantic.tieredModelSqlForOracle}, lab AS (
      |  SELECT a.vec_id, a.cid, a.nrm, x.qv, CAST(e.label AS BIGINT) AS label
      |  FROM asg a
      |  JOIN n x ON x.vec_id = a.vec_id
      |  JOIN embeddings e ON e.vec_id = a.vec_id
      |), anch AS (
      |  SELECT cid, vec_id AS id_a, label AS la, qv AS qa, nrm AS na
      |  FROM lab WHERE vec_id < $ShapPanel
      |), trn AS (
      |  SELECT cid, vec_id AS id_b, label AS lb, qv AS qb, nrm AS nb
      |  FROM lab WHERE vec_id >= $ShapPanel
      |), sc AS (
      |  SELECT id_a, la, id_b, lb,
      |    CASE WHEN dot >= 0 THEN dot * dot * 1000000 // (na * nb)
      |         ELSE -(dot * dot * 1000000 // (na * nb)) END AS s
      |  FROM (
      |    SELECT a.id_a, a.la, b.id_b, b.lb, a.na, b.nb,
      |      CAST(list_sum(list_transform(range(1, len(a.qa) + 1),
      |        i -> a.qa[i] * b.qb[i])) AS BIGINT) AS dot
      |    FROM anch a JOIN trn b ON b.cid = a.cid) t
      |), rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY s DESC, id_b) AS rk,
      |    COUNT(*) OVER (PARTITION BY id_a) AS n,
      |    CASE WHEN la = lb THEN 1 ELSE 0 END AS ind
      |  FROM sc
      |), tm AS (
      |  SELECT id_a, id_b, lb, rk,
      |    CASE WHEN ind_next IS NULL THEN ind *
      |           (1000000 // (CASE WHEN n < $ShapK THEN $ShapK ELSE n END))
      |         ELSE (ind - ind_next) *
      |           (1000000 // (CASE WHEN rk < $ShapK THEN $ShapK ELSE rk END)) END AS term
      |  FROM (SELECT *, LEAD(ind) OVER (PARTITION BY id_a ORDER BY rk) AS ind_next
      |        FROM rk) t
      |), sv AS (
      |  SELECT id_a, id_b, lb,
      |    CAST(SUM(term) OVER (PARTITION BY id_a ORDER BY rk DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shap_ppm
      |  FROM tm
      |), pt AS (
      |  SELECT id_b, CAST(SUM(shap_ppm) AS BIGINT) AS v FROM sv GROUP BY 1
      |), fullv AS (
      |  SELECT t.id_b, t.lb AS label, COALESCE(p.v, 0) AS v
      |  FROM trn t LEFT JOIN pt p ON p.id_b = t.id_b
      |)
      |SELECT label, COUNT(*) AS n_train,
      |  CAST(SUM(v) AS BIGINT) AS sum_shap_ppm,
      |  CAST(MIN(v) AS BIGINT) AS min_shap_ppm,
      |  CAST(MAX(v) AS BIGINT) AS max_shap_ppm,
      |  CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
      |FROM fullv GROUP BY label ORDER BY label""".stripMargin

  /** q302 exact KNN-Shapley data valuation (Jia et al., "Efficient
    * task-specific data valuation for nearest neighbor algorithms",
    * PVLDB 2019) — every training embedding's exact Shapley contribution
    * to a 5-NN classifier's accuracy on the 32-point probe panel, rolled
    * up per label: train count, total/min/max value, and the NEGATIVE
    * count — points that HURT the proxy model, the principled noise-
    * suspect list (q235's agreement heuristic with game-theoretic
    * weights). The per-label sums pin every individual value under the
    * hash gate.
    *
    * Scale shape: the fan is panel × corpus (32·N — linear, the q125
    * batch contract); the ranking windows partition by test point, so
    * each of the 32 partitions holds one corpus ranking — the honest cost
    * of EXACT Shapley (the utility depends on the full neighbor order).
    * At 100 TB the declared cheap alternatives are the q235/q260 top-k
    * label evals (no full ranking) or Shapley within an IVF cell (the
    * q262 trade); this query is the gold standard they are judged
    * against, the q110 role. All windows are panel-keyed — never
    * single-partition. */
  def q302(spark: SparkSession, dir: String): DataFrame =
    knnShapley(labeledQuantized(spark, dir), ShapPanel, ShapK)
      .groupBy("label")
      .agg(count(lit(1)).as("n_train"),
        sum("v").as("sum_shap_ppm"),
        min("v").as("min_shap_ppm"),
        max("v").as("max_shap_ppm"),
        sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_negative"))
      .orderBy("label")

  /** The labeled ×100-quantized frame (zero-norm vectors dropped in BOTH
    * engines before panel/train assignment) — quantization rides
    * [[PortableAnn.qvExpr]], the declared single home of the ×100 rule,
    * not a re-inlined copy (review finding r16: a second copy desyncs
    * silently if the rule ever changes). */
  private def labeledQuantized(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        PortableAnn.qvExpr(col("embedding")).as("qv"))
      .withColumn("nrm", call_function("dot_i64", col("qv"), col("qv")))
      .filter(col("nrm") > 0)

  val q302Sql: String =
    s"""WITH q AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qv
      |  FROM embeddings
      |), n0 AS (
      |  SELECT vec_id, label, qv,
      |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
      |  FROM q
      |), nz AS (SELECT * FROM n0 WHERE nrm > 0
      |), anch AS (
      |  SELECT vec_id AS id_a, label AS la, qv AS qa, nrm AS na
      |  FROM nz WHERE vec_id < $ShapPanel
      |), trn AS (
      |  SELECT vec_id AS id_b, label AS lb, qv AS qb, nrm AS nb
      |  FROM nz WHERE vec_id >= $ShapPanel
      |), sc AS (
      |  SELECT id_a, la, id_b, lb,
      |    CASE WHEN dot >= 0 THEN dot * dot * 1000000 // (na * nb)
      |         ELSE -(dot * dot * 1000000 // (na * nb)) END AS s
      |  FROM (
      |    SELECT a.id_a, a.la, b.id_b, b.lb, a.na, b.nb,
      |      CAST(list_sum(list_transform(range(1, len(a.qa) + 1),
      |        i -> a.qa[i] * b.qb[i])) AS BIGINT) AS dot
      |    FROM anch a CROSS JOIN trn b) t
      |), rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY s DESC, id_b) AS rk,
      |    COUNT(*) OVER (PARTITION BY id_a) AS n,
      |    CASE WHEN la = lb THEN 1 ELSE 0 END AS ind
      |  FROM sc
      |), tm AS (
      |  SELECT id_a, id_b, lb, rk,
      |    CASE WHEN ind_next IS NULL THEN ind *
      |           (1000000 // (CASE WHEN n < $ShapK THEN $ShapK ELSE n END))
      |         ELSE (ind - ind_next) *
      |           (1000000 // (CASE WHEN rk < $ShapK THEN $ShapK ELSE rk END)) END AS term
      |  FROM (SELECT *, LEAD(ind) OVER (PARTITION BY id_a ORDER BY rk) AS ind_next
      |        FROM rk) t
      |), sv AS (
      |  SELECT id_a, id_b, lb,
      |    CAST(SUM(term) OVER (PARTITION BY id_a ORDER BY rk DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shap_ppm
      |  FROM tm
      |), pt AS (
      |  SELECT id_b, lb AS label, CAST(SUM(shap_ppm) AS BIGINT) AS v
      |  FROM sv GROUP BY 1, 2
      |)
      |SELECT label, COUNT(*) AS n_train,
      |  CAST(SUM(v) AS BIGINT) AS sum_shap_ppm,
      |  CAST(MIN(v) AS BIGINT) AS min_shap_ppm,
      |  CAST(MAX(v) AS BIGINT) AS max_shap_ppm,
      |  CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
      |FROM pt GROUP BY label ORDER BY label""".stripMargin

  /** The 1-D Wasserstein kernel over a (`source`, `v`) long frame,
    * factored for the spec's planted replay: for each source,
    * W1(source, corpus) = ∫ |F_s − F_g| dx evaluated EXACTLY on the
    * merged support (every source's values are a subset of the corpus
    * support, so the corpus value grid IS the merged grid):
    *
    *   W1·10⁶ = ⌊ Σ_k |cum_s(k)·n_g − cum_g(k)·n_s| · Δx_k · 10⁶
    *              / (n_s·n_g) ⌋
    *
    * — integer cross-multiplied CDF gaps (no rational CDFs), one floor at
    * the very end. The Σ rides decimal(38,0)/HUGEINT (the q290/q284
    * discipline: gap ≤ n_s·n_g ≈ n², times Δx, times |grid| overflows
    * int64 at corpus scale while DuckDB raises). Returns (`source`,
    * `n_docs`, `w1_micro`). */
  private[graft] def wassersteinBySource(values: DataFrame): DataFrame =
    wassersteinFromCells(
      values.groupBy("source", "v").agg(count(lit(1)).as("c_sv")))

  /** [[wassersteinBySource]] from a pre-aggregated (source, v, c_sv) CELL
    * frame — the histogram cells are the mergeable object the streaming
    * leg persists ([[w1Stream]]), so W1 assembles merge-on-read without a
    * corpus rescan (the q299 count-digest algebra on the value axis). */
  private[graft] def wassersteinFromCells(cell: DataFrame): DataFrame = {
    val srcTot = cell.groupBy("source").agg(sum("c_sv").as("n_s"))
    val gv = cell.groupBy("v").agg(sum("c_sv").as("c_v"))
    val tot = cell.agg(sum("c_sv").as("n_g"))
    val bySrc = Window.partitionBy("source").orderBy("v")
    // grid = corpus support × sources (|values|·|sources| — value-domain
    // bounded); the |sources|-row totals and the 1-row grand total are
    // parameter frames, broadcast explicitly
    gv.crossJoin(broadcast(srcTot))
      .join(cell, Seq("source", "v"), "left").na.fill(0L, Seq("c_sv"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_s", sum("c_sv").over(bySrc))
      .withColumn("cum_g", sum("c_v").over(bySrc))
      .withColumn("dx", lead("v", 1).over(bySrc) - col("v"))
      .filter(col("dx").isNotNull)
      // the decimal cast must wrap the cum·n PRODUCTS, not a gap already
      // computed in int64 (review finding r16): cum_s·n_g ≤ n_s·n_g wraps
      // int64 near 10¹⁰ docs while the oracle's window SUM(BIGINT) is
      // HUGEINT from the start — the q290 rule applies to every factor
      .withColumn("gap", abs(expr(
        "cast(cum_s as decimal(38,0)) * n_g - cast(cum_g as decimal(38,0)) * n_s")))
      .groupBy("source")
      .agg(max("n_s").as("n_docs"),
        expr("cast(sum(gap * dx) * 1000000" +
          " div (cast(max(n_s) as decimal(38,0)) * max(n_g)) as bigint)")
          .as("w1_micro"))
      .orderBy("source")
  }

  /** q303 earth-mover (Wasserstein-1) drift per source — how far each
    * source's document-length distribution sits from the corpus mix, in
    * EXPECTED CHARACTERS MOVED (×10⁻⁶). The integral-of-CDF-gap
    * companion to q142's Kolmogorov–Smirnov sup norm: KS sees the worst
    * single quantile, W1 integrates displacement — a source whose lengths
    * are uniformly shifted 50 chars scores 50·10⁶ here while KS may stay
    * small, and that distinction decides whether a curation fix is a
    * threshold (KS spike) or a re-weighting (W1 mass).
    *
    * Scale shape: one map-combined (source, value) aggregate collapses
    * the corpus; everything after runs on the |sources|·|support| grid
    * (value-domain bounded — n_chars; the q140 bounded-domain contract),
    * with source-keyed windows, never single-partition. */
  def q303(spark: SparkSession, dir: String): DataFrame =
    wassersteinBySource(
      Tables.parallelized(Tables.load(spark, dir, "documents"))
        .select(col("source"), col("n_chars").as("v")))

  val q303Sql: String =
    """WITH cell AS (
      |  SELECT source, n_chars AS v, COUNT(*) AS c_sv
      |  FROM documents GROUP BY 1, 2
      |), st AS (SELECT source, CAST(SUM(c_sv) AS BIGINT) AS n_s FROM cell GROUP BY 1
      |), gv AS (SELECT v, CAST(SUM(c_sv) AS BIGINT) AS c_v FROM cell GROUP BY 1
      |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_g FROM documents
      |), grid AS (
      |  SELECT st.source, gv.v, st.n_s, gv.c_v, COALESCE(c.c_sv, 0) AS c_sv
      |  FROM gv CROSS JOIN st
      |  LEFT JOIN cell c ON c.source = st.source AND c.v = gv.v
      |), g2 AS (
      |  SELECT source, n_s,
      |    SUM(c_sv) OVER (PARTITION BY source ORDER BY v) AS cum_s,
      |    SUM(c_v) OVER (PARTITION BY source ORDER BY v) AS cum_g,
      |    LEAD(v) OVER (PARTITION BY source ORDER BY v) - v AS dx
      |  FROM grid
      |)
      |SELECT source, MAX(n_s) AS n_docs,
      |  CAST(SUM(CAST(ABS(cum_s * (SELECT n_g FROM tot) - cum_g * n_s) AS HUGEINT) * dx)
      |    * 1000000 // (MAX(n_s) * (SELECT n_g FROM tot)) AS BIGINT) AS w1_micro
      |FROM g2 WHERE dx IS NOT NULL
      |GROUP BY source ORDER BY source""".stripMargin

  /** STREAMING leg of q303 (the q299 LSM discipline on the value axis):
    * the stream appends per-batch (source, v) COUNT cell digests — the
    * length histogram is the mergeable object (order-free sums across
    * batches, replay-idempotent by batch-dir overwrite) — and the W1
    * drift assembles merge-on-read from the merged cells
    * ([[w1ReadMerged]]), so a reader never rescans documents. The corpus
    * CDF recomputes from the merged cells too, which is why the cell (not
    * any per-source W1 number) is the persisted object: every batch
    * shifts BOTH sides of the distance. */
  def w1Stream(spark: SparkSession, docStream: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.select(col("source"), col("n_chars").as("v"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.toDF().groupBy("source", "v").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  /** Assemble the q303 drift audit from persisted cell digests (glob paths
    * welcome). Cells for the same (source, value) across batches SUM
    * exactly. */
  def w1ReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    wassersteinFromCells(dirs.map(d => spark.read.parquet(d))
      .reduce(_ unionByName _)
      .groupBy("source", "v").agg(sum("n").as("c_sv")))

  /** Conformal miscoverage: 1 − α = 90% target. */
  private[graft] val ConfNum = 9
  private[graft] val ConfDen = 10

  /** q304 split-conformal coverage audit (Vovk et al.; Lei et al., JASA
    * 2018 split conformal; per-group = Mondrian conformal) — the
    * distribution-free calibration check of an IN-ENGINE model: fit the
    * q126 closed-form OLS (token count from n_chars) on the md5 quarter
    * of the corpus (bucket 0 of 4 — the q44/q54 split primitive), take
    * each source's conformal quantile q̂ = the ⌈(n_cal+1)·0.9⌉-th
    * smallest calibration residual, and report the held-out coverage of
    * ŷ ± q̂ per source. Split conformal GUARANTEES ≥ 90% marginal
    * coverage under exchangeability — a source whose empirical coverage
    * lands far below is a distribution break between its calibration and
    * test halves, the drift alarm with a finite-sample guarantee attached.
    *
    * Integer discipline: the OLS sufficient statistics ride
    * decimal(38,0)/HUGEINT products (n·Σxy − Σx·Σy overflows int64 at
    * corpus scale — the q290 rule); slope/intercept are ×10³ fixed
    * points (intercept sign-decomposed, the q218 rule); residuals are
    * exact |y·10³ − (a + b·x)|. The conformal rank needs NO global sort:
    * residuals are grouped by VALUE (domain ⊆ the (n_chars, tokens) pair
    * domain — length-capped, bounded by construction) and q̂ read off a
    * source-keyed cumulative window (the q108 exact-percentile shape).
    *
    * Scale shape: two corpus scans (fit sums, residuals), one 1-row model
    * broadcast, value-grouped per-source windows — never
    * single-partition. */
  def q304(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("n_chars").as("x"),
        T.tokenCount(col("text")).cast(LongType).as("y"))
      .withColumn("cal", T.hashBucket(col("doc_id"), 4) === 0)
    val fit = d.filter(col("cal")).agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
      .withColumn("b_x1e3", expr(
        "cast((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)" +
          " * 1000 div (cast(n as decimal(38,0)) * sxx" +
          " - cast(sx as decimal(38,0)) * sx) as bigint)"))
      .withColumn("a_x1e3", expr(
        "CASE WHEN cast(sy as decimal(38,0)) * 1000 - cast(b_x1e3 as decimal(38,0)) * sx >= 0" +
          " THEN cast((cast(sy as decimal(38,0)) * 1000" +
          "   - cast(b_x1e3 as decimal(38,0)) * sx) div n as bigint)" +
          " ELSE -cast((cast(b_x1e3 as decimal(38,0)) * sx" +
          "   - cast(sy as decimal(38,0)) * 1000) div n as bigint) END"))
      .select("a_x1e3", "b_x1e3")
    val scored = d.crossJoin(broadcast(fit))
      .withColumn("r", abs(col("y") * 1000 - (col("a_x1e3") + col("b_x1e3") * col("x"))))
    val bySrc = Window.partitionBy("source").orderBy("r")
    val qhat = scored.filter(col("cal"))
      .groupBy("source", "r").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(bySrc))
      .withColumn("n_cal", sum("c").over(Window.partitionBy("source")))
      .groupBy("source").agg(
        max("n_cal").as("n_cal"),
        min(when(col("cum") >=
          expr(s"($ConfNum * (n_cal + 1) + ${ConfDen - 1}) div $ConfDen"),
          col("r"))).as("q_hat_x1e3"))
    // LEFT join: a source whose md5 calibration quarter is EMPTY must still
    // appear in the audit (n_cal 0, q̂ NULL → the trivial cover-all
    // interval), not silently vanish — the sources most exposed to drift
    // blind spots are exactly the ones a reader must see (review finding
    // r16)
    scored.filter(!col("cal")).select("source", "r")
      .join(broadcast(qhat), Seq("source"), "left")
      .groupBy("source").agg(
        coalesce(max("n_cal"), lit(0L)).as("n_cal"),
        max("q_hat_x1e3").as("q_hat_x1e3"),
        count(lit(1)).as("n_test"),
        sum(when(col("q_hat_x1e3").isNull || col("r") <= col("q_hat_x1e3"),
          1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage_ppm", expr("n_covered * 1000000 div n_test"))
      .orderBy("source")
  }

  val q304Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id, source, n_chars AS x,
      |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS y,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 4 = 0 AS cal
      |  FROM documents
      |), s AS (
      |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM d WHERE cal
      |), fit0 AS (
      |  SELECT n, sx, sy,
      |    CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
      |      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS b_x1e3
      |  FROM s
      |), fit AS (
      |  SELECT b_x1e3,
      |    CASE WHEN CAST(sy AS HUGEINT) * 1000 - CAST(b_x1e3 AS HUGEINT) * sx >= 0
      |      THEN CAST((CAST(sy AS HUGEINT) * 1000 - CAST(b_x1e3 AS HUGEINT) * sx) // n AS BIGINT)
      |      ELSE -CAST((CAST(b_x1e3 AS HUGEINT) * sx - CAST(sy AS HUGEINT) * 1000) // n AS BIGINT)
      |    END AS a_x1e3
      |  FROM fit0
      |), r AS (
      |  SELECT d.source, d.cal,
      |    ABS(d.y * 1000 - ((SELECT a_x1e3 FROM fit) + (SELECT b_x1e3 FROM fit) * d.x)) AS r
      |  FROM d
      |), cc AS (
      |  SELECT source, r, COUNT(*) AS c FROM r WHERE cal GROUP BY 1, 2
      |), cw AS (
      |  SELECT source, r,
      |    SUM(c) OVER (PARTITION BY source ORDER BY r) AS cum,
      |    SUM(c) OVER (PARTITION BY source) AS n_cal
      |  FROM cc
      |), qh AS (
      |  SELECT source, MAX(n_cal) AS n_cal,
      |    MIN(CASE WHEN cum >= ($ConfNum * (n_cal + 1) + ${ConfDen - 1}) // $ConfDen
      |        THEN r END) AS q_hat_x1e3
      |  FROM cw GROUP BY source
      |)
      |SELECT r.source, CAST(COALESCE(MAX(qh.n_cal), 0) AS BIGINT) AS n_cal,
      |  CAST(MAX(qh.q_hat_x1e3) AS BIGINT) AS q_hat_x1e3,
      |  COUNT(*) AS n_test,
      |  CAST(SUM(CASE WHEN qh.q_hat_x1e3 IS NULL OR r.r <= qh.q_hat_x1e3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |  CAST(SUM(CASE WHEN qh.q_hat_x1e3 IS NULL OR r.r <= qh.q_hat_x1e3
      |    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
      |FROM r LEFT JOIN qh ON qh.source = r.source
      |WHERE NOT r.cal
      |GROUP BY r.source ORDER BY r.source""".stripMargin

  /** q306 leave-one-label-out centroid influence — the GROUP-level data
    * valuation next to q302's per-point values: for each label ℓ, the
    * exact squared shift of the global embedding centroid when ℓ's
    * vectors are removed, ‖c_global − c_−ℓ‖² in ×1000-quantized integer
    * units (the q151 centroid algebra: truncated-division means, exact
    * integer squares). The label whose removal moves the mean hardest
    * dominates the representation — over-represented mass a q139/q281
    * mixture reweights, or the first suspect when a probe's geometry
    * looks skewed. The jackknife (q156) pointed at the representation
    * instead of a metric.
    *
    * Scale shape: ONE corpus-collapsing posexplode aggregate to
    * (label, dim) sums (the q112/q151 shape — mergeable (Σ, n) pairs);
    * everything after is |labels|·|dims| algebra with the |dims|-row
    * global frame broadcast. */
  def q306(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .select(col("label").cast(LongType).as("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType)))
          .as(Seq("dim", "q")))
    val perLbl = ex.groupBy("label", "dim")
      .agg(sum("q").as("s_l"), count(lit(1)).as("n_l"))
    val glob = ex.groupBy("dim")
      .agg(sum("q").as("s_g"), count(lit(1)).as("n_g"))
    perLbl.join(broadcast(glob), Seq("dim"))
      .withColumn("dd", expr("s_g div n_g - (s_g - s_l) div (n_g - n_l)"))
      .groupBy("label")
      .agg(max("n_l").as("n_vecs"),
        sum(expr("dd * dd")).as("influence_dist2"))
      .orderBy(desc("influence_dist2"), col("label"))
  }

  val q306Sql: String =
    """WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), e AS (
      |  SELECT label, unnest(range(1, len(qv) + 1)) AS i, qv FROM q
      |), pl AS (
      |  SELECT label, i AS dim, CAST(SUM(qv[i]) AS BIGINT) AS s_l,
      |    COUNT(*) AS n_l
      |  FROM e GROUP BY 1, 2
      |), g AS (
      |  SELECT dim, CAST(SUM(s_l) AS BIGINT) AS s_g,
      |    CAST(SUM(n_l) AS BIGINT) AS n_g
      |  FROM pl GROUP BY 1
      |), j AS (
      |  SELECT pl.label, pl.n_l,
      |    (g.s_g // g.n_g) - ((g.s_g - pl.s_l) // (g.n_g - pl.n_l)) AS dd
      |  FROM pl JOIN g USING (dim)
      |)
      |SELECT label, CAST(MAX(n_l) AS BIGINT) AS n_vecs,
      |  CAST(SUM(dd * dd) AS BIGINT) AS influence_dist2
      |FROM j GROUP BY label
      |ORDER BY influence_dist2 DESC, label""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("q302_knn_shapley", q302 _, Some(q302Sql)),
      ("q303_wasserstein_drift", q303 _, Some(q303Sql)),
      ("q304_conformal_coverage", q304 _, Some(q304Sql)),
      ("q306_label_influence", q306 _, Some(q306Sql)),
      ("q307_cell_shapley", q307 _, Some(q307Sql)))
}
