package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical / frequency analytics beyond the q39–q86 surface: explicit
  * GROUPING SETS, integer-exact distribution moments, histograms, bigram
  * association, heavy hitters, bitwise aggregates, vocabulary coverage,
  * event funnels, and inverted-index posting statistics. Everything here is
  * exact integer or string math with a total ORDER BY, so every query is
  * DuckDB-oracle hash-checked (SURVEY §5 conventions).
  */
object Stats {

  private def cents(c: Column) = floor(c * 100).cast(LongType)

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))

  /** q87 explicit GROUPING SETS — the third grouping-set shape next to q39's
    * CUBE and q22's ROLLUP: exactly ((priority), (status), ()) with no cross
    * products. Catalyst plans one Expand (3 projections) + a single hash
    * aggregate — one scan regardless of how many sets are named, which is the
    * property that matters on a 100 TB fact table. */
  def q87(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
      .createOrReplaceTempView("q87_orders")
    spark.sql(
      """SELECT CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM q87_orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, priority, status""".stripMargin)
  }

  val q87Sql =
    """SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, priority, status""".stripMargin

  /** q88 distribution moments, integer-exact: per-flag count and the raw
    * power sums Σx, Σx² over integral quantities — the cross-engine-safe,
    * mergeable form of variance/stddev (no double accumulation order). With
    * values ≤ 50, Σx² ≤ 2500·n stays inside BIGINT past 10^15 rows per
    * group; the variance rational n·Σx²−(Σx)² does NOT (it overflows near
    * 2·10^9 rows/group), so the finishing division lives in the consumer
    * (StatsSpec binds it to the native double `stddev_samp`), not in the
    * shuffled aggregate. One partial-agg shuffle. */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast(LongType)
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), q.as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"),
        sum(col("q") * col("q")).as("sum_q2"))
      .orderBy("l_returnflag")
  }

  val q88Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
      |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q2
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q89 fixed-width histogram of document length: bucket = n_chars div 50.
    * Explicit integer bucketing instead of width_bucket keeps the bucket
    * function engine-portable AND pushes as plain arithmetic into the scan
    * projection — one partial-agg shuffle over ~(range/50) groups. */
  def q89(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select((col("n_chars") / 50).cast(LongType).as("bucket"),
        col("n_chars"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .withColumn("lo_chars", col("bucket") * 50)
      .select("bucket", "lo_chars", "n_docs", "sum_chars", "min_chars", "max_chars")
      .orderBy("bucket")

  val q89Sql =
    """SELECT CAST((n_chars - n_chars % 50) / 50 AS BIGINT) AS bucket,
      |  CAST((n_chars - n_chars % 50) / 50 AS BIGINT) * 50 AS lo_chars,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q90 bigram association: adjacent token pairs scored by next-token
    * conditional probability p(w2|w1) and the Dice coefficient, both as
    * exact parts-per-million integer ratios (floor division is deterministic
    * across engines where log-based PMI is not). The bigram←unigram joins
    * are deliberately UNHINTED: natural-language vocabulary is unbounded
    * (heavy-tailed typos/numbers/code tokens — hundreds of millions of
    * distinct tokens at 100 TB), so a forced broadcast would OOM the driver
    * at scale. AQE sees the post-aggregation size at runtime and picks
    * broadcast when the vocabulary actually is small, shuffle join when it
    * is not — the same policy as the dedup semi-joins. */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(split(col("text"), " ").as("w"))
    val uni = docs.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    // both slices are exactly size(w)-1 long, so zip_with never null-pads —
    // no phantom (last_token, NULL) bigram rides the groupBy shuffle
    val nBigrams = size(col("w")) - 1
    val bi = docs.select(explode(
        zip_with(slice(col("w"), lit(1), nBigrams),
          slice(col("w"), lit(2), nBigrams),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt_xy"))
    // `div` = exact integral division, matching the oracle's `//` — a double
    // `/` would round k−ε up to k once counts pass 2^53-scale products
    bi.join(uni.select(col("t").as("w1"), col("cnt").as("cnt_x")), "w1")
      .join(uni.select(col("t").as("w2"), col("cnt").as("cnt_y")), "w2")
      .select(col("w1"), col("w2"), col("cnt_xy"),
        expr("cnt_xy * 1000000 div cnt_x").as("p_next_ppm"),
        expr("cnt_xy * 2000000 div (cnt_x + cnt_y)").as("dice_ppm"))
      .orderBy(desc("cnt_xy"), col("w1"), col("w2"))
      .limit(20)
  }

  val q90Sql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS w FROM documents
      |), uni AS (
      |  SELECT t, COUNT(*) AS cnt
      |  FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t
      |), bi AS (
      |  SELECT w1, w2, COUNT(*) AS cnt_xy FROM (
      |    SELECT unnest(list_transform(range(1, len(w)),
      |      i -> struct_pack(w1 := w[i], w2 := w[i+1])), recursive := true)
      |    FROM toks)
      |  GROUP BY w1, w2
      |)
      |SELECT b.w1, b.w2, b.cnt_xy,
      |  (b.cnt_xy * 1000000) // ux.cnt AS p_next_ppm,
      |  (b.cnt_xy * 2000000) // (ux.cnt + uy.cnt) AS dice_ppm
      |FROM bi b JOIN uni ux ON ux.t = b.w1 JOIN uni uy ON uy.t = b.w2
      |ORDER BY cnt_xy DESC, w1, w2 LIMIT 20""".stripMargin

  /** q91 exact heavy hitters: tokens above a 2% frequency threshold
    * (freq·50 > N), with exact ppm share and dense rank. The token count is
    * one partial-agg shuffle; the global total rides along as a broadcast
    * scalar. The O(1)-memory alternative at 100 TB is a count-min/TopK
    * sketch — this is the exact gate it trades against. */
  def q91(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokens(spark, dir)
    val counts = tok.groupBy("token").agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum("freq").as("total"))
    counts.join(broadcast(total))
      .filter(col("freq") * 50 > col("total"))
      .select(col("token"), col("freq"),
        expr("freq * 1000000 div total").as("ppm")) // integral ÷, matches `//`
      .withColumn("rnk",
        row_number().over(Window.orderBy(desc("freq"), col("token")))
          .cast(LongType))
      .orderBy("rnk")
  }

  val q91Sql =
    """WITH c AS (
      |  SELECT w AS token, COUNT(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w
      |), t AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM c)
      |SELECT token, freq, (freq * 1000000) // total AS ppm,
      |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk
      |FROM c, t WHERE freq * 50 > total ORDER BY rnk""".stripMargin

  /** q92 bitwise aggregates: BIT_AND / BIT_OR / BIT_XOR of part keys per
    * return flag — the bitmask-rollup family (feature-flag unions, shard
    * masks). Plain partial-aggregable functions: map-side combine works
    * because all three are associative+commutative, so the shuffle carries
    * one long per (flag, agg). */
  def q92(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(bit_and(col("l_partkey")).as("and_key"),
        bit_or(col("l_partkey")).as("or_key"),
        bit_xor(col("l_partkey")).as("xor_key"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val q92Sql =
    """SELECT l_returnflag,
      |  BIT_AND(l_partkey) AS and_key, BIT_OR(l_partkey) AS or_key,
      |  BIT_XOR(l_partkey) AS xor_key, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q93 vocabulary coverage curve: tokens ranked by frequency with the
    * running share of all token occurrences each prefix of the vocabulary
    * covers (the "how big a vocab do we need" curve), as exact ppm.
    *
    * Scale shape: the query keeps only the top-20 prefix, so the top-20 is
    * taken FIRST — `orderBy(...).limit(20)` plans as TakeOrderedAndProject
    * (per-partition heaps, 20-row driver merge) — and the rank/running-sum
    * window runs on those 20 rows. The naive alternative (window over the
    * aggregated vocabulary, filter rnk ≤ 20 after) moves the WHOLE
    * vocabulary through one partition — an open web corpus has 10⁸–10⁹
    * distinct tokens, and the running `sum` in the window spec blocks
    * Spark's rank-only InferWindowGroupLimit map-side prune, so nothing
    * saves that plan at scale. The 20-row prefix of the global (freq desc,
    * token) order is identical either way, so the outputs are
    * bit-identical. The vocab aggregate is scratch-checkpointed: both the
    * grand total and the top-20 read it, and unmaterialized each would
    * re-tokenize the corpus (vocab-sized blocks — bounded by distinct
    * tokens, never the corpus; released with the frame, no stranded
    * cache entry). */
  def q93(spark: SparkSession, dir: String): DataFrame = {
    // scratch checkpoint, not persist: both the grand total and the top-20
    // read the vocab aggregate, and a persist on a lazily-returned plan
    // has no release point (Checkpoints.scratch scaladoc)
    val counts = graft.operators.Checkpoints.scratch(
      tokens(spark, dir).groupBy("token").agg(count(lit(1)).as("freq")))
    val total = counts.agg(sum("freq").as("total"))
    val top = counts.orderBy(desc("freq"), col("token")).limit(20)
    val w = Window.orderBy(desc("freq"), col("token"))
    top.join(broadcast(total))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("cum_freq",
        sum("freq").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rnk"), col("token"), col("freq"), col("cum_freq"),
        expr("cum_freq * 1000000 div total").as("coverage_ppm")) // integral ÷
      .orderBy("rnk")
  }

  val q93Sql =
    """WITH c AS (
      |  SELECT w AS token, COUNT(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w
      |), r AS (
      |  SELECT token, freq,
      |    CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk,
      |    CAST(SUM(freq) OVER (ORDER BY freq DESC, token
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq,
      |    CAST(SUM(freq) OVER () AS BIGINT) AS total
      |  FROM c)
      |SELECT rnk, token, freq, cum_freq, (cum_freq * 1000000) // total AS coverage_ppm
      |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** q94 strict event funnel view → click → purchase: per user, the first
    * view, the first click AT OR AFTER that view, and the first purchase at
    * or after that click; counts per stage. Each stage is one user-keyed
    * aggregate joined back on user_id — all three shuffles share the same
    * key, so Catalyst reuses the partitioning instead of re-exchanging.
    * Timestamps compared as epoch millis (engine-identical integers). */
  def q94(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tms").as("mv"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("tms") >= col("mv"))
      .groupBy("user_id").agg(min("tms").as("mc"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("tms") >= col("mc"))
      .groupBy("user_id").agg(min("tms").as("mp"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(col("mv")).as("n_view"),
        count(col("mc")).as("n_click_after_view"),
        count(col("mp")).as("n_purchase_after_click"))
  }

  val q94Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events
      |), v AS (
      |  SELECT user_id, MIN(tms) AS mv FROM e WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, MIN(e.tms) AS mc
      |  FROM e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.tms >= v.mv GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, MIN(e.tms) AS mp
      |  FROM e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.tms >= c.mc GROUP BY 1
      |)
      |SELECT COUNT(v.mv) AS n_view,
      |  COUNT(c.mc) AS n_click_after_view,
      |  COUNT(p.mp) AS n_purchase_after_click
      |FROM v LEFT JOIN c ON c.user_id = v.user_id
      |LEFT JOIN p ON p.user_id = v.user_id""".stripMargin

  /** q95 inverted-index posting statistics: per token, document frequency
    * (distinct docs), total term frequency, and the posting-list bounds
    * (min/max doc id) — the index-build summary a retrieval pipeline emits.
    * df and tf come out of ONE aggregate (count distinct + count share the
    * token-keyed shuffle via Catalyst's Expand rewrite); top-20 by df is
    * TakeOrderedAndProject, never a global sort of the vocabulary. */
  def q95(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir)
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy(desc("df"), desc("tf"), col("token"))
      .limit(20)

  val q95Sql =
    """SELECT w AS token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY w ORDER BY df DESC, tf DESC, token LIMIT 20""".stripMargin

  /** q101 forward fill (last-observation-carried-forward): per-user event
    * values with 'error' readings nulled out, then gap-filled by the last
    * non-null value via an IGNORE NULLS running window — the sensor/telemetry
    * repair primitive. One user-keyed shuffle; the frame is running (no
    * full-partition buffering). Rows before a user's first reading stay
    * null by design. */
  def q101(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("tms"),
        when(col("event_type") =!= "error",
          floor(col("value") * 100).cast(LongType)).as("cents"))
      .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
      .select("event_id", "user_id", "tms", "filled_cents")
      .orderBy("event_id")
  }

  val q101Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS tms,
      |    CASE WHEN event_type <> 'error'
      |      THEN CAST(FLOOR(value * 100) AS BIGINT) END AS cents
      |  FROM events)
      |SELECT event_id, user_id, tms,
      |  LAST_VALUE(cents IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY tms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |FROM e ORDER BY event_id""".stripMargin

  /** q102 column profiler: row count, null count, distinct count, and
    * min/max rendered to strings, one output row per profiled column — the
    * data-quality audit a warehouse runs after every load. All metrics for
    * all columns come from ONE aggregate over ONE scan (then a 3-row
    * unpivot), not a scan per column. */
  def q102(spark: SparkSession, dir: String): DataFrame = {
    // parallelized: three countDistinct columns in one aggregate plan an
    // Expand (×4 rows per input), and on a single-row-group fixture file
    // the scan+expand+partial phase otherwise runs in ONE task (r16
    // measurement: 1.27 s of a 1.9 s query in a single serial task; a
    // multi-file 100 TB table parallelizes the same plan for free).
    val o = Tables.parallelized(Tables.load(spark, dir, "orders"))
      .withColumn("cents", cents(col("o_totalprice")))
    def prof(c: String) = Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"),
      min(col(c)).cast(StringType).as(s"${c}_min"),
      max(col(c)).cast(StringType).as(s"${c}_max"))
    val agg0 = o.agg(count(lit(1)).as("n"),
      (Seq("cents", "o_custkey", "o_orderstatus").flatMap(prof)): _*)
    agg0.select(expr(
      """stack(3,
        |  'cents', n, n - cents_nn, cents_nd, cents_min, cents_max,
        |  'o_custkey', n, n - o_custkey_nn, o_custkey_nd, o_custkey_min, o_custkey_max,
        |  'o_orderstatus', n, n - o_orderstatus_nn, o_orderstatus_nd, o_orderstatus_min, o_orderstatus_max)
        |  AS (col_name, n_rows, n_null, n_distinct, min_s, max_s)""".stripMargin))
      .orderBy("col_name")
  }

  val q102Sql =
    """WITH o AS (
      |  SELECT *, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |SELECT 'cents' AS col_name, COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(cents) AS n_null, COUNT(DISTINCT cents) AS n_distinct,
      |  CAST(MIN(cents) AS VARCHAR) AS min_s, CAST(MAX(cents) AS VARCHAR) AS max_s
      |FROM o
      |UNION ALL
      |SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
      |  COUNT(DISTINCT o_custkey),
      |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      |FROM o
      |UNION ALL
      |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
      |  COUNT(DISTINCT o_orderstatus),
      |  CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
      |FROM o
      |ORDER BY col_name""".stripMargin

  /** q105 cohort retention matrix: users bucketed by first-activity week
    * (the cohort), then each cohort's distinct-active count per week offset,
    * with retention as exact ppm of the cohort's week-0 size — the classic
    * product-analytics triangle. Two user-keyed aggregates share one
    * shuffle key; the offset aggregate and the week-0 window both run on
    * the tiny (cohort × offset) grid, not the event stream. */
  def q105(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("unix_millis(ts) div 604800000").as("wk"))
    val firsts = e.groupBy("user_id").agg(min("wk").as("cohort"))
    val grid = e.join(firsts, "user_id")
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w = Window.partitionBy("cohort")
    grid
      .withColumn("cohort_size",
        max(when(col("offset") === 0, col("n_active"))).over(w))
      .withColumn("retention_ppm", expr("n_active * 1000000 div cohort_size"))
      .select("cohort", "offset", "n_active", "cohort_size", "retention_ppm")
      .orderBy("cohort", "offset")
  }

  val q105Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events
      |), f AS (
      |  SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id
      |), a AS (
      |  SELECT f.cohort, e.wk - f.cohort AS "offset",
      |    COUNT(DISTINCT e.user_id) AS n_active
      |  FROM e JOIN f USING (user_id) GROUP BY 1, 2
      |), s AS (
      |  SELECT *, MAX(CASE WHEN "offset" = 0 THEN n_active END)
      |    OVER (PARTITION BY cohort) AS cohort_size
      |  FROM a
      |)
      |SELECT cohort, "offset", n_active, cohort_size,
      |  n_active * 1000000 // cohort_size AS retention_ppm
      |FROM s ORDER BY cohort, "offset"""".stripMargin

  /** q112 exact per-label embedding centroids — the E-step of k-means /
    * class-prototype computation, in engine-portable integer math: components
    * quantized to ⌊1000x⌋, positionally exploded (`posexplode` — the
    * generator surface), and summed per (label, dim). The mean is the
    * consumer's division `sum_q / n` — shipping the raw (Σ, n) pair instead
    * keeps the aggregate MERGEABLE (the property that lets 1000 executors
    * combine partial centroids without float drift) and the oracle exact.
    * One partial-agg shuffle on (label, dim); output is labels × dims rows. */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .select(col("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType))).as(Seq("dim", "q")))
      .groupBy(col("label"), col("dim").cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .orderBy("label", "dim")
  }

  /** q151 label-centroid affinity matrix — how close are the embedding
    * classes to each other, the confusion-risk signal an active-learning /
    * relabeling loop reads (two labels with near-parallel centroids are
    * the ones a classifier will mix up). Builds on the q112 quantized
    * sums: each label's centroid is the per-dimension integer-truncated MEAN
    * (sum_q div n — truncation toward zero, identical in Spark div and DuckDB // — dividing BEFORE any product keeps every later term ≤
    * 1000² per dimension, int64-safe at ANY corpus size, where dotting raw
    * sums overflows past ~10⁹ rows per label), and each label pair ships
    * the exact integer dot and squared norms — the consumer finishes
    * cosine in whatever precision it wants, the engine never touches a
    * double after quantization.
    *
    * Scale shape: one map-combined (label, dim) aggregate collapses the
    * corpus; everything after lives on |labels|×|dims| rows (a dim-keyed
    * self-join bounded by labels² per dim). */
  def q151(spark: SparkSession, dir: String): DataFrame = {
    // model-sized (|labels|·|dims|) scratch checkpoint: consumed 3x (both
    // pair sides + the norm frame), and each rebuild would re-pay the
    // corpus-collapsing explode — one materialization, no stranded cache
    // entry (Checkpoints.scratch discipline)
    val cent = graft.operators.Checkpoints.scratch(
      Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .select(col("label").cast(LongType).as("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType))).as(Seq("dim", "q")))
      .groupBy("label", "dim")
      .agg(expr("sum(q) div count(1)").as("m")))
    val norms = cent.groupBy("label")
      .agg(sum(expr("m * m")).as("norm2"))
    cent.select(col("label").as("label_a"), col("dim"), col("m").as("ma"))
      .join(cent.select(col("label").as("label_b"), col("dim"), col("m").as("mb")),
        Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(expr("ma * mb")).as("dot_mm"))
      .join(norms.select(col("label").as("label_a"), col("norm2").as("norm2_a")),
        "label_a")
      .join(norms.select(col("label").as("label_b"), col("norm2").as("norm2_b")),
        "label_b")
      .select("label_a", "label_b", "dot_mm", "norm2_a", "norm2_b")
      .orderBy("label_a", "label_b")
  }

  val q151Sql: String =
    """WITH q AS (
      |  SELECT label,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), e AS (
      |  SELECT label, unnest(range(1, len(qv) + 1)) AS i, qv FROM q
      |), cent AS (
      |  SELECT CAST(label AS BIGINT) AS label, i AS dim,
      |    SUM(qv[i]) // COUNT(*) AS m
      |  FROM e GROUP BY label, i
      |), norms AS (
      |  SELECT label, SUM(m * m) AS norm2 FROM cent GROUP BY label
      |), pairs AS (
      |  SELECT a.label AS label_a, b.label AS label_b, SUM(a.m * b.m) AS dot_mm
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2
      |)
      |SELECT label_a, label_b, CAST(dot_mm AS BIGINT) AS dot_mm,
      |  CAST(na.norm2 AS BIGINT) AS norm2_a, CAST(nb.norm2 AS BIGINT) AS norm2_b
      |FROM pairs
      |JOIN norms na ON na.label = label_a
      |JOIN norms nb ON nb.label = label_b
      |ORDER BY label_a, label_b""".stripMargin

  /** q158 per-dimension Fisher discriminant ratio — which embedding
    * dimensions actually separate the classes (the feature-scoring pass
    * before a linear probe or a dimensionality cut; Fisher, "The Use of
    * Multiple Measurements in Taxonomic Problems", 1936). Between-class
    * over within-class scatter per dimension, everything derived from the
    * same mergeable (n, Σq, Σq²) triples as q88/q151:
    *
    *   within_l  = Σq² − 2·m_l·Σq + n·m_l²   (m_l = Σq div n, truncated)
    *   between_l = n·(m_l − g)²              (g = global truncated mean)
    *   fisher_x1e6 = ⌊1e6·Σbetween / Σwithin⌋
    *
    * The truncated means make the decomposition a deterministic SPEC
    * (within + between no longer telescopes exactly — the ⌊⌋ residue is
    * part of the definition), which is what lets two engines agree
    * bit-for-bit where a float variance ratio never would.
    *
    * Scale shape: the corpus collapses at the (label, dim) moment
    * aggregate; scatter algebra runs on |labels|×|dims| rows, the global
    * means on |dims|. */
  def q158(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .select(col("label").cast(LongType).as("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType))).as(Seq("dim", "q")))
      .groupBy(col("dim").cast(LongType).as("dim"), col("label"))
      .agg(count(lit(1)).as("n"), sum("q").as("s"), sum(expr("q * q")).as("ss"))
      .withColumn("m", expr("s div n"))
    val g = m.groupBy("dim")
      .agg(expr("sum(s) div sum(n)").as("g"))
    m.join(g, "dim")
      .groupBy("dim")
      .agg(count(lit(1)).as("n_labels"),
        sum(expr("ss - 2 * m * s + n * m * m")).as("within_sc"),
        sum(expr("n * (m - g) * (m - g)")).as("between_sc"))
      .withColumn("fisher_x1e6",
        expr("case when within_sc > 0 then between_sc * 1000000 div within_sc end"))
      .orderBy("dim")
  }

  val q158Sql: String =
    """WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), e AS (
      |  SELECT label, unnest(range(1, len(qv) + 1)) AS i, qv FROM q
      |), mo AS (
      |  SELECT CAST(i - 1 AS BIGINT) AS dim, label, COUNT(*) AS n,
      |    CAST(SUM(qv[i]) AS BIGINT) AS s,
      |    CAST(SUM(qv[i] * qv[i]) AS BIGINT) AS ss
      |  FROM e GROUP BY 1, 2
      |), mm AS (
      |  SELECT *, s // n AS m FROM mo
      |), gg AS (
      |  SELECT dim, SUM(s) // SUM(n) AS g FROM mo GROUP BY dim
      |)
      |SELECT mm.dim, CAST(COUNT(*) AS BIGINT) AS n_labels,
      |  CAST(SUM(ss - 2 * m * s + n * m * m) AS BIGINT) AS within_sc,
      |  CAST(SUM(n * (m - gg.g) * (m - gg.g)) AS BIGINT) AS between_sc,
      |  CAST(CASE WHEN SUM(ss - 2 * m * s + n * m * m) > 0
      |    THEN SUM(n * (m - gg.g) * (m - gg.g)) * 1000000
      |      // SUM(ss - 2 * m * s + n * m * m) END AS BIGINT) AS fisher_x1e6
      |FROM mm JOIN gg USING (dim)
      |GROUP BY mm.dim ORDER BY mm.dim""".stripMargin

  val q112Sql =
    """WITH q AS (
      |  SELECT label,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), e AS (
      |  SELECT label, unnest(range(1, len(qv) + 1)) AS i, qv FROM q
      |)
      |SELECT label, CAST(i - 1 AS BIGINT) AS dim, COUNT(*) AS n,
      |  CAST(SUM(qv[i]) AS BIGINT) AS sum_q
      |FROM e GROUP BY label, i ORDER BY label, dim""".stripMargin

  /** q113 robust outlier gate per group — median absolute deviation, the
    * robust-statistics twin of the q88 moments (one far outlier moves a mean
    * and stddev arbitrarily; it moves a median/MAD not at all). Medians are
    * the explicit lower-median rank statistic ((n+1) div 2, the q108
    * arithmetic), the deviation median reuses the same single partitioning,
    * and the flag is the classic |x − med| > 3·MAD. Everything rides ONE
    * hash partitioning on the group key through three window sorts and the
    * final aggregate — no per-group collect, no percentile_approx drift. */
  def q113(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy("priority")
    val byVal = wAll.orderBy("cents")
    val ranked = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .withColumn("rn", row_number().over(byVal).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("cents"))).over(wAll))
      .withColumn("dev", abs(col("cents") - col("med")))
    val byDev = wAll.orderBy("dev")
    ranked
      .withColumn("rn2", row_number().over(byDev).cast(LongType))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev"))).over(wAll))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"), max("med").as("med_cents"),
        max("mad").as("mad_cents"),
        sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("priority")
  }

  val q113Sql =
    """WITH v AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), r1 AS (
      |  SELECT priority, cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY cents) AS BIGINT) AS rn,
      |    COUNT(*) OVER (PARTITION BY priority) AS n
      |  FROM v
      |), m1 AS (
      |  SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
      |    OVER (PARTITION BY priority) AS med
      |  FROM r1
      |), d AS (
      |  SELECT *, ABS(cents - med) AS dev FROM m1
      |), r2 AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY dev) AS BIGINT) AS rn2
      |  FROM d
      |), m2 AS (
      |  SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
      |    OVER (PARTITION BY priority) AS mad
      |  FROM r2
      |)
      |SELECT priority, COUNT(*) AS n, MAX(med) AS med_cents, MAX(mad) AS mad_cents,
      |  CAST(SUM(CASE WHEN dev > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM m2 GROUP BY priority ORDER BY priority""".stripMargin

  /** q126 per-group OLS trend — the closed-form least-squares slope of
    * monthly revenue per nation, entirely in exact integer rationals:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * with x = months since 2020-01 and y = monthly revenue cents. The five
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) are plain mergeable sums —
    * the whole regression is ONE map-side-combined aggregate per group, the
    * cheapest possible distributed shape (no covariance double-pass, no
    * float accumulation-order dependence), and they are emitted alongside
    * the ×1e3 slope so any downstream re-derivation is exact. Overflow:
    * Σxy ≤ months·x_max·y_max ≈ 1e13 at sf0.1, ×n×1e3 ≈ 8e17 < 2^63. */
  def q126(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_custkey"),
        ((year(col("o_orderdate")) - 2020) * 12 + month(col("o_orderdate")) - 1)
          .cast(LongType).as("x"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    val monthly = li.join(o, "okey").join(cust, "o_custkey").join(nat, "c_nationkey")
      .groupBy(col("n_name").as("nation"), col("x"))
      .agg(sum("c").as("y"))
    monthly.groupBy("nation")
      .agg(count(lit(1)).as("n_months"),
        sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"))
      .withColumn("slope_x1e3",
        when(col("n_months") * col("sum_x2") - col("sum_x") * col("sum_x") > 0,
          expr("1000 * (n_months * sum_xy - sum_x * sum_y) div " +
            "(n_months * sum_x2 - sum_x * sum_x)")))
      .orderBy("nation")
  }

  val q126Sql =
    """WITH monthly AS (
      |  SELECT n.n_name AS nation,
      |    CAST((date_part('year', o.o_orderdate) - 2020) * 12
      |      + date_part('month', o.o_orderdate) - 1 AS BIGINT) AS x,
      |    CAST(SUM(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100)) AS BIGINT) AS y
      |  FROM lineitem l
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2
      |), s AS (
      |  SELECT nation, COUNT(*) AS n_months,
      |    CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
      |    CAST(SUM(x * y) AS BIGINT) AS sum_xy,
      |    CAST(SUM(x * x) AS BIGINT) AS sum_x2
      |  FROM monthly GROUP BY nation
      |)
      |SELECT nation, n_months, sum_x, sum_y, sum_xy, sum_x2,
      |  CASE WHEN n_months * sum_x2 - sum_x * sum_x > 0
      |    THEN 1000 * (n_months * sum_xy - sum_x * sum_y)
      |      // (n_months * sum_x2 - sum_x * sum_x)
      |  END AS slope_x1e3
      |FROM s ORDER BY nation""".stripMargin

  /** q132 windowed co-occurrence counts — the GloVe-style statistic word
    * embeddings are trained from (Pennington et al., "GloVe: Global Vectors
    * for Word Representation", EMNLP 2014): unordered token pairs within a
    * ±2 window, weighted by inverse distance. The 1/d weight is kept exact
    * by scaling ×6 (d=1 → 6, d=2 → 3 — integers, no float accumulation).
    * NO self-join: the d=1 and d=2 pair streams are zip_with slices of the
    * token array (the q90 shape), so the work is linear in corpus tokens —
    * a position self-join would be Σ tokens²/doc. One map-combined pair
    * aggregate; top-20 via TakeOrderedAndProject. */
  def q132(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(split(col("text"), " ").as("w"))
    def pairsAt(d: Int, weightX6: Int): DataFrame = {
      val n = size(col("w")) - d
      docs.filter(size(col("w")) > d)
        .select(explode(zip_with(
          slice(col("w"), lit(1), n), slice(col("w"), lit(1 + d), n),
          (x, y) => struct(least(x, y).as("wa"), greatest(x, y).as("wb"))))
          .as("p"))
        .select(col("p.wa"), col("p.wb"), lit(weightX6.toLong).as("wt_x6"))
    }
    pairsAt(1, 6).union(pairsAt(2, 3))
      .groupBy("wa", "wb")
      .agg(count(lit(1)).as("n_pairs"), sum("wt_x6").as("cooc_x6"))
      .orderBy(desc("cooc_x6"), col("wa"), col("wb"))
      .limit(20)
  }

  val q132Sql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS w FROM documents
      |), p AS (
      |  SELECT LEAST(w[i], w[i+1]) AS wa, GREATEST(w[i], w[i+1]) AS wb,
      |    CAST(6 AS BIGINT) AS wt_x6
      |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks)
      |  UNION ALL
      |  SELECT LEAST(w[i], w[i+2]), GREATEST(w[i], w[i+2]), 3
      |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i FROM toks)
      |)
      |SELECT wa, wb, COUNT(*) AS n_pairs, CAST(SUM(wt_x6) AS BIGINT) AS cooc_x6
      |FROM p GROUP BY wa, wb
      |ORDER BY cooc_x6 DESC, wa, wb LIMIT 20""".stripMargin

  /** q167 vocabulary power-law (Zipf) health check — the corpus-quality
    * diagnostic tokenizer and data teams run on term frequencies: a healthy
    * natural-language corpus has a heavy-tailed (power-law) vocabulary, and
    * a slope collapse signals boilerplate/template contamination. The
    * textbook fit — rank every term globally, regress log f on log rank —
    * needs a TOTAL ORDER over the vocabulary (a global single-partition
    * window, the anti-pattern q140/q142 exist to avoid). The octave
    * histogram estimator needs no rank at all: bucket terms by
    * bitlen(frequency) (the frequency's integer log₂ — `length(bin(f))`,
    * the q160 bitlen surrogate), count terms per octave, and OLS-fit
    * bitlen(count) against the octave index with the q126 moment kernel.
    * Two map-combined aggregates over the corpus and an O(64)-row fit;
    * every statistic is an exact int64 the oracle replays bit-for-bit
    * (both engines truncate negative integer division toward zero).
    * On the synthetic fixture the slope comes out POSITIVE — the
    * near-uniform random vocabulary is precisely the un-natural
    * distribution the check exists to flag, and the spec asserts it
    * flags it. */
  def q167(spark: SparkSession, dir: String): DataFrame = {
    val octaves = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("f"))
      .select(length(bin(col("f"))).cast(LongType).as("octave"))
      .groupBy("octave").agg(count(lit(1)).as("n_terms"))
    octaves
      .agg(count(lit(1)).as("n_octaves"),
        sum("n_terms").as("n_terms"),
        sum("octave").as("sum_x"),
        sum(length(bin(col("n_terms"))).cast(LongType)).as("sum_y"),
        sum(col("octave") * length(bin(col("n_terms"))).cast(LongType))
          .as("sum_xy"),
        sum(col("octave") * col("octave")).as("sum_x2"))
      .withColumn("slope_x1e6",
        when(col("n_octaves") * col("sum_x2") - col("sum_x") * col("sum_x") > 0,
          expr("1000000 * (n_octaves * sum_xy - sum_x * sum_y) div " +
            "(n_octaves * sum_x2 - sum_x * sum_x)")))
  }

  val q167Sql: String =
    """WITH tf AS (
      |  SELECT term, COUNT(*) AS f FROM
      |    (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE length(term) > 0 GROUP BY term
      |), oct AS (
      |  SELECT CAST(length(printf('%b', f)) AS BIGINT) AS octave,
      |    COUNT(*) AS n_terms
      |  FROM tf GROUP BY 1
      |)
      |SELECT COUNT(*) AS n_octaves, CAST(SUM(n_terms) AS BIGINT) AS n_terms,
      |  CAST(SUM(octave) AS BIGINT) AS sum_x,
      |  CAST(SUM(length(printf('%b', n_terms))) AS BIGINT) AS sum_y,
      |  CAST(SUM(octave * length(printf('%b', n_terms))) AS BIGINT) AS sum_xy,
      |  CAST(SUM(octave * octave) AS BIGINT) AS sum_x2,
      |  CASE WHEN COUNT(*) * SUM(octave * octave) - SUM(octave) * SUM(octave) > 0
      |    THEN CAST(1000000 * (COUNT(*) * SUM(octave * length(printf('%b', n_terms)))
      |           - SUM(octave) * SUM(length(printf('%b', n_terms))))
      |         // (COUNT(*) * SUM(octave * octave) - SUM(octave) * SUM(octave))
      |         AS BIGINT) END AS slope_x1e6
      |FROM oct""".stripMargin

  /** q180 out-of-vocabulary rate per source — the tokenizer-coverage gate a
    * pipeline runs before committing a vocabulary (the operational question
    * behind q93's coverage curve): fix the reference vocabulary to the
    * top-`VocabSize` corpus tokens under the total (freq desc, token)
    * order, then score every source by the ppm of its token OCCURRENCES
    * falling outside it. A source with a high OOV rate is the one that
    * will fragment into subwords (q36's estimate) or <unk> at training
    * time. `VocabSize` = 20 is the declared calibration knob (the fixture
    * vocabulary holds 31 distinct tokens, so the audit has real OOV mass;
    * production sets it to the tokenizer's vocab size).
    *
    * Scale shape: the vocabulary is LIMIT-bounded by construction —
    * TakeOrderedAndProject(|vocab|) over the one map-combined (term, freq)
    * aggregate — so broadcasting it is the correct plan at any corpus
    * size; the token stream then makes ONE pass against the broadcast
    * (left join + conditional count), and the rollup is |sources| cells.
    * The corpus-derived-never-broadcast rule does not apply: the limit is
    * structural, not data-dependent. */
  def q180(spark: SparkSession, dir: String): DataFrame = {
    val VocabSize = 20
    val toks = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), col("term")).limit(VocabSize)
      .select(col("term"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .orderBy("source")
  }

  val q180Sql: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
      |), tt AS (
      |  SELECT source, term FROM t WHERE length(term) > 0
      |), vocab AS (
      |  SELECT term FROM (SELECT term, COUNT(*) AS f FROM tt GROUP BY term)
      |  ORDER BY f DESC, term LIMIT 20
      |)
      |SELECT source, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
      |FROM tt LEFT JOIN vocab v ON tt.term = v.term
      |GROUP BY source ORDER BY source""".stripMargin

  /** q190 per-source unigram divergence from the corpus — distribution-
    * shift detection for source curation (the q152 ppm total-variation
    * kernel pointed at the vocabulary axis): TV(source, corpus) =
    * ½·Σ_t |share_src(t) − share_corpus(t)| with both shares ppm-quantized
    * (the declared q152 grid). A source far from the corpus mix is either
    * a domain you WANT over-represented or contamination — either way the
    * number that flags it for a human. The absent-term mass needs NO dense
    * source×vocab grid: Σ over terms the source lacks of share_corpus(t)
    * equals the 1-row total Σ_t share_corpus(t) minus the sum over terms
    * present in the source — so the whole statistic reads off the sparse
    * (source, term) frame plus one scalar broadcast.
    *
    * Scale shape: one token explode, one (source, term) map-combined
    * aggregate (cells ≤ \|sources\|·\|vocab\|), the corpus term frame joined
    * unhinted (vocabulary is corpus-derived — the q160 rule), and a
    * \|sources\| rollup. */
  def q190(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass: every statistic below (source totals, corpus term
    // counts, grand total) derives from this vocab×sources-bounded cell
    // frame, never from a re-explode of the corpus
    val st = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("n_st"))
      .withColumn("n_s", sum("n_st").over(Window.partitionBy("source")))
    val t = st.groupBy("term").agg(sum("n_st").as("n_t"))
      .crossJoin(broadcast(
        st.agg(sum("n_st").as("n_total")))) // 1-row scalar
      .withColumn("share_t", expr("n_t * 1000000 div n_total"))
    val totalShare = t.agg(sum("share_t").as("t_share")) // 1 row
    st.join(t.select("term", "share_t"), Seq("term"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        sum(expr("abs(n_st * 1000000 div n_s - share_t)")).as("present_l1"),
        sum("share_t").as("present_share"))
      .crossJoin(broadcast(totalShare))
      .withColumn("tv_ppm",
        expr("(present_l1 + t_share - present_share) div 2"))
      .select("source", "n_tokens", "tv_ppm")
      .orderBy("source")
  }

  val q190Sql: String =
    """WITH tk AS (
      |  SELECT source, term FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
      |  ) WHERE length(term) > 0
      |), st AS (
      |  SELECT source, term, COUNT(*) AS n_st FROM tk GROUP BY source, term
      |), s AS (
      |  SELECT source, SUM(n_st) AS n_s FROM st GROUP BY source
      |), t AS (
      |  SELECT term, COUNT(*) * 1000000 // (SELECT COUNT(*) FROM tk) AS share_t
      |  FROM tk GROUP BY term
      |), tt AS (
      |  SELECT SUM(share_t) AS t_share FROM t
      |), per AS (
      |  SELECT st.source,
      |    SUM(ABS(st.n_st * 1000000 // s.n_s - t.share_t)) AS present_l1,
      |    SUM(t.share_t) AS present_share
      |  FROM st JOIN s USING (source) JOIN t USING (term)
      |  GROUP BY st.source
      |)
      |SELECT per.source, CAST(s.n_s AS BIGINT) AS n_tokens,
      |  CAST((per.present_l1 + tt.t_share - per.present_share) // 2 AS BIGINT) AS tv_ppm
      |FROM per JOIN s USING (source) CROSS JOIN tt
      |ORDER BY per.source""".stripMargin

  /** q191 cross-source semantic proximity matrix — the embedding-level
    * companion of q150 (n-gram containment) and q170 (near-dup pairs):
    * per-source integer-truncated centroids (the q151 kernel keyed by
    * SOURCE — embeddings align to documents by the shared id space,
    * vec_id = doc_id) and the exact squared Euclidean distance between
    * every unordered source pair. Two sources whose centroids nearly
    * coincide are the same distribution twice — mixture weights (q139/
    * q166) should see them as one; a source far from everything is the
    * candidate for upweighting or review. All-integer, oracle-replayed.
    *
    * Scale shape: one corpus pass into the (source, dim) centroid frame
    * (model-sized: \|sources\|·dim), then pair arithmetic entirely on that
    * frame — the distance join is dim-keyed over model-sized inputs,
    * never the corpus. */
  def q191(spark: SparkSession, dir: String): DataFrame = {
    val cent = Tables.parallelized(Tables.load(spark, dir, "embeddings"))
      .join(Tables.load(spark, dir, "documents").select(
        col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select(col("source"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType)))
          .as(Seq("dim", "q")))
      .groupBy("source", "dim")
      .agg(expr("sum(q) div count(1)").as("m"), count(lit(1)).as("n"))
    // model-sized scratch checkpoint; consumed by both pair sides — one
    // materialization of the corpus collapse, no stranded cache entry
    val cent2 = graft.operators.Checkpoints.scratch(cent)
    cent2.select(col("source").as("source_x"), col("dim"),
        col("m").as("mx"), col("n").as("n_x"))
      .join(cent2.select(col("source").as("source_y"), col("dim"),
        col("m").as("my"), col("n").as("n_y")), Seq("dim"))
      .filter(col("source_x") < col("source_y"))
      .groupBy("source_x", "source_y")
      .agg(max("n_x").as("n_x"), max("n_y").as("n_y"),
        sum(expr("(mx - my) * (mx - my)")).as("dist2"))
      .orderBy("source_x", "source_y")
  }

  val q191Sql: String =
    """WITH q AS (
      |  SELECT d.source,
      |    list_transform(e.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      |), ex AS (
      |  SELECT source, unnest(range(1, len(qv) + 1)) AS i, qv FROM q
      |), cent AS (
      |  SELECT source, i AS dim, CAST(SUM(qv[i]) // COUNT(*) AS BIGINT) AS m,
      |    COUNT(*) AS n
      |  FROM ex GROUP BY source, i
      |)
      |SELECT a.source AS source_x, b.source AS source_y,
      |  CAST(MAX(a.n) AS BIGINT) AS n_x, CAST(MAX(b.n) AS BIGINT) AS n_y,
      |  CAST(SUM((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS dist2
      |FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q192 join-key skew profiler — the diagnostic that DECIDES when the
    * q98 salting operator (or AQE's skew-join split) is worth its cost:
    * for the fact table's join key (`l_partkey`), the top-10 heaviest
    * keys with their row share in ppm, each carrying the key-population
    * statistics (distinct keys, total rows, the uniform share a balanced
    * key would hold, and the key's skew factor = share/uniform). A top
    * key whose skew factor is large is the straggler task in every
    * shuffle join on this key; the profile is what a pipeline checks
    * BEFORE picking partitioning. The hot-key list at 100 TB is exactly
    * what `operators/SkewSalt` consumes.
    *
    * Scale shape: one map-combined key aggregate, TakeOrderedAndProject
    * for the top-10, population stats a 1-row broadcast. */
  def q192(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("n_rows"))
    val pop = keys.agg(count(lit(1)).as("n_keys"),
      sum("n_rows").as("total_rows"))
    keys.orderBy(desc("n_rows"), col("key")).limit(10)
      .crossJoin(broadcast(pop))
      .withColumn("share_ppm", expr("n_rows * 1000000 div total_rows"))
      .withColumn("uniform_ppm", expr("1000000 div n_keys"))
      .withColumn("skew_x1000",
        expr("n_rows * n_keys * 1000 div total_rows"))
      .orderBy(desc("n_rows"), col("key"))
  }

  val q192Sql: String =
    """WITH k AS (
      |  SELECT l_partkey AS key, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
      |), pop AS (
      |  SELECT COUNT(*) AS n_keys, SUM(n_rows) AS total_rows FROM k
      |)
      |SELECT key, n_rows, CAST(pop.n_keys AS BIGINT) AS n_keys,
      |  CAST(pop.total_rows AS BIGINT) AS total_rows,
      |  CAST(n_rows * 1000000 // pop.total_rows AS BIGINT) AS share_ppm,
      |  CAST(1000000 // pop.n_keys AS BIGINT) AS uniform_ppm,
      |  CAST(n_rows * pop.n_keys * 1000 // pop.total_rows AS BIGINT) AS skew_x1000
      |FROM k CROSS JOIN pop
      |ORDER BY n_rows DESC, key LIMIT 10""".stripMargin

  /** The Benford first-digit expectation ⌊1e6·log₁₀(1+1/d)⌋ for d = 1..9 —
    * SPEC constants (the q153 discount-table discipline: the law is part
    * of the metric's definition, no engine evaluates a log). */
  private val BenfordPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
    66946L, 57991L, 51152L, 45757L)

  /** q193 Benford first-digit audit of order totals — the classic
    * fabricated-data screen (Benford 1938; the auditor's test that
    * invented-looking amounts fail): the leading digit of each order's
    * cents against the logarithmic expectation, per digit the observed
    * share in ppm, the Benford expectation (literal table), and the
    * signed deviation. Natural multi-scale amounts follow the law;
    * uniform synthetic ones (this fixture, deliberately) deviate hard —
    * the audit's output IS the evidence either way. Leading digit via
    * string head of the integer cents, identical in both engines.
    *
    * Scale shape: one narrow map + one ≤9-cell map-combined aggregate +
    * a 1-row total broadcast. */
  def q193(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "orders")
      .select(cents(col("o_totalprice")).as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast(StringType), 1, 1).cast(LongType)
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    d.crossJoin(broadcast(d.agg(sum("n").as("total"))))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("benford_ppm",
        element_at(typedLit(BenfordPpm), col("digit").cast("int")))
      .withColumn("delta_ppm", col("share_ppm") - col("benford_ppm"))
      .select("digit", "n", "share_ppm", "benford_ppm", "delta_ppm")
      .orderBy("digit")
  }

  val q193Sql: String = {
    val values = BenfordPpm.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    s"""WITH c AS (
       |  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c FROM orders
       |), d AS (
       |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM c WHERE c > 0
       |), g AS (
       |  SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
       |), t AS (SELECT SUM(n) AS total FROM g
       |), bf(digit, benford_ppm) AS (VALUES $values)
       |SELECT g.digit, g.n,
       |  CAST(g.n * 1000000 // t.total AS BIGINT) AS share_ppm,
       |  CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
       |  CAST(g.n * 1000000 // t.total - bf.benford_ppm AS BIGINT) AS delta_ppm
       |FROM g CROSS JOIN t JOIN bf ON bf.digit = g.digit
       |ORDER BY g.digit""".stripMargin
  }

  /** q194 per-source lexical concentration (Herfindahl–Hirschman index) —
    * the diversity flag that complements q190's divergence: HHI =
    * Σ_t share(t)² over the source's token distribution, in ppm (1e6 =
    * a single-token monopoly, 1e6/|vocab| = perfectly uniform). A source
    * whose HHI is far above its peers is low-entropy text — templated,
    * repetitive, or degenerate — exactly what a mixture (q139/q166)
    * should downweight per token. Shares ppm-quantized (the declared
    * grid), squares exact in int64 (share² ≤ 1e12, × vocab ≪ 2⁶³).
    *
    * Scale shape: one corpus pass into the (source, term) cell frame;
    * the HHI is a rollup of those cells — no second corpus touch. */
  def q194(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("n_st"))
      .withColumn("n_s", sum("n_st").over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("n_terms"),
        expr("sum((n_st * 1000000 div n_s) * (n_st * 1000000 div n_s)) div 1000000")
          .as("hhi_ppm"))
      .orderBy("source")

  val q194Sql: String =
    """WITH st AS (
      |  SELECT source, term, COUNT(*) AS n_st FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
      |  ) WHERE length(term) > 0 GROUP BY source, term
      |), s AS (
      |  SELECT source, SUM(n_st) AS n_s FROM st GROUP BY source
      |)
      |SELECT st.source, CAST(MAX(s.n_s) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_terms,
      |  CAST(SUM((st.n_st * 1000000 // s.n_s) * (st.n_st * 1000000 // s.n_s))
      |    // 1000000 AS BIGINT) AS hhi_ppm
      |FROM st JOIN s USING (source)
      |GROUP BY st.source ORDER BY st.source""".stripMargin

  /** q199 hourly traffic anomaly via the robust MAD gate — the q113 kernel
    * pointed at the time axis (and the series-level complement of q187's
    * per-user EWMA): hourly event counts, the exact lower-median of the
    * hourly series, the median absolute deviation, and a 3×MAD flag per
    * hour. Median/MAD instead of mean/stddev because traffic anomalies
    * are exactly the points that poison the mean — the robust gate is the
    * one that still fires during an incident. All-integer order
    * statistics (the q108/q113 rank arithmetic).
    *
    * Scale shape: the corpus collapses at the hourly aggregate; the rank
    * windows below run on the HOURLY frame — observation-window-bounded
    * (24·days rows; the q142 aggregate-by-value discipline, listed in the
    * §2.13 window inventory), and both median and MAD ship as 1-row
    * broadcasts. */
  def q199(spark: SparkSession, dir: String): DataFrame = {
    val hours = Tables.load(spark, dir, "events")
      .select(expr("unix_millis(ts) div 3600000").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("n_events"))
    def lowerMedian(df: DataFrame, c: String): DataFrame = df
      .withColumn("rn", row_number()
        .over(Window.orderBy(col(c), col("hour"))).cast(LongType))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col(c).as("m"))
    val med = lowerMedian(hours, "n_events")
    val withDev = hours.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("n_events") - col("m")))
    val mad = lowerMedian(withDev.select(col("hour"), col("dev")), "dev")
      .select(col("m").as("mad"))
    withDev.crossJoin(broadcast(mad))
      .select(col("hour"), col("n_events"), col("m").as("median_n"),
        col("mad"),
        when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L)
          .as("is_anomaly"))
      .orderBy("hour")
  }

  val q199Sql: String =
    """WITH h AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hour, COUNT(*) AS n_events
      |  FROM events GROUP BY 1
      |), med AS (
      |  SELECT n_events AS m FROM (
      |    SELECT n_events,
      |      ROW_NUMBER() OVER (ORDER BY n_events, hour) AS rn,
      |      COUNT(*) OVER () AS cnt
      |    FROM h
      |  ) WHERE rn = (cnt + 1) // 2
      |), dv AS (
      |  SELECT h.hour, h.n_events, med.m, ABS(h.n_events - med.m) AS dev
      |  FROM h CROSS JOIN med
      |), mad AS (
      |  SELECT dev AS mad FROM (
      |    SELECT dev, ROW_NUMBER() OVER (ORDER BY dev, hour) AS rn,
      |      COUNT(*) OVER () AS cnt
      |    FROM dv
      |  ) WHERE rn = (cnt + 1) // 2
      |)
      |SELECT CAST(dv.hour AS BIGINT) AS hour, dv.n_events,
      |  CAST(dv.m AS BIGINT) AS median_n, CAST(mad.mad AS BIGINT) AS mad,
      |  CAST(CASE WHEN dv.dev > 3 * mad.mad THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM dv CROSS JOIN mad ORDER BY hour""".stripMargin

  /** q201 per-language tokenizer fertility — the tokenizer-equity audit
    * (Petrov et al., "Language Model Tokenizers Introduce Unfairness
    * Between Languages", 2023): subword units per word, per language, in
    * exact ×1000 fixed point, using the declared q36 subword estimate
    * (ceil(len/6) units per word — the deterministic stand-in for a real
    * tokenizer's compression curve). A language paying 2–3× the units per
    * word gets proportionally less effective context and pays more per
    * token — the number a multilingual corpus team budgets against
    * (q166's apportionment should weight by UNITS, not words, when this
    * table is uneven).
    *
    * Scale shape: one corpus pass, one narrow codegen'd map (the ceil is
    * integer arithmetic), one ≤\|langs\| map-combined aggregate. */
  def q201(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("lang"),
        expr("(length(w) + 5) div 6").as("units"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("units").as("n_units"))
      .withColumn("fertility_x1000", expr("n_units * 1000 div n_words"))
      .orderBy("lang")

  val q201Sql: String =
    """WITH w AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
      |), u AS (
      |  SELECT lang, (length(w) + 5) // 6 AS units
      |  FROM w WHERE length(w) > 0
      |)
      |SELECT lang, COUNT(*) AS n_words,
      |  CAST(SUM(units) AS BIGINT) AS n_units,
      |  CAST(SUM(units) * 1000 // COUNT(*) AS BIGINT) AS fertility_x1000
      |FROM u GROUP BY lang ORDER BY lang""".stripMargin

  /** q203 per-source repetition gate — the Gopher-family repetition filter
    * (Rae et al. 2021 §A1.1's "fraction of characters in the most common
    * n-gram") re-expressed on the token axis: per document, the share of
    * adjacent bigram slots taken by the document's SINGLE most frequent
    * bigram, in exact ppm; a document whose top bigram exceeds the literal
    * 60,000 ppm (6%) threshold is loop/boilerplate-shaped and flagged.
    * Rolled up per source: docs, flagged docs, flagged share, worst
    * offender. q66's duplicate-token gate catches global token reuse; this
    * catches the LOCAL "same phrase over and over" degeneracy that
    * generation loops and templated chrome produce, which a type-token
    * ratio misses (a looping doc can still have high TTR around the loop).
    *
    * Scale shape: the q90 bigram extraction verbatim (exact-length slices
    * zip_with'd — no null-padded phantom pair), then two map-combining
    * aggregates — (doc, bigram) counts, per-doc max — and the ≤\|sources\|
    * rollup. Everything is keyed by doc or source; no window, no join, and
    * the bigram cell frame is the only shuffle that scales with the corpus
    * (linear in tokens). The 60,000 ppm literal is a declared calibration
    * knob (SURVEY §2.13) — at the fixture it flags 74/500 docs, mid-range
    * by construction. */
  def q203(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val nBigrams = size(col("w")) - 1
    docs
      .select(col("doc_id"), col("source"), nBigrams.cast(LongType).as("nb"),
        explode(zip_with(slice(col("w"), lit(1), nBigrams),
          slice(col("w"), lit(2), nBigrams),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      // nb is functionally dependent on doc_id; riding the keys keeps it
      // out of a separate length join
      .groupBy(col("doc_id"), col("source"), col("nb"),
        col("bg.w1"), col("bg.w2"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source", "nb").agg(max("c").as("topc"))
      .withColumn("share_ppm", expr("topc * 1000000 div nb"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("share_ppm") > 60000, 1L).otherwise(0L)).as("n_flagged"),
        max("share_ppm").as("max_share_ppm"))
      .withColumn("flagged_ppm", expr("n_flagged * 1000000 div n_docs"))
      .select("source", "n_docs", "n_flagged", "flagged_ppm", "max_share_ppm")
      .orderBy("source")
  }

  val q203Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      |), big AS (
      |  SELECT doc_id, source, len(w) - 1 AS nb, w[i] AS w1, w[i+1] AS w2,
      |    COUNT(*) AS c
      |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
      |        FROM toks WHERE len(w) >= 2)
      |  GROUP BY 1, 2, 3, 4, 5
      |), top AS (
      |  SELECT doc_id, source, nb, MAX(c) AS topc FROM big GROUP BY 1, 2, 3
      |), sh AS (
      |  SELECT source, topc * 1000000 // nb AS share_ppm FROM top
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN share_ppm > 60000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_flagged,
      |  CAST(SUM(CASE WHEN share_ppm > 60000 THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS flagged_ppm,
      |  CAST(MAX(share_ppm) AS BIGINT) AS max_share_ppm
      |FROM sh GROUP BY source ORDER BY source""".stripMargin

  /** q209 Heaps-law vocabulary-growth audit — the GROWTH-axis companion of
    * q167's Zipf (frequency-axis) health check: as a corpus grows, the
    * number of distinct 3-token shingle types should grow sublinearly
    * (Heaps/Herdan V ∝ n^β, β < 1); a type-rate curve that refuses to
    * fall signals synthetic/adversarial text, one that collapses signals
    * mass duplication. Corpus order is doc_id order; docs bucket into
    * OCTAVES (bitlen(doc_id+1), the q160/q167 integer-log surrogate), and
    * each shingle type is attributed to the octave of its FIRST occurrence
    * — the order-free min-doc attribution q189 uses for source novelty,
    * applied to the time axis. Per octave: new types, shingle slots, and
    * the cumulative type rate in ppm (falls from 1e6 toward 0 on healthy
    * text; spec asserts monotone non-increase).
    *
    * Scale shape: shingles hash to portable 60-bit keys (8-byte shuffle
    * rows, the q188 discipline) through the native codegen'd expression;
    * ONE type-keyed min aggregate + ONE octave-keyed count are the only
    * corpus-scale shuffles; the cumulative windows run on the ≤64-row
    * octave frame (unpartitioned-window inventory — bitlen-bounded by
    * construction). */
  def q209(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions
          .portableShingleHashes(col("text"), 3)).as("g"))
    val newTypes = sh.groupBy("g").agg(min("doc_id").as("d0"))
      .select(length(bin(col("d0") + 1)).cast(LongType).as("octave"))
      .groupBy("octave").agg(count(lit(1)).as("new_types"))
    val slots = sh
      .select(length(bin(col("doc_id") + 1)).cast(LongType).as("octave"))
      .groupBy("octave").agg(count(lit(1)).as("slots"))
    val cum = Window.partitionBy(lit(1)).orderBy("octave")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slots.join(newTypes, Seq("octave"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum("new_types").over(cum))
      .withColumn("cum_slots", sum("slots").over(cum))
      .withColumn("type_rate_ppm", expr("cum_types * 1000000 div cum_slots"))
      .select("octave", "new_types", "slots", "cum_types", "cum_slots",
        "type_rate_ppm")
      .orderBy("octave")
  }

  val q209Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |      1, 15) AS BIGINT))) AS g
      |  FROM toks WHERE len(w) >= 3
      |), newt AS (
      |  SELECT length(printf('%b', d0 + 1)) AS octave, COUNT(*) AS new_types
      |  FROM (SELECT g, MIN(doc_id) AS d0 FROM sh GROUP BY g) GROUP BY 1
      |), slots AS (
      |  SELECT length(printf('%b', doc_id + 1)) AS octave, COUNT(*) AS slots
      |  FROM sh GROUP BY 1
      |), j AS (
      |  SELECT s.octave, COALESCE(n.new_types, 0) AS new_types, s.slots
      |  FROM slots s LEFT JOIN newt n USING (octave)
      |)
      |SELECT CAST(octave AS BIGINT) AS octave,
      |  CAST(new_types AS BIGINT) AS new_types, CAST(slots AS BIGINT) AS slots,
      |  CAST(SUM(new_types) OVER (ORDER BY octave) AS BIGINT) AS cum_types,
      |  CAST(SUM(slots) OVER (ORDER BY octave) AS BIGINT) AS cum_slots,
      |  CAST(SUM(new_types) OVER (ORDER BY octave) * 1000000
      |    // SUM(slots) OVER (ORDER BY octave) AS BIGINT) AS type_rate_ppm
      |FROM j ORDER BY octave""".stripMargin

  /** q211 count-min sketch heavy hitters — the O(1)-memory estimator q91's
    * exact gate documents as its 100 TB alternative, built for real
    * (Cormode & Muthukrishnan 2005) and verified cross-engine: a d=4 ×
    * w=256 counter array (independent md5 row hashes, the engine-portable
    * q44/q84 bucket primitive), point estimate = min over the 4 rows, and
    * the top-20 tokens by ESTIMATE with their exact counts and the
    * (always ≥ 0) overestimate. Because the sketch is deterministic
    * integer arithmetic, the DuckDB oracle replays the ENTIRE sketch —
    * cell counts, min-of-rows estimate, ranking — so the classic
    * "estimate ≥ truth, error bounded by collisions" contract is
    * hash-checked, not just spec-asserted.
    *
    * Scale shape — why a sketch at all: the cell frame is ≤ d·w = 1024
    * rows NO MATTER the corpus (each task combines map-side into ≤1024
    * cells; shuffle bytes are executor-count-sized), where q91's exact
    * count shuffles the full vocabulary. The candidate probe set here is
    * the distinct-token frame (fixture-sized); in production the probe set
    * is whatever watchlist you query the sketch with — the sketch itself
    * never stores a token. The estimate join is 1024-row broadcast-sized
    * by construction. */
  def q211(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    val rows = explode(array((0 until 4).map(lit): _*)).as("r")
    val cells = toks.select(col("token"), rows)
      .select(col("r"), graft.functions.TextFunctions
        .hashBucket(concat(col("token"), lit("#"), col("r").cast(StringType)), 256).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    exact.select(col("token"), col("exact_cnt"), rows)
      .withColumn("bucket", graft.functions.TextFunctions
        .hashBucket(concat(col("token"), lit("#"), col("r").cast(StringType)), 256))
      .join(broadcast(cells), Seq("r", "bucket")) // ≤1024 rows by construction
      .groupBy("token", "exact_cnt").agg(min("cnt").as("est_cnt"))
      .withColumn("over_cnt", col("est_cnt") - col("exact_cnt"))
      .select("token", "est_cnt", "exact_cnt", "over_cnt")
      .orderBy(desc("est_cnt"), col("token"))
      .limit(20)
  }

  val q211Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |), occ AS (
      |  SELECT token, r,
      |    CAST('0x' || substr(md5(token || '#' || CAST(r AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 256 AS bucket
      |  FROM toks, (SELECT unnest([0, 1, 2, 3]) AS r)
      |), cells AS (
      |  SELECT r, bucket, COUNT(*) AS cnt FROM occ GROUP BY r, bucket
      |), exact AS (
      |  SELECT token, COUNT(*) AS exact_cnt FROM toks GROUP BY token
      |), probe AS (
      |  SELECT e.token, e.exact_cnt, r,
      |    CAST('0x' || substr(md5(e.token || '#' || CAST(r AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 256 AS bucket
      |  FROM exact e, (SELECT unnest([0, 1, 2, 3]) AS r)
      |)
      |SELECT p.token, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt,
      |  CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
      |  CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS over_cnt
      |FROM probe p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
      |GROUP BY p.token, p.exact_cnt
      |ORDER BY est_cnt DESC, token LIMIT 20""".stripMargin

  /** q232 count-min SHARD MERGE — the deployment path of q211's sketch,
    * built and proved in-engine: at 100 TB a sketch is never built in one
    * reduce — each shard (here the q84/q210 md5 doc-shard, in production a
    * partition, a day, a data center) builds its OWN d×w counter array,
    * and the corpus sketch is the CELL-WISE SUM of the shard sketches
    * (count-min's defining property: the cell counters are linear, so the
    * merge is exact, not approximate — Cormode & Muthukrishnan 2005 §4.2).
    * This query runs exactly that topology: per-(shard, row, bucket)
    * counts, then the ≤1024-cell merge with each cell's contributing-shard
    * count — and the DuckDB oracle builds the SAME sketch the direct
    * one-pass way, so the hash gate IS the associativity proof: sharded
    * build + merge ≡ single-pass build, cross-engine, cell for cell.
    *
    * Scale shape: ONE corpus pass; every task map-combines into
    * ≤ shards·d·w cells before the shuffle (8·1024 here — still
    * executor-count-sized bytes), the merge collapses to ≤1024 rows NO
    * MATTER the corpus, and nothing token-shaped ever shuffles. The same
    * plan merges month-sketches into a year-sketch: only the shard key
    * changes. */
  def q232(spark: SparkSession, dir: String): DataFrame = {
    val rows = explode(array((0 until 4).map(lit): _*)).as("r")
    val shardCells = tokens(spark, dir)
      .select(graft.functions.TextFunctions.hashBucket(col("doc_id"), 8)
          .as("shard"),
        col("token"), rows)
      .select(col("shard"), col("r").cast(LongType).as("r"),
        graft.functions.TextFunctions
          .hashBucket(concat(col("token"), lit("#"), col("r").cast(StringType)), 256)
          .as("bucket"))
      .groupBy("shard", "r", "bucket").agg(count(lit(1)).as("cnt"))
    shardCells
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("n_shards"), sum("cnt").as("cnt"))
      .orderBy("r", "bucket")
  }

  /** The oracle builds the sketch the direct single-pass way (no shard
    * stage) — equality with the Spark side's shard-merged cells is the
    * merge-correctness proof. */
  val q232Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |), occ AS (
      |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 8 AS shard,
      |    r,
      |    CAST('0x' || substr(md5(token || '#' || CAST(r AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 256 AS bucket
      |  FROM toks, (SELECT unnest([0, 1, 2, 3]) AS r)
      |)
      |SELECT CAST(r AS BIGINT) AS r, bucket,
      |  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM occ GROUP BY r, bucket ORDER BY r, bucket""".stripMargin

  /** q219 inter-event burstiness histogram — the traffic-shape audit
    * behind bot/replay detection (and the hazard-model complement of
    * q196's survival curve): per event type, each user's consecutive
    * inter-event gaps in ms, bucketed into OCTAVES (bitlen, the
    * q160/q209 integer-log surrogate — sub-ms replay storms land in low
    * octaves, human think-time spreads over high ones, and a too-narrow
    * octave profile is the "suspiciously regular" cadence flag q187's
    * magnitude EWMA cannot see). Zero-gap (same-ms) arrivals get their
    * own octave 0 — collapsing them into octave 1 would hide exactly the
    * replay signature the histogram exists to catch.
    *
    * Scale shape: ONE lag window keyed by (user, type) — the q38/q187
    * per-user ordering the stream processors already impose — then one
    * ≤\|types\|·64-cell map-combined aggregate; shares in exact ppm of
    * each type's gap population. */
  def q219(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ms", "event_id")
    val all = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("gap", col("ms") - lag("ms", 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col("event_type"),
        when(col("gap") === 0L, 0L)
          .otherwise(length(bin(col("gap"))).cast(LongType)).as("octave"))
      .groupBy("event_type", "octave")
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("t_gaps", sum("n_gaps").over(all))
      .withColumn("share_ppm", expr("n_gaps * 1000000 div t_gaps"))
      .select("event_type", "octave", "n_gaps", "share_ppm")
      .orderBy("event_type", "octave")
  }

  val q219Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_ms(ts) AS ms
      |  FROM events
      |), g AS (
      |  SELECT event_type,
      |    ms - LAG(ms) OVER (PARTITION BY user_id, event_type
      |      ORDER BY ms, event_id) AS gap
      |  FROM e
      |), o AS (
      |  SELECT event_type,
      |    CASE WHEN gap = 0 THEN 0
      |      ELSE length(printf('%b', gap)) END AS octave
      |  FROM g WHERE gap IS NOT NULL
      |), c AS (
      |  SELECT event_type, octave, COUNT(*) AS n_gaps FROM o GROUP BY 1, 2
      |)
      |SELECT event_type, CAST(octave AS BIGINT) AS octave,
      |  CAST(n_gaps AS BIGINT) AS n_gaps,
      |  CAST(n_gaps * 1000000 // SUM(n_gaps) OVER (PARTITION BY event_type)
      |    AS BIGINT) AS share_ppm
      |FROM c ORDER BY event_type, octave""".stripMargin

  /** q220 range-partition boundary planner — the table behind every
    * globally-sorted layout (`Load.overwriteSorted`, sort-merge shuffles,
    * Spark's own RangePartitioner sampling): 31 cut points splitting
    * orders into 32 near-equal ranges by total price. Spark PLANS these
    * boundaries by driver-side reservoir sampling (approximate,
    * nondeterministic); this is the EXACT, deterministic version at grid
    * granularity — values quantize to 100-dollar bins first (the
    * q142/q182 bound-the-domain discipline: an ECDF over raw near-unique
    * prices would be a corpus-sized single-partition window, the q108
    * cost), the ECDF is one cumulative window over the ≤\|bins\| frame,
    * and boundary k = min bin whose cumulative count reaches
    * ⌈k·N/32⌉ (exact ceil in integers). The 31-target frame joins the
    * bin ECDF by a ≥ predicate — a BroadcastNestedLoopJoin over a
    * literal-sized side (the q46 band-join shape), never a shuffle.
    *
    * Scale shape: ONE map-combined bin aggregate is the only corpus
    * pass; everything after is bin-frame arithmetic. Grid width is the
    * declared knob — tighten it for finer boundaries at the cost of a
    * larger (still value-bounded) bin frame. */
  def q220(spark: SparkSession, dir: String): DataFrame = {
    val bins = Tables.load(spark, dir, "orders")
      .select(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) div 10000")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val cum = bins.withColumn("cum", sum("n").over(Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = bins.agg(sum("n").as("N")) // 1-row scalar
    spark.range(1, 32).select(col("id").as("k"))
      .crossJoin(broadcast(tot))
      .withColumn("target_rank", expr("(k * N + 31) div 32"))
      .join(cum, col("cum") >= col("target_rank"))
      .groupBy("k", "target_rank").agg(min("bin").as("boundary_bin"))
      .withColumn("boundary_cents", expr("boundary_bin * 10000"))
      .select("k", "target_rank", "boundary_bin", "boundary_cents")
      .orderBy("k")
  }

  val q220Sql: String =
    """WITH c AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) // 10000 AS bin
      |  FROM orders
      |), b AS (
      |  SELECT bin, COUNT(*) AS n FROM c GROUP BY bin
      |), cum AS (
      |  SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum FROM b
      |), tot AS (SELECT COUNT(*) AS N FROM c
      |), t AS (
      |  SELECT r.k, (r.k * tot.N + 31) // 32 AS target_rank
      |  FROM range(1, 32) r(k) CROSS JOIN tot
      |)
      |SELECT t.k, CAST(t.target_rank AS BIGINT) AS target_rank,
      |  CAST(MIN(cum.bin) AS BIGINT) AS boundary_bin,
      |  CAST(MIN(cum.bin) * 10000 AS BIGINT) AS boundary_cents
      |FROM t JOIN cum ON cum.cum >= t.target_rank
      |GROUP BY t.k, t.target_rank ORDER BY t.k""".stripMargin

  /** Sample size / sketch width for q276's bottom-k sketch. */
  private[graft] val KmvK = 64

  /** THE KMV estimator N̂ = (k−1)·2⁶⁰ div h_k in decimal(38,0) (int64
    * numerator overflows; DuckDB replays in HUGEINT) — one definition
    * shared by [[kmvSketch]] (q276) and `Advanced.cardFromDigests` (q277)
    * over columns named kmv_k / kth_min_fp, so the 2⁶⁰ constant and the
    * zero-guard can never desync (r14 session-2 review finding). The two
    * call sites keep their OWN exact-regime conditions — q276 tests the
    * true n_distinct it carries, the card only has kmv_k. */
  private[graft] val kmvEstimateExpr: org.apache.spark.sql.Column =
    expr("cast((cast(kmv_k as decimal(38,0)) - 1) * " +
      "cast(1152921504606846976 as decimal(38,0)) div " +
      "cast(greatest(kth_min_fp, 1) as decimal(38,0)) as bigint)")

  /** q276 bottom-k (KMV) distinct-content sketch + consistent sample (new
    * r14; Bar-Yossef et al. 2002, "Counting distinct elements in a data
    * stream") — the THIRD mergeable sketch next to q211/q232's count-min
    * (frequency axis) and q273's log-bucket quantiles (distribution axis),
    * covering the DISTINCT-COUNT axis: per source, keep the [[KmvK]]
    * smallest 60-bit content fingerprints; the k-th smallest hash is an
    * unbiased density probe, N̂ = (k−1)·2⁶⁰ div h_k (computed in
    * decimal(38,0) — the int64 numerator would overflow; DuckDB replays it
    * in HUGEINT), and the sampled fingerprints double as a CONSISTENT
    * content sample — the same texts are sampled in every snapshot and on
    * every shard, which is what makes bottom-k sets mergeable: the
    * bottom-k of a union is the bottom-k of the per-shard bottom-k's
    * (spec-pinned in StatsSpec), the property reservoir sampling lacks.
    * Emits the exact distinct count beside the estimate (the q91/q211
    * exact-gate discipline: the fixture prices the sketch's error), the
    * pinned k-th hash, and membership checksums (fp XOR — 64 60-bit fps would overflow an int64 SUM — plus the min-doc-id sum).
    * Scale shape: one fp projection, one (source, fp)-keyed dedup
    * aggregate, one rank window over source-keyed partitions pruned to
    * k rows map-side (WindowGroupLimit), a ≤|sources|·k rollup — nothing
    * corpus-wide ever sorts. Sources with ≤ k distinct texts report the
    * sketch-exact regime: estimate = the distinct count itself. */
  /** The q276 kernel over any (source, fp, doc_id) frame — factored out so
    * the spec can feed planted corpora and shard-merged sample sets. */
  private[graft] def kmvSketch(f: DataFrame): DataFrame = {
    val d = f.groupBy("source", "fp").agg(
      count(lit(1)).as("n_copies"), min(col("doc_id")).as("min_id"))
    val stats = d.groupBy("source").agg(
      sum(col("n_copies")).as("n_docs"),
      count(lit(1)).as("n_distinct"))
    val rk = d.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("fp")))
      .filter(col("rk") <= KmvK)
    val sk = rk.groupBy("source").agg(
      count(lit(1)).as("kmv_k"),
      max(col("fp")).as("kth_min_fp"),
      bit_xor(col("fp")).as("sample_fp_xor"),
      sum(col("min_id")).as("sample_id_sum"))
    stats.join(sk, Seq("source"))
      .withColumn("kmv_estimate",
        when(col("n_distinct") <= KmvK, col("n_distinct"))
          .otherwise(kmvEstimateExpr))
      .select("source", "n_docs", "n_distinct", "kmv_k", "kth_min_fp",
        "kmv_estimate", "sample_fp_xor", "sample_id_sum")
  }

  def q276(spark: SparkSession, dir: String): DataFrame =
    // NULL text reads as empty text: md5(NULL) is NULL in BOTH engines but
    // they rank NULLs on opposite ends (Spark NULLS FIRST asc, DuckDB
    // NULLS LAST), so a NULL fp would break the hash gate — coalesce
    // before hashing keeps the rank windows engine-portable
    kmvSketch(Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"),
        graft.functions.TextFunctions.portableHash60(
          coalesce(col("text"), lit(""))).as("fp"),
        col("doc_id")))
      .orderBy("source")

  val q276Sql: String =
    s"""WITH f AS (
      |  SELECT source,
      |    CAST('0x' || substr(md5(COALESCE(text, '')), 1, 15) AS BIGINT) AS fp,
      |    doc_id
      |  FROM documents
      |), d AS (
      |  SELECT source, fp, COUNT(*) AS n_copies,
      |    MIN(doc_id) AS min_id
      |  FROM f GROUP BY source, fp
      |), stats AS (
      |  SELECT source, CAST(SUM(n_copies) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct
      |  FROM d GROUP BY source
      |), rk AS (
      |  SELECT source, fp, min_id,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY fp) AS rk
      |  FROM d
      |), sk AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS kmv_k,
      |    CAST(MAX(fp) AS BIGINT) AS kth_min_fp,
      |    CAST(BIT_XOR(fp) AS BIGINT) AS sample_fp_xor,
      |    CAST(SUM(min_id) AS BIGINT) AS sample_id_sum
      |  FROM rk WHERE rk <= $KmvK GROUP BY source
      |)
      |SELECT s.source, s.n_docs, s.n_distinct, k.kmv_k, k.kth_min_fp,
      |  CASE WHEN s.n_distinct <= $KmvK THEN s.n_distinct
      |    ELSE CAST((CAST(k.kmv_k AS HUGEINT) - 1)
      |      * CAST(1152921504606846976 AS HUGEINT)
      |      // CAST(GREATEST(k.kth_min_fp, 1) AS HUGEINT) AS BIGINT) END
      |    AS kmv_estimate,
      |  k.sample_fp_xor, k.sample_id_sum
      |FROM stats s JOIN sk k ON k.source = s.source
      |ORDER BY s.source""".stripMargin

  // ---- q282 peak-concurrency sweep -----------------------------------------

  /** q282 peak-concurrency census — the capacity number an ops pipeline
    * reads off a session table: per day, how many sessions were EVER alive
    * at once, and when. Sessions are the q38 30-minute-gap islands (closed
    * [first, last] ms intervals); each is clipped to the days it touches, a
    * +1/−1 sweep runs per day, and the peak is the max prefix with its
    * first-achieving millisecond. Starts order before ends at the same
    * millisecond, so touching sessions COUNT as concurrent (declared).
    *
    * Scale shape — the sweep is HIERARCHICAL over THREE tiers, never one
    * day-sized (or hour-sized) window: the raw prefix sum runs inside
    * (day, minute) partitions (at most a minute of deltas in any sorted
    * window), per-minute totals roll up through a ≤ 60-row per-hour window
    * into minute offsets, per-hour totals through a ≤ 24-row per-day
    * window into hour offsets, and each level's peak is the max over
    * children of offset + within-child max prefix (exactly the parent's
    * prefix max, because children partition the parent's timeline). A
    * flash-crowd day OR hour with a billion sessions at 100 TB never
    * materializes a wide sorted partition — the q199/q245 keyed-window
    * discipline applied two levels deeper (r14 VERDICT #4). */
  def q282(spark: SparkSession, dir: String): DataFrame =
    q282From(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_millis(ts)").as("tms")))

  /** [[q282]] over an arbitrary (user_id, event_id, tms-millis) frame —
    * spec entry point (planted-interval fixtures). */
  def q282From(e: DataFrame): DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val sess = e
      .withColumn("prev", lag("tms", 1).over(uw))
      .withColumn("new_s",
        when(col("prev").isNull || col("tms") - col("prev") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(uw))
      .groupBy("user_id", "sid")
      .agg(min("tms").as("sms"), max("tms").as("ems"))
    concurrencySweep(sess)
  }

  /** STREAMING leg of q282: fold per-batch CLOSED-session digests (written
    * by [[graft.streaming.EventStream.sessionDigestStream]] — the
    * flatMapGroupsWithState sessionizer with open sessions held in state)
    * and run the identical hierarchical sweep. The session id surrogate is
    * start_ms — the sweep's output is invariant to which deterministic
    * per-session key breaks intra-millisecond ties (starts already order
    * before ends, and equal-delta orderings permute prefix values only
    * within an equal-pms run, never the max). StreamingSpec pins
    * merged == the batch q282 on the closed-session population. */
  def concurrencyReadMerged(spark: SparkSession, dirs: Seq[String])
      : DataFrame =
    concurrencySweep(
      dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _)
        .select(col("user_id"), col("start_ms").as("sid"),
          col("start_ms").as("sms"), col("end_ms").as("ems")))

  /** The q282 interval sweep over a prepared (user_id, sid, sms, ems)
    * session frame — shared by the batch window path and the streaming
    * merge-on-read path. */
  private[graft] def concurrencySweep(sess: DataFrame): DataFrame = {
    val perDay = sess
      .withColumn("d",
        explode(expr("sequence(sms div 86400000, ems div 86400000)")))
      .withColumn("pms_s", greatest(col("sms"), col("d") * 86400000L))
      .withColumn("pms_e",
        least(col("ems"), col("d") * 86400000L + 86399999L))
    val deltas = perDay.select(col("d"), col("user_id"), col("sid"),
        col("pms_s").as("pms"), lit(1L).as("delta"))
      .union(perDay.select(col("d"), col("user_id"), col("sid"),
        col("pms_e").as("pms"), lit(-1L).as("delta")))
      .withColumn("h", expr("pms div 3600000"))
      .withColumn("mnt", expr("pms div 60000"))
    // THIRD tier (r14 VERDICT #4, the declared flash-crowd residual): the
    // raw prefix sum runs inside (day, hour, MINUTE) partitions — at most
    // a minute of deltas in any sorted window — then per-minute totals
    // roll up through a ≤60-row per-hour window into minute offsets, and
    // the hour's max prefix is the max over minutes of offset + the
    // within-minute max prefix (exactly the hour-level prefix max, because
    // minutes partition the hour's timeline; the argmax tie-break
    // composes the same way: constant offsets preserve within-minute
    // argmax positions, and max(struct(peak, -pms)) picks the earliest
    // millisecond among equal peaks at every level). A flash-crowd HOUR
    // with a billion deltas never materializes an hour-wide sorted
    // partition; a flash-crowd MINUTE is the declared next residual, three
    // orders of magnitude further out.
    val mw = Window.partitionBy("d", "mnt")
      .orderBy(col("pms"), col("delta").desc, col("user_id"), col("sid"))
    val minutely = deltas.withColumn("run_m", sum("delta").over(mw))
      .groupBy("d", "h", "mnt").agg(
        sum("delta").as("tot_m"),
        max(struct(col("run_m"), (-col("pms")).as("npms"))).as("b"))
      .select(col("d"), col("h"), col("mnt"), col("tot_m"),
        col("b.run_m").as("max_run_m"), (-col("b.npms")).as("peak_pms_m"))
    val mow = Window.partitionBy("d", "h").orderBy("mnt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val hourly = minutely
      .withColumn("moffset", coalesce(sum("tot_m").over(mow), lit(0L)))
      .withColumn("mpeak", col("moffset") + col("max_run_m"))
      .groupBy("d", "h").agg(
        sum("tot_m").as("tot"),
        max(struct(col("mpeak"), (-col("peak_pms_m")).as("npms"))).as("b"))
      .select(col("d"), col("h"), col("tot"),
        col("b.mpeak").as("max_run"), (-col("b.npms")).as("peak_pms_h"))
    val ow = Window.partitionBy("d").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val peaks = hourly
      .withColumn("offset", coalesce(sum("tot").over(ow), lit(0L)))
      .withColumn("hpeak", col("offset") + col("max_run"))
      .groupBy("d").agg(
        max(struct(col("hpeak"), (-col("peak_pms_h")).as("npms"))).as("b"))
      .select(col("d").as("day"), col("b.hpeak").as("peak_concurrent"),
        (-col("b.npms")).as("peak_ms"))
    perDay.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("n_sessions"))
      .join(peaks, Seq("day"))
      .orderBy("day")
  }

  val q282Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS tms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id, tms,
      |    CASE WHEN prev IS NULL OR tms - prev > 1800000 THEN 1 ELSE 0 END
      |      AS new_s
      |  FROM e
      |), s AS (
      |  SELECT user_id, tms,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m
      |), sess AS (
      |  SELECT user_id, sid, MIN(tms) AS sms, MAX(tms) AS ems
      |  FROM s GROUP BY user_id, sid
      |), pd AS (
      |  SELECT user_id, sid, sms, ems,
      |    unnest(range(sms // 86400000, ems // 86400000 + 1)) AS d
      |  FROM sess
      |), pdc AS (
      |  SELECT user_id, sid, d,
      |    GREATEST(sms, d * 86400000) AS pms_s,
      |    LEAST(ems, d * 86400000 + 86399999) AS pms_e
      |  FROM pd
      |), deltas AS (
      |  SELECT d, user_id, sid, pms_s AS pms, 1 AS delta FROM pdc
      |  UNION ALL
      |  SELECT d, user_id, sid, pms_e AS pms, -1 AS delta FROM pdc
      |), dh AS (
      |  SELECT d, user_id, sid, pms, delta, pms // 3600000 AS h FROM deltas
      |), runs AS (
      |  SELECT d, h, pms, delta,
      |    SUM(delta) OVER (PARTITION BY d, h
      |      ORDER BY pms, delta DESC, user_id, sid
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_h
      |  FROM dh
      |), hx AS (
      |  SELECT d, h, tot, max_run, peak_pms_h FROM (
      |    SELECT d, h, pms AS peak_pms_h, run_h,
      |      SUM(delta) OVER (PARTITION BY d, h) AS tot,
      |      MAX(run_h) OVER (PARTITION BY d, h) AS max_run,
      |      ROW_NUMBER() OVER (PARTITION BY d, h
      |        ORDER BY run_h DESC, pms) AS rk
      |    FROM runs
      |  ) WHERE rk = 1
      |), offs AS (
      |  SELECT d, h, max_run, peak_pms_h,
      |    COALESCE(SUM(tot) OVER (PARTITION BY d ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM hx
      |), peaks AS (
      |  SELECT day, peak_concurrent, peak_ms FROM (
      |    SELECT d AS day, off + max_run AS peak_concurrent,
      |      peak_pms_h AS peak_ms,
      |      ROW_NUMBER() OVER (PARTITION BY d
      |        ORDER BY off + max_run DESC, peak_pms_h) AS rk
      |    FROM offs
      |  ) WHERE rk = 1
      |), ns AS (
      |  SELECT d AS day, COUNT(*) AS n_sessions FROM pdc GROUP BY d
      |)
      |SELECT CAST(ns.day AS BIGINT) AS day,
      |  CAST(ns.n_sessions AS BIGINT) AS n_sessions,
      |  CAST(p.peak_concurrent AS BIGINT) AS peak_concurrent,
      |  CAST(p.peak_ms AS BIGINT) AS peak_ms
      |FROM ns JOIN peaks p ON p.day = ns.day
      |ORDER BY day""".stripMargin

  // ---- q283 CUSUM changepoint / q284 autocorrelation -----------------------

  /** The densified (event_type × hour) count series both detectors read:
    * every hour that appears anywhere in the table appears for every type
    * (zero-filled), so a type that goes silent REGISTERS as a level shift
    * instead of silently shortening its series. Hour spine × type census is
    * time-bounded (hours since epoch), never corpus-bounded. */
  private def hourlySeries(spark: SparkSession, dir: String): DataFrame =
    hourlySeriesFrom(Tables.load(spark, dir, "events")
      .select(expr("unix_millis(ts) div 3600000").as("hour"),
        col("event_type")))

  /** [[hourlySeries]] over an arbitrary (hour, event_type) frame — spec
    * entry point (planted level shifts / planted periodicity). */
  def hourlySeriesFrom(e: DataFrame): DataFrame =
    densifyHourly(e.groupBy("event_type", "hour").agg(count(lit(1)).as("n")))

  /** Zero-fill a sparse (event_type, hour, n) count frame over the full
    * hour-spine × type census — shared by the batch path and the streaming
    * merge-on-read path so both detectors read the IDENTICAL series. */
  private def densifyHourly(counts0: DataFrame): DataFrame = {
    val counts = counts0.groupBy("event_type", "hour")
      .agg(sum("n").as("n"))
    counts.select("hour").distinct()
      .crossJoin(counts.select("event_type").distinct())
      .join(counts, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** STREAMING leg of q283/q284 — the detector-maintenance shape at 100 TB:
    * the stream never re-runs CUSUM over history; it appends per-micro-batch
    * HOURLY COUNT DIGESTS (counts are the mergeable object — order-free,
    * replay-idempotent by batch-dir overwrite), and the detector assembles
    * merge-on-read from the digest store (the q277 card LSM discipline).
    * Readers pay ≤ |batches|·|types|·|hours-per-batch| digest rows, never an
    * event rescan; the recurrence itself runs on the digest-sized merged
    * series. StreamingSpec pins merged == the batch q283 exactly. */
  def cusumStream(spark: SparkSession, eventStream: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    eventStream
      .select(expr("unix_millis(ts) div 3600000").as("hour"),
        col("event_type"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.toDF().groupBy("event_type", "hour")
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  /** Assemble the CUSUM report from persisted hourly digests (glob paths
    * welcome). Digest cells for the same (type, hour) across batches SUM —
    * a batch boundary inside an hour merges exactly. */
  def cusumReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    q283From(densifyHourly(
      dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _)))

  private val hourlySeriesCte: String =
    """h AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hour, event_type FROM events
      |), cnt AS (
      |  SELECT event_type, hour, COUNT(*) AS n FROM h GROUP BY 1, 2
      |), spine AS (
      |  SELECT t.event_type, d.hour
      |  FROM (SELECT DISTINCT hour FROM h) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM h) t
      |), ser AS (
      |  SELECT s.event_type, s.hour, COALESCE(c.n, 0) AS n
      |  FROM spine s LEFT JOIN cnt c
      |    ON c.event_type = s.event_type AND c.hour = s.hour
      |)""".stripMargin

  /** q283 CUSUM level-shift detector (Page, Biometrika 1954) over each
    * event type's hourly count series — the sequential changepoint test a
    * pipeline-health monitor runs where q199's MAD gate only flags isolated
    * hours: S⁺_t = max(0, S⁺_{t−1} + (x_t − (μ+κ))) accumulates persistent
    * upward drift (κ = μ/2 slack, so noise around the mean bleeds off) and
    * alarms at h = 4μ; S⁻ mirrors it downward. The max(0,·) recurrence
    * looks inherently sequential, but it LINEARIZES: with prefix sums
    * P_t of the micro-unit deviations, S_t = P_t − min(0, min_{j≤t} P_j) —
    * a running sum and a running min, two keyed window functions, NO
    * mapPartitions state machine and no driver loop. Per type: first alarm
    * hour (−1 = clean), alarm count, and the max statistic, both
    * directions. All in micro-units (counts ×10⁶) with truncating integer
    * division only on non-negatives. Series length is hours-since-epoch —
    * time-bounded, so the per-type window partition never scales with
    * corpus size, only with calendar span. */
  def q283(spark: SparkSession, dir: String): DataFrame =
    q283From(hourlySeries(spark, dir))

  /** [[q283]] over a prepared (event_type, hour, n) series — spec entry
    * point (planted level-shift fixtures). */
  def q283From(series: DataFrame): DataFrame = {
    val tw = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allw = Window.partitionBy("event_type")
    val ser = series
      .withColumn("n_hours", count(lit(1)).over(allw))
      // the corpus-scale sum rides decimal(38,0)/HUGEINT through the ×10⁶
      // product (the q290 discipline — int64 wraps silently here past
      // ~9.2e12 events per type while DuckDB raises); `div` lands the
      // per-hour mean back in int64. The per-hour deviations and their
      // prefix sums stay int64 — safe below ~9.2e12 micro-units of
      // accumulated drift per type, a declared ceiling of the q238 class
      // (calendar-bounded series × per-hour counts, not corpus-scaled).
      .withColumn("mean_micro", expr(
        "cast(sum(n) over (partition by event_type) as decimal(38,0))" +
          " * 1000000 div n_hours"))
      .withColumn("dev_up", expr(
        "n * 1000000 - (mean_micro + mean_micro div 2)"))
      .withColumn("dev_dn", expr(
        "(mean_micro - mean_micro div 2) - n * 1000000"))
      .withColumn("p_up", sum("dev_up").over(tw))
      .withColumn("p_dn", sum("dev_dn").over(tw))
      .withColumn("s_up",
        col("p_up") - least(lit(0L), min("p_up").over(tw)))
      .withColumn("s_dn",
        col("p_dn") - least(lit(0L), min("p_dn").over(tw)))
      .withColumn("thr", expr("4 * mean_micro"))
    ser.groupBy("event_type").agg(
      max("n_hours").as("n_hours"),
      max("mean_micro").as("mean_micro"),
      coalesce(min(when(col("s_up") >= col("thr"), col("hour"))), lit(-1L))
        .as("up_first_alarm_hour"),
      sum(when(col("s_up") >= col("thr"), 1L).otherwise(0L))
        .as("up_alarm_hours"),
      max("s_up").as("up_max_micro"),
      coalesce(min(when(col("s_dn") >= col("thr"), col("hour"))), lit(-1L))
        .as("dn_first_alarm_hour"),
      sum(when(col("s_dn") >= col("thr"), 1L).otherwise(0L))
        .as("dn_alarm_hours"),
      max("s_dn").as("dn_max_micro"))
      .orderBy("event_type")
  }

  val q283Sql: String =
    s"""WITH $hourlySeriesCte, st AS (
      |  SELECT event_type, hour, n,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n_hours,
      |    CAST(CAST(SUM(n) OVER (PARTITION BY event_type) AS HUGEINT)
      |      * 1000000
      |      // COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS mean_micro
      |  FROM ser
      |), dv AS (
      |  SELECT event_type, hour, n, n_hours, mean_micro,
      |    n * 1000000 - (mean_micro + mean_micro // 2) AS dev_up,
      |    (mean_micro - mean_micro // 2) - n * 1000000 AS dev_dn
      |  FROM st
      |), pf AS (
      |  SELECT event_type, hour, n_hours, mean_micro,
      |    SUM(dev_up) OVER w AS p_up, SUM(dev_dn) OVER w AS p_dn
      |  FROM dv
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), cs AS (
      |  SELECT event_type, hour, n_hours, mean_micro,
      |    p_up - LEAST(0, MIN(p_up) OVER w) AS s_up,
      |    p_dn - LEAST(0, MIN(p_dn) OVER w) AS s_dn,
      |    4 * mean_micro AS thr
      |  FROM pf
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_type,
      |  CAST(MAX(n_hours) AS BIGINT) AS n_hours,
      |  CAST(MAX(mean_micro) AS BIGINT) AS mean_micro,
      |  CAST(COALESCE(MIN(CASE WHEN s_up >= thr THEN hour END), -1)
      |    AS BIGINT) AS up_first_alarm_hour,
      |  CAST(SUM(CASE WHEN s_up >= thr THEN 1 ELSE 0 END) AS BIGINT)
      |    AS up_alarm_hours,
      |  CAST(MAX(s_up) AS BIGINT) AS up_max_micro,
      |  CAST(COALESCE(MIN(CASE WHEN s_dn >= thr THEN hour END), -1)
      |    AS BIGINT) AS dn_first_alarm_hour,
      |  CAST(SUM(CASE WHEN s_dn >= thr THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dn_alarm_hours,
      |  CAST(MAX(s_dn) AS BIGINT) AS dn_max_micro
      |FROM cs GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q284 autocorrelation function (lags 1–6) of each type's hourly count
    * series — the periodicity detector next to q126's trend slope and
    * q219's burstiness: r_k = Σ(x_t−m)(x_{t+k}−m) / Σ(x_t−m)², centered on
    * the FLOOR mean m = ⌊Σx/n⌋ so every product is a small exact integer
    * (the exact-rational centering differs by < 1 count per hour — a
    * declared portability trade, same class as q270's truncating weights).
    * The numerator's sign splits around the truncating division (Spark
    * `div` truncates toward zero, DuckDB `//` floors — negatives must
    * never reach the divide). Lagged pairs ride lead() over the same
    * type-keyed window as q283; the denominator is the full-series sum of
    * squares at every lag (the standard ACF normalization). */
  def q284(spark: SparkSession, dir: String): DataFrame =
    q284From(hourlySeries(spark, dir))

  /** [[q284]] over a prepared (event_type, hour, n) series — spec entry
    * point (planted-period fixtures). */
  def q284From(series: DataFrame): DataFrame = {
    val tw = Window.partitionBy("event_type").orderBy("hour")
    val allw = Window.partitionBy("event_type")
    // scratch-barrier the centered series: the 6 lag branches below union
    // over it, and without the barrier each branch would re-scan events
    val dev = graft.operators.Checkpoints.scratch(series
      .withColumn("m",
        expr("sum(n) over (partition by event_type) div " +
          "count(*) over (partition by event_type)"))
      .withColumn("dev", col("n") - col("m"))
      .withColumn("den", sum(expr("dev * dev")).over(allw)))
    val lags = (1 to 6).map { k =>
      dev.withColumn("lagk", lit(k.toLong))
        .withColumn("devk", lead("dev", k).over(tw))
        .filter(col("devk").isNotNull)
    }.reduce(_ union _)
    lags.groupBy("event_type", "lagk").agg(
      count(lit(1)).as("n_pairs"),
      sum(expr("dev * devk")).as("num"),
      max("den").as("den"))
      .withColumn("acf_ppm", when(col("num") >= 0,
        expr("num * 1000000 div greatest(den, 1)"))
        .otherwise(-expr("(-num) * 1000000 div greatest(den, 1)")))
      .select("event_type", "lagk", "n_pairs", "acf_ppm")
      .orderBy("event_type", "lagk")
  }

  val q284Sql: String =
    s"""WITH $hourlySeriesCte, dv AS (
      |  SELECT event_type, hour,
      |    n - (SUM(n) OVER (PARTITION BY event_type)
      |         // COUNT(*) OVER (PARTITION BY event_type)) AS dev
      |  FROM ser
      |), dn AS (
      |  SELECT event_type, hour, dev,
      |    SUM(dev * dev) OVER (PARTITION BY event_type) AS den
      |  FROM dv
      |), ix AS (
      |  SELECT event_type, hour, dev, den,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS idx
      |  FROM dn
      |), lagged AS (
      |  SELECT a.event_type, k.lagk, a.dev, a.den, b.dev AS devk
      |  FROM ix a
      |  CROSS JOIN (SELECT unnest(range(1, 7)) AS lagk) k
      |  JOIN ix b ON b.event_type = a.event_type AND b.idx = a.idx + k.lagk
      |), g AS (
      |  SELECT event_type, lagk, COUNT(*) AS n_pairs,
      |    SUM(dev * devk) AS num, MAX(den) AS den
      |  FROM lagged
      |  GROUP BY event_type, lagk
      |)
      |SELECT event_type, CAST(lagk AS BIGINT) AS lagk,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(CASE WHEN num >= 0 THEN num * 1000000 // GREATEST(den, 1)
      |    ELSE -((-num) * 1000000 // GREATEST(den, 1)) END AS BIGINT)
      |    AS acf_ppm
      |FROM g ORDER BY event_type, lagk""".stripMargin

  // ---- q290 join-cardinality estimation audit ------------------------------

  /** q290 join-size estimation audit — the optimizer statistic that decides
    * broadcast-vs-shuffle and join order at 100 TB, priced against ground
    * truth on a real many-to-many key (events.user_id ⋈ orders.o_custkey):
    * (1) the textbook INDEPENDENCE estimate |A|·|B| div max(ndv_A, ndv_B)
    * (what a cost model uses with only table stats — Selinger 1979's
    * uniformity assumption); (2) a HEAVY-HITTER estimate: the top-32 keys
    * of A get exact per-key products, the residual mass keeps the
    * uniformity assumption (what a cost model does with an equi-height
    * histogram / TopN statistic); (3) the EXACT size Σ_k c_A(k)·c_B(k),
    * computable distributively as two key-count aggregates and one
    * key-bounded join — never materializing the join itself. Emits all
    * three with error ppm; how far (2) closes the gap from (1) is the
    * measured argument for keeping per-key statistics at scale. All
    * integer; the HH set is (count desc, key) deterministic. */
  def q290(spark: SparkSession, dir: String): DataFrame = {
    val ca = Tables.load(spark, dir, "events")
      .groupBy(col("user_id").cast(LongType).as("k"))
      .agg(count(lit(1)).as("ca"))
    val cb = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").cast(LongType).as("k"))
      .agg(count(lit(1)).as("cb"))
    val joined = graft.operators.Checkpoints.scratch(
      ca.join(cb, Seq("k"), "full").na.fill(0L, Seq("ca", "cb")))
    // the top-32 split is a TakeOrdered (map-side top-32 per partition, one
    // 32-row reduce) — never a single-partition rank window over the key
    // frame, which at 100 TB is itself vocabulary-sized
    val hh = joined.orderBy(col("ca").desc, col("k")).limit(32)
      .agg(expr("cast(sum(cast(ca as decimal(38,0)) * cb) as bigint)")
        .as("hh_exact_part"),
        sum("ca").as("hh_a"), sum("cb").as("hh_b"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("hh_ndv_a"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("hh_ndv_b"))
    // cross-table products ride decimal(38,0) (the q276 precedent): at the
    // 100 TB scale this audit exists for, n_a·n_b exceeds int64 long before
    // the ESTIMATE does — the arithmetic must survive even when the inputs
    // are billions each; outputs cast back to int64 with the declared
    // bound that an estimate past 2^63 rows is not a plannable join anyway
    joined.agg(
        sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("ndv_a"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("ndv_b"),
        sum(expr("cast(ca as decimal(38,0)) * cb")).as("exact_dec"))
      .withColumn("exact_rows", expr("cast(exact_dec as bigint)"))
      .crossJoin(broadcast(hh))
      .withColumn("rest_a", expr("n_a - hh_a"))
      .withColumn("rest_b", expr("n_b - hh_b"))
      .withColumn("rest_ndv_a", expr("ndv_a - hh_ndv_a"))
      .withColumn("rest_ndv_b", expr("ndv_b - hh_ndv_b"))
      .withColumn("est_independence",
        expr("cast(cast(n_a as decimal(38,0)) * n_b div " +
          "greatest(ndv_a, ndv_b) as bigint)"))
      .withColumn("est_hh", expr("hh_exact_part + " +
        "cast(cast(rest_a as decimal(38,0)) * rest_b div " +
        "greatest(1, greatest(rest_ndv_a, rest_ndv_b)) as bigint)"))
      .withColumn("err_indep_ppm", expr(
        "abs(est_independence - exact_rows) * 1000000 div greatest(1, exact_rows)"))
      .withColumn("err_hh_ppm", expr(
        "abs(est_hh - exact_rows) * 1000000 div greatest(1, exact_rows)"))
      .select("n_a", "n_b", "ndv_a", "ndv_b", "exact_rows",
        "est_independence", "est_hh", "err_indep_ppm", "err_hh_ppm")
  }

  val q290Sql: String =
    """WITH ca AS (
      |  SELECT CAST(user_id AS BIGINT) AS k, COUNT(*) AS ca
      |  FROM events GROUP BY 1
      |), cb AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS cb
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT COALESCE(ca.k, cb.k) AS k, COALESCE(ca.ca, 0) AS ca,
      |    COALESCE(cb.cb, 0) AS cb
      |  FROM ca FULL OUTER JOIN cb ON cb.k = ca.k
      |), hh AS (
      |  SELECT CAST(SUM(CAST(ca AS HUGEINT) * cb) AS BIGINT) AS hh_exact_part,
      |    CAST(SUM(ca) AS BIGINT) AS hh_a, CAST(SUM(cb) AS BIGINT) AS hh_b,
      |    CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hh_ndv_a,
      |    CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hh_ndv_b
      |  FROM (SELECT * FROM j ORDER BY ca DESC, k LIMIT 32)
      |), g AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ndv_a,
      |    CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ndv_b,
      |    CAST(SUM(CAST(ca AS HUGEINT) * cb) AS BIGINT) AS exact_rows,
      |    CAST(h.hh_exact_part AS BIGINT) AS hh_exact_part,
      |    CAST(SUM(ca) - h.hh_a AS BIGINT) AS rest_a,
      |    CAST(SUM(cb) - h.hh_b AS BIGINT) AS rest_b,
      |    CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) - h.hh_ndv_a AS BIGINT)
      |      AS rest_ndv_a,
      |    CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) - h.hh_ndv_b AS BIGINT)
      |      AS rest_ndv_b
      |  FROM j CROSS JOIN hh h
      |  GROUP BY h.hh_exact_part, h.hh_a, h.hh_b, h.hh_ndv_a, h.hh_ndv_b
      |)
      |SELECT n_a, n_b, ndv_a, ndv_b, exact_rows,
      |  CAST(CAST(n_a AS HUGEINT) * n_b // GREATEST(ndv_a, ndv_b) AS BIGINT)
      |    AS est_independence,
      |  CAST(hh_exact_part + CAST(rest_a AS HUGEINT) * rest_b
      |    // GREATEST(1, GREATEST(rest_ndv_a, rest_ndv_b)) AS BIGINT)
      |    AS est_hh,
      |  CAST(ABS(CAST(n_a AS HUGEINT) * n_b // GREATEST(ndv_a, ndv_b)
      |    - exact_rows) * 1000000
      |    // GREATEST(1, exact_rows) AS BIGINT) AS err_indep_ppm,
      |  CAST(ABS(hh_exact_part + CAST(rest_a AS HUGEINT) * rest_b
      |      // GREATEST(1, GREATEST(rest_ndv_a, rest_ndv_b)) - exact_rows)
      |    * 1000000 // GREATEST(1, exact_rows) AS BIGINT) AS err_hh_ppm
      |FROM g""".stripMargin

  // ---- q292 out-of-orderness / watermark-sizing audit -----------------------

  /** q292 event-time disorder audit — the number that SIZES a watermark
    * before anyone deploys the §2.9 streaming jobs: per user stream (the
    * key the stateful operators group by), events are read in ARRIVAL
    * order (event_id — the declared ingest-offset proxy; production uses
    * the log offset) and each event's LATENESS is how far it trails the
    * maximum event time already seen on that stream. The histogram is
    * q273's power-of-two log-bucket kernel (bucket b ⟺ lateness in
    * [2^(b−1), 2^b) ms; 0 = in order), and each row carries the decision
    * column: the exact ppm of events a watermark of 2^b ms would DROP
    * (the cumulative tail above the bucket). One user-keyed running-max
    * window + one map-combined bucket aggregate + a ≤64-row cumulative
    * window — nothing unpartitioned touches event rows. */
  def q292(spark: SparkSession, dir: String): DataFrame =
    q292From(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_millis(ts)").as("tms")))

  /** [[q292]] over an arbitrary (user_id, event_id, tms) frame — spec entry
    * point (the committed fixture arrives fully in order, so planted
    * disorder carries the semantics). */
  def q292From(e: DataFrame): DataFrame =
    watermarkTail(latenessBuckets(e))

  /** The batch lateness kernel: (user_id, event_id, tms) → (bucket,
    * n_events). Shared with the streaming digest path, whose per-batch
    * cells must merge to exactly this frame. */
  private[graft] def latenessBuckets(e: DataFrame): DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("late_ms", max("tms").over(uw) - col("tms"))
      .withColumn("bucket",
        when(col("late_ms") <= 0L, 0L)
          .otherwise(length(bin(col("late_ms"))).cast(LongType)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"))
  }

  /** The watermark decision table over a (bucket, n_events) histogram. */
  private[graft] def watermarkTail(buckets: DataFrame): DataFrame = {
    val bw = Window.partitionBy(lit(1)).orderBy("bucket")
      .rowsBetween(1, Window.unboundedFollowing)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .groupBy("bucket").agg(sum("n_events").as("n_events"))
      .withColumn("dropped_above", coalesce(sum("n_events").over(bw), lit(0L)))
      .withColumn("total", sum("n_events").over(all))
      .withColumn("dropped_if_watermark_ppm",
        expr("dropped_above * 1000000 div total"))
      .select("bucket", "n_events", "dropped_if_watermark_ppm")
      .orderBy("bucket")
  }

  /** STREAMING leg of q292 — the disorder audit as the stateful stream op
    * it naturally is (a watermark IS a per-stream running max): the
    * [[graft.streaming.EventStream.lateBucketStream]] processor keeps one
    * ValueState[max event time] per user, buckets each arrival's lateness
    * as it lands, and each micro-batch persists its (bucket, n) cell
    * digest batch-stamped (overwrite-idempotent — the q277/q283 LSM
    * discipline). This reader folds any number of digests and runs the
    * same decision table; StreamingSpec pins merged == the batch q292From
    * on the identical arrival order. */
  def watermarkReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    watermarkTail(
      dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _))

  val q292Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events
      |), lt AS (
      |  SELECT MAX(tms) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tms
      |    AS late_ms
      |  FROM e
      |), b AS (
      |  SELECT CASE WHEN late_ms <= 0 THEN 0
      |    ELSE CAST(length(bin(late_ms)) AS BIGINT) END AS bucket
      |  FROM lt
      |), g AS (
      |  SELECT bucket, COUNT(*) AS n_events FROM b GROUP BY bucket
      |)
      |SELECT bucket, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(COALESCE(SUM(n_events) OVER (ORDER BY bucket
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
      |    * 1000000 // (SUM(n_events) OVER ()) AS BIGINT)
      |    AS dropped_if_watermark_ppm
      |FROM g ORDER BY bucket""".stripMargin

  // ---- q294 functional-dependency verification ------------------------------

  /** The declared FD candidate list: (table, determinant, dependent).
    * This is the VERIFICATION leg of FD profiling (Papenbrock et al.,
    * PVLDB 8(10) 2015 benchmark seven discovery algorithms; the lattice
    * SEARCH is their contribution — verifying a candidate set is the
    * per-candidate primitive all of them bottom out in, and the one a
    * schema-quality gate runs nightly against its declared expectations). */
  private val FdCandidates = Seq(
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("part", "p_brand", "p_type"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("lineitem", "l_orderkey", "l_returnflag"))

  /** q294 functional-dependency audit over [[FdCandidates]]: per candidate
    * A → B, the determinant groups, the groups carrying more than one
    * dependent value (violations), the held share in ppm, and the g3-style
    * violating ROW mass (rows outside each group's plurality value — the
    * minimum deletions to make the FD hold; Huhtala et al., TANE, Comput.
    * J. 1999 use the same error measure). The PK-derived candidate holds
    * at 10⁶ ppm and the behavioral ones report their true violation
    * structure — a schema-drift tripwire, not a discovery engine. Each
    * candidate is one map-combined (A, B) aggregate collapsing to
    * |distinct A| rows, then a ≤6-row union. */
  def q294(spark: SparkSession, dir: String): DataFrame = {
    val per = FdCandidates.map { case (t, a, b) =>
      Tables.load(spark, dir, t)
        .groupBy(col(a).cast(StringType).as("av"),
          col(b).cast(StringType).as("bv"))
        .agg(count(lit(1)).as("n"))
        .groupBy("av").agg(
          countDistinct("bv").as("nb"),
          sum("n").as("rows_g"),
          max("n").as("plurality"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"),
          sum("rows_g").as("n_rows"),
          sum(col("rows_g") - col("plurality")).as("rows_to_fix"))
        .select(lit(t).as("table_name"), lit(a).as("determinant"),
          lit(b).as("dependent"), col("n_groups"), col("n_violating"),
          expr("(n_groups - n_violating) * 1000000 div n_groups")
            .as("held_ppm"),
          col("n_rows"), col("rows_to_fix"),
          expr("rows_to_fix * 1000000 div n_rows").as("g3_ppm"))
    }
    per.reduce(_ union _).orderBy("table_name", "determinant", "dependent")
  }

  val q294Sql: String = {
    val arms = FdCandidates.map { case (t, a, b) =>
      s"""SELECT '$t' AS table_name, '$a' AS determinant, '$b' AS dependent,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST((COUNT(*) - SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END)) * 1000000
        |    // COUNT(*) AS BIGINT) AS held_ppm,
        |  CAST(SUM(rows_g) AS BIGINT) AS n_rows,
        |  CAST(SUM(rows_g - plurality) AS BIGINT) AS rows_to_fix,
        |  CAST(SUM(rows_g - plurality) * 1000000 // SUM(rows_g) AS BIGINT)
        |    AS g3_ppm
        |FROM (
        |  SELECT av, COUNT(DISTINCT bv) AS nb, SUM(n) AS rows_g,
        |    MAX(n) AS plurality
        |  FROM (
        |    SELECT CAST($a AS VARCHAR) AS av, CAST($b AS VARCHAR) AS bv,
        |      COUNT(*) AS n
        |    FROM $t GROUP BY 1, 2
        |  ) GROUP BY av
        |)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
      |$arms
      |) ORDER BY table_name, determinant, dependent""".stripMargin
  }

  // ---- q295 sample-based NDV estimation audit --------------------------------

  /** q295 distinct-count estimation from a sample, audited (Chao,
    * Scandinavian J. Statistics 1984) — the OTHER optimizer statistic
    * (q290 prices join sizes; NDV drives aggregation sizing and
    * distinct-count planning, and at 100 TB it is estimated from a sample,
    * never scanned): a deterministic 10% row sample (md5 of the row key)
    * of lineitem.l_partkey yields d distinct values with f1 singletons
    * and f2 doubletons; Chao1 = d + f1² div (2·f2) lower-bounds the true
    * NDV from the unseen-mass signal in f1/f2, while the naive scale-up
    * d·10 ignores it. Exact truth beside both estimates with error ppm
    * (the q91/q290 audit discipline). Integer throughout; f2 = 0 guards
    * to the bias-corrected f1·(f1−1) div 2 form (Chao's own small-sample
    * variant). One sampled aggregate + one exact aggregate. */
  def q295(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").cast(LongType).as("k"),
        col("l_orderkey").cast(LongType).as("ok"),
        col("l_linenumber").cast(LongType).as("ln"))
    val exact = li.agg(countDistinct("k").as("true_ndv"),
      count(lit(1)).as("n_rows"))
    val samp = li.filter(T.hashBucket(
        concat(lit("ndv:"), col("ok").cast(StringType), lit("#"),
          col("ln").cast(StringType)), 10) === 0)
      .groupBy("k").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("d_sample"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
        sum("c").as("sample_rows"))
    exact.crossJoin(broadcast(samp))
      .withColumn("est_chao1", expr(
        "d_sample + CASE WHEN f2 > 0 THEN f1 * f1 div (2 * f2) " +
          "ELSE f1 * (f1 - 1) div 2 END"))
      .withColumn("est_scaleup", expr("d_sample * 10"))
      .withColumn("err_chao1_ppm", expr(
        "abs(est_chao1 - true_ndv) * 1000000 div true_ndv"))
      .withColumn("err_scaleup_ppm", expr(
        "abs(est_scaleup - true_ndv) * 1000000 div true_ndv"))
      .select("true_ndv", "n_rows", "sample_rows", "d_sample", "f1", "f2",
        "est_chao1", "est_scaleup", "err_chao1_ppm", "err_scaleup_ppm")
  }

  val q295Sql: String =
    """WITH li AS (
      |  SELECT CAST(l_partkey AS BIGINT) AS k,
      |    CAST(l_orderkey AS BIGINT) AS ok,
      |    CAST(l_linenumber AS BIGINT) AS ln
      |  FROM lineitem
      |), ex AS (
      |  SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS true_ndv,
      |    COUNT(*) AS n_rows
      |  FROM li
      |), sc AS (
      |  SELECT k, COUNT(*) AS c FROM li
      |  WHERE CAST('0x' || substr(md5('ndv:' || CAST(ok AS VARCHAR) || '#'
      |    || CAST(ln AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0
      |  GROUP BY k
      |), sm AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS d_sample,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |    CAST(SUM(c) AS BIGINT) AS sample_rows
      |  FROM sc
      |)
      |SELECT ex.true_ndv, CAST(ex.n_rows AS BIGINT) AS n_rows,
      |  sm.sample_rows, sm.d_sample, sm.f1, sm.f2,
      |  CAST(sm.d_sample + CASE WHEN sm.f2 > 0
      |    THEN sm.f1 * sm.f1 // (2 * sm.f2)
      |    ELSE sm.f1 * (sm.f1 - 1) // 2 END AS BIGINT) AS est_chao1,
      |  CAST(sm.d_sample * 10 AS BIGINT) AS est_scaleup,
      |  CAST(ABS(sm.d_sample + CASE WHEN sm.f2 > 0
      |      THEN sm.f1 * sm.f1 // (2 * sm.f2)
      |      ELSE sm.f1 * (sm.f1 - 1) // 2 END - ex.true_ndv) * 1000000
      |    // ex.true_ndv AS BIGINT) AS err_chao1_ppm,
      |  CAST(ABS(sm.d_sample * 10 - ex.true_ndv) * 1000000 // ex.true_ndv
      |    AS BIGINT) AS err_scaleup_ppm
      |FROM ex CROSS JOIN sm""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q294_fd_audit", q294 _, Some(q294Sql)),
    ("q295_ndv_estimate", q295 _, Some(q295Sql)),
    ("q290_join_cardinality", q290 _, Some(q290Sql)),
    ("q292_watermark_sizing", q292 _, Some(q292Sql)),
    ("q282_concurrency_sweep", q282 _, Some(q282Sql)),
    ("q283_cusum_changepoint", q283 _, Some(q283Sql)),
    ("q284_acf_hourly", q284 _, Some(q284Sql)),
    ("q276_kmv_sketch", q276 _, Some(q276Sql)),
    ("q203_repetition_gate", q203 _, Some(q203Sql)),
    ("q209_heaps_growth", q209 _, Some(q209Sql)),
    ("q211_count_min_sketch", q211 _, Some(q211Sql)),
    ("q232_cms_shard_merge", q232 _, Some(q232Sql)),
    ("q219_gap_burstiness", q219 _, Some(q219Sql)),
    ("q220_range_boundaries", q220 _, Some(q220Sql)),
    ("q180_oov_rate", q180 _, Some(q180Sql)),
    ("q201_tokenizer_fertility", q201 _, Some(q201Sql)),
    ("q199_hourly_anomaly", q199 _, Some(q199Sql)),
    ("q194_lexical_hhi", q194 _, Some(q194Sql)),
    ("q193_benford_audit", q193 _, Some(q193Sql)),
    ("q192_skew_profile", q192 _, Some(q192Sql)),
    ("q191_source_centroids", q191 _, Some(q191Sql)),
    ("q190_source_divergence", q190 _, Some(q190Sql)),
    ("q87_grouping_sets", q87 _, Some(q87Sql)),
    ("q167_zipf_slope", q167 _, Some(q167Sql)),
    ("q88_stats_moments", q88 _, Some(q88Sql)),
    ("q89_length_histogram", q89 _, Some(q89Sql)),
    ("q90_bigram_assoc", q90 _, Some(q90Sql)),
    ("q91_heavy_hitters", q91 _, Some(q91Sql)),
    ("q92_bitwise_aggs", q92 _, Some(q92Sql)),
    ("q93_vocab_coverage", q93 _, Some(q93Sql)),
    ("q94_event_funnel", q94 _, Some(q94Sql)),
    ("q95_posting_stats", q95 _, Some(q95Sql)),
    ("q101_forward_fill", q101 _, Some(q101Sql)),
    ("q102_column_profile", q102 _, Some(q102Sql)),
    ("q105_cohort_retention", q105 _, Some(q105Sql)),
    ("q112_label_centroids", q112 _, Some(q112Sql)),
    ("q151_centroid_affinity", q151 _, Some(q151Sql)),
    ("q158_fisher_ratio", q158 _, Some(q158Sql)),
    ("q113_mad_outliers", q113 _, Some(q113Sql)),
    ("q126_trend_ols", q126 _, Some(q126Sql)),
    ("q132_cooccurrence", q132 _, Some(q132Sql)))
}
