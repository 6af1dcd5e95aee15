package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytics surface, continued (q69–q76): wide↔long reshaping, gaps-and-
  * islands, blocked fuzzy matching, date-spine densification, a typed
  * `Aggregator` UDAF, MapType higher-order functions, native batch
  * `session_window`, and full-frame window value functions.
  *
  * Like the rest of the surface (SURVEY §2.13): money is integer cents
  * (`FLOOR(x*100)` as BIGINT), every aggregate is aliased identically on the
  * Spark and DuckDB sides, and every result carries a total ORDER BY so the
  * driver's sorted-column hash compare is deterministic.
  */
object Analytics {

  private def cents(c: Column) = floor(c * 100).cast(LongType)

  /** q69 unpivot (wide → long): per-priority order metrics melted to
    * (priority, metric, value) rows with Spark's native `unpivot` — one
    * Expand node over the aggregated (5-row) input, no shuffle after the
    * aggregate. At scale the melt is a narrow map-side transform; the only
    * shuffle is the grouped aggregate that produced the wide table. */
  def q69(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))
      .unpivot(Array(col("priority")),
        Array(col("n_orders"), col("n_customers"), col("revenue_cents")),
        "metric", "value")
      .orderBy("priority", "metric")

  val q69Sql =
    """WITH w AS (
      |  SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
      |    COUNT(DISTINCT o_custkey) AS n_customers,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |  FROM orders GROUP BY 1)
      |SELECT priority, 'n_orders' AS metric, CAST(n_orders AS BIGINT) AS value FROM w
      |UNION ALL SELECT priority, 'n_customers', CAST(n_customers AS BIGINT) FROM w
      |UNION ALL SELECT priority, 'revenue_cents', revenue_cents FROM w
      |ORDER BY priority, metric""".stripMargin

  /** q70 gaps-and-islands: maximal runs of consecutive ACTIVE DAYS per user
    * over the events table, via the classic date − row_number() grouping
    * key. Shape at scale: one distinct (user, day) shuffle, then the window
    * and both aggregates all share the user_id partitioning — Catalyst
    * reuses one exchange for the whole chain. */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val isl = days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast(DateType)) -
          row_number().over(Window.partitionBy("user_id").orderBy("d")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
    isl.groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        max("len").cast(IntegerType).as("max_run"),
        sum("len").as("active_days"))
      .orderBy("user_id")
  }

  val q70Sql =
    """WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |g AS (
      |  SELECT user_id, d,
      |    (d - DATE '1970-01-01') - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM dd),
      |isl AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_islands, CAST(MAX(len) AS INTEGER) AS max_run,
      |  CAST(SUM(len) AS BIGINT) AS active_days
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q71 blocked fuzzy self-match: near-identical part names (edit distance
    * ≤ 3) within a brand, counted per brand.
    *
    * REWRITTEN in r11 after the full-surface scaling sweep measured the
    * r10 plan (one equi-join blocked on `p_brand` alone) at ×5.5
    * wall-clock for ×3 data (`SCALING_r11.json`): brand cardinality is
    * FIXED (~25 values), so block sizes grow linearly with the catalog
    * and candidate pairs quadratically — the one blocking key on the
    * surface that could not survive 100×. Two stages now:
    *
    * 1. VALUE-DOMAIN COLLAPSE — aggregate to distinct (brand, name) with
    *    multiplicity g. Name domains are vocabulary-shaped, and on this
    *    catalog (64 distinct names over 20k parts) the true pair set is
    *    quadratic in the duplicate groups, so pair ENUMERATION at row
    *    grain is unsalvageable no matter the blocking; counts are instead
    *    recovered combinatorially — C(g,2) identical-name pairs at
    *    distance 0 per value, ga·gb row pairs behind every surviving
    *    cross-value pair. One map-combined shuffle; everything after
    *    runs on the value frame.
    * 2. PASS-JOIN over the value frame — the reusable
    *    [[graft.operators.FuzzyJoin.passJoinCandidates]] operator (Li,
    *    Deng, Wang & Feng, "Pass-Join: A Partition-based Method for
    *    Similarity Joins", PVLDB 5(3), 2011): split every indexed name
    *    into k+1 = 4
    *    contiguous segments; if ed(a, b) ≤ k, the ≤ k edit sites touch
    *    at most k segments, so SOME segment of b survives verbatim in a,
    *    displaced by at most k positions. Candidates are an EQUI-join on
    *    (brand, |b|, segment index, segment text) — keys whose
    *    cardinality grows with the name domain — between b's 4 segments
    *    and a's ≤ (2k+1)²(k+1) ≈ 150 substring probes per name (the
    *    simple ±k window; Pass-Join's multi-match-aware selection would
    *    shave a further ~2×). Survivors are verified with the
    *    threshold-Levenshtein (early-exit DP, O(n·k) per value pair).
    *    Names shorter than k+1 chars can lack 4 non-empty segments, so
    *    value pairs whose shorter side is ≤ k chars go through a
    *    residual brand-block over the ≤ 2k-char sliver (both sides of
    *    such a pair are ≤ 2k chars; empty on this catalog, bounded by
    *    the short-name value population at any scale). The length band
    *    |len(a)−len(b)| ≤ k is implied by the distance bound and built
    *    into the probe's target-length enumeration.
    *
    * PropertySpec replays the whole scheme against a driver-side
    * brute force on an adversarial 3-letter-alphabet catalog (dense
    * near-matches, lengths crossing both the segment boundary and the
    * short-name path). Int64 note: n_pairs/total_dist bound by C(n,2)
    * per brand — the same bound the row-grain plan had. */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    val k = 3 // edit-distance threshold
    val p = Tables.load(spark, dir, "part").select("p_partkey", "p_brand", "p_name")
    // STAGE 1 — value-domain collapse: distinct (brand, name) with its
    // multiplicity. Name domains are vocabulary-shaped (templates × finite
    // word lists), so this one map-combined shuffle shrinks the fuzzy-join
    // input from corpus rows to the value domain, and every identical-name
    // pair is counted COMBINATORIALLY (C(g,2), distance 0) instead of
    // being enumerated — the aggregate-by-value-first principle of the
    // evaluation family applied to similarity joins. This is what makes a
    // count-aggregated fuzzy match scale: on this catalog (64 distinct
    // names over 20k parts) no pair-enumeration scheme can be subquadratic
    // because the TRUE pair set is quadratic in the duplicate groups.
    val v = Tables.parallelized(p)
      .groupBy("p_brand", "p_name").agg(count(lit(1)).as("g"))

    // STAGE 2 — Pass-Join candidates over the value frame (the reusable
    // [[graft.operators.FuzzyJoin]] operator), verified with the
    // threshold-Levenshtein (early-exit DP: returns -1 once the distance
    // must exceed k), with ga·gb row pairs behind every surviving value
    // pair
    val cross = graft.operators.FuzzyJoin
      .passJoinCandidates(v, Seq("p_brand"), "p_name", k, carry = Seq("g"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), k))
      .filter(col("dist") >= 0)
      .groupBy("p_brand")
      .agg(sum(expr("g_a * g_b")).as("cross_pairs"),
        sum(expr("dist * g_a * g_b")).as("cross_dist"))

    // identical-name pairs: C(g, 2) per value, distance 0. Brands with NO
    // qualifying pair are dropped — the oracle's GROUP BY over the joined
    // pair set never emits them (SqlSurfaceSpec caught the zero-row
    // difference at sf0.001, where some brands genuinely have no pair).
    v.groupBy("p_brand")
      .agg(sum(expr("g * (g - 1) div 2")).as("dup_pairs"))
      .join(cross, Seq("p_brand"), "left")
      .select(col("p_brand"),
        (col("dup_pairs") + coalesce(col("cross_pairs"), lit(0L)))
          .as("n_pairs"),
        coalesce(col("cross_dist"), lit(0L)).as("total_dist"))
      .filter(col("n_pairs") > 0)
      .orderBy("p_brand")
  }

  val q71Sql =
    """SELECT a.p_brand, COUNT(*) AS n_pairs,
      |  CAST(SUM(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS total_dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |GROUP BY a.p_brand ORDER BY a.p_brand""".stripMargin

  /** q72 date-spine densification: a generated calendar (sequence + explode
    * from the min/max order date — no driver-side loop, no collect) left-
    * joined to per-day order counts, rolled up monthly with explicit
    * idle-day accounting. The spine is rows(days) — tiny at any data scale —
    * so the join broadcasts; the only real shuffle is the per-day aggregate
    * of the fact table. */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
    val spine = o.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val per = o.groupBy("d").agg(count(lit(1)).as("n"))
    spine.join(per, Seq("d"), "left")
      .groupBy(date_format(col("d"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("n").isNotNull, 1L).otherwise(0L)).as("active_days"),
        sum(coalesce(col("n"), lit(0L))).as("n_orders"))
      .orderBy("month")
  }

  val q72Sql =
    """WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
      |                  CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
      |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
      |per AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1)
      |SELECT strftime(s.d, '%Y-%m') AS month, COUNT(*) AS n_days,
      |  CAST(SUM(CASE WHEN p.d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS active_days,
      |  CAST(SUM(COALESCE(p.n, 0)) AS BIGINT) AS n_orders
      |FROM spine s LEFT JOIN per p ON p.d = s.d
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q73 typed UDAF: quantity-weighted revenue accumulator as a Spark
    * `Aggregator` (SURVEY §2.10 — the reference needs none; this is the
    * engine's user-defined-aggregate extension point). The aggregator keeps
    * exact integer sums (num = Σ cents·qty, den = Σ qty) so the result
    * hash-matches the oracle bit-for-bit; the consumer divides. Typed
    * Aggregators keep partial aggregation (map-side combine + merge), so
    * the shuffle carries one 16-byte buffer per group, not raw rows. */
  def q73(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedCents, Encoders.product[WCIn])
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        cents(col("l_extendedprice")).as("c"),
        col("l_quantity").cast(LongType).as("q"))
      .groupBy("l_returnflag")
      .agg(wavg(col("c"), col("q")).as("w"))
      .select(col("l_returnflag"), col("w.num").as("w_num"), col("w.den").as("w_den"))
      .orderBy("l_returnflag")
  }

  val q73Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_num,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_den
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q74 MapType surface: per-user event-type counts folded into a map
    * (`map_from_entries` over a sorted `collect_list`), then consumed with
    * `element_at` lookups and a `map_filter` lambda. The map is built AFTER
    * the (user, type) aggregate, so collect_list sees ≤ |event_types| rows
    * per user — bounded state, no skew risk from hot users. */
  def q74(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "view"), lit(0L)).as("views"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
        size(map_filter(col("m"), (_, v) => v >= lit(20L))).cast(IntegerType).as("heavy_types"))
      .orderBy("user_id")

  val q74Sql =
    """WITH per AS (
      |  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
      |SELECT user_id,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN n END), 0) AS BIGINT) AS views,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS clicks,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS purchases,
      |  CAST(SUM(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS INTEGER) AS heavy_types
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q75 native batch `session_window`: 30-minute-gap sessions per user in
    * ONE groupBy — Spark's built-in session windowing (the declarative twin
    * of q38's flatMapGroupsWithState sessionizer). Session semantics: a new
    * session starts when the gap is ≥ the duration (windows are
    * half-open [t, t+gap)). One shuffle on user_id; the session merge is
    * sort-based within partitions. Event times are truncated to the engine's
    * declared millisecond session granularity (`epoch_ms` on the oracle
    * side) BEFORE windowing, so a gap within 1 ms of exactly 30 minutes
    * cannot split in one engine and merge in the other. */
  def q75(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"), col("n_events"))
      .orderBy("user_id", "session_start_ms")

  val q75Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS tms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, tms,
      |    CASE WHEN prev IS NULL OR tms - prev >= 1800000 THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |s AS (
      |  SELECT user_id, tms,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id, CAST(MIN(tms) AS BIGINT) AS session_start_ms, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_ms""".stripMargin

  /** q76 window value functions over the full partition frame: first, last
    * and 2nd order per customer (first_value / last_value / nth_value with
    * ROWS UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the default
    * running frame would make last_value ≡ current row). One shuffle on
    * o_custkey shared by all three functions. */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        first("o_orderkey").over(w).as("first_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
        last("o_orderkey").over(w).as("last_key"))
      .distinct()
      .orderBy("o_custkey")
  }

  val q76Sql =
    """SELECT DISTINCT o_custkey,
      |  first_value(o_orderkey) OVER w AS first_key,
      |  nth_value(o_orderkey, 2) OVER w AS second_key,
      |  last_value(o_orderkey) OVER w AS last_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin

  /** q77 argmin/argmax aggregates: the order carrying each priority's
    * highest / lowest total, via `max_by`/`min_by` with an explicit
    * (cents, orderkey) struct tiebreak — bare max_by is nondeterministic
    * under value ties, which a hash-checked surface cannot tolerate. The
    * oracle expresses the identical semantics as a join-back (max cents,
    * then max key). One partial+final aggregate, no join on the Spark side. */
  def q77(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("priority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("c"))
      .groupBy("priority")
      .agg(
        max_by(col("o_orderkey"), struct(col("c"), col("o_orderkey"))).as("top_order"),
        min_by(col("o_orderkey"), struct(col("c"), col("o_orderkey"))).as("bottom_order"),
        max("c").as("top_cents"))
      .orderBy("priority")

  val q77Sql =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority, o_orderkey,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |hi AS (SELECT priority, MAX(c) AS mx FROM o GROUP BY 1),
      |lo AS (SELECT priority, MIN(c) AS mn FROM o GROUP BY 1)
      |SELECT o.priority,
      |  MAX(CASE WHEN o.c = hi.mx THEN o.o_orderkey END) AS top_order,
      |  MIN(CASE WHEN o.c = lo.mn THEN o.o_orderkey END) AS bottom_order,
      |  MAX(hi.mx) AS top_cents
      |FROM o JOIN hi USING (priority) JOIN lo USING (priority)
      |GROUP BY o.priority ORDER BY o.priority""".stripMargin

  /** q78 boolean / conditional aggregates: bool_and, bool_or, count_if —
    * the data-quality assertion shape ("every row non-negative, any row
    * discounted, how many high-tax") as single-pass aggregates instead of
    * three separate filtered counts. */
  def q78(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > 0).as("all_positive_qty"),
        bool_or(col("l_discount") > lit(0.06)).as("any_deep_discount"),
        count_if(col("l_tax") > lit(0.05)).as("n_high_tax"))
      .orderBy("l_returnflag")

  val q78Sql =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_positive_qty,
      |  bool_or(l_discount > 0.06) AS any_deep_discount,
      |  CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q79 corpus text normalization: the canonical pre-tokenization cleanup
    * (lowercase → strip non-alphanumerics → collapse runs of spaces →
    * trim), reported as per-source length/token deltas. Pure narrow map
    * work — normalization at 100 TB is scan-bound, and this plan keeps it
    * in one whole-stage-codegen'd pass with the aggregate's partial phase. */
  def q79(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("text"), norm.as("norm"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast(LongType)).as("raw_chars"),
        sum(length(col("norm")).cast(LongType)).as("norm_chars"),
        sum(T.tokenCount(col("norm")).cast(LongType)).as("norm_tokens"))
      .orderBy("source")
  }

  val q79Sql =
    """WITH n AS (
      |  SELECT source, text,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT source, COUNT(*) AS docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS raw_chars,
      |  CAST(SUM(length(norm)) AS BIGINT) AS norm_chars,
      |  CAST(SUM(length(norm) - length(replace(norm, ' ', '')) + 1) AS BIGINT) AS norm_tokens
      |FROM n GROUP BY source ORDER BY source""".stripMargin

  /** q115 ordered string aggregation (LISTAGG/STRING_AGG) — the collect
    * surface: per order priority, the comma-joined sorted list of distinct
    * statuses plus supporting counts. Sorting INSIDE the aggregate
    * (`sort_array(collect_set(..))`) is what makes a collected string
    * deterministic under any partitioning — the unsorted variant is a
    * nondeterminism bug at any scale. Distinct-collect keeps the aggregated
    * state tiny (bounded by the domain, not the row count). */
  def q115(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"))
      .orderBy("priority")
  }

  val q115Sql =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n,
      |  COUNT(DISTINCT o_orderstatus) AS n_status,
      |  STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin

  /** q116 share-of-total windows (RATIO_TO_REPORT): each nation's revenue as
    * ppm of its region's total and of the grand total — the percent-of-
    * parent rollup every BI layer asks of a star schema. Integer ppm via
    * exact sums; the region window and the grand-total window reuse the one
    * aggregated frame (25 rows), so the windows cost nothing after the
    * single fact-side aggregate. The share arithmetic runs on whole DOLLARS
    * (cents div 100), not cents: `x * 1e6` must stay inside 64 bits on BOTH
    * engines, and dollars push the wrap point from ~9.2e12 cents/nation
    * (≈ TPC-H sf10 — real) to ~9.2e12 dollars/nation (≈ sf1000 — not). The
    * reported revenue stays exact cents. */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    val perNation = l
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_cents"))
      .withColumn("rev_usd", expr("rev_cents div 100"))
    perNation
      .withColumn("region_usd",
        sum("rev_usd").over(Window.partitionBy("region")))
      .withColumn("total_usd",
        sum("rev_usd").over(Window.partitionBy()))
      .withColumn("share_region_ppm", expr("rev_usd * 1000000 div region_usd"))
      .withColumn("share_total_ppm", expr("rev_usd * 1000000 div total_usd"))
      .select("region", "nation", "rev_cents", "share_region_ppm", "share_total_ppm")
      .orderBy("region", "nation")
  }

  val q116Sql =
    """WITH pn AS (
      |  SELECT r.r_name AS region, n.n_name AS nation,
      |    SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS rev_cents,
      |    SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) // 100 AS rev_usd
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY r.r_name, n.n_name
      |), w AS (
      |  SELECT *, SUM(rev_usd) OVER (PARTITION BY region) AS region_usd,
      |    SUM(rev_usd) OVER () AS total_usd
      |  FROM pn
      |)
      |SELECT region, nation, CAST(rev_cents AS BIGINT) AS rev_cents,
      |  CAST(rev_usd * 1000000 // region_usd AS BIGINT) AS share_region_ppm,
      |  CAST(rev_usd * 1000000 // total_usd AS BIGINT) AS share_total_ppm
      |FROM w ORDER BY region, nation""".stripMargin

  /** q122 market-basket pair mining — top co-occurring part pairs across
    * orders, with support in exact ppm of total orders. The pair explosion
    * is an equi-self-join ON THE ORDER KEY, so it scales with Σ basket²
    * (baskets are bounded — ≤7 lines in TPC-H shape), never corpus²; the
    * distinct-per-order guard runs BEFORE pairing so duplicate part lines
    * don't inflate support. One shuffle for the self-join (both sides share
    * the orderkey partitioning), one for the pair count, top-20 via
    * TakeOrderedAndProject. */
  def q122(spark: SparkSession, dir: String): DataFrame = {
    // shared corpus-stamped frame: both self-join sides read it, and
    // q123/q145/the graph family start from the same (okey, part) distinct
    val items = SharedFrames.basketItems(spark, dir)
    val nOrders = Tables.load(spark, dir, "orders")
      .agg(count(lit(1)).as("n_orders"))
    val a = items.select(col("okey"), col("part").as("part_a"))
    val b = items.select(col("okey").as("okey_b"), col("part").as("part_b"))
    a.join(b, col("okey") === col("okey_b") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_baskets"))
      .crossJoin(broadcast(nOrders))
      .withColumn("support_ppm", expr("n_baskets * 1000000 div n_orders"))
      .select("part_a", "part_b", "n_baskets", "support_ppm")
      .orderBy(desc("n_baskets"), col("part_a"), col("part_b"))
      .limit(20)
  }

  val q122Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
      |), n AS (
      |  SELECT COUNT(*) AS n_orders FROM orders
      |), pairs AS (
      |  SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS n_baskets
      |  FROM items a JOIN items b
      |    ON a.okey = b.okey AND a.part < b.part
      |  GROUP BY 1, 2
      |)
      |SELECT part_a, part_b, n_baskets,
      |  CAST(n_baskets * 1000000 // n.n_orders AS BIGINT) AS support_ppm
      |FROM pairs CROSS JOIN n
      |ORDER BY n_baskets DESC, part_a, part_b LIMIT 20""".stripMargin

  /** q123 association rules over the q122 pairs — confidence and lift in
    * exact fixed point:
    *
    *   confidence(a→b)_ppm = ⌊1e6·n_ab / n_a⌋
    *   lift_x1e6           = ⌊⌊1e6·n_ab / n_a⌋·n_orders / n_b⌋
    *
    * (the nested-floor form keeps every intermediate ≤ 1e6·n_orders, safe in
    * 64 bits to ~9.2e12 orders; a single-expression n_ab·n_orders·1e6 wraps
    * at billions). The per-part-support joins are UNHINTED: the item
    * universe is catalog-sized here but corpus-derived in general (items =
    * distinct tokens/SKUs, unbounded at 100 TB), so AQE decides broadcast vs
    * shuffle from the measured post-aggregation size instead of a hint that
    * would OOM the driver at 100× vocabulary. The top-20 by lift surfaces
    * genuinely associated pairs rather than merely popular ones — the
    * difference between co-occurrence and association.
    *
    * Shape note (probed at ×64, 38.4M lineitem, 76.5M pairs): a
    * basket-local `collect_list` + combination-explode variant measures
    * 12.8 s vs this self-join's 15.7 s — a 1.2× constant-factor win NOT
    * taken, because collecting a basket into one task array dies on the
    * first pathological mega-basket while the okey-keyed self-join (with
    * the CI-asserted AQE skew-split) degrades gracefully at any basket
    * size; the pair-aggregate shuffle, identical in both shapes, is the
    * real cost at scale. The ×10→×64 wall grows at slope ≈ 1.0 — the
    * algorithmic linearity of pair counts under bounded basket size. */
  def q123(spark: SparkSession, dir: String): DataFrame = {
    // shared corpus-stamped frame, consumed 4x here (both pair sides +
    // both support lookups)
    val items = SharedFrames.basketItems(spark, dir)
    val nOrders = Tables.load(spark, dir, "orders")
      .agg(count(lit(1)).as("n_orders"))
    val partSupport = items.groupBy("part").agg(count(lit(1)).as("n_part"))
    val a = items.select(col("okey"), col("part").as("part_a"))
    val b = items.select(col("okey").as("okey_b"), col("part").as("part_b"))
    a.join(b, col("okey") === col("okey_b") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_ab"))
      .join(partSupport.withColumnRenamed("part", "part_a")
        .withColumnRenamed("n_part", "n_a"), "part_a")
      .join(partSupport.withColumnRenamed("part", "part_b")
        .withColumnRenamed("n_part", "n_b"), "part_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("confidence_ppm", expr("n_ab * 1000000 div n_a"))
      .withColumn("lift_x1e6", expr("(n_ab * 1000000 div n_a) * n_orders div n_b"))
      .select("part_a", "part_b", "n_ab", "confidence_ppm", "lift_x1e6")
      .orderBy(desc("lift_x1e6"), col("part_a"), col("part_b"))
      .limit(20)
  }

  val q123Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
      |), n AS (
      |  SELECT COUNT(*) AS n_orders FROM orders
      |), ps AS (
      |  SELECT part, COUNT(*) AS n_part FROM items GROUP BY part
      |), pairs AS (
      |  SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.okey = b.okey AND a.part < b.part
      |  GROUP BY 1, 2
      |)
      |SELECT part_a, part_b, n_ab,
      |  CAST(n_ab * 1000000 // sa.n_part AS BIGINT) AS confidence_ppm,
      |  CAST((n_ab * 1000000 // sa.n_part) * n.n_orders // sb.n_part AS BIGINT)
      |    AS lift_x1e6
      |FROM pairs
      |JOIN ps sa ON sa.part = pairs.part_a
      |JOIN ps sb ON sb.part = pairs.part_b
      |CROSS JOIN n
      |ORDER BY lift_x1e6 DESC, part_a, part_b LIMIT 20""".stripMargin

  /** q145 frequent triple itemsets — the k=3 level of the A-Priori lattice
    * over the q122 pairs (Agrawal & Srikant, "Fast Algorithms for Mining
    * Association Rules", VLDB 1994). The monotonicity theorem is the whole
    * design: a triple with support ≥ s has every sub-pair ≥ s, so the
    * basket-pair instances are SEMI-JOINED against the frequent-pair set
    * before the third item is attached — the candidate frame is bounded by
    * frequent-pair instances × basket size, never the Σ C(basket,3) of a
    * naive 3-way self-join. The pruned count is exactly the brute-force
    * count (nothing above threshold is lost), which is what the oracle's
    * unpruned triple join verifies. Frequent pairs are an aggregated,
    * thresholded frame, so AQE sizes that join from measurement (unhinted —
    * at low thresholds the frequent set is corpus-shaped). */
  def q145(spark: SparkSession, dir: String, minSupport: Long = 2L): DataFrame = {
    // shared corpus-stamped frame, consumed 3x: pair build, pair
    // instances, third-item probe
    val items = SharedFrames.basketItems(spark, dir)
    val a = items.select(col("okey"), col("part").as("part_a"))
    val b = items.select(col("okey").as("okey_b"), col("part").as("part_b"))
    // Consumed twice (the frequent-pair aggregate AND the semi-join probe)
    // but deliberately NOT materialized: the duplicated subtree's expensive
    // part is its shuffles, and Spark's exchange reuse computes each
    // identical Exchange once per execution (both copies of the okey-hash
    // shuffle share one set of shuffle files; basketItems itself is the
    // SharedFrames storage cache) — so only the post-shuffle join CPU runs
    // twice, which an r11 A/B measured CHEAPER than an eager
    // localCheckpoint's block write + re-materialization (scratch min
    // 1.34 s vs recompute 1.00 s warm at sf0.1, and scratch's disk-backed
    // blocks made the query load-sensitive — the r10 driver-bench 7.5 s
    // median pathology). Same argument holds on a cluster: shuffle files
    // are served by the shuffle service, no unreplicated checkpoint blocks
    // to lose.
    val pairInstances = a
      .join(b, col("okey") === col("okey_b") && col("part_a") < col("part_b"))
      .select("okey", "part_a", "part_b")
    val freqPairs = pairInstances
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .select("part_a", "part_b")
    pairInstances
      .join(freqPairs, Seq("part_a", "part_b"), "left_semi")
      .join(items.select(col("okey").as("okey_c"), col("part").as("part_c")),
        col("okey") === col("okey_c") && col("part_c") > col("part_b"))
      .groupBy("part_a", "part_b", "part_c")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
      .orderBy(desc("n_baskets"), col("part_a"), col("part_b"), col("part_c"))
  }

  /** The oracle counts UNPRUNED triples — proving the a-priori pruning
    * loses nothing above threshold. */
  val q145Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
      |), t AS (
      |  SELECT a.part AS part_a, b.part AS part_b, c.part AS part_c,
      |    COUNT(*) AS n_baskets
      |  FROM items a
      |  JOIN items b ON a.okey = b.okey AND a.part < b.part
      |  JOIN items c ON b.okey = c.okey AND b.part < c.part
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
      |)
      |SELECT part_a, part_b, part_c, CAST(n_baskets AS BIGINT) AS n_baskets
      |FROM t ORDER BY n_baskets DESC, part_a, part_b, part_c""".stripMargin

  /** q147 marketing attribution — for every purchase, credit the user's
    * LAST non-purchase touch (the event that "closed") and FIRST
    * non-purchase touch (the event that "opened"), the two canonical
    * single-touch attribution models, with purchase value in exact floor
    * cents. The window trick makes it portable and skew-free without any
    * IGNORE-NULLS vendor syntax: a running count of non-purchase events
    * per user gives every purchase the ORDINAL of its preceding touch, and
    * the touch stream (numbered by the same ordinal) is joined back on
    * (user, ordinal) for last-touch and (user, 1) for first-touch. Both
    * engines agree on ms-truncated timestamps with event_id tie-breaks
    * (the q129 idiom).
    *
    * Scale shape: one user-keyed window shuffle, then two (user, ordinal)-
    * keyed equi-joins — purchases and touches are both corpus-sized but
    * the join keys are high-cardinality composites, so the hash joins
    * partition evenly (no channel-keyed skew; channels only appear in the
    * final 5-row aggregate). A full outer join merges the two 5-row
    * rollups. */
  def q147(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    // scratch-checkpointed (consumed 3x: purchases + both touch-join probe
    // sides) — one materialization of the user-keyed window pass, no
    // stranded cache entry (Checkpoints.scratch discipline)
    val e = graft.operators.Checkpoints.scratch(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"),
        floor(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("ord",
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).over(w)))
    val touches = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("tu"), col("ord").as("tord"),
        col("event_type").as("channel"))
    val purchases = e.filter(col("event_type") === "purchase" && col("ord") > 0)
      .select("user_id", "ord", "cents")
    def rollup(onOrd: Column, n: String, c: String): DataFrame = purchases
      .join(touches, col("user_id") === col("tu") && onOrd === col("tord"))
      .groupBy("channel")
      .agg(count(lit(1)).as(n), sum("cents").as(c))
    rollup(col("ord"), "last_n", "last_cents")
      .join(rollup(lit(1L), "first_n", "first_cents"), Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("last_n"), lit(0L)).as("last_n"),
        coalesce(col("last_cents"), lit(0L)).as("last_cents"),
        coalesce(col("first_n"), lit(0L)).as("first_n"),
        coalesce(col("first_cents"), lit(0L)).as("first_cents"))
      .orderBy("channel")
  }

  val q147Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
      |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ord
      |  FROM events
      |), touches AS (
      |  SELECT user_id AS tu, ord AS tord, event_type AS channel FROM e
      |  WHERE event_type <> 'purchase'
      |), purchases AS (
      |  SELECT user_id, ord, cents FROM e
      |  WHERE event_type = 'purchase' AND ord > 0
      |), lastt AS (
      |  SELECT channel, COUNT(*) AS last_n, SUM(cents) AS last_cents
      |  FROM purchases p JOIN touches t ON p.user_id = t.tu AND p.ord = t.tord
      |  GROUP BY channel
      |), firstt AS (
      |  SELECT channel, COUNT(*) AS first_n, SUM(cents) AS first_cents
      |  FROM purchases p JOIN touches t ON p.user_id = t.tu AND t.tord = 1
      |  GROUP BY channel
      |)
      |SELECT COALESCE(l.channel, f.channel) AS channel,
      |  CAST(COALESCE(l.last_n, 0) AS BIGINT) AS last_n,
      |  CAST(COALESCE(l.last_cents, 0) AS BIGINT) AS last_cents,
      |  CAST(COALESCE(f.first_n, 0) AS BIGINT) AS first_n,
      |  CAST(COALESCE(f.first_cents, 0) AS BIGINT) AS first_cents
      |FROM lastt l FULL OUTER JOIN firstt f ON l.channel = f.channel
      |ORDER BY channel""".stripMargin

  /** q149 position-based (U-shaped) multi-touch attribution over each
    * user's CONVERSION PATH — the touches before their first purchase —
    * completing the q147 single-touch pair: first and last touch get
    * 400000 ppm each, the interior splits the remaining 200000 by floor
    * division (the conventional 40/20/40 U-shape; a 1-touch path gets the
    * full 1e6, a 2-touch path 500000 each). Floor remainders are dropped,
    * not redistributed — per-path credit ≤ 1e6 exactly, which the spec
    * states and the test asserts, rather than a hidden rounding lottery.
    *
    * Scale shape: ONE user-keyed window pass — no purchase×touch join at
    * all. The first-purchase cut, each touch's position, and the path
    * length all come from the same partitioning, then one map-combined
    * channel rollup; credit assignment is pure per-row arithmetic. This is
    * the formulation that survives users with million-event histories,
    * where the naive per-purchase path join is quadratic. */
  def q149(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val all = Window.partitionBy("user_id")
      .orderBy("tms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tms"))
      .withColumn("cum_purch",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    // conversion-path touches: non-purchase events strictly before the
    // user's first purchase (cum_purch still 0 at the touch itself)
    val path = e
      .filter(col("event_type") =!= "purchase" && col("cum_purch") === 0)
      .withColumn("pos", row_number().over(byUser))
      .withColumn("n", count(lit(1)).over(all))
    // converted users only: paths of users who never purchase earn nothing
    val converted = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("cu")).distinct()
    path.join(converted, col("user_id") === col("cu"), "left_semi")
      .withColumn("w_ppm", expr(
        """case when n = 1 then 1000000
          |     when n = 2 then 500000
          |     when pos = 1 or pos = n then 400000
          |     else 200000 div (n - 2) end""".stripMargin))
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"), sum("w_ppm").as("credit_ppm"))
      .orderBy("channel")
  }

  val q149Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_purch
      |  FROM events
      |), path AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tms, event_id) AS pos,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM e WHERE event_type <> 'purchase' AND cum_purch = 0
      |), converted AS (
      |  SELECT DISTINCT user_id FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.event_type AS channel,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1000000
      |    WHEN n = 2 THEN 500000
      |    WHEN pos = 1 OR pos = n THEN 400000
      |    ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_ppm
      |FROM path p JOIN converted c ON p.user_id = c.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q217 time-decayed item popularity — the recency-weighted ranking a
    * recommender/trending feed runs instead of a raw count: each lineitem
    * contributes ⌊1e6 / 2^(age div 28 days)⌋ (a 4-week half-life, the
    * declared knob), so items cold for ~1.5 years decay to zero while raw
    * volume from years ago cannot dominate. The exponential is the EXACT
    * integer shift kernel (the q187 EWMA / q160 bitlen family — no float
    * pow in the plan), capped at 20 halvings so the shift never leaves
    * int64; the corpus max date rides as a 1-row broadcast scalar. Output:
    * top-20 parts by decayed score with the raw count alongside — the
    * "trending vs all-time" contrast is the point of the query.
    *
    * Scale shape: one narrow map (datediff + shift), ONE map-combined
    * part-keyed aggregate, TakeOrderedAndProject(20). */
  def q217(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("d"))
    val mx = li.agg(max("d").as("mx")) // 1-row scalar
    li.crossJoin(broadcast(mx))
      .withColumn("age_h", expr("datediff(mx, d) div 28"))
      .withColumn("wt", when(col("age_h") >= 20L, 0L)
        .otherwise(expr(
          "1000000 div shiftleft(CAST(1 AS BIGINT), CAST(age_h AS INT))")))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_items"), sum("wt").as("decayed"))
      .orderBy(desc("decayed"), col("l_partkey"))
      .limit(20)
  }

  val q217Sql: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d FROM lineitem
      |), mx AS (SELECT MAX(d) AS mx FROM li
      |), w AS (
      |  SELECT l_partkey,
      |    datediff('day', d, mx.mx) // 28 AS age_h
      |  FROM li CROSS JOIN mx
      |), s AS (
      |  SELECT l_partkey,
      |    CASE WHEN age_h >= 20 THEN 0
      |      ELSE 1000000 // (CAST(1 AS BIGINT) << CAST(age_h AS INT)) END
      |      AS wt
      |  FROM w
      |)
      |SELECT l_partkey, COUNT(*) AS n_items,
      |  CAST(SUM(wt) AS BIGINT) AS decayed
      |FROM s GROUP BY l_partkey
      |ORDER BY decayed DESC, l_partkey LIMIT 20""".stripMargin

  /** q230 RFM segmentation — the classic recency/frequency/monetary user
    * grid, in the engine's octave algebra so it is exact cross-engine:
    * per user over purchase events, recency = days since last purchase
    * (vs the corpus max event time, a 1-row broadcast "now"), frequency =
    * purchase count, monetary = lifetime cents; each dimension buckets by
    * bitlen octave (the q219/q160 integer-log surrogate — RFM's classic
    * quintiles need per-dimension global sorts; octaves are the
    * shuffle-free scale-safe rendering, and the q108/q53 trade applies if
    * true quintiles are required). Segments roll up to (code, users,
    * total cents) — the marketing/retention table, and the behavioral
    * companion of q105's cohort grid.
    *
    * Scale shape: one user-keyed map-combined aggregate, the octave map,
    * one ≤\|codes\| rollup; no window, one scalar broadcast. */
  def q230(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        floor(col("value") * 100).cast(LongType).as("cents"))
    val now = p.agg(max("ms").as("now_ms")) // 1-row scalar
    p.groupBy("user_id")
      .agg(max("ms").as("last_ms"), count(lit(1)).as("n_purch"),
        sum("cents").as("tot_cents"))
      .crossJoin(broadcast(now))
      .withColumn("r_oct", length(bin(
        expr("(now_ms - last_ms) div 86400000") + 1)).cast(LongType))
      .withColumn("f_oct", length(bin(col("n_purch"))).cast(LongType))
      // monetary mass clamped at 0: a refund-heavy user can go net-negative,
      // and Spark bin() renders negatives as 64-char two's complement while
      // DuckDB printf('%b') does not — the clamp keeps the octave domain
      // explicitly non-negative so both engines agree on every input
      .withColumn("m_oct",
        length(bin(greatest(col("tot_cents"), lit(0L)) + 1)).cast(LongType))
      .withColumn("rfm_code",
        expr("r_oct * 10000 + f_oct * 100 + m_oct"))
      .groupBy("rfm_code", "r_oct", "f_oct", "m_oct")
      .agg(count(lit(1)).as("n_users"), sum("tot_cents").as("seg_cents"))
      .orderBy("rfm_code")
  }

  val q230Sql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_ms(ts) AS ms,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'
      |), now AS (SELECT MAX(ms) AS now_ms FROM p
      |), u AS (
      |  SELECT user_id, MAX(ms) AS last_ms, COUNT(*) AS n_purch,
      |    CAST(SUM(cents) AS BIGINT) AS tot_cents
      |  FROM p GROUP BY user_id
      |), o AS (
      |  SELECT
      |    CAST(length(printf('%b', (now.now_ms - last_ms) // 86400000 + 1))
      |      AS BIGINT) AS r_oct,
      |    CAST(length(printf('%b', n_purch)) AS BIGINT) AS f_oct,
      |    CAST(length(printf('%b', GREATEST(tot_cents, 0) + 1)) AS BIGINT) AS m_oct,
      |    tot_cents
      |  FROM u CROSS JOIN now
      |)
      |SELECT r_oct * 10000 + f_oct * 100 + m_oct AS rfm_code,
      |  r_oct, f_oct, m_oct, COUNT(*) AS n_users,
      |  CAST(SUM(tot_cents) AS BIGINT) AS seg_cents
      |FROM o GROUP BY 1, 2, 3, 4 ORDER BY rfm_code""".stripMargin

  /** q231 sourcing-risk concentration — per part, how concentrated is its
    * supply across suppliers? The procurement twin of q194's lexical HHI:
    * per (part, supplier) shipped-quantity cells, per-part supplier count
    * and the quantity-share HHI in exact ppm; a part with HHI near 1e6
    * has a single point of failure even if it nominally lists several
    * suppliers. Output: the 20 most concentrated multi-supplier parts
    * (single-supplier parts are trivially 1e6 and filtered — the
    * actionable list is the nominally-diversified-but-actually-captive
    * tail).
    *
    * Scale shape: ONE map-combined (part, supplier) aggregate collapses
    * the fact table; the share window is keyed by part over
    * supplier-bounded cells; the cut is TakeOrderedAndProject(20). */
  def q231(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey")
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_quantity")).cast(LongType).as("qty"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("qty").as("q"))
      .withColumn("t", sum("q").over(w))
      .withColumn("share_ppm", expr("q * 1000000 div t"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_suppliers"), max("t").as("total_qty"),
        sum(expr("share_ppm * share_ppm div 1000000")).as("hhi_ppm"))
      .filter(col("n_suppliers") >= 2)
      .orderBy(desc("hhi_ppm"), col("l_partkey"))
      .limit(20)
  }

  val q231Sql: String =
    """WITH cells AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2
      |), sh AS (
      |  SELECT l_partkey, q,
      |    CAST(SUM(q) OVER (PARTITION BY l_partkey) AS BIGINT) AS t
      |  FROM cells
      |)
      |SELECT l_partkey, COUNT(*) AS n_suppliers,
      |  CAST(MAX(t) AS BIGINT) AS total_qty,
      |  CAST(SUM((q * 1000000 // t) * (q * 1000000 // t) // 1000000)
      |    AS BIGINT) AS hhi_ppm
      |FROM sh GROUP BY l_partkey HAVING COUNT(*) >= 2
      |ORDER BY hhi_ppm DESC, l_partkey LIMIT 20""".stripMargin

  // ---- q291 A/B experiment readout -----------------------------------------

  /** q291 deterministic A/B experiment readout with bootstrap error bars —
    * the experiment-analysis shape every event pipeline ends in: users are
    * assigned to arms by a salted portable hash (md5('ab:'||user_id) % 2 —
    * the industry-standard deterministic bucketing: stable across sessions,
    * reproducible across engines, no assignment table to join), the metric
    * is per-user purchase count (a continuous metric — the fixture's
    * binary any-purchase conversion saturates at 100% in both arms, which
    * was measured first and swapped), and the uplift (mean_B − mean_A in
    * ×10³ fixed point) ships with a [2nd, 31st]-of-32 Poisson-
    * bootstrap interval on the USER level — the q238 kernel (Chamandy et
    * al. 2012) re-aimed at a between-arm difference, with q238's
    * degenerate-replicate lesson inherited: a replicate is ranked only if
    * BOTH arms drew positive weight, and the rank picks clamp to the
    * defined count. Everything integer: rates are truncating ppm, the
    * uplift is a subtraction (negatives never reach a division). Scale
    * shape: one event scan to the per-user frame (user-vocabulary-
    * bounded), a ×32 replicate explode collapsing map-side into 64
    * (replicate, arm) cells, and a 32-row rank. */
  def q291(spark: SparkSession, dir: String): DataFrame = {
    // scratch barrier: the per-user frame feeds BOTH the point-estimate
    // branch and the ×32 bootstrap explode — without it the events scan
    // plus per-user aggregate executes twice (the semGateBatch/q288
    // recompute class)
    val users = graft.operators.Checkpoints.scratch(
      Tables.load(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .withColumn("arm", T.hashBucket(
          concat(lit("ab:"), col("user_id").cast(StringType)), 2)))
    val point = users.groupBy("arm").agg(
      count(lit(1)).as("n"), sum("conv").as("c"))
      .agg(
        sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("purch_a"),
        sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("purch_b"))
      .withColumn("mean_a_x1e3", expr("purch_a * 1000 div greatest(1, n_a)"))
      .withColumn("mean_b_x1e3", expr("purch_b * 1000 div greatest(1, n_b)"))
      .withColumn("uplift_x1e3", col("mean_b_x1e3") - col("mean_a_x1e3"))
    val cells = users
      .select(col("user_id"), col("arm"), col("conv"),
        explode(array((0 until 32).map(lit): _*)).as("b"))
      .withColumn("u", T.hashBucket(
        concat(col("user_id").cast(StringType), lit("#b"),
          col("b").cast(StringType)), 1000000))
      .withColumn("w", Evaluation.poissonW(col("u")))
      .groupBy("b", "arm").agg(sum("w").as("sw"),
        sum(expr("w * conv")).as("swc"))
    val reps = cells.groupBy("b").agg(
        min(when(col("arm") === 0, col("sw"))).as("sw_a"),
        min(when(col("arm") === 0, col("swc"))).as("swc_a"),
        min(when(col("arm") === 1, col("sw"))).as("sw_b"),
        min(when(col("arm") === 1, col("swc"))).as("swc_b"))
      .filter(col("sw_a") > 0 && col("sw_b") > 0)
      .withColumn("uplift_b", expr(
        "swc_b * 1000 div sw_b - swc_a * 1000 div sw_a"))
      .withColumn("r", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("uplift_b"), col("b"))))
      .withColumn("n_def", count(lit(1)).over(Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val ci = reps
      .filter(col("r") === least(lit(2L), col("n_def")) ||
        col("r") === greatest(col("n_def") - 1, lit(1L)))
      .agg(min("uplift_b").as("boot_lo_x1e3"), max("uplift_b").as("boot_hi_x1e3"),
        max("n_def").as("n_defined_reps"))
    point.crossJoin(broadcast(ci))
      .select("n_a", "purch_a", "mean_a_x1e3", "n_b", "purch_b", "mean_b_x1e3",
        "uplift_x1e3", "n_defined_reps", "boot_lo_x1e3", "boot_hi_x1e3")
  }

  val q291Sql: String =
    s"""WITH users AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
      |    CAST('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 2 AS arm
      |  FROM events GROUP BY user_id
      |), pt AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
      |      AS purch_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
      |      AS purch_b
      |  FROM users
      |), r AS (
      |  SELECT u.arm, u.conv, b.b,
      |    CAST('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '#b'
      |      || CAST(b.b AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS uu
      |  FROM users u CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
      |), cw AS (
      |  SELECT b, arm,
      |    SUM(${Evaluation.poissonCaseSql("uu")}) AS sw,
      |    SUM(${Evaluation.poissonCaseSql("uu")} * conv) AS swc
      |  FROM r GROUP BY b, arm
      |), reps AS (
      |  SELECT b,
      |    MIN(CASE WHEN arm = 0 THEN sw END) AS sw_a,
      |    MIN(CASE WHEN arm = 0 THEN swc END) AS swc_a,
      |    MIN(CASE WHEN arm = 1 THEN sw END) AS sw_b,
      |    MIN(CASE WHEN arm = 1 THEN swc END) AS swc_b
      |  FROM cw GROUP BY b
      |), defined AS (
      |  SELECT b,
      |    swc_b * 1000 // sw_b - swc_a * 1000 // sw_a AS uplift_b
      |  FROM reps WHERE sw_a > 0 AND sw_b > 0
      |), ranked AS (
      |  SELECT uplift_b,
      |    ROW_NUMBER() OVER (ORDER BY uplift_b, b) AS r,
      |    COUNT(*) OVER () AS n_def
      |  FROM defined
      |), ci AS (
      |  SELECT MIN(uplift_b) AS boot_lo_x1e3, MAX(uplift_b) AS boot_hi_x1e3,
      |    MAX(n_def) AS n_defined_reps
      |  FROM ranked
      |  WHERE r = LEAST(2, n_def) OR r = GREATEST(n_def - 1, 1)
      |)
      |SELECT pt.n_a, pt.purch_a,
      |  CAST(pt.purch_a * 1000 // GREATEST(1, pt.n_a) AS BIGINT)
      |    AS mean_a_x1e3,
      |  pt.n_b, pt.purch_b,
      |  CAST(pt.purch_b * 1000 // GREATEST(1, pt.n_b) AS BIGINT)
      |    AS mean_b_x1e3,
      |  CAST(pt.purch_b * 1000 // GREATEST(1, pt.n_b)
      |    - pt.purch_a * 1000 // GREATEST(1, pt.n_a) AS BIGINT)
      |    AS uplift_x1e3,
      |  CAST(ci.n_defined_reps AS BIGINT) AS n_defined_reps,
      |  CAST(ci.boot_lo_x1e3 AS BIGINT) AS boot_lo_x1e3,
      |  CAST(ci.boot_hi_x1e3 AS BIGINT) AS boot_hi_x1e3
      |FROM pt CROSS JOIN ci""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q291_ab_experiment", q291 _, Some(q291Sql)),
    ("q217_decayed_popularity", q217 _, Some(q217Sql)),
    ("q231_sourcing_hhi", q231 _, Some(q231Sql)),
    ("q230_rfm_segments", q230 _, Some(q230Sql)),
    ("q69_unpivot", q69 _, Some(q69Sql)),
    ("q70_islands", q70 _, Some(q70Sql)),
    ("q71_fuzzy_block_join", q71 _, Some(q71Sql)),
    ("q72_date_spine", q72 _, Some(q72Sql)),
    ("q73_weighted_udaf", q73 _, Some(q73Sql)),
    ("q74_map_funcs", q74 _, Some(q74Sql)),
    ("q75_session_window", q75 _, Some(q75Sql)),
    ("q76_value_window", q76 _, Some(q76Sql)),
    ("q77_argminmax", q77 _, Some(q77Sql)),
    ("q78_bool_aggs", q78 _, Some(q78Sql)),
    ("q79_text_normalize", q79 _, Some(q79Sql)),
    ("q115_string_agg", q115 _, Some(q115Sql)),
    ("q116_share_of_total", q116 _, Some(q116Sql)),
    ("q122_basket_pairs", q122 _, Some(q122Sql)),
    ("q123_association_lift", q123 _, Some(q123Sql)),
    ("q145_triple_itemsets",
      (s: SparkSession, d: String) => q145(s, d), Some(q145Sql)),
    ("q147_attribution", q147 _, Some(q147Sql)),
    ("q149_path_attribution", q149 _, Some(q149Sql)))
}

/** Typed input/buffer rows for [[WeightedCents]] — top-level case classes so
  * the product encoders resolve statically. */
case class WCIn(c: Long, q: Long)
case class WCBuf(num: Long, den: Long)

/** Quantity-weighted cents accumulator (q73): exact integer partial sums. */
object WeightedCents extends Aggregator[WCIn, WCBuf, WCBuf] {
  def zero: WCBuf = WCBuf(0L, 0L)
  def reduce(b: WCBuf, a: WCIn): WCBuf = WCBuf(b.num + a.c * a.q, b.den + a.q)
  def merge(x: WCBuf, y: WCBuf): WCBuf = WCBuf(x.num + y.num, x.den + y.den)
  def finish(r: WCBuf): WCBuf = r
  def bufferEncoder: org.apache.spark.sql.Encoder[WCBuf] = Encoders.product[WCBuf]
  def outputEncoder: org.apache.spark.sql.Encoder[WCBuf] = Encoders.product[WCBuf]
}
