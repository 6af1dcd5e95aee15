package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage beyond the reference's own operator set (SURVEY §2.6/§2.8 list
  * what the reference lacks): grouping sets, pivot, date/conditional
  * functions, scalar subqueries, lateral explode, deterministic sampling,
  * as-of and range joins, per-group top-k, exact quantiles. Every query here
  * is DuckDB-oracle-checked; money is integer cents, keys and counts are
  * BIGINT, and each result carries a total ORDER BY.
  */
object Advanced {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast(LongType)

  /** q39 CUBE over (priority, status): all 2^2 grouping sets in one pass —
    * Spark plans a single Expand + hash aggregate, no re-scan per set. NULL
    * group markers are made explicit (gid + 'ALL') so ordering is
    * engine-portable. */
  def q39(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast(IntegerType).as("gid"),
        count(lit(1)).as("n"), sum("cents").as("revenue_cents"))
      .select(col("gid"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("revenue_cents"))
      .orderBy("gid", "priority", "status")

  val q39Sql =
    """SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY gid, priority, status""".stripMargin

  /** q40 pivot (status × priority counts) with a fixed value list — explicit
    * values keep the plan a single aggregate (no values-discovery scan) and
    * the output schema static, which is what a 100 TB pivot needs anyway. */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("urgent", "high", "medium", "notspec", "low")
    val piv = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .pivot("o_orderpriority", pris)
      .count()
    piv.select(col("status") +: pris.zip(names).map { case (v, n) =>
      coalesce(piv(s"`$v`"), lit(0L)).as(n) }: _*)
      .orderBy("status")
  }

  val q40Sql =
    """SELECT o_orderstatus AS status,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
      |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
      |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
      |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec,
      |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
      |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** q41 date functions: month bucket (date_trunc), year/quarter extraction,
    * day arithmetic (ship delay) — aggregated per order-month. */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast(DateType).cast(StringType)
          .as("month_start"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"))
      .agg(count(lit(1)).as("n_lines"),
        sum(datediff(col("l_shipdate"), col("o_orderdate"))).cast(LongType)
          .as("total_ship_delay_days"))
      .orderBy("month_start")
  }

  val q41Sql =
    """SELECT CAST(CAST(date_trunc('month', o.o_orderdate) AS DATE) AS VARCHAR) AS month_start,
      |  CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
      |  CAST(EXTRACT(quarter FROM o.o_orderdate) AS BIGINT) AS qtr,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS total_ship_delay_days
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2, 3 ORDER BY month_start""".stripMargin

  /** q42 scalar subquery: orders priced above the global average. The scalar
    * aggregate is broadcast into the filter — one full scan for the average,
    * one for the filter, zero shuffles of the fact table. Integer-cents math
    * keeps the double average bit-identical across engines (exact sums below
    * 2^53 divided once). */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
    val avgC = o.agg(avg("cents").as("avg_cents"))
    o.join(broadcast(avgC))
      .filter(col("cents") > col("avg_cents"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_above"))
      .orderBy("o_orderpriority")
  }

  val q42Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_above
      |FROM orders
      |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >
      |  (SELECT AVG(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q43 vocabulary extraction: lateral explode of the token stream → global
    * term frequencies → top-20. The explode is a narrow map; the count is one
    * hash aggregate with map-side partials; top-k is TakeOrderedAndProject —
    * no global sort of the vocabulary. */
  def q43(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token")).limit(20)

  val q43Sql =
    """SELECT w AS token, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY w ORDER BY freq DESC, token LIMIT 20""".stripMargin

  /** q44 deterministic hash sampling (1-in-10 by md5 of the key) — the
    * reproducible train/eval split primitive: stable under reruns, cluster
    * layout, and engine choice, unlike rand()-based sampling. */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.withColumn("bucket",
        graft.functions.TextFunctions.hashBucket(col("doc_id"), 10))
      .filter(col("bucket") === 0)
      .select(col("doc_id"),
        ((length(col("text")) - length(regexp_replace(col("text"), " ", ""))) + 1)
          .cast(LongType).as("n_tokens"))
      .orderBy("doc_id")
  }

  val q44Sql =
    """SELECT doc_id,
      |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
      |FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0
      |ORDER BY doc_id""".stripMargin

  /** q45 backward as-of join: each event annotated with the user's most
    * recent order date at or before the event (merge as-of via
    * [[graft.operators.AsOfJoin]]). Oracle uses DuckDB's native ASOF JOIN. */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").select("event_id", "user_id", "ts")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    AsOfJoin.backward(e, o, key = "user_id", leftTs = "ts",
        rightTs = "o_orderdate", outCol = "last_order_ts")
      .select(col("event_id"), col("user_id"),
        col("last_order_ts").cast(StringType).as("last_order_ts"))
      .orderBy("event_id")
  }

  val q45Sql =
    """SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS VARCHAR) AS last_order_ts
      |FROM events e ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** q134 FORWARD as-of join (operators/AsOfJoin.forward) — each event
    * matched to the NEXT order date of the same user (least o_orderdate ≥
    * ts): the "next scheduled/observed" lookup of a time-series pipeline,
    * completing the as-of family next to q45's backward match. Same merge
    * shape: one keyed shuffle + one within-partition sort, no candidate
    * blow-up. The oracle is algorithmically INDEPENDENT — a correlated
    * scalar MIN subquery, not a window replay — so the merge formulation is
    * cross-checked against first principles. */
  def q134(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").select("event_id", "user_id", "ts")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"))
    AsOfJoin.forward(e, o, key = "user_id", leftTs = "ts",
        rightTs = "o_orderdate", outCol = "next_order_ts")
      .select(col("event_id"), col("user_id"),
        col("next_order_ts").cast(StringType).as("next_order_ts"))
      .orderBy("event_id")
  }

  val q134Sql =
    """SELECT e.event_id, e.user_id,
      |  CAST((SELECT MIN(o.o_orderdate) FROM orders o
      |        WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
      |    AS VARCHAR) AS next_order_ts
      |FROM events e ORDER BY e.event_id""".stripMargin

  /** q46 range (band) join: parts priced into irregular bands via a non-equi
    * join. The band table is tiny and broadcast, so Spark plans a
    * BroadcastNestedLoopJoin — each part row tests 4 predicates, no shuffle.
    * (With a LARGE band table the scale path is interval bucketing: assign
    * both sides a coarse equi-bucket, join on it, re-filter exactly.) */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(Seq(
      ("b0_budget", 900.0, 920.0), ("b1_mid", 920.0, 950.0),
      ("b2_upper", 950.0, 965.0), ("b3_premium", 965.0, 1000.0)))
      .toDF("band", "lo", "hi")
    val p = Tables.load(spark, dir, "part")
    p.join(broadcast(bands),
        p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
        sum(cents(col("p_retailprice"))).as("sum_cents"))
      .orderBy("band")
  }

  val q46Sql =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('b0_budget', 900.0, 920.0), ('b1_mid', 920.0, 950.0),
      |  ('b2_upper', 950.0, 965.0), ('b3_premium', 965.0, 1000.0))
      |SELECT b.band, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(FLOOR(p.p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM part p JOIN bands b
      |  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
      |GROUP BY b.band ORDER BY b.band""".stripMargin

  /** q47 top-k per group (top-3 parts per brand by price): rank inside a
    * keyed window, filter early — one shuffle on the group key, and the
    * filter cuts each group to k rows before anything downstream. */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .withColumn("retail_cents", cents(col("p_retailprice")))
    val w = Window.partitionBy("p_brand")
      .orderBy(desc("retail_cents"), col("p_partkey"))
    p.withColumn("rank_in_brand", row_number().over(w).cast(LongType))
      .filter(col("rank_in_brand") <= 3)
      .select(col("p_brand").as("brand"), col("rank_in_brand"),
        col("p_partkey").as("part_id"), col("retail_cents"))
      .orderBy("brand", "rank_in_brand")
  }

  val q47Sql =
    """WITH r AS (
      |  SELECT p_brand AS brand,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY FLOOR(p_retailprice * 100) DESC, p_partkey) AS BIGINT) AS rank_in_brand,
      |    p_partkey AS part_id,
      |    CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS retail_cents
      |  FROM part)
      |SELECT * FROM r WHERE rank_in_brand <= 3
      |ORDER BY brand, rank_in_brand""".stripMargin

  /** q48 exact per-group median, integer-exact: median×2 (sum of the one or
    * two middle elements, odd groups doubled) avoids cross-engine float
    * interpolation entirely. Rank and group-count share one shuffle (same
    * partition key); percentile_approx is the right call at 100 TB when
    * exactness isn't contractual — this shows the exact path. */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("cents"), col("o_orderkey"))
    val wAll = Window.partitionBy("o_orderpriority")
    val rn2 = col("rn") * 2
    o.withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("o_orderpriority")
      .agg(max(col("n")).as("n_orders"),
        (sum(when(rn2 === col("n") || rn2 === col("n") + 1 || rn2 === col("n") + 2,
            col("cents")).otherwise(0L))
          * when(max(col("n")) % 2 === 0, 1L).otherwise(2L)).as("median_x2_cents"))
      .orderBy("o_orderpriority")
  }

  val q48Sql =
    """WITH c AS (
      |  SELECT o_orderpriority,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY FLOOR(o_totalprice * 100), o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2) THEN cents ELSE 0 END)
      |    * (CASE WHEN MAX(n) % 2 = 0 THEN 1 ELSE 2 END) AS BIGINT) AS median_x2_cents
      |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q50 JSON property extraction: the event `props` column parsed per row
    * (narrow map — no UDF, no shuffle beyond the final agg). */
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), max(k).as("max_k"))
      .orderBy("event_type")
  }

  val q50Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q51 string-function surface: case, substring, length, concat, pad,
    * reverse, replace — the scalar-function family the reference never
    * touches (SURVEY §2.7 "not present"). */
  def q51(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation")
      .select(
        col("n_nationkey").as("nation_id"),
        lower(col("n_name")).as("name_lower"),
        substring(col("n_name"), 1, 3).as("name_pfx"),
        length(col("n_name")).as("name_len"),
        concat(col("n_name"), lit("#"), col("n_nationkey").cast(StringType))
          .as("tagged"),
        lpad(col("n_nationkey").cast(StringType), 4, "0").as("id_pad"),
        reverse(col("n_name")).as("name_rev"),
        regexp_replace(col("n_name"), "N", "_").as("name_sub"))
      .orderBy("nation_id")

  val q51Sql =
    """SELECT n_nationkey AS nation_id,
      |  LOWER(n_name) AS name_lower,
      |  SUBSTR(n_name, 1, 3) AS name_pfx,
      |  CAST(LENGTH(n_name) AS INTEGER) AS name_len,
      |  CONCAT(n_name, '#', CAST(n_nationkey AS VARCHAR)) AS tagged,
      |  LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS id_pad,
      |  REVERSE(n_name) AS name_rev,
      |  REPLACE(n_name, 'N', '_') AS name_sub
      |FROM nation ORDER BY nation_id""".stripMargin

  /** q52 COUNT DISTINCT + HAVING: the distinct aggregate expands to a
    * two-phase plan (partial distinct-ization per mapper, then merge) —
    * Catalyst's Expand-based rewrite, no code needed; HAVING is a filter on
    * the aggregated plan. */
  def q52(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n"))
      .filter(col("n") > 100)
      .orderBy("o_orderpriority")

  val q52Sql =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 100
      |ORDER BY o_orderpriority""".stripMargin

  /** q53 sketches: HLL++ approximate distinct (rsd 5%) and approximate
    * quantiles per priority — the O(1)-memory row the exact operators (q48
    * median, q52 COUNT DISTINCT) trade against at 100 TB. Spark-only (sketch
    * estimates are engine-specific by nature); the estimates are spec-bound
    * to within 10% of the exact values in AdvancedSpec. */
  def q53(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx_cust"),
        percentile_approx(col("cents"), lit(0.5), lit(10000))
          .as("approx_median_cents"),
        percentile_approx(col("cents"), lit(0.99), lit(10000))
          .as("approx_p99_cents"))
      .orderBy("o_orderpriority")

  /** q215 HyperLogLog register table — where q53's built-in HLL++ is
    * engine-specific by nature, this is the SAME sketch (Flajolet et al.
    * 2007) made engine-PORTABLE and hash-checkable: distinct-text
    * cardinality registers over the portable md5-60 hash — bucket = the
    * hash's top 6 bits (m = 64 registers), ρ = position of the first set
    * bit in the remaining 54 (55 − bitlen, the q160 integer-log kernel;
    * 55 for an all-zero tail), register value = max ρ per bucket. The
    * DuckDB oracle replays every register exactly; AdvancedSpec finishes
    * the harmonic-mean estimate driver-side (the q88 "consumer finishes"
    * discipline — the α·m²/Σ2^−M finishing is float math that has no
    * business inside a hash-gated plan) and bounds it against the exact
    * distinct count.
    *
    * Scale shape — the reason HLL exists: max is associative over
    * DUPLICATED hashes, so the register table needs NO distinct
    * pre-aggregate — ONE map-combined aggregate collapses every task to
    * ≤64 rows, shuffle bytes executor-count-sized (the q211 CMS contract,
    * on the distinct-count axis), and shard register tables merge by MAX
    * — the mergeability q53's opaque sketch buffer provides only through
    * its own binary format. */
  def q215(spark: SparkSession, dir: String): DataFrame = {
    val p54 = 1L << 54
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(graft.functions.TextFunctions.portableHash60(col("text")).as("h"))
      .select(expr(s"h div ${p54}L").as("bucket"), expr(s"h % ${p54}L").as("rest"))
      .select(col("bucket"),
        when(col("rest") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("rest"))).cast(LongType))
          .as("rho"))
      .groupBy("bucket").agg(max("rho").as("max_rho"))
      .orderBy("bucket")
  }

  val q215Sql: String =
    """WITH h AS (
      |  SELECT CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      |  FROM documents
      |), c AS (
      |  SELECT h // 18014398509481984 AS bucket,
      |         h %  18014398509481984 AS rest
      |  FROM h
      |), r AS (
      |  SELECT bucket, CASE WHEN rest = 0 THEN 55
      |    ELSE 55 - length(printf('%b', rest)) END AS rho
      |  FROM c
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(MAX(rho) AS BIGINT) AS max_rho
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q233 HyperLogLog TIME-ROLLUP merge — q215's register sketch doing the
    * job register tables exist for: the hour→corpus rollup a traffic
    * dashboard runs (distinct users per hour, per day, all-time) without
    * ever re-touching raw events. Each HOUR builds its own 64-register
    * table over the portable md5-60 of user_id; the corpus-level registers
    * are the REGISTER-WISE MAX of the hourly tables (max is associative
    * and idempotent — the defining HLL merge, Flajolet et al. 2007 §4),
    * emitted with each register's contributing-hour count. The DuckDB
    * oracle builds the corpus registers the direct one-pass way, so the
    * hash gate is the rollup-correctness proof: hourly build + MAX-merge
    * ≡ direct build, register for register — the time axis of exactly
    * the shard-axis proof q232 runs for count-min.
    *
    * Scale shape: ONE event-scan pass; tasks map-combine into
    * ≤ hours·64 cells (time-bounded, not corpus-bounded), the merge
    * collapses to ≤64 rows. The same plan rolls hours→days→months:
    * only the grouping key coarsens, registers never rebuild. */
  def q233(spark: SparkSession, dir: String): DataFrame = {
    val p54 = 1L << 54
    Tables.load(spark, dir, "events")
      .select(expr("unix_millis(ts) div 3600000").as("hr"),
        graft.functions.TextFunctions.portableHash60(col("user_id")).as("h"))
      .select(col("hr"), expr(s"h div ${p54}L").as("bucket"),
        expr(s"h % ${p54}L").as("rest"))
      .select(col("hr"), col("bucket"),
        when(col("rest") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("rest"))).cast(LongType))
          .as("rho"))
      .groupBy("hr", "bucket").agg(max("rho").as("hr_rho")) // hourly tables
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_hours"), max("hr_rho").as("max_rho"))
      .orderBy("bucket")
  }

  /** Direct single-pass corpus registers (no hourly stage) — equality with
    * the Spark side's MAX-merged hourly registers proves the rollup. */
  val q233Sql: String =
    """WITH h AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
      |      AS h
      |  FROM events
      |), c AS (
      |  SELECT hr, h // 18014398509481984 AS bucket,
      |         h %  18014398509481984 AS rest
      |  FROM h
      |), r AS (
      |  SELECT hr, bucket, CASE WHEN rest = 0 THEN 55
      |    ELSE 55 - length(printf('%b', rest)) END AS rho
      |  FROM c
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(COUNT(DISTINCT hr) AS BIGINT) AS n_hours,
      |  CAST(MAX(rho) AS BIGINT) AS max_rho
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q236 distributed top-k MERGE proof — the serving topology of every
    * ranked leaderboard at 100 TB, completing the merge-proof family next
    * to q232 (CMS cell-sum) and q233 (HLL register-max) on the RANKING
    * axis: the per-part revenue aggregate is KEY-partitioned (each part's
    * whole sum lives in exactly one md5 shard), each shard emits its LOCAL
    * top-20 under the total (revenue desc, part) order, and the global
    * top-20 re-ranks the ≤ shards·20 merged candidates. Correct by
    * construction: with shard k ≥ global k and grouping keys never
    * straddling shards, every global top-20 row is inside its own shard's
    * top-20. The DuckDB oracle computes the top-20 the direct global way —
    * the hash gate proves the merge, row for row.
    *
    * Scale shape: one fact scan into a map-combined (shard, part)
    * aggregate; the shard-local rank is a rank-only row_number window ⇒
    * WindowGroupLimit prunes to 20 rows per shard map-side (CI-asserted);
    * the final cut is TakeOrderedAndProject over ≤ 8·20 candidate rows —
    * driver-safe at any corpus size. */
  def q236(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("part"),
        cents(col("l_extendedprice")).as("cents"))
      .withColumn("shard",
        graft.functions.TextFunctions.hashBucket(col("part"), 8))
      .groupBy("shard", "part").agg(sum("cents").as("revenue_cents"))
    val local = Window.partitionBy("shard")
      .orderBy(desc("revenue_cents"), col("part"))
    cells.withColumn("rk", row_number().over(local))
      .filter(col("rk") <= 20) // shard-local top-20, k equal to global k
      .orderBy(desc("revenue_cents"), col("part"))
      .limit(20)
      .select("part", "revenue_cents")
  }

  /** Direct global top-20 (no shard stage) — equality with the Spark
    * side's shard-merged ranking is the distributed top-k proof. */
  val q236Sql: String =
    """SELECT l_partkey AS part,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem GROUP BY 1
      |ORDER BY revenue_cents DESC, part LIMIT 20""".stripMargin

  /** q216 portable Bloom filter — the third mergeable sketch next to
    * q211's CMS (frequency) and q215's HLL (cardinality): set MEMBERSHIP
    * over document texts as a 2048-bit array packed into 32 bigint words,
    * k = 4 md5 probe hashes (the engine-portable q44/q84 bucket
    * primitive). Emitted as (word, packed bits, popcount) rows the DuckDB
    * oracle replays bit-for-bit — the 1L<<63 sign-bit mask is spelled as
    * an explicit CASE because DuckDB raises on a left-shift into the sign
    * bit while two's-complement BIT_OR/bit_count then agree everywhere.
    * This is the exact filter behind the runtime bloom joins
    * PlanQualitySpec asserts Catalyst injects — here as a declared,
    * shippable artifact (e.g. the q128/q185 ingest gates can pre-screen
    * against it before the semi-join).
    *
    * Scale shape: OR is associative over duplicate keys, so ONE
    * map-combined aggregate collapses every task to ≤32 rows (the
    * q211/q215 bounded-shuffle contract); shard filters merge by OR
    * (spec-proved), and the false-positive rate follows the
    * (1−e^(−kn/m))^k curve (spec-bounded). */
  def q216(spark: SparkSession, dir: String): DataFrame = {
    val probes = explode(array((0 until 4).map(lit): _*)).as("j")
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("text"), probes)
      .select(graft.functions.TextFunctions.hashBucket(
        concat(col("text"), lit("#bf"), col("j").cast(StringType)), 2048)
        .as("b"))
      .select(expr("b div 64").as("word"), expr("b % 64").as("bit"))
      .select(col("word"),
        when(col("bit") === 63L, lit(Long.MinValue))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
          .as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .withColumn("n_set", bit_count(col("bits")).cast(LongType))
      .orderBy("word")
  }

  val q216Sql: String =
    """WITH k AS (
      |  SELECT text, unnest([0, 1, 2, 3]) AS j FROM documents
      |), b AS (
      |  SELECT CAST('0x' || substr(md5(text || '#bf' || CAST(j AS VARCHAR)),
      |    1, 8) AS BIGINT) % 2048 AS b
      |  FROM k
      |), w AS (
      |  SELECT b // 64 AS word,
      |    CASE WHEN b % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
      |      ELSE CAST(1 AS BIGINT) << CAST(b % 64 AS INT) END AS mask
      |  FROM b
      |)
      |SELECT CAST(word AS BIGINT) AS word,
      |  CAST(BIT_OR(mask) AS BIGINT) AS bits,
      |  CAST(bit_count(BIT_OR(mask)) AS BIGINT) AS n_set
      |FROM w GROUP BY word ORDER BY word""".stripMargin

  /** q55 value-RANGE window frame (vs q17's ROWS frames): running sum over
    * all orders within 10,000.00 of the current price per customer — frame
    * membership by value distance, peers included, deterministic. */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("cents")
      .rangeBetween(-1000000L, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"), col("cents"),
        sum("cents").over(w).as("near_sum"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q55Sql =
    """WITH c AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, cents,
      |  CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY cents
      |    RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum
      |FROM c ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q56 regex tokenization (the "BPE-ish regex" counting path next to the
    * whitespace counter): `[a-z]+[0-9]*` word units extracted per document
    * and aggregated per source. On the clean fixture the two counts agree —
    * on a real dirty corpus (punctuation, mixed scripts) the regex path is
    * the robust one; both run as narrow codegen'd maps. */
  def q56(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("source")
      .agg(
        sum(size(regexp_extract_all(col("text"), lit("[a-z]+[0-9]*"), lit(0))))
          .cast(LongType).as("regex_tokens"),
        sum((length(col("text")) -
          length(regexp_replace(col("text"), " ", ""))) + 1)
          .cast(LongType).as("ws_tokens"))
      .orderBy("source")

  val q56Sql =
    """SELECT source,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+[0-9]*'))) AS BIGINT) AS regex_tokens,
      |  CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS ws_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q57 null-handling functions: NULLIF/COALESCE through an aggregate —
    * the null-semantics family (SURVEY §2.7 lists conditionals as absent in
    * the reference). */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val notP = nullif(col("o_orderstatus"), lit("P"))
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(notP).as("n_not_p"),
        (count(lit(1)) - count(notP)).as("n_p"),
        coalesce(max(nullif(col("o_orderstatus"), lit("F"))), lit("none"))
          .as("max_non_f"))
      .orderBy("o_orderpriority")
  }

  val q57Sql =
    """SELECT o_orderpriority,
      |  COUNT(NULLIF(o_orderstatus, 'P')) AS n_not_p,
      |  COUNT(*) - COUNT(NULLIF(o_orderstatus, 'P')) AS n_p,
      |  COALESCE(MAX(NULLIF(o_orderstatus, 'F')), 'none') AS max_non_f
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q62 SCD Type-2 interval builder (the Kimball pattern the reference's
    * dims never got): each customer's order-priority history collapsed into
    * versioned validity intervals — change detection by lag(), run grouping
    * by a running change-count, valid_to = next run's valid_from ('current'
    * for the open version). Two window passes over one (custkey) shuffle
    * plus the run aggregate; no self-join. */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val byVer = Window.partitionBy("o_custkey").orderBy("version")
    Tables.load(spark, dir, "orders")
      .withColumn("prev", lag("o_orderpriority", 1).over(byTime))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("o_orderpriority"), 1L)
          .otherwise(0L))
      .withColumn("version", sum("chg").over(byTime))
      .groupBy(col("o_custkey"), col("version"))
      .agg(min("o_orderpriority").as("priority"), // constant within a run
        min("o_orderdate").as("from_ts"), count(lit(1)).as("n_orders"))
      .withColumn("valid_from", col("from_ts").cast(StringType))
      .withColumn("valid_to",
        coalesce(lead("from_ts", 1).over(byVer).cast(StringType), lit("current")))
      .select("o_custkey", "version", "priority", "valid_from", "valid_to", "n_orders")
      .orderBy("o_custkey", "version")
  }

  val q62Sql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders
      |), m AS (
      |  SELECT *, CASE WHEN prev IS NULL OR prev <> o_orderpriority
      |    THEN 1 ELSE 0 END AS chg FROM o
      |), r AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM m
      |), runs AS (
      |  SELECT o_custkey, version, MIN(o_orderpriority) AS priority,
      |    MIN(o_orderdate) AS from_ts, COUNT(*) AS n_orders
      |  FROM r GROUP BY o_custkey, version
      |)
      |SELECT o_custkey, version, priority,
      |  CAST(from_ts AS VARCHAR) AS valid_from,
      |  COALESCE(CAST(lead(from_ts) OVER (PARTITION BY o_custkey ORDER BY version)
      |    AS VARCHAR), 'current') AS valid_to,
      |  n_orders
      |FROM runs ORDER BY o_custkey, version""".stripMargin

  /** q63 sliding event-time windows (1 h window, 30 min slide): each event
    * lands in exactly two overlapping windows — Spark's window() plans this
    * as a 2-element expand + one hash aggregate, the same shape its
    * Structured Streaming twin uses. Window starts exported as epoch
    * millis, immune to timestamp-formatting drift. */
  def q63(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"), col("value"))
      .groupBy(unix_millis(col("w.start")).as("win_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * lit(100))
          .cast(LongType).as("sum_cents"))
      .orderBy("win_start_ms", "event_type")

  val q63Sql =
    """WITH e AS (
      |  SELECT event_type, value,
      |    (epoch_ms(ts) // 1800000) * 1800000 AS b
      |  FROM events
      |), w AS (
      |  SELECT event_type, value, unnest([b, b - 1800000]) AS win_start_ms FROM e
      |)
      |SELECT win_start_ms, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents
      |FROM w GROUP BY win_start_ms, event_type
      |ORDER BY win_start_ms, event_type""".stripMargin

  /** q64 SCD Type-1 upsert (the MERGE the reference's truncate-and-reload
    * sidesteps): a staged change set — price updates for every 7th part,
    * net-new products for every 131st — merged into the current dim by one
    * full-outer join on the business key; staged values win, and each row
    * is tagged insert/update/keep. At warehouse scale the same plan runs
    * key-partitioned with no data movement beyond the staged side. */
  def q64(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val rc = cents(col("p_retailprice"))
    val cur = part.select(col("p_partkey").as("product_id"),
      col("p_name").as("name"), rc.as("retail_cents"), lit(1).as("in_cur"))
    val staged = part.filter(pmod(col("p_partkey"), lit(7)) === 0)
      .select(col("p_partkey").as("product_id"), col("p_name").as("name"),
        (rc + 500L).as("retail_cents"))
      .union(part.filter(pmod(col("p_partkey"), lit(131)) === 0)
        .select((col("p_partkey") + 1000000L).as("product_id"),
          concat(col("p_name"), lit(" v2")).as("name"), rc.as("retail_cents")))
      .withColumn("in_stg", lit(1))
    cur.as("c").join(staged.as("s"), Seq("product_id"), "full_outer")
      .select(col("product_id"),
        coalesce(col("s.name"), col("c.name")).as("name"),
        coalesce(col("s.retail_cents"), col("c.retail_cents")).as("retail_cents"),
        when(col("in_stg").isNull, "keep")
          .when(col("in_cur").isNull, "insert")
          .otherwise("update").as("action"))
      .orderBy("product_id")
  }

  val q64Sql =
    """WITH cur AS (
      |  SELECT p_partkey AS product_id, p_name AS name,
      |    CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS retail_cents
      |  FROM part
      |), staged AS (
      |  SELECT p_partkey AS product_id, p_name AS name,
      |    CAST(FLOOR(p_retailprice * 100) AS BIGINT) + 500 AS retail_cents
      |  FROM part WHERE p_partkey % 7 = 0
      |  UNION ALL
      |  SELECT p_partkey + 1000000, p_name || ' v2',
      |    CAST(FLOOR(p_retailprice * 100) AS BIGINT)
      |  FROM part WHERE p_partkey % 131 = 0
      |)
      |SELECT COALESCE(c.product_id, s.product_id) AS product_id,
      |  COALESCE(s.name, c.name) AS name,
      |  COALESCE(s.retail_cents, c.retail_cents) AS retail_cents,
      |  CASE WHEN s.product_id IS NULL THEN 'keep'
      |       WHEN c.product_id IS NULL THEN 'insert'
      |       ELSE 'update' END AS action
      |FROM cur c FULL OUTER JOIN staged s ON c.product_id = s.product_id
      |ORDER BY product_id""".stripMargin

  /** q65 correlated EXISTS / NOT EXISTS through the SQL surface: customers
    * with an urgent order but no finished one. Catalyst decorrelates the
    * pair into one left-semi and one left-anti join against orders — no
    * per-row subquery execution at any scale (plan shape CI-asserted). */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("q65_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q65_orders")
    spark.sql(
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM q65_customer c
        |WHERE EXISTS (SELECT 1 FROM q65_orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM q65_orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  val q65Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey
      |          AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |        WHERE o2.o_custkey = c.c_custkey
      |          AND o2.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** q98 skew-salted equi-join: the [[graft.operators.SkewSalt]] operator on
    * the fact→dim join, proven result-identical to the plain join by the
    * DuckDB oracle (which runs the unsalted SQL). Salting trades |dim| × 4
    * replication for spreading any hot part key over 4 reducers — the manual
    * tool for skew that AQE's sort-merge splitting can't reach (e.g. a
    * salted key feeding a downstream keyed aggregation). */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), cents(col("l_extendedprice")).as("cents"))
    val p = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    graft.operators.SkewSalt.saltedEquiJoin(l, p, "l_partkey", "p_partkey", salts = 4)
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("revenue_cents"))
      .orderBy("brand")
  }

  val q98Sql =
    """SELECT p.p_brand AS brand, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |GROUP BY p.p_brand ORDER BY brand""".stripMargin

  /** q104 six-way star join (the TPC-H Q5 "local supplier volume" shape):
    * lineitem ⨝ orders ⨝ customer ⨝ supplier ⨝ nation ⨝ region, revenue per
    * nation where customer and supplier share the nation. The optimizer
    * stress case q06's 3-way star doesn't reach: Catalyst must broadcast
    * all four dimension joins (region/nation/customer/supplier — none of
    * them may shuffle the fact table) and leave lineitem⨝orders as the one
    * keyed exchange; AQE re-plans it if orders outgrows the threshold.
    * Money in DecimalType (order-independent exact sums). */
  def q104(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
          .cast(LongType).as("revenue_cents"))
      .orderBy("region", "nation")
  }

  val q104Sql =
    """SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name ORDER BY region, nation""".stripMargin

  /** q273 log-bucket quantile sketch — the MERGEABLE quantile path
    * (the q215/q233 register-table discipline pointed at quantiles): where
    * q108's exact percentiles pay a corpus-wide rank window (one shuffle
    * sorting every group — the documented trade at a billion rows), this
    * sketches each source's token-count distribution into power-of-two
    * buckets (bucket = bitlen(n_tok), the q160/q215 integer-log kernel;
    * bucket 0 = zero-token docs) and reads p50/p90/p99 as the FIRST bucket
    * whose cumulative count reaches ⌈q·n⌉ — each reported as its exact
    * [lo, hi] = [2^(b−1), 2^b − 1] bracket, so the answer carries its own
    * error bound (hi/lo = 2, the sketch's declared relative error; tighter
    * needs more buckets per octave, not a different algorithm). Scale
    * shape — why this is the 100 TB quantile: ONE map-combined aggregate
    * collapses every task to ≤ ~40 rows per source (no sort, no rank
    * window over raw rows); shard sketches merge by count-SUM (associative,
    * the t-digest property without t-digest's float centroids); the
    * quantile read is a window over the |sources|·buckets frame. The
    * DuckDB oracle replays bucketing, cumulation, and the rank rule
    * bit-for-bit — the portable answer to approx_percentile's
    * engine-internal buffer (the q53/q215 adjudication, on the quantile
    * axis). */
  def q273(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    // NULL text reads as empty text BEFORE tokenizing (the q276/q277
    // guard): a NULL bucket would sort NULLS FIRST in Spark's cumsum
    // window but NULLS LAST in DuckDB's, shifting every cum value
    val f = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"),
        size(T.tokens(coalesce(col("text"), lit(""))))
          .cast(LongType).as("n_tok"))
      .withColumn("bucket",
        when(col("n_tok") <= 0L, lit(0L))
          .otherwise(length(bin(col("n_tok"))).cast(LongType)))
    val sk = f.groupBy("source", "bucket").agg(count(lit(1)).as("cnt"))
    val cum = sk
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("source").orderBy("bucket")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
    def qb(permille: Int) = min(when(
      col("cum") >= expr(s"(n * $permille + 999) div 1000"), col("bucket")))
    def lo(c: String) = expr(
      s"case when $c = 0 then 0 else shiftleft(cast(1 as bigint), cast($c as int) - 1) end")
    def hi(c: String) = expr(
      s"case when $c = 0 then 0 else shiftleft(cast(1 as bigint), cast($c as int)) - 1 end")
    cum.groupBy("source").agg(
        max("n").as("n_docs"),
        qb(500).as("b50"), qb(900).as("b90"), qb(990).as("b99"))
      .select(col("source"), col("n_docs"),
        lo("b50").as("p50_lo"), hi("b50").as("p50_hi"),
        lo("b90").as("p90_lo"), hi("b90").as("p90_hi"),
        lo("b99").as("p99_lo"), hi("b99").as("p99_hi"))
      .orderBy("source")
  }

  val q273Sql: String =
    """WITH f AS (
      |  SELECT source,
      |    CASE WHEN len(string_split(COALESCE(text, ''), ' ')) <= 0 THEN 0
      |         ELSE length(printf('%b',
      |           len(string_split(COALESCE(text, ''), ' ')))) END AS bucket
      |  FROM documents
      |), sk AS (
      |  SELECT source, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS cnt
      |  FROM f GROUP BY 1, 2
      |), cum AS (
      |  SELECT source, bucket,
      |    SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
      |    SUM(cnt) OVER (PARTITION BY source) AS n
      |  FROM sk
      |), picked AS (
      |  SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
      |    MIN(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN bucket END) AS b50,
      |    MIN(CASE WHEN cum >= (n * 900 + 999) // 1000 THEN bucket END) AS b90,
      |    MIN(CASE WHEN cum >= (n * 990 + 999) // 1000 THEN bucket END) AS b99
      |  FROM cum GROUP BY source
      |)
      |SELECT source, n_docs,
      |  CAST(CASE WHEN b50 = 0 THEN 0 ELSE CAST(1 AS BIGINT) << CAST(b50 - 1 AS INTEGER) END AS BIGINT) AS p50_lo,
      |  CAST(CASE WHEN b50 = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b50 AS INTEGER)) - 1 END AS BIGINT) AS p50_hi,
      |  CAST(CASE WHEN b90 = 0 THEN 0 ELSE CAST(1 AS BIGINT) << CAST(b90 - 1 AS INTEGER) END AS BIGINT) AS p90_lo,
      |  CAST(CASE WHEN b90 = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b90 AS INTEGER)) - 1 END AS BIGINT) AS p90_hi,
      |  CAST(CASE WHEN b99 = 0 THEN 0 ELSE CAST(1 AS BIGINT) << CAST(b99 - 1 AS INTEGER) END AS BIGINT) AS p99_lo,
      |  CAST(CASE WHEN b99 = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b99 AS INTEGER)) - 1 END AS BIGINT) AS p99_hi
      |FROM picked ORDER BY source""".stripMargin

  /** q277 incremental dataset-card maintenance (new r14) — the operational
    * closure of the mergeable-sketch family: at 100 TB the per-source
    * dataset card (doc/token counts, token min/max/sum, distinct-content
    * estimate, length quantiles) is never refreshed by rescanning the
    * corpus — the pipeline maintains bounded per-source DIGESTS and folds
    * each ingest batch in. This query runs the card BOTH ways at once: the
    * engine splits the corpus into base and delta (the q255/q268/q274 md5
    * arrival bucket, 0-of-10), builds each side's digest independently, and
    * MERGES (counts/sums/min/max add, KMV bottom-64 sets union then
    * re-bottom-k — the q276 mergeability property — and log-bucket counts
    * sum cell-wise, the q232/q273 linearity); the DuckDB oracle computes
    * the identical card in ONE full scan. The hash gate is therefore the
    * merge ≡ recompute proof for the ENTIRE card object, extending q232's
    * per-sketch associativity proof to the composite artifact a pipeline
    * actually maintains. Deployment pays only the delta digest + the
    * merge; the committed query builds both sides only because proving the
    * algebra needs both. Per source: n_docs, n_delta, token sum/min/max,
    * KMV distinct estimate (k, k-th hash, estimate — decimal(38,0) path as
    * q276), and the p50/p90 log-bucket brackets. All frames are
    * digest-sized after one corpus pass: ≤|sources|·2 scalar rows,
    * ≤|sources|·2·64 sample rows, ≤|sources|·2·64 bucket cells.
    *
    * The OPERATIONAL leg is [[cardStream]] + [[cardReadMerged]]: digests
    * persist per ingest batch (batch-stamped, overwrite-idempotent) and
    * the card is assembled merge-on-read — the q277 gate proves the exact
    * algebra that assembly runs, and StreamingSpec pins stream==batch. */
  /** The (source, fp, n_tok) projection every card digest starts from. */
  private[graft] def cardDocFrame(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    // NULL text reads as empty text BEFORE hashing/tokenizing: a NULL fp
    // or n_tok would land on opposite ends of the two engines' rank and
    // cumsum windows (Spark NULLS FIRST asc, DuckDB NULLS LAST) and break
    // the hash gate on the first NULL-text fixture row
    val t = coalesce(col("text"), lit(""))
    docs.select(col("source"),
      T.portableHash60(t).as("fp"),
      size(T.tokens(t)).cast(LongType).as("n_tok"))
  }

  /** One side's card digest over a (source, fp, n_tok) frame: three BOUNDED
    * frames — scalar moments (one row per source), the bottom-[[Stats.KmvK]]
    * distinct-fp sample, and log-bucket cells. `isDelta` stamps the scalar
    * rows so the merged card can report arrival mass. This is the object a
    * deployment persists per shard / per ingest batch; [[cardFromDigests]]
    * folds any number of them. */
  private[graft] def cardDigest(f0: DataFrame, isDelta: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    val f = f0.withColumn("bucket",
      when(col("n_tok") <= 0L, lit(0L))
        .otherwise(length(bin(col("n_tok"))).cast(LongType)))
    val scal = f.groupBy("source").agg(
        count(lit(1)).as("n"), sum("n_tok").as("ts"),
        min("n_tok").as("tmin"), max("n_tok").as("tmax"))
      .withColumn("is_delta", lit(isDelta))
    val sample = f.select("source", "fp").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("fp")))
      .filter(col("rk") <= Stats.KmvK)
      .select("source", "fp")
    val cells = f.groupBy("source", "bucket").agg(count(lit(1)).as("cnt"))
    (scal, sample, cells)
  }

  /** MERGE-ON-READ: the card from unions of digest frames (any number of
    * sides / shards / batches) — sums/min/max nest, KMV samples union then
    * re-bottom-k (exact by the q276 mergeability), bucket cells sum
    * cell-wise (the q232 linearity). No caller ever rescans documents. */
  private[graft] def cardFromDigests(scal: DataFrame, sample: DataFrame,
      cells: DataFrame): DataFrame = {
    val scalM = scal.groupBy("source").agg(
      sum("n").as("n_docs"),
      sum(when(col("is_delta"), col("n")).otherwise(0L)).as("n_delta"),
      sum("ts").as("tok_sum"),
      min("tmin").as("tok_min"), max("tmax").as("tok_max"))
    val kmv = sample.select("source", "fp").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("fp")))
      .filter(col("rk") <= Stats.KmvK)
      .groupBy("source").agg(
        count(lit(1)).as("kmv_k"), max("fp").as("kth_min_fp"))
      .withColumn("kmv_estimate",
        when(col("kmv_k") < Stats.KmvK, col("kmv_k"))
          .otherwise(Stats.kmvEstimateExpr))
    val cellsM = cells.groupBy("source", "bucket")
      .agg(sum("cnt").as("cnt"))
    val cum = cellsM
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("source").orderBy("bucket")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
    def qb(permille: Int) = min(when(
      col("cum") >= expr(s"(n * $permille + 999) div 1000"), col("bucket")))
    def hi(c: String) = expr(
      s"case when $c = 0 then 0 else shiftleft(cast(1 as bigint), cast($c as int)) - 1 end")
    val brackets = cum.groupBy("source")
      .agg(qb(500).as("b50"), qb(900).as("b90"))
      .select(col("source"), hi("b50").as("p50_hi"), hi("b90").as("p90_hi"))
    scalM.join(kmv, Seq("source")).join(brackets, Seq("source"))
      .select("source", "n_docs", "n_delta", "tok_sum", "tok_min",
        "tok_max", "kmv_k", "kth_min_fp", "kmv_estimate", "p50_hi", "p90_hi")
  }

  def q277(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val docs = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .withColumn("is_new", T.hashBucket(col("doc_id"), 10) === 0)
    val (bs, bk, bc) =
      cardDigest(cardDocFrame(docs.filter(!col("is_new"))), isDelta = false)
    val (ds, dk, dc) =
      cardDigest(cardDocFrame(docs.filter(col("is_new"))), isDelta = true)
    cardFromDigests(bs.unionByName(ds), bk.unionByName(dk),
      bc.unionByName(dc)).orderBy("source")
  }

  /** Persist one digest to `dir/{scal,sample,cells}` (OVERWRITE — a
    * re-written batch digest replaces itself, the q255/q268/q274 idempotent
    * commit shape). */
  private[graft] def cardDigestWrite(dir: String,
      d: (DataFrame, DataFrame, DataFrame)): Unit = {
    d._1.write.mode("overwrite").parquet(s"$dir/scal")
    d._2.write.mode("overwrite").parquet(s"$dir/sample")
    d._3.write.mode("overwrite").parquet(s"$dir/cells")
  }

  /** STREAMING card maintenance — the operational leg of q277: each
    * micro-batch of documents (doc_id, source, text) is digested (bounded:
    * ≤|sources| scalar rows, ≤|sources|·k sample rows, ≤|sources|·64
    * cells) and persisted under a batch-stamped directory with OVERWRITE,
    * so the at-least-once replay is exactly-once by idempotence. Nothing
    * is folded at write time — the card is assembled by
    * [[cardReadMerged]], the merge-on-read shape mergeable sketches deploy
    * as (an LSM of digests): readers pay ≤|batches|·digest rows, never a
    * corpus rescan, and a batch commit never rewrites earlier digests. */
  def cardStream(spark: SparkSession, docStream: DataFrame, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        cardDigestWrite(s"$outDir/batch-$id",
          cardDigest(cardDocFrame(batch.toDF()), isDelta = true))
      }
      .start()

  /** Assemble the card from persisted digests (glob paths welcome — e.g.
    * `Seq(baseDir, s"$streamOut/batch-*")`). */
  def cardReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    def part(sub: String) = dirs.map(d => spark.read.parquet(s"$d/$sub"))
      .reduce(_ unionByName _)
    cardFromDigests(part("scal"), part("sample"), part("cells"))
      .orderBy("source")
  }

  /** One full scan, no base/delta split anywhere except the n_delta count
    * — equality with the engine's merged digests is the proof. */
  val q277Sql: String =
    s"""WITH f AS (
      |  SELECT source, doc_id,
      |    CAST('0x' || substr(md5(COALESCE(text, '')), 1, 15) AS BIGINT) AS fp,
      |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tok,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      % 10 = 0 AS is_new
      |  FROM documents
      |), scal AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
      |    CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
      |    CAST(MIN(n_tok) AS BIGINT) AS tok_min,
      |    CAST(MAX(n_tok) AS BIGINT) AS tok_max
      |  FROM f GROUP BY source
      |), d AS (
      |  SELECT DISTINCT source, fp FROM f
      |), rk AS (
      |  SELECT source, fp,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY fp) AS rk
      |  FROM d
      |), kmv AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS kmv_k,
      |    CAST(MAX(fp) AS BIGINT) AS kth_min_fp
      |  FROM rk WHERE rk <= ${Stats.KmvK} GROUP BY source
      |), buck AS (
      |  SELECT source,
      |    CASE WHEN n_tok <= 0 THEN 0
      |         ELSE length(printf('%b', n_tok)) END AS bucket,
      |    COUNT(*) AS cnt
      |  FROM f GROUP BY 1, 2
      |), cum AS (
      |  SELECT source, CAST(bucket AS BIGINT) AS bucket,
      |    SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
      |    SUM(cnt) OVER (PARTITION BY source) AS n
      |  FROM buck
      |), picked AS (
      |  SELECT source,
      |    MIN(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN bucket END) AS b50,
      |    MIN(CASE WHEN cum >= (n * 900 + 999) // 1000 THEN bucket END) AS b90
      |  FROM cum GROUP BY source
      |)
      |SELECT s.source, s.n_docs, s.n_delta, s.tok_sum, s.tok_min, s.tok_max,
      |  k.kmv_k, k.kth_min_fp,
      |  CASE WHEN k.kmv_k < ${Stats.KmvK} THEN k.kmv_k
      |    ELSE CAST((CAST(k.kmv_k AS HUGEINT) - 1)
      |      * CAST(1152921504606846976 AS HUGEINT)
      |      // CAST(GREATEST(k.kth_min_fp, 1) AS HUGEINT) AS BIGINT) END
      |    AS kmv_estimate,
      |  CAST(CASE WHEN p.b50 = 0 THEN 0
      |    ELSE (CAST(1 AS BIGINT) << CAST(p.b50 AS INTEGER)) - 1 END AS BIGINT) AS p50_hi,
      |  CAST(CASE WHEN p.b90 = 0 THEN 0
      |    ELSE (CAST(1 AS BIGINT) << CAST(p.b90 AS INTEGER)) - 1 END AS BIGINT) AS p90_hi
      |FROM scal s
      |JOIN kmv k ON k.source = s.source
      |JOIN picked p ON p.source = s.source
      |ORDER BY s.source""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q277_card_maintenance", q277 _, Some(q277Sql)),
    ("q273_quantile_sketch", q273 _, Some(q273Sql)),
    ("q39_cube", q39 _, Some(q39Sql)),
    ("q40_pivot", q40 _, Some(q40Sql)),
    ("q41_date_funcs", q41 _, Some(q41Sql)),
    ("q42_scalar_subquery", q42 _, Some(q42Sql)),
    ("q43_vocab_topk", q43 _, Some(q43Sql)),
    ("q44_hash_sample", q44 _, Some(q44Sql)),
    ("q45_asof_join", q45 _, Some(q45Sql)),
    ("q134_asof_forward", q134 _, Some(q134Sql)),
    ("q46_range_band_join", q46 _, Some(q46Sql)),
    ("q47_topk_per_group", q47 _, Some(q47Sql)),
    ("q48_median_exact", q48 _, Some(q48Sql)),
    ("q50_json_props", q50 _, Some(q50Sql)),
    ("q51_string_funcs", q51 _, Some(q51Sql)),
    ("q52_count_distinct", q52 _, Some(q52Sql)),
    ("q53_sketches", q53 _, None),
    ("q215_hll_registers", q215 _, Some(q215Sql)),
    ("q233_hll_hour_merge", q233 _, Some(q233Sql)),
    ("q236_topk_shard_merge", q236 _, Some(q236Sql)),
    ("q216_bloom_filter", q216 _, Some(q216Sql)),
    ("q55_range_frame", q55 _, Some(q55Sql)),
    ("q56_regex_tokens", q56 _, Some(q56Sql)),
    ("q57_null_funcs", q57 _, Some(q57Sql)),
    ("q62_scd2_intervals", q62 _, Some(q62Sql)),
    ("q63_sliding_window", q63 _, Some(q63Sql)),
    ("q64_scd1_upsert", q64 _, Some(q64Sql)),
    ("q65_exists_subquery", q65 _, Some(q65Sql)),
    ("q98_salted_skew_join", q98 _, Some(q98Sql)),
    ("q104_star_six_way", q104 _, Some(q104Sql)))
}
