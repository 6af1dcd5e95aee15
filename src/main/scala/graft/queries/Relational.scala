package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The reference-parity relational operators (SURVEY.md §2.1–§2.8), each as a
  * declarative DataFrame plan plus an equivalent DuckDB oracle SQL.
  *
  * Determinism rules for oracle hash-matching (engines must agree bit-for-bit):
  *  - every query ends in a total ORDER BY;
  *  - per-row float math is written with identical operator order on both
  *    sides (IEEE 754 ops on identical input doubles are bit-identical), and
  *    surfaced as integer cents via FLOOR — never engine-specific ROUND;
  *  - order-dependent aggregates over doubles (SUM/AVG) are computed in
  *    DecimalType — exact and order-independent — then cast back;
  *  - integer-valued results are cast to BIGINT on both sides (Spark
  *    row_number is int32, DuckDB's is int64 — schemas must match).
  */
object Relational {

  /** Q1 [S1,P2] projected scan — `etl_category.py:12` analog. */
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "region")
      .select("r_regionkey", "r_name")
      .orderBy("r_regionkey")

  val q01Sql = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** Q2 [P1] rename — `etl_category.py:26-28` transform analog. */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation")
      .select(
        col("n_nationkey").as("source_nation_id"),
        col("n_name").as("nation_name"))
      .orderBy("source_nation_id")

  val q02Sql =
    """SELECT n_nationkey AS source_nation_id, n_name AS nation_name
      |FROM nation ORDER BY source_nation_id""".stripMargin

  /** Q3 [P4,F1] derived column — the ExtendedPrice formula of
    * `etl_orders.py:39`, surfaced as exact integer cents. */
  def q03(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity") * col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * lit(100.0)).as("net_cents"))
      .orderBy("l_orderkey", "l_linenumber")

  val q03Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR(l_quantity * l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS net_cents
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q4 [J1,S2] inner equi-join fact assembly — `etl_orders.py:22-23`. The
    * reference joins at the source; here Catalyst owns the strategy (sort-
    * merge at scale, broadcast if one side is small, AQE re-plans at runtime). */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"), "inner")
      .select(
        col("o_orderkey"), col("l_linenumber"),
        col("o_orderdate").cast(StringType).as("o_orderdate_s"),
        col("l_quantity"), col("l_discount"))
      .orderBy("o_orderkey", "l_linenumber")
  }

  val q04Sql =
    """SELECT o.o_orderkey, l.l_linenumber,
      |  CAST(o.o_orderdate AS VARCHAR) AS o_orderdate_s,
      |  l.l_quantity, l.l_discount
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |ORDER BY o.o_orderkey, l.l_linenumber""".stripMargin

  /** Q5 [J2] left-join surrogate lookup — the `pd.merge(how='left')` dimension
    * lookup of `etl_orders.py:57-63`. UNHINTED: `part` scales with the
    * corpus (unlike the reference's 77-row catalog dim), so the broadcast
    * decision belongs to the planner's measured size stats / AQE — which
    * still picks broadcast whenever the dimension actually fits, and a
    * scalable shuffle join when it doesn't. (Mart-dim lookups with
    * genuinely catalog-bounded sides keep the hint — `Lookup.surrogate`.) */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    l.join(p, l("l_partkey") === p("p_partkey"), "left")
      .select("l_orderkey", "l_linenumber", "p_brand")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q05Sql =
    """SELECT l.l_orderkey, l.l_linenumber, p.p_brand
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** Q6 [J3,A2,O1] flagship star query — `Project Plan7.md:24-36` analog:
    * fact ⨝ dims → GROUP BY → SUM(revenue) → ORDER BY DESC. Money summed in
    * decimal (exact, order-independent) then cast to double. `nation` (25
    * rows, fixed by geography) keeps its broadcast hint; `customer` SCALES
    * with the corpus, so its join is unhinted — size stats / AQE broadcast
    * it while it fits and fall back to a shuffle join at warehouse scale. */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q06Sql =
    """SELECT n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey  = c.c_custkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n.n_name""".stripMargin

  /** Q7 [A1] ungrouped count — `connection_test.py:13` analog. */
  def q07(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").agg(count(lit(1)).as("cnt"))

  val q07Sql = "SELECT COUNT(*) AS cnt FROM customer"

  /** Q8 [O2] top-k — `Project Plan6.md:162` analog; Catalyst plans
    * TakeOrderedAndProject (no global sort materialization). */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity") * col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * lit(100.0)).as("net_cents"))
      .orderBy(desc("net_cents"), col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  val q08Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR(l_quantity * l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS net_cents
      |FROM lineitem
      |ORDER BY net_cents DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** Q9 [P6,J2] failed-lookup audit — `Project Plan6.md:159`; expressed as the
    * left-anti join Spark plans natively for the IS NULL pattern. Unhinted
    * for the same reason as Q5: `part` scales with the corpus. */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    l.join(p, l("l_partkey") === p("p_partkey"), "left_anti")
      .agg(count(lit(1)).as("missing"))
  }

  val q09Sql =
    """SELECT COUNT(*) AS missing
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_partkey IS NULL""".stripMargin

  /** Q10 [P5] numeric narrowing — FLOOR then cast so both engines agree
    * (DuckDB rounds on double→int cast, Spark truncates; FLOOR removes the
    * divergence). */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), floor(col("o_totalprice")).as("total_int"))
      .orderBy("o_orderkey")

  val q10Sql =
    """SELECT o_orderkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS total_int
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Q11 [P6 generalized] predicate filter; pushed to the parquet scan. */
  def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .filter(col("p_size") > 25)
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  val q11Sql =
    "SELECT p_partkey, p_name FROM part WHERE p_size > 25 ORDER BY p_partkey"

  /** Q12 [A2] grouped count — load-verification by group. */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val q12Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q13 [X1] exact distinct. */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select("c_mktsegment").distinct()
      .orderBy("c_mktsegment")

  val q13Sql =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** Q14 [X3] text grouping with an exact average (integer math on both
    * sides: FLOOR(100*sum/cnt)). */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        floor(lit(100.0) * sum(col("n_chars")) / count(lit(1))).as("avg_chars_x100"))
      .orderBy("lang")

  val q14Sql =
    """SELECT lang, COUNT(*) AS docs,
      |  CAST(FLOOR(100.0 * SUM(n_chars) / COUNT(*)) AS BIGINT) AS avg_chars_x100
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Q15 [IDENTITY analog] deterministic surrogate keys via row_number —
    * SURVEY §1's mapping for the reference's IDENTITY columns. */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "supplier")
      .select(
        row_number().over(Window.orderBy("s_suppkey")).cast(LongType)
          .as("supplier_key"),
        col("s_suppkey"), col("s_name"))
      .orderBy("supplier_key")

  val q15Sql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) AS BIGINT) AS supplier_key,
      |  s_suppkey, s_name
      |FROM supplier ORDER BY supplier_key""".stripMargin

  /** Q16 [P5] null-on-error coercion — `pd.to_numeric(errors='coerce')`
    * (`etl_product.py:45-46`) → try_cast; plus a regex extract both engines
    * evaluate identically. */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(
        col("event_id"),
        expr("try_cast(regexp_extract(props, '[0-9]+', 0) AS BIGINT)").as("k_num"),
        expr("try_cast(event_type AS DOUBLE)").as("bad_num"))
      .orderBy("event_id")

  val q16Sql =
    """SELECT event_id,
      |  TRY_CAST(REGEXP_EXTRACT(props, '[0-9]+', 0) AS BIGINT) AS k_num,
      |  TRY_CAST(event_type AS DOUBLE) AS bad_num
      |FROM events ORDER BY event_id""".stripMargin

  /** Q17 [window §2.8+] row_number / lag / moving sum. Ordered by the unique
    * event_id within user (ts carries ns in DuckDB but µs in Spark — never
    * order or emit raw ns timestamps in a hash-checked query). Moving sum in
    * decimal cents: exact on both engines. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val w3 = w.rowsBetween(-2, 0)
    Tables.load(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        row_number().over(w).cast(LongType).as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        (sum(col("value").cast(DecimalType(18, 2))).over(w3) * lit(100))
          .cast(LongType).as("msum_cents"))
      .orderBy("user_id", "rn")
  }

  val q17Sql =
    """SELECT event_id, user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |  LAG(value, 1) OVER w AS prev_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id
      |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS msum_cents
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, rn""".stripMargin

  /** Q18 [streaming-shaped batch agg] hourly tumbling aggregation over the
    * event table — the batch twin of the Structured Streaming windowed agg
    * (graft.streaming). Money in decimal cents. */
  def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).cast(StringType).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * lit(100))
          .cast(LongType).as("sum_cents"))
      .orderBy("hour", "event_type")

  val q18Sql =
    """SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Q19 [semi join] customers having orders, per segment (EXISTS pattern). */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_with_orders"))
      .orderBy("c_mktsegment")
  }

  val q19Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_with_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Q20 [anti join] customers with no orders (NOT EXISTS pattern). */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_no_orders"))
  }

  val q20Sql =
    """SELECT COUNT(*) AS n_no_orders
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin

  /** Q21 [set ops §2.6] INTERSECT / EXCEPT with tags. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_nationkey").as("nk"))
    val s = Tables.load(spark, dir, "supplier")
      .select(col("s_nationkey").as("nk"))
    val both = c.intersect(s).select(lit("both").as("tag"), col("nk"))
    val custOnly = c.except(s).select(lit("cust_only").as("tag"), col("nk"))
    both.unionAll(custOnly).orderBy("tag", "nk")
  }

  val q21Sql =
    """SELECT tag, nk FROM (
      |  SELECT 'both' AS tag, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'cust_only' AS tag, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |) t ORDER BY tag, nk""".stripMargin

  /** Q22 [grouping sets] ROLLUP with coalesced keys. */
  def q22(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"))
      .orderBy("priority", "status")

  val q22Sql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** q251 catalog-wide FK referential-integrity audit — the DATA-OP
    * re-expression of the reference's two catalog-introspection rows
    * (P7 `sys.foreign_keys` predicate filter, `Project Plan5.md:17-25`;
    * F3 `OBJECT_NAME` rendering): instead of reading a system catalog
    * (Spark's parquet lake has none), the declared FK edges of the schema
    * are AUDITED against the data — per edge: child row count, orphan
    * count (child keys absent from the parent), and an intact flag. The
    * object-name mapping IS the output's table-name columns. Scale shape:
    * each edge is a projected scan + left-anti count (dim parents
    * broadcast; the lineitem→orders edge is a key-only sort-merge
    * anti-join AQE sizes at runtime, bloom-filter eligible); seven
    * one-row aggregates union. This is the catalog-wide twin of the
    * load-time `Audit.runFactObserved` V2 gate. */
  /** The schema's declared FK edges — ONE list, from which both the Spark
    * audit and its DuckDB oracle derive (a drifted copy would make them
    * different queries). */
  private val fkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  def q251(spark: SparkSession, dir: String): DataFrame = {
    fkEdges.map { case (ct, fk, pt, pk) =>
      val child = Tables.load(spark, dir, ct).select(col(fk))
      val parent = Tables.load(spark, dir, pt).select(col(pk))
      val orphans = child.join(parent, col(fk) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphan")))
        .select(lit(ct).as("child_table"), lit(fk).as("fk_col"),
          lit(pt).as("parent_table"), col("n_child"), col("n_orphan"),
          (col("n_orphan") === 0L).cast("long").as("intact"))
    }.reduce(_ unionAll _)
      .orderBy("child_table", "fk_col")
  }

  val q251Sql: String = fkEdges
    .map { case (ct, fk, pt, pk) =>
      s"""SELECT '$ct' AS child_table, '$fk' AS fk_col, '$pt' AS parent_table,
         |  (SELECT COUNT(*) FROM $ct) AS n_child,
         |  (SELECT COUNT(*) FROM $ct c LEFT JOIN $pt p ON c.$fk = p.$pk
         |   WHERE p.$pk IS NULL) AS n_orphan,
         |  CAST((SELECT COUNT(*) FROM $ct c LEFT JOIN $pt p ON c.$fk = p.$pk
         |   WHERE p.$pk IS NULL) = 0 AS BIGINT) AS intact""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY child_table, fk_col")

  /** name → (impl, oracle) */
  /** q293 right-to-be-forgotten cascade audit — the data-management answer
    * a privacy office asks BEFORE a deletion batch runs: for a
    * deterministic 5% victim cohort (md5('del:'||custkey) % 20 = 0 — in
    * production the request table), how many rows does the FK cascade
    * reach in every table? customer → orders (o_custkey) → lineitem
    * (l_orderkey through the deleted orders) → events (user_id); one row
    * per table with deleted mass in ppm, plus a CLOSURE PROBE row: the
    * order cascade recomputed through an independent path (the hash rule
    * applied directly at o_custkey) must agree with the customer-join leg,
    * and the symmetric difference counts exactly the orders whose
    * hash-selected customer is missing — a real FK probe carried in the
    * audit itself, zero on FK-clean data. All
    * FK-keyed semi/anti joins — the cascade never touches a non-key
    * column, so at 100 TB every leg is a broadcast or shuffle on the
    * key the table is already organized by. */
  def q293(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val victims = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast(LongType).as("ck"))
      .filter(T.hashBucket(
        concat(lit("del:"), col("c_custkey").cast(StringType)), 20) === 0)
    val vs = graft.operators.Checkpoints.scratch(victims)
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast(LongType).as("ck"))
    val ords = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").cast(LongType).as("ok"),
        col("o_custkey").cast(LongType).as("ck"))
    val delOrds = graft.operators.Checkpoints.scratch(
      ords.join(vs, Seq("ck"), "left_semi").select("ok"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast(LongType).as("ok"))
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id").cast(LongType).as("ck"))
    def audit(name: String, all: DataFrame, deleted: DataFrame): DataFrame = {
      val n = all.agg(count(lit(1)).as("n_rows"))
      val d = deleted.agg(count(lit(1)).as("n_deleted"))
      n.crossJoin(d).select(lit(name).as("table_name"),
        col("n_rows"), col("n_deleted"),
        expr("n_deleted * 1000000 div greatest(1, n_rows)")
          .as("deleted_ppm"))
    }
    val out = audit("customer", cust, cust.join(vs, Seq("ck"), "left_semi"))
      .union(audit("orders", ords, ords.join(vs, Seq("ck"), "left_semi")))
      .union(audit("lineitem", li, li.join(delOrds, Seq("ok"), "left_semi")))
      .union(audit("events", ev, ev.join(vs, Seq("ck"), "left_semi")))
    // closure probe (NON-vacuous): recompute the order cascade through an
    // independent path — the hash rule applied directly at o_custkey — and
    // count the symmetric difference against the customer-join leg. The
    // two agree iff every o_custkey exists in customer (delords ⊆ the
    // direct-hash set always; the residual is exactly orders whose
    // hash-selected customer is MISSING — a real FK probe, not a tautology)
    val delOrds2 = ords.filter(T.hashBucket(
        concat(lit("del:"), col("ck").cast(StringType)), 20) === 0)
      .select("ok")
    val disagreement = delOrds.join(delOrds2, Seq("ok"), "left_anti")
      .union(delOrds2.join(delOrds, Seq("ok"), "left_anti"))
    out.union(audit("zz_cascade_disagreement", ords.select("ok"), disagreement))
      .orderBy("table_name")
  }

  val q293Sql: String =
    """WITH vs AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS ck FROM customer
      |  WHERE CAST('0x' || substr(md5('del:' || CAST(c_custkey AS VARCHAR)),
      |    1, 8) AS BIGINT) % 20 = 0
      |), delords AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS ok FROM orders
      |  WHERE CAST(o_custkey AS BIGINT) IN (SELECT ck FROM vs)
      |), rows_t AS (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
      |    CAST(SUM(CASE WHEN CAST(c_custkey AS BIGINT)
      |      IN (SELECT ck FROM vs) THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders', COUNT(*),
      |    CAST(SUM(CASE WHEN CAST(o_custkey AS BIGINT)
      |      IN (SELECT ck FROM vs) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', COUNT(*),
      |    CAST(SUM(CASE WHEN CAST(l_orderkey AS BIGINT)
      |      IN (SELECT ok FROM delords) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'events', COUNT(*),
      |    CAST(SUM(CASE WHEN CAST(user_id AS BIGINT)
      |      IN (SELECT ck FROM vs) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM events
      |  UNION ALL
      |  SELECT 'zz_cascade_disagreement',
      |    (SELECT COUNT(*) FROM orders),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM (
      |    SELECT ok FROM delords
      |    WHERE ok NOT IN (SELECT CAST(o_orderkey AS BIGINT) FROM orders
      |      WHERE CAST('0x' || substr(md5('del:'
      |        || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0)
      |    UNION ALL
      |    SELECT CAST(o_orderkey AS BIGINT) FROM orders
      |    WHERE CAST('0x' || substr(md5('del:'
      |        || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0
      |      AND CAST(o_orderkey AS BIGINT) NOT IN (SELECT ok FROM delords)
      |  )
      |)
      |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
      |  n_deleted AS n_deleted,
      |  CAST(n_deleted * 1000000 // GREATEST(1, n_rows) AS BIGINT)
      |    AS deleted_ppm
      |FROM rows_t ORDER BY table_name""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q293_delete_cascade", q293 _, Some(q293Sql)),
    ("q251_fk_integrity", q251 _, Some(q251Sql)),
    ("q01_scan_project", q01 _, Some(q01Sql)),
    ("q02_rename", q02 _, Some(q02Sql)),
    ("q03_derived_cents", q03 _, Some(q03Sql)),
    ("q04_join_inner", q04 _, Some(q04Sql)),
    ("q05_join_left_lookup", q05 _, Some(q05Sql)),
    ("q06_star_revenue", q06 _, Some(q06Sql)),
    ("q07_count_all", q07 _, Some(q07Sql)),
    ("q08_topk", q08 _, Some(q08Sql)),
    ("q09_anti_audit", q09 _, Some(q09Sql)),
    ("q10_cast_floor", q10 _, Some(q10Sql)),
    ("q11_filter_pushdown", q11 _, Some(q11Sql)),
    ("q12_group_count", q12 _, Some(q12Sql)),
    ("q13_distinct", q13 _, Some(q13Sql)),
    ("q14_text_group", q14 _, Some(q14Sql)),
    ("q15_surrogate_key", q15 _, Some(q15Sql)),
    ("q16_try_cast", q16 _, Some(q16Sql)),
    ("q17_window_funcs", q17 _, Some(q17Sql)),
    ("q18_events_hourly", q18 _, Some(q18Sql)),
    ("q19_semi_join", q19 _, Some(q19Sql)),
    ("q20_anti_join", q20 _, Some(q20Sql)),
    ("q21_set_ops", q21 _, Some(q21Sql)),
    ("q22_rollup", q22 _, Some(q22Sql)))
}
