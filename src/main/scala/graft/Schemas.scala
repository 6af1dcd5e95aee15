package graft

import org.apache.spark.sql.types._

/** Explicit StructTypes for every fixture table (FIXTURES.md) and the mart
  * targets (SURVEY.md §1). The engine never relies on schema inference on a
  * correctness path: Spark and the DuckDB oracle must agree on types.
  *
  * Reference data model: roberthpchao/Northwind-ETL `Project Plan2.md:34-77`
  * (DDL) — fixed, externally-declared schemas the code must conform to.
  */
object Schemas {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Logical schema of `events` as the engine exposes it (ts in µs). */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Physical read schema for LEGACY nanos fixtures only: a TIMESTAMP(NANOS)
    * column is rejected by Spark's parquet reader, but with
    * `spark.sql.legacy.parquet.nanosAsLong` it surfaces as epoch-nanos INT64
    * and Tables.load converts ns→µs. Micros fixtures read with [[events]]
    * directly; Tables picks the path from the parquet footer. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Mart targets — the engine's analogs of the reference star schema
    * (`Project Plan5.md:220-251`), declared exactly as q23–q25 /
    * MartPipelines emit them (tests assert conformance): snake_case names,
    * IDENTITY → deterministic row_number surrogate key, and MONEY carried as
    * exact integer *cents* (LongType) rather than DecimalType — integer money
    * hashes identically across Spark and the DuckDB oracle and aggregates
    * without decimal-overflow checks at 100 TB scale (SURVEY §1 table).
    */
  val dimCategory: StructType = StructType(Seq(
    StructField("category_key", LongType),
    StructField("source_category_id", IntegerType),
    StructField("category_name", StringType)))

  val dimProduct: StructType = StructType(Seq(
    StructField("product_key", LongType),
    StructField("source_product_id", LongType),
    StructField("product_name", StringType),
    StructField("brand", StringType),
    StructField("size_coerced", IntegerType),
    StructField("retail_cents", LongType)))

  val factOrderMetrics: StructType = StructType(Seq(
    StructField("source_order_id", LongType),
    StructField("line_number", IntegerType),
    StructField("source_product_id", LongType),
    StructField("product_key", LongType),
    StructField("order_date", StringType),
    StructField("quantity", DoubleType),
    StructField("discount", DoubleType),
    StructField("extended_price_cents", LongType)))

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)
}
