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

  /** Physical read schema: the file stores TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` it
    * surfaces as epoch-nanos INT64 and Tables.load converts ns→µs. */
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

  /** Mart targets — Spark analogs of the reference star schema
    * (`Project Plan5.md:220-251`). MONEY → DecimalType(19,4), IDENTITY →
    * deterministic row_number surrogate key (SURVEY §1 mapping table).
    */
  val dimCategory: StructType = StructType(Seq(
    StructField("CategoryKey", LongType, nullable = false),
    StructField("Source_CategoryID", IntegerType),
    StructField("CategoryName", StringType),
    StructField("CategoryDescription", StringType)))

  val dimProduct: StructType = StructType(Seq(
    StructField("ProductKey", LongType, nullable = false),
    StructField("Source_ProductID", IntegerType),
    StructField("ProductName", StringType),
    StructField("Source_SupplierID", IntegerType),
    StructField("Source_CategoryID", IntegerType),
    StructField("QuantityPerUnit", StringType),
    StructField("UnitPrice", DecimalType(19, 4)),
    StructField("UnitsInStock", ShortType),
    StructField("Discontinued", BooleanType)))

  val factOrderMetrics: StructType = StructType(Seq(
    StructField("OrderFactKey", LongType, nullable = false),
    StructField("Source_OrderID", LongType),
    StructField("Source_ProductID", LongType),
    StructField("ProductKey", LongType),
    StructField("OrderDate", TimestampType),
    StructField("Quantity", DoubleType),
    StructField("Discount", DoubleType),
    StructField("ExtendedPrice", DecimalType(19, 4))))

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)
}
