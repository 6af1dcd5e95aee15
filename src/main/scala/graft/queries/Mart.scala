package graft.queries

import graft.Tables
import graft.operators.{Conform, Derive, Lookup, SurrogateKey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's three ETL pipelines (SURVEY §3 E1–E3) re-expressed as
  * declarative star-schema builds over the fixture tables, each with a DuckDB
  * oracle. The load (S4 overwrite) and audits run in graft.pipelines; these
  * queries expose the transform plans themselves to the correctness gate.
  *
  * Fixture-role mapping (FIXTURES.md): region/nation ≈ Categories,
  * part ≈ Products, orders+lineitem ≈ Orders+[Order Details].
  */
object Mart {

  /** q23 Dim_Category analog (`etl_category.py:23-34`): rename + project +
    * deterministic surrogate key. */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "nation")
    val conformed = Conform.renameAll(src, Map(
      "n_nationkey" -> "source_category_id",
      "n_name" -> "category_name"))
    SurrogateKey.dense(conformed, orderCol = "source_category_id", keyName = "category_key")
      .select("category_key", "source_category_id", "category_name")
      .orderBy("category_key")
  }

  val q23Sql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) AS BIGINT) AS category_key,
      |  n_nationkey AS source_category_id, n_name AS category_name
      |FROM nation ORDER BY category_key""".stripMargin

  /** q24 Dim_Product analog (`etl_product.py:26-58`): rename, null-safe
    * coercion (`pd.to_numeric(errors='coerce')` → try_cast), project/reorder,
    * surrogate key. Money exposed as exact cents. */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "part")
    val coerced = Derive.tryCastCol(src, "p_size", "size_coerced", IntegerType)
    val conformed = coerced.select(
      col("p_partkey").as("source_product_id"),
      col("p_name").as("product_name"),
      col("p_brand").as("brand"),
      col("size_coerced"),
      floor(col("p_retailprice") * lit(100.0)).as("retail_cents"))
    SurrogateKey.dense(conformed, orderCol = "source_product_id", keyName = "product_key")
      .select("product_key", "source_product_id", "product_name", "brand",
        "size_coerced", "retail_cents")
      .orderBy("product_key")
  }

  val q24Sql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS BIGINT) AS product_key,
      |  p_partkey AS source_product_id, p_name AS product_name, p_brand AS brand,
      |  TRY_CAST(p_size AS INTEGER) AS size_coerced,
      |  CAST(FLOOR(p_retailprice * 100.0) AS BIGINT) AS retail_cents
      |FROM part ORDER BY product_key""".stripMargin

  /** q25 Fact_OrderMetrics analog (`etl_orders.py:35-89`): fact assembly join
    * (J1), ExtendedPrice derivation (P4), broadcast surrogate-key lookup into
    * the product dimension (J2), conform to the declared column set. */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val dim = q24(spark, dir).select("product_key", "source_product_id")

    val fact = l.join(o, l("l_orderkey") === o("o_orderkey"), "inner")
      .withColumn("extended_price_cents",
        floor(col("l_quantity") * col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * lit(100.0)))
    Lookup.surrogate(fact, dim,
        factKey = "l_partkey", dimKey = "source_product_id")
      .select(
        col("l_orderkey").as("source_order_id"),
        col("l_linenumber").as("line_number"),
        col("l_partkey").as("source_product_id"),
        col("product_key"),
        col("o_orderdate").cast(StringType).as("order_date"),
        col("l_quantity").as("quantity"),
        col("l_discount").as("discount"),
        col("extended_price_cents"))
      .orderBy("source_order_id", "line_number")
  }

  val q25Sql =
    """WITH dim AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS BIGINT) AS product_key,
      |         p_partkey AS source_product_id
      |  FROM part
      |)
      |SELECT l.l_orderkey AS source_order_id,
      |  l.l_linenumber AS line_number,
      |  l.l_partkey AS source_product_id,
      |  d.product_key,
      |  CAST(o.o_orderdate AS VARCHAR) AS order_date,
      |  l.l_quantity AS quantity,
      |  l.l_discount AS discount,
      |  CAST(FLOOR(l.l_quantity * l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)
      |    AS extended_price_cents
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |LEFT JOIN dim d ON l.l_partkey = d.source_product_id
      |ORDER BY source_order_id, line_number""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q23_dim_category", q23 _, Some(q23Sql)),
    ("q24_dim_product", q24 _, Some(q24Sql)),
    ("q25_fact_orders", q25 _, Some(q25Sql)))
}
