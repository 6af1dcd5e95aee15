package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The reference's transform vocabulary (SURVEY §2.2–§2.3) as small,
  * individually-tested functions over DataFrame. Each cites the pandas
  * operation it re-expresses.
  */

/** P1–P3: rename / project-reorder / drop — `df.rename(columns=...)`,
  * `df[[cols]]`, `df.drop(...)` (`etl_category.py:26-31`,
  * `etl_product.py:38-58`, `etl_orders.py:42,69-83`). */
object Conform {
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Project to exactly `cols` in order — the schema-conformance step the
    * reference debugs at length (`Project Plan5.md:171`). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  def drop(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)
}

/** P4–P5: derived columns and null-on-error coercion. */
object Derive {
  /** The ExtendedPrice formula verbatim (`etl_orders.py:39`). */
  def extendedPrice(qty: Column, unitPrice: Column, discount: Column): Column =
    qty * unitPrice * (lit(1.0) - discount)

  /** `pd.to_numeric(errors='coerce')` (`etl_product.py:45-46`): invalid →
    * NULL, never throw — try_cast, because plain cast is ANSI-strict in
    * Spark 4. */
  def tryCastCol(df: DataFrame, from: String, to: String, dt: DataType): DataFrame =
    df.withColumn(to, col(from).try_cast(dt))
}

/** J2: the surrogate-key lookup — `pd.merge(left_on=..., right_on=...,
  * how='left')` + drop of the duplicated key column (`etl_orders.py:57-75`).
  * The dimension side is broadcast: the fact never shuffles for a lookup.
  * The hint encodes a CONTRACT, not a guess: this operator is for
  * catalog-bounded mart dimensions (categories, products — the reference's
  * 8/77-row dims), whose size is set by the business domain, not by data
  * volume. For corpus-scaling lookup sides, join unhinted and let size
  * stats / AQE decide (the q05/q90/q123 policy). */
object Lookup {
  def surrogate(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left")
      .drop(dim(dimKey))
}

/** IDENTITY surrogate keys (SURVEY §1): dense, deterministic row_number over
  * a natural key. A global window is intentional and correct for dimension
  * tables (small by definition); fact-scale keys should use
  * `monotonically_increasing_id` (non-dense, shuffle-free) instead. */
object SurrogateKey {
  def dense(df: DataFrame, orderCol: String, keyName: String): DataFrame =
    df.withColumn(keyName,
      row_number().over(Window.orderBy(col(orderCol))).cast("long"))

  def sparse(df: DataFrame, keyName: String): DataFrame =
    df.withColumn(keyName, monotonically_increasing_id())
}

/** S4 + S6: truncate-and-reload sink and the empty-input guard
  * (`etl_category.py:37-71`, `etl_orders.py:92-137`). `mode("overwrite")` IS
  * the reference's TRUNCATE + batch INSERT + commit/rollback: Spark's commit
  * protocol makes the swap atomic. */
object Load {
  /** Returns false (and writes nothing) on empty input — the reference's
    * "skip load when extract failed" guard (`etl_category.py:38-40`). */
  def overwrite(df: DataFrame, path: String): Boolean = {
    if (df.isEmpty) false
    else { df.write.mode("overwrite").parquet(path); true }
  }

  /** Overwrite as a bucketed table: rows are hash-distributed into `buckets`
    * files per partition on `bucketCols` and each bucket sorted on them.
    * Two tables co-bucketed on their join key join WITHOUT any exchange —
    * the shuffle was paid once at write time instead of once per query,
    * which is the right trade for a fact table joined daily at 100 TB.
    * (Bucket metadata lives in the session catalog; `path` keeps the data
    * external.) Asserted shuffle-free in OperatorSemanticsSpec. */
  def overwriteBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, bucketCols: Seq[String]): Boolean = {
    if (df.isEmpty) false
    else {
      df.write.mode("overwrite")
        .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .option("path", path)
        .saveAsTable(table)
      true
    }
  }

  /** Overwrite partitioned by `partitionCols` — the warehouse-scale variant:
    * readers filtering on a partition column scan only matching directories
    * (partition pruning, asserted in OperatorSemanticsSpec). At 100 TB this
    * (e.g. fact tables partitioned by month) is the difference between a
    * pruned scan and a full-table read. */
  def overwritePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Boolean = {
    if (df.isEmpty) false
    else {
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
      true
    }
  }

  /** Overwrite with a range-clustered layout (ZORDER-lite): rows are range-
    * partitioned on `sortCols` and sorted inside each file, so every file
    * owns a DISJOINT key range and its parquet row-group min/max statistics
    * actually prune — a point or range predicate on the sort key touches
    * one file (plus row-group skipping inside it) instead of all of them.
    * Hash layouts spread every key range over every file, which is why a
    * sorted rewrite is the standard layout step before publishing a
    * scan-heavy 100 TB table. Disjointness is asserted per-file in
    * OperatorSemanticsSpec. `files` controls layout granularity (at scale:
    * total bytes / target file size). */
  def overwriteSorted(df: DataFrame, path: String,
      sortCols: Seq[String], files: Int): Boolean = {
    if (df.isEmpty) false
    else {
      val cols = sortCols.map(col)
      df.repartitionByRange(files, cols: _*)
        .sortWithinPartitions(cols: _*)
        .write.mode("overwrite").parquet(path)
      true
    }
  }

  /** Compact a directory of small files to ~`targetBytes` files — the
    * maintenance pass that keeps streaming/incremental sinks readable: a
    * micro-batch writer leaves one file per trigger per partition, and a
    * 100 TB table of kilobyte files dies on open() overhead, not I/O.
    * File count derives from the ACTUAL on-disk bytes (never a row-count
    * heuristic); coalesce() avoids re-shuffling data that is merely being
    * re-grouped. Returns the new file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path).coalesce(files)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the rewrite lands next to the original, then replaces it — the
    // window without `path` is the rename pair, not the whole rewrite
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    files
  }
}

/** V1–V3: the reference's post-load audit queries (`Project Plan6.md:154-163`)
  * as reusable checks. */
object Audit {
  /** V1: row count equals expectation. */
  def rowCount(df: DataFrame): Long = df.count()

  /** V2: failed surrogate-key lookups — "should return 0 rows". */
  def nullKeyCount(df: DataFrame, keyCol: String): Long =
    df.filter(col(keyCol).isNull).count()

  /** V3: top-k by a metric for eyeball verification. */
  def topK(df: DataFrame, metric: String, k: Int): DataFrame =
    df.orderBy(desc(metric)).limit(k)
}
