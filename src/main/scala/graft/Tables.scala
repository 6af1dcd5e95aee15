package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Schema-enforced readers over the fixture parquet (SURVEY §2.1 S1).
  *
  * The reference extracts with hand-written `SELECT col, ...` lists pushed to
  * SQL Server (`etl_category.py:12`, `etl_product.py:12-23`). Here the scan is
  * declarative: `spark.read.schema(...).parquet(...)` and Catalyst pushes both
  * column pruning and predicate filters into the parquet reader — verified via
  * `.explain` (`PushedFilters`, `ReadSchema`).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Cache of the events `ts` physical unit (true = TIMESTAMP(NANOS)),
    * keyed by (file, corpus stamp).
    *
    * The fixture generator has shipped `ts` both as TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects unless the nanosAsLong shim surfaces it
    * as raw INT64 — and as TIMESTAMP(MICROS), which Spark reads natively. The
    * unit is a property of the FILE, not of the engine, so it is read from the
    * parquet footer (one driver-side metadata read, cached) rather than
    * hardcoded. The corpus stamp in the key means a fixture REWRITTEN under a
    * live session (the driver regenerates /root/testdata between rounds, and
    * has flipped the unit once already) re-probes instead of serving the
    * stale unit. Footer schema inference under the shim yields LongType for a
    * nanos column and TimestampType for a micros one.
    *
    * The shim conf is scoped to the probe and RESTORED afterwards: it is a
    * session-global mode, and leaving it flipped as a side effect of a
    * metadata read would make a future nanos-typed column in any OTHER table
    * silently surface as raw longs. */
  private val tsIsNanosCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private val NanosConfKey = "spark.sql.legacy.parquet.nanosAsLong"

  private[graft] def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean = {
    val file = path(dir, "events")
    val key = file + ":" + graft.ann.Models.corpusStamp(spark, dir, "events")
    tsIsNanosCache.computeIfAbsent(key, { _ =>
      val prior = spark.conf.getOption(NanosConfKey)
      spark.conf.set(NanosConfKey, "true")
      try
        spark.read.parquet(file).schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
      finally prior match {
        case Some(v) => spark.conf.set(NanosConfKey, v)
        case None    => spark.conf.unset(NanosConfKey)
      }
    })
  }

  /** Arm the nanos shim for a NANOS-typed events read. This one cannot be
    * scoped-and-restored: DataFrame execution is lazy, so the conf must
    * still be set when the plan RUNS, long after the reader built it. It is
    * therefore only flipped on the branch that actually consumes a nanos
    * file — a session that only ever reads µs fixtures never sees the
    * mode change. */
  private[graft] def ensureNanosShim(spark: SparkSession): Unit =
    spark.conf.set(NanosConfKey, "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      val file = path(dir, name)
      if (eventsTsIsNanos(spark, dir)) {
        // Legacy nanos fixture: read epoch-nanos INT64 and truncate to the
        // engine's µs precision (matches how the oracle's ns values behave
        // under any sub-second-insensitive operation).
        ensureNanosShim(spark)
        spark.read.schema(Schemas.eventsRaw).parquet(file)
          .select(
            F.col("event_id"),
            F.timestamp_micros(F.expr("ts div 1000")).as("ts"),
            F.col("user_id"), F.col("event_type"), F.col("value"), F.col("props"))
      } else {
        // TIMESTAMP(MICROS) fixture: Spark reads it natively — no shim.
        spark.read.schema(Schemas.events).parquet(file)
      }
    case _ =>
      spark.read.schema(Schemas.all(name)).parquet(path(dir, name))
  }

  /** Register every fixture table as a temp view (for the SQL surface). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Ensure at least core-count partitions before per-row-expensive work.
    *
    * The fixture files are single-row-group parquet, so a scan yields ONE
    * input partition and everything until the first shuffle runs serially —
    * a small-file artifact that would not exist on a real multi-row-group /
    * multi-file 100 TB table. The explicit partition count keeps AQE from
    * coalescing the exchange back to one partition; when the scan already
    * has enough partitions this is a no-op with no shuffle.
    *
    * The partition count is ESTIMATED from logical-plan statistics
    * (`stats.sizeInBytes / maxPartitionBytes` — file-listing data the
    * relation already holds) instead of `df.rdd.getNumPartitions`, which
    * would force a full physical planning + RDD conversion of the query
    * just to read a number, planning every caller's query twice. The
    * estimate errs small only for compressed single-file fixtures — exactly
    * the case where repartitioning is wanted anyway — and at warehouse
    * scale sizeInBytes is orders of magnitude past the threshold, making
    * this a plan-free no-op. */
  def parallelized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val estParts = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxPart + 1
    if (estParts < target) df.repartition(target) else df
  }
}
