package graft.ann

import org.apache.spark.sql.SparkSession

/** In-process registry of trained ANN models, keyed by (corpus fingerprint,
  * hyperparameters) — the serving contract every ANN system runs: models are
  * trained per CORPUS, not per query, and a query pays only its scan. The
  * fingerprint is derived from the corpus files' sizes and modification
  * times, so a rewritten corpus invalidates automatically (the same rule the
  * persisted [[IvfPqIndex]] bakes into its index path) and a cached model
  * can never serve stale parameters. Training is deterministic
  * (hash-sampled, lowest-id init, fixed tie rules), so a cache hit is
  * bit-identical to retraining — the spec asserts it.
  */
object Models {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Fingerprint of a parquet table's files: fold of (length, mtime) over
    * the file listing. Cheap (pure metadata), change-sensitive, and stable
    * across JVMs for an unchanged corpus. */
  def corpusStamp(spark: SparkSession, dir: String,
      table: String = "embeddings"): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(hconf)
    var acc = 17L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      acc = (acc * 31L + f.getLen) * 31L + f.getModificationTime
    }
    java.lang.Long.toHexString(acc)
  }

  /** Train-once gate: returns the cached model for `key`, training it on
    * first use. The key MUST embed the corpus stamp and every
    * hyperparameter that shapes the model. */
  def cached[T <: AnyRef](key: String)(train: => T): T =
    cache.computeIfAbsent(key, _ => train).asInstanceOf[T]
}
