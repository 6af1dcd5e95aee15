package graft.pipelines

import graft.Tables
import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-corpus preparation — the extension operators (SURVEY
  * §2.11/§2.13) composed into one job the way an LLM-data team would run
  * them: quality gate → exact dedup (deterministic survivor) → reproducible
  * train/val split → split-partitioned overwrite.
  *
  * Scale shape: the quality gate is a narrow codegen'd filter; dedup is one
  * hash shuffle on the text key (min-survivor semi-join back keeps the full
  * row without carrying text twice through the shuffle); the split is a pure
  * per-row md5 — stable under reruns, engine version, and cluster layout; the
  * sink partitions by split so downstream training readers partition-prune.
  * Nothing here collects to the driver.
  */
object CorpusPipeline {

  /** Quality gate (the q33 thresholds): 5..1000 tokens, mean word length
    * 2..15 chars. Token arithmetic is [[graft.functions.TextFunctions]]'s —
    * the single home for oracle-parity text math. */
  def qualityFiltered(docs: DataFrame): DataFrame = {
    val t = col("text")
    val toks = T.tokenCount(t).cast(LongType)
    val nonSpace = length(regexp_replace(t, " ", ""))
    val awl = floor(lit(100.0) * nonSpace / toks)
    docs.withColumn("n_tokens", toks)
      .filter(col("n_tokens").between(5, 1000) && awl.between(200, 1500))
  }

  /** Exact dedup keeping the lowest doc_id per distinct text: a left-semi
    * join of the corpus against the (text → min doc_id) survivors. */
  def dedupSurvivors(docs: DataFrame): DataFrame =
    docs.join(
      Dedup.exact(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Deterministic 90/10 split on md5(doc_id) — the q44 sampling primitive
    * repurposed as a split assignment. */
  def withSplit(docs: DataFrame): DataFrame =
    docs.withColumn("split",
      when(T.hashBucket(col("doc_id"), 10) === 0, "val").otherwise("train"))

  /** The full prepare transform (no sink) — also the q54 query surface. */
  def prepare(docs: DataFrame): DataFrame =
    withSplit(dedupSurvivors(qualityFiltered(docs)))
}

class CorpusPipeline(spark: SparkSession, sfDir: String, outDir: String) {

  def corpusPath: String = s"$outDir/corpus"

  /** Run the full pipeline; returns per-split row counts (the audit).
    *
    * Writes directly (no pre-write emptiness probe — that would execute the
    * full dedup DAG twice); an empty corpus writes an empty table, and the
    * audit read-back reports zero rows. */
  def run(): Map[String, Long] = {
    val docs = Tables.parallelized(Tables.load(spark, sfDir, "documents"))
    CorpusPipeline.prepare(docs)
      .select("doc_id", "text", "lang", "source", "n_tokens", "split")
      .write.mode("overwrite").partitionBy("split").parquet(corpusPath)
    spark.read.parquet(corpusPath)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
