package graft.dedup

import graft.ann.IndexPaths
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED MinHash signature store — the text twin of the persisted
  * IVF-PQ index ([[graft.ann.PortableIvfPqIndex]]), and the deployment
  * shape q185's docstring promises ("the existing side's band keys come
  * from the persisted signature index"): ingestion-time near-dup checks
  * run on every batch, and recomputing the EXISTING corpus's signatures
  * per batch — md5 over every shingle of every document — is the dominant
  * cost, ~40× the band join it feeds. The store writes the base corpus's
  * eight Carter-Wegman permuted minima ONCE per corpus (10 slim longs per
  * document), stamp-keyed exactly like the vector indexes (a corpus
  * rewrite gets a fresh store, an unchanged one never recomputes), and a
  * batch probe pays only its own narrow signature map plus a band join
  * against the slim store.
  *
  * Store schema: (doc_id, s0..s7) for every base document with ≥ 1
  * shingle. Writers hold the same cross-process lease as the vector
  * index verbs; "built" is the parquet `_SUCCESS` (single write — no
  * multi-step marker needed).
  *
  * Every value is the q99 portable algebra (md5-60-bit shingles,
  * Carter-Wegman permutations over the Mersenne prime), so a DuckDB
  * oracle replays the store build AND the probe bit-for-bit — the serve
  * sits under the hash gate like the rest of the lifecycle family.
  */
object PortableSigStore {

  /** q185's arrival convention: md5 bucket 0-of-10 of doc_ids is the
    * incoming batch; everything else is the existing corpus the store
    * indexes. */
  val NewMod = 10
  val NewBucket = 0

  /** (doc_id, hs, s0..s7) for the given docs — the portable signature map,
    * computed NARROW (no shuffle); `hs` kept for callers that verify
    * candidates without a second corpus scan. Null-signature (shingle-less)
    * docs are retained; filter `s0 IS NOT NULL` to band. The permutation
    * algebra lives in [[Dedup.permutedMinSigs]] — the store and the
    * in-session LSH family must stay bit-identical (review finding: a
    * private copy here could desync from the family and its oracles). */
  private def sigs(docs: DataFrame): DataFrame = {
    val hs = array_distinct(T.portableShingleHashes(col("text"), 3))
    docs.select(col("doc_id") +: hs.as("hs") +: Dedup.permutedMinSigs(hs): _*)
  }

  /** Build-once gate (the [[graft.ann.PortableIvfPqIndex.ensureBuilt]]
    * discipline, stamped on the DOCUMENTS table): writes the base-corpus
    * signature table on first use, reuses it for the corpus lifetime,
    * prunes stores superseded by a corpus rewrite. */
  def ensureBuilt(spark: SparkSession, corpusDir: String): String = {
    val path = IndexPaths.indexPath(spark, corpusDir, "graft-sigstore",
      table = "documents")
    if (!IndexPaths.markerExists(spark, s"$path/sigs/_SUCCESS"))
      graft.ann.PortableIvfPqIndex.withWriterLease(spark, path) {
        if (!IndexPaths.markerExists(spark, s"$path/sigs/_SUCCESS")) {
          val base = graft.Tables.parallelized(
            graft.Tables.load(spark, corpusDir, "documents"))
            .filter(T.hashBucket(col("doc_id"), NewMod) =!= NewBucket)
          sigs(base).filter(col("s0").isNotNull)
            .select((Seq(col("doc_id")) ++ (0 until 8).map(i => col(s"s$i"))): _*)
            .write.mode("overwrite").parquet(s"$path/sigs")
          IndexPaths.pruneSuperseded(spark, corpusDir, "graft-sigstore", path)
        }
      }
    path
  }

  /** Batch near-dup probe against the persisted store: for EVERY incoming
    * batch document (the md5 arrival bucket), the best existing match at
    * Jaccard ≥ `minJaccardX1e6` — or (-1, 0) when none. Returns
    * (doc_id, match_id, jaccard_x1e6, is_dup) ordered by doc_id.
    *
    * Scale shape: the batch signature map is NARROW and batch-sized (the
    * amortization the store exists for — the corpus-sized signature work
    * happened once at build); candidates come from a 4×2-band equi-join
    * of two slim exploded frames (batch bands are batch-sized; store
    * bands are 4 rows per base doc of three longs); the exact-Jaccard
    * verify joins shingle sets ONLY for candidate docs (the
    * lshJaccardPairs semi-join discipline — base shingles are recomputed
    * for the candidate subset, never the corpus); the best-match argmax
    * is one max_by aggregate keyed by the batch doc. */
  /** Shared probe kernel: best existing match per doc of `batchDocs`
    * (a frame with doc_id + text) against the persisted store at `path` —
    * (doc_id, match_id, jaccard_x1e6) for MATCHED docs only. Base shingle
    * arrays for the verify come from the corpus table, recomputed for the
    * candidate subset only. */
  private def bestMatches(spark: SparkSession, path: String,
      corpusDir: String, batchDocs: DataFrame,
      minJaccardX1e6: Long): DataFrame = {
    val store = spark.read.parquet(s"$path/sigs")
    val docs = graft.Tables.parallelized(
      graft.Tables.load(spark, corpusDir, "documents"))
    val batchSigs = sigs(batchDocs).filter(col("s0").isNotNull)

    // the band shape is owned by Dedup.bandExplode — store and in-session
    // family must band identically (review finding)
    val cand = Dedup.bandExplode(batchSigs, "new_id")
      .join(Dedup.bandExplode(store, "base_id"), Seq("band", "k1", "k2"))
      .select("new_id", "base_id").distinct()

    // exact verify on candidates only: batch shingles ride along (batch-
    // sized); base shingles recomputed for the candidate subset
    val baseSh = docs
      .join(cand.select(col("base_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("base_id"),
        array_distinct(T.portableShingleHashes(col("text"), 3)).as("hs_e"))
    val verified = cand
      .join(batchSigs.select(col("doc_id").as("new_id"), col("hs")), "new_id")
      .join(baseSh, "base_id")
      .withColumn("i", call_function("intersect_count_i64", col("hs"), col("hs_e")))
      .withColumn("u",
        size(col("hs")).cast(LongType) + size(col("hs_e")).cast(LongType) - col("i"))
      .withColumn("jac", floor(lit(1000000.0) * col("i") / col("u")))
      .filter(col("jac") >= minJaccardX1e6)
    verified.groupBy("new_id")
      .agg(max_by(struct(col("base_id"), col("jac")),
        struct(col("jac"), -col("base_id"))).as("b"))
      .select(col("new_id").as("doc_id"),
        col("b.base_id").as("match_id"), col("b.jac").as("jaccard_x1e6"))
  }

  def batchProbe(spark: SparkSession, corpusDir: String,
      minJaccardX1e6: Long = 700000L): DataFrame = {
    val path = ensureBuilt(spark, corpusDir)
    val batchDocs = graft.Tables.parallelized(
      graft.Tables.load(spark, corpusDir, "documents"))
      .filter(T.hashBucket(col("doc_id"), NewMod) === NewBucket)
    val best = bestMatches(spark, path, corpusDir, batchDocs, minJaccardX1e6)
    batchDocs.select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"),
        coalesce(col("jaccard_x1e6"), lit(0L)).as("jaccard_x1e6"),
        col("match_id").isNotNull.cast(IntegerType).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Near-dup GATE over an arbitrary document frame: the rows of `batch`
    * with NO existing match at the threshold — the filter an ingestion
    * pipeline applies before admitting new documents. Batch semantics
    * (candidates → verify → anti-join), so streams use it through
    * [[gateStream]]'s foreachBatch. */
  def gateBatch(spark: SparkSession, corpusDir: String, batch: DataFrame,
      minJaccardX1e6: Long = 700000L): DataFrame = {
    val path = ensureBuilt(spark, corpusDir)
    batch.join(
      bestMatches(spark, path, corpusDir, batch, minJaccardX1e6)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
  }

  /** STREAMING ingest gate against the persisted store: each micro-batch
    * of documents is probed under the FROZEN store and only docs with no
    * existing near-dup land in `outDir`. The probe needs batch semantics
    * (a candidates → verify → anti-join subquery has no incremental
    * streaming form), so the stream runs through foreachBatch; survivors
    * write to a batch-stamped subdir with OVERWRITE, which makes the
    * at-least-once replay exactly-once by idempotence — a retried batch
    * rewrites its own directory rather than appending a duplicate (the
    * lighter cousin of the index ingest's staged name-keyed commit: here
    * each batch owns a whole directory, so overwrite IS the commit
    * protocol, no ledger needed). Readers take `outDir/batch-*`. */
  def gateStream(spark: SparkSession, corpusDir: String,
      docStream: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        gateBatch(spark, corpusDir, batch.toDF())
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()
}
