package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-assembly operators: the steps between a cleaned document table and
  * training shards — sequence packing, weighted sampling, outlier clipping,
  * global shuffle, and token-budget selection. Everything except the
  * priority keys is integer math; all five queries are DuckDB-oracle
  * hash-checked (q81 via a recursive CTE that replays the packing state
  * machine).
  */
object Corpus {

  /** q81 next-fit sequence packing: documents are packed, in deterministic
    * (source, shard, doc_id) order, into context windows of `budget`
    * whitespace tokens — a doc that does not fit closes the pack and opens
    * the next (an oversized doc sits alone in its own pack). The physical
    * shape is the scale-correct one for a sequential state machine: ONE
    * shuffle on (source, shard), a within-partition sort, and a streaming
    * `mapPartitions` whose state is O(1) — no per-group materialization, so
    * a source with a billion documents packs with bounded memory (the shard
    * key bounds chain length and parallelism, not memory). `mapPartitions`
    * is the right tool here (brief's last-resort clause): packing is
    * inherently order-sequential, inexpressible as window cumsum because a
    * pack boundary depends on the running remainder. */
  def q81(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.parallelized(Tables.load(spark, dir, "documents")),
      budget = 128L, shards = 4)
      .orderBy("doc_id")

  /** The packing operator behind q81, parameterized: `shards` bounds the
    * longest sequential chain (max parallelism = |sources| × shards — size it
    * to the cluster, the fixture query uses 4) and `budget` is the context
    * window in whitespace tokens. Per-(source, shard) chains are independent,
    * so raising `shards` re-shards the work without changing any pack's
    * internal shape. Semantics property-tested across shard counts in
    * OperatorSemanticsSpec. */
  def packSequences(docs: DataFrame, budget: Long, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val packIn = docs
      .select(col("doc_id"), col("source"),
        T.hashBucket(col("doc_id"), shards).as("shard"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .as[(Long, String, Long, Long)]
    packIn
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions("source", "shard", "doc_id")
      .mapPartitions { it =>
        // `budget + 1` is the forced-new-pack sentinel: the first doc of a
        // (source, shard) chain can never fit, so it always opens pack 1
        var curKey: (String, Long) = null
        var packIdx = 0L; var packPos = 0L; var used = budget + 1
        it.map { case (docId, source, shard, nTokens) =>
          if (curKey != ((source, shard))) {
            curKey = (source, shard); packIdx = 0L; used = budget + 1
          }
          if (used + nTokens <= budget) { packPos += 1; used += nTokens }
          else { packIdx += 1; packPos = 1L; used = nTokens }
          (docId, source, shard, nTokens, packIdx, packPos)
        }
      }
      .toDF("doc_id", "source", "shard", "n_tokens", "pack_idx", "pack_pos")
  }

  val q81Sql =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 4 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), seq AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn
      |  FROM d
      |), rec AS (
      |  SELECT doc_id, source, shard, n_tokens, rn,
      |    CAST(1 AS BIGINT) AS pack_idx, CAST(1 AS BIGINT) AS pack_pos,
      |    n_tokens AS used
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s.doc_id, s.source, s.shard, s.n_tokens, s.rn,
      |    CASE WHEN r.used + s.n_tokens <= 128 THEN r.pack_idx ELSE r.pack_idx + 1 END,
      |    CASE WHEN r.used + s.n_tokens <= 128 THEN r.pack_pos + 1 ELSE CAST(1 AS BIGINT) END,
      |    CASE WHEN r.used + s.n_tokens <= 128 THEN r.used + s.n_tokens ELSE s.n_tokens END
      |  FROM rec r JOIN seq s
      |    ON s.source = r.source AND s.shard = r.shard AND s.rn = r.rn + 1
      |)
      |SELECT doc_id, source, shard, n_tokens, pack_idx, pack_pos
      |FROM rec ORDER BY doc_id""".stripMargin

  /** q82 priority sampling (Duffield–Lund–Thorup, JACM 2007): each doc gets
    * priority w/u with weight w = n_chars and u a deterministic md5-uniform
    * in [1, 1000000007]; the top-25 by priority form a weighted sample
    * without replacement, reproducible on any engine. The priority is ONE
    * multiply and ONE IEEE division over exactly-representable integers —
    * correctly rounded identically everywhere, so even the floored double is
    * hash-stable cross-engine (no ln/exp, whose libm rounding differs). The
    * plan is a narrow scan + TakeOrderedAndProject: no shuffle, no window. */
  def q82(spark: SparkSession, dir: String): DataFrame = {
    val u = T.hashBucket(col("doc_id"), 1000000007) + lit(1L)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        floor(lit(1000000000.0) * col("n_chars") / u).as("priority_x1e9"))
      .orderBy(desc("priority_x1e9"), col("doc_id"))
      .limit(25)
  }

  val q82Sql =
    """SELECT doc_id, n_chars,
      |  CAST(FLOOR(1000000000.0 * n_chars /
      |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      % 1000000007 + 1)) AS BIGINT) AS priority_x1e9
      |FROM documents
      |ORDER BY priority_x1e9 DESC, doc_id LIMIT 25""".stripMargin

  /** q83 winsorization: per-language p05/p95 of n_chars as DISCRETE order
    * statistics (the value at row ceil(q·n) of the sorted column — integer
    * exact, no interpolated doubles to drift cross-engine), then each doc's
    * length clipped into [p05, p95]. One (lang) shuffle serves the
    * row-number window; the per-lang cutoffs are grouping-key-cardinality
    * rows, so the join back is a broadcast at any corpus size. */
  def q83(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    val ranked = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val cuts = ranked
      .filter(col("rn") === floor((col("n") + 19) / 20) ||
        col("rn") === floor(lit(19) * (col("n") + 1) / 20))
      .groupBy("lang")
      .agg(min("n_chars").as("p05"), max("n_chars").as("p95"))
    ranked.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("p05"), col("p95"),
        greatest(col("p05"), least(col("p95"), col("n_chars"))).as("clipped"))
      .orderBy("doc_id")
  }

  val q83Sql =
    """WITH ranked AS (
      |  SELECT doc_id, lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents
      |), cuts AS (
      |  SELECT lang, MIN(n_chars) AS p05, MAX(n_chars) AS p95
      |  FROM ranked
      |  WHERE rn = CAST(FLOOR((n + 19) / 20.0) AS BIGINT)
      |     OR rn = CAST(FLOOR(19 * (n + 1) / 20.0) AS BIGINT)
      |  GROUP BY lang
      |)
      |SELECT r.doc_id, r.lang, r.n_chars, c.p05, c.p95,
      |  GREATEST(c.p05, LEAST(c.p95, r.n_chars)) AS clipped
      |FROM ranked r JOIN cuts c USING (lang)
      |ORDER BY r.doc_id""".stripMargin

  /** q84 global deterministic shuffle into training shards: each doc lands
    * in shard md5(doc_id) % 8, ordered within its shard by a SECOND
    * independent hash — the write-ready (shard, position) layout every
    * training run wants, reproducible without rand(). One shuffle on shard;
    * the per-shard sort is distributed (each shard sorts in parallel). */
  def q84(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard")
      .orderBy(col("ord"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        T.hashBucket(col("doc_id"), 8).as("shard"),
        T.hashBucket(concat(col("doc_id").cast(StringType), lit("#ord")), 999983)
          .as("ord"))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  val q84Sql =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ord'), 1, 8) AS BIGINT)
      |      % 999983 AS ord
      |  FROM documents
      |)
      |SELECT doc_id, shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos
      |FROM h ORDER BY shard, pos""".stripMargin

  /** q85 token-budget-capped selection: per source, documents are taken in a
    * deterministic hash-shuffled order until the source's running character
    * total passes 20 000 — the "fill each mixture component to its budget"
    * step of corpus assembly. The running total is one cumulative-sum window
    * per source (a single shuffle); the budget filter is a row-local
    * predicate on the cumsum, so nothing is re-scanned or re-joined. */
  def q85(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("source")
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        T.hashBucket(concat(col("doc_id").cast(StringType), lit("#sel")), 999983)
          .as("ord"))
      .withColumn("cum_chars", sum("n_chars").over(ord))
      .filter(col("cum_chars") <= 20000L)
      .select("doc_id", "source", "n_chars", "cum_chars")
      .orderBy("doc_id")
  }

  val q85Sql =
    """WITH h AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sel'), 1, 8) AS BIGINT)
      |      % 999983 AS ord
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
      |  FROM h
      |)
      |SELECT doc_id, source, n_chars, cum_chars FROM c
      |WHERE cum_chars <= 20000 ORDER BY doc_id""".stripMargin

  /** q118 dataset card — the per-(source, split) publication rollup every
    * released training set ships: document counts, exact token totals,
    * quality-gate pass counts (the q33 heuristics), and a language tally,
    * under the q54 deterministic md5 split. One scan, one partial-agg
    * shuffle on (source, split); at 100 TB this is the cheap audit you run
    * after every corpus rebuild, so it must never cost more than one pass. */
  def q118(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val spaces = length(t) - length(regexp_replace(t, " ", ""))
    val toks = (spaces + 1).cast(LongType)
    val awl = floor(lit(100.0) * (length(t) - spaces) / toks)
    Tables.load(spark, dir, "documents")
      .withColumn("split",
        when(T.hashBucket(col("doc_id"), 10) === 0, "val").otherwise("train"))
      .withColumn("n_tokens", toks)
      .withColumn("quality_ok",
        (toks >= 5 && toks <= 1000 && awl >= 200 && awl <= 1500).cast(IntegerType))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"),
        sum("quality_ok").cast(LongType).as("n_quality_ok"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source", "split")
  }

  val q118Sql =
    """WITH d AS (
      |  SELECT source, lang,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0
      |      THEN 'val' ELSE 'train' END AS split,
      |    length(text) - length(replace(text, ' ', '')) AS spaces,
      |    length(replace(text, ' ', '')) AS nonspace
      |  FROM documents
      |), f AS (
      |  SELECT source, split, lang,
      |    CAST(spaces + 1 AS BIGINT) AS n_tokens,
      |    CAST(spaces + 1 BETWEEN 5 AND 1000
      |      AND FLOOR(100.0 * nonspace / (spaces + 1)) BETWEEN 200 AND 1500
      |      AS INTEGER) AS quality_ok
      |  FROM d
      |)
      |SELECT source, split, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  CAST(SUM(quality_ok) AS BIGINT) AS n_quality_ok,
      |  COUNT(DISTINCT lang) AS n_langs
      |FROM f GROUP BY source, split ORDER BY source, split""".stripMargin

  /** q177 length-bucketed batching audit — the padding-waste economics of
    * static-shape training (every XLA/TPU-style trainer pads each batch to
    * a fixed shape; bucketing by length is the standard mitigation): bucket
    * every document by the BITLEN of its whitespace token count (power-of-2
    * length buckets — the q160/q167 integer-log surrogate, so bucket caps
    * are the structural 2^b − 1), and report per bucket the doc count, real
    * token mass, the bucket's padded cap, total padding tokens
    * Σ(cap − len), and the padded-compute waste share in ppm. The
    * complement q81 (packing) eliminates padding by concatenation; this
    * measures what bucketed padding would cost instead — the number a team
    * compares against packing's cross-doc attention contamination.
    *
    * Scale shape: one corpus scan, one narrow codegen'd map (split + size +
    * bin), one map-side-combined aggregate over ≤64 structural buckets.
    * Nothing shuffles except ≤64 partial rows per task. */
  def q177(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(size(T.tokens(col("text"))).cast(LongType).as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket_bits", length(bin(col("n_tok"))).cast(LongType))
      .withColumn("bucket_cap",
        expr("shiftleft(cast(1 as bigint), cast(bucket_bits as int)) - 1"))
      .groupBy("bucket_bits", "bucket_cap")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        sum(col("bucket_cap") - col("n_tok")).as("pad_tokens"))
      .withColumn("pad_waste_ppm",
        expr("pad_tokens * 1000000 div (bucket_cap * n_docs)"))
      .orderBy("bucket_bits")

  val q177Sql: String =
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |), b AS (
      |  SELECT n_tok,
      |    CAST(length(printf('%b', n_tok)) AS BIGINT) AS bucket_bits
      |  FROM t WHERE n_tok > 0
      |), c AS (
      |  SELECT n_tok, bucket_bits,
      |    CAST((1 << bucket_bits) - 1 AS BIGINT) AS bucket_cap
      |  FROM b
      |)
      |SELECT bucket_bits, bucket_cap,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(bucket_cap - n_tok) AS BIGINT) AS pad_tokens,
      |  CAST(SUM(bucket_cap - n_tok) * 1000000 // (bucket_cap * COUNT(*)) AS BIGINT) AS pad_waste_ppm
      |FROM c GROUP BY bucket_bits, bucket_cap ORDER BY bucket_bits""".stripMargin

  /** q181 documents-table contract audit — the intake gate that runs before
    * any operator TRUSTS the table (the documents twin of q173's embedding
    * audit): per source, doc count vs distinct-id count (a duplicate doc_id
    * silently double-counts through every downstream join), declared
    * `n_chars` vs actual `length(text)` mismatches (a stale derived column
    * poisons every length-based gate: q33, q89, q111), empty-text count,
    * the token-count range, and the distinct-language count. All-zero alarm
    * columns ARE the healthy state — the audit's value is that a 100 TB
    * ingest run where they are NOT zero fails loudly before training.
    * Scale shape: one scan, one narrow codegen'd map, one map-combined
    * aggregate (count-distinct adds its standard two-level expansion,
    * keyed by source). */
  def q181(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("source"), col("doc_id"), col("lang"),
        col("n_chars"),
        length(col("text")).cast(LongType).as("len_actual"),
        size(T.tokens(col("text"))).cast(LongType).as("n_tok"),
        (length(col("text")) === 0).as("is_empty"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("doc_id").as("n_distinct_ids"),
        sum(when(col("n_chars") =!= col("len_actual"), 1L).otherwise(0L))
          .as("n_chars_mismatch"),
        sum(when(col("is_empty"), 1L).otherwise(0L)).as("n_empty_text"),
        min("n_tok").as("min_tokens"), max("n_tok").as("max_tokens"),
        countDistinct("lang").as("n_langs"))
      .orderBy("source")

  val q181Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids,
      |  CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatch,
      |  CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text,
      |  CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
      |  CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q195 pack-fill audit — the fragmentation economics of q81's next-fit
    * packing (the packing-side complement of q177's padding waste: packing
    * trades padding for FRAGMENTATION, the tail token slots each pack
    * leaves unfilled): per pack the token fill against the 128-token
    * budget, histogrammed by fill decile (bucket 10 = ≥100%, i.e. exactly
    * full or an oversized singleton). Mass in low deciles prices the
    * next-fit heuristic against smarter bin-packing; the oracle replays
    * packing itself (the q81 recursive CTE) and audits on top of it, so
    * the histogram is proof the state machine and its replay still agree
    * at the aggregate level.
    *
    * Scale shape: q81's one keyed shuffle + O(1)-state scan, then a
    * (source, shard, pack) map-combined rollup and an ≤11-cell histogram. */
  def q195(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.parallelized(Tables.load(spark, dir, "documents")),
      budget = 128L, shards = 4)
      .groupBy("source", "shard", "pack_idx")
      .agg(sum("n_tokens").as("pack_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("fill_ppm", expr("pack_tokens * 1000000 div 128"))
      .withColumn("bucket", expr("least(fill_ppm div 100000, 10)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_packs"), sum("n_docs").as("n_docs"),
        sum("pack_tokens").as("sum_tokens"))
      .orderBy("bucket")

  val q195Sql: String =
    s"""WITH packs AS (
       |  SELECT source, shard, pack_idx, SUM(n_tokens) AS pack_tokens,
       |    COUNT(*) AS n_docs
       |  FROM ($q81Sql)
       |  GROUP BY source, shard, pack_idx
       |), f AS (
       |  SELECT LEAST(pack_tokens * 1000000 // 128 // 100000, 10) AS bucket,
       |    n_docs, pack_tokens
       |  FROM packs
       |)
       |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_packs,
       |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |  CAST(SUM(pack_tokens) AS BIGINT) AS sum_tokens
       |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q198 training-shard balance audit — the straggler check on q84's
    * md5 shard assignment (synchronous data-parallel training steps at
    * the speed of the HEAVIEST shard, so shard skew is wasted
    * accelerator time): per shard the doc count, token mass, and token
    * share vs the uniform share in ppm, plus the shard's skew factor
    * ×1000 (the q192 framing pointed at the OUTPUT layout instead of
    * the join key). An md5 split should sit within sampling noise of
    * uniform — a skew factor far from 1000 means the assignment is
    * broken or the token distribution needs q83's winsorization first.
    *
    * Scale shape: one corpus pass, one ≤|shards| map-combined
    * aggregate, population stats a 1-row broadcast. */
  def q198(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "documents")
      .select(T.hashBucket(col("doc_id"), 8).as("shard"),
        size(T.tokens(col("text"))).cast(LongType).as("n_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    s.crossJoin(broadcast(s.agg(sum("n_tokens").as("total_tokens"),
        count(lit(1)).as("n_shards"))))
      .withColumn("share_ppm", expr("n_tokens * 1000000 div total_tokens"))
      .withColumn("skew_x1000",
        expr("n_tokens * n_shards * 1000 div total_tokens"))
      .select("shard", "n_docs", "n_tokens", "share_ppm", "skew_x1000")
      .orderBy("shard")
  }

  val q198Sql: String =
    """WITH s AS (
      |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |), g AS (
      |  SELECT shard, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
      |  FROM s GROUP BY shard
      |), pop AS (
      |  SELECT SUM(n_tokens) AS total_tokens, COUNT(*) AS n_shards FROM g
      |)
      |SELECT shard, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_tokens * 1000000 // pop.total_tokens AS BIGINT) AS share_ppm,
      |  CAST(n_tokens * pop.n_shards * 1000 // pop.total_tokens AS BIGINT) AS skew_x1000
      |FROM g CROSS JOIN pop ORDER BY shard""".stripMargin

  /** q200 corpus datasheet — the one-row passport ("Datasheets for
    * Datasets", Gebru et al., CACM 2021) a release ships next to the
    * shards: document/source/language counts, total token mass, distinct
    * text count with the global duplication-inflation ppm (the q188
    * number corpus-wide), and the mean q111 quality logit — the header
    * every per-source audit in this registry drills under. Two aggregates
    * total: one flat pass for the counts/means, one fingerprint-keyed
    * pass for the dup stats, joined as 1-row frames.
    *
    * Scale shape: two corpus passes (flat + fp-keyed), everything else
    * 1-row arithmetic. */
  def q200(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tok", size(col("w")).cast(LongType))
      .withColumn("logit_x1e6",
        expr(s"${Retrieval.W0} + ${Retrieval.WLen} * n_tok + " +
          s"${Retrieval.WDistinct} * (cast(size(array_distinct(w)) as bigint) * 1000000 div n_tok) + " +
          s"(${Retrieval.WStop}) * (cast(2 * size(w) - size(array_remove(w, 'the')) - size(array_remove(w, 'a')) as bigint) * 1000000 div n_tok)"))
    val flat = docs.agg(count(lit(1)).as("n_docs"),
      countDistinct("source").as("n_sources"),
      countDistinct("lang").as("n_langs"),
      sum("n_tok").as("total_tokens"),
      expr("sum(logit_x1e6) div count(1)").as("mean_logit_x1e6"))
    val dup = docs
      .select(graft.functions.TextFunctions.portableHash60(col("text"))
        .as("fp"), col("n_tok"))
      .groupBy("fp").agg(max("n_tok").as("n_tok"))
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum("n_tok").as("unique_tokens"))
    flat.crossJoin(broadcast(dup))
      .withColumn("dup_inflation_ppm",
        expr("total_tokens * 1000000 div unique_tokens"))
      .select("n_docs", "n_sources", "n_langs", "total_tokens",
        "n_distinct_texts", "dup_inflation_ppm", "mean_logit_x1e6")
  }

  val q200Sql: String =
    s"""WITH d AS (
       |  SELECT source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    ${Retrieval.W0} + ${Retrieval.WLen} * CAST(len(string_split(text, ' ')) AS BIGINT)
       |    + ${Retrieval.WDistinct} * (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000
       |           // len(string_split(text, ' ')))
       |    + (${Retrieval.WStop}) * (CAST(len(list_filter(string_split(text, ' '),
       |             t -> t = 'the' OR t = 'a')) AS BIGINT) * 1000000
       |           // len(string_split(text, ' '))) AS logit_x1e6,
       |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
       |  FROM documents
       |), flat AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       |    CAST(SUM(logit_x1e6) // COUNT(*) AS BIGINT) AS mean_logit_x1e6
       |  FROM d
       |), u AS (
       |  SELECT COUNT(*) AS n_distinct_texts,
       |    CAST(SUM(n_tok) AS BIGINT) AS unique_tokens
       |  FROM (SELECT fp, MAX(n_tok) AS n_tok FROM d GROUP BY fp)
       |)
       |SELECT flat.n_docs, flat.n_sources, flat.n_langs, flat.total_tokens,
       |  u.n_distinct_texts,
       |  CAST(flat.total_tokens * 1000000 // u.unique_tokens AS BIGINT) AS dup_inflation_ppm,
       |  flat.mean_logit_x1e6
       |FROM flat CROSS JOIN u""".stripMargin

  /** q210 shard shuffle-quality audit — are q84's training shards actually
    * WELL-SHUFFLED? Synchronous training consumes each shard in its
    * materialized order, and runs of same-source examples (bad shuffling)
    * bias gradients exactly like the skew q198 measures in SIZE. Per
    * shard, in the shard's own (ord, doc_id) training order: observed
    * adjacent same-source pairs vs the expectation under a uniformly
    * random permutation — E[same] = Σ_src n_s(n_s−1) / (n(n−1)) per
    * adjacent slot (the birthday-style collision rate), both in exact ppm,
    * and the excess (observed − expected; ≈ 0 healthy, ≫ 0 runs, ≪ 0
    * suspiciously anti-correlated). The md5 ord key IS the shuffle under
    * test, so the fixture's excess hovers near zero — spec-asserted.
    *
    * Scale shape: the lag window is partitioned by shard — the same keyed
    * per-shard sort q84 itself performs to materialize the order (the
    * q108 documented trade); the composition term is two map-combined
    * aggregates. Int64 bound (CLOSED in r11): the expectation term is
    * computed in 128-bit fixed point on BOTH engines — Spark lifts
    * `pair_mass` and `n(n−1)` to decimal(38,0) before the multiply
    * (IntegralDivide on decimals, exact, still returns BIGINT), DuckDB to
    * HUGEINT — so the exact multiply-first form now holds to
    * pair_mass ≈ 1e31 (≈ 3e15 same-source docs per shard), far past any
    * physical shard. No truncation trade was needed: the lift keeps the
    * exact ppm floor semantics. */
  def q210(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    val docs = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        T.hashBucket(col("doc_id"), 8).as("shard"),
        T.hashBucket(concat(col("doc_id").cast(StringType), lit("#ord")),
          999983).as("ord"))
    val adj = docs.withColumn("prev_src", lag("source", 1).over(w))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("prev_src") === col("source"), 1L).otherwise(0L))
          .as("same_adj"))
    val comp = docs.groupBy("shard", "source").agg(count(lit(1)).as("ns"))
      .groupBy("shard").agg(sum(expr("ns * (ns - 1)")).as("pair_mass"))
    adj.join(comp, "shard")
      .withColumn("same_ppm", when(col("n_docs") > 1,
        expr("same_adj * 1000000 div (n_docs - 1)")))
      .withColumn("expected_ppm", when(col("n_docs") > 1,
        expr("""cast(pair_mass as decimal(38,0)) * 1000000
               | div (cast(n_docs as decimal(38,0)) * (n_docs - 1))"""
          .stripMargin.replace("\n", " "))))
      .withColumn("excess_ppm", col("same_ppm") - col("expected_ppm"))
      .select("shard", "n_docs", "same_adj", "same_ppm", "expected_ppm",
        "excess_ppm")
      .orderBy("shard")
  }

  val q210Sql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      % 8 AS shard,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ord'), 1, 8)
      |      AS BIGINT) % 999983 AS ord
      |  FROM documents
      |), adj AS (
      |  SELECT shard, COUNT(*) AS n_docs,
      |    SUM(CASE WHEN prev_src = source THEN 1 ELSE 0 END) AS same_adj
      |  FROM (SELECT shard, source,
      |          LAG(source) OVER (PARTITION BY shard ORDER BY ord, doc_id)
      |            AS prev_src
      |        FROM h)
      |  GROUP BY shard
      |), comp AS (
      |  SELECT shard, SUM(ns * (ns - 1)) AS pair_mass
      |  FROM (SELECT shard, source, COUNT(*) AS ns FROM h GROUP BY 1, 2)
      |  GROUP BY shard
      |)
      |SELECT a.shard, a.n_docs, CAST(a.same_adj AS BIGINT) AS same_adj,
      |  CAST(CASE WHEN a.n_docs > 1
      |    THEN a.same_adj * 1000000 // (a.n_docs - 1) END AS BIGINT)
      |    AS same_ppm,
      |  CAST(CASE WHEN a.n_docs > 1
      |    THEN CAST(c.pair_mass AS HUGEINT) * 1000000
      |       // (CAST(a.n_docs AS HUGEINT) * (a.n_docs - 1)) END
      |    AS BIGINT) AS expected_ppm,
      |  CAST(CASE WHEN a.n_docs > 1
      |    THEN a.same_adj * 1000000 // (a.n_docs - 1)
      |       - CAST(c.pair_mass AS HUGEINT) * 1000000
      |         // (CAST(a.n_docs AS HUGEINT) * (a.n_docs - 1)) END
      |    AS BIGINT) AS excess_ppm
      |FROM adj a JOIN comp c USING (shard) ORDER BY shard""".stripMargin

  /** q227 per-source document-length inequality (exact Gini) — the
    * long-document dominance flag for corpus layout: a source whose token
    * mass concentrates in a few giant documents packs badly (q81's bins
    * fragment, q177's buckets pad) and lets single documents dominate a
    * mixture cell, invisibly to the mean length. Exact rank-formula Gini
    * over each source's per-document token counts, in ppm:
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with documents ranked ascending
    * by (tokens, doc_id) — deterministic under ties, all int64 (overflow
    * past Σ(i·xᵢ) ≈ 9e18: i ≤ n, so n·Σx bounds it — lift to decimal
    * past ~3e9 docs·tokens per source). 0 = all docs equal, →1e6 = one
    * doc is the source. The income-inequality statistic q143 applies to
    * LABELS, pointed at document mass (and the docs-axis companion of
    * q194's token-axis HHI).
    *
    * Scale shape: one corpus map, one rank window KEYED by source (the
    * q108/q210 per-group-sort trade, stated): at open-web scale a single
    * giant source straggles its partition's sort — the documented swap is
    * the q53 sketch path (approx quantiles of the length distribution) or
    * the q230-style octave/bitlen rendering, both sort-free; the exact
    * keyed sort stays the default because Gini is an AUDIT number read by
    * humans per rebuild, not a per-query serving path. One ≤\|sources\|
    * rollup finishes. */
  def q227(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("nt"), col("doc_id"))
    Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("nt"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        sum(expr("rk * nt")).as("rank_mass"))
      .withColumn("gini_ppm", expr(
        "(2 * rank_mass - (n_docs + 1) * n_tokens) * 1000000 div (n_docs * n_tokens)"))
      .select("source", "n_docs", "n_tokens", "gini_ppm")
      .orderBy("source")
  }

  val q227Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents
      |), r AS (
      |  SELECT source, nt,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt, doc_id)
      |      AS BIGINT) AS rk
      |  FROM d
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  CAST((2 * SUM(rk * nt) - (COUNT(*) + 1) * SUM(nt)) * 1000000
      |    // (COUNT(*) * SUM(nt)) AS BIGINT) AS gini_ppm
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  /** q228 pack-boundary split contamination — the cross-doc leak the
    * packing stage can introduce AFTER a clean split: q81 packs documents
    * into fixed context windows, and a pack holding BOTH q171 train-side
    * and test-side documents exposes eval text to training attention
    * (full-attention packing has no document mask by default). Per source:
    * packs, mixed packs (both sides present), mixed share in ppm, and the
    * documents riding in mixed packs — the exposure the fix (pack WITHIN
    * side, or attention-mask at doc boundaries) must drive to zero. The
    * oracle replays the packing state machine (the q81 recursive CTE) AND
    * the cluster-side assignment (the q171 algebra) end-to-end —
    * composition proved cross-engine, like q221/q224.
    *
    * Scale shape: the pack frame joins the side frame on doc_id (both
    * corpus-keyed, one shuffle), then two bounded aggregates — per
    * (source, shard, pack) cells, then the ≤\|sources\| rollup. */
  def q228(spark: SparkSession, dir: String): DataFrame = {
    val packs = packSequences(
      Tables.parallelized(Tables.load(spark, dir, "documents")),
      budget = 128L, shards = 4)
      .select("doc_id", "source", "shard", "pack_idx")
    val sides = graft.dedup.Dedup.splitSides(spark, dir)
      .select(col("doc_id"), col("side"))
    packs.join(sides, "doc_id")
      .groupBy("source", "shard", "pack_idx")
      .agg(count(lit(1)).as("n_docs"),
        min("side").as("lo"), max("side").as("hi"))
      .withColumn("mixed", col("lo") =!= col("hi"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_packs"),
        sum(when(col("mixed"), 1L).otherwise(0L)).as("n_mixed"),
        sum(when(col("mixed"), col("n_docs")).otherwise(0L))
          .as("docs_exposed"))
      .withColumn("mixed_ppm", expr("n_mixed * 1000000 div n_packs"))
      .select("source", "n_packs", "n_mixed", "mixed_ppm", "docs_exposed")
      .orderBy("source")
  }

  val q228Sql: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 4 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), seq AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn
      |  FROM d
      |), rec AS (
      |  SELECT doc_id, source, shard, n_tokens, rn,
      |    CAST(1 AS BIGINT) AS pack_idx, n_tokens AS used
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s.doc_id, s.source, s.shard, s.n_tokens, s.rn,
      |    CASE WHEN r.used + s.n_tokens <= 128 THEN r.pack_idx ELSE r.pack_idx + 1 END,
      |    CASE WHEN r.used + s.n_tokens <= 128 THEN r.used + s.n_tokens ELSE s.n_tokens END
      |  FROM rec r JOIN seq s
      |    ON s.source = r.source AND s.shard = r.shard AND s.rn = r.rn + 1
      |), toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15) AS BIGINT))) AS hs
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id,
      |    list_min(list_transform(hs, h -> (1299709 * (h % 2147483647) + 7) % 2147483647)) AS s0,
      |    list_min(list_transform(hs, h -> (15485863 * (h % 2147483647) + 101) % 2147483647)) AS s1
      |  FROM sh
      |), sides AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(
      |      CAST(CASE WHEN s0 IS NOT NULL THEN s0 ELSE -1 END AS VARCHAR)
      |      || ':' ||
      |      CAST(CASE WHEN s0 IS NOT NULL THEN s1 ELSE doc_id END AS VARCHAR)),
      |      1, 8) AS BIGINT) % 2 AS side
      |  FROM sig
      |), cells AS (
      |  SELECT r.source, r.shard, r.pack_idx, COUNT(*) AS n_docs,
      |    MIN(sd.side) AS lo, MAX(sd.side) AS hi
      |  FROM rec r JOIN sides sd ON sd.doc_id = r.doc_id
      |  GROUP BY 1, 2, 3
      |)
      |SELECT source, COUNT(*) AS n_packs,
      |  CAST(SUM(CASE WHEN lo <> hi THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
      |  CAST(SUM(CASE WHEN lo <> hi THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
      |    AS BIGINT) AS mixed_ppm,
      |  CAST(SUM(CASE WHEN lo <> hi THEN n_docs ELSE 0 END) AS BIGINT)
      |    AS docs_exposed
      |FROM cells GROUP BY source ORDER BY source""".stripMargin

  /** q253 corpus SNAPSHOT DIFF (new r13) — the incremental-corpus
    * operator every recurring crawl/ingest pipeline runs before anything
    * else: given two corpus versions, classify every document as added /
    * deleted / changed / unchanged by CONTENT fingerprint (not mtime, not
    * row count — a re-crawled page with identical bytes must read as
    * unchanged) and roll the census up per source. Downstream consumers
    * are incremental: only `added`+`changed` re-enter dedup/quality/
    * embedding, only `deleted` tombstones the index (the q248 verb) — at
    * 100 TB the diff IS the ingest plan.
    *
    * The second snapshot is derived deterministically from the first so
    * the operator is fixture-replayable (the ScaleUp philosophy): md5
    * bucket 0-of-11 of doc_ids is dropped (deleted), bucket 1 gets a
    * ' rev2' suffix (changed), bucket 2 is additionally cloned under
    * doc_id + 1e9 as new arrivals (added) — pure integer/string algebra
    * both engines replay, so the WHOLE diff sits under the DuckDB hash
    * gate. In production the derive step is replaced by reading the real
    * v2 table; everything from the fingerprint map on is unchanged.
    *
    * Scale shape: two narrow fingerprint maps (md5 over text — no
    * shingling, the cheapest content stamp) → ONE full-outer join keyed
    * on doc_id → one map-combined (source, status) rollup. The join is
    * the only corpus-sized shuffle, and it is the unavoidable one: diff
    * is a keyed comparison by definition. */
  def q253(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("text"),
        T.hashBucket(col("doc_id"), 11).as("bk"))
    val v1 = base.select(col("doc_id"), col("source"),
      md5(col("text")).as("fp"))
    val v2 = base.filter(col("bk") =!= 0)
      .select(col("doc_id"), col("source"),
        md5(when(col("bk") === 1, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("fp"))
      .unionByName(base.filter(col("bk") === 2)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          col("source"), md5(concat(col("text"), lit(" new"))).as("fp")))
    v1.select(col("doc_id"), col("source").as("s1"), col("fp").as("fp1"))
      .join(v2.select(col("doc_id"), col("source").as("s2"),
        col("fp").as("fp2")), Seq("doc_id"), "full_outer")
      .select(coalesce(col("s1"), col("s2")).as("source"),
        when(col("fp2").isNull, lit("deleted"))
          .when(col("fp1").isNull, lit("added"))
          .when(col("fp1") =!= col("fp2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  val q253Sql: String =
    """WITH b AS (
      |  SELECT doc_id, source, text,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 11 AS bk
      |  FROM documents
      |), v1 AS (
      |  SELECT doc_id, source, md5(text) AS fp FROM b
      |), v2 AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN bk = 1 THEN text || ' rev2' ELSE text END) AS fp
      |  FROM b WHERE bk <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000000, source, md5(text || ' new') FROM b WHERE bk = 2
      |), d AS (
      |  SELECT COALESCE(v1.source, v2.source) AS source,
      |    CASE WHEN v2.fp IS NULL THEN 'deleted'
      |         WHEN v1.fp IS NULL THEN 'added'
      |         WHEN v1.fp <> v2.fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      |)
      |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM d GROUP BY source, status ORDER BY source, status""".stripMargin

  // ---- q278 winnowing fingerprints ----------------------------------------

  /** Winnowing parameters (Schleimer, Wilkerson & Aiken, SIGMOD 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting"): k-token
    * grams, windows of w consecutive gram hashes. The winnowing GUARANTEE:
    * any passage of at least t = w + k − 1 = 7 tokens shared verbatim by two
    * documents yields at least one shared SELECTED fingerprint — while only
    * ~2/(w+1) of gram hashes are kept (the paper's density bound). This is
    * the detection floor q35's per-doc rolling hash cannot promise and q244's
    * span miner pays full gram df for. */
  private val WinnowK = 4
  private val WinnowW = 4
  private val WinnowDfCap = 64L

  /** The winnowing SELECTION over a (doc_id, text) frame: per document,
    * gram-hash positions chosen by the robust right-most-minimum rule —
    * position p is selected iff SOME w-window containing p has its minimum
    * at p with every position right of p in that window STRICTLY larger
    * (ties break right-most, so repeated text re-selects the same
    * fingerprints — the paper's robust variant). Equivalently (the form
    * both engines evaluate): for some i in [0, w−1], the w−1−i hashes
    * immediately left are all ≥ h(p) and the i hashes immediately right are
    * all > h(p); missing neighbors at document edges count as +∞, which
    * extends selection to partial windows (short documents still
    * fingerprint). One doc-keyed window over the gram frame — no
    * unpartitioned state, selection density ~2/(w+1) bounds what flows
    * downstream. */
  def winnowSelected(docs: DataFrame): DataFrame =
    // the native winnow_select expression ([[graft.plans.WinnowSelect]])
    // computes the selection per document INSIDE the scan stage — the
    // selection depends only on the doc's own gram array, so the r16
    // rewrite drops the explode → doc-keyed exchange → sort → 6-column
    // lag/lead window pipeline (measured ~11 s of window-stage task time
    // at sf0.1, and at warehouse scale a full gram-stream shuffle) for a
    // zero-shuffle map. Bit-identical selection: the window formulation
    // is replayed as the parity reference in DedupSpec, and the oracle
    // replays the original lag/lead SQL unchanged.
    docs.select(col("doc_id"),
        explode(call_function("winnow_select",
          T.portableShingleHashes(col("text"), WinnowK))).as("s"))
      .select(col("doc_id"), col("s").getField("pos").as("pos"),
        col("s").getField("fp").as("fp"))

  /** q278 winnowed-fingerprint match census: the top-20 document pairs by
    * shared SELECTED fingerprints. Selection is [[winnowSelected]]; pair
    * discovery joins only fingerprints selected in ≥ 2 documents with total
    * selected occurrences ≤ 64 (the q244/q252 df-cap discipline — candidates
    * stay ∝ anchor collisions, never corpus²; pairs sharing only
    * corpus-stock phrases are the declared miss, priced for containment by
    * q269). At 100 TB the winnowed frame is already ~2/(w+1) of the gram
    * frame BEFORE any join — winnowing is the cheap first pass that
    * guarantees detection of any ≥ 7-token verbatim overlap, where MinHash
    * (q27) only detects high whole-doc similarity. */
  def q278(spark: SparkSession, dir: String): DataFrame =
    q278From(Tables.parallelized(Tables.load(spark, dir, "documents")))

  /** [[q278]] over an arbitrary (doc_id, text) frame — spec entry point. */
  def q278From(docs: DataFrame): DataFrame = {
    // scratch-materialized: selpos feeds TWO consumers (the anchor census
    // and the hit projection), and each re-ran the md5-gram + window
    // selection pipeline from the shared exchange (r16 probe: two ~4 MB
    // gram map jobs + two window stages per execution). The winnowed
    // frame is ~2/(w+1) of the gram stream — cheap to hold, expensive to
    // recompute.
    val selpos = graft.operators.Checkpoints.scratch(winnowSelected(docs))
    val anchors = selpos.groupBy("fp")
      .agg(countDistinct("doc_id").as("nd"), count(lit(1)).as("df"))
      .filter(col("nd") >= 2 && col("df") <= WinnowDfCap)
      .select("fp")
    val hits = selpos.join(anchors, Seq("fp"), "left_semi")
      .select("doc_id", "fp").distinct()
    hits.as("a")
      .join(hits.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(desc("n_shared"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  val q278Sql: String = {
    val gram4 = (0 until WinnowK).map(i =>
      if (i == 0) "w[pos]" else s"w[pos+$i]").mkString(" || ' ' || ")
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), s AS (
      |  SELECT doc_id, w, unnest(range(1, len(w) - ${WinnowK - 2})) AS pos
      |  FROM t
      |), g AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    CAST('0x' || substr(md5($gram4), 1, 15) AS BIGINT) AS h
      |  FROM s
      |), x AS (
      |  SELECT doc_id, pos, h,
      |    COALESCE(lag(h, 1) OVER win, 9223372036854775807) AS l1,
      |    COALESCE(lag(h, 2) OVER win, 9223372036854775807) AS l2,
      |    COALESCE(lag(h, 3) OVER win, 9223372036854775807) AS l3,
      |    COALESCE(lead(h, 1) OVER win, 9223372036854775807) AS r1,
      |    COALESCE(lead(h, 2) OVER win, 9223372036854775807) AS r2,
      |    COALESCE(lead(h, 3) OVER win, 9223372036854775807) AS r3
      |  FROM g
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |), selpos AS (
      |  SELECT doc_id, pos, h AS fp FROM x
      |  WHERE (l1 >= h AND l2 >= h AND l3 >= h)
      |     OR (l1 >= h AND l2 >= h AND r1 > h)
      |     OR (l1 >= h AND r1 > h AND r2 > h)
      |     OR (r1 > h AND r2 > h AND r3 > h)
      |), anchors AS (
      |  SELECT fp FROM selpos GROUP BY fp
      |  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= $WinnowDfCap
      |), h2 AS (
      |  SELECT DISTINCT doc_id, fp FROM selpos
      |  WHERE fp IN (SELECT fp FROM anchors)
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM h2 a JOIN h2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |ORDER BY n_shared DESC, doc_a, doc_b
      |LIMIT 20""".stripMargin
  }

  // ---- q288 layout-pruning audit -------------------------------------------

  /** q288 data-layout pruning audit — PRICES what [[graft.operators.ZOrder]]
    * exists for, on real data: simulate 64-file layouts of lineitem under
    * three write strategies (NATURAL insertion order; SORTED by partkey;
    * Z-ORDERED on the Morton interleave of partkey × suppkey) and, for a
    * ±1% band predicate on EACH key, count the files whose min/max stats
    * overlap the band — exactly the parquet row-group pruning a 100 TB scan
    * lives or dies by. The textbook geometry falls out of the data: sorted
    * prunes its own key to ~2% of rows but scans EVERYTHING for the other
    * key; Z-order prunes BOTH keys at once; natural scans everything
    * always. Files are equal-WIDTH key ranges (value buckets, not rank
    * quantiles — the declared simplification: real writers range-partition
    * by sampled quantiles, which moves file SIZES, not the pruning
    * geometry; per-layout scanned ROW mass is the honest metric and is
    * emitted beside file counts). One scan computes all three file ids per
    * row (no global sort, no unpartitioned window — file id is a pure map
    * off the 1-row broadcast maxima), one (layout, file) aggregate builds
    * the stats, and the band test is a ≤192-row rollup. */
  def q288(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast(LongType).as("ok"),
        col("l_linenumber").cast(LongType).as("ln"),
        col("l_partkey").cast(LongType).as("pk"),
        col("l_suppkey").cast(LongType).as("sk"))
      .withColumn("nat", expr("ok * 8 + ln"))
    // scratch-barrier the 1-row maxima: both the file-id map and the band
    // derivation consume it, and an un-materialized aggregate would re-run
    // the lineitem scan once per consumer (review finding — the doc's
    // "one scan" claim now holds physically)
    val maxes = graft.operators.Checkpoints.scratch(
      li.agg(max("nat").as("mnat"), max("pk").as("mpk"),
        max("sk").as("msk"), count(lit(1)).as("total")))
    // NORMALIZE both keys to a shared 16-bit domain before interleaving —
    // the ZOrder.scala caveat made concrete: raw interleaving of an 11-bit
    // and a 7-bit key puts only the wide key's bits at file-boundary
    // positions (measured here first: the un-normalized curve pruned
    // sk_band to just 97% of rows); after normalization the top 6 key bits
    // are 3 bits of EACH dimension, an 8×8 grid
    val f = li.crossJoin(broadcast(maxes))
      .withColumn("pk16", expr("pk * 65536 div (mpk + 1)"))
      .withColumn("sk16", expr("sk * 65536 div (msk + 1)"))
      .withColumn("zk",
        graft.operators.ZOrder.mortonKey16(col("pk16"), col("sk16")))
      .withColumn("f_nat", expr("nat div (mnat div 64 + 1)"))
      .withColumn("f_srt", expr("pk div (mpk div 64 + 1)"))
      .withColumn("f_zor", expr("zk div 67108864")) // 2^32 domain / 64 files
      .select(col("pk"), col("sk"), col("total"),
        expr("stack(3, 'natural', f_nat, 'sorted_pk', f_srt, " +
          "'zorder', f_zor) as (layout, file)"))
    val stats = f.groupBy("layout", "file").agg(
      min("pk").as("min_pk"), max("pk").as("max_pk"),
      min("sk").as("min_sk"), max("sk").as("max_sk"),
      count(lit(1)).as("n_rows"), max("total").as("total"))
    val bands = maxes.select(
      expr("mpk * 49 div 100").as("pk_lo"), expr("mpk * 51 div 100").as("pk_hi"),
      expr("msk * 49 div 100").as("sk_lo"), expr("msk * 51 div 100").as("sk_hi"))
    stats.crossJoin(broadcast(bands))
      .select(col("layout"), col("n_rows"), col("total"),
        expr("stack(2, 'pk_band', " +
          "CASE WHEN max_pk >= pk_lo AND min_pk <= pk_hi THEN 1 ELSE 0 END, " +
          "'sk_band', " +
          "CASE WHEN max_sk >= sk_lo AND min_sk <= sk_hi THEN 1 ELSE 0 END)" +
          " as (predicate, hit)"))
      .groupBy("layout", "predicate").agg(
        count(lit(1)).as("n_files"),
        sum("hit").as("files_scanned"),
        sum(expr("hit * n_rows")).as("rows_scanned"),
        max("total").as("total_rows"))
      .withColumn("scan_ppm",
        expr("rows_scanned * 1000000 div total_rows"))
      .orderBy("layout", "predicate")
  }

  val q288Sql: String = {
    val morton = "CAST(list_sum(list_transform(range(0, 16), i -> " +
      "(((pk16 >> CAST(i AS INTEGER)) & 1) << CAST(2 * i + 1 AS INTEGER)) + " +
      "(((sk16 >> CAST(i AS INTEGER)) & 1) << CAST(2 * i AS INTEGER)))) AS BIGINT)"
    s"""WITH li AS (
      |  SELECT CAST(l_orderkey AS BIGINT) * 8 + CAST(l_linenumber AS BIGINT)
      |      AS nat,
      |    CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk
      |  FROM lineitem
      |), mx AS (
      |  SELECT MAX(nat) AS mnat, MAX(pk) AS mpk, MAX(sk) AS msk,
      |    COUNT(*) AS total
      |  FROM li
      |), zk AS (
      |  SELECT l.nat, l.pk, l.sk, m.total, m.mnat, m.mpk, m.msk, $morton AS zk
      |  FROM (
      |    SELECT li.*, li.pk * 65536 // (m0.mpk + 1) AS pk16,
      |      li.sk * 65536 // (m0.msk + 1) AS sk16
      |    FROM li CROSS JOIN mx m0
      |  ) l CROSS JOIN mx m
      |), f AS (
      |  SELECT z.pk, z.sk, z.total, u.layout,
      |    CASE u.layout WHEN 'natural' THEN z.nat // (z.mnat // 64 + 1)
      |      WHEN 'sorted_pk' THEN z.pk // (z.mpk // 64 + 1)
      |      ELSE z.zk // 67108864 END AS file
      |  FROM zk z
      |  CROSS JOIN (SELECT unnest(['natural', 'sorted_pk', 'zorder'])
      |    AS layout) u
      |), stats AS (
      |  SELECT layout, file, MIN(pk) AS min_pk, MAX(pk) AS max_pk,
      |    MIN(sk) AS min_sk, MAX(sk) AS max_sk,
      |    COUNT(*) AS n_rows, MAX(total) AS total
      |  FROM f GROUP BY layout, file
      |), bands AS (
      |  SELECT mpk * 49 // 100 AS pk_lo, mpk * 51 // 100 AS pk_hi,
      |    msk * 49 // 100 AS sk_lo, msk * 51 // 100 AS sk_hi
      |  FROM mx
      |), hits AS (
      |  SELECT s.layout, s.n_rows, s.total, p.predicate,
      |    CASE WHEN p.predicate = 'pk_band'
      |      THEN CASE WHEN s.max_pk >= b.pk_lo AND s.min_pk <= b.pk_hi
      |        THEN 1 ELSE 0 END
      |      ELSE CASE WHEN s.max_sk >= b.sk_lo AND s.min_sk <= b.sk_hi
      |        THEN 1 ELSE 0 END END AS hit
      |  FROM stats s CROSS JOIN bands b
      |  CROSS JOIN (SELECT unnest(['pk_band', 'sk_band']) AS predicate) p
      |)
      |SELECT layout, predicate, CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(hit) AS BIGINT) AS files_scanned,
      |  CAST(SUM(hit * n_rows) AS BIGINT) AS rows_scanned,
      |  CAST(MAX(total) AS BIGINT) AS total_rows,
      |  CAST(SUM(hit * n_rows) * 1000000 // MAX(total) AS BIGINT) AS scan_ppm
      |FROM hits GROUP BY layout, predicate
      |ORDER BY layout, predicate""".stripMargin
  }

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q288_layout_pruning", q288 _, Some(q288Sql)),
    ("q278_winnow_fingerprint", q278 _, Some(q278Sql)),
    ("q253_snapshot_diff", q253 _, Some(q253Sql)),
    ("q210_shuffle_quality", q210 _, Some(q210Sql)),
    ("q227_length_gini", q227 _, Some(q227Sql)),
    ("q228_pack_contamination", q228 _, Some(q228Sql)),
    ("q177_padding_waste", q177 _, Some(q177Sql)),
    ("q198_shard_balance", q198 _, Some(q198Sql)),
    ("q200_corpus_datasheet", q200 _, Some(q200Sql)),
    ("q195_pack_fill", q195 _, Some(q195Sql)),
    ("q181_documents_audit", q181 _, Some(q181Sql)),
    ("q81_pack_sequences", q81 _, Some(q81Sql)),
    ("q82_priority_sample", q82 _, Some(q82Sql)),
    ("q83_winsorize", q83 _, Some(q83Sql)),
    ("q84_shuffle_shards", q84 _, Some(q84Sql)),
    ("q85_budget_select", q85 _, Some(q85Sql)),
    ("q118_dataset_card", q118 _, Some(q118Sql)))
}
