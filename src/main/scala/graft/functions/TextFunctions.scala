package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for the LLM-data-pipeline operators (SURVEY
  * §2.11): tokenization, shingling, hashing, language heuristics, quality
  * stats. Built from codegen'd native functions only — no UDFs — so every
  * operator scales as a narrow per-row map over the corpus.
  *
  * Where a query must hash-match the DuckDB oracle, the implementations here
  * deliberately stick to arithmetic both engines evaluate identically
  * (length/replace counting instead of regex token classes, FLOOR'd integer
  * outputs instead of double ROUND).
  */
object TextFunctions {

  /** Whitespace tokens (fixture text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count via space counting — expressible identically in any engine:
    * spaces = len(t) - len(replace(t,' ','')); tokens = spaces + 1. */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))) + 1

  /** Deterministic hash bucket in [0, mod): md5 of the key's string form,
    * first 8 hex digits as an integer. Engine-portable (identical arithmetic
    * exists in DuckDB: `CAST('0x'||substr(md5(..),1,8) AS BIGINT) % mod`) —
    * the one shared primitive behind reproducible sampling (q44) and
    * train/val splits (q54 / CorpusPipeline). */
  def hashBucket(key: Column, mod: Int): Column =
    hashBucket(key, lit(mod))

  /** [[hashBucket]] with a COLUMN modulus — for per-group bucket counts
    * computed in the plan (the q257 mega-cluster sub-split rule, where the
    * sub-block fan-out follows each cluster's own member count). */
  def hashBucket(key: Column, mod: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % mod

  /** BPE-ish subword-count estimate: words plus extra units for long words
    * (a word of length L costs ceil(L/6) units) — a deterministic stand-in
    * for a real tokenizer's compression curve. */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w).cast(DoubleType) / 6.0).cast(LongType))

  /** Word n-gram shingles (space-joined); empty array when too few tokens.
    * Computed by the native [[graft.plans.WordShingles]] one-loop expression;
    * bit-identical to the HOF composition [[wordShinglesHof]] (asserted in
    * DedupSpec), kept as the parity reference. */
  def wordShingles(text: Column, n: Int): Column =
    call_function("word_shingles", text, lit(n))

  /** The composed higher-order-function reference for [[wordShingles]] —
    * parity oracle only; not used in query paths. */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** xxhash64 per word n-gram shingle, duplicates kept — feed for
    * explode+aggregate paths where the aggregate enforces distinctness.
    * Computed by the native [[graft.plans.ShingleHashesRaw]] one-loop
    * expression; bit-identical to the HOF composition
    * [[wordShingleHashesRawHof]] (asserted in DedupSpec), which stays as the
    * parity reference. The HOF chain never enters codegen and its interpreted
    * eval is JIT-bimodal — a pushed-down null filter re-evaluating it stalled
    * single tasks for minutes on the sf0.1 bench. */
  def wordShingleHashesRaw(text: Column, n: Int): Column =
    call_function("shingle_hashes", text, lit(n))

  /** The composed higher-order-function reference for
    * [[wordShingleHashesRaw]] — parity oracle only; not used in query paths. */
  def wordShingleHashesRawHof(text: Column, n: Int): Column =
    transform(wordShinglesHof(text, n), s => xxhash64(s))

  /** Distinct xxhash64 values of word n-gram shingles — the set MinHash and
    * Jaccard verification operate on. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(wordShingleHashesRaw(text, n))

  /** Non-overlapping occurrence count of `word` as a whole token. Matches
    * the SQL formula (len(t)-len(replace(t,w,'')))/len(w) on both engines. */
  def occurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(needle), ""))) / needle.length)
      .cast(LongType)
  }

  /** Marker words per language for the n-gram/stopword language heuristic.
    * Tiny by design: the operator shape (score per language → argmax) is what
    * matters; swap in real stopword tables for production. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "nicht"),
    "fr" -> Seq("le", "et", "les"))

  /** Per-language marker score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(occurrences(text, _)).reduce(_ + _)

  /** Predicted language = argmax of marker scores, deterministic tiebreak by
    * declaration order; "und" (undetermined) when all scores are 0. */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (lang, ms) => (lang, langScore(text, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** 64-bit SimHash over the doc's shingle hash set: bit b of the result is
    * set iff Σ_shingles sign(bit b of xxhash64(shingle)) > 0. Computed as a
    * single aggregate carrying a 64-long counter array. */
  def simHash(shingles: Column): Column = {
    val counts = aggregate(
      shingles,
      typedlit(Seq.fill(64)(0L)),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    // pack via bitwise OR of per-position masks (no arithmetic → no ANSI
    // overflow even at bit 63)
    val masks = typedlit((0 until 64).map(b => 1L << b))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** ±1 per bit of a long hash, as a 64-element array (LSB first). The bit
    * masks are compile-time literals so each element is a plain AND. */
  private def bitsOf(h: Column): Column =
    array((0 until 64).map { b =>
      when(h.bitwiseAND(lit(1L << b)) =!= 0, lit(1L)).otherwise(lit(-1L))
    }: _*)

  /** Rolling fingerprint of the whole document over its shingle hash stream:
    * fp' = xxhash64(fp, h) — an order-sensitive chain (unlike the min-hash),
    * overflow-free under ANSI mode, deterministic across executors. */
  def rollingFingerprint(shingleHashes: Column): Column =
    aggregate(shingleHashes, lit(0L), (acc, h) => xxhash64(acc, h))

  /** Winnowing-style min-hash fingerprint: min over shingle hashes. */
  def minShingleHash(shingleHashes: Column): Column =
    array_min(shingleHashes)

  /** Engine-portable 60-bit hash: first 15 hex digits of md5, as a long.
    * Identical arithmetic in DuckDB (`CAST('0x'||substr(md5(x),1,15) AS
    * BIGINT)`) — 60 bits so it can never overflow a signed 64-bit int in
    * either engine. The fingerprint twin of [[hashBucket]]; use where a
    * fingerprint must hash-match the oracle (xxhash64 is Spark-only). */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** Per-shingle portable 60-bit hashes, document order, duplicates kept —
    * the order-sensitive feed for [[portableRollingFp]]. Computed by the
    * native [[graft.plans.PortableShingleHashes]] one-loop expression
    * (per-shingle MD5 without the hex-format/base-16-reparse round trip);
    * bit-identical to the HOF composition [[portableShingleHashesHof]]
    * (asserted in DedupSpec), which stays as the parity reference. */
  def portableShingleHashes(text: Column, n: Int): Column =
    call_function("portable_shingle_hashes", text, lit(n))

  /** The composed higher-order-function reference for
    * [[portableShingleHashes]] — parity oracle only; not used in query
    * paths. */
  def portableShingleHashesHof(text: Column, n: Int): Column =
    transform(wordShinglesHof(text, n), s => portableHash60(s))

  private val RollMod = 1000000007L

  /** Order-sensitive polynomial rolling fingerprint over a hash stream:
    * fp' = (fp·31 + h mod M) mod M, M = 1e9+7 — plain 64-bit-safe modular
    * arithmetic both engines fold identically (DuckDB:
    * `list_reduce(list_prepend(0, hs), (acc,h) -> ...)`), unlike the
    * xxhash64 chain in [[rollingFingerprint]]. */
  def portableRollingFp(hashes: Column): Column =
    aggregate(hashes, lit(0L),
      (acc, h) => (acc * lit(31L) + h % lit(RollMod)) % lit(RollMod))
}
