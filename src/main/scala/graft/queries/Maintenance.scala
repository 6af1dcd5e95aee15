package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15 operator group: the MAINTENANCE and GATING primitives a 100 TB
  * pipeline runs between full recomputes — incremental rollup refresh
  * (q297), deterministic stratified sampling whose scale shortcut is
  * PROVEN lossless by the oracle (q298), and two portable mergeable
  * sketches with their error priced against exact answers (count-min
  * q299, Bloom pre-gate q300), plus the shuffle-skew audit and salt plan
  * (q301). Every query is DuckDB-oracle-checked;
  * money is integer cents via per-row FLOOR, keys and counts are BIGINT,
  * randomness is md5, and each result carries a total ORDER BY.
  */
object Maintenance {

  // ---- q297 incremental rollup maintenance ---------------------------------

  /** The declared base/delta split day (epoch days, 1997-01-01) and the
    * declared retraction rule — literal knobs both engines share. */
  private val MvSplitDay = 9862L
  private val RetractMod = 97L

  /** q297 incremental rollup maintenance — the materialized-view refresh
    * every warehouse runs instead of rescanning the fact table: a stored
    * (month, status) rollup is brought current by MERGING a signed delta
    * aggregate (late inserts as +1 rows, retracted base orders as −1
    * rows), never by recomputing from the base. COUNT and SUM are
    * self-maintainable aggregates (additive groups — Gray et al.'s
    * distributive class, the standard incremental-view-maintenance
    * result), so base ⊎ delta is EXACT: the oracle computes the same
    * rollup the naive way, as one full GROUP BY over the effective row
    * set, and the hash gate proves merge == recompute across engines —
    * the algebra is the thing under test, not one engine's replay of it.
    * Groups whose count reaches zero drop out (a fully-retracted group
    * must vanish exactly as the recompute never emits it).
    *
    * Scale shape: refresh cost is Θ(|delta| + |MV|), never Θ(|base|) —
    * the delta aggregate map-combines to MV-sized partials and the merge
    * is one group-keyed union-aggregate; the base partition is read here
    * only to STAND IN for the stored MV (one aggregate, paid at view
    * creation in production). Retractions arrive as rows, so a CDC feed
    * (the q241 shape) plugs in unchanged. */
  def q297(spark: SparkSession, dir: String): DataFrame =
    mvRefresh(Tables.load(spark, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderstatus").as("status"),
      expr("cast(year(o_orderdate) * 100 + month(o_orderdate) as bigint)")
        .as("ym"),
      expr("unix_millis(o_orderdate) div 86400000").as("day"),
      expr("cast(floor(o_totalprice * 100.0) as bigint)").as("cents")))

  /** [[q297]]'s refresh kernel over a prepared (o_orderkey, status, ym,
    * day, cents) frame — spec entry point (planted fully-retracted
    * groups, merge-vs-naive replay). */
  private[graft] def mvRefresh(o: DataFrame): DataFrame = {
    val base = o.filter(col("day") < MvSplitDay)
    // the "stored" rollup the refresh starts from
    val mv = base.groupBy("ym", "status")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
    // signed delta: retractions of base rows + late inserts, ONE aggregate
    val delta = base.filter(col("o_orderkey") % RetractMod === 0L)
      .select(col("ym"), col("status"),
        lit(-1L).as("n"), (-col("cents")).as("c"))
      .union(o.filter(col("day") >= MvSplitDay)
        .select(col("ym"), col("status"), lit(1L).as("n"), col("cents").as("c")))
      .groupBy("ym", "status").agg(sum("n").as("n"), sum("c").as("c"))
    mv.select("ym", "status", "n", "c")
      .union(delta.select("ym", "status", "n", "c"))
      .groupBy("ym", "status")
      .agg(sum("n").as("n_orders"), sum("c").as("total_cents"))
      .filter(col("n_orders") > 0L)
      .orderBy("ym", "status")
  }

  val q297Sql: String =
    s"""SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
      |    AS ym,
      |  o_orderstatus AS status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders
      |WHERE (epoch_ms(o_orderdate) // 86400000 < $MvSplitDay
      |       AND o_orderkey % $RetractMod <> 0)
      |   OR epoch_ms(o_orderdate) // 86400000 >= $MvSplitDay
      |GROUP BY 1, 2
      |ORDER BY ym, status""".stripMargin

  // ---- q298 deterministic stratified sample --------------------------------

  /** Total sample budget and the declared oversample factor of the scale
    * shortcut (see [[q298]]). */
  private val SampleBudget = 100L
  private val Oversample = 4L

  /** q298 deterministic stratified sample — the eval-set/inspection draw a
    * pipeline takes per source: a budget of [[SampleBudget]] rows is
    * allocated across sources by the largest-remainder rule (exact integer
    * shares, the q166 discipline), and each source contributes its
    * allocation's WORST-RANKED-BY-MD5 docs (rank = (md5 bucket, doc_id) —
    * deterministic, engine-portable, stable under reruns).
    *
    * The SCALE SHORTCUT is the point: ranking every row per source is a
    * corpus-wide sort, so the engine first drops every row whose hash
    * cannot plausibly make its source's cut — survivors satisfy
    * hash < ⌈2³²·[[Oversample]]·k_s / n_s⌉ (the threshold computed per
    * source on the allocation frame, never as an h·n_s product, which
    * wraps int64 past ~2e9 docs in one source), expected
    * [[Oversample]]·k_s rows per source — and ranks only the survivors. The ORACLE ranks the FULL
    * source with no shortcut, so a hash match PROVES the threshold lost
    * nothing (the q269 discipline: the audit is the gate itself, not an
    * argument); a corpus where the threshold WOULD clip the true sample
    * fails loudly at the require below, never silently. */
  def q298(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.parallelized(
      Tables.load(spark, dir, "documents")).select("doc_id", "source"))

  /** [[q298]]'s sampler over a prepared (doc_id, source) frame — spec
    * entry point (full-rank driver replay proving the shortcut exact). */
  private[graft] def stratifiedSample(ds: DataFrame): DataFrame = {
    // scratch barrier (the q291/q288 recompute class): the hashed corpus
    // frame feeds the allocation aggregate, the survivor join, the guard's
    // eager action AND the final execution — without it each consumer
    // rescans and re-hashes the corpus
    val docs = graft.operators.Checkpoints.scratch(ds
      .select(col("doc_id"), col("source"),
        T.hashBucket(concat(lit("smp:"), col("doc_id").cast(StringType)),
          lit(1L << 32)).as("h")))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // largest-remainder allocation of the budget over per-source counts
    val alloc = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("t_docs", sum("n_s").over(all))
      .withColumn("base", expr(s"n_s * $SampleBudget div t_docs"))
      .withColumn("rem", expr(s"n_s * $SampleBudget % t_docs"))
      .withColumn("spare", lit(SampleBudget) - sum("base").over(all))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("source"))))
      .withColumn("k_s",
        col("base") + when(col("rk") <= col("spare"), 1L).otherwise(0L))
      .select("source", "n_s", "k_s")
    // the survivor threshold is computed PER SOURCE on the |sources|-row
    // alloc frame as ceil(2^32·Oversample·k_s / n_s) and compared to h
    // directly — the h·n_s product form wraps int64 past ~2e9 docs in one
    // source (h is a 2^32-scale hash), exactly the corpus this shortcut
    // exists for; here every product stays ≤ 2^32·4·budget
    val withK = docs.join(broadcast(alloc.withColumn("h_thresh", expr(
      s"least(${1L << 32}, (${1L << 32} * $Oversample * k_s + n_s - 1)" +
        " div n_s)"))), Seq("source"))
    // scale shortcut: only plausible-rank survivors reach the window
    val survivors = withK.filter(col("h") < col("h_thresh"))
    // loud-failure guard (deterministic for a given corpus): the shortcut
    // must retain at least each source's allocation, or the sample is not
    // the true per-source top-k — refuse rather than silently drift. The
    // join starts from ALLOC with the survivor census LEFT-joined and
    // zero-filled: a source whose every doc hashes above the threshold has
    // NO survivor group row, and an inner join would drop exactly the
    // all-clipped source the guard exists to catch (review finding r15)
    val short = alloc
      .join(survivors.groupBy("source").agg(count(lit(1)).as("surv")),
        Seq("source"), "left")
      .na.fill(0L, Seq("surv"))
      .filter(col("surv") < least(col("k_s"), col("n_s")))
      .limit(1).collect()
    require(short.isEmpty,
      s"oversample factor $Oversample clipped source ${short.headOption}" +
        " — raise Oversample for this corpus")
    survivors
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
      .filter(col("smp_rank") <= col("k_s"))
      .select(col("source"), col("doc_id"), col("smp_rank").cast(LongType)
        .as("smp_rank"))
      .orderBy("source", "smp_rank")
  }

  val q298Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % ${1L << 32} AS h
      |  FROM documents
      |), cnt AS (
      |  SELECT source, COUNT(*) AS n_s FROM d GROUP BY source
      |), tot AS (SELECT SUM(n_s) AS t_docs FROM cnt
      |), q AS (
      |  SELECT source, n_s,
      |    n_s * $SampleBudget // tot.t_docs AS base,
      |    n_s * $SampleBudget % tot.t_docs AS rem
      |  FROM cnt CROSS JOIN tot
      |), sp AS (SELECT $SampleBudget - SUM(base) AS spare FROM q
      |), alloc AS (
      |  SELECT source, n_s,
      |    base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
      |      <= sp.spare THEN 1 ELSE 0 END AS k_s
      |  FROM q CROSS JOIN sp
      |), ranked AS (
      |  SELECT d.source, d.doc_id, a.k_s,
      |    ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id)
      |      AS smp_rank
      |  FROM d JOIN alloc a ON a.source = d.source
      |)
      |SELECT source, doc_id, CAST(smp_rank AS BIGINT) AS smp_rank
      |FROM ranked WHERE smp_rank <= k_s
      |ORDER BY source, smp_rank""".stripMargin

  // ---- q299 portable count-min sketch --------------------------------------

  /** Count-min geometry — literal knobs both engines share. */
  private val CmWidth = 1024L
  private val CmDepth = 4

  /** One md5-derived count-min hash per depth row, shared shape with the
    * oracle: row j buckets key k at md5("cm" + j + ":" + k) % width. */
  private def cmBucket(key: Column, j: Int): Column =
    T.hashBucket(concat(lit(s"cm$j:"), key.cast(StringType)),
      lit(CmWidth))

  /** q299 portable count-min sketch (Cormode & Muthukrishnan, J.
    * Algorithms 2005) with its error PRICED against exact counts — the
    * mergeable frequency summary next to q276's KMV (distincts), q273's
    * log-buckets (quantiles) and q215's HLL registers (cardinality): d×w integer cells, cell(j, b) =
    * Σ count of keys hashing there, estimate = min over rows — never an
    * under-estimate, over-estimates priced here in ppm for the exact
    * top-20 users. Every hash is md5, every cell an exact integer SUM, so
    * both engines replay the sketch bit-for-bit (the PORTABLE sketch
    * discipline) — and the d·w = 4096-cell table is the mergeable LSM
    * object a streaming leg would persist per batch (cells SUM across
    * batches; the cusumStream digest algebra).
    *
    * Scale shape: one scan map-combines into ≤ d·w cells + one
    * user-keyed exact aggregate for the audit side; the probe joins the
    * top-20 against the cell table by broadcast. */
  def q299(spark: SparkSession, dir: String): DataFrame =
    countMinAudit(Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact")))

  /** [[q299]]'s sketch+audit over a prepared (user_id, exact) count frame
    * — spec entry point (driver replay of the cell table and the min
    * probe; over-estimate-only property). */
  private[graft] def countMinAudit(counts: DataFrame): DataFrame = {
    val cells = counts.select(
        col("exact"),
        explode(array((0 until CmDepth).map(j =>
          struct(lit(j).as("j"), cmBucket(col("user_id"), j).as("b"))): _*))
          .as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(sum("exact").as("cell"))
    val top = counts.orderBy(col("exact").desc, col("user_id")).limit(20)
    val probes = top.select(col("user_id"), col("exact"),
        explode(array((0 until CmDepth).map(j =>
          struct(lit(j).as("j"), cmBucket(col("user_id"), j).as("b"))): _*))
          .as("jb"))
      .select(col("user_id"), col("exact"),
        col("jb.j").as("j"), col("jb.b").as("b"))
    probes.join(broadcast(cells), Seq("j", "b"))
      .groupBy("user_id", "exact").agg(min("cell").as("est"))
      // the over-estimate mass is corpus-scaled (a cell sums event
      // counts), so the ×10⁶ product rides decimal(38,0)/HUGEINT like the
      // round's other hardened products
      .withColumn("over_ppm", expr(
        "cast(est - exact as decimal(38,0)) * 1000000" +
          " div greatest(1, exact)"))
      .select(col("user_id"), col("exact"), col("est"), col("over_ppm"))
      .orderBy(col("exact").desc, col("user_id"))
  }

  val q299Sql: String = {
    def bucket(j: Int, key: String): String =
      s"CAST('0x' || substr(md5('cm$j:' || CAST($key AS VARCHAR)), 1, 8) " +
        s"AS BIGINT) % $CmWidth"
    val cellArms = (0 until CmDepth).map(j =>
      s"SELECT $j AS j, ${bucket(j, "user_id")} AS b, exact FROM counts")
      .mkString("\n  UNION ALL ")
    val probeArms = (0 until CmDepth).map(j =>
      s"SELECT user_id, exact, $j AS j, ${bucket(j, "user_id")} AS b FROM top")
      .mkString("\n  UNION ALL ")
    s"""WITH counts AS (
      |  SELECT user_id, COUNT(*) AS exact FROM events GROUP BY user_id
      |), cells AS (
      |  SELECT j, b, CAST(SUM(exact) AS BIGINT) AS cell FROM (
      |  $cellArms
      |  ) GROUP BY j, b
      |), top AS (
      |  SELECT user_id, exact FROM counts
      |  ORDER BY exact DESC, user_id LIMIT 20
      |), probes AS (
      |  $probeArms
      |)
      |SELECT p.user_id, CAST(p.exact AS BIGINT) AS exact,
      |  CAST(MIN(c.cell) AS BIGINT) AS est,
      |  CAST(CAST(MIN(c.cell) - p.exact AS HUGEINT) * 1000000
      |    // GREATEST(1, p.exact) AS BIGINT) AS over_ppm
      |FROM probes p JOIN cells c ON c.j = p.j AND c.b = p.b
      |GROUP BY p.user_id, p.exact
      |ORDER BY exact DESC, user_id""".stripMargin
  }

  // ---- q300 portable Bloom pre-gate ----------------------------------------

  /** k = 4 md5-derived Bloom hashes; the bit array packs into int64 words
    * of 63 usable bits (bit 63 stays clear: DuckDB raises on 1<<63 where
    * int64 wraps — the 63-bit word is the portable encoding) and its WIDTH
    * is adaptive — see [[bloomGeom]]. */
  private val BloomHashes = 4

  /** The filter SIZES ITSELF to the known set — m = 2^(bitlen(n−1)+2) bits
    * ∈ [4n, 8n), the adaptive-width discipline (length(bin(n−1)), as the
    * LSH band widths do) — so the false-positive rate stays a CONSTANT
    * band (~2–16% at k = 4) from fixture to 100 TB instead of saturating.
    * The 4–8 bits/key sizing is DELIBERATELY tight so the fixture
    * actually exercises the priced-FPR columns; a production gate raises
    * the +2 to +4 (16–32 bits/key, FPR < 0.1%) — one declared constant. */
  private def bloomGeom(nKnown: Long): Long = {
    val bitlen = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nKnown - 1)))
    1L << (bitlen + 2)
  }

  /** Bit index = 60-bit md5 slice mod m — NOT the 8-hex-char (32-bit)
    * hashBucket: the adaptive width exceeds 2³² bits past ~2³⁰ known
    * fingerprints, and a 32-bit bit index would leave every higher bit
    * unreachable, silently saturating the filter's effective width (and
    * its FPR) exactly at the scale the gate exists for (review finding
    * r15). 60 bits covers any plannable m. */
  private def bloomBit(key: Column, j: Int, m: Long): Column =
    T.portableHash60(concat(lit(s"bf$j:"), key.cast(StringType))) % m

  /** q300 portable Bloom pre-gate (Bloom, CACM 1970) with its false-
    * positive rate PRICED against the exact anti-join — the cheap first
    * tier in front of the q255/q268/q274 ingest gates: a definite-NO from
    * the filter skips the exact store probe entirely, a maybe pays it.
    * The filter is int64 words (63 usable bits each — DuckDB raises on
    * 1<<63 where int64 wraps, so bit 63 stays clear) built by a bit_or
    * aggregate over the known corpus's content fingerprints; an arrival
    * passes when all [[BloomHashes]] bits are set. Everything is md5 +
    * integer bit algebra over the [[bloomGeom]] adaptive width, so both
    * engines build the SAME filter and the audit's false-positive count
    * is replayable — the gate ships with its price, per source: arrivals,
    * maybes, true members, false positives, and fp ppm over the true
    * negatives. Arrivals split from the corpus by md5, not by id range,
    * so every source contributes probes.
    *
    * Scale shape: the filter build map-combines into m/63 words (the
    * mergeable LSM object — words bit_or across batches); the probe is a
    * broadcast join of arrivals×k against the word table plus ONE exact
    * semi-join for the audit column. At serve time only the maybes pay
    * the exact probe — the arithmetic the fp_ppm column prices. */
  def q300(spark: SparkSession, dir: String): DataFrame =
    bloomGate(Tables.parallelized(Tables.load(spark, dir, "documents"))
      .select("doc_id", "source", "text"))

  /** [[q300]]'s gate over a prepared (doc_id, source, text) frame — spec
    * entry point (planted known-duplicate arrival: the no-false-negative
    * guarantee is literal-testable). */
  private[graft] def bloomGate(ds: DataFrame): DataFrame =
    bloomGateFromFp(graft.operators.Checkpoints.scratch(bloomDigest(ds)))

  /** The doc-grain digest the gate consumes — (doc_id, source, fp,
    * is_arrival). This IS the streaming leg's mergeable LSM object:
    * doc-grain rows union across batch digests and the distinct on read
    * collapses re-deliveries (the k-core edge-digest algebra; the word
    * table itself could merge by bit_or, but the ADAPTIVE width makes
    * the doc digest the stable object — m is a function of the merged
    * known count, so words of different epochs don't align). */
  private[graft] def bloomDigest(ds: DataFrame): DataFrame =
    ds.select(col("doc_id"), col("source"),
      T.portableHash60(coalesce(col("text"), lit(""))).as("fp"),
      (T.hashBucket(concat(lit("arr:"), col("doc_id").cast(StringType)),
        10) === 0L).as("is_arrival"))

  /** [[bloomGate]] over an already-fingerprinted digest frame. */
  private[graft] def bloomGateFromFp(docs: DataFrame): DataFrame = {
    // scratch barrier: known feeds the geometry COUNT action, the word
    // build, and the truth join — three executions without it
    val known = graft.operators.Checkpoints.scratch(
      docs.filter(!col("is_arrival")).select("fp").distinct())
    val mBits = bloomGeom(known.count())
    val words = known.select(
        explode(array((0 until BloomHashes).map(j =>
          bloomBit(col("fp"), j, mBits)): _*)).as("bit"))
      .select(expr("bit div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(bit % 63 as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
    val arrivals = docs.filter(col("is_arrival"))
    val probed = arrivals.select(col("doc_id"), col("source"), col("fp"),
        explode(array((0 until BloomHashes).map(j =>
          bloomBit(col("fp"), j, mBits)): _*)).as("bit"))
      .select(col("doc_id"), col("source"), col("fp"),
        expr("bit div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(bit % 63 as int))").as("m"))
      // UNHINTED join on the word index (the q90/q123 AQE discipline): the
      // word table is m/63 rows and m ADAPTS to the known-set size, so at
      // 100 TB it is itself corpus-scaled — a broadcast hint here would
      // OOM exactly when the gate matters; AQE broadcasts the 65-word
      // fixture table and shuffle-joins the co-keyed tables at scale
      .join(words, Seq("w"), "left")
      .withColumn("hit",
        when(expr("word & m") === col("m"), 1L).otherwise(0L))
      .groupBy("doc_id", "source", "fp")
      .agg((sum("hit") === lit(BloomHashes.toLong)).as("pass"))
    val withTruth = probed.join(known.withColumn("is_known", lit(1L)),
        Seq("fp"), "left")
      .na.fill(0L, Seq("is_known"))
    withTruth.groupBy("source").agg(
        count(lit(1)).as("n_arrivals"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_maybe"),
        sum("is_known").as("n_known"),
        sum(when(col("pass") && col("is_known") === 0L, 1L).otherwise(0L))
          .as("n_false_pos"))
      .withColumn("fp_ppm", expr(
        "cast(n_false_pos as decimal(38,0)) * 1000000" +
          " div greatest(1, n_arrivals - n_known)"))
      .orderBy("source")
  }

  val q300Sql: String = {
    def bit(j: Int, key: String): String =
      s"CAST('0x' || substr(md5('bf$j:' || CAST($key AS VARCHAR)), 1, 15) " +
        s"AS BIGINT) % g.m"
    val knownBits = (0 until BloomHashes).map(j =>
      s"SELECT ${bit(j, "fp")} AS bit FROM known CROSS JOIN geom g")
      .mkString("\n  UNION ALL ")
    val probeBits = (0 until BloomHashes).map(j =>
      s"SELECT doc_id, source, fp, ${bit(j, "fp")} AS bit " +
        "FROM arrivals CROSS JOIN geom g")
      .mkString("\n  UNION ALL ")
    s"""WITH d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5(COALESCE(text, '')), 1, 15) AS BIGINT)
      |      AS fp,
      |    CAST('0x' || substr(md5('arr:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 10 = 0 AS is_arrival
      |  FROM documents
      |), known AS (
      |  SELECT DISTINCT fp FROM d WHERE NOT is_arrival
      |), geom AS (
      |  SELECT 1 << (length(bin(GREATEST(COUNT(*) - 1, 1))) + 2) AS m
      |  FROM known
      |), words AS (
      |  SELECT bit // 63 AS w,
      |    CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(bit % 63 AS INTEGER))
      |      AS BIGINT) AS word
      |  FROM ($knownBits) GROUP BY 1
      |), arrivals AS (
      |  SELECT doc_id, source, fp FROM d WHERE is_arrival
      |), probed AS (
      |  SELECT p.doc_id, p.source, p.fp,
      |    SUM(CASE WHEN (w.word
      |        & (CAST(1 AS BIGINT) << CAST(p.bit % 63 AS INTEGER)))
      |      = (CAST(1 AS BIGINT) << CAST(p.bit % 63 AS INTEGER))
      |      THEN 1 ELSE 0 END) = $BloomHashes AS pass
      |  FROM ($probeBits) p LEFT JOIN words w ON w.w = p.bit // 63
      |  GROUP BY p.doc_id, p.source, p.fp
      |), truth AS (
      |  SELECT pr.source, pr.pass,
      |    CASE WHEN k.fp IS NULL THEN 0 ELSE 1 END AS is_known
      |  FROM probed pr LEFT JOIN known k ON k.fp = pr.fp
      |)
      |SELECT source,
      |  COUNT(*) AS n_arrivals,
      |  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
      |  CAST(SUM(is_known) AS BIGINT) AS n_known,
      |  CAST(SUM(CASE WHEN pass AND is_known = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_false_pos,
      |  CAST(CAST(SUM(CASE WHEN pass AND is_known = 0 THEN 1 ELSE 0 END)
      |      AS HUGEINT) * 1000000
      |    // GREATEST(1, COUNT(*) - SUM(is_known)) AS BIGINT) AS fp_ppm
      |FROM truth GROUP BY source ORDER BY source""".stripMargin
  }

  /** STREAMING leg of q297 — incremental view maintenance IS a streaming
    * problem, so the refresh gets the LSM discipline too: the stream
    * carries a SIGNED ledger (inserts +1, retraction rows −1, the CDC
    * shape the batch docstring names), each micro-batch digests to its
    * own signed (ym, status, n, c) cell frame (additive — cells SUM
    * across batches, replay-idempotent by batch-dir overwrite), and the
    * rollup assembles merge-on-read. A retraction may land BATCHES after
    * its base row: its cell goes transiently negative in the digest store
    * and nets out at read — the property the signed merge exists for
    * (StreamingSpec stages exactly that). */
  def mvDeltaStream(spark: SparkSession, signedLedger: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    signedLedger.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        mvDigest(batch.toDF())
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  /** One batch's signed rollup digest over (sign, ym, status, cents). */
  private[graft] def mvDigest(rows: DataFrame): DataFrame =
    rows.groupBy("ym", "status")
      .agg(sum("sign").as("n"), sum(expr("sign * cents")).as("c"))

  /** Assemble the current rollup from persisted signed digests —
    * bit-equal to the batch [[q297]] on the same ledger. */
  def mvReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _)
      .groupBy("ym", "status")
      .agg(sum("n").as("n_orders"), sum("c").as("total_cents"))
      .filter(col("n_orders") > 0L)
      .orderBy("ym", "status")

  /** The q297 ledger as signed CDC rows — spec/stream entry point: every
    * effective order as a +1 row, every retracted base order ALSO as a
    * −1 row (arriving whenever its batch does). */
  private[graft] def mvSignedLedger(o: DataFrame): DataFrame =
    o.filter(col("day") >= MvSplitDay ||
        col("o_orderkey") % RetractMod =!= 0L)
      .select(lit(1L).as("sign"), col("ym"), col("status"), col("cents"),
        col("o_orderkey"))
      .unionByName(o.filter(col("day") < MvSplitDay &&
          col("o_orderkey") % RetractMod === 0L)
        .select(lit(1L).as("sign"), col("ym"), col("status"), col("cents"),
          col("o_orderkey"))
        .unionByName(o.filter(col("day") < MvSplitDay &&
            col("o_orderkey") % RetractMod === 0L)
          .select(lit(-1L).as("sign"), col("ym"), col("status"),
            col("cents"), col("o_orderkey"))))

  // ---- q301 skew audit + salt plan -----------------------------------------

  /** The parallelism the salt plan targets — a declared literal both
    * engines share (local[32]; on a cluster this is the shuffle
    * parallelism the plan is sized for). */
  private val SaltParallelism = 32L

  /** One key family's census: vocabulary-sized count aggregate, then one
    * bounded rollup — the hot key rides a single max(struct(cnt, key))
    * aggregate (deterministic lexicographic argmax: highest count, then
    * highest key string), NEVER a window over the ndv-sized group frame,
    * which at 100 TB is itself billions of rows for a user-id family. */
  private[graft] def keyCensus(rows: DataFrame, family: String, key: Column)
      : DataFrame =
    rows.select(key.cast(StringType).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .agg(sum("cnt").as("n_rows"), count(lit(1)).as("ndv"),
        max(struct(col("cnt"), col("k"))).as("b"))
      .select(lit(family).as("family"), col("n_rows"), col("ndv"),
        col("b.cnt").as("max_cnt"), col("b.k").as("hot_key"))

  /** q301 shuffle-skew audit + salt plan — the diagnosis a pipeline runs
    * BEFORE a 100 TB join melts one reducer: for each declared join/agg
    * key family, the key census (rows, ndv, hottest key and its count),
    * the hot key's share in ppm, the skew ratio vs a uniform spread
    * (×1000), and the SALT FACTOR the q150-style salted join would need —
    * ceil(max_cnt · P / n_rows) sub-keys splits the hot key to the mean
    * task size at parallelism P = [[SaltParallelism]]. AQE's runtime skew
    * split does this reactively per shuffle; this audit prices it ahead
    * of time from the data, so a recurring pipeline BAKES the salt into
    * its keys instead of rediscovering the skew every run.
    *
    * Scale shape: one map-combined vocabulary-sized aggregate per family
    * + a 1-row rollup each; the union is |families| rows. No windows, no
    * joins, no driver loops. */
  def q301(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ev = Tables.load(spark, dir, "events")
    val od = Tables.load(spark, dir, "orders")
    Seq(
      keyCensus(li, "lineitem.l_orderkey", col("l_orderkey")),
      keyCensus(li, "lineitem.l_partkey", col("l_partkey")),
      keyCensus(od, "orders.o_custkey", col("o_custkey")),
      keyCensus(ev, "events.event_type", col("event_type")),
      keyCensus(ev, "events.user_id", col("user_id")))
      .reduce(_ unionByName _)
      // max_cnt·10⁶ and max_cnt·10³·ndv both wrap int64 on corpus-scale
      // families (ndv and max_cnt are each row-bounded) — the q290
      // decimal(38,0)/HUGEINT discipline; `div` lands the ratios back in
      // int64 (share ≤ 10⁶; skew ≤ 10³·ndv only when one key IS the
      // family, bounded by 10³·P·salt in any plannable case)
      .withColumn("max_share_ppm",
        expr("cast(max_cnt as decimal(38,0)) * 1000000 div n_rows"))
      .withColumn("skew_x1000",
        expr("cast(max_cnt as decimal(38,0)) * 1000 * ndv div n_rows"))
      .withColumn("salt_factor", expr(
        s"greatest(1, (max_cnt * $SaltParallelism + n_rows - 1) div n_rows)"))
      .select("family", "n_rows", "ndv", "hot_key", "max_cnt",
        "max_share_ppm", "skew_x1000", "salt_factor")
      .orderBy("family")
  }

  val q301Sql: String = {
    def census(table: String, family: String, key: String): String =
      s"""SELECT '$family' AS family, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  COUNT(*) AS ndv,
        |  (MAX({'cnt': cnt, 'k': k})).k AS hot_key,
        |  CAST((MAX({'cnt': cnt, 'k': k})).cnt AS BIGINT) AS max_cnt
        |FROM (SELECT CAST($key AS VARCHAR) AS k, COUNT(*) AS cnt
        |      FROM $table GROUP BY 1)""".stripMargin
    val arms = Seq(
      census("lineitem", "lineitem.l_orderkey", "l_orderkey"),
      census("lineitem", "lineitem.l_partkey", "l_partkey"),
      census("orders", "orders.o_custkey", "o_custkey"),
      census("events", "events.event_type", "event_type"),
      census("events", "events.user_id", "user_id"))
      .mkString("\n  UNION ALL\n")
    s"""WITH f AS (
      |  $arms
      |)
      |SELECT family, n_rows, ndv, hot_key, max_cnt,
      |  CAST(CAST(max_cnt AS HUGEINT) * 1000000 // n_rows AS BIGINT)
      |    AS max_share_ppm,
      |  CAST(CAST(max_cnt AS HUGEINT) * 1000 * ndv // n_rows AS BIGINT)
      |    AS skew_x1000,
      |  GREATEST(1, (max_cnt * $SaltParallelism + n_rows - 1) // n_rows)
      |    AS salt_factor
      |FROM f ORDER BY family""".stripMargin
  }

  // ---- streaming legs (the LSM discipline, §2.9 pattern) -------------------

  /** STREAMING leg of q299: the stream appends per-batch (user_id, n)
    * COUNT digests — counts are the mergeable object (order-free, sum
    * across batches, replay-idempotent by batch-dir overwrite; the
    * cusumStream algebra) — and the sketch + audit assemble merge-on-read
    * from the digest store. The 4096-cell table derives from the merged
    * counts, so a reader never rescans events. */
  def countMinStream(spark: SparkSession, eventStream: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    eventStream.select(col("user_id"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.toDF().groupBy("user_id").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  /** Assemble the q299 sketch + audit from persisted count digests (glob
    * paths welcome). Cells for the same user across batches SUM exactly. */
  def countMinReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    countMinAudit(dirs.map(d => spark.read.parquet(d))
      .reduce(_ unionByName _)
      .groupBy("user_id").agg(sum("n").as("exact")))

  /** STREAMING leg of q300: the stream appends per-batch DOC-GRAIN
    * fingerprint digests ([[bloomDigest]] rows — the distinct on read
    * collapses re-deliveries, the k-core edge-set algebra); the gate
    * assembles merge-on-read, recomputing the ADAPTIVE width from the
    * merged known count so the filter geometry follows the corpus as it
    * grows — the reason the doc digest, not the word table, is the
    * persisted object. */
  def bloomStream(spark: SparkSession, docStream: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        bloomDigest(batch.toDF())
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  /** Assemble the q300 gate from persisted doc digests. */
  def bloomReadMerged(spark: SparkSession, dirs: Seq[String]): DataFrame =
    bloomGateFromFp(dirs.map(d => spark.read.parquet(d))
      .reduce(_ unionByName _).distinct())

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q297_mv_refresh", q297 _, Some(q297Sql)),
    ("q298_stratified_sample", q298 _, Some(q298Sql)),
    ("q299_countmin_audit", q299 _, Some(q299Sql)),
    ("q300_bloom_gate", q300 _, Some(q300Sql)),
    ("q301_skew_salt_plan", q301 _, Some(q301Sql)))
}
