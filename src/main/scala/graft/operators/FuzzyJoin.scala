package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the candidate-generation half of a
  * fuzzy match, as a reusable operator (extracted from q71 in r11 so the
  * scheme is a library primitive, not a query-local trick).
  *
  * Scheme: the partition pigeonhole of Pass-Join (Li, Deng, Wang & Feng,
  * "Pass-Join: A Partition-based Method for Similarity Joins", PVLDB 5(3),
  * 2011). Every indexed string is split into k+1 contiguous segments; if
  * ed(a, b) ≤ k, the ≤ k edit sites can touch at most k segments, so SOME
  * segment of b survives verbatim in a, displaced by at most k positions.
  * Candidates are therefore an EQUI-join on (block…, |b|, segment index,
  * segment text) between b's k+1 segments and a's ≤ (2k+1)²(k+1) substring
  * probes — keys whose cardinality grows with the string domain, so
  * candidate volume tracks true near-matches instead of block populations
  * (the failure mode of fixed-cardinality blocking this replaced:
  * SCALING_r11.json measured brand-only blocking at ×5.5 for ×3 data).
  * Strings shorter than k+1 chars can lack k+1 non-empty segments; pairs
  * whose shorter side is ≤ k chars go through a residual block-key join
  * over the ≤ 2k-char sliver (both sides of such a pair are ≤ 2k chars,
  * so the residual is bounded by the short-string value population).
  *
  * CONTRACT: the input should be a VALUE frame — distinct strings per
  * block, typically with a multiplicity column in `carry` (aggregate
  * first; identical-string pairs are a C(g,2) driver-side formula, not a
  * join's job). Output is a SUPERSET of the pairs at edit distance ≤ k
  * (oriented a_name < b_name, deduplicated); callers verify survivors
  * with `levenshtein(a_name, b_name, k)` — the threshold form early-exits
  * the DP. Completeness is property-tested against a driver-side brute
  * force on an adversarial low-entropy catalog (PropertySpec). */
object FuzzyJoin {

  /** @param values   value frame: one row per distinct (block…, name)
    * @param blockCols exact-match block keys (may be empty)
    * @param nameCol   the string column to fuzzy-match
    * @param k         edit-distance threshold (≥ 1)
    * @param carry     columns to ride along from each side, emitted as
    *                  `<col>_a` / `<col>_b`
    * @return candidates: blockCols ++ (a_name, b_name) ++ carried pairs */
  def passJoinCandidates(values: DataFrame, blockCols: Seq[String],
      nameCol: String, k: Int, carry: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    val segs = k + 1
    val v = values.withColumn("len", length(col(nameCol)))
    val outCols = blockCols ++ Seq("a_name", "b_name") ++
      carry.flatMap(c => Seq(s"${c}_a", s"${c}_b"))

    def side(tag: String): DataFrame =
      v.filter(col("len") >= segs).select(
        blockCols.map(col) ++
          Seq(col(nameCol).as(s"${tag}_name"), col("len").as(s"l$tag")) ++
          carry.map(c => col(c).as(s"${c}_$tag")): _*)

    val idx = side("b")
      .select(col("*"), explode(sequence(lit(0), lit(k))).as("j"))
      .withColumn("lj", expr(s"((j + 1) * lb) div $segs - (j * lb) div $segs"))
      .filter(col("lj") > 0)
      .withColumn("seg", expr(s"substring(b_name, (j * lb) div $segs + 1, lj)"))
      .drop("lj")

    val probe = side("a")
      .select(col("*"), explode(sequence(
        greatest(col("la") - k, lit(segs)), col("la") + k)).as("lb"))
      .select(col("*"), explode(sequence(lit(0), lit(k))).as("j"))
      .withColumn("sj", expr(s"(j * lb) div $segs"))
      .withColumn("lj", expr(s"((j + 1) * lb) div $segs - (j * lb) div $segs"))
      .filter(col("lj") > 0)
      .withColumn("pstart", greatest(col("sj") - k, lit(0)))
      .withColumn("pend", least(col("sj") + k, col("la") - col("lj")))
      .filter(col("pstart") <= col("pend"))
      .select(col("*"), explode(sequence(col("pstart"), col("pend"))).as("pp"))
      .withColumn("seg", expr("substring(a_name, pp + 1, lj)"))
      .drop("sj", "lj", "pstart", "pend", "pp", "la")

    val main = probe.join(idx, blockCols ++ Seq("lb", "j", "seg"))
      .filter(col("a_name") < col("b_name"))
      .select(outCols.map(col): _*)

    // residual: pairs whose shorter side is <= k chars (both sides then
    // <= 2k chars) — the pigeonhole needs k+1 non-empty segments
    def shortSide(tag: String): DataFrame =
      v.filter(col("len") <= 2 * k).select(
        blockCols.map(col) ++ Seq(col(nameCol).as(s"${tag}_name")) ++
          carry.map(c => col(c).as(s"${c}_$tag")): _*)
    val shortPairs = (if (blockCols.isEmpty)
        shortSide("a").crossJoin(shortSide("b"))
      else shortSide("a").join(shortSide("b"), blockCols))
      .filter(col("a_name") < col("b_name") &&
        least(length(col("a_name")), length(col("b_name"))) <= k)
      .select(outCols.map(col): _*)

    // a value pair may collide on several (j, position) keys; the carried
    // columns are functionally dependent on (block, name) so the distinct
    // dedups exactly the candidate pair
    main.distinct().unionAll(shortPairs)
  }
}
