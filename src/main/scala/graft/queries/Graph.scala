package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over derived relational graphs. The engine's
  * second fixed-point operator family after connected components
  * (`operators/ConnectedComponents`): synchronous rounds of
  * join + aggregate, no driver-side graph state, all arithmetic exact
  * integer so every round — and therefore the fixed iteration count — is
  * DuckDB-oracle hash-checkable.
  */
object Graph {

  /** q124 weighted PageRank over the item-transition graph, 5 synchronous
    * iterations in exact parts-per-million fixed point — the classic
    * authority score a web-scale corpus pipeline uses for crawl
    * prioritization and document quality weighting (Page et al., "The
    * PageRank Citation Ranking", 1999), here over the graph of consecutive
    * line items within an order (part A followed by part B).
    *
    * Exactness: ranks start at 1e6 micro-units; each round is
    *   r'(v) = 150000 + Σ_{u→v} ⌊850000·r(u)·w(u,v) / (1e6·W(u))⌋
    * with per-edge floor division, so Spark and the oracle agree bit-for-bit
    * — no double accumulation anywhere. Worst-case intermediate is
    * 850000·(total mass)·maxw ≈ 8.5e17 at sf0.1, inside int64.
    *
    * Scale shape: the edge list is built by one per-order window (a single
    * keyed shuffle of lineitem), aggregated once, and persisted — it is
    * consumed every round, and recomputing the window 5× would quintuple
    * the dominant scan. Each round is then one edges⋈ranks hash join (both
    * sides keyed on src — AQE picks the strategy; ranks is |V| rows, never
    * forced broadcast because V is corpus-derived) + one dst-keyed partial
    * aggregate + one left join back to the vertex set. 5 rounds = a fixed
    * 15-shuffle plan independent of corpus size; rank frames never grow
    * beyond |V|. Dangling mass is deliberately NOT redistributed (the
    * "no-redistribution" PageRank variant) — redistribution needs a global
    * scalar per round, and the variant keeps every round a pure local
    * join/aggregate, the property that matters at 100 TB. */
  /** The reusable iteration core: weighted PageRank over an edge frame
    * (`src`, `dst`, `wt` — longs), `rounds` synchronous rounds of the exact
    * ppm recurrence, returning (`node`, `r`) for every vertex. Generator-
    * driven parity with a driver-side reference implementation is asserted
    * in PropertySpec.
    *
    * Out-weights are folded into the edge list ONCE (inside the round loop
    * that join would re-run a groupBy + join per iteration), and the cache
    * is laid out hash(src) so every round's edges⋈ranks join reuses the
    * cached partitioning — only the rank frame moves between rounds.
    * The rank frame carries ONLY in-edge (dst) nodes: a node nobody points
    * at holds the constant 150000 from round 1 on (1e6 in round 0), so its
    * value rides as a coalesce DEFAULT instead of |V| join rows per round —
    * the frame is bounded by the pointed-at set, and the per-round plan is
    * exactly one join + one map-combined aggregate. Rounds materialize via
    * persist+count so each round's measured size feeds the next round's
    * join planning; retired rounds release their cache immediately. The
    * returned plan reads the edge and final-round caches; both belong to
    * the session (Bench/Verify clear between queries). */
  def pageRank(rawEdges: DataFrame, rounds: Int): DataFrame = {
    val edges = rawEdges
      .join(rawEdges.groupBy("src").agg(sum("wt").as("wout")), "src")
      .repartition(col("src"))
      .persist()
    var ranks: DataFrame = null
    for (i <- 1 to rounds) {
      val joined =
        if (i == 1) edges.withColumn("r", lit(1000000L))
        else edges
          .join(ranks.select(col("node").as("src"), col("r")), Seq("src"), "left")
          .withColumn("r", coalesce(col("r"), lit(150000L)))
      val next = joined
        .select(col("dst").as("node"),
          expr("850000 * r * wt div (1000000 * wout)").as("c"))
        .groupBy("node").agg((lit(150000L) + sum("c")).as("r"))
        .persist()
      next.count()
      if (ranks != null) ranks.unpersist(blocking = false)
      ranks = next
    }
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    nodes.join(ranks, Seq("node"), "left")
      .select(col("node"), coalesce(col("r"), lit(150000L)).as("r"))
  }

  def q124(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"))
    // (okey, ln) is NOT unique in the fixture — the transition sequence must
    // ride a TOTAL order or lead() is engine/partition-layout dependent
    val nxt = Window.partitionBy("okey").orderBy(col("ln"), col("pk"))
    val edges = li.withColumn("dst", lead("pk", 1).over(nxt))
      .filter(col("dst").isNotNull && col("dst") =!= col("pk"))
      .groupBy(col("pk").as("src"), col("dst"))
      .agg(count(lit(1)).as("wt"))
    pageRank(edges, rounds = 5)
      .select(col("node").as("part"), col("r").as("rank_micro"))
      .orderBy(desc("rank_micro"), col("part"))
      .limit(20)
  }

  /** The oracle unrolls the same 5 rounds as chained CTEs (r1..r5), each
    * replaying the identical per-edge floor arithmetic. */
  val q124Sql: String = {
    val rounds = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    150000 + COALESCE(SUM(850000 * p.r * e.wt // (1000000 * o.wout)), 0) AS r
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN outw o ON o.src = e.src
         |  LEFT JOIN r${i - 1} p ON p.node = e.src
         |  GROUP BY n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH hop AS (
       |  SELECT l_partkey AS pk,
       |    lead(l_partkey) OVER (PARTITION BY l_orderkey
       |      ORDER BY l_linenumber, l_partkey) AS dst
       |  FROM lineitem
       |), edges AS (
       |  SELECT pk AS src, dst, COUNT(*) AS wt FROM hop
       |  WHERE dst IS NOT NULL AND dst <> pk GROUP BY 1, 2
       |), outw AS (
       |  SELECT src, SUM(wt) AS wout FROM edges GROUP BY src
       |), nodes AS (
       |  SELECT DISTINCT node FROM
       |    (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
       |), r0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $rounds
       |SELECT node AS part, CAST(r AS BIGINT) AS rank_micro FROM r5
       |ORDER BY rank_micro DESC, part LIMIT 20""".stripMargin
  }

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("q124_pagerank", q124 _, Some(q124Sql)))
}
