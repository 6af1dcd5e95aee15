package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by hash-to-min label propagation — the
  * clustering step of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/
  * Jaccard output) become dedup GROUPS, each labeled by its minimum member
  * id, so "keep one doc per cluster" is a deterministic groupBy.
  *
  * Algorithm: every vertex starts labeled with its own id; each round every
  * vertex lowers its label to the minimum of its own and its neighbors'.
  * A round is one hash-shuffle of the edge list joined against the current
  * labels plus one aggregate — no driver-side graph state, so it runs at any
  * corpus size. Convergence needs O(diameter) rounds; near-dup graphs are
  * low-diameter (cliques and short chains around a shared template), which
  * in practice means a handful of rounds. For adversarially long chains the
  * known fix is alternating large-star/small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — same
  * join-shape per round, O(log²) rounds; not needed for dedup-shaped graphs.
  *
  * Determinism: min() is order-insensitive, so the fixpoint is unique — the
  * same (vertices, edges) input yields the same labeling on any cluster
  * layout, which is what makes the result DuckDB-oracle-checkable.
  */
object ConnectedComponents {

  /** @param vertices one column `id` (LongType) — every vertex to label,
    *                 including isolated ones (they come back as singletons).
    * @param edges    columns `src`, `dst` — undirected, either orientation.
    * @return (id, comp) where comp = min vertex id reachable from id.
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIters: Int = 25): DataFrame = {
    // Both directions, so one join per round sees every neighbor. Persisted:
    // the edge list is consumed once per round, and upstream it is typically
    // an expensive pair-discovery pipeline (LSH banding, Jaccard verify) that
    // must not re-run O(diameter) times.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Only edge-touched vertices iterate: an isolated vertex can never change
    // its label, so it stays out of every round's shuffle entirely and is
    // unioned back as a singleton at the end. In a dedup corpus the touched
    // subgraph is the near-dup fraction — a sliver of the corpus — so the
    // loop's working set scales with the duplicates, not the data.
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the handle that actually owns cached blocks this round (labels is a
    // projection of it after round 1, and unpersisting a projection is a
    // no-op — plans must match the cache entry)
    var cached = labels

    var changed = 1L
    var iters = 0
    try {
      while (changed > 0 && iters < maxIters) {
        // min label among each vertex's neighbors (one shuffle on dst→src)
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("comp")), "dst")
          .groupBy(col("src").as("id")).agg(min("comp").as("nbr"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
            (coalesce(col("nbr"), col("comp")) < col("comp")).as("chg"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        changed = next.filter(col("chg")).count() // also truncates re-execution
        cached.unpersist(blocking = false)
        cached = next
        labels = next.drop("chg") // served from next's cache
        iters += 1
      }
      require(changed == 0,
        s"connected components did not converge in $maxIters rounds — " +
          "graph diameter exceeds the dedup-shaped assumption; " +
          "raise maxIters or switch to star-contraction")
      // singletons rejoin here: left join against the converged labels is one
      // broadcast-or-hash join, not O(rounds) of them
      val all = vertices.select(col("id"))
        .join(labels.withColumnRenamed("comp", "lbl"), Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("comp"))
      // detach the result from the iteration caches: the caller gets a plan
      // over a stable local checkpoint, not over a cache we must keep alive
      all.localCheckpoint(eager = true)
    } finally {
      cached.unpersist(blocking = false)
      sym.unpersist(blocking = false)
    }
  }
}
