package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by hash-to-min label propagation — the
  * clustering step of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/
  * Jaccard output) become dedup GROUPS, each labeled by its minimum member
  * id, so "keep one doc per cluster" is a deterministic groupBy.
  *
  * Algorithm: every vertex starts labeled with its own id; each round every
  * vertex (a) lowers its label to the minimum of its own and its neighbors',
  * then (b) pointer-jumps: follows its label one hop (comp := label(comp)),
  * which halves the length of any label chain. A round is two hash-joins of
  * bounded-size frames plus one aggregate — no driver-side graph state, so
  * it runs at any corpus size. Neighbor-min alone needs O(diameter) rounds,
  * and PATHS are the typical output of adjacent-pair dedup discovery (a run
  * of k consecutive near-dup docs is a chain of diameter k−1); the jump
  * step cuts that to O(log diameter), the same doubling idea as the
  * large-star/small-star contraction of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC'14).
  *
  * Determinism: min() is order-insensitive, so the fixpoint is unique — the
  * same (vertices, edges) input yields the same labeling on any cluster
  * layout, which is what makes the result DuckDB-oracle-checkable.
  */
/** Checkpoint hygiene for iterative operators (connected components,
  * PageRank): the block-store RDD behind a `localCheckpoint(eager = true)`
  * Dataset — its plan is a single [[LogicalRDD]] leaf holding the
  * materialized InternalRow RDD. Iterative loops free each round's blocks
  * the moment the next round has materialized: the ContextCleaner only
  * reaps checkpoint blocks after the JVM happens to GC the Dataset
  * reference, which across a long-lived session (or a 129-query bench run)
  * leaves O(rounds) dead snapshots pinned in storage memory, and later
  * workloads pay for them in GC pressure (VERDICT r6: q58 benched 3.9× its
  * solo time for exactly this reason). */
private[graft] object Checkpoints {
  def rddOf(df: DataFrame): Option[RDD[InternalRow]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Materialize a mid-query scratch frame ONCE (eager local checkpoint)
    * so several consumer branches of a lazily-returned plan share a single
    * computation WITHOUT a `persist()` entry: a kernel that returns a lazy
    * result has no post-action point at which to unpersist, so a cache
    * entry it creates outlives the query in the session's CacheManager
    * (the r9 leak class — nine sites, "Asked to cache already cached
    * data" warnings on every re-execution). Checkpoint blocks instead die
    * with the frame reference (ContextCleaner periodic GC, or
    * Bench/Verify's between-query RDD sweep). The standard localCheckpoint
    * trade applies at cluster scale: blocks are unreplicated, so an
    * executor loss fails the query instead of recomputing — acceptable
    * for within-query scratch, NOT for cross-query shared frames (those
    * stay in the stamped [[graft.queries.SharedFrames]] registry, which
    * owns an explicit eviction lifecycle). */
  def scratch(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    rddOf(out).foreach(r => scratchIds.add(r.id))
    out
  }

  /** [[scratch]] plus a row count matching `pred`, read from the SAME
    * materialization job via `Dataset.observe` (CollectMetricsExec — a
    * codegen-neutral accumulator node): the iterative kernels' per-round
    * convergence probe (`next.filter(pred).count()`) was a whole extra
    * Spark job per round reading the just-written checkpoint blocks (r16
    * measurement: one such job per BFS/CC round at 0.02–0.07 s each, ~10%
    * of a fixed-point query at sf0.1). Counting inside the checkpoint's
    * own execution makes the probe free. Falls back to the counting job
    * if the metric is unavailable (defensive — observe is populated by
    * any full execution of the plan, which eager localCheckpoint is). */
  def scratchCount(df: DataFrame, pred: org.apache.spark.sql.Column)
      : (DataFrame, Long) = {
    val (out, row) = scratchAgg(df,
      Seq(coalesce(sum(when(pred, 1L)), lit(0L)).cast("long").as("n")))
    row match {
      case Some(r) => (out, r.getAs[Long]("n"))
      case None => (out, out.filter(pred).count())
    }
  }

  /** General form of [[scratchCount]]: materialize `df` and return the
    * given aggregates computed by the SAME job via `Dataset.observe`
    * (None if the metric did not surface — callers fall back to an
    * explicit aggregate over the returned checkpointed frame). */
  def scratchAgg(df: DataFrame, aggs: Seq[org.apache.spark.sql.Column])
      : (DataFrame, Option[org.apache.spark.sql.Row]) = {
    val name = "conv_" + java.util.UUID.randomUUID.toString.take(8)
    val observed = df.observe(name, aggs.head, aggs.tail: _*)
    val out = scratch(observed)
    (out, observed.queryExecution.observedMetrics.get(name))
  }

  /** Ids of every checkpoint RDD minted by [[scratch]] and not yet swept.
    * Ids are cheap ints, so a freed-by-its-loop id lingering here until the
    * next sweep is harmless; the set is drained on every sweep. */
  private val scratchIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** The between-query block-store sweep used by Bench/Verify/the probes.
    * Scope: plain persisted RDDs (always recomputable from lineage) plus
    * checkpoint RDDs minted by [[scratch]] (dead at any query boundary by
    * the scratch invariant). A locally-checkpointed RDD NOT minted here is
    * left alone — its lineage is truncated, so unpersisting it would turn a
    * future consumer's recompute into "Checkpoint block not found" instead
    * of a recompute. No such RDD exists today (every eager checkpoint in
    * the engine goes through [[scratch]]), but a checkpoint-rooted shared
    * frame would be exactly that, and this guard is what lets it survive
    * the sweep. */
  /** @param blocking the Bench/Verify/probe mains pass true for EVERY
    *   sweep: their sweeps sit outside the timed reps (local block removal
    *   is milliseconds there), each timed rep then starts against a
    *   provably clean block store, and — decisive for the last sweep —
    *   async unpersist futures still in flight when `spark.stop()` shuts
    *   the executor pool die with RejectedExecutionException stack traces
    *   in the process tail, noise the bench's bounded-tail stdout contract
    *   can't afford near the JSON line. The async default remains for
    *   latency-sensitive callers inside a query. */
  def sweepScratch(sc: org.apache.spark.SparkContext,
      blocking: Boolean = false): Unit = {
    // snapshot the id set BEFORE the block listing: scratch() persists
    // before registering, so any id captured here had its blocks live by
    // the time `live` is taken — if it's absent from `live`, it is
    // genuinely gone (freed by its loop / ContextCleaner), never
    // merely-just-minted
    val before = new java.util.HashSet[Int](scratchIds)
    val live = sc.getPersistentRDDs
    live.values.foreach { rdd =>
      if (!rdd.isCheckpointed || scratchIds.contains(rdd.id)) {
        rdd.unpersist(blocking)
        // remove only what was actually swept — a blanket clear() would
        // orphan ids minted concurrently during the sweep, leaving their
        // blocks permanently unsweepable (RDD ids are never reused, so a
        // lingering id can't mis-match a future RDD; it could only leak)
        scratchIds.remove(rdd.id)
      }
    }
    // bound the set: prune pre-sweep ids whose RDDs are already gone
    scratchIds.removeIf(id => before.contains(id) && !live.contains(id))
  }
}

object ConnectedComponents {

  private def checkpointRdd(df: DataFrame): Option[RDD[InternalRow]] =
    Checkpoints.rddOf(df)

  /** @param vertices one column `id` (LongType) — every vertex to label,
    *                 including isolated ones (they come back as singletons).
    * @param edges    columns `src`, `dst` — undirected, either orientation.
    * @return (id, comp) where comp = min vertex id reachable from id.
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIters: Int = 25): DataFrame = {
    // Both directions, so one join per round sees every neighbor.
    // Materialized: the edge list is consumed once per round, and upstream
    // it is typically an expensive pair-discovery pipeline (LSH banding,
    // Jaccard verify) that must not re-run O(diameter) times. A scratch
    // checkpoint, not persist (r16): the columnar CachedBatch persist paid
    // decompression on EVERY round's read (measured 5–6 s task time per
    // BFS round against a 24 MB cache in the sibling kernel), where the
    // checkpoint stores raw rows.
    val sym = Checkpoints.scratch(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))

    // Only edge-touched vertices iterate: an isolated vertex can never change
    // its label, so it stays out of every round's shuffle entirely and is
    // unioned back as a singleton at the end. In a dedup corpus the touched
    // subgraph is the near-dup fraction — a sliver of the corpus — so the
    // loop's working set scales with the duplicates, not the data.
    var labels = Checkpoints.scratch(
      sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp")))

    var changed = 1L
    var iters = 0
    // the previous round's checkpoint blocks — safe to free once the round
    // that read them has itself materialized (checkpointed RDDs have no
    // lineage, so an unpersist before the reader runs would lose the data)
    var retired: Option[RDD[InternalRow]] = checkpointRdd(labels)
    try {
      while (changed > 0 && iters < maxIters) {
        // (a) min label among each vertex's neighbors (one shuffle dst→src)
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("comp")), "dst")
          .groupBy(col("src").as("id")).agg(min("comp").as("nbr"))
        val stepped = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
            (coalesce(col("nbr"), col("comp")) < col("comp")).as("chg"))
          .persist(StorageLevel.MEMORY_AND_DISK) // consumed twice by the jump join
        // (b) pointer-jump: comp := min(comp, label(comp)). Labels only ever
        // decrease toward the component's min id, so the fixpoint is the
        // same — but a length-k label chain becomes length ⌈k/2⌉ per round.
        // The round result is local-checkpointed, not just persisted: the
        // jump self-join references the round's plan TWICE, so carrying
        // lineage forward would double the logical plan every round —
        // checkpointing keeps the per-round plan constant-size.
        val jmap = stepped.select(col("id").as("jid"), col("comp").as("jump"))
        // the changed-count rides the checkpoint job itself (observe
        // accumulator) instead of a per-round counting job over the
        // just-written blocks
        val (next, nChanged) = Checkpoints.scratchCount(
          stepped.join(jmap, col("comp") === col("jid"), "left")
            .select(col("id"),
              least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"),
              (col("chg") || coalesce(col("jump"), col("comp")) < col("comp")).as("chg")),
          col("chg"))
        changed = nChanged
        stepped.unpersist(blocking = false)
        // `next` is materialized (eager checkpoint), so the PREVIOUS round's
        // snapshot can never be read again — free its blocks now instead of
        // waiting for a GC+ContextCleaner cycle that may never come
        retired.foreach(_.unpersist(blocking = false))
        retired = checkpointRdd(next)
        labels = next.drop("chg")
        iters += 1
      }
      require(changed == 0,
        s"connected components did not converge in $maxIters rounds — " +
          s"with pointer jumping this needs a component of diameter ~2^$maxIters; " +
          "check the edge input before raising maxIters")
      // singletons rejoin here: left join against the converged labels is one
      // broadcast-or-hash join, not O(rounds) of them
      val all = vertices.select(col("id"))
        .join(labels.withColumnRenamed("comp", "lbl"), Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("comp"))
      // detach the result from the iteration state: the caller gets a plan
      // over ONE stable local checkpoint; the final round's snapshot (the
      // only per-round blocks still held) is freed right after this
      // materializes, so run() leaves exactly the result's blocks behind
      val out = Checkpoints.scratch(all)
      retired.foreach(_.unpersist(blocking = false))
      retired = None
      out
    } finally {
      retired.foreach(_.unpersist(blocking = false)) // non-convergence path
      checkpointRdd(sym).foreach(_.unpersist(blocking = false))
    }
  }
}
